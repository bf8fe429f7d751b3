"""Shared chip-microbench harness for the probes/ scripts.

Methodology (fixes two flaws the round-4 judge-grade rerun exposed in the
first probe generation):

1. **Dispatch amortization.** Through the remote-TPU tunnel a single jit
   dispatch costs ~2-3 ms, so timing `REPS` separate dispatches of a ~100 us
   workload measures the tunnel, not the chip (the first-gen probes showed a
   flat ~130 us/conv floor across 40x FLOP ranges).  Here the workload is
   iterated ITERS times *inside* the jitted function with `lax.fori_loop`, so
   one dispatch covers ITERS sequential executions on device.

2. **Dead-code defeat.** Reducing only `x[0, 0, 0]` lets XLA slice away the
   other 15 batch elements and most of the spatial extent through a conv
   chain (the first-gen probes reported 709 "TFLOPs" on a 197-TFLOP chip).
   Here the carried tensor feeds the next iteration in full and the final
   output is a full-tensor f32 sum — nothing is sliceable.

The body must map carry->carry (same shape/dtype).  A small damping factor
keeps bf16 activations from overflowing across ITERS*CHAIN applications.
"""
import time

import jax
import jax.numpy as jnp
from jax import lax


def time_loop(body, x0, iters=50, reps=3, damp=True):
    """Best-case (min over reps) seconds per single `body(x)` application,
    dispatch-amortized.

    body: carry -> carry (same shape/dtype).  Executed iters times inside one
    jit call via fori_loop; timed over reps dispatches; returns min/iters.
    Min (not median/mean) is deliberate: these probes compare per-shape
    hardware ceilings, and the minimum is the noise-free estimate of that
    ceiling — end-to-end benches (bench.py/bench_all) use means instead.
    """

    def damped(x):
        y = body(x)
        if damp:
            # keep activations bounded; one multiply is noise vs a conv chain
            y = y * jnp.asarray(0.5, y.dtype)
        return y

    @jax.jit
    def run(x):
        y = lax.fori_loop(0, iters, lambda i, c: damped(c), x)
        return jnp.sum(y.astype(jnp.float32))

    float(run(x0))  # compile + warm
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        s = run(x0)
        float(s)  # scalar sync through the tunnel (CLAUDE.md timing rule)
        best = min(best, time.perf_counter() - t0)
    return best / iters
