#!/usr/bin/env python
"""Throughput benchmark: DeepLabV2-R101 training step @ 512x512 (bf16).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", "mfu"}.

The reference publishes no benchmark numbers (BASELINE.md: README has none,
`"published": {}`), so `vs_baseline` is computed against PYTORCH_GPU_ANCHOR —
20 images/sec/chip for PyTorch-1.7 DeepLabV2-R101 fwd+bwd @512² on the
reference's CUDA-11-era GPU, the anchor for the driver's >=3x north-star
(BASELINE.json "north_star").  The anchor is grounded by measurement
(bench_torch_ref.py -> BENCH_TORCH_REF.json): the reference's own torch
modules run at 0.072 img/s/core on this host's CPU; scaled to a 16-32-core
server (~1.15-2.3 img/s) and a typical 10-20x V100-vs-server-CPU convnet
training speedup, the implied GPU range is ~11-44 img/s — 20 sits mid-range.

Transient-failure hardening (round 4; BENCH_r03.json was rc=1 because the
remote-TPU tunnel was down at capture time, and the failure mode is a HANG,
not an exception): the parent process is stdlib-only and runs the actual
benchmark in a child subprocess.  Failed or hung attempts are killed, a
diagnostic JSON line is emitted to stderr per attempt, and the attempt is
retried with backoff (default 3 attempts, 60 s apart).  Only after every
attempt fails does the parent print a loud error JSON line to stdout and
exit 1 — rc=1 is never silent.

The kill policy is PHASE-AWARE, not pure wall-clock (a pure 900 s cap killed
a healthy fully-cold session: with /tmp/jax_cache wiped, the single remote
compile of the train step is legitimately SILENT for 15+ minutes):
  * stall timeout (SEGTPU_BENCH_TIMEOUT, retry _RETRY_TIMEOUT) — kill when
    the child produces NO new output for that long.  This catches the
    round-3 hang (backend init blocks forever; breadcrumbs stop).
  * during the compile phase — after the '[bench-child] compiling' breadcrumb
    and until '[bench-child] timing' — silence is expected, so only the hard
    cap applies (SEGTPU_BENCH_HARD_TIMEOUT, retry _RETRY_HARD_TIMEOUT).
Knobs (env): SEGTPU_BENCH_ATTEMPTS / _TIMEOUT / _RETRY_TIMEOUT /
_HARD_TIMEOUT / _RETRY_HARD_TIMEOUT / _BACKOFF, SEGTPU_BENCH_TEST_CHILD
(tests substitute a fake child command).
"""

import json
import os
import sys
import time

PYTORCH_GPU_ANCHOR = 20.0  # images/sec/chip; measurement-grounded, see
                           # docstring + BENCH_TORCH_REF.json
BATCH = 16
SIZE = 512
WARMUP = 5
ITERS = 20
METRIC = "train_images_per_sec_per_chip_deeplabv2_r101_512"


def step_mfu(step, args, dt_per_iter, peak_flops=None):
    """XLA cost-model FLOPs of a compiled jit step / time / chip peak.

    Shared by bench_all.py (the round-4 harness rewrite briefly dropped this
    export and silently broke the per-family bench).  peak defaults to v5e
    197 TFLOPS bf16; override via SEGTPU_PEAK_TFLOPS.
    """
    if peak_flops is None:
        peak_flops = float(os.environ.get("SEGTPU_PEAK_TFLOPS", "197")) * 1e12
    try:
        analysis = step.lower(*args).compile().cost_analysis() or {}
        flops = float(analysis.get("flops", 0.0))
        return round(flops / dt_per_iter / peak_flops, 4) if flops else 0.0
    except Exception:
        return 0.0


# ---------------------------------------------------------------------------
# child: the real benchmark (runs on the chip; may hang if the tunnel is down)
# ---------------------------------------------------------------------------

def child_main():
    import jax

    if os.environ.get("SEGTPU_FORCE_CPU"):  # smoke-testing off-chip (the
        jax.config.update("jax_platforms", "cpu")  # axon harness pins
                                            # JAX_PLATFORMS; see cli/common.py)
    try:  # persistent compile cache: reruns skip the remote-compile round-trip
        jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)
    except Exception:
        pass
    import jax.numpy as jnp
    import numpy as np

    from rnd_semantic_segmentation_tpu.configs import get_default_cfg
    from rnd_semantic_segmentation_tpu.models import build_segmentor
    from rnd_semantic_segmentation_tpu.train import (
        Segmentor, make_optimizers, make_src_train_step)

    # peak bf16 matmul throughput for MFU: v5e = 197 TFLOPS/chip.  Override
    # with SEGTPU_PEAK_TFLOPS when benching other generations (v4=275,
    # v5p=459).
    peak_flops = float(os.environ.get("SEGTPU_PEAK_TFLOPS", "197")) * 1e12

    def stage(msg):  # breadcrumbs land in the parent's stderr_tail diagnostic
        print(f"[bench-child] {msg}", file=sys.stderr, flush=True)

    stage("initializing backend")
    stage(f"devices: {jax.devices()}")

    cfg = get_default_cfg()
    cfg.MODEL.NAME = "deeplab_resnet101"
    cfg.MODEL.NUM_CLASSES = 19
    cfg.MODEL.FREEZE_BN = True
    cfg.MODEL.DTYPE = "bfloat16"
    cfg.SOLVER.BASE_LR = 1e-4
    cfg.SOLVER.EPOCHS = 1

    spec = build_segmentor(cfg)
    seg = Segmentor(spec, cfg.MODEL.NUM_CLASSES)
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.rand(BATCH, SIZE, SIZE, 3).astype(np.float32)
                    ).astype(jnp.bfloat16)
    y = jnp.asarray(
        rng.randint(0, 19, size=(BATCH, SIZE, SIZE)).astype(np.int32))
    batch = {"image": x, "label": y}

    variables = seg.init(jax.random.PRNGKey(0),
                         jnp.zeros((1, SIZE, SIZE, 3), jnp.bfloat16))
    state = seg.make_states(variables, make_optimizers(spec, cfg))
    step = make_src_train_step(seg, cfg, steps_per_epoch=1000)

    stage("compiling + warmup")
    for _ in range(WARMUP):
        state, metrics = step(state, batch, jnp.float32(0))
    float(metrics["loss"])  # device_get: hard sync (block_until_ready does
                            # not fully fence through the remote-TPU tunnel)

    stage("timing")
    t0 = time.perf_counter()
    for _ in range(ITERS):
        state, metrics = step(state, batch, jnp.float32(0))
    float(metrics["loss"])
    dt = time.perf_counter() - t0

    images_per_sec = BATCH * ITERS / dt

    # MFU: XLA cost-model FLOPs of the compiled step (utils/profiling.py
    # cal_params — the thop replacement, SURVEY §2.0) / time / chip peak.
    mfu = step_mfu(step, (state, batch, jnp.float32(0)), dt / ITERS,
                   peak_flops)

    print(json.dumps({
        "metric": METRIC,
        "value": round(images_per_sec, 2),
        "unit": "images/sec/chip",
        "vs_baseline": round(images_per_sec / PYTORCH_GPU_ANCHOR, 3),
        "mfu": round(mfu, 4),
    }), flush=True)


# ---------------------------------------------------------------------------
# parent: stdlib-only retry/timeout harness (never imports jax)
# ---------------------------------------------------------------------------

def _tail(text, n=800):
    if text is None:
        return ""
    if isinstance(text, bytes):
        text = text.decode("utf-8", "replace")
    return text[-n:]

def _metric_line(stdout):
    """Last stdout line that parses as the metric JSON."""
    for line in reversed((stdout or "").strip().splitlines()):
        line = line.strip()
        if not line.startswith("{"):
            continue
        try:
            row = json.loads(line)
        except ValueError:
            continue
        if row.get("metric") == METRIC and row.get("value") is not None:
            return line
    return None

# breadcrumbs (child stderr) that bound the compile phase, during which the
# remote compile service is legitimately silent for many minutes cold
_COMPILE_MARK = "[bench-child] compiling"
_TIMING_MARK = "[bench-child] timing"


def _run_attempt(cmd, stall_timeout, hard_timeout, poll_s=0.2):
    """Run one child attempt under the phase-aware kill policy.

    Returns (returncode_or_None_if_killed, stdout_text, stderr_text,
    kill_reason_or_None).  Kills on: no new output for `stall_timeout`
    seconds outside the compile phase, or `hard_timeout` seconds total.
    """
    import subprocess
    import tempfile

    with tempfile.TemporaryFile() as out_f, tempfile.TemporaryFile() as err_f:
        try:
            p = subprocess.Popen(cmd, stdout=out_f, stderr=err_f)
        except OSError as e:
            return None, "", "", f"spawn failed: {e}"
        t0 = last_progress = time.time()
        sizes = (0, 0)
        in_compile = False
        kill_reason = None
        # Incremental mark scan.  Two constraints (advisor, round 4):
        #  * the child SHARES the stderr fd's offset (Popen dup2), so the
        #    parent must read with os.pread — a seek(0)+read would move the
        #    shared offset and make the child clobber earlier stderr;
        #  * re-reading the whole file per size change is O(n^2) in stderr
        #    volume — scan only newly appended bytes, latch per-mark
        #    booleans, and stop scanning once the timing mark is seen.
        scan_pos = 0
        carry = b""  # tail bytes so a mark split across reads still matches
        seen_compile = seen_timing = False
        compile_b = _COMPILE_MARK.encode()
        timing_b = _TIMING_MARK.encode()
        while True:
            rc = p.poll()
            if rc is not None:
                break
            now = time.time()
            cur = (os.fstat(out_f.fileno()).st_size,
                   os.fstat(err_f.fileno()).st_size)
            if cur != sizes:
                sizes = cur
                last_progress = now
                if not seen_timing and cur[1] > scan_pos:
                    new = os.pread(err_f.fileno(), cur[1] - scan_pos, scan_pos)
                    scan_pos += len(new)
                    buf = carry + new
                    if not seen_compile and compile_b in buf:
                        seen_compile = True
                    if timing_b in buf:
                        seen_timing = True
                    carry = buf[-max(len(compile_b), len(timing_b)):]
                in_compile = seen_compile and not seen_timing
            if now - t0 > hard_timeout:
                kill_reason = (f"timeout (killed child at the "
                               f"{hard_timeout:.0f}s hard cap)")
            elif not in_compile and now - last_progress > stall_timeout:
                kill_reason = (f"timeout (killed hung child: no output for "
                               f"{stall_timeout:.0f}s outside the compile "
                               f"phase)")
            if kill_reason:
                p.kill()
                p.wait()
                break
            time.sleep(poll_s)
        out_f.seek(0)
        err_f.seek(0)
        return (None if kill_reason else rc,
                out_f.read().decode("utf-8", "replace"),
                err_f.read().decode("utf-8", "replace"),
                kill_reason)


def parent_main():
    attempts = int(os.environ.get("SEGTPU_BENCH_ATTEMPTS", "3"))
    first_stall = float(os.environ.get("SEGTPU_BENCH_TIMEOUT", "900"))
    retry_stall = float(os.environ.get("SEGTPU_BENCH_RETRY_TIMEOUT", "600"))
    first_hard = float(os.environ.get("SEGTPU_BENCH_HARD_TIMEOUT", "2400"))
    retry_hard = float(
        os.environ.get("SEGTPU_BENCH_RETRY_HARD_TIMEOUT", "1800"))
    backoff = float(os.environ.get("SEGTPU_BENCH_BACKOFF", "60"))
    test_child = os.environ.get("SEGTPU_BENCH_TEST_CHILD")
    cmd = (test_child.split() if test_child
           else [sys.executable, os.path.abspath(__file__), "--child"])

    for i in range(attempts):
        stall = first_stall if i == 0 else retry_stall
        hard = max(first_hard if i == 0 else retry_hard, stall)
        diag = {"diagnostic": "bench_attempt_failed",
                "attempt": i + 1, "attempts": attempts,
                "stall_timeout_s": stall, "hard_timeout_s": hard}
        t0 = time.time()
        rc, out, err, kill_reason = _run_attempt(cmd, stall, hard)
        if rc == 0:
            line = _metric_line(out)
            if line:
                print(line, flush=True)
                return 0
        if kill_reason:
            diag.update(error=kill_reason)
        else:
            line = _metric_line(out)
            diag.update(error=f"child rc={rc}"
                              + ("" if line is None else " (metric line found"
                                 " but rc nonzero)"))
        diag.update(stderr_tail=_tail(err), stdout_tail=_tail(out))
        diag["elapsed_s"] = round(time.time() - t0, 1)
        print(json.dumps(diag), file=sys.stderr, flush=True)
        if i + 1 < attempts:
            time.sleep(backoff)

    # every attempt failed: loud terminal record on stdout, then rc=1
    print(json.dumps({
        "metric": METRIC,
        "value": None,
        "unit": "images/sec/chip",
        "vs_baseline": None,
        "error": (f"benchmark failed after {attempts} attempts (backend "
                  f"init/compile hang or crash — see stderr diagnostics); "
                  f"last good driver capture: BENCH_r02.json 108.8 img/s"),
    }), flush=True)
    return 1


if __name__ == "__main__":
    if "--child" in sys.argv[1:]:
        child_main()
    else:
        sys.exit(parent_main())
