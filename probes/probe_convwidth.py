"""Conv-width roofline microbench (pranet/gald perf work, VERDICT r4 items 3+6).

Pattern per CLAUDE.md: chain dependent convs inside one jit call so we
measure MXU time, not dispatch; sync on a scalar through the tunnel.
All bf16. Prints one JSON line per case.
"""
import json
import os
import time

import jax
import jax.numpy as jnp
from jax import lax
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")

TINY = bool(os.environ.get("PROBE_TINY"))  # CPU shakeout: 1/8 sizes, cpu
if TINY:
    jax.config.update("jax_platforms", "cpu")

CHAIN = 3 if TINY else 20
REPS = 2 if TINY else 10


def _shrink(case):
    if not TINY:
        return case
    name, b, h, w, ci, co, kh, kw, note = case
    return (name, 2, max(kh * 2, h // 8), max(kw * 2, w // 8), ci, co, kh,
            kw, note)


def conv(x, k, kh, kw, stride=1):
    return lax.conv_general_dilated(
        x, k, (stride, stride), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


def bench_case(name, b, h, w, cin, cout, kh, kw, note=""):
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (b, h, w, cin), jnp.bfloat16)
    # distinct kernels; non-square widths alternate cin->cout->cin so the
    # chain stays shape-consistent (flops identical per pair member avg)
    ks = [jax.random.normal(jax.random.PRNGKey(i + 1),
                            (kh, kw, cin, cout) if i % 2 == 0
                            else (kh, kw, cout, cin),
                            jnp.bfloat16) * 0.05 for i in range(CHAIN)]

    @jax.jit
    def run(x, ks):
        for k in ks:
            x = conv(x, k, kh, kw)
        return jnp.sum(x[0, 0, 0])

    t = run(x, ks)
    float(t)  # compile + sync
    t0 = time.perf_counter()
    for _ in range(REPS):
        t = run(x, ks)
    float(t)
    dt = (time.perf_counter() - t0) / (REPS * CHAIN)
    flops = 2 * b * h * w * cout * kh * kw * cin
    tf = flops / dt / 1e12
    print(json.dumps({"case": name, "shape": [b, h, w, cin, cout, kh, kw],
                      "us_per_conv": round(dt * 1e6, 1),
                      "tflops": round(tf, 2),
                      "mxu_frac": round(tf / 197.0, 3), "note": note}),
          flush=True)
    return dt, flops


CASES = [
    # --- pranet res2net branch convs (352 input: taps 88/44/22/11) ---
    ("res2net L1 branch as-is", 16, 88, 88, 26, 26, 3, 3, ""),
    ("res2net L1 branch pad32", 16, 88, 88, 32, 32, 3, 3, "pad 26->32"),
    ("res2net L1 branch pad64", 16, 88, 88, 64, 64, 3, 3, "pad 26->64"),
    ("res2net L1 s2d dense",    16, 44, 44, 104, 104, 2, 2, "s2d block2: 1.78x flops of as-is"),
    ("res2net L1 3xbranch dense", 16, 88, 88, 78, 78, 3, 3, "3 branches merged, 3x flops"),
    ("res2net L2 branch as-is", 16, 44, 44, 52, 52, 3, 3, ""),
    ("res2net L2 branch pad64", 16, 44, 44, 64, 64, 3, 3, ""),
    ("res2net L3 branch as-is", 16, 22, 22, 104, 104, 3, 3, ""),
    ("res2net L3 branch pad128", 16, 22, 22, 128, 128, 3, 3, ""),
    ("res2net L4 branch as-is", 16, 11, 11, 208, 208, 3, 3, ""),
    ("res2net L4 branch pad256", 16, 11, 11, 256, 256, 3, 3, ""),
    # --- pranet RFB decoder convs (channel=32) ---
    ("rfb conv 32ch @44", 16, 44, 44, 32, 32, 3, 3, ""),
    ("rfb conv 32ch @44 pad64", 16, 44, 44, 64, 64, 3, 3, ""),
    ("rfb conv 32ch @44 pad128", 16, 44, 44, 128, 128, 3, 3, ""),
    ("rfb 1x7 32ch @22", 16, 22, 22, 32, 32, 1, 7, ""),
    ("ra4 conv 256ch @11 5x5", 16, 11, 11, 256, 256, 5, 5, ""),
    # --- gald hardnet odd widths @512 input (taps 128/64/32/16) ---
    ("hardnet 214ch @32", 16, 32, 32, 214, 214, 3, 3, ""),
    ("hardnet 214->256 pad", 16, 32, 32, 256, 256, 3, 3, ""),
    ("hardnet 128ch @64", 16, 64, 64, 128, 128, 3, 3, ""),
    ("hardnet 320ch @32", 16, 32, 32, 320, 320, 3, 3, ""),
    ("hardnet 640ch @16", 16, 16, 16, 640, 640, 3, 3, ""),
    # --- pranet wide 1x1s (62% of its fwd FLOPs per conv inventory) ---
    ("res2net conv3 L1 1x1", 16, 88, 88, 104, 256, 1, 1, ""),
    ("res2net conv1 L1 1x1", 16, 88, 88, 256, 104, 1, 1, ""),
    ("res2net conv3 L3 1x1", 16, 22, 22, 416, 1024, 1, 1, ""),
    ("res2net conv1 L4 1x1", 16, 11, 11, 2048, 832, 1, 1, ""),
    ("pranet stem 3x3 32->64", 16, 176, 176, 32, 64, 3, 3, "18.3 GFLOP, biggest pranet conv"),
    # --- reference ceiling ---
    ("ceiling 512ch @64", 16, 64, 64, 512, 512, 3, 3, "known ~105 TFLOPs"),
]

def bench_s2d_chain(name, b, h, w, c, n_convs=3, reps=REPS):
    """Chain of n 3x3 stride-1 convs at width c: plain NHWC vs s2d-packed
    (one s2d in, n dense [2,2,4c,4c] convs, one d2s out) — the realistic
    pranet Bottle2neck branch-section shapes, transposes included."""
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (b, h, w, c), jnp.bfloat16)
    ks = [jax.random.normal(jax.random.PRNGKey(i + 1), (3, 3, c, c),
                            jnp.bfloat16) * 0.05 for i in range(n_convs)]
    kb = [jax.random.normal(jax.random.PRNGKey(i + 100), (2, 2, 4 * c, 4 * c),
                            jnp.bfloat16) * 0.05 for i in range(n_convs)]

    @jax.jit
    def plain(x, ks):
        for k in ks:
            x = lax.conv_general_dilated(
                x, k, (1, 1), ((1, 1), (1, 1)),
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
        return jnp.sum(x[0, 0, 0])

    @jax.jit
    def s2d(x, kb):
        xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
        bb, hp, wp, cc = xp.shape
        xb = xp.reshape(bb, hp // 2, 2, wp // 2, 2, cc).transpose(
            0, 1, 3, 2, 4, 5).reshape(bb, hp // 2, wp // 2, 4 * cc)
        for k in kb:
            xb = lax.conv_general_dilated(
                xb, k, (1, 1), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
        return jnp.sum(xb[0, 0, 0])

    for tag, fn, args in [("plain", plain, ks), ("s2d", s2d, kb)]:
        t = fn(x, args)
        float(t)
        t0 = time.perf_counter()
        for _ in range(reps):
            t = fn(x, args)
        float(t)
        dt = (time.perf_counter() - t0) / reps
        print(json.dumps({"case": f"{name} {tag}", "c": c,
                          "ms_per_chain": round(dt * 1e3, 3)}), flush=True)


if __name__ == "__main__":
    print(json.dumps({"devices": str(jax.devices())}), flush=True)
    for c in CASES:
        bench_case(*_shrink(c))
    if TINY:
        bench_s2d_chain("branch L1 tiny", 2, 12, 12, 26)
    else:
        bench_s2d_chain("branch L1 @88", 16, 88, 88, 26)
        bench_s2d_chain("branch L2 @44", 16, 44, 44, 52)
        bench_s2d_chain("rfb @44", 16, 44, 44, 32)
