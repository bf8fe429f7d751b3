"""Conv-width roofline microbench (pranet/gald perf work, VERDICT r4 items 3+6).

Gen-2 methodology: see probes/_bench.py (fori_loop dispatch amortization +
full-tensor reduction).  The gen-1 numbers in early ROUND4.md notes were
dispatch-bound and DCE-inflated — trust these instead.

Each case times a shape-consistent chain of dependent convs (alternating
ci->co->ci so FLOPs/conv are identical) on the real chip.  For the s2d
sections we time BOTH what the Conv2d policy actually executes (a
pad/space-to-depth/conv/depth-to-space round trip per conv, ops/s2d.py) and
the amortized best case (one s2d in, n dense block convs, one d2s out).
"""
import json
import os

import jax
import jax.numpy as jnp
from jax import lax

import sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")

TINY = bool(os.environ.get("PROBE_TINY"))
if TINY:
    jax.config.update("jax_platforms", "cpu")

from probes._bench import time_loop  # noqa: E402

CHAIN = 2 if TINY else 8
ITERS = 2 if TINY else 25


def _shrink(case):
    if not TINY:
        return case
    name, b, h, w, ci, co, kh, kw, note = case
    return (name, 2, max(kh * 2, h // 8), max(kw * 2, w // 8), ci, co, kh,
            kw, note)


def conv(x, k):
    return lax.conv_general_dilated(
        x, k, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"))


def bench_case(name, b, h, w, cin, cout, kh, kw, note=""):
    x = jax.random.normal(jax.random.PRNGKey(0), (b, h, w, cin), jnp.bfloat16)
    ks = [jax.random.normal(jax.random.PRNGKey(i + 1),
                            (kh, kw, cin, cout) if i % 2 == 0
                            else (kh, kw, cout, cin),
                            jnp.bfloat16) * 0.05 for i in range(CHAIN)]
    if CHAIN % 2:
        raise ValueError("CHAIN must be even for a shape-consistent carry")

    def body(x):
        for k in ks:
            x = conv(x, k)
        return x

    dt = time_loop(body, x, iters=ITERS) / CHAIN
    flops = 2 * b * h * w * cout * kh * kw * cin  # same both directions
    tf = flops / dt / 1e12
    print(json.dumps({"case": name, "shape": [b, h, w, cin, cout, kh, kw],
                      "us_per_conv": round(dt * 1e6, 1),
                      "tflops": round(tf, 2),
                      "mxu_frac": round(tf / 197.0, 3), "note": note}),
          flush=True)


CASES = [
    # --- pranet res2net branch convs (352 input: taps 88/44/22/11) ---
    ("res2net L1 branch as-is", 16, 88, 88, 26, 26, 3, 3, ""),
    ("res2net L1 branch pad32", 16, 88, 88, 32, 32, 3, 3, "pad 26->32"),
    ("res2net L1 branch pad64", 16, 88, 88, 64, 64, 3, 3, "pad 26->64"),
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
    ("res2net conv3 L3 1x1", 16, 22, 22, 416, 1024, 1, 1, ""),
    ("res2net conv1 L4 1x1", 16, 11, 11, 2048, 832, 1, 1, ""),
    ("pranet stem 3x3 32->64", 16, 176, 176, 32, 64, 3, 3, "18.3 GFLOP, biggest pranet conv"),
    # --- reference ceiling ---
    ("ceiling 512ch @64", 16, 64, 64, 512, 512, 3, 3, "deeplab-body control"),
]


def bench_s2d(name, b, h, w, c, n_convs=4):
    """Width-c 3x3 stride-1 SAME chain: plain vs per-conv s2d round trip
    (what MODEL.S2D_MAX_CHANNELS actually executes) vs amortized block chain
    (one s2d in / one d2s out)."""
    from rnd_semantic_segmentation_tpu.ops.s2d import (
        conv2d_s2d, space_to_depth, depth_to_space)

    x = jax.random.normal(jax.random.PRNGKey(0), (b, h, w, c), jnp.bfloat16)
    ks = [jax.random.normal(jax.random.PRNGKey(i + 1), (3, 3, c, c),
                            jnp.bfloat16) * 0.05 for i in range(n_convs)]
    kb = [jax.random.normal(jax.random.PRNGKey(i + 100), (2, 2, 4 * c, 4 * c),
                            jnp.bfloat16) * 0.05 for i in range(n_convs)]

    def plain(x):
        for k in ks:
            x = conv(x, k)
        return x

    def s2d_rt(x):
        for k in ks:
            x = conv2d_s2d(x, k, (1, 1), ((1, 1), (1, 1)))
        return x

    def s2d_amortized(x):
        xb = space_to_depth(jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0))), 2)
        for k in kb:
            xb = lax.conv_general_dilated(
                xb, k, (1, 1), "VALID",
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
            xb = jnp.pad(xb, ((0, 0), (0, 1), (0, 1), (0, 0)))
        return depth_to_space(xb, 2)[:, :h, :w]

    rows = {}
    for tag, fn in [("plain", plain), ("s2d_roundtrip", s2d_rt),
                    ("s2d_amortized", s2d_amortized)]:
        dt = time_loop(fn, x, iters=ITERS) / n_convs
        rows[tag] = round(dt * 1e6, 1)
    print(json.dumps({"case": name, "c": c, "us_per_conv": rows}), flush=True)


if __name__ == "__main__":
    print(json.dumps({"devices": str(jax.devices())}), flush=True)
    for c in CASES:
        bench_case(*_shrink(c))
    if TINY:
        bench_s2d("branch L1 tiny", 2, 12, 12, 26)
    else:
        bench_s2d("branch L1 @88", 16, 88, 88, 26)
        bench_s2d("branch L2 @44", 16, 44, 44, 52)
        bench_s2d("rfb @44", 16, 44, 44, 32)
