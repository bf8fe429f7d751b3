"""Fused-MBConv kernel A/B: Pallas (ops/mbconv.py) vs composed XLA ops.

Cases are the EfficientNet-B2 @512 eval stage geometries (attn family,
b16) — every stride-1 expanded block the MODEL.FUSED_MBCONV policy would
rewrite.  Both arms close the carry loop with the same 1x1 projection back
to C channels plus a residual blend, so the delta isolates the fused
segment.  probes/_bench.py methodology (fori_loop amortization, full-tensor
reduction).
"""
import json
import os
import sys

import jax
import jax.numpy as jnp
from jax import lax

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")

TINY = bool(os.environ.get("PROBE_TINY"))
if TINY:
    jax.config.update("jax_platforms", "cpu")

from probes._bench import time_loop  # noqa: E402
from rnd_semantic_segmentation_tpu.ops.mbconv import (  # noqa: E402
    fused_mbconv_core_jnp, fused_mbconv_core_pallas)

ITERS = 2 if TINY else 25
B = 2 if TINY else 16

# (name, H, C, F, k) — B2 @512 stride-1 expanded blocks (W == H)
CASES = [
    ("s2 @128 24->144 k3", 128, 24, 144, 3),
    ("s3 @64 48->288 k5", 64, 48, 288, 5),
    ("s4 @32 88->528 k3", 32, 88, 528, 3),
    ("s5a @32 88->528 k5", 32, 88, 528, 5),
    ("s5 @32 120->720 k5", 32, 120, 720, 5),
    ("s6 @16 208->1248 k5", 16, 208, 1248, 5),
    ("s7 @16 352->2112 k3", 16, 352, 2112, 3),
]


def make_args(h, c, f, k):
    ks = jax.random.split(jax.random.PRNGKey(0), 8)
    x = jax.random.normal(ks[0], (B, h, h, c), jnp.bfloat16)
    we = jax.random.normal(ks[1], (c, f), jnp.bfloat16) * 0.1
    wd = jax.random.normal(ks[2], (k, k, f), jnp.float32) * 0.2
    s0 = 1.0 + 0.05 * jax.random.normal(ks[3], (f,))
    b0 = 0.05 * jax.random.normal(ks[4], (f,))
    s1 = 1.0 + 0.05 * jax.random.normal(ks[5], (f,))
    b1 = 0.05 * jax.random.normal(ks[6], (f,))
    wp = jax.random.normal(ks[7], (f, c), jnp.bfloat16) * 0.05
    return x, we, s0, b0, wd, s1, b1, wp


def xla_segment(x, we, s0, b0, wd, s1, b1):
    e = lax.conv_general_dilated(
        x, we[None, None].astype(x.dtype), (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    e = e.astype(jnp.float32) * s0 + b0
    e = (e * jax.nn.sigmoid(e)).astype(x.dtype)
    y = lax.conv_general_dilated(
        e, wd[:, :, None, :].astype(x.dtype), (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=e.shape[-1])
    y = y.astype(jnp.float32) * s1 + b1
    return (y * jax.nn.sigmoid(y)).astype(x.dtype)


def run_case(name, h, c, f, k):
    x, we, s0, b0, wd, s1, b1, wp = make_args(h, c, f, k)

    def close(x, y):  # identical tail in both arms
        p = lax.conv_general_dilated(
            y, wp[None, None], (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        return x * jnp.asarray(0.7, x.dtype) + p

    def body_xla(x):
        return close(x, xla_segment(x, we, s0, b0, wd, s1, b1))

    if TINY:
        def body_fused(x):
            return close(x, fused_mbconv_core_jnp(x, we, s0, b0, wd, s1, b1))
    else:
        def body_fused(x):
            return close(x, fused_mbconv_core_pallas(x, we, s0, b0, wd, s1, b1))

    t_x = time_loop(body_xla, x, iters=ITERS, damp=False)
    t_f = time_loop(body_fused, x, iters=ITERS, damp=False)
    # effective HBM bytes of the fused segment's irreducible traffic
    bytes_min = 2 * B * h * h * (c + f)
    print(json.dumps({
        "case": name, "xla_us": round(t_x * 1e6, 1),
        "fused_us": round(t_f * 1e6, 1),
        "speedup": round(t_x / t_f, 3),
        "fused_gbps_floor": round(bytes_min / t_f / 1e9, 1)}), flush=True)


print(json.dumps({"devices": str(jax.devices())}), flush=True)
for case in CASES:
    run_case(*case)
