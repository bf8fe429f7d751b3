"""Attn-family (EfficientNet-B2 UNet @512) per-op chip probe.

Answers, with measurement: where do the 104 ms/step go — narrow-contraction
expand 1x1s, VPU depthwise, narrow decoder convs, or something else — and
whether s2d rescues the narrow 3x3 decoder convs.  Run on the real chip.
"""
import json
import os

import time

import jax
import jax.numpy as jnp
from jax import lax

import sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")

TINY = bool(os.environ.get("PROBE_TINY"))
if TINY:
    jax.config.update("jax_platforms", "cpu")

REPS = 2 if TINY else 10
CHAIN = 2 if TINY else 10
SCALE = 8 if TINY else 1


def timed(name, fn, *args, reps=REPS, extra=None):
    t = fn(*args)
    float(jnp.sum(t) if hasattr(t, "shape") else t)
    t0 = time.perf_counter()
    for _ in range(reps):
        t = fn(*args)
    float(jnp.sum(t) if hasattr(t, "shape") else t)
    dt = (time.perf_counter() - t0) / reps
    row = {"case": name, "ms": round(dt * 1e3, 3)}
    if extra:
        row.update(extra)
    print(json.dumps(row), flush=True)
    return dt


def conv_chain(b, h, w, ci, co, k, groups=1, stride=1, n=CHAIN):
    """n chained convs (ci->co->co->...); returns ms per conv + tflops."""
    x = jax.random.normal(jax.random.PRNGKey(0), (b, h, w, ci), jnp.bfloat16)
    k0 = jax.random.normal(jax.random.PRNGKey(1),
                           (k, k, ci // groups, co), jnp.bfloat16) * 0.05
    kn = jax.random.normal(jax.random.PRNGKey(2),
                           (k, k, co // (groups if ci == co else 1) if groups > 1 else co, co),
                           jnp.bfloat16) * 0.05

    gn = groups

    @jax.jit
    def run(x, k0, kn):
        y = lax.conv_general_dilated(
            x, k0, (stride, stride), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=gn)
        g2 = co if gn > 1 else 1
        for _ in range(n - 1):
            y = lax.conv_general_dilated(
                y, kn, (1, 1), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                feature_group_count=g2)
        return jnp.sum(y[0, 0, 0])

    t = run(x, k0, kn)
    float(t)
    t0 = time.perf_counter()
    for _ in range(REPS):
        t = run(x, k0, kn)
    float(t)
    dt = (time.perf_counter() - t0) / (REPS * n)
    oh, ow = h // stride, w // stride
    fl = 2 * b * oh * ow * co * k * k * (co // (co if gn > 1 else 1) if gn > 1 else co)
    # first conv differs slightly; report chain average with follow-on flops
    print(json.dumps({"case": f"conv {k}x{k} g{groups} s{stride} "
                              f"[{b},{h},{w},{ci}]->{co}",
                      "us_per_conv": round(dt * 1e6, 1),
                      "tflops": round(fl / dt / 1e12, 2)}), flush=True)


print(json.dumps({"devices": str(jax.devices())}), flush=True)

B = 2 if TINY else 16
S = SCALE
# --- encoder: narrow-contraction expands (1x1) ---
conv_chain(B, 256 // S, 256 // S, 16, 96, 1)
conv_chain(B, 128 // S, 128 // S, 24, 144, 1)
conv_chain(B, 64 // S, 64 // S, 48, 288, 1)
conv_chain(B, 256 // S, 256 // S, 128, 128, 1)   # control: square 1x1
# --- encoder: depthwise (VPU) ---
conv_chain(B, 256 // S, 256 // S, 96, 96, 3, groups=96)
conv_chain(B, 128 // S, 128 // S, 144, 144, 3, groups=144)
conv_chain(B, 64 // S, 64 // S, 288, 288, 5, groups=288)
conv_chain(B, 32 // S, 32 // S, 528, 528, 5, groups=528)
# --- decoder: narrow 3x3 convs, plain vs s2d policy ---
conv_chain(B, 256 // S, 256 // S, 24, 24, 3)
conv_chain(B, 256 // S, 256 // S, 8, 8, 3)
conv_chain(B, 128 // S, 128 // S, 48, 48, 3)
# --- controls ---
conv_chain(B, 64 // S, 64 // S, 512, 512, 3)     # known ~105 TFLOPs ceiling

# --- whole-model attribution: encoder fwd vs full fwd vs train step ---
from rnd_semantic_segmentation_tpu.models.attn_unet import (
    AttnEfficientNetUnet)
from rnd_semantic_segmentation_tpu.models.efficientnet import (
    EfficientNetEncoder)

SZ = 512 // S
x = jax.random.normal(jax.random.PRNGKey(0), (B, SZ, SZ, 3), jnp.bfloat16)
enc = EfficientNetEncoder("efficientnet-b2")
ve = enc.init(jax.random.PRNGKey(0), x[:1])

@jax.jit
def enc_fwd(v, x):
    eps = enc.apply(v, x)
    return jnp.sum(eps["reduction_5"][0, 0, 0].astype(jnp.float32))

timed(f"encoder fwd @{SZ} b{B}", enc_fwd, ve, x)

net = AttnEfficientNetUnet("efficientnet-b2", num_classes=2)
vn = net.init(jax.random.PRNGKey(0), x[:1])

@jax.jit
def full_fwd(v, x):
    outs = net.apply(v, x)
    return jnp.sum(outs[0][0, 0, 0].astype(jnp.float32))

timed(f"full fwd @{SZ} b{B}", full_fwd, vn, x)

@jax.jit
def enc_step(v, x):
    def loss(p):
        eps = enc.apply(p, x)
        return jnp.mean(eps["reduction_5"].astype(jnp.float32) ** 2)
    l, g = jax.value_and_grad(loss)(v)
    return l

timed(f"encoder fwd+bwd @{SZ} b{B}", enc_step, ve, x)

@jax.jit
def full_step(v, x):
    def loss(p):
        outs = net.apply(p, x)
        return sum(jnp.mean(o.astype(jnp.float32) ** 2) for o in outs)
    l, g = jax.value_and_grad(loss)(v)
    return l

timed(f"full fwd+bwd @{SZ} b{B}", full_step, vn, x)

# --- ConvTranspose A/B: dilated vs sub-pixel at the real attn shapes ---
from rnd_semantic_segmentation_tpu.ops.subpixel import conv_transpose_subpixel

def deconv_ab(b, h, w, ci, co):
    x = jax.random.normal(jax.random.PRNGKey(0), (b, h, w, ci), jnp.bfloat16)
    k = jax.random.normal(jax.random.PRNGKey(1), (4, 4, ci, co),
                          jnp.bfloat16) * 0.05

    @jax.jit
    def dilated(x, k):
        y = lax.conv_general_dilated(
            x, k, (1, 1), ((2, 2), (2, 2)), lhs_dilation=(2, 2),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        return jnp.sum(y[0, 0, 0])

    @jax.jit
    def subpix(x, k):
        y = conv_transpose_subpixel(x, k, (2, 2), (1, 1), 0)
        return jnp.sum(y[0, 0, 0])

    for tag, fn in [("dilated", dilated), ("subpixel", subpix)]:
        t = fn(x, k); float(t)
        t0 = time.perf_counter()
        for _ in range(REPS):
            t = fn(x, k)
        float(t)
        dt = (time.perf_counter() - t0) / REPS
        print(json.dumps({"case": f"deconv4x2 [{b},{h},{w},{ci}]->{co} {tag}",
                          "ms": round(dt * 1e3, 3)}), flush=True)

deconv_ab(B, 16 // (S if TINY else 1), 16 // (S if TINY else 1), 1408, 120)
deconv_ab(B, 256 // S, 256 // S, 16, 8)
deconv_ab(B, 64 // S, 64 // S, 120, 48)
