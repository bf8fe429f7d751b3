"""Attn-family (EfficientNet-B2 UNet @512) per-op chip probe.

Answers, with measurement: where do the 104 ms/step go — narrow-contraction
expand 1x1s, VPU depthwise, narrow decoder convs, dilated ConvTranspose — and
which rewrite (s2d policy, sub-pixel deconv, Pallas fusion) pays.

Gen-2 methodology: probes/_bench.py (fori_loop dispatch amortization +
full-tensor reduction; the gen-1 numbers were dispatch-bound/DCE-inflated).
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

from probes._bench import time_loop  # noqa: E402

ITERS = 2 if TINY else 25
CHAIN = 2 if TINY else 8
SCALE = 8 if TINY else 1
# rerun a subset of sections, e.g. PROBE_SECTIONS=bwd (each probe function
# no-ops when its section is off)
SECTIONS = set(filter(None, os.environ.get(
    "PROBE_SECTIONS", "fwd,bwd,model,deconv").split(",")))


def conv_chain(b, h, w, ci, co, k, groups=1):
    """Shape-consistent chain: alternating ci->co->ci (dense) or a same-width
    depthwise chain (groups=ci=co).  us/conv + achieved tflops."""
    if "fwd" not in SECTIONS:
        return
    x = jax.random.normal(jax.random.PRNGKey(0), (b, h, w, ci), jnp.bfloat16)
    if groups > 1:
        assert ci == co
        ks = [jax.random.normal(jax.random.PRNGKey(i + 1), (k, k, 1, co),
                                jnp.bfloat16) * 0.05 for i in range(CHAIN)]
    else:
        ks = [jax.random.normal(jax.random.PRNGKey(i + 1),
                                (k, k, ci, co) if i % 2 == 0
                                else (k, k, co, ci),
                                jnp.bfloat16) * 0.05 for i in range(CHAIN)]

    def body(x):
        for kk in ks:
            x = lax.conv_general_dilated(
                x, kk, (1, 1), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                feature_group_count=groups)
        return x

    dt = time_loop(body, x, iters=ITERS) / CHAIN
    fl = 2 * b * h * w * k * k * (co if groups > 1 else ci * co)
    print(json.dumps({"case": f"conv {k}x{k} g{groups} [{b},{h},{w},{ci}]<->{co}",
                      "us_per_conv": round(dt * 1e6, 1),
                      "tflops": round(fl / dt / 1e12, 2),
                      "gbps": round((2 * b * h * w * (ci + co)) / dt / 1e9, 1)}),
          flush=True)


def timed(name, fn, *args, reps=(2 if TINY else 5), extra=None):
    """Whole-model timer: workloads here are >=50 ms, dispatch is <5% — plain
    repeated dispatch is fine; reductions inside fn must be full-tensor."""
    if "model" not in SECTIONS:
        return 0.0
    t = fn(*args)
    float(t)
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        t = fn(*args)
        float(t)
        best = min(best, time.perf_counter() - t0)
    row = {"case": name, "ms": round(best * 1e3, 3)}
    if extra:
        row.update(extra)
    print(json.dumps(row), flush=True)
    return best


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
# --- decoder: narrow 3x3 convs ---
conv_chain(B, 256 // S, 256 // S, 24, 24, 3)
conv_chain(B, 256 // S, 256 // S, 8, 8, 3)
conv_chain(B, 128 // S, 128 // S, 48, 48, 3)
# --- controls ---
conv_chain(B, 64 // S, 64 // S, 512, 512, 3)     # deeplab-body ceiling


# --- BACKWARD: dw-bwd chain vs its HBM roofline (VERDICT r4 item 4) -------
# The round-4 roofline closed the attn TRAIN story by argument ("the encoder
# backward is bounded by dw VPU compute like the forward"); this section
# measures it.  One bwd application = fwd recompute + dgrad + wgrad of the
# whole chain (grads taken w.r.t. x AND the kernels; the wgrad sum is folded
# into the carry at 1e-20 scale so XLA cannot DCE it).  A ReLU between the
# convs is ESSENTIAL: without it the chain is linear, so every dy is
# x-independent and XLA constant-folds the ENTIRE dgrad chain at compile
# time — the first cut of this probe read an impossible 291 "TFLOPs" on the
# MXU control that way (only fwd+wgrad actually executed).  The real
# encoder has swish between convs, so relu also makes the chain
# representative.  Byte model per conv: fwd read x + write y, dgrad read
# dy (+mask) write dx, wgrad read x + dy -> ~6 activation tensors of bf16
# traffic; FLOPs = 3x fwd (relu flops ignored).
def bwd_chain(b, h, w, ci, co, k, groups=1):
    if "bwd" not in SECTIONS:
        return
    x = jax.random.normal(jax.random.PRNGKey(0), (b, h, w, ci), jnp.bfloat16)
    if groups > 1:
        assert ci == co
        ks = [jax.random.normal(jax.random.PRNGKey(i + 1), (k, k, 1, co),
                                jnp.bfloat16) * 0.05 for i in range(CHAIN)]
    else:
        ks = [jax.random.normal(jax.random.PRNGKey(i + 1),
                                (k, k, ci, co) if i % 2 == 0
                                else (k, k, co, ci),
                                jnp.bfloat16) * 0.05 for i in range(CHAIN)]

    def loss(xx, kks):
        y = xx
        for kk in kks:
            y = lax.conv_general_dilated(
                y, kk, (1, 1), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                feature_group_count=groups)
            y = jax.nn.relu(y)  # nonlinearity: keeps the dgrad chain real
        return jnp.sum(y.astype(jnp.float32))

    def body(xc):
        dx, dks = jax.grad(loss, argnums=(0, 1))(xc, ks)
        wsum = sum(jnp.sum(g.astype(jnp.float32)) for g in dks)
        return dx + (wsum * 1e-20).astype(dx.dtype)

    dt = time_loop(body, x, iters=ITERS) / CHAIN
    fl = 3 * 2 * b * h * w * k * k * (co if groups > 1 else ci * co)
    by = 6 * b * h * w * max(ci, co) * 2
    print(json.dumps({"case": f"BWD conv {k}x{k} g{groups} "
                              f"[{b},{h},{w},{ci}]<->{co}",
                      "us_per_conv_bwd": round(dt * 1e6, 1),
                      "tflops": round(fl / dt / 1e12, 2),
                      "gbps_bytemodel": round(by / dt / 1e9, 1)}),
          flush=True)


# the dominant encoder dw stages at 256²/128² + the expand 1x1, and the
# square-1x1/wide-3x3 controls whose fwd rooflines are known (831 GB/s HBM,
# ~105 TFLOPS MXU)
bwd_chain(B, 256 // S, 256 // S, 96, 96, 3, groups=96)
bwd_chain(B, 128 // S, 128 // S, 144, 144, 3, groups=144)
bwd_chain(B, 256 // S, 256 // S, 16, 96, 1)
bwd_chain(B, 256 // S, 256 // S, 128, 128, 1)    # control: square 1x1
bwd_chain(B, 64 // S, 64 // S, 512, 512, 3)      # control: MXU ceiling

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
    return jnp.sum(eps["reduction_5"].astype(jnp.float32))

timed(f"encoder fwd @{SZ} b{B}", enc_fwd, ve, x)

net = AttnEfficientNetUnet("efficientnet-b2", num_classes=2)
vn = net.init(jax.random.PRNGKey(0), x[:1])

@jax.jit
def full_fwd(v, x):
    outs = net.apply(v, x)
    return sum(jnp.sum(o.astype(jnp.float32)) for o in outs)

timed(f"full fwd @{SZ} b{B}", full_fwd, vn, x)

@jax.jit
def enc_step(v, x):
    def loss(p):
        eps = enc.apply(p, x)
        return jnp.mean(eps["reduction_5"].astype(jnp.float32) ** 2)
    l, g = jax.value_and_grad(loss)(v)
    return l + sum(jnp.sum(t.astype(jnp.float32)) for t in jax.tree.leaves(g)) * 1e-12

timed(f"encoder fwd+bwd @{SZ} b{B}", enc_step, ve, x)

@jax.jit
def full_step(v, x):
    def loss(p):
        outs = net.apply(p, x)
        return sum(jnp.mean(o.astype(jnp.float32) ** 2) for o in outs)
    l, g = jax.value_and_grad(loss)(v)
    # fold grads into the result so nothing is DCE'd
    return l + sum(jnp.sum(t.astype(jnp.float32)) for t in jax.tree.leaves(g)) * 1e-12

timed(f"full fwd+bwd @{SZ} b{B}", full_step, vn, x)

# --- ConvTranspose A/B: dilated vs sub-pixel at the real attn shapes.
# Carry trick: deconv (h->2h, ci->co) then a fixed stride-2 conv (co->ci)
# restores the carry shape; the stride-2 conv is identical across variants
# and measured alone as a control, so (variant - control) isolates the deconv.
from rnd_semantic_segmentation_tpu.ops.subpixel import conv_transpose_subpixel


def deconv_ab(b, h, w, ci, co):
    if "deconv" not in SECTIONS:
        return
    x = jax.random.normal(jax.random.PRNGKey(0), (b, h, w, ci), jnp.bfloat16)
    k = jax.random.normal(jax.random.PRNGKey(1), (4, 4, ci, co),
                          jnp.bfloat16) * 0.05
    kd = jax.random.normal(jax.random.PRNGKey(2), (3, 3, co, ci),
                           jnp.bfloat16) * 0.05
    # control: matches the down conv's FLOPs exactly (2*b*h*w*ci*9*co both),
    # so (variant - control) isolates the upsampler's cost
    kid = jax.random.normal(jax.random.PRNGKey(3), (3, 3, ci, co),
                            jnp.bfloat16) * 0.05
    kid2 = jax.random.normal(jax.random.PRNGKey(4), (3, 3, co, ci),
                             jnp.bfloat16) * 0.05

    def down(y, kk):
        return lax.conv_general_dilated(
            y, kk, (2, 2), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"))

    def dilated(x):
        y = lax.conv_general_dilated(
            x, k, (1, 1), ((2, 2), (2, 2)), lhs_dilation=(2, 2),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        return down(y, kd)

    def subpix(x):
        y = conv_transpose_subpixel(x, k, (2, 2), (1, 1), 0)
        return down(y, kd)

    def control(x):
        # two convs whose combined FLOPs = 2x the down conv; halve when
        # comparing (shape-consistent carry needs the round trip)
        y = lax.conv_general_dilated(
            x, kid, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"))
        return lax.conv_general_dilated(
            y, kid2, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"))

    for tag, fn in [("dilated+down", dilated), ("subpixel+down", subpix),
                    ("control 2xdownflops", control)]:
        dt = time_loop(fn, x, iters=ITERS)
        print(json.dumps({"case": f"deconv4x2 [{b},{h},{w},{ci}]->{co} {tag}",
                          "us": round(dt * 1e6, 1)}), flush=True)


deconv_ab(B, 16 // (S if TINY else 1), 16 // (S if TINY else 1), 1408, 120)
deconv_ab(B, 256 // S, 256 // S, 16, 8)
deconv_ab(B, 64 // S, 64 // S, 120, 48)
