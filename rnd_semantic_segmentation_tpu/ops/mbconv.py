"""Fused MBConv segment (expand 1x1 -> BN+swish -> depthwise -> BN+swish).

Why: the attn family (EfficientNet encoder, reference
/root/reference/core/models/classifiers/attn/eff.py:16-96) is
bandwidth-bound, and the gen-2 chip probes (ROUND4.md) localized the waste:
the 6x-expanded tensor makes two full HBM round trips between the expand 1x1
and the depthwise conv, and the expand itself streams at only ~52% of HBM
roofline because its 16-channel operand fills 16 of 128 lanes.  Depthwise
compute is near the VPU roofline (73%) and cannot be made faster — but its
*input* can come from VMEM instead of HBM.

This kernel computes, per spatial tile, entirely in VMEM:

    y = swish(aff1(dwconv_k(swish(aff0(x @ W_exp)))))

reading only the narrow (C-channel) input from HBM and writing only the final
activated tensor.  ``aff0/aff1`` are folded BatchNorm affines (eval running
stats), so this is the serving/eval path; the train path keeps the XLA ops.
Stride-1, odd-k, TF-SAME depthwise only (the stride-2 stage transitions and
the expand_ratio==1 stem stay in XLA).

**Chip verdict (round 4, probes/probe_mbconv.py): measured-unprofitable.**
After engineering through four Mosaic/XLA failure modes (see _kernel notes),
the best fused variant still loses to plain XLA at every B2 stage geometry
(0.47x @128², 0.51x @64², 0.65-0.89x at 32²/16²).  The HBM bytes saved are
real, but Mosaic's generated code for the k² shifted-window taps (sublane-
misaligned vector loads -> per-tap relayouts) and the narrow-lane (C<128)
reshape/relayout around the expand dot cost more than the saved traffic —
XLA's mature conv lowering wins.  MODEL.FUSED_MBCONV stays default-off; the
kernel + parity tests remain as the evidence and as a correct worked example
of halo-slab blocking under the v5e 16M scoped-vmem limit.

The input arrives zero-padded by (k-1)//2 from XLA (one cheap C-channel pad);
inside the kernel the expand+swish output is re-masked to zero on the padding
ring so the depthwise sees exactly TF-SAME semantics.

``fused_mbconv_core`` auto-selects the Pallas kernel on TPU (with a VMEM
guard) and the jnp oracle elsewhere; models/efficientnet.py consults the
trace-time policy (MODEL.FUSED_MBCONV) the same way Conv2d consults the
quant/s2d scopes — and with the same jit-staleness caveat.
"""

from __future__ import annotations

import contextlib
import contextvars
import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

try:  # pltpu only imports cleanly when a TPU plugin is present
    from jax.experimental.pallas import tpu as pltpu
except Exception:  # pragma: no cover
    pltpu = None

# ---------------------------------------------------------------------------
# trace-time policy (MODEL.FUSED_MBCONV; set by models/build.py)
# ---------------------------------------------------------------------------

_FUSED: contextvars.ContextVar = contextvars.ContextVar(
    "segtpu_fused_mbconv", default=False)


def set_mbconv_fusion_policy(enabled: bool) -> None:
    _FUSED.set(bool(enabled))


def mbconv_fusion_enabled() -> bool:
    return bool(_FUSED.get())


@contextlib.contextmanager
def mbconv_fusion_scope(enabled: bool):
    token = _FUSED.set(bool(enabled))
    try:
        yield
    finally:
        _FUSED.reset(token)


# ---------------------------------------------------------------------------
# jnp oracle (also the CPU execution path)
# ---------------------------------------------------------------------------

def _swish_f32(x):
    return x * jax.nn.sigmoid(x)


def fused_mbconv_core_jnp(x, w_exp, s0, b0, w_dw, s1, b1):
    """[B,H,W,C] -> [B,H,W,F]; w_exp [C,F], w_dw [k,k,F], affines [F] f32."""
    from jax import lax
    k = w_dw.shape[0]
    e = jnp.einsum("bhwc,cf->bhwf", x.astype(jnp.float32),
                   w_exp.astype(jnp.float32))
    e = _swish_f32(e * s0 + b0)
    # depthwise via feature_group_count
    kern = w_dw.astype(jnp.float32)[:, :, None, :]  # [k,k,1,F]
    y = lax.conv_general_dilated(
        e, kern, (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=e.shape[-1])
    y = _swish_f32(y * s1 + b1)
    return y.astype(x.dtype)


# ---------------------------------------------------------------------------
# Pallas TPU kernel
# ---------------------------------------------------------------------------

def _kernel(xp_ref, we_ref, aff_ref, wdw_ref, o_ref, xe_ref,
            *, th: int, h: int, w: int, k: int):
    # Three hard-won Mosaic/XLA rules (all chip-measured failures):
    #  * The input arrives as PRE-MATERIALIZED overlapping halo slabs
    #    [B, nH, th+2p, W', C] so each grid step's block is a plain
    #    non-overlapping window.  A whole-image VMEM input block made XLA
    #    pin the padded operand in VMEM whenever it was produced by other
    #    ops in the same graph (19.8M > the v5e 16M scoped limit; the same
    #    kernel compiled fine standalone) — and a manual HBM->VMEM DMA of
    #    the halo'd row slab is rejected by Mosaic unless the sliced copy's
    #    last two dims are (8, 128)-tile-aligned, which C<128 can never be.
    #    Materializing the slabs costs one extra XLA pass over the NARROW
    #    C-channel tensor — noise next to the 6C-tensor round trips saved.
    #  * compute is staged through scratch refs with one store per
    #    statement — a single dataflow expression over the 9/25 shifted
    #    tile slices blew the scoped stack to 22-25M.
    p = (k - 1) // 2
    h_idx = pl.program_id(1)
    rows = xp_ref[0, 0]                                   # [th+2p, W', C]
    rh, rw, c = rows.shape
    f = we_ref.shape[-1]

    e = jax.lax.dot_general(
        rows.reshape(rh * rw, c), we_ref[:],
        (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32).reshape(rh, rw, f)
    e = _swish_f32(e * aff_ref[0] + aff_ref[1])

    # zero the SAME-padding ring: cols outside [p, p+W); rows whose global
    # padded index is outside [p, p+H)
    ii = jax.lax.broadcasted_iota(jnp.int32, (rh, rw, 1), 0)
    jj = jax.lax.broadcasted_iota(jnp.int32, (rh, rw, 1), 1)
    g0 = h_idx * th  # global padded index of local row 0
    valid = ((ii + g0 >= p) & (ii + g0 < p + h)
             & (jj >= p) & (jj < p + w))
    # xe is staged in the activation dtype (bf16 on TPU) — same precision as
    # the unfused path's materialized expand output, half the tap-load bytes
    xe_ref[:] = jnp.where(valid, e, 0.0).astype(xe_ref.dtype)

    # depthwise: accumulate the k² shifted taps in registers (per-statement
    # acc_ref staging cost 4 VMEM tile passes per tap and lost to XLA 2:1)
    acc = jnp.zeros((th, w, f), jnp.float32)
    for dh in range(k):
        for dw2 in range(k):
            acc = acc + (xe_ref[dh:dh + th, dw2:dw2 + w, :].astype(jnp.float32)
                         * wdw_ref[dh, dw2][None, None, :])
    acc = _swish_f32(acc * aff_ref[2] + aff_ref[3])
    o_ref[0] = acc.astype(o_ref.dtype)


def _pick_th(h: int, w: int, c: int, f: int, k: int,
             budget: int = 10 * 2 ** 20) -> Optional[int]:
    """Largest divisor-of-H tile height whose VMEM footprint fits.

    Mosaic's scoped-vmem accounting (v5e limit 16M) charges, beyond the
    declared blocks, the kernel's live intermediates: the pre-mask expand
    value (~1.5x the xe scratch with the dot output) and the depthwise
    accumulator — measured on chip: the naive blocks-only estimate OOMed at
    25.4M vs 16M on [16,128,128,24]->144.
    """
    p = (k - 1) // 2
    for th in sorted({d for d in range(1, h + 1) if h % d == 0}, reverse=True):
        slab = (th + 2 * p) * (w + 2 * p) * c * 2 * 2  # double-buffered window
        xe = (th + 2 * p) * (w + 2 * p) * f * 2
        acc = th * w * f * 4 * 2  # register accumulator + expression temps
        e = (th + 2 * p) * (w + 2 * p) * f * 4 * 2  # f32 expand value + temps
        out = th * w * f * 2 * 2  # double-buffered output block
        if slab + xe + acc + e + out <= budget:
            return th
    return None


def fused_mbconv_core_pallas(x, w_exp, s0, b0, w_dw, s1, b1, *,
                             interpret: bool = False,
                             vmem_budget: int = 10 * 2 ** 20):
    b, h, w, c = x.shape
    k = int(w_dw.shape[0])
    f = int(w_exp.shape[-1])
    p = (k - 1) // 2
    th = _pick_th(h, w, c, f, k, vmem_budget)
    assert th is not None, "no tile fits VMEM; caller should have guarded"

    rw = w + 2 * p
    nh = h // th
    xp = jnp.pad(x, ((0, 0), (p, p), (p, p), (0, 0)))
    # overlapping halo slabs [B, nH, th+2p, W+2p, C] (see _kernel notes)
    slabs = jnp.stack(
        [jax.lax.slice_in_dim(xp, j * th, j * th + th + 2 * p, axis=1)
         for j in range(nh)], axis=1)
    aff = jnp.stack([jnp.asarray(a, jnp.float32) for a in (s0, b0, s1, b1)])
    kern = functools.partial(_kernel, th=th, h=h, w=w, k=k)
    return pl.pallas_call(
        kern,
        grid=(b, nh),
        in_specs=[
            pl.BlockSpec((1, 1, th + 2 * p, rw, c), lambda i, j: (i, j, 0, 0, 0)),
            pl.BlockSpec((c, f), lambda i, j: (0, 0)),
            pl.BlockSpec((4, f), lambda i, j: (0, 0)),
            pl.BlockSpec((k, k, f), lambda i, j: (0, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, th, w, f), lambda i, j: (i, j, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((b, h, w, f), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((th + 2 * p, rw, f), x.dtype),
        ],
        interpret=interpret,
    )(slabs, w_exp, aff, w_dw.astype(jnp.float32))


def fused_mbconv_applies(x_shape: Tuple[int, ...], k: int, f: int) -> bool:
    """Shape gate: stride-1 odd-k fused path with a VMEM-fitting tile."""
    if len(x_shape) != 4 or k % 2 == 0:
        return False
    b, h, w, c = x_shape
    return _pick_th(h, w, c, f, k) is not None


def fused_mbconv_core(x, w_exp, s0, b0, w_dw, s1, b1,
                      use_pallas: Optional[bool] = None):
    """Auto-selecting entry: Pallas on TPU, jnp oracle elsewhere."""
    if use_pallas is None:
        use_pallas = (pltpu is not None
                      and jax.default_backend() not in ("cpu",))
    if use_pallas:
        return fused_mbconv_core_pallas(x, w_exp, s0, b0, w_dw, s1, b1)
    return fused_mbconv_core_jnp(x, w_exp, s0, b0, w_dw, s1, b1)
