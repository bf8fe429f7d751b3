"""Criss-cross (axial H+W) attention core — Pallas TPU kernel + jnp reference.

The reference implementation (ccnet.py:29-126) lowers to 6 bmms with awkward
permutes and materializes the [B,H,W,H+W] energy tensor in HBM.  The Pallas
kernel fuses the energies, the joint softmax over the concatenated H+W axis
(with the -inf diagonal on the H branch), and both aggregations into one
VMEM-resident pass per batch element.

Mosaic constraint honored: every in-kernel ``dot_general`` carries its batch
dimension at position 0, so the H-branch operands arrive pre-transposed
(W-major) from XLA and the kernel emits the H-branch numerator W-major; the
cheap elementwise combine/normalize happens outside where XLA fuses it.

``cc_attention_core`` is the functional core used by
models/gcpa.py:CrissCrossAttention; ``use_pallas=None`` auto-selects the
kernel on TPU and the jnp path elsewhere.  The jnp path is the parity oracle.
The backward is a second fused kernel (flash-attention style: recompute
energies + joint softmax in VMEM, then 8 batched contractions emit per-branch
dq/dk/dv numerators); interpret-mode CPU tests cover both kernels and the
custom VJP (tests/test_ccattn_interpret.py).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

try:  # pltpu only imports cleanly when a TPU plugin is present
    from jax.experimental.pallas import tpu as pltpu
except Exception:  # pragma: no cover
    pltpu = None


def cc_attention_core_jnp(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """[B,H,W,Cq] x2, [B,H,W,C] -> [B,H,W,C] criss-cross aggregation."""
    b, h, w, _ = q.shape
    qf, kf, vf = (t.astype(jnp.float32) for t in (q, k, v))
    energy_h = jnp.einsum("bhwc,bkwc->bhwk", qf, kf)
    diag = jnp.eye(h, dtype=bool)[None, :, None, :]
    energy_h = jnp.where(diag, -jnp.inf, energy_h)
    energy_w = jnp.einsum("bhwc,bhkc->bhwk", qf, kf)
    att = jax.nn.softmax(jnp.concatenate([energy_h, energy_w], axis=-1), axis=-1)
    att_h, att_w = att[..., :h], att[..., h:]
    out_h = jnp.einsum("bhwk,bkwc->bhwc", att_h, vf)
    out_w = jnp.einsum("bhwk,bhkc->bhwc", att_w, vf)
    return (out_h + out_w).astype(v.dtype)


def _cc_kernel(qh_ref, kh_ref, vh_ref, qw_ref, kw_ref, vw_ref,
               oh_ref, ow_ref, den_ref):
    """Inputs: *_h H-major [H,W,C*]; *_w W-major [W,H,C*].

    Outputs: numerators oh [W,H,C] (W-major!), ow [H,W,C], and the joint
    softmax denominator den [H,W,1] (un-normalized exp sums, max-shifted).
    """
    f32 = jnp.float32
    qh, kh, vh = qh_ref[...].astype(f32), kh_ref[...].astype(f32), vh_ref[...].astype(f32)
    qw, kw, vw = qw_ref[...].astype(f32), kw_ref[...].astype(f32), vw_ref[...].astype(f32)
    h, w, _ = qh.shape

    # W-attention energies, H-major batch at 0: [H, W, Wk]
    e_w = jax.lax.dot_general(qh, kh, (((2,), (2,)), ((0,), (0,))),
                              preferred_element_type=f32)
    # H-attention energies, W-major batch at 0: [W, H, Hk], -inf diagonal
    e_h = jax.lax.dot_general(qw, kw, (((2,), (2,)), ((0,), (0,))),
                              preferred_element_type=f32)
    row = jax.lax.broadcasted_iota(jnp.int32, (w, h, h), 1)
    col = jax.lax.broadcasted_iota(jnp.int32, (w, h, h), 2)
    neg = jnp.float32(-1e30)
    e_h = jnp.where(row == col, neg, e_h)

    # joint max over the concatenated axis; m lives H-major [H,W]
    m_h = jnp.max(e_h, axis=-1)                     # [W,H]
    m_w = jnp.max(e_w, axis=-1)                     # [H,W]
    m = jnp.maximum(m_h.T, m_w)                     # [H,W]

    ph = jnp.exp(e_h - m.T[..., None])              # [W,H,Hk]
    pw = jnp.exp(e_w - m[..., None])                # [H,W,Wk]
    den = jnp.sum(ph, axis=-1).T + jnp.sum(pw, axis=-1)   # [H,W]

    # numerators (batch at 0): oh[w,h,c] = sum_k ph[w,h,k] vw[w,k,c]
    oh = jax.lax.dot_general(ph, vw, (((2,), (1,)), ((0,), (0,))),
                             preferred_element_type=f32)  # [W,H,C]
    ow = jax.lax.dot_general(pw, vh, (((2,), (1,)), ((0,), (0,))),
                             preferred_element_type=f32)  # [H,W,C]
    oh_ref[...] = oh.astype(oh_ref.dtype)
    ow_ref[...] = ow.astype(ow_ref.dtype)
    den_ref[...] = den[..., None].astype(den_ref.dtype)


@functools.partial(jax.jit, static_argnames=("interpret",))
def cc_attention_core_pallas(q, k, v, interpret: bool = False):
    b, h, w, cq = q.shape
    c = v.shape[-1]
    qw = jnp.transpose(q, (0, 2, 1, 3))
    kw = jnp.transpose(k, (0, 2, 1, 3))
    vw = jnp.transpose(v, (0, 2, 1, 3))

    def spec(d0, d1, ch):
        return pl.BlockSpec((1, d0, d1, ch), lambda i: (i, 0, 0, 0))

    oh, ow, den = pl.pallas_call(
        lambda a, bb, cc, d, e, f, g, hh, ii: _cc_kernel(
            a.at[0], bb.at[0], cc.at[0], d.at[0], e.at[0], f.at[0],
            g.at[0], hh.at[0], ii.at[0]),
        grid=(b,),
        in_specs=[spec(h, w, cq), spec(h, w, cq), spec(h, w, c),
                  spec(w, h, cq), spec(w, h, cq), spec(w, h, c)],
        out_specs=[spec(w, h, c), spec(h, w, c), spec(h, w, 1)],
        out_shape=[jax.ShapeDtypeStruct((b, w, h, c), jnp.float32),
                   jax.ShapeDtypeStruct((b, h, w, c), jnp.float32),
                   jax.ShapeDtypeStruct((b, h, w, 1), jnp.float32)],
        interpret=interpret,
    )(q, k, v, qw, kw, vw)
    out = (jnp.transpose(oh, (0, 2, 1, 3)) + ow) / den
    return out.astype(v.dtype)


def _cc_bwd_kernel(qh_ref, kh_ref, vh_ref, qw_ref, kw_ref, vw_ref,
                   gh_ref, gw_ref,
                   dqw_ref, dqh_ref, dkw_ref, dkh_ref, dvw_ref, dvh_ref):
    """Fused VJP: recomputes energies + joint softmax (flash-attention style)
    then emits per-branch grad numerators.  Layout convention as the forward:
    *_w outputs H-major [H,W,*] (the W-branch contribution, already in natural
    layout), *_h outputs W-major [W,H,*] (transposed outside by XLA).
    """
    f32 = jnp.float32
    qh, kh, vh = qh_ref[...].astype(f32), kh_ref[...].astype(f32), vh_ref[...].astype(f32)
    qw, kw, vw = qw_ref[...].astype(f32), kw_ref[...].astype(f32), vw_ref[...].astype(f32)
    gh, gw = gh_ref[...].astype(f32), gw_ref[...].astype(f32)
    h, w, _ = qh.shape

    dims = (((2,), (2,)), ((0,), (0,)))
    e_w = jax.lax.dot_general(qh, kh, dims, preferred_element_type=f32)  # [H,W,Wk]
    e_h = jax.lax.dot_general(qw, kw, dims, preferred_element_type=f32)  # [W,H,Hk]
    row = jax.lax.broadcasted_iota(jnp.int32, (w, h, h), 1)
    col = jax.lax.broadcasted_iota(jnp.int32, (w, h, h), 2)
    e_h = jnp.where(row == col, jnp.float32(-1e30), e_h)

    m = jnp.maximum(jnp.max(e_h, axis=-1).T, jnp.max(e_w, axis=-1))   # [H,W]
    ph = jnp.exp(e_h - m.T[..., None])                                # [W,H,Hk]
    pw = jnp.exp(e_w - m[..., None])                                  # [H,W,Wk]
    den = jnp.sum(ph, axis=-1).T + jnp.sum(pw, axis=-1)               # [H,W]
    ah = ph / den.T[..., None]
    aw = pw / den[..., None]

    # dL/da: contract the grad with v along channels (batch dim 0)
    d_aw = jax.lax.dot_general(gh, vh, dims, preferred_element_type=f32)  # [H,W,Wk]
    d_ah = jax.lax.dot_general(gw, vw, dims, preferred_element_type=f32)  # [W,H,Hk]

    # joint-softmax VJP: s = sum_j a*da over BOTH branches
    s = jnp.sum(ah * d_ah, axis=-1).T + jnp.sum(aw * d_aw, axis=-1)   # [H,W]
    d_ew = aw * (d_aw - s[..., None])                                 # [H,W,Wk]
    d_eh = ah * (d_ah - s.T[..., None])                               # [W,H,Hk]

    contract_j = (((2,), (1,)), ((0,), (0,)))   # energies x (k|v) over key idx
    contract_q = (((1,), (1,)), ((0,), (0,)))   # energies^T x (q|g) over query idx
    dqw_ref[...] = jax.lax.dot_general(d_ew, kh, contract_j,
                                       preferred_element_type=f32)    # [H,W,Cq]
    dqh_ref[...] = jax.lax.dot_general(d_eh, kw, contract_j,
                                       preferred_element_type=f32)    # [W,H,Cq]
    dkw_ref[...] = jax.lax.dot_general(d_ew, qh, contract_q,
                                       preferred_element_type=f32)    # [H,Wk,Cq]
    dkh_ref[...] = jax.lax.dot_general(d_eh, qw, contract_q,
                                       preferred_element_type=f32)    # [W,Hk,Cq]
    dvw_ref[...] = jax.lax.dot_general(aw, gh, contract_q,
                                       preferred_element_type=f32)    # [H,Wk,C]
    dvh_ref[...] = jax.lax.dot_general(ah, gw, contract_q,
                                       preferred_element_type=f32)    # [W,Hk,C]


@functools.partial(jax.jit, static_argnames=("interpret",))
def cc_attention_core_pallas_bwd(q, k, v, g, interpret: bool = False):
    """dq,dk,dv for cc_attention_core via one fused Pallas pass per batch."""
    b, h, w, cq = q.shape
    c = v.shape[-1]
    tr = lambda t: jnp.transpose(t, (0, 2, 1, 3))
    qw, kw, vw, gw = tr(q), tr(k), tr(v), tr(g)

    def spec(d0, d1, ch):
        return pl.BlockSpec((1, d0, d1, ch), lambda i: (i, 0, 0, 0))

    def kern(*refs):
        _cc_bwd_kernel(*(r.at[0] for r in refs))

    f32 = jnp.float32
    dqw, dqh, dkw, dkh, dvw, dvh = pl.pallas_call(
        kern,
        grid=(b,),
        in_specs=[spec(h, w, cq), spec(h, w, cq), spec(h, w, c),
                  spec(w, h, cq), spec(w, h, cq), spec(w, h, c),
                  spec(h, w, c), spec(w, h, c)],
        out_specs=[spec(h, w, cq), spec(w, h, cq), spec(h, w, cq),
                   spec(w, h, cq), spec(h, w, c), spec(w, h, c)],
        out_shape=[jax.ShapeDtypeStruct((b, h, w, cq), f32),
                   jax.ShapeDtypeStruct((b, w, h, cq), f32),
                   jax.ShapeDtypeStruct((b, h, w, cq), f32),
                   jax.ShapeDtypeStruct((b, w, h, cq), f32),
                   jax.ShapeDtypeStruct((b, h, w, c), f32),
                   jax.ShapeDtypeStruct((b, w, h, c), f32)],
        interpret=interpret,
    )(q, k, v, qw, kw, vw, g, gw)
    dq = (dqw + tr(dqh)).astype(q.dtype)
    dk = (dkw + tr(dkh)).astype(k.dtype)
    dv = (dvw + tr(dvh)).astype(v.dtype)
    return dq, dk, dv


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def _cc_pallas_ad(q, k, v, interpret=False):
    return cc_attention_core_pallas(q, k, v, interpret=interpret)


def _cc_pallas_fwd(q, k, v, interpret):
    return cc_attention_core_pallas(q, k, v, interpret=interpret), (q, k, v)


def _cc_pallas_bwd(interpret, res, g):
    q, k, v = res
    return cc_attention_core_pallas_bwd(q, k, v, g, interpret=interpret)


_cc_pallas_ad.defvjp(_cc_pallas_fwd, _cc_pallas_bwd)


def _kernel_vmem_bytes(b: int, h: int, w: int, c: int, cq: int) -> int:
    """Conservative estimate of the kernels' peak VMEM pressure (f32).

    Two contributions, both measured to matter on a v5e (16 MiB scoped vmem):
    per-grid-step in-kernel live set (energy tensors + exp/grad copies
    dominate), and the FULL f32 numerator outputs — XLA places pallas_call
    results in vmem to fuse the outside normalize, so they scale with batch
    (observed OOM: b16 h=w=64 c=64 -> 16.46M > 16M)."""
    energies = 4 * h * w * (h + w) * 3
    operands = 4 * h * w * (4 * c + 4 * cq)
    outputs = 4 * b * h * w * (2 * c + 1)
    return energies + operands + outputs


# v5e scoped-vmem limit is 16 MiB; leave headroom for Mosaic's own scratch.
_VMEM_BUDGET = 12 * 2 ** 20


def cc_attention_core(q, k, v, use_pallas: Optional[bool] = None):
    if use_pallas is None:
        b, h, w, cq = q.shape
        use_pallas = (
            jax.default_backend() not in ("cpu",)
            and pltpu is not None
            and _kernel_vmem_bytes(b, h, w, v.shape[-1], cq) < _VMEM_BUDGET
        )
    if use_pallas:
        return _cc_pallas_ad(q, k, v)
    return cc_attention_core_jnp(q, k, v)
