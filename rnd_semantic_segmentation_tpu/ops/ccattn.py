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


@jax.custom_vjp
def _cc_pallas_ad(q, k, v):
    return cc_attention_core_pallas(q, k, v)


def _cc_pallas_fwd(q, k, v):
    return cc_attention_core_pallas(q, k, v), (q, k, v)


def _cc_pallas_bwd(res, g):
    # backward recomputes through the jnp formulation (identical math);
    # standard fused-forward / recompute-backward pattern
    q, k, v = res
    _, vjp = jax.vjp(cc_attention_core_jnp, q, k, v)
    return vjp(g)


_cc_pallas_ad.defvjp(_cc_pallas_fwd, _cc_pallas_bwd)


def cc_attention_core(q, k, v, use_pallas: Optional[bool] = None):
    if use_pallas is None:
        use_pallas = jax.default_backend() not in ("cpu",) and pltpu is not None
    if use_pallas:
        return _cc_pallas_ad(q, k, v)
    return cc_attention_core_jnp(q, k, v)
