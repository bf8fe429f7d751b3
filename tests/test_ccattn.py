"""Pallas criss-cross attention kernel vs jnp reference (interpret mode on CPU)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import torch

from rnd_semantic_segmentation_tpu.ops.ccattn import (
    cc_attention_core_jnp,
    cc_attention_core_pallas,
)


def test_pallas_matches_jnp(rng):
    b, h, w, cq, c = 2, 11, 11, 32, 256
    q = jnp.asarray(rng.randn(b, h, w, cq).astype(np.float32))
    k = jnp.asarray(rng.randn(b, h, w, cq).astype(np.float32))
    v = jnp.asarray(rng.randn(b, h, w, c).astype(np.float32))
    ref = cc_attention_core_jnp(q, k, v)
    out = cc_attention_core_pallas(q, k, v, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)


def test_pallas_rectangular(rng):
    b, h, w, cq, c = 1, 8, 16, 16, 64
    q = jnp.asarray(rng.randn(b, h, w, cq).astype(np.float32))
    k = jnp.asarray(rng.randn(b, h, w, cq).astype(np.float32))
    v = jnp.asarray(rng.randn(b, h, w, c).astype(np.float32))
    ref = cc_attention_core_jnp(q, k, v)
    out = cc_attention_core_pallas(q, k, v, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)


def test_jnp_core_matches_reference_torch(rng):
    """Oracle: the reference CrissCrossAttention bmm chain (ccnet.py:56-126)
    with identity projections."""
    b, h, w, c = 1, 6, 5, 8
    q = rng.randn(b, h, w, c).astype(np.float32)
    k = rng.randn(b, h, w, c).astype(np.float32)
    v = rng.randn(b, h, w, c).astype(np.float32)

    # torch reference computation (NCHW)
    tq = torch.from_numpy(q.transpose(0, 3, 1, 2))
    tk = torch.from_numpy(k.transpose(0, 3, 1, 2))
    tv = torch.from_numpy(v.transpose(0, 3, 1, 2))
    INF = -torch.diag(torch.tensor(float("inf")).repeat(h), 0)[None].repeat(b * w, 1, 1)
    q_H = tq.permute(0, 3, 1, 2).contiguous().view(b * w, -1, h).permute(0, 2, 1)
    q_W = tq.permute(0, 2, 1, 3).contiguous().view(b * h, -1, w).permute(0, 2, 1)
    k_H = tk.permute(0, 3, 1, 2).contiguous().view(b * w, -1, h)
    k_W = tk.permute(0, 2, 1, 3).contiguous().view(b * h, -1, w)
    v_H = tv.permute(0, 3, 1, 2).contiguous().view(b * w, -1, h)
    v_W = tv.permute(0, 2, 1, 3).contiguous().view(b * h, -1, w)
    e_H = (torch.bmm(q_H, k_H) + INF).view(b, w, h, h).permute(0, 2, 1, 3)
    e_W = torch.bmm(q_W, k_W).view(b, h, w, w)
    att = torch.softmax(torch.cat([e_H, e_W], 3), dim=3)
    att_H = att[:, :, :, 0:h].permute(0, 2, 1, 3).contiguous().view(b * w, h, h)
    att_W = att[:, :, :, h:].contiguous().view(b * h, w, w)
    out_H = torch.bmm(v_H, att_H.permute(0, 2, 1)).view(b, w, -1, h).permute(0, 2, 3, 1)
    out_W = torch.bmm(v_W, att_W.permute(0, 2, 1)).view(b, h, -1, w).permute(0, 2, 1, 3)
    ref = (out_H + out_W).numpy().transpose(0, 2, 3, 1)

    ours = cc_attention_core_jnp(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v))
    np.testing.assert_allclose(np.asarray(ours), ref, rtol=1e-5, atol=1e-5)


def test_pallas_custom_vjp_matches_jnp_grad(rng):
    """GALD trains on TPU through the Pallas kernels (fused forward AND
    fused backward) — gradients must match the pure-jnp path.  Both kernels
    run in interpret mode here via the custom VJP's static interpret arg."""
    from rnd_semantic_segmentation_tpu.ops import ccattn

    b, h, w, cq, c = 1, 6, 7, 8, 16
    q = jnp.asarray(rng.randn(b, h, w, cq).astype(np.float32))
    k = jnp.asarray(rng.randn(b, h, w, cq).astype(np.float32))
    v = jnp.asarray(rng.randn(b, h, w, c).astype(np.float32))

    def loss_jnp(q, k, v):
        return jnp.sum(ccattn.cc_attention_core_jnp(q, k, v) ** 2)

    def loss_pallas(q, k, v):
        return jnp.sum(ccattn._cc_pallas_ad(q, k, v, True) ** 2)

    g_ref = jax.grad(loss_jnp, argnums=(0, 1, 2))(q, k, v)
    g_pal = jax.grad(loss_pallas, argnums=(0, 1, 2))(q, k, v)
    for a, b_ in zip(g_ref, g_pal):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   rtol=1e-4, atol=1e-4)
