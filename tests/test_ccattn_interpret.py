"""Interpret-mode (CPU) coverage of the Pallas criss-cross kernel + its VJP.

The TPU-only code path (fused forward AND the fused backward kernel) is
otherwise exercised only by on-chip bench runs — round 1 shipped a
missing-VJP bug that only the chip caught.  `pl.pallas_call(interpret=True)`
runs the same kernel body on CPU so regressions appear in CI.
Oracle: cc_attention_core_jnp (itself parity-tested against the reference
torch CC-attention in test_gald_parity.py).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from rnd_semantic_segmentation_tpu.ops.ccattn import (
    _cc_pallas_ad,
    cc_attention_core_jnp,
    cc_attention_core_pallas,
    cc_attention_core_pallas_bwd,
)


@pytest.mark.parametrize("shape", [(2, 6, 10, 8), (1, 5, 7, 16)])
def test_forward_interpret_parity(rng, shape):
    b, h, w, c = shape
    cq = c // 2
    q = rng.randn(b, h, w, cq).astype(np.float32)
    k = rng.randn(b, h, w, cq).astype(np.float32)
    v = rng.randn(b, h, w, c).astype(np.float32)
    ref = cc_attention_core_jnp(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v))
    out = cc_attention_core_pallas(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v),
                                   interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_forward_interpret_bf16(rng):
    q = jnp.asarray(rng.randn(1, 4, 6, 8), jnp.bfloat16)
    k = jnp.asarray(rng.randn(1, 4, 6, 8), jnp.bfloat16)
    v = jnp.asarray(rng.randn(1, 4, 6, 16), jnp.bfloat16)
    ref = cc_attention_core_jnp(q, k, v)
    out = cc_attention_core_pallas(q, k, v, interpret=True)
    assert out.dtype == jnp.bfloat16
    np.testing.assert_allclose(np.asarray(out, np.float32),
                               np.asarray(ref, np.float32), rtol=0.05, atol=0.05)


@pytest.mark.parametrize("shape", [(2, 6, 10, 8), (1, 5, 7, 16)])
def test_backward_kernel_parity(rng, shape):
    """Fused Pallas backward == jax.vjp through the jnp formulation."""
    b, h, w, c = shape
    cq = c // 2
    q = jnp.asarray(rng.randn(b, h, w, cq), jnp.float32)
    k = jnp.asarray(rng.randn(b, h, w, cq), jnp.float32)
    v = jnp.asarray(rng.randn(b, h, w, c), jnp.float32)
    g = jnp.asarray(rng.randn(b, h, w, c), jnp.float32)

    _, vjp = jax.vjp(cc_attention_core_jnp, q, k, v)
    ref = vjp(g)
    got = cc_attention_core_pallas_bwd(q, k, v, g, interpret=True)
    for name, o, r in zip(("dq", "dk", "dv"), got, ref):
        np.testing.assert_allclose(np.asarray(o), np.asarray(r),
                                   rtol=2e-4, atol=2e-4, err_msg=name)


def test_custom_vjp_end_to_end(rng):
    """jax.grad through _cc_pallas_ad (interpret) == jax.grad through jnp,
    composed with surrounding ops the way GALD training uses it."""
    q = jnp.asarray(rng.randn(2, 6, 8, 4), jnp.float32)
    k = jnp.asarray(rng.randn(2, 6, 8, 4), jnp.float32)
    v = jnp.asarray(rng.randn(2, 6, 8, 8), jnp.float32)

    def loss_pallas(q, k, v):
        return jnp.sum(jnp.tanh(_cc_pallas_ad(q, k, v, True)) ** 2)

    def loss_jnp(q, k, v):
        return jnp.sum(jnp.tanh(cc_attention_core_jnp(q, k, v)) ** 2)

    ref = jax.grad(loss_jnp, argnums=(0, 1, 2))(q, k, v)
    got = jax.grad(loss_pallas, argnums=(0, 1, 2))(q, k, v)
    for name, o, r in zip(("dq", "dk", "dv"), got, ref):
        np.testing.assert_allclose(np.asarray(o), np.asarray(r),
                                   rtol=2e-4, atol=2e-4, err_msg=name)


def test_vmem_guard_thresholds():
    """Auto-selection only picks the Pallas kernels when the in-VMEM live set
    fits the v5e scoped limit; all shapes CC attention sees in practice
    (/32 features) fit, oversized ones fall back to the jnp path."""
    from rnd_semantic_segmentation_tpu.ops.ccattn import (
        _VMEM_BUDGET, _kernel_vmem_bytes)

    # practical GALD shapes: 512^2 b16 train -> 16x16; 1024x2048 eval -> 32x64
    assert _kernel_vmem_bytes(16, 16, 16, 64, 8) < _VMEM_BUDGET
    assert _kernel_vmem_bytes(1, 32, 64, 64, 8) < _VMEM_BUDGET
    # measured on-chip OOM case (b16 64x64 c64) must be rejected
    assert _kernel_vmem_bytes(16, 64, 64, 64, 8) >= _VMEM_BUDGET
    assert _kernel_vmem_bytes(1, 128, 256, 64, 8) >= _VMEM_BUDGET
