"""Fused MBConv segment (ops/mbconv.py): kernel parity + model wiring.

Oracle chain: the Pallas kernel (interpret mode on CPU) must match the jnp
oracle, which must match the unfused XLA composition inside MBConvBlock
(whose own parity vs the reference efficientnet is covered by
tests/test_attn_parity.py / tests/torch_effnet.py).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from rnd_semantic_segmentation_tpu.ops.mbconv import (
    fused_mbconv_applies,
    fused_mbconv_core_jnp,
    fused_mbconv_core_pallas,
    mbconv_fusion_scope,
)


def _inputs(rng, b, h, w, c, f, k, dtype=np.float32):
    x = rng.randn(b, h, w, c).astype(dtype) * 0.5
    we = rng.randn(c, f).astype(dtype) * 0.1
    wd = rng.randn(k, k, f).astype(dtype) * 0.2
    s0 = 1.0 + 0.1 * rng.randn(f).astype(np.float32)
    b0 = 0.1 * rng.randn(f).astype(np.float32)
    s1 = 1.0 + 0.1 * rng.randn(f).astype(np.float32)
    b1 = 0.1 * rng.randn(f).astype(np.float32)
    return tuple(jnp.asarray(a) for a in (x, we, s0, b0, wd, s1, b1))


@pytest.mark.parametrize("shape,k", [
    ((2, 16, 16, 8), 3),
    ((1, 12, 20, 16), 5),
    ((2, 8, 8, 24), 3),
])
def test_kernel_interpret_parity(rng, shape, k):
    b, h, w, c = shape
    f = 3 * c
    args = _inputs(rng, b, h, w, c, f, k)
    ref = fused_mbconv_core_jnp(*args)
    out = fused_mbconv_core_pallas(*args, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)


def test_kernel_interpret_multitile(rng):
    """Tiny VMEM budget forces th < H: exercises halo rows + edge masks."""
    b, h, w, c, f, k = 1, 16, 12, 8, 16, 3
    args = _inputs(rng, b, h, w, c, f, k)
    ref = fused_mbconv_core_jnp(*args)
    # budget that fits th=4 but not th=16 (xe tile is the dominant term)
    budget = (h + 2) * (w + 2) * c * 2 + 6 * (w + 2) * f * 4 + 4 * w * f * 4
    out = fused_mbconv_core_pallas(*args, interpret=True, vmem_budget=budget)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)


def test_kernel_interpret_bf16(rng):
    args = _inputs(rng, 1, 8, 8, 8, 24, 3)
    args = tuple(a.astype(jnp.bfloat16) if i in (0, 1, 4) else a
                 for i, a in enumerate(args))
    ref = fused_mbconv_core_jnp(*args)
    out = fused_mbconv_core_pallas(*args, interpret=True)
    assert out.dtype == jnp.bfloat16
    np.testing.assert_allclose(np.asarray(out, np.float32),
                               np.asarray(ref, np.float32),
                               rtol=0.05, atol=0.05)


def test_applies_gate():
    assert fused_mbconv_applies((2, 64, 64, 16), 3, 96)
    assert not fused_mbconv_applies((2, 64, 64, 16), 4, 96)  # even k
    # absurd width that can never fit a single-row tile
    assert not fused_mbconv_applies((1, 8, 4096, 512), 3, 16384)


def test_mbconv_block_fused_matches_unfused(rng):
    """MBConvBlock under the fusion scope (eval) == the plain XLA path."""
    from rnd_semantic_segmentation_tpu.models.efficientnet import MBConvBlock

    block = MBConvBlock(in_filters=8, out_filters=8, kernel=3, stride=1,
                        expand_ratio=6, se_ratio=0.25)
    x = jnp.asarray(rng.randn(2, 16, 16, 8).astype(np.float32))
    variables = block.init(jax.random.PRNGKey(0), x)
    # non-trivial running stats so the BN fold actually matters
    stats = jax.tree_util.tree_map(
        lambda a: a + 0.3 * jnp.arange(a.size, dtype=a.dtype).reshape(a.shape)
        / a.size, variables["batch_stats"])
    variables = {**variables, "batch_stats": stats}

    ref = block.apply(variables, x, train=False)
    with mbconv_fusion_scope(True):
        out = block.apply(variables, x, train=False)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)

    # train path must be untouched by the scope (fusion is eval-only)
    with mbconv_fusion_scope(True):
        t1, _ = block.apply(variables, x, train=True,
                            rngs={"dropout": jax.random.PRNGKey(1)},
                            mutable=["batch_stats"])
    t0, _ = block.apply(variables, x, train=True,
                        rngs={"dropout": jax.random.PRNGKey(1)},
                        mutable=["batch_stats"])
    np.testing.assert_allclose(np.asarray(t1), np.asarray(t0),
                               rtol=1e-6, atol=1e-6)


def test_encoder_fused_matches_unfused(rng):
    """Whole EfficientNet encoder, eval: fusion scope is a pure rewrite."""
    from rnd_semantic_segmentation_tpu.models.efficientnet import (
        EfficientNetEncoder)

    enc = EfficientNetEncoder("efficientnet-b0")
    x = jnp.asarray(rng.randn(1, 64, 64, 3).astype(np.float32))
    variables = enc.init(jax.random.PRNGKey(0), x)
    ref = enc.apply(variables, x, train=False)
    with mbconv_fusion_scope(True):
        out = enc.apply(variables, x, train=False)
    for key in ref:
        np.testing.assert_allclose(np.asarray(out[key]), np.asarray(ref[key]),
                                   rtol=2e-4, atol=2e-4,
                                   err_msg=key)
