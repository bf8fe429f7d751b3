"""Sub-pixel transposed conv (ops/subpixel.py) vs the input-dilated lowering.

Every (k, s, p, output_padding) combination the repo's models use must be
bit-close to lax's lhs_dilation path — the rewrite is an execution-layout
choice (4x fewer MACs on the attn upsamplers), never a semantic one.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax import lax

from rnd_semantic_segmentation_tpu.ops.subpixel import conv_transpose_subpixel


def _ref(x, k, stride, padding, op):
    kh, kw = k.shape[0], k.shape[1]
    sh, sw = (stride, stride) if isinstance(stride, int) else stride
    ph, pw = (padding, padding) if isinstance(padding, int) else padding
    return lax.conv_general_dilated(
        x, k, (1, 1),
        ((kh - 1 - ph, kh - 1 - ph + op), (kw - 1 - pw, kw - 1 - pw + op)),
        lhs_dilation=(sh, sw),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


def _rand(shape, seed=0):
    rng = np.random.RandomState(seed)
    return jnp.asarray(rng.randn(*shape).astype(np.float32))


CASES = [
    # (kh, kw, stride, pad, output_padding)
    (4, 4, 2, 1, 0),   # attn decoder upsamplers (x5) + CENet finaldeconv
    (3, 3, 2, 1, 1),   # CENet DecoderBlock deconv2
    (2, 2, 2, 0, 0),
    (4, 4, 2, 0, 0),
    (5, 5, 2, 2, 1),
    (4, 4, 4, 0, 0),   # stride 4
    (6, 6, 2, 2, 0),
]


@pytest.mark.parametrize("kh,kw,s,p,op", CASES)
def test_subpixel_matches_dilated(kh, kw, s, p, op):
    x = _rand((2, 9, 7, 5), seed=kh * 7 + s)
    k = _rand((kh, kw, 5, 6), seed=kh + s) * 0.2
    y_ref = _ref(x, k, s, p, op)
    y = conv_transpose_subpixel(x, k, s, p, op)
    assert y.shape == y_ref.shape, (y.shape, y_ref.shape)
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref),
                               rtol=1e-5, atol=1e-5)


def test_subpixel_grads_match():
    x = _rand((1, 6, 6, 4), seed=3)
    k = _rand((4, 4, 4, 8), seed=4) * 0.2

    g_ref = jax.grad(lambda k: jnp.sum(_ref(x, k, 2, 1, 0) ** 2))(k)
    g = jax.grad(lambda k: jnp.sum(
        conv_transpose_subpixel(x, k, 2, 1, 0) ** 2))(k)
    np.testing.assert_allclose(np.asarray(g), np.asarray(g_ref),
                               rtol=1e-4, atol=1e-4)


def test_attn_unet_logits_invariant_under_policy():
    """Full-model integration: the attn decoder's five upsamplers under the
    subpixel policy must reproduce the dilated path bit-close."""
    from rnd_semantic_segmentation_tpu.models.attn_unet import (
        AttnEfficientNetUnet)
    from rnd_semantic_segmentation_tpu.ops.subpixel import subpixel_scope

    m = AttnEfficientNetUnet("efficientnet-b0", num_classes=2)
    x = _rand((1, 64, 64, 3), seed=11)
    v = m.init(jax.random.PRNGKey(0), x)
    outs_ref = m.apply(v, x)
    with subpixel_scope(True):
        outs = jax.jit(lambda v, x: m.apply(v, x))(v, x)
    for a, b in zip(outs_ref, outs):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-4)


def test_layer_parity_under_policy():
    """ConvTranspose2d with the subpixel policy on == dilated path off,
    same params (the attn decoder config)."""
    from rnd_semantic_segmentation_tpu.models.layers import ConvTranspose2d
    from rnd_semantic_segmentation_tpu.ops.subpixel import subpixel_scope

    m = ConvTranspose2d(12, 4, 2, 1, use_bias=False)
    x = _rand((2, 8, 8, 7), seed=5)
    v = m.init(jax.random.PRNGKey(0), x)
    y_ref = m.apply(v, x)
    with subpixel_scope(True):
        y = jax.jit(lambda v, x: m.apply(v, x))(v, x)
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref),
                               rtol=1e-5, atol=1e-5)
