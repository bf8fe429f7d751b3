"""Space-to-depth conv rewrite (ops/s2d.py): exact parity vs lax conv.

The rewrite exists to lift narrow-channel convs (PraNet Res2Net 26-208w
branch convs, 32w RFB decoder — reference Res2Net_v1b.py:15-91) onto full
MXU tiles; correctness bar is bit-level-up-to-summation-order equality with
the standard lowering for every supported (kernel, stride, padding) combo.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax import lax

from rnd_semantic_segmentation_tpu.ops.s2d import (
    conv2d_s2d, depth_to_space, s2d_supported, space_to_depth)


def _ref_conv(x, k, stride, padding):
    return lax.conv_general_dilated(
        x, k, stride, padding, dimension_numbers=("NHWC", "HWIO", "NHWC"))


def _rand(shape, seed=0):
    rng = np.random.RandomState(seed)
    return jnp.asarray(rng.randn(*shape).astype(np.float32))


def test_s2d_roundtrip():
    x = _rand((2, 8, 12, 5))
    np.testing.assert_array_equal(
        np.asarray(depth_to_space(space_to_depth(x))), np.asarray(x))


CASES = [
    # (kh, kw, stride, pad) — the pranet/res2net conv inventory
    (3, 3, (1, 1), ((1, 1), (1, 1))),    # branch / RFB conv
    (3, 3, (2, 2), ((1, 1), (1, 1))),    # stage-block stride-2 branch conv
    (1, 1, (1, 1), ((0, 0), (0, 0))),    # pointwise
    (5, 5, (1, 1), ((2, 2), (2, 2))),    # ra4 5x5
    (1, 3, (1, 1), ((0, 0), (1, 1))),    # RFB asymmetric
    (3, 1, (1, 1), ((1, 1), (0, 0))),
    (1, 5, (1, 1), ((0, 0), (2, 2))),
    (3, 3, (1, 1), ((0, 0), (0, 0))),    # VALID (even pad total)
]


@pytest.mark.parametrize("kh,kw,stride,pad", CASES)
def test_conv2d_s2d_matches_lax(kh, kw, stride, pad):
    x = _rand((2, 16, 12, 26), seed=kh * 10 + kw)
    k = _rand((kh, kw, 26, 26), seed=kh + kw) * 0.2
    assert s2d_supported(x.shape, k.shape, stride, pad, (1, 1), 1)
    y_ref = _ref_conv(x, k, stride, pad)
    y = conv2d_s2d(x, k, stride, pad)
    assert y.shape == y_ref.shape, (y.shape, y_ref.shape)
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref),
                               rtol=1e-5, atol=1e-5)


def test_conv2d_s2d_grads_match():
    """The block kernel is assembled in-graph from the original param —
    gradients must flow back identically (training-path requirement)."""
    x = _rand((1, 8, 8, 7), seed=3)
    k = _rand((3, 3, 7, 9), seed=4) * 0.2

    def loss_ref(k):
        return jnp.sum(_ref_conv(x, k, (1, 1), ((1, 1), (1, 1))) ** 2)

    def loss_s2d(k):
        return jnp.sum(conv2d_s2d(x, k, (1, 1), ((1, 1), (1, 1))) ** 2)

    g_ref = jax.grad(loss_ref)(k)
    g = jax.grad(loss_s2d)(k)
    np.testing.assert_allclose(np.asarray(g), np.asarray(g_ref),
                               rtol=1e-4, atol=1e-4)


def test_pranet_logits_invariant_under_s2d_policy():
    """Full-model integration: PraNet forward under the s2d execution policy
    must match the standard lowering (f32, same params) — the rewrite is a
    layout choice, never a semantic one."""
    from rnd_semantic_segmentation_tpu.models.pranet import PraNet
    from rnd_semantic_segmentation_tpu.ops.s2d import s2d_scope

    m = PraNet()
    x = _rand((1, 64, 64, 3), seed=9)
    vars_ = m.init(jax.random.PRNGKey(0), x)
    outs_ref = m.apply(vars_, x)
    with s2d_scope(256):
        outs_s2d = jax.jit(lambda v, xx: m.apply(v, xx))(vars_, x)
    for a, b in zip(outs_ref, outs_s2d):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-4)


def test_s2d_supported_gates():
    x_shape, k_shape = (2, 16, 16, 26), (3, 3, 26, 26)
    ok = lambda **kw: s2d_supported(
        kw.get("x", x_shape), kw.get("k", k_shape),
        kw.get("stride", (1, 1)), kw.get("pad", ((1, 1), (1, 1))),
        kw.get("dil", (1, 1)), kw.get("groups", 1))
    assert ok()
    assert not ok(dil=(3, 3))                       # dilated RFB convs stay standard
    assert not ok(groups=26)                        # depthwise
    assert not ok(stride=(2, 1))                    # mixed stride
    assert not ok(pad=((1, 0), (1, 1)))             # odd padded height
    assert not ok(x=(2, 15, 16, 26))                # odd input height
    assert not ok(k=(4, 3, 26, 26))                 # even kernel
