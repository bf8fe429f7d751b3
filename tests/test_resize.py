"""Resize parity vs torch (the parity oracle for every upsample in the stack)."""

import numpy as np
import pytest

import jax.numpy as jnp
import torch
import torch.nn.functional as TF

from rnd_semantic_segmentation_tpu.ops import resize_bilinear, resize_nearest


def _torch_resize(x_nhwc, size, mode, align_corners=None):
    t = torch.from_numpy(np.transpose(x_nhwc, (0, 3, 1, 2)))
    if mode == "nearest":
        out = TF.interpolate(t, size=size, mode="nearest")
    else:
        out = TF.interpolate(t, size=size, mode=mode, align_corners=align_corners)
    return np.transpose(out.numpy(), (0, 2, 3, 1))


SIZES = [
    ((7, 9), (14, 18)),     # clean 2x upsample
    ((11, 11), (44, 44)),   # 4x (GALD decoder head -> input size)
    ((33, 33), (352, 352)), # PraNet lateral map upsample
    ((64, 65), (17, 31)),   # downsample, odd sizes
    ((1, 1), (8, 8)),       # degenerate
    ((16, 16), (512, 512)), # ASPP head -> label size
]


@pytest.mark.parametrize("align", [True, False])
@pytest.mark.parametrize("in_size,out_size", SIZES)
def test_bilinear_matches_torch(in_size, out_size, align, rng):
    x = rng.randn(2, *in_size, 3).astype(np.float32)
    ours = np.asarray(resize_bilinear(jnp.asarray(x), out_size, align_corners=align))
    ref = _torch_resize(x, out_size, "bilinear", align_corners=align)
    np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=3e-5)


@pytest.mark.parametrize("in_size,out_size", SIZES)
def test_nearest_matches_torch(in_size, out_size, rng):
    x = rng.randint(0, 255, size=(2, *in_size, 1)).astype(np.float32)
    ours = np.asarray(resize_nearest(jnp.asarray(x), out_size))
    ref = _torch_resize(x, out_size, "nearest")
    np.testing.assert_array_equal(ours, ref)


def test_identity_passthrough(rng):
    x = jnp.asarray(rng.randn(1, 8, 8, 4).astype(np.float32))
    assert resize_bilinear(x, (8, 8)) is x


def test_hwc_rank3(rng):
    x = rng.randn(5, 6, 2).astype(np.float32)
    out = resize_bilinear(jnp.asarray(x), (10, 12))
    assert out.shape == (10, 12, 2)


def test_avg_pool_separable_matches_torch(rng):
    """avg_pool large-kernel separable path vs torch (incl. stride/padding)."""
    from rnd_semantic_segmentation_tpu.ops import avg_pool
    x = rng.randn(2, 33, 35, 3).astype(np.float32)
    for k, s, p in [(31, 1, 15), (7, 2, 3), (7, 3, 2)]:
        ours = np.asarray(avg_pool(jnp.asarray(x), k, s, padding=p))
        ref = TF.avg_pool2d(torch.from_numpy(x.transpose(0, 3, 1, 2)),
                            kernel_size=k, stride=s, padding=p
                            ).numpy().transpose(0, 2, 3, 1)
        np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-5, err_msg=f"{k},{s},{p}")
