import numpy as np

import jax
import jax.numpy as jnp

from rnd_semantic_segmentation_tpu.configs import get_default_cfg
from rnd_semantic_segmentation_tpu.data.device_pipe import (
    _flip_select,
    _motion_blur_batch,
    _rot90_select,
    _rotate_batch,
    augment_batch,
    augment_batch_attn,
    augment_batch_pra,
    device_aug_active,
    make_device_augmenter,
)


def test_augment_shapes_and_normalization(rng):
    x = jnp.asarray(rng.rand(4, 24, 24, 3).astype(np.float32))
    y = jnp.asarray(rng.randint(0, 3, size=(4, 24, 24)).astype(np.int32))
    out = augment_batch(x, y, jax.random.PRNGKey(0), size=(32, 32),
                        flip_prob=0.5, brightness=0.2, contrast=0.2,
                        saturation=0.2, hue=0.1, dtype="float32")
    assert out["image"].shape == (4, 32, 32, 3)
    assert out["label"].shape == (4, 32, 32)
    # imagenet-normalized values live roughly in [-3, 3]
    assert float(jnp.abs(out["image"]).max()) < 5.0


def test_augment_deterministic_per_key(rng):
    x = jnp.asarray(rng.rand(2, 16, 16, 3).astype(np.float32))
    y = jnp.zeros((2, 16, 16), jnp.int32)
    a = augment_batch(x, y, jax.random.PRNGKey(7), flip_prob=0.5,
                      brightness=0.3, dtype="float32")
    b = augment_batch(x, y, jax.random.PRNGKey(7), flip_prob=0.5,
                      brightness=0.3, dtype="float32")
    np.testing.assert_array_equal(np.asarray(a["image"]), np.asarray(b["image"]))
    c = augment_batch(x, y, jax.random.PRNGKey(8), flip_prob=0.5,
                      brightness=0.3, dtype="float32")
    assert not np.array_equal(np.asarray(a["image"]), np.asarray(c["image"]))


def test_flip_applies_to_labels_too(rng):
    x = jnp.asarray(rng.rand(8, 8, 8, 3).astype(np.float32))
    y = jnp.tile(jnp.arange(8, dtype=jnp.int32)[None, None, :], (8, 8, 1))
    out = augment_batch(x, y, jax.random.PRNGKey(0), flip_prob=1.0,
                        mean=(0, 0, 0), std=(1, 1, 1), dtype="float32")
    np.testing.assert_array_equal(np.asarray(out["label"]),
                                  np.asarray(y[:, :, ::-1]))
    np.testing.assert_allclose(np.asarray(out["image"]),
                               np.asarray(x[:, :, ::-1, :]), rtol=1e-6)


def test_config_driven_augmenter(rng):
    cfg = get_default_cfg()
    cfg.AUG.NAME = "none"  # aspp-style device pipeline
    cfg.INPUT.SOURCE_INPUT_SIZE_TRAIN = (32, 32)
    cfg.INPUT.HORIZONTAL_FLIP_PROB_TRAIN = 0.5
    cfg.MODEL.DTYPE = "float32"
    aug = make_device_augmenter(cfg)
    batch = {"image": rng.rand(2, 24, 24, 3).astype(np.float32),
             "label": rng.randint(0, 2, size=(2, 24, 24)).astype(np.int32),
             "name": ["a", "b"]}
    out = aug(batch, step=3)
    assert out["image"].shape == (2, 32, 32, 3)
    assert out["name"] == ["a", "b"]


# ---------------------------------------------------------------------------
# per-item geometric primitives
# ---------------------------------------------------------------------------

def test_rot90_select_matches_numpy(rng):
    x = rng.rand(4, 6, 6, 3).astype(np.float32)
    y = rng.randint(0, 5, size=(4, 6, 6)).astype(np.int32)
    k = np.array([0, 1, 2, 3], np.int32)
    xo, yo = _rot90_select(jnp.asarray(x), jnp.asarray(y), jnp.asarray(k))
    for i in range(4):
        np.testing.assert_allclose(np.asarray(xo)[i], np.rot90(x[i], k[i]),
                                   rtol=1e-6)
        np.testing.assert_array_equal(np.asarray(yo)[i], np.rot90(y[i], k[i]))


def test_flip_select_codes(rng):
    x = rng.rand(4, 5, 7, 3).astype(np.float32)
    y = rng.randint(0, 5, size=(4, 5, 7)).astype(np.int32)
    code = np.array([0, 1, 2, 0], np.int32)
    active = np.array([True, True, True, False])
    xo, yo = _flip_select(jnp.asarray(x), jnp.asarray(y),
                          jnp.asarray(code), jnp.asarray(active))
    exp = [x[0][::-1], x[1][:, ::-1], x[2][::-1, ::-1], x[3]]
    expy = [y[0][::-1], y[1][:, ::-1], y[2][::-1, ::-1], y[3]]
    for i in range(4):
        np.testing.assert_allclose(np.asarray(xo)[i], exp[i], rtol=1e-6)
        np.testing.assert_array_equal(np.asarray(yo)[i], expy[i])


def test_motion_blur_inactive_identity_and_mean_preserving(rng):
    x = rng.rand(3, 8, 8, 3).astype(np.float32)
    out = _motion_blur_batch(jnp.asarray(x), jax.random.PRNGKey(0),
                             jnp.asarray([False, True, True]))
    out = np.asarray(out)
    np.testing.assert_allclose(out[0], x[0], rtol=1e-6)
    # wrap-around rolls preserve the per-item mean exactly
    np.testing.assert_allclose(out.mean((1, 2, 3)), x.mean((1, 2, 3)),
                               rtol=1e-5)
    # blurred items changed
    assert np.abs(out[1] - x[1]).max() > 1e-4


def test_rotate_batch_matches_pil(rng):
    from PIL import Image

    x = (rng.rand(1, 32, 32, 3) * 255).astype(np.uint8)
    y = (rng.rand(1, 32, 32) > 0.5).astype(np.int32)
    deg = 33.0
    theta = np.deg2rad(deg)
    xo, yo = _rotate_batch(jnp.asarray(x.astype(np.float32) / 255.0),
                           jnp.asarray(y), jnp.asarray([theta], np.float32),
                           jnp.asarray([True]))
    pil_img = np.asarray(Image.fromarray(x[0]).rotate(deg, Image.BILINEAR),
                         np.float32) / 255.0
    pil_lab = np.asarray(Image.fromarray(y[0].astype(np.float32)).rotate(
        deg, Image.NEAREST))
    # interior pixels match PIL bilinear closely (border handling differs)
    m = slice(4, -4)
    diff = np.abs(np.asarray(xo)[0][m, m] - pil_img[m, m])
    assert np.median(diff) < 0.02 and np.mean(diff) < 0.05
    agree = (np.asarray(yo)[0][m, m] == pil_lab[m, m]).mean()
    assert agree > 0.95
    # inactive mask -> identity
    xi, yi = _rotate_batch(jnp.asarray(x.astype(np.float32)), jnp.asarray(y),
                           jnp.asarray([theta], np.float32),
                           jnp.asarray([False]))
    np.testing.assert_allclose(np.asarray(xi)[0], x[0], rtol=1e-6)
    np.testing.assert_array_equal(np.asarray(yi)[0], y[0])


# ---------------------------------------------------------------------------
# family pipelines
# ---------------------------------------------------------------------------

def test_pra_pipeline_normalizes_and_transforms_pairs(rng):
    # channel 0 encodes the label so image/label geometric consistency is
    # checkable after undoing the (linear) jitter+normalize
    y = (rng.rand(4, 16, 16) > 0.5).astype(np.int32)
    x = np.stack([y.astype(np.float32)] * 3, -1) * 0.5 + 0.25
    out = augment_batch_pra(jnp.asarray(x), jnp.asarray(y),
                            jax.random.PRNGKey(3), dtype="float32")
    img, lab = np.asarray(out["image"]), np.asarray(out["label"])
    assert img.shape == x.shape and lab.shape == y.shape
    assert lab.dtype == np.int32
    # geometric consistency: high-vs-low pixel split of channel 0 must match
    # the transformed label exactly (jitter/normalize are monotone per item)
    for i in range(4):
        thresh = (img[i, ..., 0].max() + img[i, ..., 0].min()) / 2
        np.testing.assert_array_equal(img[i, ..., 0] > thresh, lab[i] > 0)
    # imagenet normalize applied
    assert img.min() < -0.5
    # deterministic per key
    out2 = augment_batch_pra(jnp.asarray(x), jnp.asarray(y),
                             jax.random.PRNGKey(3), dtype="float32")
    np.testing.assert_array_equal(img, np.asarray(out2["image"]))


def test_attn_pipeline_prob_zero_is_identity(rng):
    x = rng.rand(3, 16, 16, 3).astype(np.float32)
    y = rng.randint(0, 2, size=(3, 16, 16)).astype(np.int32)
    out = augment_batch_attn(jnp.asarray(x), jnp.asarray(y),
                             jax.random.PRNGKey(0), prob=0.0, dtype="float32")
    np.testing.assert_allclose(np.asarray(out["image"]), x, rtol=1e-6)
    np.testing.assert_array_equal(np.asarray(out["label"]), y)


def test_attn_pipeline_flip_consistency(rng):
    # only flips active: image and label must move together, values exact
    x = rng.rand(6, 8, 8, 3).astype(np.float32)
    y = (x[..., 0] > 0.5).astype(np.int32)
    out = augment_batch_attn(jnp.asarray(x), jnp.asarray(y),
                             jax.random.PRNGKey(5), prob=1.0, blur_prob=0.0,
                             rotate_prob=0.0, jitter_prob=0.0, flip_prob=1.0,
                             dtype="float32")
    img, lab = np.asarray(out["image"]), np.asarray(out["label"])
    np.testing.assert_array_equal((img[..., 0] > 0.5).astype(np.int32), lab)
    # every item is one of the 3 flip variants
    for i in range(6):
        cands = [x[i][::-1], x[i][:, ::-1], x[i][::-1, ::-1]]
        assert any(np.allclose(img[i], c, rtol=1e-6) for c in cands)


def test_attn_pipeline_stays_unit_range(rng):
    x = rng.rand(4, 16, 16, 3).astype(np.float32)
    y = rng.randint(0, 2, size=(4, 16, 16)).astype(np.int32)
    out = augment_batch_attn(jnp.asarray(x), jnp.asarray(y),
                             jax.random.PRNGKey(1), dtype="float32")
    img = np.asarray(out["image"])
    assert img.min() >= 0.0 and img.max() <= 1.0


# ---------------------------------------------------------------------------
# family dispatch + host stubs
# ---------------------------------------------------------------------------

def test_family_dispatch_pra_and_attn(rng):
    cfg = get_default_cfg()
    cfg.MODEL.DTYPE = "float32"
    cfg.DATA_PIPE.DEVICE_AUG = True
    batch = {"image": rng.rand(2, 16, 16, 3).astype(np.float32),
             "label": rng.randint(0, 2, size=(2, 16, 16)).astype(np.int32)}
    cfg.AUG.NAME = "pra"
    out = make_device_augmenter(cfg)(batch, 0)
    assert np.asarray(out["image"]).min() < -0.5  # imagenet-normalized
    cfg.AUG.NAME = "attn"
    out = make_device_augmenter(cfg)(batch, 0)
    assert np.asarray(out["image"]).min() >= 0.0  # attn stays [0,1]


def test_host_stub_reduction():
    import random as _random
    from rnd_semantic_segmentation_tpu.data.augment import Augmenter

    cfg = get_default_cfg()
    cfg.DATA_PIPE.DEVICE_AUG = True
    cfg.INPUT.TRAINSIZE = 24
    assert device_aug_active(cfg, "train") and not device_aug_active(cfg, "test")

    img = (np.random.RandomState(0).rand(30, 40, 3) * 255).astype(np.uint8)
    lab = (np.random.RandomState(1).rand(30, 40) > 0.5).astype(np.float32)

    # attn stub: identity (dataset cv2_resize still runs downstream)
    cfg.AUG.NAME = "attn"
    t = Augmenter(cfg, "train").build_transform()
    o_im, o_lb = t(img, lab)
    np.testing.assert_array_equal(np.asarray(o_im), img)

    # pra stub: crop/resize only, uint8 out (collate /255 feeds the device)
    cfg.AUG.NAME = "pra"
    _random.seed(0)
    t = Augmenter(cfg, "train").build_transform()
    o_im, o_lb = t(img, lab)
    assert np.asarray(o_im).dtype == np.uint8
    assert np.asarray(o_im).shape == (24, 24, 3)
    assert np.asarray(o_lb).shape == (24, 24)

    # aspp stub at scales==1: ToArray only (device does resize/flip/jitter)
    cfg.AUG.NAME = "aspp"
    t = Augmenter(cfg, "train").build_transform()
    o_im, o_lb = t(img, lab)
    assert np.asarray(o_im).dtype == np.float32
    assert np.asarray(o_im).shape == img.shape and np.asarray(o_im).max() <= 1.0

    # eval mode keeps the full host test transform (normalizes)
    cfg.AUG.NAME = "pra"
    t = Augmenter(cfg, "test").build_transform()
    o_im, o_lb = t(img, lab)
    assert np.asarray(o_im).dtype == np.float32 and np.asarray(o_im).min() < -0.5


def test_fada_target_augmenter_skips_jitter(rng):
    cfg = get_default_cfg()
    cfg.AUG.NAME = "aspp"
    cfg.MODEL.DTYPE = "float32"
    cfg.INPUT.SOURCE_INPUT_SIZE_TRAIN = (16, 16)
    cfg.INPUT.TARGET_INPUT_SIZE_TRAIN = (16, 16)
    cfg.INPUT.HORIZONTAL_FLIP_PROB_TRAIN = 0.0
    cfg.INPUT.BRIGHTNESS = cfg.INPUT.CONTRAST = 0.9
    cfg.INPUT.SATURATION = cfg.INPUT.HUE = 0.0
    batch = {"image": rng.rand(2, 16, 16, 3).astype(np.float32),
             "label": rng.randint(0, 2, size=(2, 16, 16)).astype(np.int32)}
    tgt = make_device_augmenter(cfg, is_source=False)(batch, 0)
    # target: no flip/jitter -> pure normalize, exactly invertible
    mean = np.asarray(cfg.INPUT.PIXEL_MEAN)
    std = np.asarray(cfg.INPUT.PIXEL_STD)
    np.testing.assert_allclose(np.asarray(tgt["image"]) * std + mean,
                               batch["image"], rtol=1e-5, atol=1e-6)
    # source with huge jitter: differs from pure normalize
    src = make_device_augmenter(cfg, is_source=True)(batch, 0)
    assert np.abs(np.asarray(src["image"]) * std + mean - batch["image"]).max() > 0.05
