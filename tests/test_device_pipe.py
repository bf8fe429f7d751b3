import numpy as np

import jax
import jax.numpy as jnp

from rnd_semantic_segmentation_tpu.configs import get_default_cfg
from rnd_semantic_segmentation_tpu.data.device_pipe import augment_batch, make_device_augmenter


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
