"""Device-side preprocessing: fused resize -> flip -> color-jitter -> normalize.

The reference does all augmentation on CPU workers (albumentations/PIL,
core/components/augment.py) — at TPU step times the host becomes the
bottleneck.  This pipeline moves the elementwise/augment math into one jitted
device function (XLA fuses it into a couple of kernels):

  host: decode (PIL) -> uint8/float HWC batch   (cheap, IO-bound)
  device: bilinear resize (matmul) -> random hflip -> brightness/contrast/
          saturation/hue jitter -> mean/std normalize -> model dtype

Randomness uses a counter-derived jax PRNG key so the pipeline is
reproducible and per-step independent.  Labels ride along with nearest resize
and the same flips.
"""

from __future__ import annotations

import functools
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from ..ops import resize_bilinear, resize_nearest


def _rgb_to_gray(x):
    return (0.299 * x[..., 0] + 0.587 * x[..., 1] + 0.114 * x[..., 2])[..., None]


@functools.partial(jax.jit, static_argnames=("size", "flip_prob", "brightness",
                                              "contrast", "saturation", "hue",
                                              "mean", "std", "dtype"))
def augment_batch(
    images: jnp.ndarray,          # [B,H,W,3] float in [0,1]
    labels: jnp.ndarray,          # [B,H,W] int
    rng: jax.Array,
    size: Optional[Tuple[int, int]] = None,
    flip_prob: float = 0.5,
    brightness: float = 0.0,
    contrast: float = 0.0,
    saturation: float = 0.0,
    hue: float = 0.0,
    mean: Tuple[float, ...] = (0.485, 0.456, 0.406),
    std: Tuple[float, ...] = (0.229, 0.224, 0.225),
    dtype: str = "bfloat16",
) -> Dict[str, jnp.ndarray]:
    b = images.shape[0]
    x = images.astype(jnp.float32)
    y = labels

    if size is not None and tuple(size) != tuple(x.shape[1:3]):
        x = resize_bilinear(x, size)
        y = resize_nearest(y[..., None], size)[..., 0]

    keys = jax.random.split(rng, 5)
    if flip_prob > 0:
        do = jax.random.bernoulli(keys[0], flip_prob, (b, 1, 1, 1))
        x = jnp.where(do, x[:, :, ::-1, :], x)
        y = jnp.where(do[..., 0], y[:, :, ::-1], y)
    if brightness > 0:
        f = jax.random.uniform(keys[1], (b, 1, 1, 1),
                               minval=max(0, 1 - brightness), maxval=1 + brightness)
        x = x * f
    if contrast > 0:
        f = jax.random.uniform(keys[2], (b, 1, 1, 1),
                               minval=max(0, 1 - contrast), maxval=1 + contrast)
        m = jnp.mean(_rgb_to_gray(x), axis=(1, 2, 3), keepdims=True)
        x = (x - m) * f + m
    if saturation > 0:
        f = jax.random.uniform(keys[3], (b, 1, 1, 1),
                               minval=max(0, 1 - saturation), maxval=1 + saturation)
        g = _rgb_to_gray(x)
        x = (x - g) * f + g
    if hue > 0:
        # cheap hue rotation in YIQ space (exact HSV is gather-heavy on TPU)
        theta = jax.random.uniform(keys[4], (b, 1, 1),
                                   minval=-hue, maxval=hue) * 2 * jnp.pi
        yiq_y = _rgb_to_gray(x)[..., 0]
        i = 0.596 * x[..., 0] - 0.274 * x[..., 1] - 0.322 * x[..., 2]
        q = 0.211 * x[..., 0] - 0.523 * x[..., 1] + 0.312 * x[..., 2]
        cos, sin = jnp.cos(theta), jnp.sin(theta)
        i2 = cos * i - sin * q
        q2 = sin * i + cos * q
        r = yiq_y + 0.956 * i2 + 0.621 * q2
        g2 = yiq_y - 0.272 * i2 - 0.647 * q2
        b2 = yiq_y - 1.106 * i2 + 1.703 * q2
        x = jnp.stack([r, g2, b2], axis=-1)

    x = jnp.clip(x, 0.0, 1.0)
    x = (x - jnp.asarray(mean)) / jnp.asarray(std)
    return {"image": x.astype(jnp.dtype(dtype)), "label": y}


def make_device_augmenter(cfg):
    """Config-driven wrapper: aug(batch, step) -> augmented device batch."""
    base = jax.random.PRNGKey(cfg.DATA_PIPE.SEED)
    w, h = cfg.INPUT.SOURCE_INPUT_SIZE_TRAIN

    def fn(batch: Dict, step: int) -> Dict:
        out = augment_batch(
            jnp.asarray(batch["image"]), jnp.asarray(batch["label"]),
            jax.random.fold_in(base, step),
            size=(h, w),
            flip_prob=cfg.INPUT.HORIZONTAL_FLIP_PROB_TRAIN,
            brightness=cfg.INPUT.BRIGHTNESS, contrast=cfg.INPUT.CONTRAST,
            saturation=cfg.INPUT.SATURATION, hue=cfg.INPUT.HUE,
            mean=tuple(cfg.INPUT.PIXEL_MEAN), std=tuple(cfg.INPUT.PIXEL_STD),
            dtype=cfg.MODEL.DTYPE,
        )
        if "name" in batch:
            out["name"] = batch["name"]
        return out

    return fn
