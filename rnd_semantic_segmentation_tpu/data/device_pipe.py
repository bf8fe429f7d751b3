"""Device-side preprocessing: fused resize -> flip -> color-jitter -> normalize.

The reference does all augmentation on CPU workers (albumentations/PIL,
core/components/augment.py:26-120) — at TPU step times the host becomes the
bottleneck.  This pipeline moves the elementwise/augment math into jitted
device functions (XLA fuses them into a handful of kernels):

  host: decode (PIL/native) -> variable-shape geometry (crop) -> fixed-size
        uint8/float HWC batch   (cheap, IO-bound — data/augment.py device stubs)
  device: per-item flip / rot90 / motion-blur / rotate / color jitter /
          normalize, one compiled graph per family

Family dispatch mirrors the host ``Augmenter`` (cfg.AUG.NAME):
  * "pra"  -> augment_batch_pra  (rot90 / flip / jitter / imagenet normalize;
              the 220-crop stays on host — it needs the pre-resize image)
  * "attn" -> augment_batch_attn (outer apply-prob; motion blur / rotate /
              jitter / flip; output stays in [0,1] like the host path)
  * else   -> augment_batch      (aspp-style resize/flip/jitter/normalize,
              incl. TO_BGR255; the documented "none" pairing keeps working)

Randomness uses a counter-derived jax PRNG key so the pipeline is
reproducible and per-step independent.  Labels ride along with nearest
resampling and the same geometric ops.  Stochastic parity with the host
pipelines is distributional, not bitwise: the host jitters uint8 via PIL in a
random op order and blurs/rotates before the resize; the device jitters
float [0,1] in a fixed order after it.
"""

from __future__ import annotations

import functools
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from ..ops import resize_bilinear, resize_nearest


def _rgb_to_gray(x):
    return (0.299 * x[..., 0] + 0.587 * x[..., 1] + 0.114 * x[..., 2])[..., None]


def _color_jitter(x, keys, brightness, contrast, saturation, hue):
    """torchvision-style per-item color jitter on [B,H,W,3] in [0,1].

    Brightness/contrast/saturation follow PIL.ImageEnhance semantics (the
    host ColorJitter, data/transforms.py); hue is a cheap YIQ rotation
    (exact HSV is gather-heavy on TPU).  Factors are per-ITEM, matching the
    host pipeline where every sample draws its own jitter."""
    b = x.shape[0]
    if brightness > 0:
        f = jax.random.uniform(keys[0], (b, 1, 1, 1),
                               minval=max(0, 1 - brightness), maxval=1 + brightness)
        x = x * f
    if contrast > 0:
        f = jax.random.uniform(keys[1], (b, 1, 1, 1),
                               minval=max(0, 1 - contrast), maxval=1 + contrast)
        m = jnp.mean(_rgb_to_gray(x), axis=(1, 2, 3), keepdims=True)
        x = (x - m) * f + m
    if saturation > 0:
        f = jax.random.uniform(keys[2], (b, 1, 1, 1),
                               minval=max(0, 1 - saturation), maxval=1 + saturation)
        g = _rgb_to_gray(x)
        x = (x - g) * f + g
    if hue > 0:
        theta = jax.random.uniform(keys[3], (b, 1, 1),
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
    return x


def _flip_select(x, y, code, active):
    """Per-item albumentations Flip codes (augment.py:101-106): 0 = vertical
    (H axis), 1 = horizontal (W axis), 2 (the host's -1) = both."""
    v = active & ((code == 0) | (code == 2))
    h = active & ((code == 1) | (code == 2))
    x = jnp.where(v[:, None, None, None], x[:, ::-1], x)
    y = jnp.where(v[:, None, None], y[:, ::-1], y)
    x = jnp.where(h[:, None, None, None], x[:, :, ::-1], x)
    y = jnp.where(h[:, None, None], y[:, :, ::-1], y)
    return x, y


def _rot90_select(x, y, k):
    """Per-item np.rot90(·, k) on square [B,S,S,·] (pra_trans rot90)."""
    xo, yo = x, y
    for i in (1, 2, 3):
        m = k == i
        xo = jnp.where(m[:, None, None, None], jnp.rot90(x, i, (1, 2)), xo)
        yo = jnp.where(m[:, None, None], jnp.rot90(y, i, (1, 2)), yo)
    return xo, yo


def _motion_blur_batch(x, key, active):
    """Line-kernel blur matching the host `_motion_blur` (augment.py:44-60):
    average of k wrap-around-shifted copies (np.roll semantics), per-item
    random direction in {h, v, d1, d2} and ksize in {3, 5, 7}."""
    kd, kk = jax.random.split(key)
    b = x.shape[0]
    dcode = jax.random.randint(kd, (b,), 0, 4)
    kcode = jax.random.randint(kk, (b,), 0, 3)          # -> ksize 3 / 5 / 7
    out = jnp.zeros_like(x)
    # (sy, sx) roll steps per host direction: h=W axis, v=H axis, d1, d2
    for d, (sy, sx) in enumerate(((0, 1), (1, 0), (1, 1), (1, -1))):
        acc, per_k = x, []
        for o in (1, 2, 3):
            acc = (acc + jnp.roll(x, (o * sy, o * sx), (1, 2))
                   + jnp.roll(x, (-o * sy, -o * sx), (1, 2)))
            per_k.append(acc / (2 * o + 1))
        sel = jnp.where((kcode == 0)[:, None, None, None], per_k[0],
                        jnp.where((kcode == 1)[:, None, None, None],
                                  per_k[1], per_k[2]))
        out = out + jnp.where((dcode == d)[:, None, None, None], sel, 0.0)
    return jnp.where(active[:, None, None, None], out, x)


def _rotate_batch(x, y, theta, active):
    """Per-item rotation by `theta` radians CCW about the image center with
    zero fill — PIL Image.rotate(angle, BILINEAR/NEAREST) semantics
    (augment.py:94-97).  Bilinear gather for the image, nearest for labels."""
    b, h, w = x.shape[:3]
    c = x.shape[3]
    yy = jnp.arange(h, dtype=jnp.float32)[None, :, None]
    xx = jnp.arange(w, dtype=jnp.float32)[None, None, :]
    cy, cx = (h - 1) / 2.0, (w - 1) / 2.0
    cos = jnp.cos(theta)[:, None, None]
    sin = jnp.sin(theta)[:, None, None]
    dx, dy = xx - cx, yy - cy
    # inverse (output -> source) map of a CCW-on-screen rotation, y down
    sx = cos * dx - sin * dy + cx
    sy = sin * dx + cos * dy + cy

    x0, y0 = jnp.floor(sx), jnp.floor(sy)
    wx, wy = (sx - x0)[..., None], (sy - y0)[..., None]
    valid = ((sx >= 0) & (sx <= w - 1) & (sy >= 0) & (sy <= h - 1))
    x0i = jnp.clip(x0, 0, w - 1).astype(jnp.int32)
    x1i = jnp.clip(x0 + 1, 0, w - 1).astype(jnp.int32)
    y0i = jnp.clip(y0, 0, h - 1).astype(jnp.int32)
    y1i = jnp.clip(y0 + 1, 0, h - 1).astype(jnp.int32)
    flat = x.reshape(b, h * w, c)

    def g(yi, xi):
        idx = (yi * w + xi).reshape(b, h * w, 1)
        return jnp.take_along_axis(flat, idx, axis=1).reshape(b, h, w, c)

    img = (g(y0i, x0i) * (1 - wx) * (1 - wy) + g(y0i, x1i) * wx * (1 - wy)
           + g(y1i, x0i) * (1 - wx) * wy + g(y1i, x1i) * wx * wy)
    img = jnp.where(valid[..., None], img, 0.0)
    x_out = jnp.where(active[:, None, None, None], img, x)

    xn = jnp.clip(jnp.round(sx), 0, w - 1).astype(jnp.int32)
    yn = jnp.clip(jnp.round(sy), 0, h - 1).astype(jnp.int32)
    lab = jnp.take_along_axis(y.reshape(b, h * w),
                              (yn * w + xn).reshape(b, h * w), axis=1)
    lab = jnp.where(valid, lab.reshape(b, h, w), 0).astype(y.dtype)
    y_out = jnp.where(active[:, None, None], lab, y)
    return x_out, y_out


@functools.partial(jax.jit, static_argnames=("brightness", "contrast",
                                              "saturation", "hue",
                                              "mean", "std", "dtype"))
def augment_batch_pra(
    images: jnp.ndarray,          # [B,S,S,3] float in [0,1] (square)
    labels: jnp.ndarray,          # [B,S,S] int
    rng: jax.Array,
    brightness: float = 0.2,
    contrast: float = 0.2,
    saturation: float = 0.2,
    hue: float = 0.1,
    mean: Tuple[float, ...] = (0.485, 0.456, 0.406),
    std: Tuple[float, ...] = (0.229, 0.224, 0.225),
    dtype: str = "bfloat16",
) -> Dict[str, jnp.ndarray]:
    """Device half of pra_trans (augment.py:111-149): rot90 / flip / jitter /
    imagenet normalize.  The p=0.5 220-crop + resize stays on host (it needs
    the pre-resize image); rot90/flip commute with it distributionally."""
    assert images.shape[1] == images.shape[2], "pra pipeline expects square inputs"
    x = images.astype(jnp.float32)
    y = labels
    b = x.shape[0]
    keys = jax.random.split(rng, 6)
    x, y = _rot90_select(x, y, jax.random.randint(keys[0], (b,), 0, 4))
    d = jax.random.randint(keys[1], (b,), 0, 4)   # host choice([0,1,-1,None])
    x, y = _flip_select(x, y, d, d < 3)
    x = _color_jitter(x, keys[2:6], brightness, contrast, saturation, hue)
    x = jnp.clip(x, 0.0, 1.0)
    x = (x - jnp.asarray(mean)) / jnp.asarray(std)
    return {"image": x.astype(jnp.dtype(dtype)), "label": y}


@functools.partial(jax.jit, static_argnames=("prob", "blur_prob", "rotate_prob",
                                              "jitter_prob", "flip_prob",
                                              "dtype"))
def augment_batch_attn(
    images: jnp.ndarray,          # [B,H,W,3] float in [0,1]
    labels: jnp.ndarray,          # [B,H,W] int
    rng: jax.Array,
    prob: float = 0.7,
    blur_prob: float = 0.7,
    rotate_prob: float = 0.7,
    jitter_prob: float = 0.7,
    flip_prob: float = 0.7,
    dtype: str = "bfloat16",
) -> Dict[str, jnp.ndarray]:
    """Device half of attn_trans (augment.py:81-108): per-item outer
    apply-prob gate, then MotionBlur / Rotate(±90°) / ColorJitter(0.2×4) /
    Flip with their own probabilities.  Output stays un-normalized [0,1]
    (the attn family consumes raw [0,1], loader.py collate rule)."""
    x = images.astype(jnp.float32)
    y = labels
    b = x.shape[0]
    keys = jax.random.split(rng, 9)
    apply = jax.random.bernoulli(keys[0], prob, (b,))
    blur_m = apply & jax.random.bernoulli(keys[1], blur_prob, (b,))
    x = _motion_blur_batch(x, keys[2], blur_m)
    rot_m = apply & jax.random.bernoulli(keys[3], rotate_prob, (b,))
    theta = jax.random.uniform(keys[4], (b,), minval=-jnp.pi / 2,
                               maxval=jnp.pi / 2)
    x, y = _rotate_batch(x, y, theta, rot_m)
    jit_m = apply & jax.random.bernoulli(keys[5], jitter_prob, (b,))
    xj = _color_jitter(x, jax.random.split(keys[6], 4), 0.2, 0.2, 0.2, 0.2)
    x = jnp.where(jit_m[:, None, None, None], xj, x)
    flip_m = apply & jax.random.bernoulli(keys[7], flip_prob, (b,))
    d = jax.random.randint(keys[8], (b,), 0, 3)   # host choice([0, 1, -1])
    x, y = _flip_select(x, y, d, flip_m)
    x = jnp.clip(x, 0.0, 1.0)
    return {"image": x.astype(jnp.dtype(dtype)), "label": y}


@functools.partial(jax.jit, static_argnames=("size", "flip_prob", "brightness",
                                              "contrast", "saturation", "hue",
                                              "mean", "std", "dtype",
                                              "to_bgr255"))
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
    to_bgr255: bool = False,
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
    x = _color_jitter(x, keys[1:5], brightness, contrast, saturation, hue)

    x = jnp.clip(x, 0.0, 1.0)
    if to_bgr255:
        # mirror data/transforms.py Normalize(to_bgr255=True) for caffe-style
        # PIXEL_MEAN/STD in 0..255 scale
        x = x[..., ::-1] * 255.0
    x = (x - jnp.asarray(mean)) / jnp.asarray(std)
    return {"image": x.astype(jnp.dtype(dtype)), "label": y}


def device_aug_active(cfg, mode: str = "train") -> bool:
    """Shared predicate used by the host Augmenter and the trainers: device
    augmentation replaces the host train transforms for this config/mode.
    Eval keeps the host test transforms (they are deterministic and cheap)."""
    return bool(cfg.DATA_PIPE.DEVICE_AUG) and mode == "train"


def make_device_augmenter(cfg, is_source: bool = True):
    """Config-driven wrapper: aug(batch, step) -> augmented device batch.

    Dispatches on cfg.AUG.NAME like the host Augmenter (augment.py:69-78);
    `is_source=False` (FADA target stream) draws an independent key stream
    and — for the aspp pipeline — uses the target train size and skips the
    color jitter, matching aspp_trans' source-only ColorJitter."""
    name = cfg.AUG.NAME
    base = jax.random.PRNGKey(cfg.DATA_PIPE.SEED + (0 if is_source else 7919))
    dtype = cfg.MODEL.DTYPE

    if name == "pra":
        def impl(image, label, key):
            return augment_batch_pra(image, label, key, dtype=dtype)
    elif name == "attn":
        aug = cfg.AUG
        def impl(image, label, key):
            return augment_batch_attn(
                image, label, key, prob=aug.PROB, blur_prob=aug.BLUR_PROB,
                rotate_prob=aug.ROTATE_PROB, jitter_prob=aug.JITTER_PROB,
                flip_prob=aug.FLIP_PROB, dtype=dtype)
    else:  # aspp-style; also the documented AUG.NAME="none" pairing
        w, h = (cfg.INPUT.SOURCE_INPUT_SIZE_TRAIN if is_source
                else cfg.INPUT.TARGET_INPUT_SIZE_TRAIN)
        jit_on = is_source
        def impl(image, label, key):
            return augment_batch(
                image, label, key, size=(h, w),
                flip_prob=cfg.INPUT.HORIZONTAL_FLIP_PROB_TRAIN,
                brightness=cfg.INPUT.BRIGHTNESS if jit_on else 0.0,
                contrast=cfg.INPUT.CONTRAST if jit_on else 0.0,
                saturation=cfg.INPUT.SATURATION if jit_on else 0.0,
                hue=cfg.INPUT.HUE if jit_on else 0.0,
                mean=tuple(cfg.INPUT.PIXEL_MEAN), std=tuple(cfg.INPUT.PIXEL_STD),
                dtype=dtype, to_bgr255=cfg.INPUT.TO_BGR255)

    def fn(batch: Dict, step: int) -> Dict:
        out = impl(jnp.asarray(batch["image"]), jnp.asarray(batch["label"]),
                   jax.random.fold_in(base, step))
        if "name" in batch:
            out["name"] = batch["name"]
        return out

    return fn
