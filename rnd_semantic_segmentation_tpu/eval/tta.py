"""Test-time inference helpers: flip TTA and multi-scale inference.

Semantics from /root/reference/core/utils/utility.py:
  * ``inference`` (:179-191): optional horizontal-flip TTA — the flipped copy
    is batched with the original, outputs bilinear-upsampled
    (align_corners=True) to label size, softmaxed, flip-averaged.
  * ``multi_scale_inference`` (:193-209): scales [0.7, 1.0, 1.3] (+flip),
    predictions summed and averaged.

TPU note: each (scale, flip) combination is a static-shape jitted call; the
flip rides inside the same batch like the reference, doubling MXU utilization
instead of running twice.
"""

from __future__ import annotations

from typing import Callable, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from ..ops import resize_bilinear

Array = jnp.ndarray
ForwardFn = Callable[[Array, Tuple[int, int]], Array]
# ForwardFn(image_batch, label_size) -> logits [B,H,W,C] at label size


def inference(forward: ForwardFn, image: Array, label_size: Tuple[int, int],
              flip: bool = True) -> Array:
    """Single-scale inference -> softmax probabilities [1,H,W,C]."""
    if flip:
        image = jnp.concatenate([image, image[:, :, ::-1, :]], axis=0)
    output = forward(image, label_size)
    output = resize_bilinear(output.astype(jnp.float32), label_size,
                             align_corners=True)
    output = jax.nn.softmax(output, axis=-1)
    if flip:
        output = (output[0] + output[1][:, ::-1, :]) / 2
    else:
        output = output[0]
    return output[None]


def multi_scale_inference(forward: ForwardFn, image: Array,
                          label_size: Tuple[int, int], flip: bool = True,
                          scales: Sequence[float] = (0.7, 1.0, 1.3)) -> Array:
    """Multi-scale (+flip) averaged probabilities [1,H,W,C]."""
    h, w = image.shape[1:3]
    output = None
    for s in scales:
        scaled = resize_bilinear(image, (int(h * s), int(w * s)),
                                 align_corners=True)
        pred = inference(forward, scaled, label_size, flip=False)
        output = pred if output is None else output + pred
        if flip:
            flipped = scaled[:, :, ::-1, :]
            pred = inference(forward, flipped, label_size, flip=False)
            output = output + pred[:, :, ::-1, :]
    denom = len(scales) * (2 if flip else 1)
    return output / denom
