"""Pooling primitives on NHWC tensors.

Semantics match the torch ops the reference uses:
  * ``max_pool`` — ``nn.MaxPool2d(kernel, stride, padding)`` with -inf padding
    (HarDNet stem, hardnet_68.py:214-236; ResNet stems).
  * ``avg_pool`` — ``nn.AvgPool2d``/``F.avg_pool2d`` with count_include_pad=True
    (torch default), which PraNet's structure_loss 31x31 window relies on
    (core/trainers/pranet_trainer.py:22-31).
  * ``adaptive_avg_pool_1x1`` — global average (CA module, gcpa_gald.py:20).
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp
from jax import lax

__all__ = ["max_pool", "avg_pool", "adaptive_avg_pool_1x1"]


def max_pool(x: jnp.ndarray, kernel: int, stride: int, padding: int = 0) -> jnp.ndarray:
    pad = ((0, 0), (padding, padding), (padding, padding), (0, 0))
    init = -jnp.inf if jnp.issubdtype(x.dtype, jnp.floating) else jnp.iinfo(x.dtype).min
    return lax.reduce_window(
        x, init, lax.max,
        window_dimensions=(1, kernel, kernel, 1),
        window_strides=(1, stride, stride, 1),
        padding=pad,
    )


def avg_pool(
    x: jnp.ndarray, kernel: int, stride: int, padding: int = 0,
    count_include_pad: bool = True,
) -> jnp.ndarray:
    if count_include_pad and kernel >= 7:
        # separable two-pass sum: O(k) adds/pixel instead of O(k^2) —
        # mathematically identical for count_include_pad=True windows
        # (PraNet's 31x31 structure-loss window, pranet_trainer.py:23)
        xf = x.astype(jnp.float32)
        row = lax.reduce_window(
            xf, 0.0, lax.add,
            window_dimensions=(1, kernel, 1, 1),
            window_strides=(1, stride, 1, 1),
            padding=((0, 0), (padding, padding), (0, 0), (0, 0)))
        summed = lax.reduce_window(
            row, 0.0, lax.add,
            window_dimensions=(1, 1, kernel, 1),
            window_strides=(1, 1, stride, 1),
            padding=((0, 0), (0, 0), (padding, padding), (0, 0)))
        return (summed / float(kernel * kernel)).astype(x.dtype)
    pad = ((0, 0), (padding, padding), (padding, padding), (0, 0))
    summed = lax.reduce_window(
        x.astype(jnp.float32), 0.0, lax.add,
        window_dimensions=(1, kernel, kernel, 1),
        window_strides=(1, stride, stride, 1),
        padding=pad,
    )
    if count_include_pad:
        out = summed / float(kernel * kernel)
    else:
        ones = jnp.ones(x.shape[:3] + (1,), jnp.float32)
        counts = lax.reduce_window(
            ones, 0.0, lax.add,
            window_dimensions=(1, kernel, kernel, 1),
            window_strides=(1, stride, stride, 1),
            padding=pad,
        )
        out = summed / counts
    return out.astype(x.dtype)


def adaptive_avg_pool_1x1(x: jnp.ndarray) -> jnp.ndarray:
    """Global average over H,W with keepdims, NHWC."""
    return jnp.mean(x, axis=(1, 2), keepdims=True)
