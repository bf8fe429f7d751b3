"""Exact, MXU-friendly spatial resizing.

PyTorch bilinear semantics (both ``align_corners`` flavors of
``F.interpolate(mode="bilinear")``, used throughout the reference: e.g.
align_corners=True at core/models/classifiers/aspp/classifier.py:31 and
core/utils/utility.py:185; default align_corners=False at
core/models/classifiers/gcpacc/gcpa_cc2.py:79-82 and PraNet upsamples) are NOT
what ``jax.image.resize`` computes (it antialiases on downscale and uses
half-pixel centers only).  Logit parity with the reference therefore requires
our own resize.

TPU-first design: since all shapes are static under jit, the 1-D interpolation
weights along H and W are *constants* computed with numpy at trace time, and
the resize lowers to two dense matmuls (`W_h @ x` and `x @ W_w^T`) which XLA
tiles onto the MXU — far faster than gather-based resizes on TPU and exactly
reproducible.
"""

from __future__ import annotations

import functools
from typing import Sequence, Tuple

import jax.numpy as jnp
import numpy as np

__all__ = [
    "resize_bilinear",
    "resize_nearest",
    "upsample2x_bilinear",
    "interp_matrix",
]


@functools.lru_cache(maxsize=None)
def _interp_matrix_np(in_size: int, out_size: int, align_corners: bool) -> np.ndarray:
    """(out_size, in_size) row-stochastic bilinear interpolation matrix."""
    if in_size == out_size:
        return np.eye(out_size, dtype=np.float32)
    if align_corners and out_size > 1:
        src = np.arange(out_size, dtype=np.float64) * (in_size - 1) / (out_size - 1)
    elif align_corners:  # out_size == 1
        src = np.zeros((1,), dtype=np.float64)
    else:
        scale = in_size / out_size
        src = (np.arange(out_size, dtype=np.float64) + 0.5) * scale - 0.5
        src = np.maximum(src, 0.0)  # torch clamps negative source coords to 0
    src = np.minimum(src, in_size - 1)
    lo = np.floor(src).astype(np.int64)
    hi = np.minimum(lo + 1, in_size - 1)
    frac = (src - lo).astype(np.float64)
    mat = np.zeros((out_size, in_size), dtype=np.float64)
    mat[np.arange(out_size), lo] += 1.0 - frac
    mat[np.arange(out_size), hi] += frac
    return mat.astype(np.float32)


def interp_matrix(in_size: int, out_size: int, align_corners: bool) -> np.ndarray:
    """Public access to the cached interpolation matrix (for tests/kernels)."""
    return _interp_matrix_np(int(in_size), int(out_size), bool(align_corners))


@functools.lru_cache(maxsize=None)
def _interp_taps_np(in_size: int, out_size: int, align_corners: bool):
    """(lo_idx, hi_idx, frac) 1-D tap arrays — same coordinates as the matrix."""
    if align_corners and out_size > 1:
        src = np.arange(out_size, dtype=np.float64) * (in_size - 1) / (out_size - 1)
    elif align_corners:
        src = np.zeros((1,), dtype=np.float64)
    else:
        scale = in_size / out_size
        src = (np.arange(out_size, dtype=np.float64) + 0.5) * scale - 0.5
        src = np.maximum(src, 0.0)
    src = np.minimum(src, in_size - 1)
    lo = np.floor(src).astype(np.int32)
    hi = np.minimum(lo + 1, in_size - 1).astype(np.int32)
    frac = (src - lo).astype(np.float32)
    return lo, hi, frac


def resize_bilinear_gather(
    x: jnp.ndarray,
    size: Tuple[int, int],
    align_corners: bool = False,
) -> jnp.ndarray:
    """Gather+lerp formulation (identical math; torch bilinear is 2-tap).
    Measured SLOWER than the matmul form on TPU v5e for the 64->512 training
    upsample — kept as a variant for gather-friendly shapes.
    """
    h_out, w_out = int(size[0]), int(size[1])
    squeeze = x.ndim == 3
    if squeeze:
        x = x[None]
    n, h_in, w_in, c = x.shape
    if (h_in, w_in) == (h_out, w_out):
        return x[0] if squeeze else x
    dtype = x.dtype
    out = x.astype(jnp.float32)

    lo, hi, frac = _interp_taps_np(h_in, h_out, align_corners)
    if h_out != h_in:
        fy = jnp.asarray(frac)[None, :, None, None]
        out = out[:, jnp.asarray(lo)] * (1 - fy) + out[:, jnp.asarray(hi)] * fy
    lo, hi, frac = _interp_taps_np(w_in, w_out, align_corners)
    if w_out != w_in:
        fx = jnp.asarray(frac)[None, None, :, None]
        out = out[:, :, jnp.asarray(lo)] * (1 - fx) + out[:, :, jnp.asarray(hi)] * fx
    out = out.astype(dtype)
    return out[0] if squeeze else out


def resize_bilinear(
    x: jnp.ndarray,
    size: Tuple[int, int],
    align_corners: bool = False,
) -> jnp.ndarray:
    """Bilinear-resize NHWC (or HWC) tensor to ``size`` = (H_out, W_out).

    Bit-matches ``torch.nn.functional.interpolate(x, size, mode="bilinear",
    align_corners=...)`` up to float associativity; interpolation matrices
    are trace-time constants and the two passes run on the MXU (measured
    faster than the gather+lerp formulation on TPU v5e)."""
    h_out, w_out = int(size[0]), int(size[1])
    squeeze = x.ndim == 3
    if squeeze:
        x = x[None]
    n, h_in, w_in, c = x.shape
    if (h_in, w_in) == (h_out, w_out):
        return x[0] if squeeze else x
    dtype = x.dtype
    xf = x.astype(jnp.float32)
    wh = jnp.asarray(_interp_matrix_np(h_in, h_out, align_corners))
    ww = jnp.asarray(_interp_matrix_np(w_in, w_out, align_corners))
    out = jnp.einsum("oh,nhwc->nowc", wh, xf, precision="highest")
    out = jnp.einsum("pw,nowc->nopc", ww, out, precision="highest")
    out = out.astype(dtype)
    return out[0] if squeeze else out


def resize_nearest(x: jnp.ndarray, size: Tuple[int, int]) -> jnp.ndarray:
    """Nearest-neighbor resize of NHWC (or HWC) tensor, torch semantics.

    torch ``F.interpolate(mode="nearest")`` picks ``src = floor(i * in/out)``.
    Used for label maps, so it's an exact gather (no matmul) and preserves
    integer dtypes.
    """
    h_out, w_out = int(size[0]), int(size[1])
    squeeze = x.ndim == 3
    if squeeze:
        x = x[None]
    n, h_in, w_in, c = x.shape
    if (h_in, w_in) == (h_out, w_out):
        return x[0] if squeeze else x
    rows = np.minimum((np.arange(h_out) * (h_in / h_out)).astype(np.int64), h_in - 1)
    cols = np.minimum((np.arange(w_out) * (w_in / w_out)).astype(np.int64), w_in - 1)
    out = x[:, jnp.asarray(rows)][:, :, jnp.asarray(cols)]
    return out[0] if squeeze else out


def upsample2x_bilinear(x: jnp.ndarray, align_corners: bool = False) -> jnp.ndarray:
    """Convenience 2x bilinear upsample of an NHWC tensor."""
    _, h, w, _ = x.shape
    return resize_bilinear(x, (2 * h, 2 * w), align_corners=align_corners)


def scaled_size(size: Sequence[int], scale: float) -> Tuple[int, int]:
    """torch ``F.interpolate(scale_factor=s)`` output size: floor(dim * s)."""
    return int(size[0] * scale), int(size[1] * scale)
