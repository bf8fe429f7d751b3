"""Space-to-depth convolution: exact conv rewrite for narrow-channel convs.

Motivation (pranet/gald perf, VERDICT r3 items 3+6): PraNet's Res2Net branch
convs are 26-208 channels wide and its RFB decoder runs at 32 channels
(/root/reference/core/models/classifiers/pranet/Res2Net_v1b.py:15-91,
PraNet_Res2Net.py RFB_modified) — far below the MXU's 128x128 tile, so each
conv occupies a sliver of the systolic array (26/128 output lanes ~ 20%
utilization; family MFU 0.155).  Re-packing a 2x2 spatial block into the
channel dim quadruples the operand widths at identical semantics: the same
conv becomes a [2,2,4C,4C] conv at half resolution whose operands tile the
MXU ~4x better, at 16/9 the MAC count — a net win whenever the conv is
MXU-occupancy-bound (the classic TPU space-to-depth trick from MLPerf
ResNet stems, applied mid-network).

``conv2d_s2d(x, kernel, ...)`` computes EXACTLY
``lax.conv_general_dilated(x, kernel, stride, padding, NHWC/HWIO/NHWC)``
(up to float summation order) by:
  1. applying the conv's spatial padding up front,
  2. space-to-depth packing the padded input (block b=2),
  3. scattering the [kh,kw,Ci,Co] kernel into a dense block-space kernel —
     [kh',kw',4Ci,4Co] for stride 1 (every output phase is produced) or
     [kh',kw',4Ci,Co] for stride 2 (the conv's own downsampling IS the
     block step, so no output phase expansion), with kh' = kh//2 + 1,
  4. a VALID conv in block space, and depth-to-space for stride 1.

The block kernel is assembled in-graph from the original parameter with
static scatter indices (each (phase, tap) pair maps to exactly one
(block-offset, sub-position) slot), so parameters, checkpoints, and
gradients are untouched — this is a pure execution-layout choice.

Supported: dilation 1, stride (1,1)/(2,2), odd kernels, groups=1, and
spatial dims where size+padding is even.  ``s2d_supported`` gates callers.
"""

from __future__ import annotations

import contextlib
import contextvars
from typing import Optional, Tuple

import jax.numpy as jnp
from jax import lax


def _pair(v):
    return (v, v) if isinstance(v, int) else tuple(v)


def space_to_depth(x: jnp.ndarray, b: int = 2) -> jnp.ndarray:
    """[B,H,W,C] -> [B,H/b,W/b,C*b*b]; channel order (row-phase, col-phase, c)."""
    n, h, w, c = x.shape
    x = x.reshape(n, h // b, b, w // b, b, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(n, h // b, w // b, b * b * c)


def depth_to_space(x: jnp.ndarray, b: int = 2) -> jnp.ndarray:
    """Inverse of :func:`space_to_depth`."""
    n, h, w, cbb = x.shape
    c = cbb // (b * b)
    x = x.reshape(n, h, w, b, b, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(n, h * b, w * b, c)


def _block_kernel_s1(kernel: jnp.ndarray) -> jnp.ndarray:
    """Stride-1 scatter: [kh,kw,Ci,Co] -> [kh',kw',4Ci,4Co].

    out[2i+ph] = sum_u K[u] * xpad[2i+ph+u]; writing xpad rows as 2s+a gives
    the bijection a=(ph+u)%2, s=(ph+u)//2 — each tap lands in one slot.
    """
    kh, kw, ci, co = kernel.shape
    kh2, kw2 = kh // 2 + 1, kw // 2 + 1
    kb = jnp.zeros((kh2, kw2, 4 * ci, 4 * co), kernel.dtype)
    for ph in range(2):
        for q in range(2):
            for u in range(kh):
                a, s = (ph + u) % 2, (ph + u) // 2
                for v in range(kw):
                    c_, t = (q + v) % 2, (q + v) // 2
                    kb = kb.at[s, t,
                               (a * 2 + c_) * ci:(a * 2 + c_ + 1) * ci,
                               (ph * 2 + q) * co:(ph * 2 + q + 1) * co,
                               ].set(kernel[u, v])
    return kb


def _block_kernel_s2(kernel: jnp.ndarray) -> jnp.ndarray:
    """Stride-2 scatter: [kh,kw,Ci,Co] -> [kh',kw',4Ci,Co] (phase 0 only)."""
    kh, kw, ci, co = kernel.shape
    kh2, kw2 = kh // 2 + 1, kw // 2 + 1
    kb = jnp.zeros((kh2, kw2, 4 * ci, co), kernel.dtype)
    for u in range(kh):
        a, s = u % 2, u // 2
        for v in range(kw):
            c_, t = v % 2, v // 2
            kb = kb.at[s, t,
                       (a * 2 + c_) * ci:(a * 2 + c_ + 1) * ci, :,
                       ].set(kernel[u, v])
    return kb


def s2d_supported(x_shape: Tuple[int, ...], kernel_shape: Tuple[int, ...],
                  stride, padding, dilation, groups: int) -> bool:
    sh, sw = _pair(stride)
    dh, dw = _pair(dilation)
    (plh, phh), (plw, phw) = padding
    kh, kw, _, _ = kernel_shape
    _, h, w, _ = x_shape
    return (groups == 1 and dh == dw == 1
            and (sh, sw) in ((1, 1), (2, 2))
            and kh % 2 == 1 and kw % 2 == 1
            and (h + plh + phh) % 2 == 0 and (w + plw + phw) % 2 == 0
            and (sh == 1 or (h + plh + phh) >= kh)
            and h >= 2 and w >= 2)


def conv2d_s2d(x: jnp.ndarray, kernel: jnp.ndarray, stride=(1, 1),
               padding=((1, 1), (1, 1)), ) -> jnp.ndarray:
    """Space-to-depth execution of an NHWC/HWIO conv (see module docstring).

    Bit-identical semantics to ``lax.conv_general_dilated`` with the same
    arguments (up to f32 summation order).
    """
    sh, sw = _pair(stride)
    xpad = jnp.pad(x, ((0, 0), padding[0], padding[1], (0, 0)))
    xb = space_to_depth(xpad, 2)
    if (sh, sw) == (1, 1):
        kb = _block_kernel_s1(kernel)
        # VALID in block space gives ceil spatial; the original output is
        # H_out = H rows -> H/2 blocks; block input has (H+pad)/2 blocks and
        # kh'=kh//2+1 taps -> out blocks = (H+pad)/2 - kh' + 1 = H/2 exactly
        # when pad = kh-1 (SAME).  For smaller pads, slice.
        yb = lax.conv_general_dilated(
            xb, kb, (1, 1), "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        y = depth_to_space(yb, 2)
        n, h, w, c = x.shape
        oh = h + sum(padding[0]) - kernel.shape[0] + 1
        ow = w + sum(padding[1]) - kernel.shape[1] + 1
        return y[:, :oh, :ow]
    kb = _block_kernel_s2(kernel)
    yb = lax.conv_general_dilated(
        xb, kb, (1, 1), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    n, h, w, c = x.shape
    oh = (h + sum(padding[0]) - kernel.shape[0]) // 2 + 1
    ow = (w + sum(padding[1]) - kernel.shape[1]) // 2 + 1
    return yb[:, :oh, :ow]


# ------------------------------------------------------------------ policy ----
# Opt-in execution policy consulted by models.layers.Conv2d at TRACE time
# (same contextvar pattern, and the same jit-staleness caveat, as
# serve/quant.py): narrow convs below the channel threshold take the
# space-to-depth lowering.  Enabled per-run via MODEL.S2D_MAX_CHANNELS
# (models/build.py) — keep 0 until chip microbenches justify a threshold.

_S2D_POLICY: contextvars.ContextVar = contextvars.ContextVar(
    "segtpu_s2d_policy", default=0)


def set_s2d_policy(max_channels: int) -> None:
    """Process-default policy (build-time); 0 disables."""
    _S2D_POLICY.set(int(max_channels))


@contextlib.contextmanager
def s2d_scope(max_channels: int):
    token = _S2D_POLICY.set(int(max_channels))
    try:
        yield
    finally:
        _S2D_POLICY.reset(token)


def s2d_applies(x_shape, kernel_shape, stride, padding, dilation,
                groups: int) -> bool:
    """Trace-time gate for Conv2d: policy threshold + structural support."""
    mc = _S2D_POLICY.get()
    if not mc:
        return False
    kh, kw, cig, co = kernel_shape
    if max(cig * groups, co) > mc or (kh == 1 and kw == 1):
        return False  # wide enough already / 1x1 gains nothing (block-diag)
    return s2d_supported(x_shape, kernel_shape, stride, padding, dilation,
                         groups)
