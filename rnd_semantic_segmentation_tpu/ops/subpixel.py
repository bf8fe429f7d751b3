"""Sub-pixel (phase-decomposed) transposed convolution.

The conv inventory (ROUND4.md) showed the attn decoder's five
ConvTranspose2d(4,2,1) upsamplers are 49% of the family's forward FLOPs as
counted by the input-dilated lowering — the biggest single op is
mid_upsampler [4,4,1408,120] @16²→32² at 88.6 GFLOP, of which only 1/4 is
useful work (the other 3/4 multiplies the dilation zeros).  Reference
counterpart: torch's cuDNN picks a transposed-conv algorithm that skips the
zeros (/root/reference/core/models/classifiers/attn/eff.py:24-33 upsamplers);
on TPU, XLA's lhs_dilation lowering may not.

This module computes EXACTLY the same output by phase decomposition: for
stride s, each of the s×s output phases is an ordinary small correlation of
the *undilated* input with an s-strided slice of the kernel, all phases
evaluated in ONE dense conv ([K'h,K'w,Ci,s·s·Co], K' = the per-phase tap
count) over a padded input, then interleaved (pixel shuffle) — zero wasted
MACs, and a dense MXU-shaped contraction instead of a dilated one.

Semantics: torch ``nn.ConvTranspose2d(k, s, p, output_padding=op)`` with the
kernel in the repo's HWIO *correlation* orientation (models/layers.py
ConvTranspose2d): out[o] = Σ_u K[u] · X[(o + u - (k-1-p)) / s].
"""

from __future__ import annotations

import contextlib
import contextvars
from typing import Tuple

import jax.numpy as jnp
from jax import lax

# Trace-time policy consulted by models.layers.ConvTranspose2d (same pattern
# and jit-staleness caveat as the quant/s2d scopes).  Set per-run via
# MODEL.SUBPIXEL_DECONV (models/build.py); default off until chip-measured.
_SUBPIXEL: contextvars.ContextVar = contextvars.ContextVar(
    "segtpu_subpixel_deconv", default=False)


def set_subpixel_policy(enabled: bool) -> None:
    _SUBPIXEL.set(bool(enabled))


def subpixel_enabled() -> bool:
    return bool(_SUBPIXEL.get())


@contextlib.contextmanager
def subpixel_scope(enabled: bool):
    token = _SUBPIXEL.set(bool(enabled))
    try:
        yield
    finally:
        _SUBPIXEL.reset(token)


def _pair(v):
    return (v, v) if isinstance(v, int) else tuple(v)


def _axis_plan(h: int, k: int, s: int, p: int, op: int):
    """Static per-axis plan: for each phase r, the (t -> u) tap map, plus
    the common conv-window geometry.

    out[o] with o = s*m + r:  out = Σ_t K[u(r,t)] · X[m + t],
    where u(r,t) = (k-1-p) - r + s*t  when 0 <= u < k.
    """
    out_len = (h - 1) * s - 2 * p + k + op
    base = k - 1 - p
    taps = {}  # r -> list of (t, u)
    ts = []
    for r in range(s):
        lst = []
        for u in range(k):
            num = r + u - base
            if num % s == 0:
                t = num // s
                lst.append((t, u))
                ts.append(t)
        taps[r] = lst
    t0, t1 = min(ts), max(ts)
    kp = t1 - t0 + 1                      # per-phase tap count (common window)
    n_phase = -(-out_len // s)            # ceil: rows per phase (max)
    pad_lo = max(0, -t0)
    j0 = t0 + pad_lo                      # conv position offset for m=0
    # highest conv position read: j0 + (n_phase-1) + kp - 1 must be < padded-1
    pad_hi = max(0, (j0 + n_phase - 1 + kp - 1) - (h + pad_lo - 1))
    return out_len, taps, t0, kp, n_phase, pad_lo, pad_hi, j0


def conv_transpose_subpixel(x: jnp.ndarray, kernel: jnp.ndarray,
                            stride, padding, output_padding: int = 0
                            ) -> jnp.ndarray:
    """Exact torch-semantics transposed conv via phase decomposition.

    ``kernel``: [kh, kw, Ci, Co] in correlation orientation (as stored by
    models/layers.py ConvTranspose2d).  Returns [B, Ho, Wo, Co].
    """
    kh, kw = kernel.shape[0], kernel.shape[1]
    sh, sw = _pair(stride)
    ph, pw = _pair(padding)
    b, h, w, ci = x.shape
    co = kernel.shape[3]
    oh, tap_h, t0h, kph, nmh, lo_h, hi_h, j0h = _axis_plan(
        h, kh, sh, ph, output_padding)
    ow, tap_w, t0w, kpw, nmw, lo_w, hi_w, j0w = _axis_plan(
        w, kw, sw, pw, output_padding)

    # scatter the kernel into [kph, kpw, Ci, (rh*sw+rw)*Co] phase blocks
    kb = jnp.zeros((kph, kpw, ci, sh * sw * co), kernel.dtype)
    for rh in range(sh):
        for (th, uh) in tap_h[rh]:
            for rw in range(sw):
                for (tw, uw) in tap_w[rw]:
                    blk = rh * sw + rw
                    kb = kb.at[th - t0h, tw - t0w, :,
                               blk * co:(blk + 1) * co].set(kernel[uh, uw])

    xp = jnp.pad(x, ((0, 0), (lo_h, hi_h), (lo_w, hi_w), (0, 0)))
    yp = lax.conv_general_dilated(
        xp, kb, (1, 1), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    # phase maps share the window offset: phase (rh, rw) rows m live at conv
    # positions j0 + m
    yph = lax.slice(yp, (0, j0h, j0w, 0),
                    (b, j0h + nmh, j0w + nmw, sh * sw * co))
    # interleave: [B, nmh, nmw, sh, sw, Co] -> [B, nmh*sh, nmw*sw, Co]
    yph = yph.reshape(b, nmh, nmw, sh, sw, co)
    yph = yph.transpose(0, 1, 3, 2, 4, 5).reshape(
        b, nmh * sh, nmw * sw, co)
    return yph[:, :oh, :ow]
