"""Loss zoo (all 8 loss families the reference uses; NHWC, label-last).

Semantics from:
  * CE ignore_index=255 — torch ``nn.CrossEntropyLoss(ignore_index=255)``
    (aspp_trainer.py:61, gald_trainer.py:106): mean over non-ignored pixels.
  * soft_label_cross_entropy — /root/reference/core/utils/utility.py:172-177.
  * TverskyLoss(alpha=0.7, eps=1) — classifiers/attn/loss.py:7-27.
  * BinaryCrossEntropyLoss — attn/loss.py:66-74.
  * MultiscaleLoss / CompoundLoss — attn/loss.py:29-64.
  * GeneralizedDiceLoss — utility.py:399-447 (softmax over C, class weights
    1/sum^2, ignore-label masking).
  * PraNet structure_loss — pranet_trainer.py:22-31 (border-weighted BCE +
    weighted IoU with a 31x31 average-pool weight map).

All reductions are float32 regardless of compute dtype.
"""

from __future__ import annotations

from typing import Callable, Optional, Sequence

import jax
import jax.numpy as jnp

from ..ops import avg_pool

Array = jnp.ndarray


def cross_entropy(logits: Array, labels: Array, ignore_index: int = 255) -> Array:
    """Softmax CE, mean over pixels whose label != ignore_index.

    logits: [B,H,W,C] (any dtype; promoted to f32), labels: [B,H,W] int.
    """
    logits = logits.astype(jnp.float32)
    valid = labels != ignore_index
    safe_labels = jnp.where(valid, labels, 0)
    logp = jax.nn.log_softmax(logits, axis=-1)
    # one-hot multiply-reduce instead of take_along_axis: the per-pixel class
    # gather lowers to a ~serial TPU fusion (measured 65 ms/step at 512^2x19),
    # while compare+select+reduce vectorizes on the VPU.
    onehot = jax.nn.one_hot(safe_labels, logits.shape[-1], dtype=logp.dtype)
    nll = -jnp.sum(logp * onehot, axis=-1)
    nll = jnp.where(valid, nll, 0.0)
    denom = jnp.maximum(jnp.sum(valid), 1)
    return jnp.sum(nll) / denom


def soft_label_cross_entropy(pred: Array, soft_label: Array,
                             pixel_weights: Optional[Array] = None) -> Array:
    """-mean( [pixel_weights *] sum_c soft_label_c * log_softmax(pred)_c )."""
    pred = pred.astype(jnp.float32)
    loss = -soft_label.astype(jnp.float32) * jax.nn.log_softmax(pred, axis=-1)
    per_pixel = jnp.sum(loss, axis=-1)
    if pixel_weights is not None:
        per_pixel = pixel_weights * per_pixel
    return jnp.mean(per_pixel)


def bce_with_logits(pred: Array, label: Array) -> Array:
    """Mean sigmoid BCE (attn/loss.py:66-74)."""
    pred = pred.astype(jnp.float32)
    label = label.astype(jnp.float32)
    return jnp.mean(_bce_elementwise(pred, label))


def _bce_elementwise(pred: Array, label: Array) -> Array:
    # numerically-stable binary_cross_entropy_with_logits
    return jnp.maximum(pred, 0) - pred * label + jnp.log1p(jnp.exp(-jnp.abs(pred)))


def tversky_loss(pred: Array, label: Array, alpha: float = 0.7,
                 eps: float = 1.0) -> Array:
    """Per-class Tversky over (B,H,W), meaned over classes (attn/loss.py:7-27).

    pred: [B,H,W,C] logits; label: [B,H,W,C] one-hot.
    """
    probs = jax.nn.sigmoid(pred.astype(jnp.float32))
    label = label.astype(jnp.float32)
    tp = jnp.sum(probs * label, axis=(0, 1, 2))
    fn = jnp.sum(label * (1 - probs), axis=(0, 1, 2))
    fp = jnp.sum(probs * (1 - label), axis=(0, 1, 2))
    return 1.0 - jnp.mean((tp + eps) / (tp + alpha * fn + (1 - alpha) * fp + eps))


def multiscale_loss(loss_fn: Callable[[Array, Array], Array],
                    preds: Sequence[Array], labels: Sequence[Array]) -> Array:
    """Sum of loss_fn over (pred, label) scale pairs (attn/loss.py:29-40)."""
    total = jnp.float32(0)
    for p, l in zip(preds, labels):
        total = total + loss_fn(p, l)
    return total


def compound_loss(losses: Sequence[Callable[..., Array]],
                  weights: Optional[Sequence[float]] = None) -> Callable[..., Array]:
    """Weighted sum of losses; default uniform 1/N (attn/loss.py:42-64)."""
    if weights is None:
        weights = [1.0 / len(losses)] * len(losses)

    def fn(*inputs) -> Array:
        total = jnp.float32(0)
        for loss_fn, w in zip(losses, weights):
            total = total + w * loss_fn(*inputs)
        return total

    return fn


def generalized_dice_loss(output: Array, target: Array, eps: float = 1e-5,
                          weight_type: str = "square",
                          ignore_label: int = 255) -> Array:
    """GDL with softmax over classes and ignore-label masking (utility.py:399-447).

    output: [B,H,W,C] logits; target: [B,H,W] labels or [B,H,W,C] one-hot.
    """
    c = output.shape[-1]
    out = output.astype(jnp.float32).reshape(-1, c)        # [BHW, C]
    out = jax.nn.softmax(out, axis=-1)
    if target.ndim == 3:
        t = target.reshape(-1)
        valid = (t != ignore_label)
        out = out * valid[:, None]
        onehot = jax.nn.one_hot(jnp.where(valid, t, 0), c) * valid[:, None]
    else:
        onehot = target.astype(jnp.float32).reshape(-1, c)
    target_sum = jnp.sum(onehot, axis=0)                   # [C]
    if weight_type == "square":
        class_weights = 1.0 / (target_sum * target_sum + eps)
    elif weight_type == "identity":
        class_weights = 1.0 / (target_sum + eps)
    elif weight_type == "sqrt":
        class_weights = 1.0 / (jnp.sqrt(target_sum) + eps)
    else:
        raise ValueError(f"bad weight_type {weight_type!r}")
    intersect = jnp.sum(out * onehot, axis=0)
    intersect_sum = jnp.sum(intersect * class_weights)
    denom = jnp.sum(out * out + onehot * onehot, axis=0)
    denom_sum = jnp.sum(denom * class_weights) + eps
    return 1.0 - 2.0 * intersect_sum / denom_sum


def structure_loss(pred: Array, mask: Array,
                   paper_weighted_bce: bool = False) -> Array:
    """PraNet structure loss (pranet_trainer.py:22-31).

    pred, mask: [B,H,W,1].  The 31x31 stride-1 avg-pool weight map highlights
    boundary pixels; implemented with an XLA reduce_window (fused on TPU).

    Fidelity note: the reference calls
    ``F.binary_cross_entropy_with_logits(pred, mask, reduce='none')`` — the
    deprecated ``reduce`` arg with a truthy string resolves to **'mean'**
    reduction in torch, so the subsequent ``(weit*wbce).sum/weit.sum`` is a
    no-op and the BCE term is a plain global mean.  Default matches that
    observable behavior; ``paper_weighted_bce=True`` gives the PraNet paper's
    intended border-weighted BCE.
    """
    pred = pred.astype(jnp.float32)
    mask = mask.astype(jnp.float32)
    weit = 1.0 + 5.0 * jnp.abs(avg_pool(mask, 31, 1, padding=15) - mask)
    bce_map = _bce_elementwise(pred, mask)
    if paper_weighted_bce:
        wbce = jnp.sum(weit * bce_map, axis=(1, 2, 3)) / jnp.sum(weit, axis=(1, 2, 3))
    else:
        wbce = jnp.mean(bce_map)

    p = jax.nn.sigmoid(pred)
    inter = jnp.sum(p * mask * weit, axis=(1, 2, 3))
    union = jnp.sum((p + mask) * weit, axis=(1, 2, 3))
    wiou = 1.0 - (inter + 1.0) / (union - inter + 1.0)
    return jnp.mean(wbce + wiou)


__all__ = [
    "bce_with_logits",
    "compound_loss",
    "cross_entropy",
    "generalized_dice_loss",
    "multiscale_loss",
    "soft_label_cross_entropy",
    "structure_loss",
    "tversky_loss",
]
