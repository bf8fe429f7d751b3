"""On-device evaluation metrics.

Replaces the reference's metric kernels with XLA-friendly histogram math:
  * intersection_and_union — histogram-based I/U/target/output areas with
    ignore-label masking (/root/reference/core/utils/utility.py:133-161),
    computed with one-hot matmuls (no host sync, no torch.histc round trip).
  * confusion_matrix — replaces the O(pixels) Python loop at utility.py:347-359
    with a single bincount on K*true+pred.
  * AverageMeter — macro & micro mIoU/F1 accumulation semantics
    (utility.py:24-72): macro averages per-image IoU/F1; micro accumulates
    global I/U sums.

Under data-parallel eval the per-batch vectors can be ``jax.lax.psum``-reduced
over the mesh before the host update (SURVEY §5: eval metric reduction).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

Array = jnp.ndarray


def intersection_and_union(output: Array, target: Array, num_classes: int,
                           ignore_index: int = 255) -> Tuple[Array, Array, Array, Array]:
    """areas (intersection, union, target, output), each [num_classes] f32.

    output/target: integer class maps of identical shape (any rank).
    Pixels whose target == ignore_index are excluded from all areas
    (utility.py:148-152 masks output to ignore there as well).
    """
    output = output.reshape(-1)
    target = target.reshape(-1)
    valid = target != ignore_index
    onehot_out = (jax.nn.one_hot(output, num_classes, dtype=jnp.float32)
                  * valid[:, None])
    onehot_tgt = (jax.nn.one_hot(target, num_classes, dtype=jnp.float32)
                  * valid[:, None])
    area_out = jnp.sum(onehot_out, axis=0)
    area_tgt = jnp.sum(onehot_tgt, axis=0)
    area_inter = jnp.sum(onehot_out * onehot_tgt, axis=0)
    area_union = area_out + area_tgt - area_inter
    return area_inter, area_union, area_tgt, area_out


def confusion_matrix(pred: Array, target: Array, num_classes: int,
                     ignore_index: int = 255) -> Array:
    """[C,C] int32 confusion matrix (rows = true, cols = predicted)."""
    pred = pred.reshape(-1)
    target = target.reshape(-1)
    valid = target != ignore_index
    idx = jnp.where(valid, target * num_classes + pred, num_classes * num_classes)
    counts = jnp.bincount(idx, length=num_classes * num_classes + 1)
    return counts[:-1].reshape(num_classes, num_classes).astype(jnp.int32)


class AverageMeter:
    """Macro+micro IoU/F1 accumulator (host-side, numpy)."""

    def __init__(self, num_classes: int):
        self.num_classes = num_classes
        self.reset()

    def reset(self):
        z = np.zeros(self.num_classes, np.float64)
        self.intersection_sum = z.copy()
        self.union_sum = z.copy()
        self.target_sum = z.copy()
        self.res_sum = z.copy()
        self.iou_sum = z.copy()
        self.f1_sum = z.copy()
        self.count = 0

    def update(self, intersection, union, target, res):
        intersection = np.asarray(intersection, np.float64)
        union = np.asarray(union, np.float64)
        target = np.asarray(target, np.float64)
        res = np.asarray(res, np.float64)
        iou = intersection / (union + 1e-10)
        f1 = 2 * intersection / (target + res + 1e-10)
        self.intersection_sum += intersection
        self.union_sum += union
        self.target_sum += target
        self.res_sum += res
        self.iou_sum += iou
        self.f1_sum += f1
        self.count += 1

    @property
    def macro_iou(self):
        return self.iou_sum / max(self.count, 1)

    @property
    def macro_f1(self):
        return self.f1_sum / max(self.count, 1)

    @property
    def micro_iou(self):
        return self.intersection_sum / (self.union_sum + 1e-10)

    @property
    def micro_f1(self):
        return 2 * self.intersection_sum / (self.target_sum + self.res_sum + 1e-10)

    @property
    def micro_precision(self):
        # TP / (TP + FP)  (attn/wrapper.py metric spec, wrapper.py:96-180)
        return self.intersection_sum / (self.res_sum + 1e-10)

    @property
    def micro_recall(self):
        # TP / (TP + FN)
        return self.intersection_sum / (self.target_sum + 1e-10)

    def summary(self, logger=None):
        lines = [
            "Macro metric, val result: mIoU/mF1 {:.4f}/{:.4f}.".format(
                float(np.mean(self.macro_iou)), float(np.mean(self.macro_f1))),
            "Micro metric, val result: mIoU/mF1 {:.4f}/{:.4f}.".format(
                float(np.mean(self.micro_iou)), float(np.mean(self.micro_f1))),
        ]
        for i in range(self.num_classes):
            lines.append("Macro metric, class {} iou/f1 score: {:.4f}/{:.4f}.".format(
                i, self.macro_iou[i], self.macro_f1[i]))
            lines.append("Micro metric, class {} iou/f1 score: {:.4f}/{:.4f}.".format(
                i, self.micro_iou[i], self.micro_f1[i]))
        if logger is not None:
            for l in lines:
                logger.info(l)
        return {
            "macro_miou": float(np.mean(self.macro_iou)),
            "macro_mf1": float(np.mean(self.macro_f1)),
            "micro_miou": float(np.mean(self.micro_iou)),
            "micro_mf1": float(np.mean(self.micro_f1)),
            "micro_precision": float(np.mean(self.micro_precision)),
            "micro_recall": float(np.mean(self.micro_recall)),
            "per_class_macro_iou": self.macro_iou.tolist(),
            "per_class_macro_f1": self.macro_f1.tolist(),
        }
