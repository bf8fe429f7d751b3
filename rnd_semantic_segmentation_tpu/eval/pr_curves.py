"""Per-class precision-recall curves (demo.py:80-88 dump_pr_curve).

The reference streams pixel probabilities into TensorBoard's add_pr_curve;
this environment may lack tensorboard, so curves are computed directly
(threshold sweep) and exported to JSON and/or matplotlib, with a TensorBoard
writer used opportunistically when available.
"""

from __future__ import annotations

import os
from typing import Dict, Optional, Sequence

import numpy as np


def pr_curve(predictions: np.ndarray, labels: np.ndarray,
             num_thresholds: int = 127) -> Dict[str, list]:
    """predictions: [N] probabilities; labels: [N] {0,1}.

    Returns thresholds/precision/recall arrays (TensorBoard's convention:
    thresholds evenly spaced in [0, 1])."""
    thresholds = np.linspace(0.0, 1.0, num_thresholds)
    labels = labels.astype(bool)
    pos = labels.sum()
    precision, recall = [], []
    order = np.argsort(-predictions)
    sorted_labels = labels[order]
    sorted_preds = predictions[order]
    tp_cum = np.cumsum(sorted_labels)
    for t in thresholds:
        k = np.searchsorted(-sorted_preds, -t, side="right")
        tp = tp_cum[k - 1] if k > 0 else 0
        precision.append(float(tp / max(k, 1)))
        recall.append(float(tp / max(pos, 1)))
    return {"thresholds": thresholds.tolist(),
            "precision": precision, "recall": recall}


def dump_pr_curves(pred: np.ndarray, label: np.ndarray,
                   id2name: Dict, out_dir: str,
                   writer=None, plot: bool = True) -> Dict[str, Dict]:
    """pred: [N, C] per-class probabilities; label: [N] class ids."""
    os.makedirs(out_dir, exist_ok=True)
    curves = {}
    for cls in range(pred.shape[1]):
        name = id2name.get(str(cls), id2name.get(cls, str(cls)))
        binary = (label == cls).astype(np.int32)
        if writer is not None:  # TensorBoard path (demo.py:87-88)
            writer.add_pr_curve(name, binary, pred[:, cls], cls)
        curves[name] = pr_curve(pred[:, cls], binary)

    import json
    with open(os.path.join(out_dir, "pr_curves.json"), "w") as fh:
        json.dump(curves, fh)

    if plot:
        try:
            import matplotlib
            matplotlib.use("Agg")
            import matplotlib.pyplot as plt

            fig, ax = plt.subplots(figsize=(6, 5))
            for name, c in curves.items():
                ax.plot(c["recall"], c["precision"], label=name, linewidth=1)
            ax.set_xlabel("recall")
            ax.set_ylabel("precision")
            ax.legend(fontsize=7)
            fig.tight_layout()
            fig.savefig(os.path.join(out_dir, "pr_curves.png"), dpi=100)
            plt.close(fig)
        except Exception:
            pass
    return curves
