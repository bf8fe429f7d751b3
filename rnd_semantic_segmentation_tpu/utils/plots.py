"""Plotting/visual helpers (utility.py:251-262, 336-384, 449-497)."""

from __future__ import annotations

import os
from typing import Dict, Optional, Sequence

import numpy as np


def threshold_mask(x: np.ndarray, threshold: float = 128) -> np.ndarray:
    """Threshold transform (utility.py Threshold:251-262)."""
    return (np.asarray(x) >= threshold).astype(np.int32)


def preds2ignorepreds(id_to_trainid: Dict, gt: np.ndarray, pd: np.ndarray,
                      ignore_label: int = 255):
    """Remap gt ids to train ids and propagate ignore into predictions
    (utility.py:336-345)."""
    gt = np.asarray(gt)
    label_copy = np.full(gt.shape, ignore_label, np.float32)
    for k, v in id_to_trainid.items():
        label_copy[gt == int(k)] = v
    pd = np.asarray(pd).copy()
    pd[label_copy == ignore_label] = ignore_label
    return label_copy, pd


def plot_confusion_matrix(cm: np.ndarray, classes: Sequence[str],
                          normalize: bool = True,
                          title: str = "Confusion matrix",
                          out_path: str = "confusion_matrix.png") -> str:
    """Matplotlib heatmap dump (utility.py:361-384)."""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    cm = np.asarray(cm, np.float64)
    if normalize:
        cm = cm / np.maximum(cm.sum(axis=1, keepdims=True), 1e-10)
    fig, ax = plt.subplots(figsize=(max(6, len(classes) * 0.5),) * 2)
    im = ax.imshow(cm, interpolation="nearest", cmap="Reds")
    ax.set_title(title)
    fig.colorbar(im)
    ticks = np.arange(len(classes))
    ax.set_xticks(ticks)
    ax.set_xticklabels(classes, rotation=90, fontsize=7)
    ax.set_yticks(ticks)
    ax.set_yticklabels(classes, fontsize=7)
    ax.set_ylabel("True label")
    ax.set_xlabel("Predicted label")
    fig.tight_layout()
    parent = os.path.dirname(out_path)
    if parent:
        os.makedirs(parent, exist_ok=True)
    fig.savefig(out_path, dpi=100)
    plt.close(fig)
    return out_path


class LineChartPlotter:
    """Loss/LR curve plotting (utility.py:449-468)."""

    def __init__(self, title: str, xlabel: str, ylabel: str, filepath: str):
        self.title = title
        self.xlabel = xlabel
        self.ylabel = ylabel
        self.filepath = filepath
        self.charts = []

    def add_chart(self, chart: Dict):
        self.charts.append(chart)

    def display(self):
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        fig, ax = plt.subplots()
        ax.set_title(self.title)
        ax.set_xlabel(self.xlabel)
        ax.set_ylabel(self.ylabel)
        for chart in self.charts:
            ax.plot(chart["x"], chart["y"], label=chart["label"], linewidth=0.5)
        ax.legend()
        fig.savefig(self.filepath, dpi=100)
        plt.close(fig)
