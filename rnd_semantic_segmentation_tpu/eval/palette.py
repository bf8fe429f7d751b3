"""Palette PNG export for predictions / pseudo-labels.

Reference: ``get_color_palette`` (utility.py:211-217) converts an HxW class-id
array to a P-mode PIL image with the render-config palette; the ASPP tester's
``save_distill`` (aspp_tester.py:33-45) writes these into
``PSEUDO_DIR/inference/<dataset>/`` to feed the self-distillation regime.
"""

from __future__ import annotations

import os
from typing import Sequence

import numpy as np
from PIL import Image


def get_color_palette(pred: np.ndarray, palette: Sequence[int]) -> Image.Image:
    label = Image.fromarray(pred.astype("uint8")).convert("P")
    label.putpalette(list(palette))
    return label


def save_pseudo_label(pred: np.ndarray, palette: Sequence[int],
                      pseudo_dir: str, dataset_name: str, image_name: str) -> str:
    """Writes the colorized argmax prediction; returns the path.

    Uses the native libpng writer (native/segdata.cpp
    segdata_save_palette_png) when available — Cityscapes-scale ``--saveres``
    exports write thousands of 2048x1024 PNGs and PIL is the bottleneck —
    with a PIL fallback producing identical P-mode files."""
    out_dir = os.path.join(pseudo_dir, "inference", dataset_name)
    os.makedirs(out_dir, exist_ok=True)
    path = os.path.join(out_dir, os.path.splitext(os.path.basename(image_name))[0] + ".png")
    from ..data.native_loader import save_palette_png
    if not save_palette_png(path, pred.astype(np.uint8), palette):
        get_color_palette(pred, palette).save(path)
    return path
