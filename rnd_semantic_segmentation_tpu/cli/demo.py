"""Multi-image multi-checkpoint comparison grids (reference demo.py).

Renders rows of [input | ground truth | prediction-per-checkpoint] into a
matplotlib grid; sample lists and palettes come from the render JSON
(demo.py:223-330).  TensorBoard export is optional and degrades to PNG-only
when tensorboard isn't importable.
"""

from __future__ import annotations

import argparse
import os

import numpy as np
from PIL import Image

from ..eval.palette import get_color_palette
from ..eval.pr_curves import dump_pr_curves
from ..utils import load_json, load_text, setup_logger
from .common import load_cfg
from .inference import build_predictor


def cli():
    parser = argparse.ArgumentParser(description="TPU segmentation demo grids")
    parser.add_argument("-cfg", "--config-file", default="", metavar="FILE", type=str)
    parser.add_argument("-c", "--config_path", default="renders/cityscapes.json")
    parser.add_argument("-o", "--output", default="demo_grid.png")
    parser.add_argument("-n", "--num-samples", type=int, default=4)
    parser.add_argument("opts", default=None, nargs=argparse.REMAINDER)
    args = parser.parse_args()
    cfg = load_cfg(args)
    render = load_json(args.config_path)
    logger = setup_logger("demo", cfg.OUTPUT_DIR, 0)

    image_list = render.get("demo_image_path")
    gt_list = render.get("demo_groundtruth_path")
    images = load_text(image_list)[: args.num_samples] if image_list else []
    gts = load_text(gt_list)[: args.num_samples] if gt_list else []
    if not images:
        raise SystemExit("render config has no demo_image_path list")

    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    # multi-checkpoint comparison: render config "weights" maps column name ->
    # checkpoint path (reference demo.py config["weights"], :223-330); falls
    # back to the single cfg.resume checkpoint
    weights = render.get("weights") or {"prediction": cfg.resume}
    cols = (2 if gts else 1) + len(weights)
    fig, axes = plt.subplots(len(images), cols, figsize=(4 * cols, 3 * len(images)))
    axes = np.atleast_2d(axes)
    palette = render.get("palette", [0, 0, 0, 255, 255, 255])

    # ONE model build + checkpoint load per column (not per image per column)
    predictors = {}
    for key, ckpt in weights.items():
        cfg_k = cfg.clone()
        cfg_k.defrost()
        cfg_k.resume = ckpt
        cfg_k.freeze()
        predictors[key] = build_predictor(cfg_k, logger)

    # per-checkpoint accumulated pixel probabilities + labels for the PR
    # curves (reference demo.py:80-88,320-325 big_pred/big_label)
    big_preds = {key: [] for key in weights}
    big_labels = []
    preds_cache = {}
    for r, img_path in enumerate(images):
        axes[r, 0].imshow(Image.open(img_path))
        axes[r, 0].set_title(os.path.basename(img_path))
        c = 1
        if gts:
            gt_img = Image.open(gts[r])
            axes[r, c].imshow(gt_img)
            axes[r, c].set_title("ground truth")
            c += 1
        for key in weights:
            pred, probs = predictors[key](img_path, return_probs=True)
            preds_cache[(key, r)] = pred
            axes[r, c].imshow(get_color_palette(pred, palette).convert("RGB"))
            axes[r, c].set_title(key)
            c += 1
            if gts:
                big_preds[key].append(probs.reshape(-1, probs.shape[-1]))
        if gts:
            gt = np.asarray(gt_img.resize(pred.shape[::-1], Image.NEAREST))
            big_labels.append(gt.reshape(-1))
    for ax in axes.ravel():
        ax.axis("off")
    fig.tight_layout()
    fig.savefig(args.output, dpi=100)
    logger.info(f"saved {args.output}")

    if gts:
        # per-class PR curves per checkpoint (reference dump_pr_curve)
        label = np.concatenate(big_labels)
        id2name = render.get("trainid2name", {})
        for key in weights:
            out_dir = os.path.join(cfg.OUTPUT_DIR, "pr_curves", key)
            dump_pr_curves(np.concatenate(big_preds[key]), label,
                           id2name, out_dir)
            logger.info(f"PR curves for '{key}' in {out_dir}")

    if render.get("tensorboard"):
        # dependency-free event writer (utils/tb_writer.py) replaces
        # torch.utils.tensorboard (demo.py:301-311)
        from ..utils.tb_writer import SummaryWriter
        writer = SummaryWriter(os.path.join(cfg.OUTPUT_DIR, "tb_demo"))
        first_key = next(iter(weights))
        for r, img_path in enumerate(images):
            colored = np.asarray(
                get_color_palette(preds_cache[(first_key, r)],
                                  palette).convert("RGB"))
            writer.add_image(os.path.basename(img_path), colored, step=r)
        writer.close()
        logger.info(f"tensorboard events in {cfg.OUTPUT_DIR}/tb_demo")


if __name__ == "__main__":
    cli()
