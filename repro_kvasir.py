#!/usr/bin/env python
"""One-command Kvasir-SEG accuracy repro kit (VERDICT r1 missing #2 / next #9).

No dataset ships in this environment, so BASELINE.md's accuracy row
("mIoU/Dice parity on Kvasir-SEG") cannot be measured yet.  The moment data
access appears, this script is the single run that produces the numbers:

    python repro_kvasir.py --data-root /path/to/datasets

trains + evals both acceptance pipelines and prints each metric next to its
paper anchor:

  * deeplabv2_r101_src_kvasir  -> mIoU   (FADA-style source-only; anchor:
    parity with the reference's own training, no published number exists)
  * pranet_src_polyp           -> mDice  (PraNet paper ~0.898 on Kvasir-SEG)

``--synthetic`` smoke-tests the full path (train -> eval -> metric extraction)
on the built-in synthetic dataset with a tiny model so the kit itself stays
verified in CI (tests/test_repro_kit.py).

Expected dataset layout under --data-root (cfg.DATASETS.DATASET_DIR,
reference datasets/build.py): kvasir/images/*.jpg + kvasir/masks/*.jpg
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.abspath(__file__))

# (name, config, train_cli, metric_key, anchor, anchor_source)
PIPELINES = [
    ("deeplabv2_r101_src_kvasir", "configs/deeplabv2_r101_src_kvasir.yaml",
     "train_src.py", "macro_miou", None,
     "no published number; reference trains this config (README run matrix)"),
    ("pranet_src_polyp", "configs/pranet_src_polyp.yaml",
     "train_src.py", "macro_mdice", 0.898,
     "PraNet paper, Kvasir-SEG mDice"),
]

SYNTHETIC_OVERRIDES = [
    "MODEL.NAME", "deeplab_resnet18", "MODEL.NUM_CLASSES", "3",
    "MODEL.WEIGHTS", "", "MODEL.DTYPE", "float32",
    "DATASETS.SOURCE_TRAIN", "synthetic_train", "DATASETS.TEST", "synthetic_val",
    "INPUT.SOURCE_INPUT_SIZE_TRAIN", "[64,64]", "INPUT.INPUT_SIZE_TEST", "[64,64]",
    "AUG.NAME", "none", "AUG.COLLATE", "default",
    "SOLVER.EPOCHS", "1", "SOLVER.BATCH_SIZE", "4", "TEST.BATCH_SIZE", "2",
    "SOLVER.CHECKPOINT_PERIOD", "1",
]


def run(cmd, env):
    print("+", " ".join(cmd), flush=True)
    r = subprocess.run(cmd, cwd=REPO, env=env)
    if r.returncode != 0:
        raise SystemExit(f"command failed ({r.returncode}): {' '.join(cmd)}")


def summary_metrics(out_dir: str, family: str) -> dict:
    """Extract macro mIoU/mDice from the tester's confusion-matrix dump."""
    import numpy as np
    cm_path = os.path.join(out_dir, f"{family}_confusion_matrix.json")
    cmt = np.asarray(json.load(open(cm_path))["cmt"], np.float64)
    tp = np.diag(cmt)
    fp = cmt.sum(0) - tp
    fn = cmt.sum(1) - tp
    iou = tp / np.maximum(tp + fp + fn, 1)
    dice = 2 * tp / np.maximum(2 * tp + fp + fn, 1)
    return {"macro_miou": float(iou.mean()), "macro_mdice": float(dice.mean())}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--data-root", default="datasets",
                    help="directory containing kvasir/ (reference layout)")
    ap.add_argument("--out", default="runs/kvasir_repro")
    ap.add_argument("--synthetic", action="store_true",
                    help="smoke the kit on the synthetic dataset (no data needed)")
    ap.add_argument("--epochs", type=int, default=0,
                    help="override SOLVER.EPOCHS (0 = config value)")
    args = ap.parse_args()

    env = dict(os.environ)
    results = {}
    for name, config, train_cli, metric_key, anchor, src in PIPELINES:
        out_dir = os.path.join(args.out, name)
        overrides = ["OUTPUT_DIR", out_dir,
                     "DATASETS.DATASET_DIR", args.data_root]
        if args.epochs:
            overrides += ["SOLVER.EPOCHS", str(args.epochs)]
        if args.synthetic:
            overrides += SYNTHETIC_OVERRIDES
            metric_key = "macro_miou"

        run([sys.executable, train_cli, "-cfg", config] + overrides, env)
        run([sys.executable, "test.py", "-cfg", config, "-c",
             "renders/kvasir.json"] + overrides + ["resume", "latest"], env)

        family = "deeplab" if args.synthetic or "deeplab" in name else \
                 ("pranet" if "pranet" in name else "deeplab")
        m = summary_metrics(out_dir, family)
        results[name] = {**m, "anchor": anchor, "anchor_source": src,
                         "metric": metric_key, "value": m[metric_key]}
        line = {"pipeline": name, metric_key: round(m[metric_key], 4),
                "anchor": anchor}
        print(json.dumps(line), flush=True)
        if args.synthetic:
            break  # one pipeline exercises the whole kit

    with open(os.path.join(args.out, "repro_summary.json"), "w") as fh:
        json.dump(results, fh, indent=2)
    print(f"summary written to {args.out}/repro_summary.json")


if __name__ == "__main__":
    main()
