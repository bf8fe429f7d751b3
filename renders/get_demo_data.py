#!/usr/bin/env python
"""Sample N image/label path pairs from a Cityscapes split into
demo_image.txt / demo_groundtruth.txt (reference renders/get_demo_data.py)."""

import argparse
import os
import random
from glob import glob


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--data-root", required=True, help="cityscapes root")
    parser.add_argument("--mode", default="val")
    parser.add_argument("-n", "--num", type=int, default=8)
    parser.add_argument("--out-dir", default="renders")
    parser.add_argument("--seed", type=int, default=0)
    args = parser.parse_args()

    images = []
    for d in sorted(glob(os.path.join(args.data_root, f"leftImg8bit/{args.mode}") + "/*/")):
        images += sorted(glob(d + "/*.png"))
    random.Random(args.seed).shuffle(images)
    images = images[: args.num]
    gts = [os.path.join(args.data_root, "gtFine", args.mode,
                        os.path.basename(os.path.dirname(p)),
                        os.path.basename(p).split("_leftImg8bit")[0] + "_gtFine_labelIds.png")
           for p in images]

    os.makedirs(args.out_dir, exist_ok=True)
    with open(os.path.join(args.out_dir, "demo_image.txt"), "w") as fh:
        fh.write("\n".join(images) + "\n")
    with open(os.path.join(args.out_dir, "demo_groundtruth.txt"), "w") as fh:
        fh.write("\n".join(gts) + "\n")
    print(f"wrote {len(images)} samples to {args.out_dir}")


if __name__ == "__main__":
    main()
