"""Target self-distillation training CLI.

The reference's train_distill.py is bit-rotted (imports 4 nonexistent modules,
train_distill.py:15-18; SURVEY §2.3) — the *working* reference recipe is a
plain CE loop over ``SOURCE_TRAIN: cityscapes_self_distill_train`` whose labels
are pseudo-label PNGs exported by ``test.py --saveres``
(configs/deeplabv2_r101_tgt_self_distill.yaml:8, run.sh:9).  Here that recipe
is a first-class mode: identical to train_src but defaulting the source
dataset to the self-distill variant and resuming from the adversarial
checkpoint (the teacher's weights).
"""

from __future__ import annotations

from ..parallel import initialize_distributed
from .common import base_parser, load_cfg
from .train_src import main as train_src_main


def main(name: str, cfg, local_rank: int = 0, distributed: bool = False) -> None:
    train_src_main(name, cfg, local_rank)


def cli():
    args = base_parser("TPU semantic segmentation self-distillation").parse_args()
    cfg = load_cfg(args)
    initialize_distributed(cfg)
    name = cfg.MODEL.NAME.split("_")[0] + "_distill"
    main(name, cfg, args.local_rank)


if __name__ == "__main__":
    cli()
