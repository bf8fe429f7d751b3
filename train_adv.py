#!/usr/bin/env python
"""Root entry point mirroring the reference CLI surface (`python train_adv.py -cfg ...`)."""
from rnd_semantic_segmentation_tpu.cli.train_adv import cli

if __name__ == "__main__":
    cli()
