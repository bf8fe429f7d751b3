#!/usr/bin/env python
"""Root entry point mirroring the reference CLI surface (`python train_distill.py -cfg ...`)."""
from rnd_semantic_segmentation_tpu.cli.train_distill import cli

if __name__ == "__main__":
    cli()
