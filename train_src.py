#!/usr/bin/env python
"""Root entry point mirroring the reference CLI surface (`python train_src.py -cfg ...`)."""
from rnd_semantic_segmentation_tpu.cli.train_src import cli

if __name__ == "__main__":
    cli()
