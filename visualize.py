#!/usr/bin/env python
"""Root entry point mirroring the reference CLI surface (`python visualize.py -cfg ...`)."""
from rnd_semantic_segmentation_tpu.cli.visualize import cli

if __name__ == "__main__":
    cli()
