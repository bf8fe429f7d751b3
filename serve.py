#!/usr/bin/env python
"""Root entry point: micro-batched HTTP inference server (TPU-native serving
extension; the reference stops at single-image inference.py)."""
from rnd_semantic_segmentation_tpu.cli.serve import cli

if __name__ == "__main__":
    cli()
