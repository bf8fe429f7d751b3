#!/usr/bin/env python
"""Root entry point: checkpoint -> self-contained StableHLO deployment
artifact (TPU-native analog of torchscript/ONNX export; no reference
counterpart)."""
from rnd_semantic_segmentation_tpu.cli.export_model import cli

if __name__ == "__main__":
    cli()
