"""StableHLO deployment export: serialize the eval head to a self-contained
artifact (`jax.export`).

The exported module bakes the checkpoint's parameters in as constants, so a
deployment target needs NO Python model code, NO checkpoint files and NO
framework import — just `load_exported(path)` (or any StableHLO runtime) and
an image batch.  This is the TPU-native analog of torchscript/ONNX export,
which the reference does not have.

The exported function is the same jitted ``Tester`` probability head the
offline eval and the serving daemon use (per-family softmax/sigmoid
semantics, eval/tester.py:129), followed by argmax — quantization
(``TEST.QUANT``) composes: the quant context is entered at trace time, so an
int8-calibrated export carries the int8 graph.

Artifact layout: ``<out>.stablehlo`` (serialized module) + ``<out>.json``
(shape/dtype/class metadata for the consumer).
"""

from __future__ import annotations

import json
import os
from typing import Optional, Sequence, Tuple

import numpy as np

__all__ = ["export_eval", "load_exported"]


def export_eval(tester, batch_size: int, out_path: str,
                quant_ctx=None, platforms: Optional[Sequence[str]] = None,
                logger=None) -> dict:
    """Export ``tester``'s eval head at a fixed batch/input geometry.

    tester: a Tester with ``_load_checkpoint()`` already called.
    Returns the metadata dict (also written to ``<out>.json``).
    """
    import jax
    import jax.numpy as jnp
    from jax import export as jexport

    from . import quant_scope

    cfg = tester.cfg
    w, h = cfg.INPUT.INPUT_SIZE_TEST
    variables = tester.variables  # baked into the module as constants

    def fn(image):
        with quant_scope(quant_ctx):  # entered at trace time
            # trace the UNJITTED head: tester._probs's per-instance jit
            # cache may hold a trace made without the quant scope (e.g.
            # tester.test() ran first), and reusing it would export the f32
            # graph mislabeled as quantized
            probs = tester._probs_impl(variables, image, (int(h), int(w)))
        return jnp.argmax(probs, axis=-1).astype(jnp.int32)

    spec = jax.ShapeDtypeStruct((batch_size, int(h), int(w), 3), jnp.float32)
    kwargs = {}
    if platforms:
        kwargs["platforms"] = tuple(platforms)
    exported = jexport.export(jax.jit(fn), **kwargs)(spec)
    blob = exported.serialize()

    os.makedirs(os.path.dirname(os.path.abspath(out_path)) or ".",
                exist_ok=True)
    with open(out_path + ".stablehlo", "wb") as f:
        f.write(blob)
    meta = {
        "model": cfg.MODEL.NAME,
        "num_classes": cfg.MODEL.NUM_CLASSES,
        "input": [batch_size, int(h), int(w), 3],
        "input_dtype": "float32",
        "output": "argmax class ids, int32 [N,H,W]",
        # the RESOLVED mode — cfg may say int8 while the backend fell back
        # to the f32 'fake' path; the artifact must be labeled by the graph
        # it actually contains
        "quant": quant_ctx.mode if quant_ctx is not None else "none",
        "platforms": list(exported.platforms),
        "bytes": len(blob),
    }
    with open(out_path + ".json", "w") as f:
        json.dump(meta, f, indent=1)
    if logger:
        logger.info(f"exported {meta['model']} -> {out_path}.stablehlo "
                    f"({len(blob) / 1e6:.1f} MB, platforms={meta['platforms']})")
    return meta


def load_exported(out_path: str):
    """Returns (callable(image_batch) -> class ids, metadata dict)."""
    from jax import export as jexport

    with open(out_path + ".stablehlo", "rb") as f:
        exported = jexport.deserialize(f.read())
    with open(out_path + ".json") as f:
        meta = json.load(f)

    def call(image: np.ndarray) -> np.ndarray:
        return np.asarray(exported.call(image))

    return call, meta
