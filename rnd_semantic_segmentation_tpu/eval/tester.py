"""Unified evaluation loop for all four families.

Replaces the per-family testers (aspp/gald/pranet/attn_tester.py) with one
loop; family differences are the probability head:
  * deeplab — flip-free ``inference()``: logits -> bilinear(align=True) to
    label size -> softmax (aspp_tester.py:60, utility.py:179-191)
  * gald — decoder res2 -> bilinear(align=False) -> softmax (gald_tester.py:65-70)
  * pranet — sigmoid(res2 upsampled) -> min-max normalize -> [1-p, p] stack
    (pranet_tester.py:38-44)
  * attn — sigmoid(out_0) -> argmax / threshold (attn_tester.py:41-43)

Checkpoints: Orbax dirs saved by this framework, or reference PyTorch ``.pth``
files (converted on the fly) for logit-parity evaluation.  ``--saveres``
exports palette PNGs into PSEUDO_DIR/inference/<dataset>/ to feed the
self-distill regime (aspp_tester.py:33-45).

The eval forward is jitted once per input shape; metric accumulation
(I/U histograms + confusion matrix) stays on device.
"""

from __future__ import annotations

import functools
import os
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..ckpt import torch_import as TI
from ..ckpt.orbax_io import load_checkpoint
from ..models.build import build_segmentor
from ..ops import resize_bilinear
from ..train.segmentor import Segmentor
from ..train.state import ModuleState, TrainState
from ..train.steps import make_optimizers
from ..utils import dump_json
from .metrics import AverageMeter, confusion_matrix, intersection_and_union
from .palette import save_pseudo_label


def load_torch_checkpoint_variables(cfg, spec, path: str) -> Dict:
    """Reference ``.pth`` checkpoint -> per-module flax variables
    (layouts from aspp_tester.py:25-31, gald_tester.py:26-29, etc.)."""
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    fam = spec.family
    freeze = cfg.MODEL.FREEZE_BN

    def conv(part, rules, **kw):
        sd = {k: v.detach().cpu().numpy() for k, v in ckpt[part].items()}
        sd = TI.strip_prefix_if_present(sd, "module.")
        return TI.convert_state_dict(sd, rules, **kw)

    if fam == "deeplab":
        return {
            "feature_extractor": conv("feature_extractor",
                                      TI.RESNET_BACKBONE_RULES,
                                      freeze_bn=freeze),
            "classifier": conv("classifier", TI.ASPP_CLASSIFIER_RULES),
        }
    if fam == "gald":
        return {
            "encoder": conv("encoder", TI.GCPA_ENCODER_RULES,
                            skip=("num_batches_tracked", "base.19")),
            "decoder": conv("decoder", TI.GCPA_DECODER_RULES),
        }
    if fam == "pranet":
        return {"model": conv("model", TI.PRANET_RULES)}
    if fam in ("attn", "attnwrap"):
        return {
            "encoder": conv("encoder", TI.ATTN_ENCODER_RULES),
            "decoder": conv("decoder", TI.ATTN_DECODER_RULES,
                            transposed_conv_paths=TI.ATTN_DECODER_TRANSPOSED,
                            skip=("num_batches_tracked", "decode_0")),
        }
    raise NotImplementedError(fam)


class Tester:
    __test__ = False  # not a pytest class

    def __init__(self, cfg, test_loader, logger, palette=None,
                 trainid2name=None, saveres: bool = False):
        self.cfg = cfg
        self.logger = logger
        self.test_loader = test_loader
        self.palette = palette
        self.trainid2name = trainid2name or {}
        self.saveres = saveres
        self.spec = build_segmentor(cfg)
        self.segmentor = Segmentor(self.spec, cfg.MODEL.NUM_CLASSES)
        self.variables: Optional[Dict] = None

    # -- checkpoint ----------------------------------------------------------
    def _load_checkpoint(self):
        path = self.cfg.resume
        if path == "latest":
            # same recovery semantics as the Trainer (resume-from-latest)
            from ..ckpt.orbax_io import latest_checkpoint
            path = latest_checkpoint(self.cfg.OUTPUT_DIR, self.spec.ckpt_prefix)
            if not path:
                raise FileNotFoundError(
                    f"resume=latest: no {self.spec.ckpt_prefix}-* checkpoint "
                    f"in {self.cfg.OUTPUT_DIR}")
        self.logger.info(f"Loading checkpoint from {path}")
        if path.endswith(".pth"):
            self.variables = self._load_torch_checkpoint(path)
        else:
            # restore via a template TrainState built from a fresh init
            sample = next(iter(self.test_loader))
            x = jnp.zeros(sample["image"].shape, jnp.float32)
            variables = self.segmentor.init(jax.random.PRNGKey(0), x)
            txs = make_optimizers(self.spec, self.cfg)
            state = self.segmentor.make_states(variables, txs)
            state, _ = load_checkpoint(path, state)
            self.variables = {
                name: {"params": m.params, **m.stats}
                for name, m in state.modules.items()
            }

    def _load_torch_checkpoint(self, path: str) -> Dict:
        return load_torch_checkpoint_variables(self.cfg, self.spec, path)

    # -- probability head ------------------------------------------------------
    @functools.partial(jax.jit, static_argnums=(0, 3))
    def _probs(self, variables, x, label_size):
        return self._probs_impl(variables, x, label_size)

    def _probs_impl(self, variables, x, label_size):
        """Unjitted head — callers that need a FRESH jit cache (e.g. the
        serving daemon after quant calibration: a cache populated without
        the quant scope would silently keep serving the f32 graph) wrap
        this themselves instead of sharing ``_probs``'s per-instance
        cache."""
        params = {n: dict(v)["params"] for n, v in variables.items()}
        stats = {n: {k: c for k, c in dict(v).items() if k != "params"}
                 for n, v in variables.items()}

        def forward(image, size):
            outputs, _, _ = self.segmentor.forward(
                params, stats, image, label_size=size, train=False)
            return outputs[-1] if self.spec.family in ("gald", "pranet") \
                else outputs[0]

        fam = self.spec.family
        if fam == "deeplab":
            # optional TTA on the deeplab path (utility.py:179-209 semantics)
            from .tta import inference as tta_inference, multi_scale_inference
            if self.cfg.TEST.MULTI_SCALE:
                return multi_scale_inference(forward, x, label_size,
                                             flip=self.cfg.TEST.FLIP_TTA,
                                             scales=tuple(self.cfg.TEST.SCALES))
            if self.cfg.TEST.FLIP_TTA:
                return tta_inference(forward, x, label_size, flip=True)
            out = resize_bilinear(forward(x, label_size).astype(jnp.float32),
                                  label_size, align_corners=True)
            return jax.nn.softmax(out, axis=-1)
        if fam == "gald":
            out = resize_bilinear(forward(x, label_size).astype(jnp.float32),
                                  label_size, align_corners=False)
            return jax.nn.softmax(out, axis=-1)
        if fam == "pranet":
            out = resize_bilinear(forward(x, label_size).astype(jnp.float32),
                                  label_size, align_corners=False)
            p = jax.nn.sigmoid(out)[..., 0]
            p = (p - p.min()) / (p.max() - p.min() + 1e-8)
            return jnp.stack([1 - p, p], axis=-1)
        if fam in ("attn", "attnwrap"):
            return jax.nn.sigmoid(forward(x, label_size).astype(jnp.float32))
        raise NotImplementedError(fam)

    # -- serving-path quantization ---------------------------------------------
    def make_quant_context(self):
        """TEST.QUANT != none: calibrate activation scales on the first
        TEST.QUANT_CALIB_BATCHES eval batches (eager forward), return a
        QuantContext (or None) to trace the eval loop under (serve/quant.py).
        Cached: calibration runs once per Tester."""
        if hasattr(self, "_qctx"):
            return self._qctx
        from ..serve import QuantConfig, calibrate_segmentor
        from ..serve.quant import quant_error_report, resolve_mode

        if self.cfg.TEST.QUANT == "none":
            self._qctx = None
            return None
        mode = resolve_mode(self.cfg.TEST.QUANT)
        if mode != self.cfg.TEST.QUANT:
            self.logger.info(
                f"TEST.QUANT={self.cfg.TEST.QUANT}: backend lacks int8 conv; "
                f"using the numerically-identical '{mode}' path")
        qcfg = QuantConfig(mode=mode,
                           calib_batches=self.cfg.TEST.QUANT_CALIB_BATCHES,
                           min_channels=self.cfg.TEST.QUANT_MIN_CHANNELS)
        ctx = calibrate_segmentor(self.segmentor, self.variables,
                                  self.test_loader, config=qcfg)
        self.logger.info(f"serving quantization: {quant_error_report(ctx)}")
        self._qctx = ctx
        return ctx

    def _quant_context(self):
        from ..serve import quant_scope
        return quant_scope(self.make_quant_context())

    # -- loop --------------------------------------------------------------------
    def test(self) -> Dict:
        cfg = self.cfg
        nc = cfg.MODEL.NUM_CLASSES
        meter = AverageMeter(nc)
        cmt = np.zeros((nc, nc), np.int64)
        assert self.variables is not None, "call _load_checkpoint() first"

        with self._quant_context():
            summary = self._test_loop(cfg, nc, meter, cmt)
        return summary

    def _test_loop(self, cfg, nc, meter, cmt) -> Dict:
        for batch in self.test_loader:
            x = jnp.asarray(batch["image"])
            y = jnp.asarray(batch["label"])
            label_size = tuple(y.shape[1:3])
            output = self._probs(self.variables, x, label_size)
            pred = jnp.argmax(output, axis=-1)
            if self.saveres:
                save_pseudo_label(np.asarray(pred[0]), self.palette,
                                  cfg.PSEUDO_DIR, cfg.DATASETS.TEST,
                                  batch["name"][0])
            cmt += np.asarray(confusion_matrix(pred, y, nc, cfg.INPUT.IGNORE_LABEL))
            inter, union, target, res = intersection_and_union(
                pred, y, nc, cfg.INPUT.IGNORE_LABEL)
            meter.update(np.asarray(inter), np.asarray(union),
                         np.asarray(target), np.asarray(res))

        summary = meter.summary(self.logger)
        dump_json(os.path.join(cfg.OUTPUT_DIR,
                               f"{self.spec.family}_confusion_matrix.json"),
                  {"cmt": cmt.tolist(),
                   "classes": list(self.trainid2name.values())})
        # heatmap PNG next to the JSON (reference utility.py:361-384 path)
        from ..utils.plots import plot_confusion_matrix
        classes = (list(self.trainid2name.values())
                   or [str(i) for i in range(nc)])
        plot_confusion_matrix(
            cmt, classes,
            out_path=os.path.join(cfg.OUTPUT_DIR,
                                  f"{self.spec.family}_confusion_matrix.png"))
        return summary
