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

TPU-native multi-device eval: the Tester builds the same ('data','spatial')
mesh as the Trainer (parallel/mesh.py) — the eval batch is sharded over the
data axis and, when DIST.SPATIAL_PARALLEL > 1, image height over the spatial
axis; the I/U + confusion histograms are reduced on-device inside the jitted
step (GSPMD inserts the psums — SURVEY §5 "eval metric reduction", matching
/root/reference/core/utils/utility.py:148-161), so only C-sized vectors ever
cross to the host.  Short final batches (drop_last=False) are padded with
ignore-labeled rows, which contribute zero to every histogram.
"""

from __future__ import annotations

import functools
import os
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..ckpt import torch_import as TI
from ..models.build import build_segmentor
from ..ops import resize_bilinear
from ..train.segmentor import Segmentor
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
        # multi-device eval mesh (same treatment as Trainer): batch over
        # 'data', optionally H over 'spatial' (DIST.SPATIAL_PARALLEL)
        from jax.sharding import NamedSharding, PartitionSpec
        from ..parallel.mesh import batch_sharding, make_mesh, replicate_state
        self._local_bs = (getattr(test_loader, "batch_size", None)
                          or max(cfg.TEST.BATCH_SIZE, 1))
        self.mesh = make_mesh(
            cfg, batch_size=self._local_bs * jax.process_count())
        self.eval_sharding = batch_sharding(
            self.mesh, spatial=cfg.DIST.SPATIAL_PARALLEL > 1)
        # [B]-shaped row-validity mask: data axis only
        self._mask_sharding = NamedSharding(
            self.mesh, PartitionSpec(self.mesh.axis_names[0]))
        self._replicate = lambda tree: replicate_state(tree, self.mesh)

    # -- checkpoint ----------------------------------------------------------
    def _load_checkpoint(self):
        path = self.cfg.resume
        if path in ("", "latest"):
            # same recovery semantics as the Trainer (resume-from-latest);
            # empty resume means "evaluate the newest checkpoint in
            # OUTPUT_DIR" — the natural train_src.py -> test.py loop
            from ..ckpt.orbax_io import latest_checkpoint
            found = latest_checkpoint(self.cfg.OUTPUT_DIR,
                                      self.spec.ckpt_prefix)
            if not found:
                raise FileNotFoundError(
                    f"resume={path or '(empty)'}: no {self.spec.ckpt_prefix}-* "
                    f"checkpoint in {self.cfg.OUTPUT_DIR}; pass "
                    f"`resume <path>` or train first")
            path = found
        self.logger.info(f"Loading checkpoint from {path}")
        if path.endswith(".pth"):
            self.variables = self._load_torch_checkpoint(path)
        else:
            # structure-free params+stats restore: works for plain AND FADA
            # checkpoints (the latter carry an extra model_D module, matching
            # the reference's combined .pth layout, aspp_fada.py:29-40)
            from ..ckpt.orbax_io import load_checkpoint_variables
            wanted = set(self.spec.modules)
            self.variables, _ = load_checkpoint_variables(path, wanted)
            missing = wanted - set(self.variables)
            if missing:
                raise ValueError(
                    f"checkpoint {path} lacks modules {sorted(missing)} "
                    f"needed by {self.cfg.MODEL.NAME}")
        self.variables = self._replicate(self.variables)

    def _load_torch_checkpoint(self, path: str) -> Dict:
        return load_torch_checkpoint_variables(self.cfg, self.spec, path)

    # -- probability head ------------------------------------------------------
    @functools.partial(jax.jit, static_argnums=(0, 3))
    def _probs(self, variables, x, label_size):
        return self._probs_impl(variables, x, label_size)

    def _probs_impl(self, variables, x, label_size, valid=None):
        """Unjitted head — callers that need a FRESH jit cache (e.g. the
        serving daemon after quant calibration: a cache populated without
        the quant scope would silently keep serving the f32 graph) wrap
        this themselves instead of sharing ``_probs``'s per-instance
        cache.

        ``valid`` ([B] bool, optional): rows that are real data.  Only the
        pranet head consumes it — its min-max rescale is batch-GLOBAL
        (reference pranet_tester.py:41 takes min/max over the whole B,H,W
        array), so the Tester's ignore-padded rows must be masked out of
        the statistics or they perturb real rows' predictions."""
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
            if valid is not None:
                v = valid[:, None, None]
                pmin = jnp.min(jnp.where(v, p, jnp.inf))
                pmax = jnp.max(jnp.where(v, p, -jnp.inf))
            else:
                pmin, pmax = p.min(), p.max()
            p = (p - pmin) / (pmax - pmin + 1e-8)
            return jnp.stack([1 - p, p], axis=-1)
        if fam in ("attn", "attnwrap"):
            return jax.nn.sigmoid(forward(x, label_size).astype(jnp.float32))
        raise NotImplementedError(fam)

    # -- fused eval step: probs -> pred -> on-device histograms ---------------
    @functools.partial(jax.jit, static_argnums=(0, 4))
    def _eval_step(self, variables, x, y, label_size, valid=None):
        """One jitted graph per input shape: forward + argmax + I/U areas +
        confusion matrix.  With sharded inputs GSPMD reduces the histograms
        across the mesh on-device; only [C]-vectors reach the host.
        ``valid`` masks padded rows out of batch-coupled heads (pranet)."""
        nc = self.cfg.MODEL.NUM_CLASSES
        ignore = self.cfg.INPUT.IGNORE_LABEL
        probs = self._probs_impl(variables, x, label_size, valid=valid)
        pred = jnp.argmax(probs, axis=-1)
        areas = intersection_and_union(pred, y, nc, ignore)
        cmt = confusion_matrix(pred, y, nc, ignore)
        return pred, areas, cmt

    # -- serving-path quantization ---------------------------------------------
    def make_quant_context(self):
        """TEST.QUANT != none: calibrate activation scales on the first
        TEST.QUANT_CALIB_BATCHES eval batches, return a QuantContext (or
        None) to trace the eval loop under (serve/quant.py).

        ``TEST.QUANT auto`` encodes the measured serving policy in code
        (docs/SERVING.md): resolve to bf16 when the spatial area exceeds
        TEST.QUANT_MAX_AREA (HBM-bound regime — int8 measured 0.64x there)
        or when calibration-batch argmax agreement falls below
        TEST.QUANT_AGREEMENT_FLOOR.  Explicit int8/fake requests are
        honored but warned about when they trip the same gates.
        Cached: calibration runs once per Tester; the outcome is recorded in
        ``self.quant_report``."""
        if hasattr(self, "_qctx"):
            return self._qctx
        from ..serve import QuantConfig, calibrate_segmentor
        from ..serve.quant import (argmax_agreement, quant_error_report,
                                   resolve_mode)

        requested = self.cfg.TEST.QUANT
        self.quant_report = {"requested": requested, "mode": "none",
                             "agreement": None, "reason": ""}
        if requested == "none":
            self._qctx = None
            return None
        if jax.process_count() > 1:
            # Calibration feeds process-LOCAL loader batches to jitted probes
            # over mesh-replicated variables (jit would raise on the mix), and
            # per-process activation stats would yield divergent quant scales
            # anyway.  Quantized eval is a single-process serving feature.
            self.logger.warning(
                f"TEST.QUANT={requested}: quantized eval is not supported "
                f"under multi-process eval (process_count="
                f"{jax.process_count()}) — serving bf16")
            self.quant_report["reason"] = "multiprocess"
            self._qctx = None
            return None
        w, h = self.cfg.INPUT.INPUT_SIZE_TEST
        mode = resolve_mode(requested, area=int(w) * int(h),
                            max_area=self.cfg.TEST.QUANT_MAX_AREA)
        if mode == "none":
            self.logger.info(
                f"TEST.QUANT=auto: {w}x{h} exceeds QUANT_MAX_AREA="
                f"{self.cfg.TEST.QUANT_MAX_AREA} (HBM-bound regime) — "
                f"serving bf16")
            self.quant_report["reason"] = "geometry"
            self._qctx = None
            return None
        if mode != requested and requested != "auto":
            self.logger.info(
                f"TEST.QUANT={requested}: backend lacks int8 conv; using the "
                f"'{mode}' path (numerically equivalent up to f32 "
                f"accumulation rounding)")
        qcfg = QuantConfig(mode=mode,
                           calib_batches=self.cfg.TEST.QUANT_CALIB_BATCHES,
                           min_channels=self.cfg.TEST.QUANT_MIN_CHANNELS)
        ctx = calibrate_segmentor(self.segmentor, self.variables,
                                  self.test_loader, config=qcfg)

        floor = float(self.cfg.TEST.QUANT_AGREEMENT_FLOOR)
        if floor > 0:
            batch = next(iter(self.test_loader))
            x = jnp.asarray(batch["image"])
            ls = tuple(batch["label"].shape[1:3]) if "label" in batch \
                else tuple(x.shape[1:3])
            agreement = argmax_agreement(
                lambda xx, l: self._probs_impl(self.variables, xx, l),
                x, ls, ctx)
            self.quant_report["agreement"] = agreement
            if agreement < floor:
                if requested == "auto":
                    # per-layer sensitivity repair before giving up on int8:
                    # exclude the worst-quantizing convs (they fall back to
                    # bf16) and re-check — one outlier layer no longer forces
                    # the whole model off the int8 path (serve/quant.py).
                    max_ex = int(self.cfg.TEST.QUANT_REPAIR_MAX)
                    if max_ex > 0:
                        from ..serve.quant import repair_exclusions
                        probs = lambda xx, l: self._probs_impl(
                            self.variables, xx, l)
                        agreement, excluded = repair_exclusions(
                            probs, x, ls, ctx, floor, max_exclude=max_ex,
                            logger=self.logger)
                        self.quant_report["agreement"] = agreement
                        self.quant_report["excluded"] = excluded
                    if agreement < floor:
                        self.logger.info(
                            f"TEST.QUANT=auto: argmax agreement "
                            f"{agreement:.3f} < floor {floor} even after "
                            f"repair — serving bf16")
                        self.quant_report["reason"] = "accuracy"
                        self._qctx = None
                        return None
                    self.quant_report["reason"] = "repaired"
                else:
                    self.logger.warning(
                        f"TEST.QUANT={requested}: argmax agreement "
                        f"{agreement:.3f} < floor {floor}; honoring the "
                        f"explicit request — set TEST.QUANT auto to gate on "
                        f"accuracy")
        self.quant_report["mode"] = mode
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

    def _pad_batch(self, batch, bs: int):
        """Pad a short final batch (drop_last=False) to the compiled batch
        size with ignore-labeled rows: one jitted shape, zero metric effect."""
        n = int(batch["image"].shape[0])
        assert n <= bs, (
            f"loader produced a batch of {n} rows but the compiled eval step "
            f"expects at most {bs} (inferred local batch size); pass a loader "
            f"with a batch_size attribute or lower TEST.BATCH_SIZE")
        if n == bs:
            return batch, n
        pad = bs - n
        image = np.concatenate(
            [batch["image"],
             np.zeros((pad,) + batch["image"].shape[1:], batch["image"].dtype)])
        label = np.concatenate(
            [batch["label"],
             np.full((pad,) + batch["label"].shape[1:],
                     self.cfg.INPUT.IGNORE_LABEL, batch["label"].dtype)])
        return {**batch, "image": image, "label": label}, n

    def _put(self, arr, sharding=None):
        """Batch placement onto the eval mesh; multi-process assembles the
        global array from per-host loader shards (parallel/mesh.py)."""
        sh = sharding if sharding is not None else self.eval_sharding
        if jax.process_count() > 1:
            return jax.make_array_from_process_local_data(sh, np.asarray(arr))
        return jax.device_put(np.asarray(arr), sh)

    def _fetch_pred(self, pred) -> np.ndarray:
        """Prediction rows addressable by THIS process, in global row order
        (single-process: the full array).  Multi-process saveres writes each
        host's own loader shard — the rank-0-only rule applies to metrics and
        JSON dumps, not pseudo-label PNGs (each host owns its slice)."""
        if jax.process_count() == 1:
            return np.asarray(pred)
        from collections import defaultdict
        parts = defaultdict(dict)
        for s in pred.addressable_shards:
            b0 = s.index[0].start or 0
            h0 = (s.index[1].start or 0) if len(s.index) > 1 else 0
            parts[b0][h0] = np.asarray(s.data)
        rows = [np.concatenate([hs[h] for h in sorted(hs)], axis=1)
                for _, hs in sorted(parts.items())]
        return np.concatenate(rows, axis=0)

    def _test_loop(self, cfg, nc, meter, cmt) -> Dict:
        # each process pads its local slice to the loader batch size (the
        # global batch is local_bs * process_count — cli/test.py semantics)
        bs = self._local_bs
        pending = []   # (areas, device_cmt) per batch — fetched after the loop
        for batch in self.test_loader:
            batch, n_real = self._pad_batch(batch, bs)
            x = self._put(batch["image"])
            y = self._put(batch["label"])
            valid = self._put(np.arange(bs) < n_real, self._mask_sharding)
            label_size = tuple(batch["label"].shape[1:3])
            pred, areas, batch_cmt = self._eval_step(
                self.variables, x, y, label_size, valid)
            if self.saveres:
                pred_np = self._fetch_pred(pred)
                for i in range(n_real):
                    save_pseudo_label(pred_np[i], self.palette,
                                      cfg.PSEUDO_DIR, cfg.DATASETS.TEST,
                                      batch["name"][i])
            # no per-batch host sync: device handles pile up, fetch at the end
            pending.append((areas, batch_cmt))

        for areas, batch_cmt in pending:
            inter, union, target, res = (np.asarray(a) for a in areas)
            meter.update(inter, union, target, res)
            cmt += np.asarray(batch_cmt, np.int64)

        summary = meter.summary(self.logger)
        from ..parallel.mesh import process_is_primary
        if process_is_primary():
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
