"""Unified trainer / adversarial trainer orchestration.

One trainer drives all four families (the reference has a per-family trainer
class each re-implementing the same loop — aspp/gald/pranet/attn_trainer.py;
here the family differences are fully contained in Segmentor + steps.py).

Loop semantics preserved:
  * per-iteration LR rewrite -> inside the jitted step
  * log every 20 iters with windowed meters (aspp_trainer.py:112-127)
  * checkpoint every SOLVER.CHECKPOINT_PERIOD epochs, process-0 only
    ({Prefix}-{epoch}, aspp_trainer.py:129-131)
  * loss/LR series dumped to <name>_chart_params.json (gald_trainer.py:121-126)
  * resume from cfg.resume (base_trainer.py:36-38)
  * PraNet multi-scale: 3 rates per batch (pranet_trainer.py:35-48).  The
    reference's rescale is dead code (it resizes to the ORIGINAL trainsize, so
    all 3 steps see identical data); we implement true multi-scale with
    per-rate compiled steps and a faithful_multiscale=False escape hatch.

TPU data parallelism: the global batch is sharded over the mesh 'data' axis;
XLA inserts the gradient all-reduce; BN stats are global (SyncBN semantics).
"""

from __future__ import annotations

import datetime
import os
import time
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..ckpt.orbax_io import checkpoint_name, load_checkpoint, save_checkpoint
from ..ckpt.pretrained import load_pretrained_backbone
from ..data.loader import DataLoader, build_collate_fn, device_prefetch
from ..models.build import build_adversarial_discriminator, build_segmentor
from ..parallel.mesh import batch_sharding, make_mesh, process_is_primary, replicate_state
from ..utils import MetricLogger, dump_json, setup_logger
from .fada import FadaState, init_disc_state, make_fada_train_step
from .segmentor import Segmentor
from .steps import make_optimizers, make_src_train_step, wrap_step_checkify


def _peak_memory_mb() -> float:
    """Device peak memory (torch.cuda.max_memory_allocated analog,
    aspp_trainer.py:125); 0 when the backend doesn't expose stats."""
    try:
        stats = jax.local_devices()[0].memory_stats() or {}
        return stats.get("peak_bytes_in_use", 0) / 1024.0 / 1024.0
    except Exception:
        return 0.0


def _resize_batch_to(batch: Dict, size: int) -> Dict:
    """Multi-scale rate resize (bilinear align_corners=True, matching
    F.upsample in pranet_trainer.py:46-48), on host numpy via jnp."""
    from ..ops import resize_bilinear
    image = np.asarray(resize_bilinear(jnp.asarray(batch["image"]), (size, size),
                                       align_corners=True))
    label_f = batch["label"].astype(np.float32)[..., None]
    label = np.asarray(resize_bilinear(jnp.asarray(label_f), (size, size),
                                       align_corners=True))[..., 0]
    # round rather than truncate: bilinear-resized binary masks keep their
    # nearest class (the reference's F.upsample kept float gts)
    return {"image": image, "label": np.rint(label).astype(batch["label"].dtype),
            "name": batch.get("name")}


class Trainer:
    """Source-supervised trainer (train_src regime; also drives distill)."""

    def __init__(self, name: str, cfg, train_loader: DataLoader,
                 local_rank: int = 0, logger=None):
        self.cfg = cfg
        self.name = name
        self.train_loader = train_loader
        self.logger = logger or setup_logger(name + "_train", cfg.OUTPUT_DIR, local_rank)
        self.mesh = make_mesh(cfg, batch_size=cfg.SOLVER.BATCH_SIZE)
        self.spec = build_segmentor(cfg)
        self.segmentor = Segmentor(self.spec, cfg.MODEL.NUM_CLASSES)
        self.start_epoch = 1
        self.lr_data = []
        self.loss_data = []

        sample = next(iter(train_loader))
        sample_x = jnp.zeros(sample["image"].shape, jnp.float32)
        variables = self.segmentor.init(jax.random.PRNGKey(cfg.SEED), sample_x)
        if cfg.MODEL.WEIGHTS:
            self.logger.info(f"Loading pretrained backbone from {cfg.MODEL.WEIGHTS}")
            variables = load_pretrained_backbone(self.spec, cfg, variables)
        txs = make_optimizers(self.spec, cfg)
        self.state = self.segmentor.make_states(variables, txs)
        self.state = replicate_state(self.state, self.mesh)

        resume = cfg.resume
        if resume == "latest":
            # fault-tolerance story (SURVEY §5): resume-from-latest recovery
            from ..ckpt.orbax_io import latest_checkpoint
            resume = latest_checkpoint(cfg.OUTPUT_DIR, self.spec.ckpt_prefix) or ""
        if resume:
            self.logger.info(f"Loading checkpoint from {resume}")
            self.state, self.start_epoch = load_checkpoint(resume, self.state)
            self.state = replicate_state(self.state, self.mesh)

        self.steps_per_epoch = len(train_loader)
        self.step_fn = make_src_train_step(
            self.segmentor, cfg, self.steps_per_epoch,
            base_rng=jax.random.PRNGKey(cfg.SEED + 1))
        if cfg.DEBUG.CHECKIFY:
            self.step_fn = wrap_step_checkify(self.step_fn)
        # DIST.SPATIAL_PARALLEL > 1: shard image height over the 'spatial'
        # axis too (GSPMD inserts the conv halo exchanges) instead of
        # replicating — the large-input regime (SURVEY §5 long-context)
        self.batch_sharding = batch_sharding(
            self.mesh, spatial=cfg.DIST.SPATIAL_PARALLEL > 1)
        self.device_aug = None
        if cfg.DATA_PIPE.DEVICE_AUG:
            from ..data.device_pipe import make_device_augmenter
            self.device_aug = make_device_augmenter(cfg)

    def train(self):
        cfg = self.cfg
        meters = MetricLogger(delimiter="  ")
        max_iter = cfg.SOLVER.EPOCHS * self.steps_per_epoch
        self.logger.info("#" * 20 + f" Start {self.spec.ckpt_prefix} Training " + "#" * 20)
        if process_is_primary():
            # reproducibility: snapshot the resolved config next to the run
            os.makedirs(cfg.OUTPUT_DIR, exist_ok=True)
            with open(os.path.join(cfg.OUTPUT_DIR, "config.yaml"), "w") as fh:
                fh.write(cfg.dump())
        start = time.time()
        multiscale = (self.spec.family == "pranet")
        rates = (0.75, 1.0, 1.25) if multiscale else (1.0,)
        trainsize = cfg.INPUT.TRAINSIZE

        iteration = int(self.state.step)
        for epoch in range(self.start_epoch, cfg.SOLVER.EPOCHS + 1):
            epoch0 = jnp.float32(epoch - 1)
            if hasattr(self.train_loader, "set_epoch"):
                # replay-exact resume: shuffle order is f(seed, epoch)
                self.train_loader.set_epoch(epoch)
            it = device_prefetch(iter(self.train_loader), cfg.DATA_PIPE.PREFETCH,
                                 sharding=self.batch_sharding)
            while True:
                tic = time.time()
                try:
                    # explicit fetch so host-pipeline stalls are visible: the
                    # `data` meter is the device-idle (input-starvation) time
                    # per step; `time`-`data` is compute (BENCH_HOST.json's
                    # overlap model uses the same accounting)
                    batch = next(it)
                except StopIteration:
                    break
                data_time = time.time() - tic
                if self.device_aug is not None:
                    batch = self.device_aug(batch, iteration)
                for rate in rates:
                    if multiscale and rate != 1.0:
                        size = int(round(trainsize * rate / 32) * 32)
                        sb = _resize_batch_to(
                            {k: np.asarray(v) if hasattr(v, "shape") else v
                             for k, v in batch.items()}, size)
                        sb = {k: jax.device_put(v, self.batch_sharding)
                              for k, v in sb.items() if hasattr(v, "shape")}
                    else:
                        sb = {k: v for k, v in batch.items() if k != "name"}
                    self.state, metrics = self.step_fn(self.state, sb, epoch0)
                iteration += 1
                loss = float(metrics["loss"])
                lr = float(metrics["lr"])
                meters.update(loss_seg=loss, time=time.time() - tic,
                              data=data_time)
                self.lr_data.append(lr)
                self.loss_data.append(loss)
                if iteration % 20 == 0 or iteration == max_iter:
                    eta = meters.meters["time"].global_avg * (max_iter - iteration)
                    self.logger.info(
                        f"Epoch: {epoch}  eta: {datetime.timedelta(seconds=int(eta))}  "
                        f"iter: {iteration}  {meters}  lr: {lr:.6f}  "
                        f"max mem: {_peak_memory_mb():.0f}")
            if (epoch % cfg.SOLVER.CHECKPOINT_PERIOD == 0
                    and process_is_primary()):
                # prune BEFORE initiating the (possibly async) save: pruning
                # never races the in-flight serialization and a crash
                # mid-save still leaves complete dirs behind.  Prune to
                # keep-1 so the save lands retention at exactly
                # SOLVER.KEEP_CHECKPOINTS (0 = keep all) — but never below
                # one complete checkpoint: at KEEP_CHECKPOINTS=1, pruning to
                # zero before the save would open a window (prune..save
                # completion) where a preemption loses the whole run.  The
                # KEEP=1 case therefore holds 2 dirs until the next period.
                from ..ckpt.orbax_io import prune_checkpoints
                if cfg.SOLVER.KEEP_CHECKPOINTS > 0:
                    prune_checkpoints(cfg.OUTPUT_DIR, self.spec.ckpt_prefix,
                                      max(cfg.SOLVER.KEEP_CHECKPOINTS - 1, 1))
                path = checkpoint_name(cfg.OUTPUT_DIR, self.spec.ckpt_prefix, epoch)
                save_checkpoint(path, self.state, epoch,
                                wait=not cfg.SOLVER.ASYNC_CHECKPOINT)
                self.logger.info(f"[Saving Snapshot:] {path}")

        if cfg.SOLVER.BN_RECAL_BATCHES > 0:
            self._recalibrate_bn(cfg.SOLVER.BN_RECAL_BATCHES)

        from ..ckpt.orbax_io import wait_for_checkpoints
        wait_for_checkpoints()
        total = time.time() - start
        self.logger.info(
            f"Total training time: {datetime.timedelta(seconds=int(total))} "
            f"({total / max(cfg.SOLVER.EPOCHS, 1):.4f} s / epoch)")
        dump_json(os.path.join(cfg.OUTPUT_DIR,
                               f"{self.spec.family}_chart_params.json"),
                  {"learning rate": self.lr_data, "loss": self.loss_data})
        return self.state

    def _recalibrate_bn(self, n_batches: int):
        """SOLVER.BN_RECAL_BATCHES > 0: replace BN running stats with the
        average batch statistics over n loader batches (train/bn_recal.py,
        the torch swa_utils.update_bn analog), then re-save the final
        checkpoint so eval/resume sees the recalibrated model.  Essential
        for short from-scratch runs: the EfficientNet encoder's momentum
        0.01 leaves running stats ~unconverged for hundreds of steps."""
        cfg = self.cfg
        import jax as _jax
        if _jax.process_count() > 1:
            # per-process loader shards would recalibrate each replica on
            # different data and de-replicate the stats
            self.logger.warning("BN_RECAL_BATCHES ignored under multi-process "
                                "training (per-process loader shards)")
            return
        from .bn_recal import recalibrate_batch_stats
        batches = []
        for i, batch in enumerate(self.train_loader):
            if self.device_aug is not None:
                # recalibrate on the distribution the BN layers actually
                # saw in training: with DATA_PIPE.DEVICE_AUG the per-pixel
                # normalize/jitter lives in the device pipeline, so raw
                # loader images ([0,1]) are the WRONG input statistics
                batch = self.device_aug(
                    {k: v for k, v in batch.items() if k != "name"}, i)
            batches.append(
                {"image": np.asarray(batch["image"]).astype(np.float32)})
            if len(batches) >= n_batches:
                break
        params = {n: m.params for n, m in self.state.modules.items()}
        stats = {n: m.stats for n, m in self.state.modules.items()}
        new_stats = recalibrate_batch_stats(
            self.segmentor, params, stats, batches,
            rng=jax.random.PRNGKey(cfg.SEED + 2))
        self.state = self.state.replace(modules={
            n: m.replace(stats=new_stats[n])
            for n, m in self.state.modules.items()})
        self.logger.info(f"[BN-recal] running stats re-estimated over "
                         f"{len(batches)} batches")
        if process_is_primary():
            path = checkpoint_name(cfg.OUTPUT_DIR, self.spec.ckpt_prefix,
                                   cfg.SOLVER.EPOCHS)
            save_checkpoint(path, self.state, cfg.SOLVER.EPOCHS, wait=True)
            self.logger.info(f"[BN-recal] re-saved {path}")


class FadaTrainer:
    """Adversarial DA trainer (train_adv regime)."""

    def __init__(self, name: str, cfg, src_loader: DataLoader,
                 tgt_loader: DataLoader, local_rank: int = 0):
        self.cfg = cfg
        self.logger = setup_logger(name + "_train", cfg.OUTPUT_DIR, local_rank)
        self.mesh = make_mesh(cfg, batch_size=cfg.SOLVER.BATCH_SIZE // 2)
        self.spec = build_segmentor(cfg)
        self.segmentor = Segmentor(self.spec, cfg.MODEL.NUM_CLASSES)
        self.src_loader = src_loader
        self.tgt_loader = tgt_loader
        self.start_epoch = 1

        sample = next(iter(src_loader))
        sample_x = jnp.zeros(sample["image"].shape, jnp.float32)
        variables = self.segmentor.init(jax.random.PRNGKey(cfg.SEED), sample_x)
        if cfg.MODEL.WEIGHTS:
            variables = load_pretrained_backbone(self.spec, cfg, variables)
        txs = make_optimizers(self.spec, cfg)
        seg_state = self.segmentor.make_states(variables, txs)

        # discriminator sized from the family's tap feature
        params = {n: m.params for n, m in seg_state.modules.items()}
        stats = {n: m.stats for n, m in seg_state.modules.items()}
        tap_shape = jax.eval_shape(
            lambda p, x: self.segmentor.forward(p, stats, x, train=False)[2],
            params, sample_x)
        self.disc = build_adversarial_discriminator(cfg)
        disc_state = init_disc_state(
            self.disc, jax.random.PRNGKey(cfg.SEED + 2),
            jnp.zeros(tap_shape.shape, jnp.float32), cfg)

        self.state = replicate_state(FadaState(seg=seg_state, disc=disc_state),
                                     self.mesh)
        if cfg.resume:
            self.logger.info(f"Loading checkpoint from {cfg.resume}")
            # restores seg modules + D (stored as module 'model_D')
            full = FadaState(seg=self.state.seg, disc=self.state.disc)
            from ..ckpt.orbax_io import load_checkpoint as _lc
            # reuse TrainState container by packing disc as a module
            from .state import TrainState as _TS
            packed = _TS(modules={**self.state.seg.modules,
                                  "model_D": self.state.disc},
                         step=self.state.seg.step)
            packed, self.start_epoch = _lc(cfg.resume, packed)
            disc = packed.modules.pop("model_D")
            self.state = FadaState(
                seg=_TS(modules=packed.modules, step=packed.step), disc=disc)
            self.state = replicate_state(self.state, self.mesh)

        self.steps_per_epoch = min(len(src_loader), len(tgt_loader))
        self.step_fn = make_fada_train_step(
            self.segmentor, self.disc, cfg, self.steps_per_epoch,
            base_rng=jax.random.PRNGKey(cfg.SEED + 3))
        if cfg.DEBUG.CHECKIFY:
            self.step_fn = wrap_step_checkify(self.step_fn)
        self.batch_sharding = batch_sharding(
            self.mesh, spatial=cfg.DIST.SPATIAL_PARALLEL > 1)
        self.device_aug_src = self.device_aug_tgt = None
        if cfg.DATA_PIPE.DEVICE_AUG:
            from ..data.device_pipe import make_device_augmenter
            # aspp_trans applies ColorJitter to the source domain only; the
            # target stream draws an independent key stream + target size
            self.device_aug_src = make_device_augmenter(cfg, is_source=True)
            self.device_aug_tgt = make_device_augmenter(cfg, is_source=False)

    def train(self):
        cfg = self.cfg
        meters = MetricLogger(delimiter="  ")
        series = {k: [] for k in ("lr", "lr_D", "loss_seg", "loss_adv_tgt",
                                  "loss_D_src", "loss_D_tgt")}
        max_iter = cfg.SOLVER.EPOCHS * self.steps_per_epoch
        self.logger.info("#" * 20 + " Start Adversarial Training " + "#" * 20)
        iteration = int(self.state.seg.step)
        for epoch in range(self.start_epoch, cfg.SOLVER.EPOCHS + 1):
            epoch0 = jnp.float32(epoch - 1)
            for ldr in (self.src_loader, self.tgt_loader):
                if hasattr(ldr, "set_epoch"):
                    ldr.set_epoch(epoch)  # replay-exact resume
            src_it = device_prefetch(iter(self.src_loader), cfg.DATA_PIPE.PREFETCH,
                                     sharding=self.batch_sharding)
            tgt_it = device_prefetch(iter(self.tgt_loader), cfg.DATA_PIPE.PREFETCH,
                                     sharding=self.batch_sharding)
            pairs = zip(src_it, tgt_it)
            while True:
                tic = time.time()
                try:
                    src_batch, tgt_batch = next(pairs)
                except StopIteration:
                    break
                data_time = time.time() - tic  # input-starvation accounting
                if self.device_aug_src is not None:
                    src_batch = self.device_aug_src(src_batch, iteration)
                    tgt_batch = self.device_aug_tgt(tgt_batch, iteration)
                self.state, metrics = self.step_fn(
                    self.state,
                    {k: v for k, v in src_batch.items() if k != "name"},
                    {k: v for k, v in tgt_batch.items() if k != "name"},
                    epoch0)
                iteration += 1
                vals = {k: float(v) for k, v in metrics.items()}
                meters.update(time=time.time() - tic, data=data_time,
                              **{k: v for k, v in vals.items()
                                 if k.startswith("loss")})
                for k in series:
                    series[k].append(vals[k])
                if iteration % 20 == 0 or iteration == max_iter:
                    eta = meters.meters["time"].global_avg * (max_iter - iteration)
                    self.logger.info(
                        f"Epoch: {epoch}  eta: {datetime.timedelta(seconds=int(eta))}  "
                        f"iter: {iteration}  {meters}  lr: {vals['lr']:.6f}")
            if (epoch % cfg.SOLVER.CHECKPOINT_PERIOD == 0 and process_is_primary()):
                from .state import TrainState as _TS
                packed = _TS(modules={**self.state.seg.modules,
                                      "model_D": self.state.disc},
                             step=self.state.seg.step)
                path = checkpoint_name(cfg.OUTPUT_DIR,
                                       f"{self.spec.ckpt_prefix}Fada", epoch)
                save_checkpoint(path, packed, epoch,
                                wait=not cfg.SOLVER.ASYNC_CHECKPOINT)
                self.logger.info(f"[Saving Snapshot:] {path}")

        from ..ckpt.orbax_io import wait_for_checkpoints
        wait_for_checkpoints()
        dump_json(os.path.join(cfg.OUTPUT_DIR,
                               f"{self.spec.family}_fada_chart_params.json"),
                  {"learning rate": series["lr"],
                   "discriminator learning rate": series["lr_D"],
                   "segmentation loss": series["loss_seg"],
                   "target adversarial loss": series["loss_adv_tgt"],
                   "source discriminator loss": series["loss_D_src"],
                   "target discriminator loss": series["loss_D_tgt"]})
        return self.state
