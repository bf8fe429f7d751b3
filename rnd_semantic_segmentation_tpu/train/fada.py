"""FADA adversarial domain-adaptation train step — one XLA graph.

Reproduces the reference's 3-phase alternating optimization
(aspp_fada.py:42-136, gald_fada.py:60-136, attn_fada.py:36-170) exactly,
but as a single jitted step:

  ① source seg loss on pre-update params (temperature 1.8 on the CE input for
    deeplab/gald; attn uses its multiscale Tversky+BCE on raw outputs)
  ② generator adversarial loss: D(tap(tgt)) vs [tgt_soft ‖ 0] scaled 0.001 —
    gradients flow to the segmentor only (D params are constants here,
    matching the reference's optimizer_D.zero_grad() before the D step)
  ③ discriminator loss on STALE (pre-update, stop-gradient) features:
    0.5·softCE(D(src_tap), [src_soft ‖ 0]) + 0.5·softCE(D(tgt_tap), [0 ‖ tgt_soft])

Soft labels are clipped at 0.9 and stop-gradiented (aspp_fada.py:106-117).
①+② backwards accumulate into one segmentor gradient (zero_grad only at the
iteration top), which is what `value_and_grad` of (seg + adv) computes.

LR: poly per-iteration for deeplab/gald on BASE_LR and BASE_LR_D
(aspp_fada.py:71-78); warmup-cosine per-epoch for attn (attn_fada.py:64-66).
D optimizer is Adam(betas=(0.9, 0.99)) (fada_adapter.py:24).
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import struct

from .. import losses
from .schedules import poly_lr, warmup_cosine_lr
from .segmentor import Segmentor
from .state import ModuleState, TrainState, apply_updates, make_optimizer
from .steps import make_family_loss, remat_wrap

TEMPERATURE = 1.8
SOFT_CLIP = 0.9
ADV_WEIGHT = 0.001


class FadaState(struct.PyTreeNode):
    seg: TrainState
    disc: ModuleState


def make_fada_train_step(segmentor: Segmentor, disc_module, cfg,
                         steps_per_epoch: int,
                         base_rng: Optional[jax.Array] = None,
                         jit: bool = True) -> Callable:
    spec = segmentor.spec
    num_classes = cfg.MODEL.NUM_CLASSES
    # λ for the generator adversarial term.  The reference hardcodes 0.001
    # (aspp_fada.py:110-112) — that stays the default; SOLVER.ADV_WEIGHT
    # makes it tunable (e.g. short-horizon adaptation runs want it larger).
    adv_weight = float(getattr(cfg.SOLVER, "ADV_WEIGHT", ADV_WEIGHT))
    seg_loss_fn = make_family_loss(spec, num_classes, cfg.INPUT.IGNORE_LABEL)
    max_iter = cfg.SOLVER.EPOCHS * steps_per_epoch
    txs = {}
    for name in spec.modules:
        if spec.optimizer == "sgd":
            txs[name] = make_optimizer("sgd", momentum=cfg.SOLVER.MOMENTUM,
                                       weight_decay=cfg.SOLVER.WEIGHT_DECAY)
        else:
            wd = cfg.SOLVER.WEIGHT_DECAY if spec.family in ("attn", "attnwrap") else 0.0
            txs[name] = make_optimizer("adam", weight_decay=wd)
    tx_d = make_optimizer("adam", betas=(0.9, 0.99))
    if base_rng is None:
        base_rng = jax.random.PRNGKey(cfg.SEED)

    use_epoch_sched = spec.family in ("attn", "attnwrap")

    def lr_seg(it, ep0):
        if use_epoch_sched:
            return warmup_cosine_lr(cfg.SOLVER.BASE_LR, ep0)
        return poly_lr(cfg.SOLVER.BASE_LR, it, max_iter, cfg.SOLVER.LR_POWER)

    def lr_d(it, ep0):
        if use_epoch_sched:
            return warmup_cosine_lr(cfg.SOLVER.BASE_LR_D, ep0)
        return poly_lr(cfg.SOLVER.BASE_LR_D, it, max_iter, cfg.SOLVER.LR_POWER)

    def _soft_label(final_output):
        if final_output.shape[-1] == 1:
            # 1-channel heads (pranet): sigmoid -> [1-p, p] class distribution
            # (the reference's PraNetFada was never implemented,
            # train_adv.py:52-53; this is the natural binary extension)
            p = jax.nn.sigmoid(final_output.astype(jnp.float32) / TEMPERATURE)
            soft = jnp.concatenate([1.0 - p, p], axis=-1)
        else:
            soft = jax.nn.softmax(final_output.astype(jnp.float32) / TEMPERATURE,
                                  axis=-1)
        return jax.lax.stop_gradient(jnp.minimum(soft, SOFT_CLIP))

    def _final(outputs):
        # the output whose softmax makes the soft label: deeplab outputs[0];
        # gald outputs[-1] (out2); attn outputs[0]
        if spec.family == "gald":
            return outputs[-1]
        return outputs[0]

    compute_dtype = jnp.dtype(cfg.MODEL.DTYPE)

    def step_fn(state: FadaState, src_batch, tgt_batch, epoch0):
        src_x = src_batch["image"].astype(compute_dtype)
        src_label = src_batch["label"]
        tgt_x = tgt_batch["image"].astype(compute_dtype)
        src_size = src_x.shape[1:3]
        tgt_size = tgt_x.shape[1:3]
        stats = {n: m.stats for n, m in state.seg.modules.items()}
        rngs = {"dropout": jax.random.fold_in(base_rng, state.seg.step)}
        d_params = state.disc.params

        def gen_loss(params):
            src_outputs, stats1, src_tap = segmentor.forward(
                params, stats, src_x, label_size=src_size, train=True, rngs=rngs)
            if spec.family in ("attn", "attnwrap", "pranet"):
                # multiscale/structure losses run on raw outputs; temperature
                # only shapes the soft labels (attn_fada.py:97-104)
                loss_seg = seg_loss_fn(src_outputs, src_label)
            else:
                scaled = tuple(o / TEMPERATURE for o in src_outputs)
                loss_seg = seg_loss_fn(scaled, src_label)
            src_soft = _soft_label(_final(src_outputs))

            tgt_outputs, stats2, tgt_tap = segmentor.forward(
                params, stats1, tgt_x, label_size=tgt_size, train=True, rngs=rngs)
            tgt_soft = _soft_label(_final(tgt_outputs))

            tgt_d_pred = disc_module.apply({"params": d_params}, tgt_tap,
                                           size=tgt_size)
            adv_target = jnp.concatenate(
                [tgt_soft, jnp.zeros_like(tgt_soft)], axis=-1)
            loss_adv = adv_weight * losses.soft_label_cross_entropy(
                tgt_d_pred, adv_target)
            aux = (stats2, src_tap, tgt_tap, src_soft, tgt_soft,
                   loss_seg, loss_adv)
            return loss_seg + loss_adv, aux

        params = {n: m.params for n, m in state.seg.modules.items()}
        (_, aux), grads = jax.value_and_grad(
            remat_wrap(gen_loss, cfg), has_aux=True)(params)
        stats2, src_tap, tgt_tap, src_soft, tgt_soft, loss_seg, loss_adv = aux

        it = state.seg.step.astype(jnp.float32)
        lr = lr_seg(it, epoch0)
        new_modules = {}
        for name, m in state.seg.modules.items():
            m = m.replace(stats=stats2[name])
            new_modules[name] = apply_updates(
                m, grads[name], txs[name], lr * spec.lr_mults[name])
        new_seg = TrainState(modules=new_modules, step=state.seg.step + 1)

        src_tap = jax.lax.stop_gradient(src_tap)
        tgt_tap = jax.lax.stop_gradient(tgt_tap)

        def d_loss(dp):
            src_d = disc_module.apply({"params": dp}, src_tap, size=src_size)
            tgt_d = disc_module.apply({"params": dp}, tgt_tap, size=tgt_size)
            l_src = 0.5 * losses.soft_label_cross_entropy(
                src_d, jnp.concatenate([src_soft, jnp.zeros_like(src_soft)], axis=-1))
            l_tgt = 0.5 * losses.soft_label_cross_entropy(
                tgt_d, jnp.concatenate([jnp.zeros_like(tgt_soft), tgt_soft], axis=-1))
            return l_src + l_tgt, (l_src, l_tgt)

        (_, (loss_d_src, loss_d_tgt)), d_grads = jax.value_and_grad(
            d_loss, has_aux=True)(d_params)
        new_disc = apply_updates(state.disc, d_grads, tx_d, lr_d(it, epoch0))

        metrics = {"loss_seg": loss_seg, "loss_adv_tgt": loss_adv,
                   "loss_D_src": loss_d_src, "loss_D_tgt": loss_d_tgt,
                   "lr": lr, "lr_D": lr_d(it, epoch0)}
        return FadaState(seg=new_seg, disc=new_disc), metrics

    if jit:
        return jax.jit(step_fn, donate_argnums=0)
    return step_fn


def init_disc_state(disc_module, rng, sample_tap, cfg) -> ModuleState:
    variables = disc_module.init(rng, sample_tap, size=None)
    tx_d = make_optimizer("adam", betas=(0.9, 0.99))
    return ModuleState(params=variables["params"], stats={},
                       opt_state=tx_d.init(variables["params"]))
