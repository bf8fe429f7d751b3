"""Jitted source-supervised train steps for all four families.

One XLA graph per step: forward, loss, backward, per-module optimizer updates
with the per-iteration LR — the TPU-native replacement for the reference's
eager loops (aspp_trainer.py:57-127, gald_trainer.py:52-99,
pranet_trainer.py:33-77, attn_trainer.py:26-61).

Loss wiring per family:
  * deeplab — CE(ignore=255) on the ASPP output at label size
    (aspp_trainer.py:61,90-96)
  * gald — deep supervision: CE on 4 scales weighted 1/0.8/0.6/0.4 on
    (out2,out3,out4,out5) (gald_trainer.py:75-81)
  * pranet — sum of structure_loss over the 4 lateral maps
    (pranet_trainer.py:52-57), grad clamp 0.5 (:59)
  * attn — sum over 5 scales of 0.5*Tversky + 0.5*BCE against bilinear-scaled
    one-hot labels (attn_trainer.py:38-48,67-72)

LR schedules per family follow the reference trainers: poly per-iteration for
deeplab/gald, GradualWarmup->cosine per-epoch for pranet, warmup-cosine
per-epoch for attn.  Head modules get their 10x multiplier through
``spec.lr_mults``.
"""

from __future__ import annotations

import functools
from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from .. import losses
from ..ops import resize_bilinear
from .schedules import (
    gradual_warmup_cosine_lr,
    poly_lr,
    step_decay_lr,
    warmup_cosine_lr,
)
from .segmentor import Segmentor
from .state import TrainState, apply_updates, make_optimizer


def make_family_loss(spec, num_classes: int, ignore_label: int = 255) -> Callable:
    fam = spec.family

    if fam == "deeplab":
        def loss_fn(outputs, label):
            return losses.cross_entropy(outputs[0], label, ignore_label)
    elif fam == "gald":
        def loss_fn(outputs, label):
            out5, out4, out3, out2 = outputs
            return (losses.cross_entropy(out2, label, ignore_label) * 1.0
                    + losses.cross_entropy(out3, label, ignore_label) * 0.8
                    + losses.cross_entropy(out4, label, ignore_label) * 0.6
                    + losses.cross_entropy(out5, label, ignore_label) * 0.4)
    elif fam == "pranet":
        def loss_fn(outputs, label):
            # label: [B,H,W] {0,1} -> [B,H,W,1] float mask
            mask = label[..., None].astype(jnp.float32)
            return sum(losses.structure_loss(o, mask) for o in outputs)
    elif fam in ("attn", "attnwrap"):
        def loss_fn(outputs, label):
            onehot = jax.nn.one_hot(label, num_classes, dtype=jnp.float32)
            total = jnp.float32(0)
            for out in outputs:  # scales 1, 1/2, 1/4, 1/8, 1/16
                scaled = resize_bilinear(onehot, out.shape[1:3])
                total = total + 0.5 * losses.tversky_loss(out, scaled) \
                              + 0.5 * losses.bce_with_logits(out, scaled)
            return total
    else:
        raise NotImplementedError(fam)
    return loss_fn


def make_lr_schedule(spec, cfg, steps_per_epoch: int) -> Callable:
    """lr(iteration, epoch0) with epoch0 = 0-based epoch (torch scheduler
    convention: LR during epoch N uses last_epoch = N-1).

    Family dispatch comes FIRST: the reference pranet/attn trainers hardcode
    their schedules (pranet_trainer.py GradualWarmup->cosine,
    attn_trainer.py CosineAnnealingWarmup) regardless of SOLVER.LR_METHOD —
    the config default "poly" must not override them.  (A poly schedule fed
    pranet's 3-optimizer-steps-per-batch iteration count overruns max_iter
    and 'negative**0.9' is NaN — caught by the family learning tests.)"""
    fam = spec.family
    base = cfg.SOLVER.BASE_LR
    method = cfg.SOLVER.LR_METHOD
    # TPU-recipe wrappers (SOLVER.LR_BATCH_REF / WARMUP_ITERS, off by
    # default): linear LR scaling for batch sizes above the reference
    # recipe, and an iteration-granular warmup ramp on top of whatever the
    # family dispatches.  Scale the BASE before building the schedule so
    # per-epoch warmup/cosine targets scale too.
    ref_batch = int(getattr(cfg.SOLVER, "LR_BATCH_REF", 0) or 0)
    if ref_batch > 0:
        base = base * cfg.SOLVER.BATCH_SIZE / ref_batch
    if fam == "pranet":
        sched = lambda it, ep0: gradual_warmup_cosine_lr(base, ep0)
    elif fam in ("attn", "attnwrap"):
        sched = lambda it, ep0: warmup_cosine_lr(base, ep0)
    elif method == "poly":
        max_iter = cfg.SOLVER.EPOCHS * steps_per_epoch
        sched = lambda it, ep0: poly_lr(base, it, max_iter,
                                        cfg.SOLVER.LR_POWER)
    elif method == "step":
        sched = lambda it, ep0: step_decay_lr(base, ep0,
                                              cfg.SOLVER.DECAY_RATE,
                                              cfg.SOLVER.DECAY_EPOCH)
    else:
        raise NotImplementedError(method)
    warmup_iters = int(getattr(cfg.SOLVER, "WARMUP_ITERS", 0) or 0)
    if warmup_iters <= 0:
        return sched
    return lambda it, ep0: sched(it, ep0) * jnp.minimum(
        1.0, (it + 1.0) / warmup_iters)


def make_optimizers(spec, cfg) -> Dict[str, Any]:
    fam = spec.family
    txs = {}
    for name in spec.modules:
        if spec.optimizer == "sgd":
            txs[name] = make_optimizer("sgd", momentum=cfg.SOLVER.MOMENTUM,
                                       weight_decay=cfg.SOLVER.WEIGHT_DECAY)
        else:
            wd = cfg.SOLVER.WEIGHT_DECAY if fam in ("attn", "attnwrap") else 0.0
            txs[name] = make_optimizer("adam", weight_decay=wd)
    return txs


def remat_wrap(compute_loss: Callable, cfg) -> Callable:
    """Apply ``SOLVER.REMAT`` rematerialization to a to-be-differentiated
    loss closure — the TPU memory-for-FLOPs lever (HBM is the bottleneck;
    recomputing the forward during backward frees all saved activations).

    Modes: ``none`` (save everything, XLA default), ``full``
    (``jax.checkpoint`` with nothing saveable — max memory savings, one
    extra forward of FLOPs), ``dots`` (matmul/conv results saveable —
    elementwise/BN intermediates recompute, MXU work does not).  Composes
    with ``SOLVER.ACCUM_STEPS`` (each microbatch rematerializes).  No torch
    counterpart in the reference (torch.utils.checkpoint unused there)."""
    mode = str(cfg.SOLVER.REMAT).lower()
    if mode in ("none", "", "0", "false"):
        return compute_loss
    if mode == "full":
        policy = None
    elif mode == "dots":
        policy = jax.checkpoint_policies.dots_with_no_batch_dims_saveable
    else:
        raise ValueError(f"SOLVER.REMAT must be none|full|dots, got {mode!r}")
    return jax.checkpoint(compute_loss, policy=policy)


def make_src_train_step(segmentor: Segmentor, cfg, steps_per_epoch: int,
                        base_rng: Optional[jax.Array] = None,
                        jit: bool = True) -> Callable:
    """Returns step(state, batch, epoch0) -> (state, metrics).

    batch: {"image": [B,H,W,3] float, "label": [B,H,W] int}
    """
    spec = segmentor.spec
    loss_fn = make_family_loss(spec, cfg.MODEL.NUM_CLASSES, cfg.INPUT.IGNORE_LABEL)
    lr_sched = make_lr_schedule(spec, cfg, steps_per_epoch)
    txs = make_optimizers(spec, cfg)
    grad_clip = cfg.SOLVER.GRAD_CLIP or (0.5 if spec.family == "pranet" else 0.0)
    if base_rng is None:
        base_rng = jax.random.PRNGKey(cfg.SEED)

    compute_dtype = jnp.dtype(cfg.MODEL.DTYPE)
    accum = max(int(cfg.SOLVER.ACCUM_STEPS), 1)

    def step_fn(state: TrainState, batch, epoch0):
        x = batch["image"].astype(compute_dtype)
        label = batch["label"]
        rngs = {"dropout": jax.random.fold_in(base_rng, state.step)}
        params = {n: m.params for n, m in state.modules.items()}

        def loss_on(params, stats, xs, ys):
            def compute_loss(params):
                outputs, new_stats, _ = segmentor.forward(
                    params, stats, xs, label_size=ys.shape[1:3],
                    train=True, rngs=rngs)
                return loss_fn(outputs, ys), new_stats
            return jax.value_and_grad(
                remat_wrap(compute_loss, cfg), has_aux=True)(params)

        if accum == 1:
            stats = {n: m.stats for n, m in state.modules.items()}
            (loss, new_stats), grads = loss_on(params, stats, x, label)
        else:
            # microbatch scan: grads averaged, BN stats chained (the reference
            # semantics of a bigger batch, at 1/accum the activation memory)
            b = x.shape[0] // accum
            xs = x[: b * accum].reshape(accum, b, *x.shape[1:])
            ys = label[: b * accum].reshape(accum, b, *label.shape[1:])

            def body(carry, mb):
                stats_c, grads_c, loss_c = carry
                (l, new_stats), g = loss_on(params, stats_c, mb[0], mb[1])
                grads_c = jax.tree.map(lambda a, bb: a + bb, grads_c, g)
                return (new_stats, grads_c, loss_c + l), None

            zero_grads = jax.tree.map(jnp.zeros_like, params)
            stats0 = {n: m.stats for n, m in state.modules.items()}
            (new_stats, grads, loss), _ = jax.lax.scan(
                body, (stats0, zero_grads, jnp.float32(0)), (xs, ys))
            grads = jax.tree.map(lambda g: g / accum, grads)
            loss = loss / accum

        lr = lr_sched(state.step.astype(jnp.float32), epoch0)
        new_modules = {}
        for name, mstate in state.modules.items():
            mstate = mstate.replace(stats=new_stats[name])
            new_modules[name] = apply_updates(
                mstate, grads[name], txs[name],
                lr * spec.lr_mults[name], grad_clip=grad_clip)
        new_state = TrainState(modules=new_modules, step=state.step + 1)
        metrics = {"loss": loss, "lr": lr}
        return new_state, metrics

    if jit:
        return jax.jit(step_fn, donate_argnums=0)
    return step_fn


def wrap_step_checkify(step_fn: Callable) -> Callable:
    """DEBUG.CHECKIFY sanitizer (SURVEY §5; reference train_distill.py:63
    ``set_detect_anomaly``): functionalize float checks (NaN/Inf/div-by-zero)
    over the whole compiled step and raise host-side with the offending op's
    source location.  Debug mode — adds checks to every float op."""
    from jax.experimental import checkify

    checked = checkify.checkify(step_fn, errors=checkify.float_checks)

    def step(*args, **kwargs):
        err, out = checked(*args, **kwargs)
        err.throw()
        return out

    return step
