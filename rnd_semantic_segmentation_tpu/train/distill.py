"""Self-distillation train steps.

Two modes:
  * Offline (the reference's working recipe): pseudo-label PNGs exported by
    ``test.py --saveres`` feed a plain CE loop via the self-distill dataset —
    handled by the ordinary Trainer (cli/train_distill.py).
  * Online (TPU-native extension, per the north-star: "the self-distillation
    teacher living in the same XLA graph"): a frozen teacher forward runs
    inside the jitted step, its argmax becomes the student's target (with an
    optional confidence threshold mapping low-confidence pixels to
    ignore_label).  No filesystem round trip, no stale pseudo-labels.
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Optional

import jax
import jax.numpy as jnp

from .. import losses
from .segmentor import Segmentor
from .state import TrainState, apply_updates
from .steps import (make_family_loss, make_lr_schedule, make_optimizers,
                    remat_wrap)


def make_online_distill_step(segmentor: Segmentor, cfg, steps_per_epoch: int,
                             teacher_params: Dict[str, Any],
                             teacher_stats: Dict[str, Any],
                             confidence_threshold: float = 0.0,
                             base_rng: Optional[jax.Array] = None,
                             jit: bool = True) -> Callable:
    """step(state, batch, epoch0) -> (state, metrics); teacher is closed over
    (constant weights folded into the executable)."""
    spec = segmentor.spec
    if confidence_threshold > 0 and spec.family in ("pranet", "attn",
                                                    "attnwrap"):
        # pranet's structure_loss consumes a {0,1} float mask with no
        # ignore-index channel (255 would poison the loss); attn's
        # Tversky+BCE one-hots the label, so IGNORE_LABEL becomes an
        # all-zero target — a real "no class" supervision signal, not an
        # ignore.  Only the CE families (deeplab/gald) can drop pixels.
        raise ValueError(
            f"DISTILL.CONFIDENCE_THRESHOLD is not supported for the "
            f"{spec.family} family: its loss has no ignore-label mechanism")
    loss_fn = make_family_loss(spec, cfg.MODEL.NUM_CLASSES, cfg.INPUT.IGNORE_LABEL)
    lr_sched = make_lr_schedule(spec, cfg, steps_per_epoch)
    txs = make_optimizers(spec, cfg)
    ignore = cfg.INPUT.IGNORE_LABEL
    if base_rng is None:
        base_rng = jax.random.PRNGKey(cfg.SEED)
    compute_dtype = jnp.dtype(cfg.MODEL.DTYPE)

    teacher_params = jax.lax.stop_gradient(teacher_params)

    def step_fn(state: TrainState, batch, epoch0):
        x = batch["image"].astype(compute_dtype)
        stats = {n: m.stats for n, m in state.modules.items()}
        rngs = {"dropout": jax.random.fold_in(base_rng, state.step)}

        # teacher pseudo-labels, in-graph (no mutation of teacher stats)
        t_outputs, _, _ = segmentor.forward(
            teacher_params, teacher_stats, x,
            label_size=x.shape[1:3], train=False)
        t_logits = t_outputs[-1] if spec.family in ("gald", "pranet") else t_outputs[0]
        if t_logits.shape[-1] == 1:
            # 1-channel sigmoid heads (pranet): softmax over a single channel
            # is constant, so argmax pseudo-labels would be all-zero garbage.
            # Binary extension mirroring fada.py _soft_label: sigmoid ->
            # threshold at 0.5; confidence = the winning class probability
            # max(p, 1-p), consistent with the softmax branch's max-prob.
            p = jax.nn.sigmoid(t_logits[..., 0].astype(jnp.float32))
            pseudo = (p >= 0.5).astype(jnp.int32)
            conf = jnp.maximum(p, 1.0 - p)
        else:
            t_probs = jax.nn.softmax(t_logits.astype(jnp.float32), axis=-1)
            pseudo = jnp.argmax(t_probs, axis=-1).astype(jnp.int32)
            conf = jnp.max(t_probs, axis=-1)
        if confidence_threshold > 0:
            pseudo = jnp.where(conf >= confidence_threshold, pseudo, ignore)
        pseudo = jax.lax.stop_gradient(pseudo)

        def compute_loss(params):
            outputs, new_stats, _ = segmentor.forward(
                params, stats, x, label_size=pseudo.shape[1:3],
                train=True, rngs=rngs)
            return loss_fn(outputs, pseudo), new_stats

        params = {n: m.params for n, m in state.modules.items()}
        (loss, new_stats), grads = jax.value_and_grad(
            remat_wrap(compute_loss, cfg), has_aux=True)(params)
        lr = lr_sched(state.step.astype(jnp.float32), epoch0)
        new_modules = {}
        for name, m in state.modules.items():
            m = m.replace(stats=new_stats[name])
            new_modules[name] = apply_updates(m, grads[name], txs[name],
                                              lr * spec.lr_mults[name])
        return (TrainState(modules=new_modules, step=state.step + 1),
                {"loss": loss, "lr": lr})

    if jit:
        return jax.jit(step_fn, donate_argnums=0)
    return step_fn
