"""Explicit-collective data-parallel train step (shard_map + psum).

The default path lets GSPMD partition the jitted step (parallel/mesh.py).
This variant expresses the same program with explicit per-device code:
  * batch split over the 'data' mesh axis,
  * cross-replica BatchNorm statistics via ``lax.pmean`` inside the modules
    (the ``bn_axis_name`` attribute every model takes),
  * gradient all-reduce via ``lax.pmean`` before the optimizer update —
the literal TPU translation of DDP+SyncBN (reference train_distill.py:48-64).

Useful when hand-placing collectives matters (e.g. overlapping them with
compute) or when GSPMD's choices need overriding; numerically identical to
the GSPMD path (tests/test_shmap.py asserts it).
"""

from __future__ import annotations

from functools import partial
from typing import Callable, Optional

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
try:
    from jax import shard_map as _new_shard_map  # jax >= 0.9 (check_vma kwarg)

    def shard_map(f, mesh, in_specs, out_specs, check_rep=False):
        return _new_shard_map(f, mesh=mesh, in_specs=in_specs,
                              out_specs=out_specs, check_vma=check_rep)
except ImportError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map

from ..models.build import build_segmentor
from ..train.segmentor import Segmentor
from ..train.state import TrainState, apply_updates
from ..train.steps import make_family_loss, make_lr_schedule, make_optimizers


def make_shmap_train_step(cfg, mesh: Mesh, steps_per_epoch: int,
                          base_rng: Optional[jax.Array] = None) -> Callable:
    """Returns (segmentor, step) where step(state, batch, epoch0) runs the
    explicit shard_map program over mesh axis cfg.DIST.DATA_AXIS."""
    data_axis = cfg.DIST.DATA_AXIS
    spec = build_segmentor(cfg, bn_axis_name=data_axis)
    segmentor = Segmentor(spec, cfg.MODEL.NUM_CLASSES)
    loss_fn = make_family_loss(spec, cfg.MODEL.NUM_CLASSES, cfg.INPUT.IGNORE_LABEL)
    lr_sched = make_lr_schedule(spec, cfg, steps_per_epoch)
    txs = make_optimizers(spec, cfg)
    if base_rng is None:
        base_rng = jax.random.PRNGKey(cfg.SEED)
    compute_dtype = jnp.dtype(cfg.MODEL.DTYPE)

    def per_device(state: TrainState, image, label, epoch0):
        x = image.astype(compute_dtype)
        stats = {n: m.stats for n, m in state.modules.items()}
        rngs = {"dropout": jax.random.fold_in(base_rng, state.step)}

        def compute_loss(params):
            outputs, new_stats, _ = segmentor.forward(
                params, stats, x, label_size=label.shape[1:3],
                train=True, rngs=rngs)
            return loss_fn(outputs, label), new_stats

        params = {n: m.params for n, m in state.modules.items()}
        (loss, new_stats), grads = jax.value_and_grad(
            compute_loss, has_aux=True)(params)
        # explicit collectives: mean loss + grads over the data axis
        loss = lax.pmean(loss, data_axis)
        grads = lax.pmean(grads, data_axis)

        lr = lr_sched(state.step.astype(jnp.float32), epoch0)
        new_modules = {}
        for name, m in state.modules.items():
            m = m.replace(stats=new_stats[name])
            new_modules[name] = apply_updates(
                m, grads[name], txs[name], lr * spec.lr_mults[name])
        return TrainState(modules=new_modules, step=state.step + 1), loss

    step = shard_map(
        per_device, mesh=mesh,
        in_specs=(P(), P(data_axis), P(data_axis), P()),
        out_specs=(P(), P()),
        check_rep=False,
    )
    return segmentor, jax.jit(
        lambda state, batch, ep: step(state, batch["image"], batch["label"], ep),
        donate_argnums=0)
