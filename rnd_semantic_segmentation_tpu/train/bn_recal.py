"""SWA-style BatchNorm re-estimation (``torch.optim.swa_utils.update_bn``
analog).

Why it exists: short training runs from random init leave BN *running*
statistics far from the batch statistics the model was actually trained
with — the EfficientNet encoder keeps the reference library's momentum of
0.01 (efficientnet.py), so after N steps its running stats are only
``1-0.99^N`` converged.  Train-mode forward is then near-perfect while
eval-mode (running stats) collapses.  The reference never hits this because
its encoders ship ImageNet-pretrained running stats; anyone training from
scratch does.

How it works, TPU-style (no Python-level module surgery):

  * In train mode every ``BatchNorm`` normalizes with the *batch* statistics
    of its input — the stored running stats do not influence activations.
    So the post-forward ``batch_stats`` update ``new = (1-m)*old + m*batch``
    exposes the exact per-batch statistics.
  * Feed **zeros** as the old running stats: ``new0 = m * batch``.
  * Feed **ones**: ``new1 = (1-m) + m * batch``.  Hence per-leaf momentum
    ``m = 1 - (new1 - new0)`` — recovered numerically, so mixed-momentum
    models (0.1 torch BN + 0.01 EfficientNet BN) need no bookkeeping.
  * Per batch k: ``batch_k = new0_k / m``; the recalibrated value is the
    plain average over batches — exactly ``update_bn``'s momentum=None
    cumulative average (including its average-of-batch-vars convention).

Only ``batch_stats`` collections are touched; ``frozen`` (FrozenBatchNorm
buffers) and any other collections pass through untouched — and they keep
their real values during the probe forwards (zeroing a no-eps frozen var
would make ``rsqrt(0)`` = inf).

Two jit-compiled forwards of the same shape as a train step + one per
calibration batch; no recompiles.
"""

from __future__ import annotations

from typing import Any, Dict, Iterable, Optional, Tuple

import jax
import jax.numpy as jnp


def _map_batch_stats(stats: Dict[str, Dict[str, Any]], fn) -> Dict[str, Dict[str, Any]]:
    """Apply ``fn`` leaf-wise to every ``batch_stats`` collection only."""
    return {name: {coll: (jax.tree.map(fn, tree) if coll == "batch_stats" else tree)
                   for coll, tree in colls.items()}
            for name, colls in stats.items()}


def recalibrate_batch_stats(segmentor, params: Dict[str, Any],
                            stats: Dict[str, Dict[str, Any]],
                            batches: Iterable[Any],
                            label_size: Optional[Tuple[int, int]] = None,
                            rng: Optional[jax.Array] = None) -> Dict[str, Dict[str, Any]]:
    """Return ``stats`` with every ``batch_stats`` leaf replaced by the
    average batch statistic over ``batches`` (images as [B,H,W,C] arrays or
    ``{"image": ...}`` dicts).  Leaves that a train-mode forward does not
    update (inferred momentum ~ 0) keep their original values."""
    if rng is None:
        rng = jax.random.PRNGKey(0)
    images = [(b["image"] if isinstance(b, dict) else b) for b in batches]
    if not images:
        return stats

    @jax.jit
    def fwd_stats(p, s, x):
        return segmentor.forward(p, s, x, label_size=label_size, train=True,
                                 rngs={"dropout": rng})[1]

    zeros = _map_batch_stats(stats, jnp.zeros_like)
    ones = _map_batch_stats(stats, jnp.ones_like)
    x0 = jnp.asarray(images[0])
    new0 = fwd_stats(params, zeros, x0)
    new1 = fwd_stats(params, ones, x0)

    def leaf_momentum(a, b):
        return 1.0 - (b - a)

    momentum = {n: jax.tree.map(leaf_momentum, dict(new0[n])["batch_stats"],
                                dict(new1[n])["batch_stats"])
                for n in new0 if "batch_stats" in dict(new0[n])}

    acc = {n: jax.tree.map(lambda v, m: v / jnp.maximum(m, 1e-6),
                           dict(new0[n])["batch_stats"], momentum[n])
           for n in momentum}
    for x in images[1:]:
        nk = fwd_stats(params, zeros, jnp.asarray(x))
        acc = {n: jax.tree.map(lambda a, v, m: a + v / jnp.maximum(m, 1e-6),
                               acc[n], dict(nk[n])["batch_stats"], momentum[n])
               for n in acc}
    k = float(len(images))
    mean_stats = {n: jax.tree.map(lambda a: a / k, acc[n]) for n in acc}

    def merged(name):
        colls = dict(stats[name])
        if name not in mean_stats or "batch_stats" not in colls:
            return colls
        # momentum ~ 0 => this leaf never updates in train mode; keep it
        colls["batch_stats"] = jax.tree.map(
            lambda old, new, m: jnp.where(m > 1e-3, new, old),
            colls["batch_stats"], mean_stats[name], momentum[name])
        return colls

    return {name: merged(name) for name in stats}
