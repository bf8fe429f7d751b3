"""Train state pytrees + torch-semantics optimizers.

The reference keeps a *separate optimizer per model part* with its own LR
(classifier/decoder at 10x backbone — aspp_trainer.py:25-26,
gald_trainer.py:23-24, attn_trainer.py:23-24); checkpoints are keyed by part
(aspp_trainer.py:46-55).  We mirror that: ``TrainState.modules`` is a dict of
per-part ``ModuleState`` so checkpoint layout and LR scaling are structural.

Optimizer transforms reproduce torch exactly:
  * SGD(momentum, weight_decay): g += wd*p; v = mu*v + g; p -= lr*v
  * Adam(betas, eps[, weight_decay as L2]): bias-corrected moments like torch
LR is injected per step (the reference rewrites param_group['lr'] every
iteration — aspp_trainer.py:78-81), so transforms exclude the LR scale and the
step applies ``-lr_mult * lr * update``.
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from flax import struct
from flax.core import FrozenDict


class ModuleState(struct.PyTreeNode):
    params: Any
    stats: Any          # non-trainable collections: batch_stats / frozen
    opt_state: Any


class TrainState(struct.PyTreeNode):
    modules: Dict[str, ModuleState]
    step: jnp.ndarray   # int32 global iteration counter


def make_optimizer(kind: str, momentum: float = 0.9, weight_decay: float = 0.0,
                   betas: Tuple[float, float] = (0.9, 0.999),
                   eps: float = 1e-8) -> optax.GradientTransformation:
    """LR-less transform chain matching torch optimizer math."""
    chain = []
    if weight_decay:
        chain.append(optax.add_decayed_weights(weight_decay))
    if kind == "sgd":
        if momentum:
            chain.append(optax.trace(decay=momentum, nesterov=False))
    elif kind == "adam":
        chain.append(optax.scale_by_adam(b1=betas[0], b2=betas[1], eps=eps))
    else:
        raise NotImplementedError(kind)
    return optax.chain(*chain) if chain else optax.identity()


def split_variables(variables) -> Tuple[Any, Any]:
    """Split an init() result into (params, non-trainable stats)."""
    variables = dict(variables)
    params = variables.pop("params", {})
    return params, variables


def apply_updates(module_state: ModuleState, grads, tx: optax.GradientTransformation,
                  lr, grad_clip: float = 0.0) -> ModuleState:
    """One optimizer step with per-iteration LR (and torch-style elementwise
    grad clamp, core/utils/utils.py:6-16, when grad_clip > 0)."""
    if grad_clip:
        grads = jax.tree.map(lambda g: jnp.clip(g, -grad_clip, grad_clip), grads)
    updates, new_opt = tx.update(grads, module_state.opt_state, module_state.params)
    new_params = jax.tree.map(
        lambda p, u: (p - lr * u).astype(p.dtype), module_state.params, updates)
    return module_state.replace(params=new_params, opt_state=new_opt)
