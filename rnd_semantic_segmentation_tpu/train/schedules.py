"""LR schedules (pure functions usable inside jit).

Semantics from /root/reference/core/utils/adapt_lr.py:
  * poly — ``base * (1 - iter/max_iter)^power`` per iteration (:12-17), the
    default LR_METHOD for aspp/gald/fada loops.
  * step decay — ``lr *= rate^(epoch//decay_epoch)`` (:7-10).
  * CosineAnnealingWarmupLR — linear warmup (epoch+1)/warmup for
    epoch<warmup, then closed-form cosine annealing with period T_max (:47-81;
    the torch recursion telescopes to the closed form).
  * GradualWarmupScheduler — lr scaled by ((mult-1)*epoch/total + 1) during
    warmup, then an inner schedule on base*mult (:19-45); PraNet chains it
    into CosineAnnealingLR(T_max=100) (pranet_trainer.py:99-100).

All schedules take the float step/epoch and return the LR; they work with
Python floats and traced jnp scalars alike.
"""

from __future__ import annotations

import math
from typing import Callable

import jax.numpy as jnp


def poly_lr(base_lr: float, iteration, max_iter: int, power: float = 0.9):
    # clamp: an iteration count past max_iter (resumes, multi-step-per-batch
    # loops) must floor at 0, not produce NaN via negative**0.9.  Python
    # scalars stay in f64 (the parity oracle compares at 1e-12).
    frac = 1.0 - iteration / max_iter
    if isinstance(frac, (int, float)):
        return base_lr * max(frac, 0.0) ** power
    return base_lr * jnp.maximum(frac, 0.0) ** power


def step_decay_lr(base_lr: float, epoch, decay_rate: float = 0.1,
                  decay_epoch: int = 30):
    return base_lr * decay_rate ** (epoch // decay_epoch)


def warmup_cosine_lr(base_lr: float, epoch, t_max: int = 50,
                     warmup_epochs: int = 5, eta_min: float = 0.0):
    """CosineAnnealingWarmupLR closed form (per-epoch schedule)."""
    warm = base_lr * (epoch + 1) / warmup_epochs
    offset = epoch - warmup_epochs
    cos = eta_min + (base_lr - eta_min) * (1 + jnp.cos(jnp.pi * offset / t_max)) / 2
    return jnp.where(epoch < warmup_epochs, warm, cos)


def gradual_warmup_cosine_lr(base_lr: float, epoch, multiplier: float = 8.0,
                             total_epoch: int = 5, t_max: int = 100,
                             eta_min: float = 0.0):
    """GradualWarmupScheduler(mult, total) -> CosineAnnealingLR(t_max)."""
    warm = base_lr * ((multiplier - 1.0) * epoch / total_epoch + 1.0)
    target = base_lr * multiplier
    offset = epoch - total_epoch
    cos = eta_min + (target - eta_min) * (1 + jnp.cos(jnp.pi * offset / t_max)) / 2
    return jnp.where(epoch <= total_epoch, warm, cos)


def build_lr_schedule(cfg, steps_per_epoch: int) -> Callable:
    """Returns lr(iteration, epoch) from SOLVER config (LR_METHOD dispatch)."""
    method = cfg.SOLVER.LR_METHOD
    base = cfg.SOLVER.BASE_LR
    if method == "poly":
        max_iter = cfg.SOLVER.EPOCHS * steps_per_epoch
        return lambda it, ep: poly_lr(base, it, max_iter, cfg.SOLVER.LR_POWER)
    if method == "step":
        return lambda it, ep: step_decay_lr(base, ep, cfg.SOLVER.DECAY_RATE,
                                            cfg.SOLVER.DECAY_EPOCH)
    if method == "warmup_cosine":
        return lambda it, ep: warmup_cosine_lr(base, ep)
    if method == "gradual_warmup":
        return lambda it, ep: gradual_warmup_cosine_lr(base, ep)
    raise NotImplementedError(method)
