"""LR schedule parity vs the reference's scheduler math (adapt_lr.py).

The reference's torch subclasses can't even construct under torch 2.x (they
pass the removed ``verbose`` positional), so the oracle here simulates their
``get_lr`` recursions exactly (adapt_lr.py:19-45, 47-81): torch applies
``get_lr(last_epoch)`` after each ``step()``, and the LR used *during* epoch N
(1-indexed) is the value at last_epoch = N-1.
"""

import math

import numpy as np
import pytest

from rnd_semantic_segmentation_tpu.train.schedules import (
    gradual_warmup_cosine_lr,
    poly_lr,
    step_decay_lr,
    warmup_cosine_lr,
)

from torch_ref import load_ref_module


def _simulate_warmup_cosine(base_lr, t_max, warmup, epochs, eta_min=0.0):
    """adapt_lr.py:60-81 recursion."""
    lrs = []
    lr = None
    for last_epoch in range(epochs):
        offset = last_epoch - warmup
        if last_epoch < warmup:
            lr = base_lr * (last_epoch + 1) / warmup
        elif last_epoch == warmup:
            lr = base_lr
        elif (offset - 1 - t_max) % (2 * t_max) == 0:
            lr = lr + (base_lr - eta_min) * (1 - math.cos(math.pi / t_max)) / 2
        else:
            lr = ((1 + math.cos(math.pi * offset / t_max))
                  / (1 + math.cos(math.pi * (offset - 1) / t_max))
                  * (lr - eta_min) + eta_min)
        lrs.append(lr)
    return lrs


def _simulate_gradual_warmup(base_lr, multiplier, total, t_max, epochs):
    """adapt_lr.py:19-45 + torch CosineAnnealingLR closed form after warmup."""
    lrs = []
    for last_epoch in range(epochs):
        if last_epoch <= total:
            lrs.append(base_lr * ((multiplier - 1.0) * last_epoch / total + 1.0))
        else:
            # after_scheduler stepped with epoch - total; base_lrs scaled by mult
            inner = last_epoch - total
            target = base_lr * multiplier
            lrs.append(target * (1 + math.cos(math.pi * inner / t_max)) / 2)
    return lrs


def test_poly_matches_reference():
    adapt_lr = load_ref_module("core/utils/adapt_lr.py", "ref_adapt_lr")
    for it in (0, 10, 500, 9999):
        ours = float(poly_lr(2.5e-4, it, 10000, 0.9))
        ref = adapt_lr.adjust_learning_rate("poly", 2.5e-4, it, 10000, 0.9)
        assert abs(ours - ref) < 1e-12


def test_warmup_cosine_matches_recursion():
    base = 1e-3
    ref = _simulate_warmup_cosine(base, t_max=50, warmup=5, epochs=56)
    for ep0, r in enumerate(ref):
        ours = float(warmup_cosine_lr(base, ep0, t_max=50, warmup_epochs=5))
        assert abs(ours - r) < 1e-9, (ep0, ours, r)


def test_gradual_warmup_matches_recursion():
    base = 1e-4 / 8
    ref = _simulate_gradual_warmup(base, multiplier=8, total=5, t_max=100,
                                   epochs=40)
    for ep0, r in enumerate(ref):
        ours = float(gradual_warmup_cosine_lr(base, ep0, multiplier=8,
                                              total_epoch=5, t_max=100))
        assert abs(ours - r) < 1e-9, (ep0, ours, r)


def test_step_decay():
    # adjust_lr semantics: rate^(epoch // decay_epoch) (adapt_lr.py:7-10)
    assert float(step_decay_lr(1.0, 0, 0.1, 30)) == 1.0
    assert abs(float(step_decay_lr(1.0, 30, 0.1, 30)) - 0.1) < 1e-12
    assert abs(float(step_decay_lr(1.0, 65, 0.1, 30)) - 0.01) < 1e-12


def test_family_dispatch_overrides_default_method():
    """Regression: pranet/attn must get their reference-trainer schedules
    even under the default SOLVER.LR_METHOD="poly" (the old dispatch let
    "poly" shadow them; pranet's 3-optimizer-steps-per-batch loop then
    overran max_iter and negative**0.9 poisoned the whole run with NaNs)."""
    from rnd_semantic_segmentation_tpu.configs import get_default_cfg
    from rnd_semantic_segmentation_tpu.train.steps import make_lr_schedule

    class _Spec:
        def __init__(self, family):
            self.family = family

    cfg = get_default_cfg()
    assert cfg.SOLVER.LR_METHOD == "poly"
    cfg.SOLVER.BASE_LR = 1e-3
    cfg.SOLVER.EPOCHS = 4
    steps_per_epoch = 4

    # pranet: epoch-based gradual warmup — iteration-independent, and still
    # finite/fixed far past EPOCHS*steps_per_epoch optimizer steps
    sched = make_lr_schedule(_Spec("pranet"), cfg, steps_per_epoch)
    assert abs(float(sched(0, 0.0)) - 1e-3) < 1e-9
    assert float(sched(48, 1.0)) > float(sched(0, 0.0))  # warming up
    assert np.isfinite(float(sched(100, 3.0)))

    # attn: warmup-cosine, also epoch-based
    sched = make_lr_schedule(_Spec("attn"), cfg, steps_per_epoch)
    assert abs(float(sched(0, 0.0)) - 1e-3 / 5) < 1e-9  # epoch 1 of 5 warmup

    # deeplab keeps poly, and poly clamps at zero past max_iter (no NaN)
    sched = make_lr_schedule(_Spec("deeplab"), cfg, steps_per_epoch)
    assert float(sched(16, 0.0)) == 0.0
    assert np.isfinite(float(sched(48, 0.0)))
