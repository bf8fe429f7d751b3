"""TPU recipe knobs + shipped *_tpu.yaml configs (VERDICT r4 item 1).

Round 4 measured the wins (BENCH_BATCH_SCALE/BENCH_HOST/PROBE_REMAT.json) but
shipped reference-recipe defaults; round 5 ships them as per-family
``configs/*_tpu.yaml`` variants.  The LR side: SOLVER.LR_BATCH_REF applies
the linear scaling rule (lr *= BATCH_SIZE/LR_BATCH_REF) and
SOLVER.WARMUP_ITERS an iteration-granular linear ramp on top of whatever
schedule the family dispatches (train/steps.py make_lr_schedule).  Both
default off — the reference-recipe YAMLs are bit-identical in behavior.
"""

import glob
import os

import numpy as np
import pytest

from rnd_semantic_segmentation_tpu.configs import get_default_cfg
from rnd_semantic_segmentation_tpu.models import build_segmentor
from rnd_semantic_segmentation_tpu.train.steps import make_lr_schedule

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _sched(name, **solver):
    cfg = get_default_cfg()
    cfg.MODEL.NAME = name
    for k, v in solver.items():
        setattr(cfg.SOLVER, k, v)
    spec = build_segmentor(cfg)
    return make_lr_schedule(spec, cfg, steps_per_epoch=100), cfg


def test_defaults_change_nothing():
    base, _ = _sched("deeplab_resnet101", BASE_LR=0.02, BATCH_SIZE=16)
    knobbed, _ = _sched("deeplab_resnet101", BASE_LR=0.02, BATCH_SIZE=16,
                        LR_BATCH_REF=0, WARMUP_ITERS=0)
    for it, ep in [(0, 0), (50, 0), (499, 4)]:
        assert float(base(it, ep)) == float(knobbed(it, ep))


def test_linear_scaling_rule():
    base, _ = _sched("deeplab_resnet101", BASE_LR=0.02, BATCH_SIZE=16)
    scaled, _ = _sched("deeplab_resnet101", BASE_LR=0.02, BATCH_SIZE=64,
                       LR_BATCH_REF=16)
    for it in [0.0, 100.0, 400.0]:
        assert float(scaled(it, 0)) == pytest.approx(4.0 * float(base(it, 0)))


def test_linear_scaling_applies_to_family_hardcoded_schedules():
    """attn/pranet dispatch their reference schedules regardless of
    LR_METHOD; the scaling rule must reach them too (the recipe raises the
    batch for exactly those families)."""
    base, _ = _sched("attn_efficientnet-b2", BASE_LR=1e-3, BATCH_SIZE=20)
    scaled, _ = _sched("attn_efficientnet-b2", BASE_LR=1e-3, BATCH_SIZE=128,
                       LR_BATCH_REF=20)
    for ep in [0, 3, 20]:
        assert float(scaled(0, ep)) == pytest.approx(
            6.4 * float(base(0, ep)), rel=1e-6)


def test_warmup_ramp():
    sched, _ = _sched("deeplab_resnet101", BASE_LR=0.02, BATCH_SIZE=16,
                      LR_METHOD="step", WARMUP_ITERS=100)
    flat, _ = _sched("deeplab_resnet101", BASE_LR=0.02, BATCH_SIZE=16,
                     LR_METHOD="step")
    # linear ramp: (it+1)/100 of the underlying schedule, saturating at 1
    assert float(sched(0, 0)) == pytest.approx(0.01 * float(flat(0, 0)))
    assert float(sched(49, 0)) == pytest.approx(0.5 * float(flat(49, 0)))
    assert float(sched(99, 0)) == pytest.approx(float(flat(99, 0)))
    assert float(sched(500, 0)) == pytest.approx(float(flat(500, 0)))
    # monotone non-decreasing through the ramp
    ramp = [float(sched(i, 0)) for i in range(120)]
    assert all(b >= a for a, b in zip(ramp, ramp[1:]))


def test_warmup_composes_with_poly():
    sched, cfg = _sched("deeplab_resnet101", BASE_LR=0.02, BATCH_SIZE=16,
                        WARMUP_ITERS=10, EPOCHS=5)
    # past the ramp, poly decay still applies
    max_iter = cfg.SOLVER.EPOCHS * 100
    expect = 0.02 * (1 - 250 / max_iter) ** cfg.SOLVER.LR_POWER
    assert float(sched(250.0, 0)) == pytest.approx(expect, rel=1e-6)


def test_tpu_recipe_yamls_merge_and_declare_the_wins():
    paths = sorted(glob.glob(os.path.join(REPO, "configs", "*_tpu.yaml")))
    assert len(paths) == 4, paths  # one per family
    seen_families = set()
    for p in paths:
        cfg = get_default_cfg()
        cfg.merge_from_file(p)
        seen_families.add(cfg.MODEL.NAME.split("_")[0])
        # every TPU recipe ships the host-pipeline wins
        assert cfg.DATA_PIPE.NATIVE_DECODE, p
        assert cfg.DATA_PIPE.WORKER_PROCESSES > 0, p
        assert cfg.SOLVER.ASYNC_CHECKPOINT, p
        # the model string must resolve through the registry
        build_segmentor(cfg)
    assert seen_families == {"deeplab", "gald", "pranet", "attn"}


def test_attn_tpu_recipe_matches_the_measured_win():
    cfg = get_default_cfg()
    cfg.merge_from_file(os.path.join(REPO, "configs",
                                     "attn_src_kvasir_tpu.yaml"))
    # BENCH_BATCH_SCALE.json: 2.29x at b128; LR follows the linear rule from
    # the reference recipe's b20 with an iteration warmup
    assert cfg.SOLVER.BATCH_SIZE == 128
    assert cfg.SOLVER.LR_BATCH_REF == 20
    assert cfg.SOLVER.WARMUP_ITERS > 0
    assert cfg.DATA_PIPE.DEVICE_AUG
    spec = build_segmentor(cfg)
    sched = make_lr_schedule(spec, cfg, steps_per_epoch=10)
    # effective peak LR: 1e-3 * 128/20 = 6.4e-3, reached after warmup at the
    # warmup_cosine plateau epoch (epoch >= warmup_epochs)
    lr = float(sched(1000.0, 6))
    assert lr == pytest.approx(
        6.4e-3 * (1 + np.cos(np.pi * 1 / 50)) / 2, rel=1e-5)
