"""Orbax checkpoint save/restore roundtrip + latest-checkpoint discovery."""

import numpy as np

import jax
import jax.numpy as jnp

from rnd_semantic_segmentation_tpu.ckpt import (
    checkpoint_name,
    latest_checkpoint,
    load_checkpoint,
    save_checkpoint,
)
from rnd_semantic_segmentation_tpu.configs import get_default_cfg
from rnd_semantic_segmentation_tpu.models import build_segmentor
from rnd_semantic_segmentation_tpu.train import Segmentor, make_optimizers, make_src_train_step


def test_roundtrip_resume(tmp_path):
    cfg = get_default_cfg()
    cfg.MODEL.NAME = "deeplab_resnet18"
    cfg.MODEL.DTYPE = "float32"
    cfg.MODEL.NUM_CLASSES = 3
    cfg.SOLVER.BASE_LR = 1e-4
    spec = build_segmentor(cfg)
    seg = Segmentor(spec, 3)
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.rand(2, 32, 32, 3).astype(np.float32))
    y = jnp.asarray(rng.randint(0, 3, size=(2, 32, 32)).astype(np.int32))
    variables = seg.init(jax.random.PRNGKey(0), x)
    state = seg.make_states(variables, make_optimizers(spec, cfg))
    step = make_src_train_step(seg, cfg, steps_per_epoch=10)
    state, _ = step(state, {"image": x, "label": y}, jnp.float32(0))
    state, _ = step(state, {"image": x, "label": y}, jnp.float32(0))

    path = checkpoint_name(str(tmp_path), spec.ckpt_prefix, epoch=7)
    save_checkpoint(path, state, epoch=7)

    # fresh template
    variables2 = seg.init(jax.random.PRNGKey(42), x)
    state2 = seg.make_states(variables2, make_optimizers(spec, cfg))
    restored, start_epoch = load_checkpoint(path, state2)
    assert start_epoch == 8
    assert int(restored.step) == 2
    a = jax.tree.leaves(state.modules["classifier"].params)
    b = jax.tree.leaves(restored.modules["classifier"].params)
    for x1, x2 in zip(a, b):
        np.testing.assert_array_equal(np.asarray(x1), np.asarray(x2))
    # optimizer state restored too
    oa = jax.tree.leaves(state.modules["feature_extractor"].opt_state)
    ob = jax.tree.leaves(restored.modules["feature_extractor"].opt_state)
    for x1, x2 in zip(oa, ob):
        np.testing.assert_array_equal(np.asarray(x1), np.asarray(x2))


def test_latest_checkpoint_discovery(tmp_path):
    cfg = get_default_cfg()
    cfg.MODEL.NAME = "deeplab_resnet18"
    cfg.MODEL.DTYPE = "float32"
    cfg.MODEL.NUM_CLASSES = 2
    spec = build_segmentor(cfg)
    seg = Segmentor(spec, 2)
    x = jnp.zeros((1, 16, 16, 3), jnp.float32)
    variables = seg.init(jax.random.PRNGKey(0), x)
    state = seg.make_states(variables, make_optimizers(spec, cfg))
    for ep in (1, 5, 3):
        save_checkpoint(checkpoint_name(str(tmp_path), "Aspp", ep), state, ep)
    assert latest_checkpoint(str(tmp_path), "Aspp").endswith("Aspp-5")
    assert latest_checkpoint(str(tmp_path), "Gald") is None


def test_prune_checkpoints(tmp_path):
    from rnd_semantic_segmentation_tpu.ckpt.orbax_io import prune_checkpoints
    import os
    for ep in (1, 2, 3, 4):
        os.makedirs(tmp_path / f"Aspp-{ep}")
    os.makedirs(tmp_path / "Gald-1")
    prune_checkpoints(str(tmp_path), "Aspp", keep=2)
    left = sorted(os.listdir(tmp_path))
    assert left == ["Aspp-3", "Aspp-4", "Gald-1"]
    prune_checkpoints(str(tmp_path), "Aspp", keep=-1)  # keep all
    assert sorted(os.listdir(tmp_path)) == ["Aspp-3", "Aspp-4", "Gald-1"]
    prune_checkpoints(str(tmp_path), "Aspp", keep=0)  # delete all of prefix
    assert sorted(os.listdir(tmp_path)) == ["Gald-1"]


def test_keep1_retention_never_hits_zero(tmp_path):
    """The trainer's KEEP_CHECKPOINTS=1 sequence (prune to max(keep-1,1)
    BEFORE each save) must keep >=1 complete checkpoint on disk at every
    point — a preemption between prune and save-completion must never find
    an empty OUTPUT_DIR (the resume=latest recovery story depends on it)."""
    from rnd_semantic_segmentation_tpu.ckpt.orbax_io import prune_checkpoints
    import os

    keep = 1
    on_disk = lambda: [d for d in os.listdir(tmp_path) if d.startswith("Aspp-")]
    for epoch in (1, 2, 3):
        # trainer period: prune first ...
        prune_checkpoints(str(tmp_path), "Aspp", max(keep - 1, 1))
        if epoch > 1:
            assert len(on_disk()) >= 1, "zero-checkpoint preemption window"
        # ... then the (possibly async) save lands
        os.makedirs(tmp_path / f"Aspp-{epoch}")
    # retention settles at keep(+1 transiently for the KEEP=1 case)
    assert sorted(on_disk()) == ["Aspp-2", "Aspp-3"]
    prune_checkpoints(str(tmp_path), "Aspp", max(keep - 1, 1))
    assert on_disk() == ["Aspp-3"]


def test_async_save_roundtrip(tmp_path):
    """SOLVER.ASYNC_CHECKPOINT path: save with wait=False overlaps disk
    serialization; wait_for_checkpoints() (also called inside load) must
    finalize it and the restored state must match bit-for-bit."""
    from rnd_semantic_segmentation_tpu.ckpt.orbax_io import wait_for_checkpoints

    cfg = get_default_cfg()
    cfg.MODEL.NAME = "deeplab_resnet18"
    cfg.MODEL.DTYPE = "float32"
    cfg.MODEL.NUM_CLASSES = 3
    cfg.SOLVER.BASE_LR = 1e-4
    spec = build_segmentor(cfg)
    seg = Segmentor(spec, 3)
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.rand(2, 32, 32, 3).astype(np.float32))
    variables = seg.init(jax.random.PRNGKey(1), x)
    state = seg.make_states(variables, make_optimizers(spec, cfg))

    path = checkpoint_name(str(tmp_path), spec.ckpt_prefix, epoch=3)
    save_checkpoint(path, state, epoch=3, wait=False)
    wait_for_checkpoints()

    variables2 = seg.init(jax.random.PRNGKey(2), x)
    state2 = seg.make_states(variables2, make_optimizers(spec, cfg))
    restored, start_epoch = load_checkpoint(path, state2)
    assert start_epoch == 4
    a = jax.tree.leaves(state.modules["classifier"].params)
    b = jax.tree.leaves(restored.modules["classifier"].params)
    for x1, x2 in zip(a, b):
        np.testing.assert_array_equal(np.asarray(x1), np.asarray(x2))
