"""Online (in-graph teacher) self-distillation step."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from rnd_semantic_segmentation_tpu.configs import get_default_cfg
from rnd_semantic_segmentation_tpu.models import build_segmentor
from rnd_semantic_segmentation_tpu.train import Segmentor, make_optimizers
from rnd_semantic_segmentation_tpu.train.distill import make_online_distill_step


def test_online_distill_learns_teacher(rng):
    cfg = get_default_cfg()
    cfg.MODEL.NAME = "deeplab_resnet18"
    cfg.MODEL.DTYPE = "float32"
    cfg.MODEL.NUM_CLASSES = 3
    cfg.MODEL.FREEZE_BN = True
    cfg.SOLVER.BASE_LR = 1e-4
    cfg.SOLVER.EPOCHS = 2
    spec = build_segmentor(cfg)
    seg = Segmentor(spec, 3)
    x = jnp.asarray(rng.rand(2, 32, 32, 3).astype(np.float32))

    teacher_vars = seg.init(jax.random.PRNGKey(7), x)
    t_params = {n: dict(v)["params"] for n, v in teacher_vars.items()}
    t_stats = {n: {k: c for k, c in dict(v).items() if k != "params"}
               for n, v in teacher_vars.items()}

    student_vars = seg.init(jax.random.PRNGKey(0), x)
    state = seg.make_states(student_vars, make_optimizers(spec, cfg))
    step = make_online_distill_step(seg, cfg, 10, t_params, t_stats,
                                    confidence_threshold=0.0)
    losses = []
    for _ in range(8):
        state, m = step(state, {"image": x}, jnp.float32(0))
        losses.append(float(m["loss"]))
    assert np.isfinite(losses).all()
    assert min(losses[1:]) < losses[0], losses


def test_confidence_threshold_produces_ignore(rng):
    cfg = get_default_cfg()
    cfg.MODEL.NAME = "deeplab_resnet18"
    cfg.MODEL.DTYPE = "float32"
    cfg.MODEL.NUM_CLASSES = 3
    cfg.MODEL.FREEZE_BN = True
    spec = build_segmentor(cfg)
    seg = Segmentor(spec, 3)
    x = jnp.asarray(rng.rand(2, 16, 16, 3).astype(np.float32))
    tv = seg.init(jax.random.PRNGKey(7), x)
    t_params = {n: dict(v)["params"] for n, v in tv.items()}
    t_stats = {n: {k: c for k, c in dict(v).items() if k != "params"}
               for n, v in tv.items()}
    sv = seg.init(jax.random.PRNGKey(0), x)
    state = seg.make_states(sv, make_optimizers(spec, cfg))
    # threshold 1.0: (almost) every pixel ignored -> finite loss, tiny grads
    step = make_online_distill_step(seg, cfg, 10, t_params, t_stats,
                                    confidence_threshold=0.999999)
    state, m = step(state, {"image": x}, jnp.float32(0))
    assert np.isfinite(float(m["loss"]))


def test_online_distill_cli_path(tmp_path):
    """train_distill --online end to end: teacher ckpt from a source run."""
    from rnd_semantic_segmentation_tpu.cli.train_distill import main as distill_main
    from rnd_semantic_segmentation_tpu.cli.train_src import main as src_main

    cfg = get_default_cfg()
    cfg.MODEL.NAME = "deeplab_resnet18"
    cfg.MODEL.DTYPE = "float32"
    cfg.MODEL.NUM_CLASSES = 3
    cfg.MODEL.FREEZE_BN = True
    cfg.DATASETS.SOURCE_TRAIN = "synthetic_train"
    cfg.DATASETS.TEST = "synthetic_val"
    cfg.AUG.NAME = "none"
    cfg.INPUT.SOURCE_INPUT_SIZE_TRAIN = (32, 32)
    cfg.SOLVER.BATCH_SIZE = 4
    cfg.SOLVER.BASE_LR = 1e-4
    cfg.SOLVER.EPOCHS = 1
    cfg.SOLVER.CHECKPOINT_PERIOD = 1
    cfg.OUTPUT_DIR = str(tmp_path)
    cfg.DATA_PIPE.NUM_WORKERS = 2
    src_main("teacher", cfg, 0)
    assert (tmp_path / "Aspp-1").exists()

    cfg2 = cfg.clone()
    cfg2.DISTILL.ONLINE = True
    cfg2.DISTILL.TEACHER = str(tmp_path / "Aspp-1")
    cfg2.DISTILL.CONFIDENCE_THRESHOLD = 0.5
    cfg2.OUTPUT_DIR = str(tmp_path / "student")
    import os
    os.makedirs(cfg2.OUTPUT_DIR, exist_ok=True)
    distill_main("student", cfg2, 0)
    assert (tmp_path / "student" / "Aspp-1").exists()


def _family_distill_setup(rng, name, nc, size):
    cfg = get_default_cfg()
    cfg.MODEL.NAME = name
    cfg.MODEL.DTYPE = "float32"
    cfg.MODEL.NUM_CLASSES = nc
    cfg.MODEL.FREEZE_BN = True
    cfg.SOLVER.BASE_LR = 1e-4
    cfg.SOLVER.EPOCHS = 2
    spec = build_segmentor(cfg)
    seg = Segmentor(spec, nc)
    x = jnp.asarray(rng.rand(2, size, size, 3).astype(np.float32))
    teacher_vars = seg.init(jax.random.PRNGKey(7), x)
    t_params = {n: dict(v)["params"] for n, v in teacher_vars.items()}
    t_stats = {n: {k: c for k, c in dict(v).items() if k != "params"}
               for n, v in teacher_vars.items()}
    student_vars = seg.init(jax.random.PRNGKey(0), x)
    state = seg.make_states(student_vars, make_optimizers(spec, cfg))
    return cfg, seg, state, t_params, t_stats, x


@pytest.mark.parametrize("name,nc,size", [
    ("pranet_res2net50", 2, 64),
    ("attn_efficientnet-b0", 2, 64),
])
def test_distill_step_other_families(rng, name, nc, size):
    """Round 5: distill is family-complete.  pranet's 1-channel sigmoid head
    needs the binary pseudo-label branch (softmax over one channel is
    constant — argmax pseudo-labels were all-zero garbage); attn flows
    through the softmax branch with its multiscale compound loss."""
    cfg, seg, state, t_params, t_stats, x = _family_distill_setup(
        rng, name, nc, size)
    step = make_online_distill_step(seg, cfg, 10, t_params, t_stats,
                                    confidence_threshold=0.0)
    losses = []
    for _ in range(4):
        state, m = step(state, {"image": x}, jnp.float32(0))
        losses.append(float(m["loss"]))
    assert np.isfinite(losses).all()
    assert min(losses[1:]) < losses[0], losses


def test_pranet_pseudo_labels_are_binary_not_constant(rng):
    """The degenerate-argmax regression: a 1-channel teacher must produce a
    thresholded {0,1} pseudo-mask with BOTH classes present for a generic
    random teacher, not the all-zero constant the softmax branch gave."""
    cfg, seg, state, t_params, t_stats, x = _family_distill_setup(
        rng, "pranet_res2net50", 2, 64)
    t_out, _, _ = seg.forward(t_params, t_stats, x, label_size=(64, 64),
                              train=False)
    p = jax.nn.sigmoid(np.asarray(t_out[-1], np.float32)[..., 0])
    pseudo = (p >= 0.5).astype(np.int32)
    assert 0 < pseudo.mean() < 1, pseudo.mean()  # both classes present
    # and the step consumes it without NaN
    step = make_online_distill_step(seg, cfg, 10, t_params, t_stats)
    state, m = step(state, {"image": x}, jnp.float32(0))
    assert np.isfinite(float(m["loss"]))


def test_confidence_threshold_rejected_for_nonce_families(rng):
    """pranet/attn losses carry no ignore-label mechanism — the combination
    must fail loudly at construction, not silently mistrain."""
    cfg, seg, state, t_params, t_stats, x = _family_distill_setup(
        rng, "pranet_res2net50", 2, 64)
    with pytest.raises(ValueError, match="pranet"):
        make_online_distill_step(seg, cfg, 10, t_params, t_stats,
                                 confidence_threshold=0.5)
