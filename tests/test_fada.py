"""FADA adversarial step: runs, updates all three parties, losses finite."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from rnd_semantic_segmentation_tpu.configs import get_default_cfg
from rnd_semantic_segmentation_tpu.models import build_adversarial_discriminator, build_segmentor
from rnd_semantic_segmentation_tpu.train import Segmentor, make_optimizers
from rnd_semantic_segmentation_tpu.train.fada import (
    FadaState,
    init_disc_state,
    make_fada_train_step,
)


def _setup(name="deeplab_resnet18", nc=3, size=32):
    cfg = get_default_cfg()
    cfg.MODEL.NAME = name
    cfg.MODEL.DTYPE = "float32"
    cfg.MODEL.NUM_CLASSES = nc
    cfg.MODEL.FREEZE_BN = True
    cfg.SOLVER.BASE_LR = 1e-4
    cfg.SOLVER.BASE_LR_D = 1e-4
    cfg.SOLVER.EPOCHS = 2
    spec = build_segmentor(cfg)
    seg = Segmentor(spec, nc)
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.rand(2, size, size, 3).astype(np.float32))
    y = jnp.asarray(rng.randint(0, nc, size=(2, size, size)).astype(np.int32))
    variables = seg.init(jax.random.PRNGKey(0), x)
    seg_state = seg.make_states(variables, make_optimizers(spec, cfg))

    params = {n: m.params for n, m in seg_state.modules.items()}
    stats = {n: m.stats for n, m in seg_state.modules.items()}
    _, _, tap = seg.forward(params, stats, x, train=False)
    disc = build_adversarial_discriminator(cfg)
    disc_state = init_disc_state(disc, jax.random.PRNGKey(1),
                                 jnp.zeros(tap.shape, jnp.float32), cfg)
    state = FadaState(seg=seg_state, disc=disc_state)
    step = make_fada_train_step(seg, disc, cfg, steps_per_epoch=10)
    return state, step, {"image": x, "label": y}, {"image": x, "label": y}


def test_fada_step_runs_and_updates():
    state, step, src, tgt = _setup()
    # donate_argnums deletes the input buffers: snapshot to numpy first
    p_before = np.asarray(jax.tree.leaves(state.seg.modules["classifier"].params)[0])
    d_before = np.asarray(jax.tree.leaves(state.disc.params)[0])
    for _ in range(3):
        state, metrics = step(state, src, tgt, jnp.float32(0))
    for k in ("loss_seg", "loss_adv_tgt", "loss_D_src", "loss_D_tgt"):
        assert np.isfinite(float(metrics[k])), k
    # all parties actually moved
    p_after = np.asarray(jax.tree.leaves(state.seg.modules["classifier"].params)[0])
    d_after = np.asarray(jax.tree.leaves(state.disc.params)[0])
    assert not np.allclose(p_before, p_after)
    assert not np.allclose(d_before, d_after)
    assert int(state.seg.step) == 3


def test_fada_d_losses_reasonable():
    # with symmetric init the D losses start near -log softmax uniformity
    state, step, src, tgt = _setup()
    _, metrics = step(state, src, tgt, jnp.float32(0))
    assert 0.0 < float(metrics["loss_D_src"]) < 100.0
    assert 0.0 < float(metrics["loss_D_tgt"]) < 100.0


@pytest.mark.parametrize("name,nc,size", [
    # gald@224 is the non-slow suite's #3 offender (65 s, ROUND5.md)
    pytest.param("gald_hardnet68", 4, 224, marks=pytest.mark.slow),
    ("attn_efficientnet-b0", 2, 64),
    ("pranet_res2net50", 2, 64),
])
def test_fada_step_other_families(name, nc, size):
    """Family-specific FADA wiring: gald taps hardnetout[3] and uses the
    final decoder output for soft labels (gald_fada.py:110-119); attn taps
    reduction_5 with multiscale seg loss (attn_fada.py:97-121)."""
    state, step, src, tgt = _setup(name=name, nc=nc, size=size)
    for _ in range(2):
        state, metrics = step(state, src, tgt, jnp.float32(0))
    for k in ("loss_seg", "loss_adv_tgt", "loss_D_src", "loss_D_tgt"):
        assert np.isfinite(float(metrics[k])), k
