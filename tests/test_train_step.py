"""End-to-end train-step tests: every family's jitted step runs and learns.

Uses the reference's own 'debug-fixture' idea (every Dataset pins index=0 to
overfit one sample — kvasir.py:43-44) as the oracle: loss on a fixed batch
must drop over a handful of steps.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from rnd_semantic_segmentation_tpu.configs import get_default_cfg
from rnd_semantic_segmentation_tpu.models import build_segmentor
from rnd_semantic_segmentation_tpu.train import Segmentor, make_optimizers, make_src_train_step


def _setup(name, num_classes, size, base_lr=1e-3, batch=2):
    cfg = get_default_cfg()
    cfg.MODEL.NAME = name
    cfg.MODEL.DTYPE = "float32"
    cfg.MODEL.NUM_CLASSES = num_classes
    cfg.SOLVER.BASE_LR = base_lr
    cfg.SOLVER.EPOCHS = 2
    spec = build_segmentor(cfg)
    seg = Segmentor(spec, num_classes)
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.rand(batch, size, size, 3).astype(np.float32))
    y = jnp.asarray(rng.randint(0, num_classes, size=(batch, size, size)).astype(np.int32))
    variables = seg.init(jax.random.PRNGKey(0), x)
    txs = make_optimizers(spec, cfg)
    state = seg.make_states(variables, txs)
    step = make_src_train_step(seg, cfg, steps_per_epoch=10)
    return state, step, {"image": x, "label": y}


@pytest.mark.parametrize("name,nc,size,lr,steps", [
    ("deeplab_resnet18", 5, 32, 1e-4, 6),
    # gald's deep-supervised loss has a ~8-step BN transient before it drops
    # below step 0 — needs the longer horizon.  slow: 83 s on the 1-core
    # host (suite-budget split, ROUND5.md); gald learning is also covered by
    # the slow test_learning.py case
    pytest.param("gald_hardnet68", 4, 224, 1e-4, 10,
                 marks=pytest.mark.slow),
    ("pranet_res2net50", 2, 64, 1e-3, 6),
    ("attn_efficientnet-b0", 2, 64, 1e-3, 6),
])
def test_step_runs_and_learns(name, nc, size, lr, steps):
    state, step, batch = _setup(name, nc, size, base_lr=lr)
    losses = []
    for i in range(steps):
        state, metrics = step(state, batch, jnp.float32(0))
        losses.append(float(metrics["loss"]))
    assert np.isfinite(losses).all()
    assert min(losses[1:]) < losses[0], losses
    assert int(state.step) == steps


def test_grad_accumulation_matches_full_batch():
    """ACCUM_STEPS=2 must match the full-batch step for mean-reduced CE
    (FrozenBN backbone so stats don't diverge between the two paths)."""
    cfg = get_default_cfg()
    cfg.MODEL.NAME = "deeplab_resnet18"
    cfg.MODEL.DTYPE = "float32"
    cfg.MODEL.NUM_CLASSES = 3
    cfg.MODEL.FREEZE_BN = True
    cfg.SOLVER.BASE_LR = 1e-3
    cfg.SOLVER.EPOCHS = 1
    spec = build_segmentor(cfg)
    seg = Segmentor(spec, 3)
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.rand(4, 32, 32, 3).astype(np.float32))
    y = jnp.asarray(rng.randint(0, 3, size=(4, 32, 32)).astype(np.int32))
    batch = {"image": x, "label": y}
    variables = seg.init(jax.random.PRNGKey(0), x)
    variables_snapshot = jax.device_get(variables)  # pre-donation copy
    txs = make_optimizers(spec, cfg)

    s_full = seg.make_states(variables, txs)
    step_full = make_src_train_step(seg, cfg, 10)
    s_full, m_full = step_full(s_full, dict(batch), jnp.float32(0))

    cfg2 = cfg.clone()
    cfg2.SOLVER.ACCUM_STEPS = 2
    # fresh buffers: the first step donated s_full's (shared) arrays
    s_acc = seg.make_states(variables_snapshot, txs)
    step_acc = make_src_train_step(seg, cfg2, 10)
    s_acc, m_acc = step_acc(s_acc, dict(batch), jnp.float32(0))

    assert abs(float(m_full["loss"]) - float(m_acc["loss"])) < 1e-5
    a = jax.tree.leaves(s_full.modules["classifier"].params)[0]
    b = jax.tree.leaves(s_acc.modules["classifier"].params)[0]
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)
