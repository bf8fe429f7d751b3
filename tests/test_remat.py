"""SOLVER.REMAT — activation rematerialization in the train-step backward.

Contract: remat changes WHAT is saved for the backward pass, never the math.
REMAT=full / dots must produce the same next-state as REMAT=none up to
recompute-fusion rounding (see _assert_params_close), the remat primitive must
actually appear in the lowered step (otherwise the knob is a no-op), and the
knob must compose with SOLVER.ACCUM_STEPS and with the FADA step.  The
reference has no counterpart (torch.utils.checkpoint is unused there); this
is the TPU HBM-for-FLOPs lever behind large-batch recipes
(BENCH_BATCH_SCALE.json).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from rnd_semantic_segmentation_tpu.configs import get_default_cfg
from rnd_semantic_segmentation_tpu.models import build_segmentor
from rnd_semantic_segmentation_tpu.train import (
    Segmentor, make_optimizers, make_src_train_step)


def _cfg(remat, accum=1):
    cfg = get_default_cfg()
    cfg.MODEL.NAME = "deeplab_resnet18"
    cfg.MODEL.DTYPE = "float32"
    cfg.MODEL.NUM_CLASSES = 3
    cfg.SOLVER.BASE_LR = 1e-3
    cfg.SOLVER.EPOCHS = 1
    cfg.SOLVER.REMAT = remat
    cfg.SOLVER.ACCUM_STEPS = accum
    return cfg


def _run_steps(cfg, n=2, batch_size=4):
    spec = build_segmentor(cfg)
    seg = Segmentor(spec, cfg.MODEL.NUM_CLASSES)
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.rand(batch_size, 32, 32, 3).astype(np.float32))
    y = jnp.asarray(
        rng.randint(0, 3, size=(batch_size, 32, 32)).astype(np.int32))
    batch = {"image": x, "label": y}
    variables = seg.init(jax.random.PRNGKey(0), x)
    state = seg.make_states(variables, make_optimizers(spec, cfg))
    step = make_src_train_step(seg, cfg, steps_per_epoch=10)
    losses = []
    for _ in range(n):
        state, metrics = step(state, dict(batch), jnp.float32(0))
        losses.append(float(metrics["loss"]))
    params = jax.device_get({n_: m.params for n_, m in state.modules.items()})
    return losses, params


# The recomputed forward is the same math but XLA may fuse it differently,
# so gradients can differ in the last ulp (measured max 6e-8 abs on f32
# params after 2 steps); losses — computed on the non-remat primal — are
# bit-equal.  atol=1e-6 distinguishes rounding from any real semantic drift.
def _assert_params_close(a, b):
    jax.tree.map(lambda x, y: np.testing.assert_allclose(x, y, atol=1e-6,
                                                         rtol=0), a, b)


@pytest.mark.parametrize("mode", ["full", "dots"])
def test_remat_is_exact(mode):
    base_losses, base_params = _run_steps(_cfg("none"))
    rem_losses, rem_params = _run_steps(_cfg(mode))
    assert base_losses == rem_losses
    _assert_params_close(base_params, rem_params)


def test_remat_composes_with_accum():
    base_losses, base_params = _run_steps(_cfg("none", accum=2))
    rem_losses, rem_params = _run_steps(_cfg("full", accum=2))
    assert base_losses == rem_losses
    _assert_params_close(base_params, rem_params)


def test_remat_primitive_present_in_jaxpr():
    """The knob must actually rematerialize: 'remat' appears in the traced
    step iff REMAT != none."""
    for mode, expect in [("none", False), ("full", True)]:
        cfg = _cfg(mode)
        spec = build_segmentor(cfg)
        seg = Segmentor(spec, 3)
        x = jnp.zeros((2, 32, 32, 3), jnp.float32)
        y = jnp.zeros((2, 32, 32), jnp.int32)
        variables = seg.init(jax.random.PRNGKey(0), x)
        state = seg.make_states(variables, make_optimizers(spec, cfg))
        step = make_src_train_step(seg, cfg, 10, jit=False)
        jaxpr = str(jax.make_jaxpr(step)(
            state, {"image": x, "label": y}, jnp.float32(0)))
        assert ("remat" in jaxpr) == expect, mode


@pytest.mark.slow  # 253 s: 4 backbones x remat-vs-plain step equality (ROUND5.md budget split)
def test_remat_blocks_exact_and_ckpt_compatible():
    """MODEL.REMAT_BLOCKS (block-granular nn.remat in the EfficientNet
    encoder): identical param tree (checkpoints interchangeable), identical
    eval logits, train next-state equal up to recompute rounding, and the
    remat primitive present in the traced step."""
    def build(remat_blocks):
        cfg = get_default_cfg()
        cfg.MODEL.NAME = "attn_efficientnet-b0"
        cfg.MODEL.DTYPE = "float32"
        cfg.MODEL.NUM_CLASSES = 2
        cfg.MODEL.REMAT_BLOCKS = remat_blocks
        cfg.SOLVER.BASE_LR = 1e-3
        cfg.SOLVER.EPOCHS = 1
        return cfg

    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.rand(2, 64, 64, 3).astype(np.float32))
    y = jnp.asarray(rng.randint(0, 2, (2, 64, 64)).astype(np.int32))

    results = {}
    for mode in (False, True):
        cfg = build(mode)
        spec = build_segmentor(cfg)
        seg = Segmentor(spec, 2)
        variables = seg.init(jax.random.PRNGKey(0), x)
        state = seg.make_states(variables, make_optimizers(spec, cfg))
        p0 = {n_: m.params for n_, m in state.modules.items()}
        s0 = {n_: m.stats for n_, m in state.modules.items()}
        logits, _, _ = seg.forward(p0, s0, x, label_size=(64, 64),
                                   train=False)
        step = make_src_train_step(seg, cfg, 10, jit=False)
        jaxpr = str(jax.make_jaxpr(step)(
            state, {"image": x, "label": y}, jnp.float32(0)))
        new_state, metrics = step(state, {"image": x, "label": y},
                                  jnp.float32(0))
        results[mode] = {
            "tree": jax.tree_util.tree_structure(p0),
            "logits": np.asarray(logits[0]),
            "remat_in_jaxpr": "remat" in jaxpr,
            "loss": float(metrics["loss"]),
            "params": jax.device_get(
                {n_: m.params for n_, m in new_state.modules.items()}),
        }

    assert results[False]["tree"] == results[True]["tree"]
    np.testing.assert_array_equal(results[False]["logits"],
                                  results[True]["logits"])
    assert not results[False]["remat_in_jaxpr"]
    assert results[True]["remat_in_jaxpr"]
    assert results[False]["loss"] == results[True]["loss"]
    _assert_params_close(results[False]["params"], results[True]["params"])


@pytest.mark.parametrize("backbone", ["resnet", "res2net", "hardnet"])
def test_remat_blocks_backbones(backbone):
    """remat_blocks on ResNet/Res2Net/HarDNet: identical param tree and
    forward outputs, remat primitive present in the gradient graph."""
    import flax.linen as nn  # noqa: F401  (models already import it)
    if backbone == "resnet":
        from rnd_semantic_segmentation_tpu.models.resnet import ResNet
        mk = lambda r: ResNet(arch="resnet18", remat_blocks=r,
                              return_layers=("layer4",))
        out_key = "layer4"
    elif backbone == "res2net":
        from rnd_semantic_segmentation_tpu.models.res2net import Res2Net
        mk = lambda r: Res2Net(layers=(1, 1, 1, 1), remat_blocks=r)
        out_key = "layer4"
    else:
        from rnd_semantic_segmentation_tpu.models.hardnet import HarDNet
        mk = lambda r: HarDNet(arch=68, remat_blocks=r)
        out_key = None  # tuple output

    x = jnp.asarray(np.random.RandomState(0).rand(1, 64, 64, 3)
                    .astype(np.float32))
    v = {}
    out = {}
    for r in (False, True):
        m = mk(r)
        v[r] = m.init(jax.random.PRNGKey(0), x)
        y = m.apply(v[r], x, False)
        out[r] = np.asarray(y[out_key] if out_key else y[-1])

        def loss(params, m=m, bs=v[r].get("batch_stats")):
            varbs = {"params": params}
            if bs is not None:
                varbs["batch_stats"] = bs
            o, _ = m.apply(varbs, x, True, mutable=["batch_stats"])
            o = o[out_key] if out_key else o[-1]
            return o.astype(jnp.float32).sum()

        jaxpr = str(jax.make_jaxpr(loss)(v[r]["params"]))
        assert ("remat" in jaxpr) == r, backbone

    assert (jax.tree_util.tree_structure(v[False])
            == jax.tree_util.tree_structure(v[True]))
    np.testing.assert_array_equal(out[False], out[True])


def test_remat_rejects_unknown_mode():
    from rnd_semantic_segmentation_tpu.train.steps import remat_wrap
    cfg = _cfg("sometimes")
    with pytest.raises(ValueError, match="none|full|dots"):
        remat_wrap(lambda p: p, cfg)


def test_fada_remat_is_exact():
    """The FADA generator loss under REMAT=full matches REMAT=none exactly."""
    from rnd_semantic_segmentation_tpu.models import (
        build_adversarial_discriminator)
    from rnd_semantic_segmentation_tpu.train.fada import (
        FadaState, init_disc_state, make_fada_train_step)

    def run(mode):
        cfg = _cfg(mode)
        cfg.MODEL.FREEZE_BN = True
        spec = build_segmentor(cfg)
        seg = Segmentor(spec, 3)
        rng = np.random.RandomState(1)
        src = {"image": jnp.asarray(rng.rand(2, 32, 32, 3).astype(np.float32)),
               "label": jnp.asarray(
                   rng.randint(0, 3, (2, 32, 32)).astype(np.int32))}
        tgt = {"image": jnp.asarray(rng.rand(2, 32, 32, 3).astype(np.float32)),
               "label": jnp.asarray(
                   rng.randint(0, 3, (2, 32, 32)).astype(np.int32))}
        variables = seg.init(jax.random.PRNGKey(0), src["image"])
        seg_state = seg.make_states(variables, make_optimizers(spec, cfg))
        params = {n_: m.params for n_, m in seg_state.modules.items()}
        stats = {n_: m.stats for n_, m in seg_state.modules.items()}
        _, _, tap = seg.forward(params, stats, src["image"], train=False)
        disc = build_adversarial_discriminator(cfg)
        disc_state = init_disc_state(disc, jax.random.PRNGKey(1),
                                     jnp.zeros(tap.shape, jnp.float32), cfg)
        state = FadaState(seg=seg_state, disc=disc_state)
        step = make_fada_train_step(seg, disc, cfg, steps_per_epoch=10)
        state, _ = step(state, src, tgt, jnp.float32(0))
        return jax.device_get(
            {n_: m.params for n_, m in state.seg.modules.items()})

    _assert_params_close(run("none"), run("full"))
