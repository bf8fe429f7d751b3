"""Serving-path int8 quantization (serve/quant.py).

The reference has no quantization surface; this is the TPU-native serving
extension (int8 MXU convs at 2x bf16 rate on v5e).  Covers: quantized-conv
numerics vs f32, the int8 vs fake-mode oracle equivalence, calibration over a
Segmentor forward, and the Tester TEST.QUANT wiring end-to-end on synthetic
data.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from flax import linen as nn

from rnd_semantic_segmentation_tpu.models.layers import Conv2d
from rnd_semantic_segmentation_tpu.serve import (
    QuantConfig, QuantContext, calibrate_segmentor, quant_scope,
    supports_int8_conv)


class TwoConv(nn.Module):
    @nn.compact
    def __call__(self, x):
        x = jax.nn.relu(Conv2d(16, 3, padding=1, name="conv_a")(x))
        return Conv2d(8, 1, name="conv_b")(x)


def _init_and_input(seed=0, shape=(2, 16, 16, 3)):
    rng = np.random.RandomState(seed)
    x = jnp.asarray(rng.randn(*shape).astype(np.float32))
    model = TwoConv()
    variables = model.init(jax.random.PRNGKey(seed), x)
    return model, variables, x


def _calibrated_ctx(model, variables, x, mode, resolve=True):
    from rnd_semantic_segmentation_tpu.serve import resolve_mode
    if resolve:
        mode = resolve_mode(mode)
    cfg = QuantConfig(mode=mode, calib_batches=1, skip_patterns=(),
                      min_channels=0)
    ctx = QuantContext(config=cfg, mode="calibrate")
    with quant_scope(ctx):
        model.apply(variables, x)
    ctx.finalize_scales()
    ctx.mode = mode
    return ctx


def test_quantized_conv_close_to_f32():
    model, variables, x = _init_and_input()
    y_ref = model.apply(variables, x)
    ctx = _calibrated_ctx(model, variables, x, "int8")
    assert len(ctx.act_scales) == 2  # both convs calibrated
    with quant_scope(ctx):
        y_q = model.apply(variables, x)
    rel = float(jnp.linalg.norm(y_q - y_ref) / jnp.linalg.norm(y_ref))
    assert rel < 0.03, rel  # int8 per-channel PTQ on a 2-conv net


def test_int8_matches_fake_oracle():
    """Real s8xs8->s32 conv == the same arithmetic done in f32."""
    if not supports_int8_conv():
        pytest.skip("backend lacks int8 conv")
    model, variables, x = _init_and_input(seed=1)
    ctx8 = _calibrated_ctx(model, variables, x, "int8")
    ctxf = _calibrated_ctx(model, variables, x, "fake")
    assert ctx8.act_scales == ctxf.act_scales
    with quant_scope(ctx8):
        y8 = model.apply(variables, x)
    with quant_scope(ctxf):
        yf = model.apply(variables, x)
    np.testing.assert_allclose(np.asarray(y8), np.asarray(yf),
                               rtol=1e-5, atol=1e-5)


def test_quant_scope_is_noop_when_inactive():
    model, variables, x = _init_and_input(seed=2)
    y0 = model.apply(variables, x)
    with quant_scope(None):
        y1 = model.apply(variables, x)
    np.testing.assert_array_equal(np.asarray(y0), np.asarray(y1))


def test_skip_patterns_keep_convs_f32():
    model, variables, x = _init_and_input(seed=3)
    cfg = QuantConfig(mode="int8", calib_batches=1,
                      skip_patterns=("*conv_b*",), min_channels=0)
    ctx = QuantContext(config=cfg, mode="calibrate")
    with quant_scope(ctx):
        model.apply(variables, x)
    ctx.finalize_scales()
    assert "conv_b" not in ctx.act_scales
    assert any("conv_a" in k for k in ctx.act_scales)


def test_segmentor_calibrate_and_quant_forward():
    """Full-model path: calibrate a tiny deeplab, quantized probs stay close
    to f32 probs (jitted under the scope)."""
    from rnd_semantic_segmentation_tpu.configs import get_default_cfg
    from rnd_semantic_segmentation_tpu.models import build_segmentor
    from rnd_semantic_segmentation_tpu.train import Segmentor

    cfg = get_default_cfg()
    cfg.MODEL.NAME = "deeplab_resnet18"
    cfg.MODEL.NUM_CLASSES = 3
    cfg.MODEL.DTYPE = "float32"
    cfg.MODEL.FREEZE_BN = True
    spec = build_segmentor(cfg)
    seg = Segmentor(spec, 3)
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.rand(2, 32, 32, 3).astype(np.float32))
    variables = seg.init(jax.random.PRNGKey(0), x)
    params = {n: dict(v)["params"] for n, v in variables.items()}
    stats = {n: {k: c for k, c in dict(v).items() if k != "params"}
             for n, v in variables.items()}

    def probs(image):
        outputs, _, _ = seg.forward(params, stats, image,
                                    label_size=(32, 32), train=False)
        return jax.nn.softmax(outputs[0], axis=-1)

    from rnd_semantic_segmentation_tpu.serve import resolve_mode
    p_ref = probs(x)
    ctx = calibrate_segmentor(
        seg, variables, [{"image": x}],
        config=QuantConfig(mode=resolve_mode("int8"), calib_batches=1,
                           min_channels=0))
    assert len(ctx.act_scales) > 5  # backbone convs calibrated
    with quant_scope(ctx):
        p_q = jax.jit(probs)(x)
    # probabilities (post-softmax) should move very little
    assert float(jnp.mean(jnp.abs(p_q - p_ref))) < 0.02


@pytest.mark.slow
def test_tester_quant_e2e(tmp_path):
    """TEST.QUANT int8 through the unified Tester on synthetic data."""
    from test_e2e import _cfg, _loader
    from rnd_semantic_segmentation_tpu.eval.tester import Tester
    from rnd_semantic_segmentation_tpu.train.trainer import Trainer
    from rnd_semantic_segmentation_tpu.utils import setup_logger

    cfg = _cfg(tmp_path)
    Trainer("quant_e2e", cfg, _loader(cfg), 0).train()
    cfg.resume = "latest"
    logger = setup_logger("quant_e2e", str(tmp_path), 0)

    def run(quant):
        cfg.TEST.QUANT = quant
        t = Tester(cfg, _loader(cfg, "test", False, batch=2, shuffle=False),
                   logger)
        t._load_checkpoint()
        return t.test()

    s_f32 = run("none")
    s_int8 = run("int8")
    assert abs(s_int8["macro_miou"] - s_f32["macro_miou"]) < 0.05


class OutlierNet(nn.Module):
    """conv_b's input carries a constant spatial spike ~1000x the typical
    activation, so a per-tensor absmax scale quantizes everything else to
    ~zero — the classic one-bad-layer PTQ failure that sensitivity repair
    (serve/quant.py repair_exclusions) must isolate.  Measured here:
    argmax agreement drops to ~0.37 with conv_b quantized, recovers to 1.0
    with it excluded."""

    @nn.compact
    def __call__(self, x):
        h = jax.nn.relu(Conv2d(16, 3, padding=1, name="conv_a")(x))
        spike = jnp.zeros_like(h).at[:, 0, 0, 0].set(3000.0)
        h = Conv2d(16, 3, padding=1, name="conv_b")(h + spike)
        h = jax.nn.relu(h)
        return Conv2d(4, 1, name="conv_head")(h)


def _outlier_setup(seed=5):
    rng = np.random.RandomState(seed)
    x = jnp.asarray(3 * rng.randn(2, 16, 16, 3).astype(np.float32))
    model = OutlierNet()
    variables = model.init(jax.random.PRNGKey(seed), x)
    ctx = _calibrated_ctx(model, variables, x, "int8")

    def probs(xx, label_size):
        del label_size
        return jax.nn.softmax(model.apply(variables, xx), axis=-1)

    return model, variables, x, ctx, probs


def test_agreement_defeats_jit_cache():
    """Regression: pjit caches on callable identity, not the quant
    contextvar — jitting the SAME probs_fn object under both scopes serves
    the f32 graph to the quant path and reports agreement 1.0 no matter how
    broken quantization is.  argmax_agreement must trace through fresh
    function objects (the quant-scope staleness trap, CLAUDE.md)."""
    from rnd_semantic_segmentation_tpu.serve.quant import argmax_agreement
    model, variables, x, ctx, probs = _outlier_setup()
    a = argmax_agreement(probs, x, None, ctx)
    # ground truth computed eagerly (no jit cache involved)
    y_f = model.apply(variables, x)
    with quant_scope(ctx):
        y_q = model.apply(variables, x)
    eager = float(np.mean(np.asarray(jnp.argmax(y_f, -1))
                          == np.asarray(jnp.argmax(y_q, -1))))
    assert abs(a - eager) < 0.02, (a, eager)
    assert a < 0.9, f"outlier conv must break agreement, got {a}"


def test_quant_sensitivity_ranks_outlier_conv_worst():
    _, _, x, ctx, probs = _outlier_setup()
    from rnd_semantic_segmentation_tpu.serve.quant import quant_sensitivity
    errs = quant_sensitivity(probs, x, None, ctx)
    assert len(errs) == 3, errs
    worst = max(errs, key=errs.get)
    assert "conv_b" in worst, errs


def test_repair_exclusions_recovers_agreement():
    _, _, x, ctx, probs = _outlier_setup()
    from rnd_semantic_segmentation_tpu.serve.quant import (
        argmax_agreement, repair_exclusions)
    before = argmax_agreement(probs, x, None, ctx)
    assert before < 0.9, f"setup must start below the floor, got {before}"
    agreement, excluded = repair_exclusions(probs, x, None, ctx,
                                            floor=0.99, max_exclude=2)
    assert agreement >= before
    assert agreement >= 0.99, (before, agreement, excluded)
    assert any("conv_b" in p for p in excluded), excluded
    # the repaired context serves with the exclusion active
    assert ctx.exclude == set(excluded)


def test_excluded_conv_takes_f32_path():
    model, variables, x, ctx, _ = _outlier_setup()
    y_ref = model.apply(variables, x)
    ctx.exclude = set(ctx.act_scales)  # exclude everything
    with quant_scope(ctx):
        y_q = model.apply(variables, x)
    np.testing.assert_array_equal(np.asarray(y_q), np.asarray(y_ref))


def test_min_channels_gate_keeps_small_convs_bf16():
    """v5e measurement: small-channel int8 convs are slower than bf16 —
    QuantConfig.min_channels must keep them on the normal path entirely
    (not calibrated, not quantized)."""
    model, variables, x = _init_and_input(seed=4)
    cfg = QuantConfig(mode="fake", calib_batches=1, skip_patterns=(),
                      min_channels=256)
    ctx = QuantContext(config=cfg, mode="calibrate")
    with quant_scope(ctx):
        model.apply(variables, x)
    ctx.finalize_scales()
    assert ctx.act_scales == {}  # 16/8-channel convs all below the gate
    ctx.mode = "fake"
    y_ref = model.apply(variables, x)
    with quant_scope(ctx):
        y_q = model.apply(variables, x)
    np.testing.assert_array_equal(np.asarray(y_q), np.asarray(y_ref))


def test_repair_stops_early_when_stagnant(monkeypatch):
    """A model that genuinely quantizes badly must not burn all
    QUANT_REPAIR_MAX rounds (each = 2 full-model compiles) before the caller
    falls back to bf16: repair stops after 2 consecutive no-gain rounds."""
    import numpy as np

    import rnd_semantic_segmentation_tpu.serve.quant as q

    rounds = {"sens": 0}

    def fake_sens(probs_fn, x, label_size, ctx):
        rounds["sens"] += 1
        # always another candidate, none of which helps
        return {f"conv_{rounds['sens']}": 1.0}

    def fake_argmax(ctx, probs_fn, x, label_size):
        ref = np.zeros(100, np.int32)
        if ctx is None:
            return ref
        bad = ref.copy()
        bad[:50] = 1  # agreement pinned at 0.50 forever
        return bad

    monkeypatch.setattr(q, "quant_sensitivity", fake_sens)
    monkeypatch.setattr(q, "_argmax_under", fake_argmax)

    ctx = q.QuantContext(mode="fake")
    agreement, excluded = q.repair_exclusions(
        lambda v, x, s: x, None, None, ctx, floor=0.95, max_exclude=10)
    assert agreement == 0.5
    assert len(excluded) == 2, (
        f"stagnation should stop after 2 no-gain rounds, ran {len(excluded)}")
    assert rounds["sens"] == 2
