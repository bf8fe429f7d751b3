"""StableHLO deployment export (serve/export.py).

The exported artifact must (a) run standalone via jax.export.deserialize
with NO checkpoint on disk, (b) reproduce the Tester's argmax bit-exactly,
and (c) compose with int8 quantization (the quant graph is what's traced).
"""

import numpy as np
import pytest

from test_e2e import _cfg, _loader

from rnd_semantic_segmentation_tpu.eval.tester import Tester
from rnd_semantic_segmentation_tpu.serve.export import export_eval, load_exported
from rnd_semantic_segmentation_tpu.train.trainer import Trainer
from rnd_semantic_segmentation_tpu.utils import setup_logger


@pytest.fixture(scope="module")
def trained(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("export")
    cfg = _cfg(tmp)
    Trainer("export_test", cfg, _loader(cfg), 0).train()
    cfg.resume = "latest"
    logger = setup_logger("export_test", str(tmp), 0)
    return cfg, logger, tmp


def _tester(cfg, logger):
    t = Tester(cfg, _loader(cfg, "test", False, batch=2, shuffle=False),
               logger)
    t._load_checkpoint()
    return t


def test_export_matches_tester_argmax(trained, tmp_path):
    import jax.numpy as jnp

    cfg, logger, _ = trained
    tester = _tester(cfg, logger)
    out = str(tmp_path / "model")
    meta = export_eval(tester, batch_size=2, out_path=out, logger=logger)
    assert meta["input"] == [2, 32, 32, 3]
    assert meta["bytes"] > 1000

    call, meta2 = load_exported(out)
    assert meta2 == meta
    rng = np.random.RandomState(0)
    x = rng.rand(2, 32, 32, 3).astype(np.float32)
    got = call(x)
    want = np.asarray(jnp.argmax(
        tester._probs(tester.variables, jnp.asarray(x), (32, 32)), axis=-1))
    np.testing.assert_array_equal(got, want)


def test_export_with_quantization(trained, tmp_path):
    cfg, logger, _ = trained
    cfg.TEST.QUANT = "fake"  # deterministic everywhere incl. CPU CI
    try:
        tester = _tester(cfg, logger)
        qctx = tester.make_quant_context()
        assert qctx is not None
        out = str(tmp_path / "model_q")
        meta = export_eval(tester, batch_size=1, out_path=out,
                           quant_ctx=qctx, logger=logger)
        assert meta["quant"] == "fake"
        call, _ = load_exported(out)
        rng = np.random.RandomState(1)
        pred = call(rng.rand(1, 32, 32, 3).astype(np.float32))
        assert pred.shape == (1, 32, 32)
        assert pred.max() < cfg.MODEL.NUM_CLASSES
    finally:
        cfg.TEST.QUANT = "none"


def test_export_quant_not_stale_after_prior_f32_use(trained, tmp_path):
    """Regression (same class as the serving-daemon staleness): exporting
    with a quant context AFTER the tester's jitted head was already used
    without one must still trace the quantized graph — the artifact output
    has to differ numerically from the f32 head."""
    import jax.numpy as jnp

    cfg, logger, _ = trained
    tester = _tester(cfg, logger)
    rng = np.random.RandomState(2)
    x = rng.rand(1, 32, 32, 3).astype(np.float32)
    # populate the shared jit cache WITHOUT a quant scope (f32 trace)
    p_f32 = np.asarray(tester._probs(tester.variables, jnp.asarray(x),
                                     (32, 32)))

    cfg.TEST.QUANT = "fake"
    cfg.TEST.QUANT_MIN_CHANNELS = 0
    try:
        qctx = tester.make_quant_context()
        out = str(tmp_path / "model_stale")
        export_eval(tester, batch_size=1, out_path=out, quant_ctx=qctx,
                    logger=logger)
        call, meta = load_exported(out)
        assert meta["quant"] == "fake"
        pred_q = call(x)
        pred_f32 = np.argmax(p_f32, axis=-1)
        # probabilities must differ (argmax may or may not); compare the
        # exported int map against a fake-quant direct evaluation instead
        from rnd_semantic_segmentation_tpu.serve import quant_scope
        with quant_scope(qctx):
            p_q = np.asarray(tester._probs_impl(tester.variables,
                                                jnp.asarray(x), (32, 32)))
        assert not np.allclose(p_q, p_f32, atol=1e-6)
        np.testing.assert_array_equal(pred_q, np.argmax(p_q, axis=-1))
    finally:
        cfg.TEST.QUANT = "none"
        cfg.TEST.QUANT_MIN_CHANNELS = 64
