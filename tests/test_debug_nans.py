"""DEBUG sanitizers (SURVEY §5): jax_debug_nans and the checkify-wrapped
train step both catch a deliberately-NaN batch with a useful error."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from rnd_semantic_segmentation_tpu.configs import get_default_cfg
from rnd_semantic_segmentation_tpu.models import build_segmentor
from rnd_semantic_segmentation_tpu.train import (
    Segmentor, make_optimizers, make_src_train_step, wrap_step_checkify)


def _tiny_setup():
    cfg = get_default_cfg()
    cfg.MODEL.NAME = "deeplab_resnet18"
    cfg.MODEL.NUM_CLASSES = 3
    cfg.MODEL.FREEZE_BN = True
    cfg.SOLVER.BASE_LR = 1e-4
    cfg.SOLVER.EPOCHS = 1
    spec = build_segmentor(cfg)
    seg = Segmentor(spec, 3)
    variables = seg.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)))
    state = seg.make_states(variables, make_optimizers(spec, cfg))
    step = make_src_train_step(seg, cfg, steps_per_epoch=10)
    rng = np.random.RandomState(0)
    x = rng.rand(2, 32, 32, 3).astype(np.float32)
    y = rng.randint(0, 3, size=(2, 32, 32)).astype(np.int32)
    return cfg, state, step, x, y


def test_checkify_catches_nan_batch():
    cfg, state, step, x, y = _tiny_setup()
    checked = wrap_step_checkify(step)
    # clean batch passes through unchanged (step donates state buffers, so
    # thread the returned state into the next call)
    state, metrics = checked(state, {"image": jnp.asarray(x),
                                     "label": jnp.asarray(y)}, jnp.float32(0))
    assert np.isfinite(float(metrics["loss"]))
    # poisoned batch raises with the float-check payload
    x_bad = x.copy()
    x_bad[0, 0, 0, 0] = np.nan
    with pytest.raises(Exception, match="(?i)nan"):
        checked(state, {"image": jnp.asarray(x_bad), "label": jnp.asarray(y)},
                jnp.float32(0))


def test_jax_debug_nans_flag():
    """DEBUG.NANS wires jax_debug_nans (cli/common.py:43-45); a NaN in the
    step raises FloatingPointError instead of propagating silently."""
    cfg, state, step, x, y = _tiny_setup()
    x_bad = x.copy()
    x_bad[:] = np.nan
    try:
        jax.config.update("jax_debug_nans", True)
        with pytest.raises(FloatingPointError):
            _, m = step(state, {"image": jnp.asarray(x_bad),
                                "label": jnp.asarray(y)}, jnp.float32(0))
            float(m["loss"])
    finally:
        jax.config.update("jax_debug_nans", False)
