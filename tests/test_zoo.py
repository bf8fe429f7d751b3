"""Research-zoo blocks: shape/finite smoke tests (+ NL identity-at-init)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from rnd_semantic_segmentation_tpu.models.zoo import (
    AFNB,
    APNB,
    A2Net,
    DualGCN,
    DualGCNHead,
    NLBlockND,
    RCCAModule,
    SEBlock,
    SpatialCGNLx,
    SpatialGCN,
)


@pytest.mark.parametrize("mode", ["gaussian", "embedded", "dot", "concatenate"])
def test_nonlocal_modes(mode, rng):
    m = NLBlockND(mode=mode)
    x = jnp.asarray(rng.rand(1, 6, 6, 16).astype(np.float32))
    variables = m.init(jax.random.PRNGKey(0), x)
    out = m.apply(variables, x)
    assert out.shape == x.shape
    # BN zero-init on W_z => identity at init (nonlocal.py:86-88)
    np.testing.assert_allclose(np.asarray(out), np.asarray(x), atol=1e-6)


@pytest.mark.parametrize("module,args,shapes", [
    (A2Net, {"c_m": 16, "c_n": 8}, [(2, 6, 6, 32)]),
    (APNB, {"out_channels": 32, "key_channels": 16, "value_channels": 16},
     [(1, 9, 9, 32)]),
    (SpatialGCN, {}, [(1, 8, 8, 32)]),
    (DualGCN, {}, [(1, 16, 16, 32)]),
    (DualGCNHead, {"interplanes": 32, "num_classes": 7}, [(1, 16, 16, 64)]),
    (SpatialCGNLx, {"planes": 16, "groups": 8}, [(1, 6, 6, 32)]),
    (RCCAModule, {"out_channels": 32, "num_classes": 5}, [(1, 8, 8, 64)]),
    (SEBlock, {}, [(1, 8, 8, 32)]),
])
def test_zoo_blocks_run(module, args, shapes, rng):
    m = module(**args)
    xs = [jnp.asarray(rng.rand(*s).astype(np.float32)) for s in shapes]
    variables = m.init(jax.random.PRNGKey(0), *xs)
    out = m.apply(variables, *xs)
    assert np.isfinite(np.asarray(out)).all()


def test_afnb_fusion(rng):
    m = AFNB(out_channels=32, key_channels=16, value_channels=16)
    low = jnp.asarray(rng.rand(1, 6, 6, 64).astype(np.float32))
    high = jnp.asarray(rng.rand(1, 12, 12, 32).astype(np.float32))
    variables = m.init(jax.random.PRNGKey(0), low, high)
    out = m.apply(variables, low, high)
    assert out.shape == (1, 12, 12, 32)


def test_spatial_nl(rng):
    from rnd_semantic_segmentation_tpu.models.zoo import SpatialNL
    m = SpatialNL(planes=16)
    x = jnp.asarray(rng.rand(1, 6, 6, 32).astype(np.float32))
    v = m.init(jax.random.PRNGKey(0), x)
    out = m.apply(v, x)
    assert out.shape == x.shape


def test_res2net_gc(rng):
    from rnd_semantic_segmentation_tpu.models import Res2Net
    m = Res2Net(layers=(1, 1, 1, 1), gc_blocks=True)
    x = jnp.asarray(rng.rand(1, 32, 32, 3).astype(np.float32))
    v = m.init(jax.random.PRNGKey(0), x)
    taps = m.apply(v, x, train=False)
    assert taps["layer4"].shape == (1, 1, 1, 2048)
    assert "layer2_gcb" in v["params"]
