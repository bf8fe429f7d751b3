"""Context-aggregation zoo smoke + oracle tests."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from rnd_semantic_segmentation_tpu.models.contextagg import (
    CA,
    SA,
    SRM,
    ContextBlock2d,
    GALDHead,
    GCPAGALDNet,
    HolisticAttention,
    PSPModule,
    SmallLocalAttenModule,
    _adaptive_avg_pool,
    gkern,
    min_max_norm,
)


def test_gkern_matches_scipy_free_construction():
    k = gkern(31, 4)
    assert k.shape == (31, 31)
    assert abs(k.sum() - 1.0) < 1e-6
    assert k[15, 15] == k.max()


def test_adaptive_avg_pool_matches_torch(rng):
    import torch
    x = rng.rand(2, 11, 13, 4).astype(np.float32)
    for size in [(1, 1), (2, 2), (3, 6)]:
        ours = np.asarray(_adaptive_avg_pool(jnp.asarray(x), size))
        ref = torch.nn.functional.adaptive_avg_pool2d(
            torch.from_numpy(x.transpose(0, 3, 1, 2)), size).numpy().transpose(0, 2, 3, 1)
        np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-6)


@pytest.mark.parametrize("module,args,feat_shapes", [
    (CA, {}, [(1, 8, 8, 64), (1, 8, 8, 64)]),
    (SRM, {}, [(1, 8, 8, 256)]),
    (SA, {}, [(1, 8, 8, 64), (1, 4, 4, 64)]),
    (SmallLocalAttenModule, {}, [(1, 8, 8, 32)]),
    (PSPModule, {"out_features": 64}, [(1, 12, 12, 128)]),
    (ContextBlock2d, {"planes": 64}, [(1, 8, 8, 64)]),
])
def test_zoo_modules_run(module, args, feat_shapes, rng):
    m = module(**args)
    xs = [jnp.asarray(rng.rand(*s).astype(np.float32)) for s in feat_shapes]
    variables = m.init(jax.random.PRNGKey(0), *xs)
    out = m.apply(variables, *xs)
    assert np.isfinite(np.asarray(out)).all()


def test_galdhead_shape(rng):
    m = GALDHead(interplanes=64, num_classes=19)
    x = jnp.asarray(rng.rand(1, 12, 12, 128).astype(np.float32))
    variables = m.init(jax.random.PRNGKey(0), x)
    out = m.apply(variables, x)
    assert out.shape == (1, 12, 12, 19)


def test_gcpagald_five_outputs(rng):
    m = GCPAGALDNet(num_classes=1)
    x = jnp.asarray(rng.rand(1, 224, 224, 3).astype(np.float32))
    variables = m.init(jax.random.PRNGKey(0), x)
    outs = m.apply(variables, x)
    assert len(outs) == 5
    for o in outs:
        assert o.shape == (1, 224, 224, 1)


def test_holistic_attention(rng):
    m = HolisticAttention()
    att = jnp.asarray(rng.rand(1, 16, 16, 1).astype(np.float32))
    x = jnp.asarray(rng.rand(1, 16, 16, 32).astype(np.float32))
    variables = m.init(jax.random.PRNGKey(0), att, x)
    out = m.apply(variables, att, x)
    assert out.shape == x.shape


def test_snl_block_and_gchead(rng):
    from rnd_semantic_segmentation_tpu.models.contextagg import GCHead, SNLBlock2d
    x = jnp.asarray(rng.rand(1, 8, 8, 64).astype(np.float32))
    m = SNLBlock2d(planes=64)
    v = m.init(jax.random.PRNGKey(0), x)
    assert m.apply(v, x).shape == x.shape
    h = GCHead(interplanes=32, num_classes=5)
    v = h.init(jax.random.PRNGKey(0), x)
    assert h.apply(v, x).shape == (1, 8, 8, 5)
