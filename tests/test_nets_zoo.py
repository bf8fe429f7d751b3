import numpy as np
import pytest

import jax
import jax.numpy as jnp

from rnd_semantic_segmentation_tpu.models.nets_zoo import (
    BiSeNetV1,
    CENet,
    DACBlock,
    SPPBlock,
    UNet,
)


def test_unet(rng):
    m = UNet(n_classes=2)
    x = jnp.asarray(rng.rand(1, 64, 64, 3).astype(np.float32))
    v = m.init(jax.random.PRNGKey(0), x)
    out = m.apply(v, x)
    assert out.shape == (1, 64, 64, 2)
    assert (np.asarray(out) >= 0).all() and (np.asarray(out) <= 1).all()


def test_dac_spp_blocks(rng):
    x = jnp.asarray(rng.rand(1, 12, 12, 16).astype(np.float32))
    dac = DACBlock()
    v = dac.init(jax.random.PRNGKey(0), x)
    assert dac.apply(v, x).shape == x.shape
    spp = SPPBlock()
    v = spp.init(jax.random.PRNGKey(0), x)
    out = spp.apply(v, x)
    assert out.shape == (1, 12, 12, 20)  # +4 pooled 1ch maps (cenet.py:159)


def test_cenet(rng):
    # /32 features must be >=6px for the SPP k6 pool (CE-Net runs 448px)
    m = CENet(num_classes=1)
    x = jnp.asarray(rng.rand(1, 224, 224, 3).astype(np.float32))
    v = m.init(jax.random.PRNGKey(0), x)
    out = m.apply(v, x)
    assert out.shape == (1, 224, 224, 1)


def test_bisenet_v1(rng):
    m = BiSeNetV1(n_classes=5)
    x = jnp.asarray(rng.rand(1, 64, 64, 3).astype(np.float32))
    v = m.init(jax.random.PRNGKey(0), x)
    out, out16, out32 = m.apply(v, x)
    assert out.shape == (1, 64, 64, 5)
    assert out16.shape == (1, 64, 64, 5)
    assert out32.shape == (1, 64, 64, 5)


@pytest.mark.parametrize("dac", ["no_atrous", "inception", "inception_blocks"])
def test_cenet_backbone_variants(rng, dac):
    """CE_Net_backbone_* research variants (cenet.py:254-425): alternate DAC
    center, NO SPP (decoder4 sees 512 channels), sigmoid output."""
    from rnd_semantic_segmentation_tpu.models import CENet

    m = CENet(num_classes=1, dac=dac, use_spp=False)
    x = jnp.asarray(rng.rand(1, 64, 64, 3).astype(np.float32))
    v = m.init(jax.random.PRNGKey(0), x)
    out = m.apply(v, x)
    assert out.shape == (1, 64, 64, 1)
    o = np.asarray(out)
    assert np.isfinite(o).all() and (o >= 0).all() and (o <= 1).all()


def test_cenet_oct(rng):
    """CE_Net_OCT (cenet.py:428-484): DAC+SPP center, 12-class raw logits."""
    from rnd_semantic_segmentation_tpu.models import CENetOCT

    m = CENetOCT()
    x = jnp.asarray(rng.rand(1, 224, 224, 3).astype(np.float32))  # SPP k6 pool
    v = m.init(jax.random.PRNGKey(0), x)
    out = m.apply(v, x)
    assert out.shape == (1, 224, 224, 12)
    o = np.asarray(out)
    assert np.isfinite(o).all()
    assert (o < 0).any()  # raw logits, not sigmoid probabilities
