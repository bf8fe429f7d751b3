import numpy as np
import pytest

import jax
import jax.numpy as jnp

from rnd_semantic_segmentation_tpu.models.seg_nets import (
    CCNetSegModel,
    DilatedSegBackbone,
    DualSegNet,
    GALDNetFull,
    PSPNetFull,
)

SMALL = (1, 1, 2, 1)  # tiny layer plan to keep CPU tests quick


def test_backbone_os8(rng):
    m = DilatedSegBackbone(layers=SMALL)
    x = jnp.asarray(rng.rand(1, 64, 64, 3).astype(np.float32))
    v = m.init(jax.random.PRNGKey(0), x)
    l3, l4 = m.apply(v, x)
    assert l3.shape == (1, 8, 8, 1024)   # OS8, dilated layer3/4
    assert l4.shape == (1, 8, 8, 2048)


@pytest.mark.parametrize("cls", [GALDNetFull, CCNetSegModel, PSPNetFull, DualSegNet])
def test_seg_nets_dual_outputs(cls, rng):
    m = cls(num_classes=7, layers=SMALL)
    x = jnp.asarray(rng.rand(1, 96, 96, 3).astype(np.float32))
    v = m.init(jax.random.PRNGKey(0), x)
    out, dsn = m.apply(v, x)
    assert out.shape == (1, 12, 12, 7)
    assert dsn.shape == (1, 12, 12, 7)
    assert np.isfinite(np.asarray(out)).all()


def test_psphead_icnet(rng):
    """PSPHead (PSPNet.py:231-316): OS8 features with layer4 multi_grid
    (1,1,1), PSP-pooled to 512 channels — ICNet consumes features."""
    from rnd_semantic_segmentation_tpu.models.seg_nets import PSPHead

    m = PSPHead(layers=SMALL)
    x = jnp.asarray(rng.rand(1, 64, 64, 3).astype(np.float32))
    v = m.init(jax.random.PRNGKey(0), x)
    out = m.apply(v, x)
    assert out.shape == (1, 8, 8, 512)
    assert np.isfinite(np.asarray(out)).all()
