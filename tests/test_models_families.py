"""Shape/graph smoke tests for GCPA(GALD), PraNet and Attn-UNet families.

Shape oracles come from the reference's inline comments
(gcpa_cc2.py:52-55, PraNet_Res2Net.py:141-179, attn/eff.py:107-148).
"""

import jax
import jax.numpy as jnp
import pytest

from rnd_semantic_segmentation_tpu.models import (
    AttnEfficientNetUnet,
    CrissCrossAttention,
    GCPADecoder,
    GCPAEncoder,
    PraNet,
    SpatialCGNL,
    build_segmentor,
)
from rnd_semantic_segmentation_tpu.configs import get_default_cfg


def test_hardnet_taps():
    m = GCPAEncoder()
    x = jnp.zeros((1, 64, 64, 3), jnp.float32)
    vars_ = m.init(jax.random.PRNGKey(0), x)
    taps = m.apply(vars_, x, mutable=False)
    shapes = [t.shape for t in taps]
    # 128@/4, 320@/8, 640@/16, 1024@/32 (gcpa_cc2.py:52-55)
    assert shapes == [(1, 16, 16, 128), (1, 8, 8, 320),
                      (1, 4, 4, 640), (1, 2, 2, 1024)]


def test_gcpa_decoder_four_heads():
    # /32 features must be >=7px for LocalAttenModule's two VALID stride-2
    # convs (reference runs 352px inputs -> 11x11, gcpa_cc2.py:52-55)
    enc = GCPAEncoder()
    dec = GCPADecoder(num_classes=19)
    x = jnp.zeros((1, 224, 224, 3), jnp.float32)
    ev = enc.init(jax.random.PRNGKey(0), x)
    taps = enc.apply(ev, x)
    dv = dec.init(jax.random.PRNGKey(1), x, taps)
    outs = dec.apply(dv, x, taps)
    assert len(outs) == 4
    for o in outs:
        assert o.shape == (1, 224, 224, 19)
        assert o.dtype == jnp.float32


def test_criss_cross_shared_weights_gamma_zero_is_identity():
    m = CrissCrossAttention()
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 4, 6, 16))
    vars_ = m.init(jax.random.PRNGKey(1), x)
    out = m.apply(vars_, x)
    # gamma initialized to zero => output == input (ccnet.py:54 gamma=zeros)
    assert jnp.allclose(out, x)


def test_spatial_cgnl_runs():
    m = SpatialCGNL(planes=32, groups=8)
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 4, 4, 64))
    vars_ = m.init(jax.random.PRNGKey(1), x)
    out = m.apply(vars_, x)
    assert out.shape == x.shape


def test_pranet_lateral_maps():
    m = PraNet()
    x = jnp.zeros((1, 64, 64, 3), jnp.float32)
    vars_ = m.init(jax.random.PRNGKey(0), x)
    outs = m.apply(vars_, x)
    assert len(outs) == 4
    for o in outs:
        assert o.shape == (1, 64, 64, 1)


def test_attn_unet_five_scales():
    m = AttnEfficientNetUnet(backbone_name="efficientnet-b0", num_classes=2)
    x = jnp.zeros((1, 64, 64, 3), jnp.float32)
    vars_ = m.init(jax.random.PRNGKey(0), x)
    outs = m.apply(vars_, x)
    # out_0..out_4 at scales 1, 1/2, 1/4, 1/8, 1/16 (eff.py:94-96)
    assert [o.shape for o in outs] == [
        (1, 64, 64, 2), (1, 32, 32, 2), (1, 16, 16, 2),
        (1, 8, 8, 2), (1, 4, 4, 2)]


@pytest.mark.parametrize("name,keys", [
    ("deeplab_resnet101", {"feature_extractor", "classifier"}),
    ("gald_hardnet68", {"encoder", "decoder"}),
    ("pranet_res2net50", {"model"}),
    ("attn_efficientnet-b2", {"encoder", "decoder"}),
    ("attnwrap_efficientnet-b2", {"model"}),
])
def test_registry_dispatch(name, keys):
    cfg = get_default_cfg()
    cfg.MODEL.NAME = name
    spec = build_segmentor(cfg)
    assert set(spec.modules) == keys
