"""Encoder zoo: shapes + the RepVGG deploy reparameterization equivalence."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from rnd_semantic_segmentation_tpu.models.encoders_zoo import (
    B2VGG,
    B2ResNet,
    DeepLabV3ASPP,
    RepVGG,
    repvgg_reparam,
)


def test_repvgg_shapes(rng):
    m = RepVGG(arch="RepVGG-A0")
    x = jnp.asarray(rng.rand(1, 64, 64, 3).astype(np.float32))
    variables = m.init(jax.random.PRNGKey(0), x)
    taps = m.apply(variables, x)
    assert [t.shape for t in taps] == [
        (1, 16, 16, 48), (1, 8, 8, 96), (1, 4, 4, 192), (1, 2, 2, 1280)]


def test_repvgg_reparam_equivalence(rng):
    """Deploy-mode fused conv must reproduce the 3-branch eval forward
    (repvgg.py get_equivalent_kernel_bias)."""
    m_train = RepVGG(arch="RepVGG-A0")
    x = jnp.asarray(rng.rand(1, 32, 32, 3).astype(np.float32))
    variables = m_train.init(jax.random.PRNGKey(0), x)
    # give BN stats non-trivial values so the fusion actually matters
    variables = jax.tree.map(
        lambda a: a + 0.1 * np.random.RandomState(0).rand(*a.shape).astype(a.dtype)
        if a.ndim >= 1 else a, variables)
    ref = m_train.apply(variables, x, train=False)

    deploy_vars = repvgg_reparam(jax.device_get(variables), arch="RepVGG-A0")
    m_deploy = RepVGG(arch="RepVGG-A0", deploy=True)
    out = m_deploy.apply(deploy_vars, x, train=False)
    for a, b in zip(ref, out):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-4)


def test_b2_resnet_two_branches(rng):
    m = B2ResNet()
    x = jnp.asarray(rng.rand(1, 64, 64, 3).astype(np.float32))
    variables = m.init(jax.random.PRNGKey(0), x)
    x1, x2 = m.apply(variables, x)
    assert x1.shape == (1, 2, 2, 2048)
    assert x2.shape == (1, 2, 2, 2048)
    assert not np.allclose(np.asarray(x1), np.asarray(x2))


def test_b2_vgg_two_branches(rng):
    m = B2VGG()
    x = jnp.asarray(rng.rand(1, 64, 64, 3).astype(np.float32))
    variables = m.init(jax.random.PRNGKey(0), x)
    x1, x2 = m.apply(variables, x)
    assert x1.shape == (1, 4, 4, 512)
    assert x2.shape == (1, 4, 4, 512)


def test_deeplabv3_aspp(rng):
    m = DeepLabV3ASPP(out_channels=64)
    x = jnp.asarray(rng.rand(1, 8, 8, 256).astype(np.float32))
    variables = m.init(jax.random.PRNGKey(0), x)
    out = m.apply(variables, x)
    assert out.shape == (1, 8, 8, 64)


def test_resnet3d(rng):
    from rnd_semantic_segmentation_tpu.models.resnet3d import ResNet3D
    m = ResNet3D(layers=(1, 1, 1, 1))
    x = jnp.asarray(rng.rand(1, 8, 32, 32, 3).astype(np.float32))
    v = m.init(jax.random.PRNGKey(0), x)
    taps = m.apply(v, x, train=False)
    # stem T-stride 1 so T halves only in the pool/stages: 8->4->4,2,1,1(ceil)
    assert taps[-1].shape[-1] == 512
    assert len(taps) == 4


def test_se_resnet_and_deeplabv3(rng):
    from rnd_semantic_segmentation_tpu.models.encoders_zoo import DeepLabV3, SEResNet
    m = SEResNet(layers=(1, 1, 1, 1))
    x = jnp.asarray(rng.rand(1, 64, 64, 3).astype(np.float32))
    v = m.init(jax.random.PRNGKey(0), x)
    taps = m.apply(v, x)
    assert taps[-1].shape == (1, 2, 2, 512)

    d = DeepLabV3(num_classes=7, backbone_arch="resnet18")
    v = d.init(jax.random.PRNGKey(0), x)
    out = d.apply(v, x)
    assert out.shape == (1, 64, 64, 7)
