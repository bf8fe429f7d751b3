import numpy as np
import pytest

import jax
import jax.numpy as jnp

from rnd_semantic_segmentation_tpu.models.aspp import (
    ASPPClassifierV2,
    ResNetFeatureExtractor,
    VGG16FeatureExtractor,
)
from rnd_semantic_segmentation_tpu.models.discriminator import (
    FCDiscriminator,
    PixelDiscriminator,
)


def test_resnet_feature_extractor_stride8_shape():
    m = ResNetFeatureExtractor(backbone_name="resnet50", freeze_bn=True)
    x = jnp.zeros((1, 64, 64, 3), jnp.float32)
    vars_ = m.init(jax.random.PRNGKey(0), x)
    out = m.apply(vars_, x)
    # output stride 8 with 2048 channels (feature_extractor.py:42-48)
    assert out.shape == (1, 8, 8, 2048)
    # frozen BN => no batch_stats, buffers live in "frozen"
    assert "batch_stats" not in vars_
    assert "frozen" in vars_


def test_resnet_trainable_bn_has_stats():
    m = ResNetFeatureExtractor(backbone_name="resnet18", freeze_bn=False)
    x = jnp.zeros((1, 32, 32, 3), jnp.float32)
    vars_ = m.init(jax.random.PRNGKey(0), x)
    assert "batch_stats" in vars_
    out, mutated = m.apply(vars_, x, train=True, mutable=["batch_stats"])
    assert out.shape == (1, 4, 4, 512)


def test_vgg16_feature_extractor_shape():
    m = VGG16FeatureExtractor()
    x = jnp.zeros((1, 64, 64, 3), jnp.float32)
    vars_ = m.init(jax.random.PRNGKey(0), x)
    out = m.apply(vars_, x)
    # stride 8, 1024 channels (feature_extractor.py:17-24)
    assert out.shape == (1, 8, 8, 1024)


def test_aspp_classifier_upsamples_to_label_size():
    m = ASPPClassifierV2(num_classes=19)
    fea = jnp.zeros((2, 8, 8, 2048), jnp.float32)
    vars_ = m.init(jax.random.PRNGKey(0), fea, size=(64, 64))
    out = m.apply(vars_, fea, size=(64, 64))
    assert out.shape == (2, 64, 64, 19)
    assert out.dtype == jnp.float32


def test_pixel_discriminator_two_heads():
    m = PixelDiscriminator(ndf=64, num_classes=19)
    fea = jnp.zeros((1, 8, 8, 256), jnp.float32)
    vars_ = m.init(jax.random.PRNGKey(0), fea, size=(32, 32))
    out = m.apply(vars_, fea, size=(32, 32))
    assert out.shape == (1, 32, 32, 38)  # 2C channels (discriminator.py:40-47)


def test_fc_discriminator_shape():
    m = FCDiscriminator()
    x = jnp.zeros((1, 64, 64, 19), jnp.float32)
    vars_ = m.init(jax.random.PRNGKey(0), x)
    out = m.apply(vars_, x)
    assert out.shape == (1, 2, 2, 1)
