"""DeepLabV2 model family: dilated backbone feature extractors + ASPP-V2 head.

Semantics from:
  * resnet_feature_extractor — /root/reference/core/models/feature_extractor.py:34-52
    (dilation [False,True,True] -> output stride 8, layer4 tap, optional FrozenBN)
  * vgg_feature_extractor — feature_extractor.py:8-32 (VGG16-FCN: pool4/5 dropped,
    conv5 dilated 2, dilated fc6/fc7 -> 1024ch)
  * ASPP_Classifier_V2 — /root/reference/core/models/classifiers/aspp/classifier.py:6-32
    (4 parallel 3x3 convs, dilations [6,12,18,24], summed, bilinear
    align_corners=True upsample to label size, N(0,0.01) weight init)
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax.numpy as jnp
from flax import linen as nn

from ..ops import max_pool, resize_bilinear
from .layers import Conv2d, make_norm, relu
from .resnet import ResNet, output_channels


class ResNetFeatureExtractor(nn.Module):
    backbone_name: str = "resnet101"
    freeze_bn: bool = False
    bn_axis_name: Optional[str] = None
    remat_blocks: bool = False  # MODEL.REMAT_BLOCKS (see resnet.py)

    @nn.compact
    def __call__(self, x, train: bool = False):
        taps = ResNet(
            arch=self.backbone_name,
            replace_stride_with_dilation=(False, True, True),
            norm_kind="frozen" if self.freeze_bn else "bn",
            bn_axis_name=self.bn_axis_name,
            return_layers=("layer4",),
            remat_blocks=self.remat_blocks,
            name="backbone",
        )(x, train)
        return taps["layer4"]


# VGG16 conv plan: (out_channels per conv, pool positions follow torchvision
# features indices). Only three pools are kept (stride 8); conv5 is dilated.
_VGG16_BLOCKS = (
    (64, 64),          # block1 + pool
    (128, 128),        # block2 + pool
    (256, 256, 256),   # block3 + pool
    (512, 512, 512),   # block4, pool4 removed
    (512, 512, 512),   # block5 dilated 2, pool5 removed
)


class VGG16FeatureExtractor(nn.Module):
    freeze_bn: bool = False  # torchvision vgg16 has no BN; kept for API parity

    @nn.compact
    def __call__(self, x, train: bool = False):
        conv_idx = 0
        for b, widths in enumerate(_VGG16_BLOCKS):
            dilation = 2 if b == 4 else 1
            for w in widths:
                x = Conv2d(w, 3, padding=dilation, dilation=dilation,
                           name=f"conv{conv_idx}")(x)
                x = relu(x)
                conv_idx += 1
            if b < 3:
                x = max_pool(x, 2, 2)
        # dilated fc6/fc7 (feature_extractor.py:21-24)
        x = Conv2d(1024, 3, padding=4, dilation=4, name="fc6")(x)
        x = relu(x)
        x = Conv2d(1024, 3, padding=4, dilation=4, name="fc7")(x)
        x = relu(x)
        return x


class ASPPClassifierV2(nn.Module):
    """DeepLabV2 head: sum of 4 dilated 3x3 conv branches."""

    num_classes: int
    dilation_series: Sequence[int] = (6, 12, 18, 24)

    @nn.compact
    def __call__(self, x, size: Optional[Tuple[int, int]] = None,
                 train: bool = False):
        del train
        out = None
        for i, d in enumerate(self.dilation_series):
            branch = Conv2d(
                self.num_classes, 3, padding=d, dilation=d, use_bias=True,
                kernel_init=nn.initializers.normal(0.01),
                name=f"conv2d_{i}",
            )(x)
            out = branch if out is None else out + branch
        if size is not None:
            out = resize_bilinear(out.astype(jnp.float32), size, align_corners=True)
        return out
