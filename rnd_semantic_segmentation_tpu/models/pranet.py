"""PraNet: parallel reverse-attention network for polyp segmentation.

Semantics from /root/reference/core/models/classifiers/pranet/PraNet_Res2Net.py:
  * BasicConv2d = conv + BN, **no activation in forward** (:7-19 — the relu
    member is defined but unused)
  * RFB_modified receptive-field blocks (:22-59)
  * partial decoder ``aggregation`` (:61-95)
  * 3 reverse-attention branches: mask = -sigmoid(crop)+1 broadcast-multiplied
    onto backbone features (:147-177)
  * outputs 4 lateral maps upsampled x8/x32/x16/x8 with default
    align_corners=False bilinear (:141-179)
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax.numpy as jnp
from flax import linen as nn

from ..ops import resize_bilinear, scaled_size
from .layers import BatchNorm, Conv2d, relu
from .res2net import Res2Net


class BasicConv2d(nn.Module):
    features: int
    kernel_size: Tuple[int, int] | int = 1
    stride: int = 1
    padding: Tuple[int, int] | int = 0
    dilation: int = 1
    bn_axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = Conv2d(self.features, self.kernel_size, self.stride,
                   padding=self.padding, dilation=self.dilation,
                   use_bias=False, name="conv")(x)
        return BatchNorm(axis_name=self.bn_axis_name, name="bn")(x, train)


class RFBModified(nn.Module):
    out_channel: int
    bn_axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        ax = self.bn_axis_name
        oc = self.out_channel
        b0 = BasicConv2d(oc, 1, bn_axis_name=ax, name="branch0_0")(x, train)

        b1 = BasicConv2d(oc, 1, bn_axis_name=ax, name="branch1_0")(x, train)
        b1 = BasicConv2d(oc, (1, 3), padding=(0, 1), bn_axis_name=ax, name="branch1_1")(b1, train)
        b1 = BasicConv2d(oc, (3, 1), padding=(1, 0), bn_axis_name=ax, name="branch1_2")(b1, train)
        b1 = BasicConv2d(oc, 3, padding=3, dilation=3, bn_axis_name=ax, name="branch1_3")(b1, train)

        b2 = BasicConv2d(oc, 1, bn_axis_name=ax, name="branch2_0")(x, train)
        b2 = BasicConv2d(oc, (1, 5), padding=(0, 2), bn_axis_name=ax, name="branch2_1")(b2, train)
        b2 = BasicConv2d(oc, (5, 1), padding=(2, 0), bn_axis_name=ax, name="branch2_2")(b2, train)
        b2 = BasicConv2d(oc, 3, padding=5, dilation=5, bn_axis_name=ax, name="branch2_3")(b2, train)

        b3 = BasicConv2d(oc, 1, bn_axis_name=ax, name="branch3_0")(x, train)
        b3 = BasicConv2d(oc, (1, 7), padding=(0, 3), bn_axis_name=ax, name="branch3_1")(b3, train)
        b3 = BasicConv2d(oc, (7, 1), padding=(3, 0), bn_axis_name=ax, name="branch3_2")(b3, train)
        b3 = BasicConv2d(oc, 3, padding=7, dilation=7, bn_axis_name=ax, name="branch3_3")(b3, train)

        cat = BasicConv2d(oc, 3, padding=1, bn_axis_name=ax, name="conv_cat")(
            jnp.concatenate([b0, b1, b2, b3], axis=-1), train)
        res = BasicConv2d(oc, 1, bn_axis_name=ax, name="conv_res")(x, train)
        return relu(cat + res)


class Aggregation(nn.Module):
    """Dense partial decoder (PraNet_Res2Net.py:61-95).

    Uses align_corners=True 2x upsampling (``nn.Upsample(scale_factor=2,
    align_corners=True)``).
    """

    channel: int
    bn_axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x1, x2, x3, train: bool = False):
        ax = self.bn_axis_name
        ch = self.channel

        def up(v):
            return resize_bilinear(v.astype(jnp.float32),
                                   (v.shape[1] * 2, v.shape[2] * 2),
                                   align_corners=True).astype(v.dtype)

        x1_1 = x1
        x2_1 = BasicConv2d(ch, 3, padding=1, bn_axis_name=ax,
                           name="conv_upsample1")(up(x1), train) * x2
        x3_1 = (BasicConv2d(ch, 3, padding=1, bn_axis_name=ax,
                            name="conv_upsample2")(up(up(x1)), train)
                * BasicConv2d(ch, 3, padding=1, bn_axis_name=ax,
                              name="conv_upsample3")(up(x2), train) * x3)

        x2_2 = jnp.concatenate(
            [x2_1, BasicConv2d(ch, 3, padding=1, bn_axis_name=ax,
                               name="conv_upsample4")(up(x1_1), train)], axis=-1)
        x2_2 = BasicConv2d(2 * ch, 3, padding=1, bn_axis_name=ax,
                           name="conv_concat2")(x2_2, train)

        x3_2 = jnp.concatenate(
            [x3_1, BasicConv2d(2 * ch, 3, padding=1, bn_axis_name=ax,
                               name="conv_upsample5")(up(x2_2), train)], axis=-1)
        x3_2 = BasicConv2d(3 * ch, 3, padding=1, bn_axis_name=ax,
                           name="conv_concat3")(x3_2, train)

        x = BasicConv2d(3 * ch, 3, padding=1, bn_axis_name=ax, name="conv4")(x3_2, train)
        return Conv2d(1, 1, name="conv5")(x)


class PraNet(nn.Module):
    """Res2Net50-v1b encoder + partial decoder + 3 reverse-attention branches.

    ``backbone="resnet50"`` yields the CRANet variant
    (/root/reference/core/models/classifiers/pranet/PraNet_ResNet.py:102-237):
    identical decoder on a plain ResNet50 (same tap channels 256/512/1024/2048).
    """

    channel: int = 32
    backbone: str = "res2net50"
    bn_axis_name: Optional[str] = None
    # when True, also return the layer4 backbone features as a 5th element —
    # the FADA discriminator tap (the reference's train_adv.py:52-53 dispatches
    # to an undefined PraNetFada; here the pranet adversarial path works)
    with_tap: bool = False
    remat_blocks: bool = False  # MODEL.REMAT_BLOCKS (see resnet.py)

    @nn.compact
    def __call__(self, x, train: bool = False):
        ax = self.bn_axis_name
        if self.backbone == "res2net50":
            taps = Res2Net(bn_axis_name=ax, remat_blocks=self.remat_blocks,
                           name="resnet")(x, train)
        else:
            from .resnet import ResNet
            taps = ResNet(arch=self.backbone, bn_axis_name=ax,
                          return_layers=("layer1", "layer2", "layer3", "layer4"),
                          remat_blocks=self.remat_blocks,
                          name="resnet")(x, train)
        x1, x2, x3, x4 = taps["layer1"], taps["layer2"], taps["layer3"], taps["layer4"]

        x2_rfb = RFBModified(self.channel, bn_axis_name=ax, name="rfb2_1")(x2, train)
        x3_rfb = RFBModified(self.channel, bn_axis_name=ax, name="rfb3_1")(x3, train)
        x4_rfb = RFBModified(self.channel, bn_axis_name=ax, name="rfb4_1")(x4, train)

        ra5_feat = Aggregation(self.channel, bn_axis_name=ax, name="agg1")(
            x4_rfb, x3_rfb, x2_rfb, train)

        def scale(v, s):
            return resize_bilinear(v.astype(jnp.float32),
                                   scaled_size(v.shape[1:3], s),
                                   align_corners=False)

        lateral_map_5 = scale(ra5_feat, 8.0)

        # branch 4
        crop_4 = scale(ra5_feat, 0.25).astype(x4.dtype)
        h = (-nn.sigmoid(crop_4) + 1.0) * x4  # broadcast over channels
        h = BasicConv2d(256, 1, bn_axis_name=ax, name="ra4_conv1")(h, train)
        h = relu(BasicConv2d(256, 5, padding=2, bn_axis_name=ax, name="ra4_conv2")(h, train))
        h = relu(BasicConv2d(256, 5, padding=2, bn_axis_name=ax, name="ra4_conv3")(h, train))
        h = relu(BasicConv2d(256, 5, padding=2, bn_axis_name=ax, name="ra4_conv4")(h, train))
        ra4_feat = BasicConv2d(1, 1, bn_axis_name=ax, name="ra4_conv5")(h, train)
        h = ra4_feat + crop_4
        lateral_map_4 = scale(h, 32.0)

        # branch 3
        crop_3 = scale(h, 2.0).astype(x3.dtype)
        h = (-nn.sigmoid(crop_3) + 1.0) * x3
        h = BasicConv2d(64, 1, bn_axis_name=ax, name="ra3_conv1")(h, train)
        h = relu(BasicConv2d(64, 3, padding=1, bn_axis_name=ax, name="ra3_conv2")(h, train))
        h = relu(BasicConv2d(64, 3, padding=1, bn_axis_name=ax, name="ra3_conv3")(h, train))
        ra3_feat = BasicConv2d(1, 3, padding=1, bn_axis_name=ax, name="ra3_conv4")(h, train)
        h = ra3_feat + crop_3
        lateral_map_3 = scale(h, 16.0)

        # branch 2
        crop_2 = scale(h, 2.0).astype(x2.dtype)
        h = (-nn.sigmoid(crop_2) + 1.0) * x2
        h = BasicConv2d(64, 1, bn_axis_name=ax, name="ra2_conv1")(h, train)
        h = relu(BasicConv2d(64, 3, padding=1, bn_axis_name=ax, name="ra2_conv2")(h, train))
        h = relu(BasicConv2d(64, 3, padding=1, bn_axis_name=ax, name="ra2_conv3")(h, train))
        ra2_feat = BasicConv2d(1, 3, padding=1, bn_axis_name=ax, name="ra2_conv4")(h, train)
        h = ra2_feat + crop_2
        lateral_map_2 = scale(h, 8.0)

        if self.with_tap:
            return lateral_map_5, lateral_map_4, lateral_map_3, lateral_map_2, x4
        return lateral_map_5, lateral_map_4, lateral_map_3, lateral_map_2
