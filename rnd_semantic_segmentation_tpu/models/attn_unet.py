"""Attention-EfficientNet-UNet (the "attn" model family).

Semantics from /root/reference/core/models/classifiers/attn/eff.py:13-158 and
attn/attn.py:5-46:
  * EfficientNet encoder endpoints reduction_1..5
  * AdditiveAttnGate: alpha = sigmoid(conv(ReLU(conv_g(g) + conv_x(up2x(x)))))
    downsampled 0.5x and multiplied onto x (all bilinear align_corners=False)
  * UNet decoder: ConvTranspose2d(4,2,1,bias=False) upsamplers, 2x(conv3x3+BN+
    LeakyReLU) decode blocks, per-level 1x1 heads -> 5 outputs at scales
    (1, 1/2, 1/4, 1/8, 1/16)  [eff.py:94-96 output_scales]
  * (eff.py:39-43 defines decode_0 but the forward never calls it; we keep
    forward parity and omit it)
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax.numpy as jnp
from flax import linen as nn

from ..ops import resize_bilinear, scaled_size
from .efficientnet import EfficientNetEncoder, head_channels
from .layers import BatchNorm, Conv2d, ConvTranspose2d, leaky_relu

_DEPTH_MAP = {
    # d5 (head), d4, d3, d2, d1, d0 — eff.py:66-74
    "efficientnet-b0": (1280, 112, 40, 24, 16, 8),
    "efficientnet-b1": (1280, 112, 40, 24, 16, 8),
    "efficientnet-b2": (1408, 120, 48, 24, 16, 8),
    "efficientnet-b3": (1536, 136, 48, 32, 24, 12),
    "efficientnet-b4": (1792, 160, 56, 32, 24, 12),
}


class AdditiveAttnGate(nn.Module):
    x_channels: int
    g_channels: int

    @nn.compact
    def __call__(self, x, g, train: bool = False):
        del train
        up_x = resize_bilinear(x.astype(jnp.float32),
                               (x.shape[1] * 2, x.shape[2] * 2)).astype(x.dtype)
        out_g = Conv2d(self.g_channels, 1, use_bias=True, name="conv_g")(g)
        out_x = Conv2d(self.g_channels, 1, use_bias=False, name="conv_x")(up_x)
        alpha = nn.relu(out_g + out_x)
        alpha = Conv2d(self.x_channels, 1, use_bias=True, name="conv_group")(alpha)
        alpha = nn.sigmoid(alpha)
        alpha = resize_bilinear(alpha.astype(jnp.float32),
                                (x.shape[1], x.shape[2])).astype(x.dtype)
        return alpha * x


class _DecodeBlock(nn.Module):
    out_channels: int
    bn_axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        ax = self.bn_axis_name
        x = Conv2d(self.out_channels // 2, 3, padding=1, name="conv0")(x)
        x = leaky_relu(BatchNorm(axis_name=ax, name="bn0")(x, train))
        x = Conv2d(self.out_channels, 3, padding=1, name="conv1")(x)
        x = leaky_relu(BatchNorm(axis_name=ax, name="bn1")(x, train))
        return x


class AttnDecoder(nn.Module):
    backbone_name: str = "efficientnet-b2"
    num_classes: int = 2
    bn_axis_name: Optional[str] = None

    output_scales = (1.0, 0.5, 0.25, 0.125, 0.0625)

    @nn.compact
    def __call__(self, endpoints: Dict[str, jnp.ndarray], train: bool = False):
        d5, d4, d3, d2, d1, d0 = _DEPTH_MAP[self.backbone_name]
        ax = self.bn_axis_name
        nc = self.num_classes

        encode_4 = endpoints["reduction_4"]
        encode_3 = endpoints["reduction_3"]
        encode_2 = endpoints["reduction_2"]
        encode_1 = endpoints["reduction_1"]
        middle = endpoints["reduction_5"]

        attn_middle = AdditiveAttnGate(d5, d4, name="attn_mid")(middle, encode_4)
        up_middle = ConvTranspose2d(d4, 4, 2, 1, use_bias=False,
                                    name="mid_upsampler")(attn_middle)

        merged_4 = jnp.concatenate([encode_4, up_middle], axis=-1)
        decode_4 = _DecodeBlock(d4, bn_axis_name=ax, name="decode_4")(merged_4, train)
        attn_4 = AdditiveAttnGate(d4, d3, name="attn_4")(decode_4, encode_3)
        out_4 = Conv2d(nc, 1, name="out_4")(decode_4)
        up_4 = ConvTranspose2d(d3, 4, 2, 1, use_bias=False, name="ups_4")(attn_4)

        merged_3 = jnp.concatenate([encode_3, up_4], axis=-1)
        decode_3 = _DecodeBlock(d3, bn_axis_name=ax, name="decode_3")(merged_3, train)
        attn_3 = AdditiveAttnGate(d3, d2, name="attn_3")(decode_3, encode_2)
        out_3 = Conv2d(nc, 1, name="out_3")(decode_3)
        up_3 = ConvTranspose2d(d2, 4, 2, 1, use_bias=False, name="ups_3")(attn_3)

        merged_2 = jnp.concatenate([encode_2, up_3], axis=-1)
        decode_2 = _DecodeBlock(d2, bn_axis_name=ax, name="decode_2")(merged_2, train)
        attn_2 = AdditiveAttnGate(d2, d1, name="attn_2")(decode_2, encode_1)
        out_2 = Conv2d(nc, 1, name="out_2")(decode_2)
        up_2 = ConvTranspose2d(d1, 4, 2, 1, use_bias=False, name="ups_2")(attn_2)

        merged_1 = jnp.concatenate([encode_1, up_2], axis=-1)
        decode_1 = _DecodeBlock(d1, bn_axis_name=ax, name="decode_1")(merged_1, train)
        out_1 = Conv2d(nc, 1, name="out_1")(decode_1)
        up_1 = ConvTranspose2d(d0, 4, 2, 1, use_bias=False, name="ups_1")(decode_1)

        out_0 = Conv2d(nc, 1, name="out_0")(up_1)
        return out_0, out_1, out_2, out_3, out_4


class AttnEfficientNetUnet(nn.Module):
    """Single-module variant (eff.py:150-158, AttnWrapTrainer's model)."""

    backbone_name: str = "efficientnet-b2"
    num_classes: int = 2
    bn_axis_name: Optional[str] = None
    remat_blocks: bool = False  # MODEL.REMAT_BLOCKS (see EfficientNetEncoder)

    @nn.compact
    def __call__(self, x, train: bool = False):
        endpoints = EfficientNetEncoder(self.backbone_name,
                                        remat_blocks=self.remat_blocks,
                                        name="encoder")(x, train)
        return AttnDecoder(self.backbone_name, self.num_classes,
                           self.bn_axis_name, name="decoder")(endpoints, train)
