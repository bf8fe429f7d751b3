"""Dilated ResNet backbones (torchvision-compatible graph).

Re-implements the semantics of /root/reference/core/components/resnet.py
(ResNet18/34/50/101/152 + ResNeXt variants, injectable norm layer,
``replace_stride_with_dilation``) as Flax modules on NHWC.  The DeepLabV2
feature extractor uses ``replace_stride_with_dilation=[False, True, True]``
for an output-stride-8 backbone tapped at layer4
(/root/reference/core/models/feature_extractor.py:34-52).
"""

from __future__ import annotations

from typing import Callable, Dict, Optional, Sequence, Tuple

import jax.numpy as jnp
from flax import linen as nn

from .layers import Conv2d, make_norm, relu
from ..ops import max_pool


class BasicBlock(nn.Module):
    planes: int
    stride: int = 1
    dilation: int = 1
    has_downsample: bool = False
    norm: Callable = None

    expansion = 1

    @nn.compact
    def __call__(self, x, train: bool = False):
        identity = x
        out = Conv2d(self.planes, 3, self.stride, padding=1, use_bias=False, name="conv1")(x)
        out = self.norm(name="bn1")(out, train)
        out = relu(out)
        out = Conv2d(self.planes, 3, 1, padding=1, use_bias=False, name="conv2")(out)
        out = self.norm(name="bn2")(out, train)
        if self.has_downsample:
            identity = Conv2d(self.planes, 1, self.stride, use_bias=False, name="downsample_conv")(x)
            identity = self.norm(name="downsample_bn")(identity, train)
        return relu(out + identity)


class Bottleneck(nn.Module):
    planes: int
    stride: int = 1
    dilation: int = 1
    has_downsample: bool = False
    groups: int = 1
    base_width: int = 64
    norm: Callable = None

    expansion = 4

    @nn.compact
    def __call__(self, x, train: bool = False):
        width = int(self.planes * (self.base_width / 64.0)) * self.groups
        identity = x
        out = Conv2d(width, 1, use_bias=False, name="conv1")(x)
        out = self.norm(name="bn1")(out, train)
        out = relu(out)
        out = Conv2d(width, 3, self.stride, padding=self.dilation,
                     dilation=self.dilation, groups=self.groups,
                     use_bias=False, name="conv2")(out)
        out = self.norm(name="bn2")(out, train)
        out = relu(out)
        out = Conv2d(self.planes * 4, 1, use_bias=False, name="conv3")(out)
        out = self.norm(name="bn3")(out, train)
        if self.has_downsample:
            identity = Conv2d(self.planes * 4, 1, self.stride, use_bias=False,
                              name="downsample_conv")(x)
            identity = self.norm(name="downsample_bn")(identity, train)
        return relu(out + identity)


_ARCHS = {
    # name: (block, layers, groups, width_per_group)
    "resnet18": (BasicBlock, (2, 2, 2, 2), 1, 64),
    "resnet34": (BasicBlock, (3, 4, 6, 3), 1, 64),
    "resnet50": (Bottleneck, (3, 4, 6, 3), 1, 64),
    "resnet101": (Bottleneck, (3, 4, 23, 3), 1, 64),
    "resnet152": (Bottleneck, (3, 8, 36, 3), 1, 64),
    "resnext50_32x4d": (Bottleneck, (3, 4, 6, 3), 32, 4),
    "resnext101_32x8d": (Bottleneck, (3, 4, 23, 3), 32, 8),
}


class ResNet(nn.Module):
    """torchvision-graph ResNet returning tapped intermediate features.

    ``return_layers`` maps torchvision child names ('layer1'..'layer4') to
    output keys — the TPU-native IntermediateLayerGetter
    (reference feature_extractor.py:45-48).
    """

    arch: str = "resnet101"
    replace_stride_with_dilation: Tuple[bool, bool, bool] = (False, False, False)
    norm_kind: str = "bn"
    bn_axis_name: Optional[str] = None
    return_layers: Tuple[str, ...] = ("layer4",)
    # MODEL.REMAT_BLOCKS: per-residual-block rematerialization (only block
    # boundaries stay resident through the backward).  Identical param tree
    # and numerics; see configs/defaults.py + PROBE_REMAT.json.
    remat_blocks: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False) -> Dict[str, jnp.ndarray]:
        block, layer_sizes, groups, base_width = _ARCHS[self.arch]
        block_cls = (nn.remat(block, static_argnums=(2,))
                     if self.remat_blocks else block)
        norm = make_norm(self.norm_kind, self.bn_axis_name)

        x = Conv2d(64, 7, 2, padding=3, use_bias=False, name="conv1")(x)
        x = norm(name="bn1")(x, train)
        x = relu(x)
        x = max_pool(x, 3, 2, padding=1)

        taps: Dict[str, jnp.ndarray] = {}
        inplanes = 64
        dilation = 1
        for idx, (planes, blocks) in enumerate(zip((64, 128, 256, 512), layer_sizes)):
            stride = 1 if idx == 0 else 2
            prev_dilation = dilation  # torchvision: first block keeps pre-stage dilation
            if idx > 0 and self.replace_stride_with_dilation[idx - 1]:
                dilation *= stride
                stride = 1
            for b in range(blocks):
                s = stride if b == 0 else 1
                has_ds = b == 0 and (s != 1 or inplanes != planes * block.expansion)
                d = prev_dilation if b == 0 else dilation
                x = block_cls(
                    planes=planes, stride=s, dilation=d, has_downsample=has_ds,
                    norm=norm, name=f"layer{idx + 1}_{b}",
                    **({"groups": groups, "base_width": base_width}
                       if block is Bottleneck else {}),
                )(x, train)
                inplanes = planes * block.expansion
            name = f"layer{idx + 1}"
            if name in self.return_layers:
                taps[name] = x
        return taps


def output_channels(arch: str) -> int:
    block, _, _, _ = _ARCHS[arch]
    return 512 * block.expansion
