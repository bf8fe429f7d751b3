"""Classification-network hubs from the research zoo.

  * ``NLResNet`` — CIFAR-style ResNet (3x3 stride-1 stem, no maxpool, 4x4
    avg-pool head) with an optional ``NLBlockND`` inserted before the last
    block of layer3 (nonlocal.py:251-323).
  * ``CGNLResNet`` — ImageNet-style bottleneck ResNet with an optional
    SpatialNL / SpatialCGNL / SpatialCGNLx block inserted before the last
    block of layer3 (cgnonlocal.py:390-552; insertion points i==5/22/35 for
    50/101/152).

Both reuse the parity-tested residual blocks (models/resnet.py) and NL blocks
(models/zoo.py, models/gcpa.py); the hubs are the selectable network-level
wrappers the reference exposes for classification experiments.

Deviation noted: the reference NL-ResNet passes ``planes`` (not
``planes * expansion``) as NLBlockND's channel count, which crashes for its
own Bottleneck variants; our NLBlockND infers channels from the input, so all
depths work here.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax.numpy as jnp
from flax import linen as nn

from ..ops import avg_pool, max_pool
from .gcpa import SpatialCGNL
from .layers import BatchNorm, Conv2d, make_norm, relu
from .resnet import BasicBlock, Bottleneck
from .zoo import NLBlockND, SpatialCGNLx, SpatialNL

_NL_ARCHS = {
    "resnet18": (BasicBlock, (2, 2, 2, 2), 1),
    "resnet34": (BasicBlock, (3, 4, 6, 3), 1),
    "resnet50": (Bottleneck, (3, 4, 6, 3), 4),
    "resnet101": (Bottleneck, (3, 4, 23, 3), 4),
    "resnet152": (Bottleneck, (3, 8, 36, 3), 4),
}


class NLResNet(nn.Module):
    """CIFAR-style (non-local) classification ResNet (nonlocal.py:251-295)."""

    arch: str = "resnet18"
    num_classes: int = 10
    non_local: bool = False
    bn_axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        block, layers, expansion = _NL_ARCHS[self.arch]
        ax = self.bn_axis_name
        norm = make_norm("bn", ax)
        x = Conv2d(64, 3, 1, padding=1, use_bias=False, name="conv1")(x)
        x = relu(BatchNorm(axis_name=ax, name="bn1")(x, train))

        inplanes = 64
        for idx, (planes, blocks) in enumerate(zip((64, 128, 256, 512), layers)):
            stride = 1 if idx == 0 else 2
            insert_nl = self.non_local and idx == 2   # layer3
            for b in range(blocks):
                if insert_nl and b == blocks - 1:
                    x = NLBlockND(mode="embedded", name=f"layer{idx + 1}_nl")(x, train)
                s = stride if b == 0 else 1
                has_ds = b == 0 and (s != 1 or inplanes != planes * expansion)
                x = block(planes=planes, stride=s, has_downsample=has_ds,
                          norm=norm, name=f"layer{idx + 1}_{b}")(x, train)
                inplanes = planes * expansion

        x = avg_pool(x, 4, 4)
        x = x.reshape(x.shape[0], -1)
        return nn.Dense(self.num_classes, name="linear")(x)


class CGNLResNet(nn.Module):
    """ImageNet-style ResNet with NL/CGNL/CGNLx context in layer3
    (cgnonlocal.py:390-505).  ``nl_type`` in {None, "nl", "cgnl", "cgnlx"};
    ``nl_nums=1`` inserts one block before layer3's last residual unit."""

    arch: str = "resnet50"
    num_classes: int = 1000
    nl_type: Optional[str] = None
    nl_nums: int = 0
    pool_size: int = 7
    dropout_rate: float = 0.5
    bn_axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        _, layers, _ = _NL_ARCHS[self.arch]
        ax = self.bn_axis_name
        norm = make_norm("bn", ax)
        x = Conv2d(64, 7, 2, padding=3, use_bias=False, name="conv1")(x)
        x = relu(BatchNorm(axis_name=ax, name="bn1")(x, train))
        x = max_pool(x, 3, 2, padding=1)

        inplanes = 64
        for idx, (planes, blocks) in enumerate(zip((64, 128, 256, 512), layers)):
            stride = 1 if idx == 0 else 2
            insert_nl = bool(self.nl_nums) and self.nl_type and idx == 2
            for b in range(blocks):
                if insert_nl and b == blocks - 1:
                    x = self._nl_block(inplanes, f"layer{idx + 1}_nl")(x, train)
                s = stride if b == 0 else 1
                has_ds = b == 0 and (s != 1 or inplanes != planes * 4)
                x = Bottleneck(planes=planes, stride=s, has_downsample=has_ds,
                               norm=norm, name=f"layer{idx + 1}_{b}")(x, train)
                inplanes = planes * 4

        x = avg_pool(x, self.pool_size, 1)
        x = x.reshape(x.shape[0], -1)
        if train and self.dropout_rate > 0:
            x = nn.Dropout(self.dropout_rate, deterministic=False)(x)
        return nn.Dense(self.num_classes, name="fc")(x)

    def _nl_block(self, inplanes: int, name: str):
        half = inplanes // 2
        if self.nl_type == "nl":
            return SpatialNL(half, use_scale=True, name=name)
        if self.nl_type == "cgnl":
            return SpatialCGNL(half, groups=8, use_scale=False, name=name)
        if self.nl_type == "cgnlx":
            return SpatialCGNLx(half, groups=8, order=3, use_scale=False, name=name)
        raise ValueError(f"unknown nl_type {self.nl_type!r}")
