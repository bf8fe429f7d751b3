"""Res2Net-v1b backbone (deep stem, avg-pool downsample paths).

Semantics from /root/reference/core/models/classifiers/pranet/Res2Net_v1b.py:
``Bottle2neck`` multi-scale split-conv-concat residual (scale=4, baseWidth=26,
:15-91), deep-stem conv1 (:101-109), avg-pool downsample in ``_make_layer``
(:128-136).  Returns the layer taps PraNet consumes (:147-155 of
PraNet_Res2Net.py).
"""

from __future__ import annotations

import math
from typing import Dict, Optional, Tuple

import jax.numpy as jnp
from flax import linen as nn

from ..ops import avg_pool, max_pool
from .layers import BatchNorm, Conv2d, relu


class Bottle2neck(nn.Module):
    planes: int
    stride: int = 1
    has_downsample: bool = False
    base_width: int = 26
    scale: int = 4
    stype: str = "normal"
    bn_axis_name: Optional[str] = None

    expansion = 4

    @nn.compact
    def __call__(self, x, train: bool = False):
        ax = self.bn_axis_name
        width = int(math.floor(self.planes * (self.base_width / 64.0)))
        nums = 1 if self.scale == 1 else self.scale - 1
        residual = x

        out = Conv2d(width * self.scale, 1, use_bias=False, name="conv1")(x)
        out = BatchNorm(axis_name=ax, name="bn1")(out, train)
        out = relu(out)

        spx = jnp.split(out, self.scale, axis=-1)
        outs = []
        sp = None
        for i in range(nums):
            sp = spx[i] if (i == 0 or self.stype == "stage") else sp + spx[i]
            sp = Conv2d(width, 3, self.stride, padding=1, use_bias=False,
                        name=f"convs_{i}")(sp)
            sp = relu(BatchNorm(axis_name=ax, name=f"bns_{i}")(sp, train))
            outs.append(sp)
        if self.scale != 1 and self.stype == "normal":
            outs.append(spx[nums])
        elif self.scale != 1 and self.stype == "stage":
            outs.append(avg_pool(spx[nums], 3, self.stride, padding=1))
        out = jnp.concatenate(outs, axis=-1)

        out = Conv2d(self.planes * 4, 1, use_bias=False, name="conv3")(out)
        out = BatchNorm(axis_name=ax, name="bn3")(out, train)

        if self.has_downsample:
            # AvgPool(k=stride, s=stride, ceil, count_include_pad=False) -> 1x1 conv -> BN
            residual = avg_pool(x, self.stride, self.stride, padding=0,
                                count_include_pad=False) if self.stride > 1 else x
            residual = Conv2d(self.planes * 4, 1, use_bias=False,
                              name="downsample_conv")(residual)
            residual = BatchNorm(axis_name=ax, name="downsample_bn")(residual, train)
        return relu(out + residual)


class Res2Net(nn.Module):
    """res2net50_v1b_26w_4s graph; taps layer1..layer4.

    ``gc_blocks=True`` gives the Res2Net_GC variant (encoders/res2net.py:286-
    340): a GCNet ContextBlock2d prepended to layers 2-4.
    """

    layers: Tuple[int, int, int, int] = (3, 4, 6, 3)
    base_width: int = 26
    scale: int = 4
    gc_blocks: bool = False
    bn_axis_name: Optional[str] = None
    remat_blocks: bool = False  # MODEL.REMAT_BLOCKS (see resnet.py)

    @nn.compact
    def __call__(self, x, train: bool = False) -> Dict[str, jnp.ndarray]:
        block_cls = (nn.remat(Bottle2neck, static_argnums=(2,))
                     if self.remat_blocks else Bottle2neck)
        ax = self.bn_axis_name
        # deep stem (Res2Net_v1b.py:101-109)
        x = Conv2d(32, 3, 2, padding=1, use_bias=False, name="stem_conv0")(x)
        x = relu(BatchNorm(axis_name=ax, name="stem_bn0")(x, train))
        x = Conv2d(32, 3, 1, padding=1, use_bias=False, name="stem_conv1")(x)
        x = relu(BatchNorm(axis_name=ax, name="stem_bn1")(x, train))
        x = Conv2d(64, 3, 1, padding=1, use_bias=False, name="stem_conv2")(x)
        x = relu(BatchNorm(axis_name=ax, name="bn1")(x, train))
        x = max_pool(x, 3, 2, padding=1)

        taps: Dict[str, jnp.ndarray] = {}
        inplanes = 64
        for idx, (planes, blocks) in enumerate(zip((64, 128, 256, 512), self.layers)):
            stride = 1 if idx == 0 else 2
            if self.gc_blocks and idx > 0:
                from .contextagg import ContextBlock2d
                x = ContextBlock2d(planes=inplanes,
                                   name=f"layer{idx + 1}_gcb")(x, train)
            for b in range(blocks):
                s = stride if b == 0 else 1
                has_ds = b == 0 and (stride != 1 or inplanes != planes * 4)
                x = block_cls(
                    planes=planes, stride=s, has_downsample=has_ds,
                    base_width=self.base_width, scale=self.scale,
                    stype="stage" if b == 0 else "normal",
                    bn_axis_name=ax, name=f"layer{idx + 1}_{b}",
                )(x, train)
                inplanes = planes * 4
            taps[f"layer{idx + 1}"] = x
        return taps
