"""Full research segmentation nets sharing the CCNet-style dilated backbone.

GALDNet / CCNet Seg_Model / PSPNet / DualSeg in the reference all wrap the
same deep-stem dilated ResNet (3-conv 128ch stem, OS8 via layer3 dilation 2 +
layer4 dilation 4 with multi-grid (1,2,4), ceil-mode stem pool) with a head +
a layer3 DSN auxiliary classifier:
  * GALDNet — GALDHead(2048->512) (contextagg/GALDNet.py:288-394)
  * CCNet (Seg_Model) — RCCAModule with recurrence 2 (ccnet.py:239-345)
  * PSPNet — PSPModule + classifier (PSPNet.py)
  * DualSeg — DualGCNHead (DualGCNNet.py)

Each returns [main_logits, dsn_logits] at the OS8 feature resolution like the
reference (upsampling to label size is the caller's business).
"""

from __future__ import annotations

from typing import Callable, Optional, Tuple

import jax.numpy as jnp
from flax import linen as nn

from ..ops import max_pool
from .contextagg import GALDHead, PSPModule
from .layers import BatchNorm, Conv2d, relu
from .zoo import DualGCNHead, RCCAModule


class _CCBottleneck(nn.Module):
    """CCNet-style bottleneck: conv2 dilation = dilation*multi_grid
    (GALDNet.py:188-243)."""

    planes: int
    stride: int = 1
    dilation: int = 1
    multi_grid: int = 1
    has_downsample: bool = False
    bn_axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        ax = self.bn_axis_name
        d = self.dilation * self.multi_grid
        identity = x
        out = Conv2d(self.planes, 1, use_bias=False, name="conv1")(x)
        out = relu(BatchNorm(axis_name=ax, name="bn1")(out, train))
        out = Conv2d(self.planes, 3, self.stride, padding=d, dilation=d,
                     use_bias=False, name="conv2")(out)
        out = relu(BatchNorm(axis_name=ax, name="bn2")(out, train))
        out = Conv2d(self.planes * 4, 1, use_bias=False, name="conv3")(out)
        out = BatchNorm(axis_name=ax, name="bn3")(out, train)
        if self.has_downsample:
            identity = Conv2d(self.planes * 4, 1, self.stride, use_bias=False,
                              name="downsample_conv")(x)
            identity = BatchNorm(axis_name=ax, name="downsample_bn")(identity, train)
        return relu(out + identity)


class DilatedSegBackbone(nn.Module):
    """Deep-stem OS8 ResNet; returns (layer3, layer4) taps."""

    layers: Tuple[int, int, int, int] = (3, 4, 23, 3)
    layer4_grids: Tuple[int, ...] = (1, 2, 4)
    bn_axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        ax = self.bn_axis_name
        for i, (w, s) in enumerate(((64, 2), (64, 1), (128, 1))):
            x = Conv2d(w, 3, s, padding=1, use_bias=False, name=f"stem_conv{i}")(x)
            if i < 2:
                x = relu(BatchNorm(axis_name=ax, name=f"stem_bn{i}")(x, train))
        x = relu(BatchNorm(axis_name=ax, name="bn1")(x, train))
        x = max_pool(x, 3, 2, padding=1)

        inplanes = 128
        taps = {}
        plan = (
            ("layer1", 64, self.layers[0], 1, 1, None),
            ("layer2", 128, self.layers[1], 2, 1, None),
            ("layer3", 256, self.layers[2], 1, 2, None),
            ("layer4", 512, self.layers[3], 1, 4, self.layer4_grids),
        )
        for name, planes, blocks, stride, dilation, grids in plan:
            for b in range(blocks):
                s = stride if b == 0 else 1
                mg = grids[b % len(grids)] if grids else 1
                has_ds = b == 0 and (stride != 1 or inplanes != planes * 4)
                x = _CCBottleneck(planes=planes, stride=s, dilation=dilation,
                                  multi_grid=mg, has_downsample=has_ds,
                                  bn_axis_name=ax, name=f"{name}_{b}")(x, train)
                inplanes = planes * 4
            taps[name] = x
        return taps["layer3"], taps["layer4"]


class _DSN(nn.Module):
    """Auxiliary layer3 classifier (GALDNet.py:312-318)."""

    num_classes: int
    bn_axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = Conv2d(512, 3, padding=1, name="conv")(x)
        x = relu(BatchNorm(axis_name=self.bn_axis_name, name="bn")(x, train))
        return Conv2d(self.num_classes, 1, name="cls")(x)


class GALDNetFull(nn.Module):
    num_classes: int = 19
    layers: Tuple[int, int, int, int] = (3, 4, 23, 3)
    bn_axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        l3, l4 = DilatedSegBackbone(self.layers, self.bn_axis_name,
                                    name="backbone")(x, train)
        dsn = _DSN(self.num_classes, self.bn_axis_name, name="dsn")(l3, train)
        out = GALDHead(512, self.num_classes, self.bn_axis_name,
                       name="head")(l4, train)
        return out, dsn


class CCNetSegModel(nn.Module):
    num_classes: int = 19
    recurrence: int = 2
    layers: Tuple[int, int, int, int] = (3, 4, 23, 3)
    bn_axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        l3, l4 = DilatedSegBackbone(self.layers, self.bn_axis_name,
                                    name="backbone")(x, train)
        dsn = _DSN(self.num_classes, self.bn_axis_name, name="dsn")(l3, train)
        out = RCCAModule(512, self.num_classes, recurrence=self.recurrence,
                         bn_axis_name=self.bn_axis_name, name="head")(l4, train)
        return out, dsn


class PSPNetFull(nn.Module):
    num_classes: int = 19
    layers: Tuple[int, int, int, int] = (3, 4, 23, 3)
    bn_axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        l3, l4 = DilatedSegBackbone(self.layers, self.bn_axis_name,
                                    name="backbone")(x, train)
        dsn = _DSN(self.num_classes, self.bn_axis_name, name="dsn")(l3, train)
        out = PSPModule(512, bn_axis_name=self.bn_axis_name, name="head")(l4, train)
        out = Conv2d(self.num_classes, 1, name="cls")(out)
        return out, dsn


class PSPHead(nn.Module):
    """ICNet's encoder head (PSPNet.py:231-316): the same deep-stem dilated
    backbone but with layer4 multi_grid (1,1,1), topped by PSPModule(->512).
    Returns the 512-ch OS8 feature map (ICNet consumes features, not logits).
    """

    layers: Tuple[int, int, int, int] = (3, 4, 6, 3)
    bn_axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        _, l4 = DilatedSegBackbone(self.layers, layer4_grids=(1, 1, 1),
                                   bn_axis_name=self.bn_axis_name,
                                   name="backbone")(x, train)
        return PSPModule(512, bn_axis_name=self.bn_axis_name,
                         name="head")(l4, train)


class DualSegNet(nn.Module):
    num_classes: int = 19
    layers: Tuple[int, int, int, int] = (3, 4, 23, 3)
    bn_axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        l3, l4 = DilatedSegBackbone(self.layers, self.bn_axis_name,
                                    name="backbone")(x, train)
        dsn = _DSN(self.num_classes, self.bn_axis_name, name="dsn")(l3, train)
        out = DualGCNHead(512, self.num_classes,
                          bn_axis_name=self.bn_axis_name, name="head")(l4, train)
        return out, dsn
