"""Encoder zoo (research-selectable backbones, SURVEY §2.2 encoders table).

  * RepVGG — train-time 3-branch (3x3+1x1+identity) blocks with the
    *deploy-mode structural reparameterization* into a single fused 3x3 conv
    (encoders/repvgg.py:35-230; ``repvgg_reparam`` = ``repvgg_model_convert``,
    :443-462).  The fusion math runs on numpy at conversion time.
  * B2_ResNet — ResNet50 whose layer3/4 fork into two branches
    (encoders/resnet.py:149-197).
  * B2_VGG — two-branch VGG (encoders/vgg.py).
  * DeepLabV3ASPP — DeepLabV3+'s rates-(6,12,18)+image-pooling ASPP module
    (encoders/aspp.py:401-486); the vendored pure-Python SyncBN it shipped
    with is subsumed by global-batch BN under pjit (SURVEY §2.0).
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ..ops import adaptive_avg_pool_1x1, max_pool, resize_bilinear
from .layers import BatchNorm, Conv2d, relu
from .resnet import Bottleneck


# ---------------------------------------------------------------- RepVGG ----
class RepVGGBlock(nn.Module):
    out_channels: int
    stride: int = 1
    groups: int = 1
    deploy: bool = False
    bn_axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        ax = self.bn_axis_name
        in_ch = x.shape[-1]
        if self.deploy:
            y = Conv2d(self.out_channels, 3, self.stride, padding=1,
                       groups=self.groups, use_bias=True, name="rbr_reparam")(x)
            return relu(y)
        dense = Conv2d(self.out_channels, 3, self.stride, padding=1,
                       groups=self.groups, use_bias=False, name="rbr_dense_conv")(x)
        dense = BatchNorm(axis_name=ax, name="rbr_dense_bn")(dense, train)
        one = Conv2d(self.out_channels, 1, self.stride, padding=0,
                     groups=self.groups, use_bias=False, name="rbr_1x1_conv")(x)
        one = BatchNorm(axis_name=ax, name="rbr_1x1_bn")(one, train)
        out = dense + one
        if in_ch == self.out_channels and self.stride == 1:
            out = out + BatchNorm(axis_name=ax, name="rbr_identity")(x, train)
        return relu(out)


_REPVGG_SPECS = {
    "RepVGG-A0": dict(num_blocks=(2, 4, 14, 1), width=(0.75, 0.75, 0.75, 2.5), groups={}),
    "RepVGG-A1": dict(num_blocks=(2, 4, 14, 1), width=(1, 1, 1, 2.5), groups={}),
    "RepVGG-A2": dict(num_blocks=(2, 4, 14, 1), width=(1.5, 1.5, 1.5, 2.75), groups={}),
    "RepVGG-B1": dict(num_blocks=(4, 6, 16, 1), width=(2, 2, 2, 4), groups={}),
}


class RepVGG(nn.Module):
    """Feature-extractor form: returns the 4 stage outputs (no GAP head)."""

    arch: str = "RepVGG-A0"
    deploy: bool = False
    bn_axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        spec = _REPVGG_SPECS[self.arch]
        widths = spec["width"]
        in_planes = min(64, int(64 * widths[0]))
        x = RepVGGBlock(in_planes, stride=2, deploy=self.deploy,
                        bn_axis_name=self.bn_axis_name, name="stage0")(x, train)
        taps = []
        layer_idx = 1
        for s, (nb, base) in enumerate(zip(spec["num_blocks"], (64, 128, 256, 512))):
            planes = int(base * widths[s])
            for b in range(nb):
                stride = 2 if b == 0 else 1
                g = spec["groups"].get(layer_idx, 1)
                x = RepVGGBlock(planes, stride=stride, groups=g,
                                deploy=self.deploy, bn_axis_name=self.bn_axis_name,
                                name=f"stage{s + 1}_{b}")(x, train)
                layer_idx += 1
            taps.append(x)
        return tuple(taps)


def repvgg_reparam(variables: Dict[str, Any], arch: str = "RepVGG-A0") -> Dict[str, Any]:
    """Convert train-form RepVGG variables into deploy-form fused 3x3 convs
    (repvgg.py get_equivalent_kernel_bias / repvgg_model_convert semantics).

    Input: {"params": ..., "batch_stats": ...} of RepVGG(deploy=False).
    Output: {"params": ...} for RepVGG(deploy=True).
    """
    params = variables["params"]
    stats = variables.get("batch_stats", {})
    eps = 1e-5
    out_params: Dict[str, Any] = {}

    def fuse(conv_kernel, bn_p, bn_s):
        # kernel HWIO; BN fold: k*gamma/std, beta - mean*gamma/std
        gamma = bn_p["scale"]
        beta = bn_p["bias"]
        mean = bn_s["mean"]
        var = bn_s["var"]
        std = np.sqrt(np.asarray(var) + eps)
        t = np.asarray(gamma) / std
        return np.asarray(conv_kernel) * t, np.asarray(beta) - np.asarray(mean) * t

    for name, block in params.items():
        bs = stats.get(name, {})
        k3, b3 = fuse(block["rbr_dense_conv"]["kernel"],
                      block["rbr_dense_bn"], bs["rbr_dense_bn"])
        k1, b1 = fuse(block["rbr_1x1_conv"]["kernel"],
                      block["rbr_1x1_bn"], bs["rbr_1x1_bn"])
        k1 = np.pad(k1, ((1, 1), (1, 1), (0, 0), (0, 0)))
        kernel = k3 + k1
        bias = b3 + b1
        if "rbr_identity" in block:
            in_ch = k3.shape[2] * (1 if k3.shape[2] == k3.shape[3] else 1)
            cin = k3.shape[2]
            cout = k3.shape[3]
            idk = np.zeros((3, 3, cin, cout), np.float32)
            for i in range(cout):
                idk[1, 1, i % cin, i] = 1.0
            ki, bi = fuse(idk, block["rbr_identity"], bs["rbr_identity"])
            kernel = kernel + ki
            bias = bias + bi
        out_params[name] = {"rbr_reparam": {"kernel": kernel, "bias": bias}}
    return {"params": out_params}


# -------------------------------------------------------------- B2_ResNet ----
class B2ResNet(nn.Module):
    """ResNet50 forking into two layer3/layer4 branches
    (encoders/resnet.py:149-197); returns (x1, x2) branch outputs."""

    bn_axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        ax = self.bn_axis_name
        norm = lambda name=None: BatchNorm(axis_name=ax, name=name)
        x = Conv2d(64, 7, 2, padding=3, use_bias=False, name="conv1")(x)
        x = relu(norm("bn1")(x, train))
        x = max_pool(x, 3, 2, padding=1)

        def make_layer(x, planes, blocks, stride, scope, inplanes):
            for b in range(blocks):
                s = stride if b == 0 else 1
                has_ds = b == 0 and (s != 1 or inplanes != planes * 4)
                x = Bottleneck(planes=planes, stride=s, has_downsample=has_ds,
                               norm=norm, name=f"{scope}_{b}")(x, train)
                inplanes = planes * 4
            return x, inplanes

        x, inp = make_layer(x, 64, 3, 1, "layer1", 64)
        x, inp = make_layer(x, 128, 4, 2, "layer2", inp)
        x1, _ = make_layer(x, 256, 6, 2, "layer3_1", inp)
        x1, _ = make_layer(x1, 512, 3, 2, "layer4_1", 1024)
        x2, _ = make_layer(x, 256, 6, 2, "layer3_2", inp)
        x2, _ = make_layer(x2, 512, 3, 2, "layer4_2", 1024)
        return x1, x2


# ------------------------------------------------------------------ B2_VGG ----
# avg pools sit at the FRONT of blocks 2..5 (encoders/vgg.py:6-75)
_B2VGG_PLAN = (
    ("conv1", (64, 64), False),
    ("conv2", (128, 128), True),
    ("conv3", (256, 256, 256), True),
)


class B2VGG(nn.Module):
    """Two-branch VGG (encoders/vgg.py B2_VGG): shared conv1-3, forked 4/5."""

    @nn.compact
    def __call__(self, x, train: bool = False):
        del train
        from ..ops import avg_pool

        for scope, widths, pool in _B2VGG_PLAN:
            if pool:
                x = avg_pool(x, 2, 2)
            for i, w in enumerate(widths):
                x = relu(Conv2d(w, 3, padding=1, name=f"{scope}_{i}")(x))

        def branch(x, suffix):
            x = avg_pool(x, 2, 2)
            for i, w in enumerate((512, 512, 512)):
                x = relu(Conv2d(w, 3, padding=1, name=f"conv4{suffix}_{i}")(x))
            x = avg_pool(x, 2, 2)
            for i, w in enumerate((512, 512, 512)):
                x = relu(Conv2d(w, 3, padding=1, name=f"conv5{suffix}_{i}")(x))
            return x

        return branch(x, "_1"), branch(x, "_2")


# --------------------------------------------------------------- SE-ResNet ----
class SEBasicBlock(nn.Module):
    """ResNet basic block with a squeeze-excitation gate (SENet.py)."""

    planes: int
    stride: int = 1
    has_downsample: bool = False
    reduction: int = 16
    bn_axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        from .zoo import SEBlock

        ax = self.bn_axis_name
        identity = x
        out = Conv2d(self.planes, 3, self.stride, padding=1, use_bias=False,
                     name="conv1")(x)
        out = relu(BatchNorm(axis_name=ax, name="bn1")(out, train))
        out = Conv2d(self.planes, 3, padding=1, use_bias=False, name="conv2")(out)
        out = BatchNorm(axis_name=ax, name="bn2")(out, train)
        out = SEBlock(reduction=self.reduction, name="se")(out, train)
        if self.has_downsample:
            identity = Conv2d(self.planes, 1, self.stride, use_bias=False,
                              name="downsample_conv")(x)
            identity = BatchNorm(axis_name=ax, name="downsample_bn")(identity, train)
        return relu(out + identity)


class SEResNet(nn.Module):
    """SE-ResNet encoder (SENet.py variants); returns stage taps."""

    layers: Tuple[int, int, int, int] = (2, 2, 2, 2)
    bn_axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        ax = self.bn_axis_name
        x = Conv2d(64, 7, 2, padding=3, use_bias=False, name="conv1")(x)
        x = relu(BatchNorm(axis_name=ax, name="bn1")(x, train))
        x = max_pool(x, 3, 2, padding=1)
        taps = []
        inplanes = 64
        for idx, (planes, blocks) in enumerate(zip((64, 128, 256, 512), self.layers)):
            stride = 1 if idx == 0 else 2
            for b in range(blocks):
                s = stride if b == 0 else 1
                has_ds = b == 0 and (s != 1 or inplanes != planes)
                x = SEBasicBlock(planes, s, has_ds, bn_axis_name=ax,
                                 name=f"layer{idx + 1}_{b}")(x, train)
                inplanes = planes
            taps.append(x)
        return tuple(taps)


# ------------------------------------------------------------- DeepLabv3 ----
class DeepLabV3(nn.Module):
    """Full DeepLabv3 (contextagg/aspp.py Atrous_ResNet + DeepLabv3): dilated
    ResNet backbone + rates-ASPP + 1x1 classifier at OS16."""

    num_classes: int = 19
    backbone_arch: str = "resnet50"
    bn_axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        from .resnet import ResNet

        taps = ResNet(arch=self.backbone_arch,
                      replace_stride_with_dilation=(False, False, True),
                      bn_axis_name=self.bn_axis_name,
                      return_layers=("layer4",), name="backbone")(x, train)
        feat = taps["layer4"]
        feat = DeepLabV3ASPP(out_channels=256, bn_axis_name=self.bn_axis_name,
                             name="aspp")(feat, train)
        out = Conv2d(self.num_classes, 1, name="classifier")(feat)
        return resize_bilinear(out.astype(jnp.float32), x.shape[1:3],
                               align_corners=False)


# -------------------------------------------------- DeepLabV3+ ASPP module ----
class DeepLabV3ASPP(nn.Module):
    """Rates-(6,12,18) atrous pyramid + global-pool branch -> 1x1 project
    (encoders/aspp.py:401-486, output_stride=16 rates)."""

    out_channels: int = 256
    rates: Tuple[int, ...] = (6, 12, 18)
    bn_axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        ax = self.bn_axis_name
        h, w = x.shape[1:3]
        branches = []
        y = Conv2d(self.out_channels, 1, use_bias=False, name="b0_conv")(x)
        branches.append(relu(BatchNorm(axis_name=ax, name="b0_bn")(y, train)))
        for i, r in enumerate(self.rates):
            y = Conv2d(self.out_channels, 3, padding=r, dilation=r,
                       use_bias=False, name=f"b{i + 1}_conv")(x)
            branches.append(relu(BatchNorm(axis_name=ax, name=f"b{i + 1}_bn")(y, train)))
        g = adaptive_avg_pool_1x1(x)
        g = Conv2d(self.out_channels, 1, use_bias=False, name="gp_conv")(g)
        g = relu(BatchNorm(axis_name=ax, name="gp_bn")(g, train))
        g = resize_bilinear(g.astype(jnp.float32), (h, w)).astype(x.dtype)
        branches.append(g)
        out = jnp.concatenate(branches, axis=-1)
        out = Conv2d(self.out_channels, 1, use_bias=False, name="project_conv")(out)
        return relu(BatchNorm(axis_name=ax, name="project_bn")(out, train))
