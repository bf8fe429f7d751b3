"""Context-aggregation module zoo.

The reference carries a library of selectable attention/context heads under
core/models/classifiers/gcpacc/contextagg/ (re-exported by its __init__.py).
The four live families (CrissCross, LocalAtten/GALDBlock/SpatialCGNL, FAM,
RFB/reverse-attention) live with their models; this file adds the rest of the
research surface:

  * CA / SRM / SA — channel-attention global, self-refinement, spatial
    attention (gcpa_gald.py:10-45, 546-560)
  * SmallLocalAttenModule — GALDNet.py:160-179
  * GALDHead — downsample->CGNL->local-attention head with residual
    bottleneck classifier (GALDNet.py:245-285)
  * GCPAGALDNet — Res2Net50 + GALD head + CA globals + SRM refinement + FAM
    cascade, 5 outputs (gcpa_gald.py:562-661)
  * PSPModule — pyramid pooling (PSPNet.py:85-120)
  * ContextBlock2d — GCNet global-context block (gcnet.py)
  * HolisticAttention — fixed 31x31 gaussian attention (HolisticAttention.py)

All upsamples are bilinear align_corners=False unless the reference says
otherwise.
"""

from __future__ import annotations

import math
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn
from jax import lax

from ..ops import adaptive_avg_pool_1x1, resize_bilinear
from .gcpa import FAM, GALDBlock, SpatialCGNL
from .layers import BatchNorm, Conv2d, LayerNormCHW, relu
from .res2net import Res2Net


class CA(nn.Module):
    """Channel attention: global-pooled 'down' gates a 1x1-projected 'left'."""

    bn_axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, left, down, train: bool = False):
        left = Conv2d(256, 1, name="conv0")(left)
        left = relu(BatchNorm(axis_name=self.bn_axis_name, name="bn0")(left, train))
        down = adaptive_avg_pool_1x1(down)
        down = relu(Conv2d(256, 1, name="conv1")(down))
        down = nn.sigmoid(Conv2d(256, 1, name="conv2")(down))
        return left * down


class SRM(nn.Module):
    """Self-refinement: conv->256, then conv->512 split into (w, b)."""

    bn_axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        out1 = Conv2d(256, 3, padding=1, name="conv1")(x)
        out1 = relu(BatchNorm(axis_name=self.bn_axis_name, name="bn1")(out1, train))
        out2 = Conv2d(512, 3, padding=1, name="conv2")(out1)
        w, b = out2[..., :256], out2[..., 256:]
        return relu(w * out1 + b)


class SA(nn.Module):
    """Spatial attention: 'down' produces a (w,b) affine map over 'left'."""

    bn_axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, left, down, train: bool = False):
        left = Conv2d(256, 3, padding=1, name="conv0")(left)
        left = relu(BatchNorm(axis_name=self.bn_axis_name, name="bn0")(left, train))
        down_1 = Conv2d(512, 3, padding=1, name="conv2")(down)
        if down_1.shape[1:3] != left.shape[1:3]:
            down_1 = resize_bilinear(down_1.astype(jnp.float32),
                                     left.shape[1:3]).astype(left.dtype)
        w, b = down_1[..., :256], down_1[..., 256:]
        return relu(w * left + b)


class SmallLocalAttenModule(nn.Module):
    bn_axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        c = x.shape[-1]
        h = Conv2d(c, 1, groups=c, name="dconv1_conv")(x)
        h = relu(BatchNorm(axis_name=self.bn_axis_name, name="dconv1_bn")(h, train))
        mask = nn.sigmoid(h)
        return x + x * mask


class GALDHead(nn.Module):
    """conva -> GALDBlock -> convb -> bottleneck([x, out]) -> classifier.

    Note the reference hardcodes the classifier input to 512 channels
    (GALDNet.py:270) so it only functions with interplanes=512; we follow the
    corrected per-interplanes version the GCPAGALDNet copy uses
    (gcpa_gald.py:607-618).
    """

    interplanes: int = 512
    num_classes: int = 19
    bn_axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        ax = self.bn_axis_name
        out = Conv2d(self.interplanes, 3, padding=1, use_bias=False,
                     name="conva_conv")(x)
        out = relu(BatchNorm(axis_name=ax, name="conva_bn")(out, train))
        out = GALDBlock(self.interplanes // 2, bn_axis_name=ax,
                        name="a2block")(out, train)
        out = Conv2d(self.interplanes, 3, padding=1, use_bias=False,
                     name="convb_conv")(out)
        out = relu(BatchNorm(axis_name=ax, name="convb_bn")(out, train))
        out = jnp.concatenate([x, out], axis=-1)
        out = Conv2d(self.interplanes, 3, padding=1, use_bias=False,
                     name="bottleneck_conv")(out)
        out = relu(BatchNorm(axis_name=ax, name="bottleneck_bn")(out, train))
        return Conv2d(self.num_classes, 1, name="classifier")(out)


class GCPAGALDNet(nn.Module):
    """Res2Net50 + GALD head + CA globals + SRM + FAM cascade; 5 outputs."""

    num_classes: int = 1
    bn_axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        ax = self.bn_axis_name
        size = x.shape[1:3]
        taps = Res2Net(bn_axis_name=ax, name="resnet")(x, train)
        out2, out3, out4, out5_ = (taps["layer1"], taps["layer2"],
                                   taps["layer3"], taps["layer4"])

        out4_a = CA(bn_axis_name=ax, name="ca45")(out5_, out5_, train)
        out3_a = CA(bn_axis_name=ax, name="ca35")(out5_, out5_, train)
        out2_a = CA(bn_axis_name=ax, name="ca25")(out5_, out5_, train)

        # GALD head branch (gcpa_gald.py:607-625)
        out5__ = Conv2d(256, 3, padding=1, use_bias=False, name="conva_gald_conv")(out5_)
        out5__ = relu(BatchNorm(axis_name=ax, name="conva_gald_bn")(out5__, train))
        out5__ = GALDBlock(128, bn_axis_name=ax, name="a2block_gald")(out5__, train)
        head = Conv2d(256, 3, padding=1, use_bias=False, name="convb_gald_conv")(out5__)
        head = relu(BatchNorm(axis_name=ax, name="convb_gald_bn")(head, train))
        head = jnp.concatenate([out5_, head], axis=-1)
        head = Conv2d(256, 3, padding=1, use_bias=False, name="bottleneck_gald_conv")(head)
        head = relu(BatchNorm(axis_name=ax, name="bottleneck_gald_bn")(head, train))
        head = Conv2d(self.num_classes, 1, name="bottleneck_gald_cls")(head)
        hsize = (head.shape[1] * 32, head.shape[2] * 32)
        x5_head_out = resize_bilinear(head.astype(jnp.float32), hsize)

        out5 = SRM(bn_axis_name=ax, name="srm5")(out5__, train)
        out4 = SRM(bn_axis_name=ax, name="srm4")(
            FAM(bn_axis_name=ax, name="fam45")(out4, out5, out4_a, train), train)
        out3 = SRM(bn_axis_name=ax, name="srm3")(
            FAM(bn_axis_name=ax, name="fam34")(out3, out4, out3_a, train), train)
        out2 = SRM(bn_axis_name=ax, name="srm2")(
            FAM(bn_axis_name=ax, name="fam23")(out2, out3, out2_a, train), train)

        outs = [x5_head_out]
        for name, feat in (("linear5", out5), ("linear4", out4),
                           ("linear3", out3), ("linear2", out2)):
            y = Conv2d(self.num_classes, 3, padding=1, name=name)(feat)
            outs.append(resize_bilinear(y.astype(jnp.float32), size))
        return tuple(outs)


class PSPModule(nn.Module):
    """Pyramid scene parsing pooling (PSPNet.py:85-120)."""

    out_features: int = 512
    sizes: Tuple[int, ...] = (1, 2, 3, 6)
    bn_axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        h, w = x.shape[1:3]
        priors = [x]
        for i, s in enumerate(self.sizes):
            # adaptive_avg_pool to (s, s): exact mean over computed bins
            p = _adaptive_avg_pool(x, (s, s))
            p = Conv2d(self.out_features, 1, use_bias=False, name=f"stage{i}_conv")(p)
            p = relu(BatchNorm(axis_name=self.bn_axis_name, name=f"stage{i}_bn")(p, train))
            priors.append(resize_bilinear(p.astype(jnp.float32), (h, w),
                                          align_corners=True).astype(x.dtype))
        out = jnp.concatenate(priors, axis=-1)
        out = Conv2d(self.out_features, 3, padding=1, use_bias=False,
                     name="bottleneck_conv")(out)
        return relu(BatchNorm(axis_name=self.bn_axis_name,
                              name="bottleneck_bn")(out, train))


def _adaptive_avg_pool(x: jnp.ndarray, out_hw: Tuple[int, int]) -> jnp.ndarray:
    """torch AdaptiveAvgPool2d semantics on NHWC."""
    n, h, w, c = x.shape
    oh, ow = out_hw
    out_rows = []
    for i in range(oh):
        r0, r1 = (i * h) // oh, -(-((i + 1) * h) // oh)
        cols = []
        for j in range(ow):
            c0, c1 = (j * w) // ow, -(-((j + 1) * w) // ow)
            cols.append(jnp.mean(x[:, r0:r1, c0:c1, :], axis=(1, 2)))
        out_rows.append(jnp.stack(cols, axis=1))
    return jnp.stack(out_rows, axis=1)


class ContextBlock2d(nn.Module):
    """GCNet global context block (gcnet.py ContextBlock2d, pool='att')."""

    planes: int
    ratio: int = 8
    pool: str = "att"
    fusions: Tuple[str, ...] = ("channel_add",)

    @nn.compact
    def __call__(self, x, train: bool = False):
        del train
        b, h, w, c = x.shape
        if self.pool == "att":
            mask = Conv2d(1, 1, name="conv_mask")(x).reshape(b, h * w, 1)
            mask = jax.nn.softmax(mask, axis=1)
            context = jnp.einsum("bpc,bpo->boc", x.reshape(b, h * w, c), mask)
            context = context.reshape(b, 1, 1, c)
        else:
            context = adaptive_avg_pool_1x1(x)

        out = x
        hidden = self.planes // self.ratio
        if "channel_add" in self.fusions:
            t = Conv2d(hidden, 1, name="channel_add_0")(context)
            t = LayerNormCHW(name="channel_add_ln")(t)
            t = Conv2d(c, 1, name="channel_add_1")(relu(t))
            out = out + t
        if "channel_mul" in self.fusions:
            t = Conv2d(hidden, 1, name="channel_mul_0")(context)
            t = LayerNormCHW(name="channel_mul_ln")(t)
            t = Conv2d(c, 1, name="channel_mul_1")(relu(t))
            out = out * nn.sigmoid(t)
        return out


class SNLBlock2d(nn.Module):
    """Simplified GCNet block: single 1x1 channel transform (gcnet.py:18-44)."""

    planes: int
    pool: str = "att"
    fusions: Tuple[str, ...] = ("channel_add",)

    @nn.compact
    def __call__(self, x, train: bool = False):
        del train
        b, h, w, c = x.shape
        if self.pool == "att":
            mask = Conv2d(1, 1, name="conv_mask")(x).reshape(b, h * w, 1)
            mask = jax.nn.softmax(mask, axis=1)
            context = jnp.einsum("bpc,bpo->boc", x.reshape(b, h * w, c), mask)
            context = context.reshape(b, 1, 1, c)
        else:
            context = adaptive_avg_pool_1x1(x)
        out = x
        if "channel_add" in self.fusions:
            out = out + Conv2d(self.planes, 1, name="channel_add_conv")(context)
        if "channel_mul" in self.fusions:
            out = out * nn.sigmoid(Conv2d(self.planes, 1,
                                          name="channel_mul_conv")(context))
        return out


class GCHead(nn.Module):
    """conva -> ContextBlock2d -> convb -> bottleneck classifier
    (gcnet.py:167-205; the reference hardcodes a 512-ch classifier input,
    corrected here per-interplanes like GALDHead)."""

    interplanes: int = 512
    num_classes: int = 19
    bn_axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        ax = self.bn_axis_name
        out = Conv2d(self.interplanes, 3, padding=1, use_bias=False,
                     name="conva_conv")(x)
        out = relu(BatchNorm(axis_name=ax, name="conva_bn")(out, train))
        out = ContextBlock2d(planes=self.interplanes, name="a2block")(out, train)
        out = Conv2d(self.interplanes, 3, padding=1, use_bias=False,
                     name="convb_conv")(out)
        out = relu(BatchNorm(axis_name=ax, name="convb_bn")(out, train))
        out = jnp.concatenate([x, out], axis=-1)
        out = Conv2d(self.interplanes, 3, padding=1, use_bias=False,
                     name="bottleneck_conv")(out)
        out = relu(BatchNorm(axis_name=ax, name="bottleneck_bn")(out, train))
        return Conv2d(self.num_classes, 1, name="classifier")(out)


def gkern(kernlen: int = 16, nsig: float = 3.0) -> np.ndarray:
    """Gaussian kernel via normal CDF differences (HolisticAttention.py:10-16),
    scipy-free (norm.cdf == 0.5*(1+erf(x/sqrt(2))))."""
    interval = (2 * nsig + 1.0) / kernlen
    xs = np.linspace(-nsig - interval / 2.0, nsig + interval / 2.0, kernlen + 1)
    cdf = 0.5 * (1 + np.vectorize(math.erf)(xs / math.sqrt(2)))
    kern1d = np.diff(cdf)
    kernel_raw = np.sqrt(np.outer(kern1d, kern1d))
    return kernel_raw / kernel_raw.sum()


def min_max_norm(x: jnp.ndarray) -> jnp.ndarray:
    mx = jnp.max(x, axis=(1, 2), keepdims=True)
    mn = jnp.min(x, axis=(1, 2), keepdims=True)
    return (x - mn) / (mx - mn + 1e-8)


class HolisticAttention(nn.Module):
    """Fixed 31x31 gaussian-blur attention (CPD's HA module)."""

    @nn.compact
    def __call__(self, attention: jnp.ndarray, x: jnp.ndarray) -> jnp.ndarray:
        kernel = self.param("gaussian_kernel",
                            lambda rng: jnp.asarray(gkern(31, 4), jnp.float32))
        k = kernel.reshape(31, 31, 1, 1)
        soft = lax.conv_general_dilated(
            attention.astype(jnp.float32), k, (1, 1),
            padding=((15, 15), (15, 15)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        soft = min_max_norm(soft)
        return x * jnp.maximum(soft, attention).astype(x.dtype)
