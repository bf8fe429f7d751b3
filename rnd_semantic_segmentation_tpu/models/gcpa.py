"""GCPA-CC ("GALD") model family + the live context-aggregation modules.

Semantics from:
  * CrissCrossAttention — /root/reference/core/models/classifiers/gcpacc/contextagg/ccnet.py:29-126
    (axial H+W attention with -inf on the H diagonal, softmax over the
    concatenated H+W axis, learnable gamma initialized to 0)
  * LocalAttenModule — contextagg/GALDNet.py:124-157 (two depthwise stride-2
    VALID convs -> bilinear align_corners=True upsample -> sigmoid mask;
    returns x + x*mask)
  * SpatialCGNL / GALDBlock — contextagg/GALDNet.py:14-121 (grouped
    dot-product global attention; the per-group attention collapses to a
    scalar <p,g> per (batch,group) — implemented here as the reduction it
    mathematically is instead of bmm of flattened vectors)
  * FAM — gcpa_gald.py:47-107 (three-input interweaved aggregation)
  * GCPAEncoder/GCPADecoder — gcpa_cc2.py:16-83 (HarDNet68 taps; conva ->
    2x shared-weight CrissCross -> 3 LocalAtten branches -> FAM cascade ->
    4 per-scale heads upsampled to input size with align_corners=False)

TPU notes: the criss-cross energies/aggregation are pure einsums (MXU); a
fused Pallas kernel lives in ops/ccattn.py with this module as its oracle.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax.numpy as jnp
from flax import linen as nn

from ..ops import resize_bilinear
from .hardnet import HarDNet
from .layers import BatchNorm, Conv2d, GroupNorm, relu


class CrissCrossAttention(nn.Module):
    """Axial (criss-cross) attention over H and W.

    The fused attention core (energies + joint softmax with -inf H-diagonal +
    both aggregations) lives in ops/ccattn.py: a Pallas TPU kernel on TPU,
    the einsum reference elsewhere (``use_pallas`` overrides).
    """

    use_pallas: Optional[bool] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        from ..ops.ccattn import cc_attention_core

        b, h, w, c = x.shape
        cq = max(c // 8, 1)
        q = Conv2d(cq, 1, name="query_conv")(x)
        k = Conv2d(cq, 1, name="key_conv")(x)
        v = Conv2d(c, 1, name="value_conv")(x)
        gamma = self.param("gamma", nn.initializers.zeros, (1,), jnp.float32)
        out = cc_attention_core(q, k, v, use_pallas=self.use_pallas)
        return (gamma * out.astype(jnp.float32)).astype(x.dtype) + x


class LocalAttenModule(nn.Module):
    bn_axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        b, h, w, c = x.shape
        res = x
        # depthwise k3 stride2 padding0 (VALID) + BN + ReLU, twice
        for i in (1, 2):
            x = Conv2d(c, 3, 2, padding=0, groups=c, name=f"dconv{i}_conv")(x)
            x = BatchNorm(axis_name=self.bn_axis_name, name=f"dconv{i}_bn")(x, train)
            x = relu(x)
        x = resize_bilinear(x.astype(jnp.float32), (h, w), align_corners=True)
        mask = nn.sigmoid(x).astype(res.dtype)
        return res + res * mask


class SpatialCGNL(nn.Module):
    """Grouped dot-product global attention (CGNL, linear kernel).

    Per group the torch bmm chain reduces to: out = <p, g> * t where the dot
    product runs over all C_g*H*W elements — a cheap reduction, not a matmul.
    """

    planes: int
    groups: int = 8
    use_scale: bool = False
    bn_axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        b, h, w, c = x.shape
        residual = x
        t = Conv2d(self.planes, 1, use_bias=False, name="t")(x).astype(jnp.float32)
        p = Conv2d(self.planes, 1, use_bias=False, name="p")(x).astype(jnp.float32)
        g = Conv2d(self.planes, 1, use_bias=False, name="g")(x).astype(jnp.float32)
        gch = self.planes // self.groups
        tg = t.reshape(b, h, w, self.groups, gch)
        pg = p.reshape(b, h, w, self.groups, gch)
        gg = g.reshape(b, h, w, self.groups, gch)
        att = jnp.sum(pg * gg, axis=(1, 2, 4), keepdims=True)  # [B,1,1,G,1]
        if self.use_scale:
            att = att / jnp.sqrt(jnp.asarray(gch * h * w, jnp.float32))
        out = (att * tg).reshape(b, h, w, self.planes).astype(x.dtype)
        out = Conv2d(c, 1, groups=self.groups, use_bias=False, name="z")(out)
        out = GroupNorm(num_groups=self.groups, name="gn")(out)
        return out + residual


class GALDBlock(nn.Module):
    planes: int
    bn_axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        b, h, w, c = x.shape
        y = Conv2d(c, 3, 2, padding=0, groups=c, name="down_conv")(x)
        y = BatchNorm(axis_name=self.bn_axis_name, name="down_bn")(y, train)
        y = relu(y)
        y = SpatialCGNL(self.planes, bn_axis_name=self.bn_axis_name,
                        name="long_relation")(y, train)
        y = resize_bilinear(y.astype(jnp.float32), (h, w), align_corners=True).astype(x.dtype)
        return LocalAttenModule(bn_axis_name=self.bn_axis_name,
                                name="local_attention")(y, train)


class _ConvBNReLU(nn.Module):
    features: int
    kernel: int = 3
    bn_axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = Conv2d(self.features, self.kernel, padding=self.kernel // 2, name="conv")(x)
        x = BatchNorm(axis_name=self.bn_axis_name, name="bn")(x, train)
        return relu(x)


class FAM(nn.Module):
    """Feature Interweaved Aggregation Module (gcpa_gald.py:47-107)."""

    interplanes: int = 256
    bn_axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, left, down, right, train: bool = False):
        ax = self.bn_axis_name
        left = _ConvBNReLU(self.interplanes, bn_axis_name=ax, name="b0")(left, train)
        down = _ConvBNReLU(self.interplanes, bn_axis_name=ax, name="b1")(down, train)
        right = _ConvBNReLU(self.interplanes, bn_axis_name=ax, name="b2")(right, train)

        lsize = left.shape[1:3]
        down_1 = Conv2d(self.interplanes, 3, padding=1, name="conv_d1")(down)
        w1 = Conv2d(self.interplanes, 3, padding=1, name="conv_l")(left)
        if down.shape[1:3] != lsize:
            down_ = resize_bilinear(down.astype(jnp.float32), lsize).astype(left.dtype)
        else:
            down_ = down
        z1 = relu(w1 * down_)
        if down_1.shape[1:3] != lsize:
            down_1 = resize_bilinear(down_1.astype(jnp.float32), lsize).astype(left.dtype)
        z2 = relu(down_1 * left)
        down_2 = Conv2d(self.interplanes, 3, padding=1, name="conv_d2")(right)
        if down_2.shape[1:3] != lsize:
            down_2 = resize_bilinear(down_2.astype(jnp.float32), lsize).astype(left.dtype)
        z3 = relu(down_2 * left)
        out = jnp.concatenate([z1, z2, z3], axis=-1)
        out = Conv2d(self.interplanes, 3, padding=1, name="conv3")(out)
        out = BatchNorm(axis_name=ax, name="bn3")(out, train)
        return relu(out)


class GCPACCNet(nn.Module):
    """Single-module GCPA-CC variant (gcpa_cc.py:17-79): HarDNet68 + decoder
    in one module, 1-class heads, a single criss-cross pass."""

    num_classes: int = 1
    interplanes: int = 256
    bn_axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        ax = self.bn_axis_name
        taps = HarDNet(arch=68, bn_axis_name=ax, name="hardnet")(x, train)
        out2, out3, out4, out5_ = taps
        size = x.shape[1:3]

        h = Conv2d(self.interplanes, 3, padding=1, use_bias=False, name="conva_conv")(out5_)
        h = BatchNorm(axis_name=ax, name="conva_bn")(h, train)
        out5_ = relu(h)
        out5_c = CrissCrossAttention(name="long_relation")(out5_)

        out4_c = LocalAttenModule(bn_axis_name=ax, name="local_attention_4")(out5_c, train)
        out3_c = LocalAttenModule(bn_axis_name=ax, name="local_attention_3")(out5_c, train)
        out2_c = LocalAttenModule(bn_axis_name=ax, name="local_attention_2")(out5_c, train)

        out5 = out5_
        out4 = FAM(self.interplanes, bn_axis_name=ax, name="fam45")(out4, out5, out4_c, train)
        out3 = FAM(self.interplanes, bn_axis_name=ax, name="fam34")(out3, out4, out3_c, train)
        out2 = FAM(self.interplanes, bn_axis_name=ax, name="fam23")(out2, out3, out2_c, train)

        heads = []
        for name, feat in (("linear5", out5), ("linear4", out4),
                           ("linear3", out3), ("linear2", out2)):
            y = Conv2d(self.num_classes, 3, padding=1, name=name)(feat)
            heads.append(resize_bilinear(y.astype(jnp.float32), size,
                                         align_corners=False))
        return tuple(heads)


class GCPAEncoder(nn.Module):
    """HarDNet68 wrapper returning the 4 taps (gcpa_cc2.py:16-23)."""

    bn_axis_name: Optional[str] = None
    remat_blocks: bool = False  # MODEL.REMAT_BLOCKS (see resnet.py)

    @nn.compact
    def __call__(self, x, train: bool = False):
        return HarDNet(arch=68, bn_axis_name=self.bn_axis_name,
                       remat_blocks=self.remat_blocks, name="hardnet")(x, train)


class GCPADecoder(nn.Module):
    """GCPA-CC decoder producing 4 per-scale class maps at input resolution.

    ``use_pallas``: None = auto (Pallas kernel on TPU); set False under
    GSPMD spatial sharding (pallas_call does not auto-partition).
    """

    num_classes: int = 19
    interplanes: int = 256
    bn_axis_name: Optional[str] = None
    use_pallas: Optional[bool] = None

    @nn.compact
    def __call__(self, x, hardnetout, train: bool = False):
        ax = self.bn_axis_name
        out2, out3, out4, out5_ = hardnetout  # 128@/4, 320@/8, 640@/16, 1024@/32
        size = x.shape[1:3]

        h = Conv2d(self.interplanes, 3, padding=1, use_bias=False, name="conva_conv")(out5_)
        h = BatchNorm(axis_name=ax, name="conva_bn")(h, train)
        out5_ = relu(h)

        # two passes through the SAME criss-cross module (shared weights,
        # gcpa_cc2.py:59-60)
        long_relation = CrissCrossAttention(use_pallas=self.use_pallas,
                                            name="long_relation")
        out5_c = long_relation(out5_)
        out5_c = long_relation(out5_c)

        out4_c = LocalAttenModule(bn_axis_name=ax, name="local_attention_4")(out5_c, train)
        out3_c = LocalAttenModule(bn_axis_name=ax, name="local_attention_3")(out5_c, train)
        out2_c = LocalAttenModule(bn_axis_name=ax, name="local_attention_2")(out5_c, train)

        out5 = out5_
        out4 = FAM(self.interplanes, bn_axis_name=ax, name="fam45")(out4, out5, out4_c, train)
        out3 = FAM(self.interplanes, bn_axis_name=ax, name="fam34")(out3, out4, out3_c, train)
        out2 = FAM(self.interplanes, bn_axis_name=ax, name="fam23")(out2, out3, out2_c, train)

        heads = []
        for name, feat in (("linear5", out5), ("linear4", out4),
                           ("linear3", out3), ("linear2", out2)):
            y = Conv2d(self.num_classes, 3, padding=1, name=name)(feat)
            y = resize_bilinear(y.astype(jnp.float32), size, align_corners=False)
            heads.append(y)
        return tuple(heads)  # (out5, out4, out3, out2)
