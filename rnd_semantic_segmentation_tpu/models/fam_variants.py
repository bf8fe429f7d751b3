"""FAM research variants (gcpa_gald.py:109-545) — attention-gated fusion
alternatives to the live FAM, kept for capability parity with the zoo.

  * FAMAG    (:109-201) — three additive-attention-gate branches (psi masks).
    The reference's 1x1 convs carry padding=1, growing spatial dims by 2 per
    call; replicated faithfully.
  * FAMAGv3  (:203-296) — zdl branch computed at 'down' resolution then
    upsampled back.
  * FAMAGv2  (:298-390) — as FAMAG with down1 interpolated to left's size.
  * FAMPra   (:392-468) — the live FAM plus PraNet-style reverse attention on
    a crop map; returns (features, ra_feat).
  * FAMSCWS  (:469-545) — scalar channel-weighted sum of the three branches.
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
from flax import linen as nn

from ..ops import adaptive_avg_pool_1x1, resize_bilinear
from .gcpa import FAM, _ConvBNReLU
from .layers import BatchNorm, Conv2d, relu


def _fit(t, size_ref):
    if t.shape[1:3] != size_ref.shape[1:3]:
        return resize_bilinear(t.astype(jnp.float32),
                               size_ref.shape[1:3]).astype(t.dtype)
    return t


class _Psi(nn.Module):
    """conv1x1 -> BN(1ch) -> sigmoid gate."""

    bn_axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        g = Conv2d(1, 1, name="conv")(x)
        g = BatchNorm(axis_name=self.bn_axis_name, name="bn")(g, train)
        return nn.sigmoid(g)


class _ConvBN(nn.Module):
    features: int
    kernel: int = 1
    padding: int = 1   # the reference's k1/p1 oddity
    bn_axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = Conv2d(self.features, self.kernel, padding=self.padding, name="conv")(x)
        return BatchNorm(axis_name=self.bn_axis_name, name="bn")(x, train)


class FAMAG(nn.Module):
    interplanes: int = 256
    bn_axis_name: Optional[str] = None
    v3: bool = False  # FAMAGv3's down-resolution zdl branch

    @nn.compact
    def __call__(self, left, down, right, train: bool = False):
        ax = self.bn_axis_name
        ip = self.interplanes

        # branch 1: low guides high
        left1 = _ConvBN(ip, bn_axis_name=ax, name="l0")(left, train)
        down1 = _ConvBN(ip, bn_axis_name=ax, name="d0")(down, train)
        if self.v3:
            left1_at_down = _fit(left1, down1)
            psi1 = _Psi(ax, name="psi_1")(relu(left1_at_down + down1), train)
            zdl = _fit(down1 * psi1, left1)
        else:
            down1 = _fit(down1, left1)
            psi1 = _Psi(ax, name="psi_1")(relu(left1 + down1), train)
            zdl = down1 * psi1

        # branch 2: high guides low
        left2 = _ConvBN(ip, bn_axis_name=ax, name="l1")(left, train)
        down2 = _fit(_ConvBN(ip, bn_axis_name=ax, name="d1")(down, train), left2)
        psi2 = _Psi(ax, name="psi_2")(relu(left2 + down2), train)
        zld = left2 * psi2

        # branch 3: context guides low
        left3 = _ConvBN(ip, bn_axis_name=ax, name="l2")(left, train)
        right3 = _fit(_ConvBN(ip, bn_axis_name=ax, name="r2")(right, train), left3)
        psi3 = _Psi(ax, name="psi_3")(relu(left3 + right3), train)
        zlr = left3 * psi3

        out = jnp.concatenate([zdl, zld, zlr], axis=-1)
        out = Conv2d(ip, 3, padding=1, name="conv_out")(out)
        return relu(BatchNorm(axis_name=ax, name="bn_out")(out, train))


def FAMAGv3(interplanes: int = 256, bn_axis_name=None, name=None):
    return FAMAG(interplanes=interplanes, bn_axis_name=bn_axis_name,
                 v3=True, name=name)


class FAMPra(nn.Module):
    """Live FAM + PraNet reverse attention on a crop map (gcpa_gald.py:392-468)."""

    interplanes: int = 256
    bn_axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, left, down, right, crop, train: bool = False):
        out = FAM(self.interplanes, bn_axis_name=self.bn_axis_name,
                  name="fam")(left, down, right, train)
        rev = (-nn.sigmoid(crop.astype(jnp.float32)) + 1.0).astype(out.dtype)
        out = rev * out  # broadcast the 1ch reverse mask over channels
        ra_feat = Conv2d(1, 3, padding=1, name="linear")(out)
        return out, ra_feat


class FAMSCWS(nn.Module):
    """Channel-weighted sum of the FAM branches (gcpa_gald.py:469-545)."""

    interplanes: int = 256
    bn_axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, left, down, right, train: bool = False):
        ax = self.bn_axis_name
        ip = self.interplanes
        left = _ConvBNReLU(ip, bn_axis_name=ax, name="b0")(left, train)
        down = _ConvBNReLU(ip, bn_axis_name=ax, name="b1")(down, train)
        right = _ConvBNReLU(ip, bn_axis_name=ax, name="b2")(right, train)

        down_1 = Conv2d(ip, 3, padding=1, name="conv_d1")(down)
        w1 = Conv2d(ip, 3, padding=1, name="conv_l")(left)
        z1 = relu(w1 * _fit(down, left))
        z1_att = adaptive_avg_pool_1x1(Conv2d(1, 3, padding=1, name="conv_att1")(z1))
        z1 = z1_att * z1

        z2 = relu(_fit(down_1, left) * left)
        z2_att = adaptive_avg_pool_1x1(Conv2d(1, 3, padding=1, name="conv_att2")(z2))
        z2 = z2_att * z2

        down_2 = Conv2d(ip, 3, padding=1, name="conv_d2")(right)
        z3 = relu(_fit(down_2, left) * left)
        z3_att = adaptive_avg_pool_1x1(Conv2d(1, 3, padding=1, name="conv_att3")(z3))
        z3 = z3_att * z3

        out = (z1 + z2 + z3) / (z1_att + z2_att + z3_att)
        out = Conv2d(ip, 3, padding=1, name="conv3")(out)
        return relu(BatchNorm(axis_name=ax, name="bn3")(out, train))
