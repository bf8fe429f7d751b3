"""Full segmentation-network zoo (round-1 batch 3).

  * UNet — the classic encoder/decoder with bilinear ups and center-padded
    skips (cenet.py:487-581)
  * CENet — CE-Net: ResNet34 encoder + DAC (cascaded atrous) + SPP (multi-
    kernel pooled 1ch maps) center, transposed-conv decoder with skips
    (cenet.py:19-252)
  * BiSeNetV1 — spatial path + ResNet18 context path with attention
    refinement + feature fusion; PixelShuffle outputs (BiseNet.py)
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops import adaptive_avg_pool_1x1, avg_pool, max_pool, resize_bilinear
from .layers import BatchNorm, Conv2d, ConvTranspose2d, relu
from .resnet import ResNet


class _DoubleConv(nn.Module):
    out_ch: int
    bn_axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        ax = self.bn_axis_name
        x = Conv2d(self.out_ch, 3, padding=1, name="conv0")(x)
        x = relu(BatchNorm(axis_name=ax, name="bn0")(x, train))
        x = Conv2d(self.out_ch, 3, padding=1, name="conv1")(x)
        x = relu(BatchNorm(axis_name=ax, name="bn1")(x, train))
        return x


class UNet(nn.Module):
    """Classic UNet (cenet.py:554-581); returns sigmoid probabilities."""

    n_classes: int = 1
    bn_axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        ax = self.bn_axis_name
        x1 = _DoubleConv(64, ax, name="inc")(x, train)
        x2 = _DoubleConv(128, ax, name="down1")(max_pool(x1, 2, 2), train)
        x3 = _DoubleConv(256, ax, name="down2")(max_pool(x2, 2, 2), train)
        x4 = _DoubleConv(512, ax, name="down3")(max_pool(x3, 2, 2), train)
        x5 = _DoubleConv(512, ax, name="down4")(max_pool(x4, 2, 2), train)

        def up(a, b, out_ch, name):
            a = resize_bilinear(a.astype(jnp.float32),
                                (a.shape[1] * 2, a.shape[2] * 2),
                                align_corners=True).astype(a.dtype)
            cat = jnp.concatenate([b, a], axis=-1)
            return _DoubleConv(out_ch, ax, name=name)(cat, train)

        h = up(x5, x4, 256, "up1")
        h = up(h, x3, 128, "up2")
        h = up(h, x2, 64, "up3")
        h = up(h, x1, 64, "up4")
        out = Conv2d(self.n_classes, 1, name="outc")(h)
        return nn.sigmoid(out)


class DACBlock(nn.Module):
    """Dense atrous convolution block (cenet.py:19-39); the 1x1 and dilate
    convs are SHARED across the cascades exactly like the reference."""

    @nn.compact
    def __call__(self, x, train: bool = False):
        del train
        c = x.shape[-1]
        dilate1 = Conv2d(c, 3, padding=1, dilation=1, name="dilate1")
        dilate2 = Conv2d(c, 3, padding=3, dilation=3, name="dilate2")
        dilate3 = Conv2d(c, 3, padding=5, dilation=5, name="dilate3")
        conv1x1 = Conv2d(c, 1, name="conv1x1")
        d1 = relu(dilate1(x))
        d2 = relu(conv1x1(dilate2(x)))
        d3 = relu(conv1x1(dilate2(dilate1(x))))
        d4 = relu(conv1x1(dilate3(dilate2(dilate1(x)))))
        return x + d1 + d2 + d3 + d4


class DACBlockNoAtrous(nn.Module):
    """DAC cascade with plain 3x3 convs (cenet.py:42-63); dilate1/2/3 are
    DISTINCT convs but conv1x1 is shared across branches like the reference."""

    @nn.compact
    def __call__(self, x, train: bool = False):
        del train
        c = x.shape[-1]
        dilate1 = Conv2d(c, 3, padding=1, name="dilate1")
        dilate2 = Conv2d(c, 3, padding=1, name="dilate2")
        dilate3 = Conv2d(c, 3, padding=1, name="dilate3")
        conv1x1 = Conv2d(c, 1, name="conv1x1")
        d1 = relu(dilate1(x))
        d2 = relu(conv1x1(dilate2(x)))
        d3 = relu(conv1x1(dilate2(dilate1(x))))
        d4 = relu(conv1x1(dilate3(dilate2(dilate1(x)))))
        return x + d1 + d2 + d3 + d4


class DACBlockInception(nn.Module):
    """Inception-style DAC (cenet.py:66-88): shared 1x1 + 3x3 convs, concat
    fused by a 2c->c 1x1, one residual tap."""

    @nn.compact
    def __call__(self, x, train: bool = False):
        del train
        c = x.shape[-1]
        dilate1 = Conv2d(c, 1, name="dilate1")
        dilate3 = Conv2d(c, 3, padding=1, name="dilate3")
        conv1x1 = Conv2d(c, 1, name="conv1x1")
        d1 = relu(dilate1(x))
        d2 = relu(dilate3(dilate1(x)))
        dc = relu(conv1x1(jnp.concatenate([d1, d2], axis=-1)))
        return x + relu(dilate1(dc))


class DACBlockInceptionBlocks(nn.Module):
    """Parallel 1x1/3x3/5x5/maxpool inception branches, summed — note: NO
    residual ``x`` term, matching cenet.py:91-112."""

    @nn.compact
    def __call__(self, x, train: bool = False):
        del train
        c = x.shape[-1]
        conv1x1 = Conv2d(c, 1, name="conv1x1")
        conv3x3 = Conv2d(c, 3, padding=1, name="conv3x3")
        conv5x5 = Conv2d(c, 5, padding=2, name="conv5x5")
        d1 = relu(conv1x1(x))
        d2 = relu(conv3x3(conv1x1(x)))
        d3 = relu(conv5x5(conv1x1(x)))
        d4 = max_pool(x, 3, 1, padding=1)
        return d1 + d2 + d3 + d4


class SPPBlock(nn.Module):
    """Multi-kernel pooled 1-channel maps concatenated onto x (cenet.py:140-161);
    one SHARED 1x1 conv across all four pool branches."""

    @nn.compact
    def __call__(self, x, train: bool = False):
        del train
        h, w = x.shape[1:3]
        conv = Conv2d(1, 1, name="conv")
        outs = []
        for k, s in ((2, 2), (3, 3), (5, 5), (6, 6)):
            p = max_pool(x, k, s)
            p = conv(p)
            outs.append(resize_bilinear(p.astype(jnp.float32), (h, w)).astype(x.dtype))
        return jnp.concatenate(outs + [x], axis=-1)


class _CEDecoderBlock(nn.Module):
    n_filters: int
    bn_axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        ax = self.bn_axis_name
        c4 = x.shape[-1] // 4
        x = Conv2d(c4, 1, name="conv1")(x)
        x = relu(BatchNorm(axis_name=ax, name="norm1")(x, train))
        x = ConvTranspose2d(c4, 3, 2, 1, output_padding=1, name="deconv2")(x)
        x = relu(BatchNorm(axis_name=ax, name="norm2")(x, train))
        x = Conv2d(self.n_filters, 1, name="conv3")(x)
        x = relu(BatchNorm(axis_name=ax, name="norm3")(x, train))
        return x


_DAC_BLOCKS = {
    "atrous": DACBlock,
    "no_atrous": DACBlockNoAtrous,
    "inception": DACBlockInception,
    "inception_blocks": DACBlockInceptionBlocks,
}


class CENet(nn.Module):
    """CE-Net on a ResNet34 encoder (cenet.py:195-252) and its research
    variants:

      * defaults                      -> CE_Net_ (DAC + SPP, sigmoid)
      * dac="no_atrous",  use_spp=False -> CE_Net_backbone_DAC_without_atrous
      * dac="inception",  use_spp=False -> CE_Net_backbone_DAC_with_inception
      * dac="inception_blocks", use_spp=False -> CE_Net_backbone_inception_blocks
      * apply_sigmoid=False (12 classes) -> CE_Net_OCT (cenet.py:428-484)
    """

    num_classes: int = 1
    dac: str = "atrous"
    use_spp: bool = True
    apply_sigmoid: bool = True
    bn_axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        ax = self.bn_axis_name
        taps = ResNet(arch="resnet34", bn_axis_name=ax,
                      return_layers=("layer1", "layer2", "layer3", "layer4"),
                      name="resnet")(x, train)
        e1, e2, e3, e4 = (taps["layer1"], taps["layer2"],
                          taps["layer3"], taps["layer4"])
        e4 = _DAC_BLOCKS[self.dac](name="dblock")(e4, train)
        if self.use_spp:
            e4 = SPPBlock(name="spp")(e4, train)  # 512 + 4 = 516 channels

        d4 = _CEDecoderBlock(256, ax, name="decoder4")(e4, train) + e3
        d3 = _CEDecoderBlock(128, ax, name="decoder3")(d4, train) + e2
        d2 = _CEDecoderBlock(64, ax, name="decoder2")(d3, train) + e1
        d1 = _CEDecoderBlock(64, ax, name="decoder1")(d2, train)

        out = ConvTranspose2d(32, 4, 2, 1, name="finaldeconv1")(d1)
        out = relu(out)
        out = relu(Conv2d(32, 3, padding=1, name="finalconv2")(out))
        out = Conv2d(self.num_classes, 3, padding=1, name="finalconv3")(out)
        return nn.sigmoid(out) if self.apply_sigmoid else out


def CENetOCT(num_classes: int = 12, bn_axis_name: Optional[str] = None, **kw):
    """CE_Net_OCT (cenet.py:428-484): base CE-Net center, raw logits out."""
    return CENet(num_classes=num_classes, dac="atrous", use_spp=True,
                 apply_sigmoid=False, bn_axis_name=bn_axis_name, **kw)


# ------------------------------------------------------------- BiSeNet V1 ----
class _ConvBNReLU(nn.Module):
    out_ch: int
    ks: int = 3
    stride: int = 1
    padding: int = 1
    bn_axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = Conv2d(self.out_ch, self.ks, self.stride, padding=self.padding,
                   use_bias=False, name="conv")(x)
        return relu(BatchNorm(axis_name=self.bn_axis_name, name="bn")(x, train))


def _pixel_shuffle(x: jnp.ndarray, factor: int) -> jnp.ndarray:
    b, h, w, c = x.shape
    oc = c // (factor * factor)
    x = x.reshape(b, h, w, factor, factor, oc)
    x = jnp.transpose(x, (0, 1, 3, 2, 4, 5))
    return x.reshape(b, h * factor, w * factor, oc)


class AttentionRefinementModule(nn.Module):
    out_ch: int
    bn_axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        ax = self.bn_axis_name
        feat = _ConvBNReLU(self.out_ch, bn_axis_name=ax, name="conv")(x, train)
        atten = adaptive_avg_pool_1x1(feat)
        atten = Conv2d(self.out_ch, 1, use_bias=False, name="conv_atten")(atten)
        atten = nn.sigmoid(BatchNorm(axis_name=ax, name="bn_atten")(atten, train))
        return feat * atten


class FeatureFusionModule(nn.Module):
    out_ch: int
    bn_axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, fsp, fcp, train: bool = False):
        ax = self.bn_axis_name
        fcat = jnp.concatenate([fsp, fcp], axis=-1)
        feat = _ConvBNReLU(self.out_ch, ks=1, padding=0, bn_axis_name=ax,
                           name="convblk")(fcat, train)
        atten = adaptive_avg_pool_1x1(feat)
        atten = relu(Conv2d(self.out_ch // 4, 1, use_bias=False, name="conv1")(atten))
        atten = nn.sigmoid(Conv2d(self.out_ch, 1, use_bias=False, name="conv2")(atten))
        return feat * atten + feat


class BiSeNetV1(nn.Module):
    """Spatial path + ResNet18 context path (taps 128/256/512 at /8,/16,/32)."""

    n_classes: int
    output_aux: bool = True
    bn_axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        ax = self.bn_axis_name

        # context path
        taps = ResNet(arch="resnet18", bn_axis_name=ax,
                      return_layers=("layer2", "layer3", "layer4"),
                      name="cp_resnet")(x, train)
        feat8, feat16, feat32 = taps["layer2"], taps["layer3"], taps["layer4"]
        avg = adaptive_avg_pool_1x1(feat32)
        avg = _ConvBNReLU(128, ks=1, padding=0, bn_axis_name=ax,
                          name="conv_avg")(avg, train)
        f32 = AttentionRefinementModule(128, ax, name="arm32")(feat32, train) + avg
        f32_up = jnp.repeat(jnp.repeat(f32, 2, axis=1), 2, axis=2)  # nn.Upsample default nearest
        f32_up = _ConvBNReLU(128, bn_axis_name=ax, name="conv_head32")(f32_up, train)
        f16 = AttentionRefinementModule(128, ax, name="arm16")(feat16, train) + f32_up
        f16_up = jnp.repeat(jnp.repeat(f16, 2, axis=1), 2, axis=2)
        f16_up = _ConvBNReLU(128, bn_axis_name=ax, name="conv_head16")(f16_up, train)

        # spatial path
        sp = _ConvBNReLU(64, ks=7, stride=2, padding=3, bn_axis_name=ax,
                         name="sp_conv1")(x, train)
        sp = _ConvBNReLU(64, stride=2, bn_axis_name=ax, name="sp_conv2")(sp, train)
        sp = _ConvBNReLU(64, stride=2, bn_axis_name=ax, name="sp_conv3")(sp, train)
        sp = _ConvBNReLU(128, ks=1, padding=0, bn_axis_name=ax,
                         name="sp_conv_out")(sp, train)

        fuse = FeatureFusionModule(256, ax, name="ffm")(sp, f16_up, train)

        def head(feat, mid, up_factor, name):
            y = _ConvBNReLU(mid, bn_axis_name=ax, name=f"{name}_conv")(feat, train)
            y = Conv2d(self.n_classes * up_factor * up_factor, 1,
                       name=f"{name}_out")(y)
            return _pixel_shuffle(y, up_factor)

        out = head(fuse, 256, 8, "conv_out")
        if self.output_aux:
            out16 = head(f16_up, 64, 8, "conv_out16")
            out32 = head(f32_up, 64, 16, "conv_out32")
            return out, out16, out32
        return out
