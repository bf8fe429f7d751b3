"""HarDNet (Harmonic DenseNet) encoder.

Re-implements /root/reference/core/models/classifiers/gcpacc/encoders/hardnet_68.py:
``HarDBlock`` power-of-2 skip-link topology (:86-159), arch tables for
39/68/85 (:163-198), stem (conv s2 -> conv -> maxpool 3/2/1), and the
4 feature taps at base indices 4/9/12/15 (:252-262) used by the GCPA decoder
(128@/4, 320@/8, 640@/16, 1024@/32).

The link graph is static Python computed at trace time, so XLA sees a fully
unrolled concat/conv DAG — ideal for fusion.  Channel bookkeeping matches the
torch code exactly for the weight importer.
"""

from __future__ import annotations

from typing import List, Optional, Tuple

import jax.numpy as jnp
from flax import linen as nn

from ..ops import max_pool
from .layers import BatchNorm, Conv2d, relu6


def _get_link(layer: int, base_ch: int, growth_rate: int, grmul: float):
    """Returns (out_channels, in_channels, link) — hardnet_68.py:87-103."""
    if layer == 0:
        return base_ch, 0, []
    out_channels = growth_rate
    link: List[int] = []
    for i in range(10):
        dv = 2 ** i
        if layer % dv == 0:
            k = layer - dv
            link.append(k)
            if i > 0:
                out_channels *= grmul
    out_channels = int(int(out_channels + 1) / 2) * 2
    in_channels = 0
    for i in link:
        ch, _, _ = _get_link(i, base_ch, growth_rate, grmul)
        in_channels += ch
    return out_channels, in_channels, link


def hardblock_out_channels(in_channels: int, growth_rate: int, grmul: float,
                           n_layers: int) -> int:
    out = 0
    for i in range(n_layers):
        outch, _, _ = _get_link(i + 1, in_channels, growth_rate, grmul)
        if i % 2 == 0 or i == n_layers - 1:
            out += outch
    return out


class ConvLayer(nn.Module):
    """Conv + BN + ReLU6 (hardnet_68.py:56-79)."""

    features: int
    kernel: int = 3
    stride: int = 1
    bn_axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = Conv2d(self.features, self.kernel, self.stride,
                   padding=self.kernel // 2, use_bias=False, name="conv")(x)
        x = BatchNorm(axis_name=self.bn_axis_name, name="norm")(x, train)
        return relu6(x)


class HarDBlock(nn.Module):
    in_channels: int
    growth_rate: int
    grmul: float
    n_layers: int
    keep_base: bool = False
    bn_axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        layers_ = [x]
        for layer in range(self.n_layers):
            outch, _, link = _get_link(layer + 1, self.in_channels,
                                       self.growth_rate, self.grmul)
            tin = [layers_[i] for i in link]
            inp = jnp.concatenate(tin, axis=-1) if len(tin) > 1 else tin[0]
            out = ConvLayer(outch, kernel=3, bn_axis_name=self.bn_axis_name,
                            name=f"layers_{layer}")(inp, train)
            layers_.append(out)
        t = len(layers_)
        out_ = [layers_[i] for i in range(t)
                if (i == 0 and self.keep_base) or (i == t - 1) or (i % 2 == 1)]
        return jnp.concatenate(out_, axis=-1)


_HARDNET_ARCHS = {
    68: dict(first_ch=(32, 64), ch_list=(128, 256, 320, 640, 1024),
             gr=(14, 16, 20, 40, 160), grmul=1.7,
             n_layers=(8, 16, 16, 16, 4), down_samp=(1, 0, 1, 1, 0)),
    39: dict(first_ch=(24, 48), ch_list=(96, 320, 640, 1024),
             gr=(16, 20, 64, 160), grmul=1.6,
             n_layers=(4, 16, 8, 4), down_samp=(1, 1, 1, 0)),
    85: dict(first_ch=(48, 96), ch_list=(192, 256, 320, 480, 720, 1280),
             gr=(24, 24, 28, 36, 48, 256), grmul=1.7,
             n_layers=(8, 16, 16, 16, 16, 4), down_samp=(1, 0, 1, 0, 1, 0)),
}


class HarDNet(nn.Module):
    """HarDNet backbone returning the 4 feature taps the GCPA decoder consumes.

    Module names mirror the torch ``base.<i>`` indexing for weight import.
    """

    arch: int = 68
    bn_axis_name: Optional[str] = None
    remat_blocks: bool = False  # MODEL.REMAT_BLOCKS (see resnet.py)

    @nn.compact
    def __call__(self, x, train: bool = False) -> Tuple[jnp.ndarray, ...]:
        block_cls = (nn.remat(HarDBlock, static_argnums=(2,))
                     if self.remat_blocks else HarDBlock)
        spec = _HARDNET_ARCHS[self.arch]
        first_ch, ch_list = spec["first_ch"], spec["ch_list"]
        gr, grmul = spec["gr"], spec["grmul"]
        n_layers, down_samp = spec["n_layers"], spec["down_samp"]
        # tap indices into the sequential "base" list (hardnet_68.py:254)
        tap_idx = {4, 9, 12, 15} if self.arch == 68 else None

        taps: List[jnp.ndarray] = []
        base_i = 0

        def bump(val):
            nonlocal base_i
            if tap_idx and base_i in tap_idx:
                taps.append(val)
            base_i += 1
            return val

        x = bump(ConvLayer(first_ch[0], kernel=3, stride=2,
                           bn_axis_name=self.bn_axis_name, name="base_0")(x, train))
        x = bump(ConvLayer(first_ch[1], kernel=3,
                           bn_axis_name=self.bn_axis_name, name="base_1")(x, train))
        x = bump(max_pool(x, 3, 2, padding=1))

        ch = first_ch[1]
        for i in range(len(n_layers)):
            blk = block_cls(ch, gr[i], grmul, n_layers[i],
                            bn_axis_name=self.bn_axis_name, name=f"base_{base_i}")
            ch = hardblock_out_channels(ch, gr[i], grmul, n_layers[i])
            x = bump(blk(x, train))
            x = bump(ConvLayer(ch_list[i], kernel=1,
                               bn_axis_name=self.bn_axis_name,
                               name=f"base_{base_i}")(x, train))
            ch = ch_list[i]
            if down_samp[i] == 1:
                x = bump(max_pool(x, 2, 2))
        return tuple(taps)
