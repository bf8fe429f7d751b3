"""3D ResNet encoder (encoders/resnet3d.py, kenshohara 3D-ResNets layout).

Layout NTHWC (channels-last 3D); conv via lax.conv_general_dilated with
"NDHWC"/"DHWIO" dimension numbers.  Shortcut type 'B' (conv downsample);
returns the 4 stage taps (the classifier head is out of scope for the
segmentation zoo).
"""

from __future__ import annotations

from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn
from jax import lax


class Conv3d(nn.Module):
    features: int
    kernel_size: Tuple[int, int, int] = (3, 3, 3)
    stride: Tuple[int, int, int] = (1, 1, 1)
    padding: Tuple[int, int, int] = (1, 1, 1)
    use_bias: bool = False

    @nn.compact
    def __call__(self, x):
        kt, kh, kw = self.kernel_size
        in_ch = x.shape[-1]
        kernel = self.param(
            "kernel",
            nn.initializers.variance_scaling(2.0, "fan_out", "truncated_normal"),
            (kt, kh, kw, in_ch, self.features), jnp.float32)
        pt, ph, pw = self.padding
        y = lax.conv_general_dilated(
            x, kernel.astype(x.dtype),
            window_strides=self.stride,
            padding=((pt, pt), (ph, ph), (pw, pw)),
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))
        if self.use_bias:
            y = y + self.param("bias", nn.initializers.zeros,
                               (self.features,), jnp.float32).astype(y.dtype)
        return y


class BatchNorm3d(nn.Module):
    momentum: float = 0.1
    epsilon: float = 1e-5

    @nn.compact
    def __call__(self, x, train: bool = False):
        c = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (c,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (c,), jnp.float32)
        ra_mean = self.variable("batch_stats", "mean", lambda: jnp.zeros((c,), jnp.float32))
        ra_var = self.variable("batch_stats", "var", lambda: jnp.ones((c,), jnp.float32))
        if train:
            xf = x.astype(jnp.float32)
            mean = jnp.mean(xf, axis=(0, 1, 2, 3))
            var = jnp.mean(jnp.square(xf), axis=(0, 1, 2, 3)) - jnp.square(mean)
            if not self.is_initializing():
                n = int(np_prod(x.shape[:-1]))
                unbiased = var * n / max(n - 1, 1)
                ra_mean.value = 0.9 * ra_mean.value + 0.1 * mean
                ra_var.value = 0.9 * ra_var.value + 0.1 * unbiased
        else:
            mean, var = ra_mean.value, ra_var.value
        y = (x.astype(jnp.float32) - mean) * lax.rsqrt(var + self.epsilon)
        return (y * scale + bias).astype(x.dtype)


def np_prod(shape):
    out = 1
    for s in shape:
        out *= int(s)
    return out


def max_pool3d(x, kernel=3, stride=2, padding=1):
    return lax.reduce_window(
        x, -jnp.inf, lax.max,
        (1, kernel, kernel, kernel, 1),
        (1, stride, stride, stride, 1),
        ((0, 0), (padding, padding), (padding, padding), (padding, padding), (0, 0)))


class BasicBlock3d(nn.Module):
    planes: int
    stride: int = 1
    has_downsample: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        identity = x
        s = (self.stride,) * 3
        out = Conv3d(self.planes, stride=s, name="conv1")(x)
        out = nn.relu(BatchNorm3d(name="bn1")(out, train))
        out = Conv3d(self.planes, name="conv2")(out)
        out = BatchNorm3d(name="bn2")(out, train)
        if self.has_downsample:
            identity = Conv3d(self.planes, (1, 1, 1), s, (0, 0, 0),
                              name="downsample_conv")(x)
            identity = BatchNorm3d(name="downsample_bn")(identity, train)
        return nn.relu(out + identity)


class ResNet3D(nn.Module):
    """r3d-18-style backbone; returns (layer1..layer4) taps."""

    layers: Tuple[int, int, int, int] = (2, 2, 2, 2)
    conv1_t_size: int = 7
    conv1_t_stride: int = 1

    @nn.compact
    def __call__(self, x, train: bool = False):
        # x: [N, T, H, W, C]
        x = Conv3d(64, (self.conv1_t_size, 7, 7),
                   (self.conv1_t_stride, 2, 2),
                   (self.conv1_t_size // 2, 3, 3), name="conv1")(x)
        x = nn.relu(BatchNorm3d(name="bn1")(x, train))
        x = max_pool3d(x)
        taps = []
        inplanes = 64
        for idx, (planes, blocks) in enumerate(zip((64, 128, 256, 512), self.layers)):
            stride = 1 if idx == 0 else 2
            for b in range(blocks):
                s = stride if b == 0 else 1
                has_ds = b == 0 and (s != 1 or inplanes != planes)
                x = BasicBlock3d(planes, s, has_ds,
                                 name=f"layer{idx + 1}_{b}")(x, train)
                inplanes = planes
            taps.append(x)
        return tuple(taps)
