"""Core NN building blocks (Flax linen, NHWC, torch-compatible semantics).

These are the primitives every model family builds on.  Semantics are matched
to the torch layers the reference uses so that imported pretrained weights
produce identical activations:

  * ``Conv2d`` — ``nn.Conv2d`` with symmetric integer padding / dilation /
    groups (weights stored HWIO; the checkpoint importer transposes OIHW).
  * ``ConvTranspose2d`` — ``nn.ConvTranspose2d(k,s,p)`` exactly (attn decoder
    upsamplers, /root/reference/core/models/classifiers/attn/eff.py:53-58,91-92).
  * ``BatchNorm`` — ``nn.BatchNorm2d`` (eps=1e-5, momentum=0.1).  Under pjit
    data-parallelism the batch axis is a single global array, so batch
    statistics automatically span all devices — the TPU-native replacement for
    ``SyncBatchNorm`` (reference train_distill.py:52-53) with zero extra code.
    An optional ``axis_name`` supports shard_map/pmap contexts.
  * ``FrozenBatchNorm`` — buffers-only affine fold with *no eps*, matching
    /root/reference/core/components/layers.py:5-23.
"""

from __future__ import annotations

from typing import Any, Callable, Optional, Sequence, Tuple, Union

import jax
import jax.numpy as jnp
from flax import linen as nn
from jax import lax

Dtype = Any

_IntPair = Union[int, Tuple[int, int]]


def _pair(v: _IntPair) -> Tuple[int, int]:
    return (v, v) if isinstance(v, int) else (int(v[0]), int(v[1]))


class Conv2d(nn.Module):
    """torch-style 2D convolution on NHWC tensors.

    Weight layout HWIO (flax native).  ``padding`` is symmetric ints like
    torch; computation runs in ``dtype`` (bf16 on TPU) with f32 params.
    """

    features: int
    kernel_size: _IntPair = 3
    stride: _IntPair = 1
    padding: _IntPair = 0
    dilation: _IntPair = 1
    groups: int = 1
    use_bias: bool = True
    dtype: Optional[Dtype] = None
    kernel_init: Callable = nn.initializers.variance_scaling(1 / 3, "fan_in", "uniform")
    bias_init: Callable = nn.initializers.zeros

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        kh, kw = _pair(self.kernel_size)
        ph, pw = _pair(self.padding)
        in_ch = x.shape[-1]
        kernel = self.param(
            "kernel", self.kernel_init, (kh, kw, in_ch // self.groups, self.features),
            jnp.float32,
        )
        dtype = self.dtype or x.dtype
        bias = (self.param("bias", self.bias_init, (self.features,), jnp.float32)
                if self.use_bias else None)
        conv_kwargs = dict(
            window_strides=_pair(self.stride),
            padding=((ph, ph), (pw, pw)),
            rhs_dilation=_pair(self.dilation),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=self.groups,
        )
        # serving-path int8 quantization hook (serve/quant.py); a no-op
        # (contextvar read at trace time) unless a quant_scope is active.
        from ..serve.quant import current_quant, module_path
        qctx = current_quant()
        if qctx is not None:
            qy = qctx.conv2d(module_path(self), x, kernel, bias, conv_kwargs)
            if qy is not None:
                return qy
        # narrow-conv space-to-depth lowering (ops/s2d.py; opt-in via
        # MODEL.S2D_MAX_CHANNELS — same trace-time-policy caveats as quant)
        from ..ops.s2d import conv2d_s2d, s2d_applies
        if qctx is None and s2d_applies(
                x.shape, kernel.shape, conv_kwargs["window_strides"],
                conv_kwargs["padding"], conv_kwargs["rhs_dilation"],
                self.groups):
            y = conv2d_s2d(x.astype(dtype), kernel.astype(dtype),
                           conv_kwargs["window_strides"],
                           conv_kwargs["padding"])
            if bias is not None:
                y = y + bias.astype(dtype)
            return y
        y = lax.conv_general_dilated(
            x.astype(dtype), kernel.astype(dtype), **conv_kwargs)
        if bias is not None:
            y = y + bias.astype(dtype)
        return y


class ConvTranspose2d(nn.Module):
    """torch ``nn.ConvTranspose2d(kernel, stride, padding)`` on NHWC.

    Implemented as an input-dilated correlation: out = (in-1)*s - 2p + k.
    The kernel is stored in HWIO *correlation* orientation; the torch
    checkpoint importer flips spatial dims and transposes (I,O,kH,kW).
    """

    features: int
    kernel_size: _IntPair = 4
    stride: _IntPair = 2
    padding: _IntPair = 1
    output_padding: int = 0
    use_bias: bool = True
    dtype: Optional[Dtype] = None
    kernel_init: Callable = nn.initializers.variance_scaling(1 / 3, "fan_in", "uniform")
    bias_init: Callable = nn.initializers.zeros

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        kh, kw = _pair(self.kernel_size)
        sh, sw = _pair(self.stride)
        ph, pw = _pair(self.padding)
        op = self.output_padding
        in_ch = x.shape[-1]
        kernel = self.param(
            "kernel", self.kernel_init, (kh, kw, in_ch, self.features), jnp.float32
        )
        dtype = self.dtype or x.dtype
        # sub-pixel phase decomposition (ops/subpixel.py): exact rewrite
        # that skips the dilation zeros — 1/s² of the dilated lowering's
        # MACs; opt-in via MODEL.SUBPIXEL_DECONV (trace-time policy)
        from ..ops.subpixel import conv_transpose_subpixel, subpixel_enabled
        if subpixel_enabled() and max(sh, sw) > 1:
            y = conv_transpose_subpixel(x.astype(dtype),
                                        kernel.astype(dtype),
                                        (sh, sw), (ph, pw), op)
        else:
            y = lax.conv_general_dilated(
                x.astype(dtype),
                kernel.astype(dtype),
                window_strides=(1, 1),
                padding=((kh - 1 - ph, kh - 1 - ph + op),
                         (kw - 1 - pw, kw - 1 - pw + op)),
                lhs_dilation=(sh, sw),
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )
        if self.use_bias:
            bias = self.param("bias", self.bias_init, (self.features,), jnp.float32)
            y = y + bias.astype(dtype)
        return y


class BatchNorm(nn.Module):
    """torch ``nn.BatchNorm2d`` semantics (eps=1e-5, momentum=0.1).

    ``train=True`` uses batch statistics and updates ``batch_stats``;
    ``train=False`` uses running statistics.  ``axis_name`` enables explicit
    cross-replica reduction inside shard_map/pmap (under plain pjit the global
    batch already yields synchronized statistics).
    """

    momentum: float = 0.1
    epsilon: float = 1e-5
    axis_name: Optional[str] = None
    dtype: Optional[Dtype] = None
    scale_init: Callable = nn.initializers.ones

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False,
                 fold_only: bool = False) -> jnp.ndarray:
        c = x.shape[-1]
        scale = self.param("scale", self.scale_init, (c,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (c,), jnp.float32)
        ra_mean = self.variable("batch_stats", "mean", lambda: jnp.zeros((c,), jnp.float32))
        ra_var = self.variable("batch_stats", "var", lambda: jnp.ones((c,), jnp.float32))

        if fold_only:
            # eval-affine fold for fused kernels (ops/mbconv.py): declare the
            # identical param/stat tree, return (s, b) with y = x*s + b
            s = lax.rsqrt(ra_var.value + self.epsilon) * scale
            return s, bias - ra_mean.value * s

        dtype = self.dtype or x.dtype
        if train:
            xf = x.astype(jnp.float32)
            mean = jnp.mean(xf, axis=(0, 1, 2))
            mean2 = jnp.mean(jnp.square(xf), axis=(0, 1, 2))
            if self.axis_name is not None:
                mean = lax.pmean(mean, self.axis_name)
                mean2 = lax.pmean(mean2, self.axis_name)
            var = mean2 - jnp.square(mean)
            n = x.shape[0] * x.shape[1] * x.shape[2]
            if self.axis_name is not None:
                n = n * lax.psum(1, self.axis_name)
            if not self.is_initializing():
                # torch updates running_var with the *unbiased* batch variance
                unbiased = var * (n / max(n - 1, 1))
                ra_mean.value = (1 - self.momentum) * ra_mean.value + self.momentum * mean
                ra_var.value = (1 - self.momentum) * ra_var.value + self.momentum * unbiased
        else:
            mean = ra_mean.value
            var = ra_var.value

        inv = lax.rsqrt(var + self.epsilon) * scale
        y = (x.astype(jnp.float32) - mean) * inv + bias
        return y.astype(dtype)


class FrozenBatchNorm(nn.Module):
    """Buffers-only BN: ``x * weight*rsqrt(var) + (bias - mean*weight*rsqrt(var))``.

    Matches /root/reference/core/components/layers.py:5-23 exactly — note the
    reference applies **no epsilon**.  Buffers live in the ``frozen`` variable
    collection so they are excluded from the optimizer by construction.
    """

    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        del train  # frozen regardless
        c = x.shape[-1]
        weight = self.variable("frozen", "weight", lambda: jnp.ones((c,), jnp.float32))
        bias = self.variable("frozen", "bias", lambda: jnp.zeros((c,), jnp.float32))
        mean = self.variable("frozen", "mean", lambda: jnp.zeros((c,), jnp.float32))
        var = self.variable("frozen", "var", lambda: jnp.ones((c,), jnp.float32))
        dtype = self.dtype or x.dtype
        # scale/shift folded in f32, applied in the activation dtype — avoids
        # f32<->bf16 round trips around every conv on the bf16 training path
        # (f32 parity paths are unchanged)
        scale = weight.value * lax.rsqrt(var.value)
        shift = bias.value - mean.value * scale
        return x * scale.astype(dtype) + shift.astype(dtype)


class GroupNorm(nn.Module):
    """torch ``nn.GroupNorm`` (SpatialCGNL head, contextagg/GALDNet.py:33)."""

    num_groups: int
    epsilon: float = 1e-5
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        del train
        c = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (c,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (c,), jnp.float32)
        dtype = self.dtype or x.dtype
        n, h, w, _ = x.shape
        g = self.num_groups
        xf = x.astype(jnp.float32).reshape(n, h, w, g, c // g)
        mean = jnp.mean(xf, axis=(1, 2, 4), keepdims=True)
        var = jnp.mean(jnp.square(xf - mean), axis=(1, 2, 4), keepdims=True)
        y = (xf - mean) * lax.rsqrt(var + self.epsilon)
        y = y.reshape(n, h, w, c) * scale + bias
        return y.astype(dtype)


class LayerNormCHW(nn.Module):
    """torch ``nn.LayerNorm([C,1,1])`` on a [B,1,1,C] context tensor (GCNet
    channel transform, gcnet.py): normalize over the channel axis."""

    epsilon: float = 1e-5

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        c = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (c,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (c,), jnp.float32)
        xf = x.astype(jnp.float32)
        mean = jnp.mean(xf, axis=-1, keepdims=True)
        var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
        y = (xf - mean) * lax.rsqrt(var + self.epsilon) * scale + bias
        return y.astype(x.dtype)


def make_norm(kind: str, axis_name: Optional[str] = None) -> Callable[..., nn.Module]:
    """Norm factory: 'bn' (trainable) or 'frozen' (affine-folded buffers).

    Plays the role of the injectable ``norm_layer`` in the reference backbones
    (core/components/resnet.py norm_layer / core/models/feature_extractor.py:37-39).
    """
    if kind == "bn":
        return lambda name=None: BatchNorm(axis_name=axis_name, name=name)
    if kind == "frozen":
        return lambda name=None: FrozenBatchNorm(name=name)
    raise ValueError(f"unknown norm kind {kind!r}")


def relu(x: jnp.ndarray) -> jnp.ndarray:
    return jax.nn.relu(x)


def relu6(x: jnp.ndarray) -> jnp.ndarray:
    return jnp.minimum(jax.nn.relu(x), 6.0)


def leaky_relu(x: jnp.ndarray, negative_slope: float = 0.01) -> jnp.ndarray:
    return jax.nn.leaky_relu(x, negative_slope)
