"""EfficientNet-B0..B4 backbone with UNet endpoint taps.

Re-implements the behavior of ``efficientnet_pytorch.EfficientNet`` +
``extract_endpoints`` as used by the attn pipeline
(/root/reference/core/models/classifiers/attn/eff.py:13-20): endpoints
``reduction_1..4`` are the features immediately before each spatial
downsampling; ``reduction_5`` is the swish-activated head conv output
(1280*width channels at /32) — matching the decoder depth map (eff.py:66-74).

MBConv follows the TF reference: expand 1x1 -> depthwise (TF-SAME padding) ->
squeeze-excite (reduction on *pre-expansion* channels) -> project 1x1, with
per-sample stochastic depth on identity blocks.  BN eps=1e-3, momentum=0.01.
"""

from __future__ import annotations

import math
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn
from jax import lax

from .layers import BatchNorm, Conv2d

# (width_coefficient, depth_coefficient, resolution, dropout)
_PARAMS = {
    "efficientnet-b0": (1.0, 1.0, 224, 0.2),
    "efficientnet-b1": (1.0, 1.1, 240, 0.2),
    "efficientnet-b2": (1.1, 1.2, 260, 0.3),
    "efficientnet-b3": (1.2, 1.4, 300, 0.3),
    "efficientnet-b4": (1.4, 1.8, 380, 0.4),
}

# (num_repeat, kernel, stride, expand_ratio, in_filters, out_filters, se_ratio)
_BLOCK_ARGS = (
    (1, 3, 1, 1, 32, 16, 0.25),
    (2, 3, 2, 6, 16, 24, 0.25),
    (2, 5, 2, 6, 24, 40, 0.25),
    (3, 3, 2, 6, 40, 80, 0.25),
    (3, 5, 1, 6, 80, 112, 0.25),
    (4, 5, 2, 6, 112, 192, 0.25),
    (1, 3, 1, 6, 192, 320, 0.25),
)


def round_filters(filters: int, width: float, divisor: int = 8) -> int:
    filters *= width
    new_f = max(divisor, int(filters + divisor / 2) // divisor * divisor)
    if new_f < 0.9 * filters:
        new_f += divisor
    return int(new_f)


def round_repeats(repeats: int, depth: float) -> int:
    return int(math.ceil(depth * repeats))


def head_channels(backbone_name: str) -> int:
    width = _PARAMS[backbone_name][0]
    return round_filters(1280, width)


def swish(x):
    return x * nn.sigmoid(x)


class _SameConv(nn.Module):
    """Conv with TF-style SAME padding (Conv2dStaticSamePadding semantics)."""

    features: int
    kernel: int
    stride: int = 1
    groups: int = 1

    @nn.compact
    def __call__(self, x, return_kernel: bool = False):
        in_ch = x.shape[-1]
        kernel = self.param(
            "kernel", nn.initializers.variance_scaling(2.0, "fan_out", "truncated_normal"),
            (self.kernel, self.kernel, in_ch // self.groups, self.features), jnp.float32)
        if return_kernel:
            # fused-MBConv path (ops/mbconv.py): declare the identical param,
            # hand the weight to the fused kernel instead of running the conv
            return kernel
        return lax.conv_general_dilated(
            x, kernel.astype(x.dtype),
            window_strides=(self.stride, self.stride),
            padding="SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=self.groups,
        )


class MBConvBlock(nn.Module):
    in_filters: int
    out_filters: int
    kernel: int
    stride: int
    expand_ratio: int
    se_ratio: float
    drop_connect_rate: float = 0.0

    @nn.compact
    def __call__(self, x, train: bool = False):
        inputs = x
        filters = self.in_filters * self.expand_ratio
        bn = lambda name: BatchNorm(momentum=0.01, epsilon=1e-3, name=name)
        from ..ops.mbconv import (fused_mbconv_applies, fused_mbconv_core,
                                  mbconv_fusion_enabled)
        if (mbconv_fusion_enabled() and not train and self.expand_ratio != 1
                and self.stride == 1
                and fused_mbconv_applies(x.shape, self.kernel, filters)):
            # eval-only fused segment (ops/mbconv.py): same param/stat tree,
            # expand+BN+swish+depthwise+BN+swish in one VMEM pass
            carrier = jnp.zeros((1, 1, 1, filters), x.dtype)
            we = _SameConv(filters, 1, name="expand_conv")(x, return_kernel=True)
            s0, b0 = bn("bn0")(carrier, fold_only=True)
            wd = _SameConv(filters, self.kernel, self.stride, groups=filters,
                           name="depthwise_conv")(carrier, return_kernel=True)
            s1, b1 = bn("bn1")(carrier, fold_only=True)
            x = fused_mbconv_core(x, we[0, 0].astype(x.dtype), s0, b0,
                                  wd[:, :, 0, :], s1, b1)
        else:
            if self.expand_ratio != 1:
                x = _SameConv(filters, 1, name="expand_conv")(x)
                x = swish(bn("bn0")(x, train))
            x = _SameConv(filters, self.kernel, self.stride, groups=filters,
                          name="depthwise_conv")(x)
            x = swish(bn("bn1")(x, train))

        if self.se_ratio > 0:
            squeezed = jnp.mean(x, axis=(1, 2), keepdims=True)
            se_ch = max(1, int(self.in_filters * self.se_ratio))
            s = Conv2d(se_ch, 1, name="se_reduce")(squeezed)
            s = Conv2d(filters, 1, name="se_expand")(swish(s))
            x = nn.sigmoid(s) * x

        x = _SameConv(self.out_filters, 1, name="project_conv")(x)
        x = bn("bn2")(x, train)

        if self.stride == 1 and self.in_filters == self.out_filters:
            if train and self.drop_connect_rate > 0:
                keep = 1.0 - self.drop_connect_rate
                rng = self.make_rng("dropout")
                mask = jax.random.bernoulli(rng, keep, (x.shape[0], 1, 1, 1))
                x = x * mask.astype(x.dtype) / keep
            x = x + inputs
        return x


class EfficientNetEncoder(nn.Module):
    """Returns endpoints {reduction_1..reduction_5} (eff.py extract_endpoints)."""

    backbone_name: str = "efficientnet-b2"
    drop_connect_rate: float = 0.2
    # MODEL.REMAT_BLOCKS: rematerialize each MBConv block in the backward
    # pass (nn.remat at block granularity).  Block boundaries are the only
    # saved activations, so peak HBM drops with depth — unlike whole-loss
    # SOLVER.REMAT, which keeps the entire recomputed forward live through
    # the backward sweep and saves nothing (measured: PROBE_REMAT.json).
    # Param tree and numerics are unchanged (tests/test_remat.py).
    remat_blocks: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False) -> Dict[str, jnp.ndarray]:
        width, depth, _, _ = _PARAMS[self.backbone_name]
        bn = lambda name: BatchNorm(momentum=0.01, epsilon=1e-3, name=name)
        block_cls = (nn.remat(MBConvBlock, static_argnums=(2,))
                     if self.remat_blocks else MBConvBlock)

        x = _SameConv(round_filters(32, width), 3, 2, name="conv_stem")(x)
        x = swish(bn("bn0")(x, train))

        # flatten per-variant block list exactly like efficientnet-pytorch
        blocks = []
        for (r, k, s, e, fi, fo, se) in _BLOCK_ARGS:
            fi, fo = round_filters(fi, width), round_filters(fo, width)
            reps = round_repeats(r, depth)
            blocks.append((k, s, e, fi, fo, se))
            for _ in range(reps - 1):
                blocks.append((k, 1, e, fo, fo, se))

        endpoints: Dict[str, jnp.ndarray] = {}
        prev = x
        for idx, (k, s, e, fi, fo, se) in enumerate(blocks):
            rate = self.drop_connect_rate * idx / len(blocks)
            x = block_cls(fi, fo, k, s, e, se, drop_connect_rate=rate,
                          name=f"blocks_{idx}")(x, train)
            if prev.shape[1] > x.shape[1]:
                endpoints[f"reduction_{len(endpoints) + 1}"] = prev
            prev = x

        x = _SameConv(round_filters(1280, width), 1, name="conv_head")(x)
        x = swish(bn("bn1")(x, train))
        endpoints[f"reduction_{len(endpoints) + 1}"] = x
        return endpoints
