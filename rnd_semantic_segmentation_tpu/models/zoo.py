"""Research-zoo attention/context blocks (selectable options, round-1 batch 2).

Reference files under core/models/classifiers/gcpacc/contextagg/ that the
framework exposes for experimentation (none are used by live pipelines;
SURVEY §2.2 zoo table):

  * NLBlockND  — non-local block, 4 pairwise modes (nonlocal.py:17-175)
  * A2Net      — double attention (a2net.py:13-72)
  * PyramidSelfAttention / APNB / AFNB — asymmetric (pyramid-pooled K/V)
    non-local + fusion variant (apnb.py / afnb.py)
  * SpatialGCN / DualGCN / DualGCNHead — graph-conv duals (DualGCNNet.py:14-170)
  * SpatialCGNLx — CGNL with Taylor-expanded Gaussian RBF kernel
    (cgnonlocal.py:211-320)
  * RCCAModule — recurrent criss-cross head (ccnet.py:201-236); the reference
    wraps convs in InPlaceABNSync (BN + leaky-relu 0.01), reproduced as
    BN+LeakyReLU
  * SEBlock    — squeeze-and-excitation channel gate (SENet.py)

All modules are NHWC; matmuls run on the MXU via einsum/dot_general.
"""

from __future__ import annotations

import math
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops import adaptive_avg_pool_1x1, max_pool, resize_bilinear
from .contextagg import _adaptive_avg_pool
from .gcpa import CrissCrossAttention
from .layers import BatchNorm, Conv2d, GroupNorm, leaky_relu, relu


class NLBlockND(nn.Module):
    """2D non-local block; mode in {gaussian, embedded, dot, concatenate}."""

    mode: str = "embedded"
    inter_channels: Optional[int] = None
    bn_layer: bool = True

    @nn.compact
    def __call__(self, x, train: bool = False):
        b, h, w, c = x.shape
        inter = self.inter_channels or max(c // 2, 1)
        n = h * w
        g_x = Conv2d(inter, 1, name="g")(x).reshape(b, n, inter)

        if self.mode == "gaussian":
            theta = x.reshape(b, n, c)
            phi = x.reshape(b, n, c)
            f = jnp.einsum("bic,bjc->bij", theta, phi)
        elif self.mode in ("embedded", "dot"):
            theta = Conv2d(inter, 1, name="theta")(x).reshape(b, n, inter)
            phi = Conv2d(inter, 1, name="phi")(x).reshape(b, n, inter)
            f = jnp.einsum("bic,bjc->bij", theta, phi)
        elif self.mode == "concatenate":
            theta = Conv2d(inter, 1, name="theta")(x).reshape(b, n, inter)
            phi = Conv2d(inter, 1, name="phi")(x).reshape(b, n, inter)
            ti = jnp.broadcast_to(theta[:, :, None, :], (b, n, n, inter))
            pj = jnp.broadcast_to(phi[:, None, :, :], (b, n, n, inter))
            cat = jnp.concatenate([ti, pj], axis=-1)
            wf = Conv2d(1, 1, name="W_f")  # 1x1 conv == dense over channels
            f = relu(wf(cat.reshape(b, n * n, 1, 2 * inter)).reshape(b, n, n))
        else:
            raise ValueError(self.mode)

        if self.mode in ("gaussian", "embedded"):
            f = jax.nn.softmax(f, axis=-1)
        else:
            f = f / n
        y = jnp.einsum("bij,bjc->bic", f, g_x).reshape(b, h, w, inter)
        if self.bn_layer:
            y = Conv2d(c, 1, name="W_z_conv")(y)
            # BN scale initialized to zero -> identity at init (nonlocal.py:86-88)
            y = BatchNorm(scale_init=nn.initializers.zeros, name="W_z_bn")(y, train)
        else:
            y = Conv2d(c, 1, kernel_init=nn.initializers.zeros,
                       name="W_z_conv")(y)
        return y + x


class A2Net(nn.Module):
    """Double attention: gather (A softmax-B^T) then distribute (softmax-V)."""

    c_m: int
    c_n: int

    @nn.compact
    def __call__(self, x, train: bool = False):
        del train
        b, h, w, _ = x.shape
        n = h * w
        a = Conv2d(self.c_m, 1, name="convA")(x).reshape(b, n, self.c_m)
        bb = Conv2d(self.c_n, 1, name="convB")(x).reshape(b, n, self.c_n)
        v = Conv2d(self.c_n, 1, name="convV")(x).reshape(b, n, self.c_n)
        # torch softmax over the flattened (K*h*w) axis for B, c_n axis for V
        att_b = jax.nn.softmax(bb, axis=1)
        att_v = jax.nn.softmax(v, axis=-1)
        gathered = jnp.einsum("bnm,bnc->bmc", a, att_b)     # [B, c_m, c_n]
        out = jnp.einsum("bmc,bnc->bnm", gathered, att_v)   # [B, N, c_m]
        return out.reshape(b, h, w, self.c_m)


class PyramidSelfAttention(nn.Module):
    """Self-attention with pyramid-pooled keys/values (apnb.py:82-168).

    ``query_channels_from`` enables the AFNB fusion variant: query computed
    from a second (high-level) input while K/V come from the first.
    """

    key_channels: int
    value_channels: int
    out_channels: Optional[int] = None
    psp_size: Tuple[int, ...] = (1, 3, 6, 8)
    fusion: bool = False

    @nn.compact
    def __call__(self, low, high=None, train: bool = False):
        x = low
        q_src = high if (self.fusion and high is not None) else low
        b, h, w, c = q_src.shape
        out_c = self.out_channels or q_src.shape[-1]

        f_key_conv = Conv2d(self.key_channels, 1, name="f_key")
        f_key_bn = BatchNorm(name="f_key_bn")
        key = relu(f_key_bn(f_key_conv(x), train))
        if self.fusion:
            query = Conv2d(self.key_channels, 1, name="f_query")(q_src)
            query = relu(BatchNorm(name="f_query_bn")(query, train))
        else:
            # APNB shares f_query = f_key (apnb.py:126): same modules reused
            query = relu(f_key_bn(f_key_conv(q_src), train))
        value = Conv2d(self.value_channels, 1, name="f_value")(x)

        # pyramid-pool K and V to a small token set (apnb.py:60-79)
        def psp(t):
            toks = [jnp.reshape(_adaptive_avg_pool(t, (s, s)),
                                (t.shape[0], s * s, t.shape[-1]))
                    for s in self.psp_size]
            return jnp.concatenate(toks, axis=1)

        key_t = psp(key)          # [B, S, Ck]
        value_t = psp(value)      # [B, S, Cv]
        query_t = query.reshape(b, h * w, self.key_channels)
        sim = jnp.einsum("bqc,bsc->bqs", query_t, key_t) * (self.key_channels ** -0.5)
        sim = jax.nn.softmax(sim, axis=-1)
        ctx = jnp.einsum("bqs,bsc->bqc", sim, value_t)
        ctx = ctx.reshape(b, h, w, self.value_channels)
        return Conv2d(out_c, 1, kernel_init=nn.initializers.zeros,
                      name="W")(ctx)


class APNB(nn.Module):
    out_channels: int
    key_channels: int
    value_channels: int
    dropout: float = 0.05
    psp_size: Tuple[int, ...] = (1, 3, 6, 8)

    @nn.compact
    def __call__(self, feats, train: bool = False):
        ctx = PyramidSelfAttention(
            self.key_channels, self.value_channels, feats.shape[-1],
            self.psp_size, name="stage0")(feats, train=train)
        out = jnp.concatenate([ctx, feats], axis=-1)
        out = Conv2d(self.out_channels, 1, name="conv_bn_conv")(out)
        out = relu(BatchNorm(name="conv_bn_bn")(out, train))
        if train and self.dropout > 0:
            rng = self.make_rng("dropout")
            keep = jax.random.bernoulli(rng, 1 - self.dropout,
                                        out.shape[:1] + (1, 1) + out.shape[-1:])
            out = out * keep / (1 - self.dropout)
        return out


class AFNB(nn.Module):
    """Fusion variant: low-level K/V attend into high-level queries."""

    out_channels: int
    key_channels: int
    value_channels: int
    dropout: float = 0.05
    psp_size: Tuple[int, ...] = (1, 3, 6, 8)

    @nn.compact
    def __call__(self, low, high, train: bool = False):
        ctx = PyramidSelfAttention(
            self.key_channels, self.value_channels, self.out_channels,
            self.psp_size, fusion=True, name="stage0")(low, high, train=train)
        out = jnp.concatenate([ctx, high], axis=-1)
        out = Conv2d(self.out_channels, 1, name="conv_bn_conv")(out)
        out = BatchNorm(name="conv_bn_bn")(out, train)
        return out


class SpatialGCN(nn.Module):
    """Graph conv over spatial tokens (DualGCNNet.py:14-50)."""

    bn_axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        b, h, w, c = x.shape
        inter = c // 2
        n = h * w
        k = Conv2d(inter, 1, name="node_k")(x).reshape(b, n, inter)
        v = Conv2d(inter, 1, name="node_v")(x).reshape(b, n, inter)
        q = Conv2d(inter, 1, name="node_q")(x).reshape(b, n, inter)
        av = jnp.einsum("bnc,bnd->bcd", q, v)          # [B, inter, inter]
        av = jax.nn.softmax(av, axis=-1)
        av = jnp.einsum("bnc,bcd->bnd", k, av)         # [B, N, inter]
        # conv_wg: 1d conv over channel tokens == dense on the channel axis
        avw = nn.Dense(inter, use_bias=False, name="conv_wg")(av)
        avw = _BatchNorm1dTokens(name="bn_wg")(avw, train)
        avw = avw.reshape(b, h, w, inter)
        out = Conv2d(c, 1, name="out_conv")(avw)
        out = BatchNorm(axis_name=self.bn_axis_name, name="out_bn")(out, train)
        return relu(out + x)


class _BatchNorm1dTokens(nn.Module):
    """torch BatchNorm1d over [B, C, N] tokens -> here [B, N, C]."""

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
            mean = jnp.mean(xf, axis=(0, 1))
            var = jnp.mean(jnp.square(xf), axis=(0, 1)) - jnp.square(mean)
            if not self.is_initializing():
                nelem = x.shape[0] * x.shape[1]
                unbiased = var * nelem / max(nelem - 1, 1)
                ra_mean.value = 0.9 * ra_mean.value + 0.1 * mean
                ra_var.value = 0.9 * ra_var.value + 0.1 * unbiased
        else:
            mean, var = ra_mean.value, ra_var.value
        y = (x.astype(jnp.float32) - mean) * jax.lax.rsqrt(var + self.epsilon)
        return (y * scale + bias).astype(x.dtype)


class DualGCN(nn.Module):
    """Coordinate + feature-space GCN (DualGCNNet.py:53-161)."""

    ratio: int = 4
    bn_axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        ax = self.bn_axis_name
        b, h, w, c = x.shape
        r2 = c // self.ratio * 2
        r1 = c // self.ratio

        # local spatial GCN branch on 3x downsampled features
        local = x
        for i in range(3):
            local = Conv2d(c, 3, 2, padding=1, groups=c, use_bias=False,
                           name=f"local_conv{i}")(local)
            local = BatchNorm(axis_name=ax, name=f"local_bn{i}")(local, train)
        local = SpatialGCN(bn_axis_name=ax, name="gcn_local_attention")(local, train)
        local = resize_bilinear(local.astype(jnp.float32), (h, w),
                                align_corners=True).astype(x.dtype)
        spatial_local_feat = x * local + x

        # projection space
        x_sqz = Conv2d(r2, 1, use_bias=False, name="phi")(x)
        x_sqz = BatchNorm(axis_name=ax, name="bn_phi")(x_sqz, train)
        bproj = Conv2d(r1, 1, use_bias=False, name="theta")(x)
        bproj = BatchNorm(axis_name=ax, name="bn_theta")(bproj, train)
        xs = x_sqz.reshape(b, h * w, r2)
        bp = bproj.reshape(b, h * w, r1)
        z_idt = jnp.einsum("bnm,bnk->bmk", xs, bp)    # [B, r2, r1]

        z = jnp.swapaxes(z_idt, 1, 2)                 # [B, r1, r2]
        z = nn.Dense(r1, use_bias=False, name="conv_adj")(jnp.swapaxes(z, 1, 2))
        z = _BatchNorm1dTokens(name="bn_adj")(z, train)      # tokens=r2, ch=r1
        z = z + z_idt                                  # laplacian smoothing
        z = jnp.swapaxes(z, 1, 2)                      # [B, r1, r2]
        z = nn.Dense(r2, use_bias=False, name="conv_wg")(z)
        z = _BatchNorm1dTokens(name="bn_wg")(z, train)
        z = jnp.swapaxes(z, 1, 2)                      # [B, r2, r1]

        y = jnp.einsum("bmk,bnk->bnm", z, bp)          # [B, N, r2]
        y = y.reshape(b, h, w, r2)
        y = Conv2d(c, 1, use_bias=False, name="conv3")(y)
        y = BatchNorm(axis_name=ax, name="bn3")(y, train)
        g_out = relu(x + y)

        out = jnp.concatenate([spatial_local_feat, g_out], axis=-1)
        out = Conv2d(c, 1, use_bias=False, name="final_conv")(out)
        return BatchNorm(axis_name=ax, name="final_bn")(out, train)


class DualGCNHead(nn.Module):
    interplanes: int
    num_classes: int
    bn_axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        ax = self.bn_axis_name
        out = Conv2d(self.interplanes, 3, padding=1, use_bias=False, name="conva_conv")(x)
        out = relu(BatchNorm(axis_name=ax, name="conva_bn")(out, train))
        out = DualGCN(bn_axis_name=ax, name="dualgcn")(out, train)
        out = Conv2d(self.interplanes, 3, padding=1, use_bias=False, name="convb_conv")(out)
        out = relu(BatchNorm(axis_name=ax, name="convb_bn")(out, train))
        out = jnp.concatenate([x, out], axis=-1)
        out = Conv2d(self.interplanes, 3, padding=1, use_bias=False,
                     name="bottleneck_conv")(out)
        out = relu(BatchNorm(axis_name=ax, name="bottleneck_bn")(out, train))
        return Conv2d(self.num_classes, 1, name="classifier")(out)


class SpatialCGNLx(nn.Module):
    """CGNL with Taylor-expanded Gaussian RBF kernel (cgnonlocal.py:211-320)."""

    planes: int
    groups: int = 8
    order: int = 2
    use_scale: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        del train
        b, h, w, c = x.shape
        t = Conv2d(self.planes, 1, use_bias=False, name="t")(x).astype(jnp.float32)
        p = Conv2d(self.planes, 1, use_bias=False, name="p")(x).astype(jnp.float32)
        g = Conv2d(self.planes, 1, use_bias=False, name="g")(x).astype(jnp.float32)
        gch = self.planes // self.groups
        tg = t.reshape(b, h, w, self.groups, gch)
        pg = p.reshape(b, h, w, self.groups, gch)
        gg = g.reshape(b, h, w, self.groups, gch)
        gamma = jnp.float32(1e-4)
        beta = jnp.exp(-2.0 * gamma)
        # Taylor form (cgnonlocal.py:276-305):
        #   x = sum_n alpha_n * <p^n, g> * t^n,  alpha_n = beta*(2g)^n/n!
        out = jnp.zeros_like(tg)
        for n in range(self.order + 1):
            coef = beta * (2 * gamma) ** n / math.factorial(n)
            att = jnp.sum((pg ** n) * gg, axis=(1, 2, 4), keepdims=True)
            if self.use_scale:
                att = att / jnp.sqrt(jnp.asarray(gch * h * w, jnp.float32))
            out = out + coef * att * (tg ** n)
        out = out.reshape(b, h, w, self.planes).astype(x.dtype)
        out = Conv2d(c, 1, groups=self.groups, use_bias=False, name="z")(out)
        out = GroupNorm(num_groups=self.groups, name="gn")(out)
        return out + x


class RCCAModule(nn.Module):
    """Recurrent criss-cross head (ccnet.py:201-236); InPlaceABNSync ->
    BN + LeakyReLU(0.01)."""

    out_channels: int
    num_classes: int
    recurrence: int = 2
    bn_axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        ax = self.bn_axis_name
        c = x.shape[-1]
        inter = c // 4
        out = Conv2d(inter, 3, padding=1, use_bias=False, name="conva_conv")(x)
        out = leaky_relu(BatchNorm(axis_name=ax, name="conva_bn")(out, train))
        cca = CrissCrossAttention(name="cca")
        for _ in range(self.recurrence):
            out = cca(out)
        out = Conv2d(inter, 3, padding=1, use_bias=False, name="convb_conv")(out)
        out = leaky_relu(BatchNorm(axis_name=ax, name="convb_bn")(out, train))
        out = jnp.concatenate([x, out], axis=-1)
        out = Conv2d(self.out_channels, 3, padding=1, use_bias=False,
                     name="bottleneck_conv")(out)
        out = leaky_relu(BatchNorm(axis_name=ax, name="bottleneck_bn")(out, train))
        return Conv2d(self.num_classes, 1, name="classifier")(out)


class SpatialNL(nn.Module):
    """Plain spatial non-local block with softmax attention
    (cgnonlocal.py:340-390)."""

    planes: int
    use_scale: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        b, h, w, c = x.shape
        n = h * w
        t = Conv2d(self.planes, 1, use_bias=False, name="t")(x).reshape(b, n, self.planes)
        p = Conv2d(self.planes, 1, use_bias=False, name="p")(x).reshape(b, n, self.planes)
        g = Conv2d(self.planes, 1, use_bias=False, name="g")(x).reshape(b, n, self.planes)
        att = jnp.einsum("bic,bjc->bij", t, p)
        if self.use_scale:
            att = att / jnp.sqrt(jnp.asarray(self.planes, jnp.float32))
        att = jax.nn.softmax(att, axis=-1)
        y = jnp.einsum("bij,bjc->bic", att, g).reshape(b, h, w, self.planes)
        y = Conv2d(c, 1, use_bias=False, name="z")(y)
        y = BatchNorm(name="bn")(y, train)
        return y + x


class SEBlock(nn.Module):
    """Squeeze-and-excitation channel gate (SENet.py)."""

    reduction: int = 16

    @nn.compact
    def __call__(self, x, train: bool = False):
        del train
        c = x.shape[-1]
        s = adaptive_avg_pool_1x1(x)
        s = relu(nn.Dense(c // self.reduction, name="fc1")(s))
        s = nn.sigmoid(nn.Dense(c, name="fc2")(s))
        return x * s
