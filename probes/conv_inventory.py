"""Zero-compute conv inventory per family (eval_shape + conv interception).

Enumerates every conv in the forward pass with shapes, FLOPs, and activation
bytes, then aggregates by utilization class — the analytic half of the
attn/pranet/gald roofline (chip probes supply the achieved-TFLOPs half).
"""
import json
import os
import sys
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

jax.config.update("jax_platforms", "cpu")

from jax import lax

_LOG = []
_orig = lax.conv_general_dilated


def _spy(x, k, window_strides, padding, *a, **kw):
    y = _orig(x, k, window_strides, padding, *a, **kw)
    groups = kw.get("feature_group_count", 1)
    kh, kw_, cig, co = k.shape
    b = x.shape[0]
    oh, ow = y.shape[1], y.shape[2]
    flops = 2 * b * oh * ow * co * kh * kw_ * cig
    import math
    bytes_ = 2 * (math.prod(x.shape) + math.prod(y.shape))
    _LOG.append({"x": list(x.shape), "k": list(k.shape), "y": list(y.shape),
                 "g": groups, "gflops": flops / 1e9, "mbytes": bytes_ / 1e6})
    return y


def classify(e):
    kh, kw_, cig, co = e["k"]
    ci = cig * e["g"]
    if e["g"] > 1:
        return "depthwise"
    if kh == kw_ == 1:
        if min(ci, co) < 64:
            return "1x1 narrow(<64)"
        return "1x1 wide"
    if max(ci, co) < 64:
        return "kxk narrow(<64)"
    if min(ci, co) < 64:
        return "kxk mixed"
    return "kxk wide"


def inventory(name, fn, *args):
    _LOG.clear()
    lax.conv_general_dilated = _spy
    try:
        jax.eval_shape(fn, *args)
    finally:
        lax.conv_general_dilated = _orig
    agg = defaultdict(lambda: {"n": 0, "gflops": 0.0, "mbytes": 0.0})
    for e in _LOG:
        c = classify(e)
        agg[c]["n"] += 1
        agg[c]["gflops"] += e["gflops"]
        agg[c]["mbytes"] += e["mbytes"]
    total_f = sum(v["gflops"] for v in agg.values())
    total_b = sum(v["mbytes"] for v in agg.values())
    print(f"== {name}: {len(_LOG)} convs, {total_f:.1f} GFLOP fwd, "
          f"{total_b:.0f} MB conv act traffic")
    for c, v in sorted(agg.items(), key=lambda kv: -kv[1]["gflops"]):
        print(json.dumps({"class": c, "n": v["n"],
                          "gflops": round(v["gflops"], 1),
                          "share": round(v["gflops"] / total_f, 3),
                          "mbytes": round(v["mbytes"]),
                          "byte_share": round(v["mbytes"] / total_b, 3)}))
    # top-10 individual convs by flops
    for e in sorted(_LOG, key=lambda e: -e["gflops"])[:10]:
        print(json.dumps({k: e[k] for k in ("x", "k", "y", "g")}
                         | {"gflops": round(e["gflops"], 1)}))


B = 16

ONLY = os.environ.get("FAMILY")  # e.g. FAMILY=deeplab to run one census


def wanted(name):
    return ONLY is None or ONLY in name


if wanted("deeplab"):
    from rnd_semantic_segmentation_tpu.models.resnet import ResNet
    from rnd_semantic_segmentation_tpu.models.aspp import ASPPClassifierV2

    rnet = ResNet(arch="resnet101", norm_kind="frozen",
                  replace_stride_with_dilation=(False, True, True))
    head = ASPPClassifierV2(num_classes=19)
    xd = jnp.zeros((B, 512, 512, 3), jnp.bfloat16)
    vr = jax.eval_shape(lambda: rnet.init(jax.random.PRNGKey(0), xd[:1]))
    vh = jax.eval_shape(lambda: head.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 2048), jnp.bfloat16)))

    def deeplab_fwd(vr, vh, x):
        feats = rnet.apply(vr, x)["layer4"]
        return head.apply(vh, feats)

    inventory("deeplab r101 @512 b16", deeplab_fwd, vr, vh, xd)

if wanted("attn"):
    from rnd_semantic_segmentation_tpu.models.attn_unet import AttnEfficientNetUnet
    net = AttnEfficientNetUnet("efficientnet-b2", num_classes=2)
    x = jnp.zeros((B, 512, 512, 3), jnp.bfloat16)
    v = jax.eval_shape(lambda: net.init(jax.random.PRNGKey(0), x[:1]))
    # eval_shape of init gives abstract vars; apply with an abstract pytree
    # works under eval_shape.
    inventory("attn b2 @512 b16", lambda v, x: net.apply(v, x), v, x)

if wanted("pranet"):
    from rnd_semantic_segmentation_tpu.models.pranet import PraNet
    pnet = PraNet()
    xp = jnp.zeros((B, 352, 352, 3), jnp.bfloat16)
    vp = jax.eval_shape(lambda: pnet.init(jax.random.PRNGKey(0), xp[:1]))
    inventory("pranet @352 b16", lambda v, x: pnet.apply(v, x), vp, xp)

if wanted("gald"):
    from rnd_semantic_segmentation_tpu.models.gcpa import GCPAEncoder, GCPADecoder
    enc, dec = GCPAEncoder(), GCPADecoder(num_classes=19)
    xg = jnp.zeros((B, 512, 512, 3), jnp.bfloat16)
    vg = jax.eval_shape(lambda: enc.init(jax.random.PRNGKey(0), xg[:1]))

    def gald_fwd(v, x):
        return enc.apply(v, x)

    inventory("gald encoder @512 b16", gald_fwd, vg, xg)
