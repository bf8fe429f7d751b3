"""PyTorch checkpoint -> Flax variables importer.

Needed for (a) pretrained backbones (resnet101 URL configs/deeplabv2_r101_src.yaml:3,
hardnet68.pth hardnet_68.py:271, res2net50 local .pth Res2Net_v1b.py:195,
efficientnet-pytorch weights) and (b) full reference checkpoints for the
logit-parity tests (BASELINE.md north star).

Approach: rewrite each torch ``state_dict`` key into a flax variable path via
per-architecture regex rules (the flax module names in models/ were chosen to
make this mechanical), then convert tensors by role:
  * conv weight  OIHW -> HWIO
  * depthwise conv weight (C,1,kh,kw) -> (kh,kw,1,C)
  * transposed-conv weight (I,O,kh,kw) -> spatially flipped HWIO (correlation
    orientation, see models/layers.py ConvTranspose2d)
  * BN weight/bias -> params scale/bias; running_mean/var -> batch_stats
    (or all four into the ``frozen`` collection when freeze_bn)
  * linear weight (O,I) -> (I,O)

DDP 'module.' prefixes are stripped like the reference
(utility.py:163-170, train_distill.py:20-30).
"""

from __future__ import annotations

import re
from typing import Any, Dict, List, Optional, Tuple

import numpy as np


def strip_prefix_if_present(state_dict: Dict[str, Any], prefix: str) -> Dict[str, Any]:
    keys = list(state_dict.keys())
    if not all(k.startswith(prefix) for k in keys):
        return state_dict
    return {k[len(prefix):]: v for k, v in state_dict.items()}


def load_torch_state_dict(path: str) -> Dict[str, np.ndarray]:
    import torch

    obj = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(obj, dict) and "state_dict" in obj:
        obj = obj["state_dict"]
    out = {}
    for k, v in obj.items():
        if hasattr(v, "numpy"):
            out[k] = v.detach().cpu().numpy()
    return strip_prefix_if_present(out, "module.")


def _set(tree: Dict, path: List[str], value) -> None:
    node = tree
    for p in path[:-1]:
        node = node.setdefault(p, {})
    node[path[-1]] = value


def _conv_kernel(w: np.ndarray, groups_depthwise: bool) -> np.ndarray:
    # OIHW -> HWIO ; depthwise already has I==1 after the transpose
    return np.ascontiguousarray(np.transpose(w, (2, 3, 1, 0)))


def _convtranspose_kernel(w: np.ndarray) -> np.ndarray:
    # torch (I, O, kh, kw) -> flip spatial -> (kh, kw, I, O)
    return np.ascontiguousarray(np.transpose(w[:, :, ::-1, ::-1], (2, 3, 0, 1)))


def convert_state_dict(
    sd: Dict[str, np.ndarray],
    rules: List[Tuple[str, str]],
    freeze_bn: bool = False,
    transposed_conv_paths: Tuple[str, ...] = (),
    skip: Tuple[str, ...] = ("num_batches_tracked", "fc.", "_fc.", "classifier_head"),
) -> Dict[str, Any]:
    """Returns {"params": ..., "batch_stats"/"frozen": ...} nested dicts."""
    variables: Dict[str, Any] = {"params": {}}
    bn_collection = "frozen" if freeze_bn else "batch_stats"

    for key, value in sd.items():
        if any(s in key for s in skip):
            continue
        prefix, _, leaf = key.rpartition(".")
        is_norm = f"{prefix}.running_mean" in sd
        flax_prefix = prefix
        for pat, rep in rules:
            flax_prefix = re.sub(pat, rep, flax_prefix)
        path = [p for p in flax_prefix.split("/") if p]

        if is_norm:
            if freeze_bn:
                name = {"weight": "weight", "bias": "bias",
                        "running_mean": "mean", "running_var": "var"}[leaf]
                _set(variables.setdefault("frozen", {}), path + [name], value)
            else:
                if leaf == "weight":
                    _set(variables["params"], path + ["scale"], value)
                elif leaf == "bias":
                    _set(variables["params"], path + ["bias"], value)
                elif leaf == "running_mean":
                    _set(variables.setdefault("batch_stats", {}), path + ["mean"], value)
                elif leaf == "running_var":
                    _set(variables.setdefault("batch_stats", {}), path + ["var"], value)
        elif leaf == "weight" and value.ndim == 4:
            is_tc = any(re.search(p, prefix) for p in transposed_conv_paths)
            kernel = _convtranspose_kernel(value) if is_tc else _conv_kernel(value, False)
            _set(variables["params"], path + ["kernel"], kernel)
        elif leaf == "weight" and value.ndim == 2:
            _set(variables["params"], path + ["kernel"], value.T)
        elif leaf == "weight" and value.ndim == 1:
            # Stat-free affine norm (GroupNorm in the CGNL heads,
            # cgnonlocal.py:144/229): torch stores weight/bias with no
            # running_mean sibling, so the is_norm branch can't catch it.
            _set(variables["params"], path + ["scale"], value)
        elif leaf == "bias":
            _set(variables["params"], path + ["bias"], value)
        elif leaf in ("gamma",):
            _set(variables["params"], path + ["gamma"], value.reshape(-1))
        else:
            # scalar params like CrissCross gamma arrive as 1-elem tensors named
            # by their attribute; anything else unknown is an error.
            raise KeyError(f"Unmapped torch key {key!r} (leaf {leaf!r})")
    return variables


# ---------------------------------------------------------------------------
# Per-architecture rule tables (applied in order; '/' separates flax scopes)
# ---------------------------------------------------------------------------

# torchvision ResNet inside our ResNetFeatureExtractor (scope 'backbone')
RESNET_BACKBONE_RULES = [
    (r"^backbone\.", ""),                      # IntermediateLayerGetter prefix
    (r"^", "backbone/"),
    (r"layer(\d+)\.(\d+)\.", r"layer\1_\2/"),
    (r"downsample\.0$", "downsample_conv"),
    (r"downsample\.1$", "downsample_bn"),
    (r"\.", "/"),
]

# plain torchvision ResNet (no wrapper scope) — for generic use
RESNET_RULES = [
    (r"layer(\d+)\.(\d+)\.", r"layer\1_\2/"),
    (r"downsample\.0$", "downsample_conv"),
    (r"downsample\.1$", "downsample_bn"),
    (r"\.", "/"),
]

# HarDNet68 (hardnet_68.py 'base.<i>' sequential)
HARDNET_RULES = [
    (r"^base\.(\d+)\.layers\.(\d+)\.", r"base_\1/layers_\2/"),
    (r"^base\.(\d+)\.", r"base_\1/"),
    (r"\.", "/"),
]

# Res2Net50-v1b (deep stem conv1 Sequential 0/1/3/4/6; downsample 1=conv 2=bn)
RES2NET_RULES = [
    (r"^conv1\.0$", "stem_conv0"),
    (r"^conv1\.1$", "stem_bn0"),
    (r"^conv1\.3$", "stem_conv1"),
    (r"^conv1\.4$", "stem_bn1"),
    (r"^conv1\.6$", "stem_conv2"),
    (r"layer(\d+)\.(\d+)\.", r"layer\1_\2/"),
    (r"convs\.(\d+)$", r"convs_\1"),
    (r"bns\.(\d+)$", r"bns_\1"),
    (r"downsample\.1$", "downsample_conv"),
    (r"downsample\.2$", "downsample_bn"),
    (r"\.", "/"),
]

# PraNet on top of Res2Net ('resnet.' prefix) + RFB/agg/ra heads
PRANET_RULES = [
    (r"^resnet\.", "resnet&"),   # protect; expand resnet rules below
    (r"branch(\d)\.(\d)\.", r"branch\1_\2/"),
    (r"\.", "/"),
    (r"&conv1/0$", "&stem_conv0"),
    (r"&conv1/1$", "&stem_bn0"),
    (r"&conv1/3$", "&stem_conv1"),
    (r"&conv1/4$", "&stem_bn1"),
    (r"&conv1/6$", "&stem_conv2"),
    (r"layer(\d+)/(\d+)/", r"layer\1_\2/"),
    (r"convs/(\d+)$", r"convs_\1"),
    (r"bns/(\d+)$", r"bns_\1"),
    (r"downsample/1$", "downsample_conv"),
    (r"downsample/2$", "downsample_bn"),
    (r"&", "/"),
]

# GCPA decoder (gcpa_cc2.py attribute names)
GCPA_DECODER_RULES = [
    (r"^conva\.0$", "conva_conv"),
    (r"^conva\.1$", "conva_bn"),
    (r"dconv(\d)\.0$", r"dconv\1_conv"),
    (r"dconv(\d)\.1$", r"dconv\1_bn"),
    (r"^fam(\d+)\.conv0$", r"fam\1/b0/conv"),
    (r"^fam(\d+)\.bn0$", r"fam\1/b0/bn"),
    (r"^fam(\d+)\.conv1$", r"fam\1/b1/conv"),
    (r"^fam(\d+)\.bn1$", r"fam\1/b1/bn"),
    (r"^fam(\d+)\.conv2$", r"fam\1/b2/conv"),
    (r"^fam(\d+)\.bn2$", r"fam\1/b2/bn"),
    (r"\.", "/"),
]

# GCPA encoder wraps hardnet
GCPA_ENCODER_RULES = [
    (r"^hardnet\.", "hardnet&"),
    (r"base\.(\d+)\.layers\.(\d+)\.", r"base_\1/layers_\2/"),
    (r"base\.(\d+)\.", r"base_\1/"),
    (r"\.", "/"),
    (r"&", "/"),
]

# CRANet (PraNet on plain torchvision-style ResNet, PraNet_ResNet.py:102-237):
# same head rules as PraNet, backbone uses standard layerX.Y names
CRANET_RULES = [
    (r"^resnet\.", "resnet&"),
    (r"branch(\d)\.(\d)\.", r"branch\1_\2/"),
    (r"\.", "/"),
    (r"layer(\d+)/(\d+)/", r"layer\1_\2/"),
    (r"downsample/0$", "downsample_conv"),
    (r"downsample/1$", "downsample_bn"),
    (r"&", "/"),
]

# efficientnet-pytorch (block-inner attrs carry their own leading underscore:
# `_blocks.0._depthwise_conv` -> `blocks_0/depthwise_conv`)
EFFICIENTNET_RULES = [
    (r"^_blocks\.(\d+)\._", r"blocks_\1/"),
    (r"^_", ""),
    (r"\._", "/"),
    (r"\.", "/"),
]

# ASPP classifier (classifier.py conv2d_list ModuleList)
ASPP_CLASSIFIER_RULES = [
    (r"^conv2d_list\.(\d+)$", r"conv2d_\1"),
    (r"\.", "/"),
]

# attn Encoder wraps efficientnet as `self.encoder` (eff.py:16)
ATTN_ENCODER_RULES = [
    (r"^encoder\.", ""),
    (r"^_blocks\.(\d+)\._", r"blocks_\1/"),
    (r"^_", ""),
    (r"\._", "/"),
    (r"\.", "/"),
]

# attn Decoder (eff.py:22-148): Sequential decode blocks 0/1/3/4 -> conv0/bn0/
# conv1/bn1; out blocks index 0; ConvTranspose upsamplers are flat attrs
ATTN_DECODER_RULES = [
    (r"^decode_(\d)\.0$", r"decode_\1/conv0"),
    (r"^decode_(\d)\.1$", r"decode_\1/bn0"),
    (r"^decode_(\d)\.3$", r"decode_\1/conv1"),
    (r"^decode_(\d)\.4$", r"decode_\1/bn1"),
    (r"^out_(\d)\.0$", r"out_\1"),
    (r"\.", "/"),
]
ATTN_DECODER_TRANSPOSED = (r"mid_upsampler", r"ups_\d")

# PixelDiscriminator (discriminator.py:31-50): D Sequential 0/2 convs
DISCRIMINATOR_RULES = [
    (r"^D\.0$", "d0"),
    (r"^D\.2$", "d1"),
    (r"\.", "/"),
]

def nl_hub_rules(n_blocks_layer3: int, non_local: bool) -> List[Tuple[str, str]]:
    """Classification hubs (nonlocal.py:251-295, cgnonlocal.py:390-505).

    Both insert their context block before the LAST residual unit of layer3,
    shifting that unit's Sequential index by one; our scopes name the context
    block ``layer3_nl`` and keep residual units densely numbered.
    """
    rules: List[Tuple[str, str]] = []
    if non_local:
        i = n_blocks_layer3 - 1
        rules += [
            (rf"^layer3\.{i}\.W_z\.0$", "layer3_nl/W_z_conv"),
            (rf"^layer3\.{i}\.W_z\.1$", "layer3_nl/W_z_bn"),
            (rf"^layer3\.{i}\.", "layer3_nl/"),
            (rf"^layer3\.{n_blocks_layer3}\.", f"layer3_{i}/"),
        ]
    rules += [
        (r"layer(\d+)\.(\d+)\.", r"layer\1_\2/"),
        (r"shortcut\.0$", "downsample_conv"),
        (r"shortcut\.1$", "downsample_bn"),
        (r"downsample\.0$", "downsample_conv"),
        (r"downsample\.1$", "downsample_bn"),
        (r"\.", "/"),
    ]
    return rules


# VGG16 FCN feature extractor: torchvision 'features.<i>' conv indices ->
# sequential conv0..12 + fc6/fc7 (feature_extractor.py keeps indices
# 0..22,24..29 then appends fc6/fc7)
_VGG16_CONV_IDX = [0, 2, 5, 7, 10, 12, 14, 17, 19, 21, 24, 26, 28]
VGG16_RULES = [(rf"^features\.{idx}$", f"conv{i}")
               for i, idx in enumerate(_VGG16_CONV_IDX)] + [(r"\.", "/")]
