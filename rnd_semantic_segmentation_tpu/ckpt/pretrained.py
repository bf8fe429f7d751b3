"""Pretrained-backbone loading into freshly-initialized variables.

Covers the reference's four pretrained sources (SURVEY §5 checkpoint notes):
resnet101 torchvision .pth (deeplab), hardnet68.pth (gald),
res2net50_v1b .pth (pranet), efficientnet-pytorch .pth (attn).  MODEL.WEIGHTS
points at a local .pth; URLs are not fetched (zero-egress environment) — a
clear error asks for a local file instead.
"""

from __future__ import annotations

import os
from typing import Any, Dict

import numpy as np

from .torch_import import (
    EFFICIENTNET_RULES,
    HARDNET_RULES,
    RES2NET_RULES,
    RESNET_RULES,
    VGG16_RULES,
    convert_state_dict,
    load_torch_state_dict,
)


def _overlay(dst: Dict[str, Any], src: Dict[str, Any], path: str = "") -> None:
    """Recursively overwrite dst leaves with src leaves, checking shapes."""
    for k, v in src.items():
        if isinstance(v, dict):
            if k not in dst:
                raise KeyError(f"pretrained subtree {path}/{k} missing in model")
            _overlay(dst[k], v, f"{path}/{k}")
        else:
            if k not in dst:
                raise KeyError(f"pretrained leaf {path}/{k} missing in model")
            have = np.shape(dst[k])
            want = np.shape(v)
            if tuple(have) != tuple(want):
                raise ValueError(f"shape mismatch at {path}/{k}: model {have} vs ckpt {want}")
            dst[k] = np.asarray(v, dtype=np.asarray(dst[k]).dtype)


def _nest(tree: Dict[str, Any], scope: str) -> Dict[str, Any]:
    return {coll: {scope: sub} for coll, sub in tree.items()}


def load_pretrained_backbone(spec, cfg, variables: Dict[str, Any]) -> Dict[str, Any]:
    """Returns updated {module: variables} with backbone weights overlaid."""
    weights = cfg.MODEL.WEIGHTS
    if not weights:
        return variables
    if weights.startswith("http"):
        raise FileNotFoundError(
            f"MODEL.WEIGHTS is a URL ({weights}); this environment has no "
            "network egress — download the .pth and point MODEL.WEIGHTS at it.")
    if not os.path.exists(weights):
        raise FileNotFoundError(weights)

    sd = load_torch_state_dict(weights)
    freeze = cfg.MODEL.FREEZE_BN
    fam = spec.family
    skip = ("num_batches_tracked", "fc.", "_fc.")
    if fam == "deeplab":
        if spec.backbone.startswith("resnet"):
            conv = convert_state_dict(sd, RESNET_RULES, freeze_bn=freeze, skip=skip)
        else:
            conv = convert_state_dict(sd, VGG16_RULES, freeze_bn=freeze,
                                      skip=skip + ("classifier.",))
        tgt = dict(variables)
        fe = _deepcopy_tree(variables["feature_extractor"])
        _overlay(fe, _nest(conv, "backbone") if spec.backbone.startswith("resnet") else conv)
        tgt["feature_extractor"] = fe
        return tgt
    if fam == "gald":
        conv = convert_state_dict(sd, HARDNET_RULES, skip=skip + ("base.19",))
        tgt = dict(variables)
        enc = _deepcopy_tree(variables["encoder"])
        _overlay(enc, _nest(conv, "hardnet"))
        tgt["encoder"] = enc
        return tgt
    if fam == "pranet":
        conv = convert_state_dict(sd, RES2NET_RULES, skip=skip)
        tgt = dict(variables)
        mod = _deepcopy_tree(variables["model"])
        _overlay(mod, _nest(conv, "resnet"))
        tgt["model"] = mod
        return tgt
    if fam in ("attn", "attnwrap"):
        conv = convert_state_dict(sd, EFFICIENTNET_RULES, skip=skip)
        tgt = dict(variables)
        if fam == "attn":
            enc = _deepcopy_tree(variables["encoder"])
            _overlay(enc, conv)
            tgt["encoder"] = enc
        else:
            mod = _deepcopy_tree(variables["model"])
            _overlay(mod, _nest(conv, "encoder"))
            tgt["model"] = mod
        return tgt
    raise NotImplementedError(fam)


def _deepcopy_tree(tree):
    if isinstance(tree, dict) or type(tree).__name__ == "FrozenDict":
        return {k: _deepcopy_tree(v) for k, v in tree.items()}
    return tree
