"""CRANet (PraNet on plain ResNet50) parity vs PraNet_ResNet.py:102-237."""

import sys
import types

import numpy as np
import pytest

import jax.numpy as jnp
import torch

from rnd_semantic_segmentation_tpu.ckpt.torch_import import CRANET_RULES, convert_state_dict
from rnd_semantic_segmentation_tpu.models import PraNet

from torch_ref import _stub_modules, load_ref_module


def test_cranet_parity(rng):
    _stub_modules()
    pkg = types.ModuleType("refcranet")
    pkg.__path__ = ["/root/reference/core/models/classifiers/pranet"]
    sys.modules["refcranet"] = pkg
    load_ref_module("core/models/classifiers/pranet/ResNet.py", "refcranet.ResNet")
    mod = load_ref_module("core/models/classifiers/pranet/PraNet_ResNet.py",
                          "refcranet.PraNet_ResNet")
    mod.CRANet.initialize_weights = lambda self: None  # skips pretrained load
    tmodel = mod.CRANet()
    tmodel.eval()

    x = rng.rand(1, 64, 64, 3).astype(np.float32)
    with torch.no_grad():
        ref_outs = tmodel(torch.from_numpy(x.transpose(0, 3, 1, 2)))

    sd = {k: v.detach().numpy() for k, v in tmodel.state_dict().items()}
    variables = convert_state_dict(sd, CRANET_RULES)
    ours = PraNet(backbone="resnet50").apply(variables, jnp.asarray(x),
                                             train=False)
    assert len(ours) == len(ref_outs) == 4
    for o, r in zip(ours, ref_outs):
        rnp = r.numpy().transpose(0, 2, 3, 1)
        assert o.shape == rnp.shape
        diff = np.abs(np.asarray(o) - rnp).max()
        assert diff < 5e-3, diff
