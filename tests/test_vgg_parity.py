"""VGG16-FCN feature extractor parity vs the reference construction.

Rebuilds the reference's surgery in torch (feature_extractor.py:8-32: drop
pool4/pool5, dilate conv5 (2,2), dilated fc6/fc7) on the reference's own VGG
(core/components/vgg.py, imported with dep stubs), then compares activations
through the weight importer.
"""

import numpy as np

import jax.numpy as jnp
import torch
import torch.nn as tnn

from rnd_semantic_segmentation_tpu.ckpt.torch_import import VGG16_RULES, convert_state_dict
from rnd_semantic_segmentation_tpu.models.aspp import VGG16FeatureExtractor

from torch_ref import load_ref_module, to_nchw


def _build_reference_fcn_backbone():
    vgg_mod = load_ref_module("core/components/vgg.py", "ref_vgg")
    backbone = vgg_mod.vgg16(pretrained=False, pretrained_weights=None)
    features = list(backbone.features.children())
    # keep 0..22 and 24..29 (drop pool4 idx 23, pool5 idx 30)
    features = [features[i] for i in list(range(23)) + list(range(24, 30))]
    for i in (23, 25, 27):  # conv5_1..3 dilated
        features[i].dilation = (2, 2)
        features[i].padding = (2, 2)
    fc6 = tnn.Conv2d(512, 1024, kernel_size=3, padding=4, dilation=4)
    fc7 = tnn.Conv2d(1024, 1024, kernel_size=3, padding=4, dilation=4)
    return tnn.Sequential(*(features + [fc6, tnn.ReLU(), fc7, tnn.ReLU()]))


def test_vgg16_fcn_parity(rng):
    ref = _build_reference_fcn_backbone()
    ref.eval()
    x = rng.rand(1, 64, 64, 3).astype(np.float32)
    with torch.no_grad():
        out_ref = ref(to_nchw(x)).numpy().transpose(0, 2, 3, 1)

    # translate the Sequential indices back into torchvision 'features.<i>'
    # key space + fc6/fc7 so the shared VGG16_RULES apply
    sd = {}
    torchvision_idx = list(range(23)) + list(range(24, 30))
    for i, layer in enumerate(ref[:29]):
        if isinstance(layer, tnn.Conv2d):
            sd[f"features.{torchvision_idx[i]}.weight"] = layer.weight.detach().numpy()
            sd[f"features.{torchvision_idx[i]}.bias"] = layer.bias.detach().numpy()
    sd["fc6.weight"] = ref[29].weight.detach().numpy()
    sd["fc6.bias"] = ref[29].bias.detach().numpy()
    sd["fc7.weight"] = ref[31].weight.detach().numpy()
    sd["fc7.bias"] = ref[31].bias.detach().numpy()

    variables = convert_state_dict(sd, VGG16_RULES)
    ours = VGG16FeatureExtractor().apply(variables, jnp.asarray(x))
    assert ours.shape == out_ref.shape
    diff = np.abs(np.asarray(ours) - out_ref).max()
    assert diff < 2e-3, diff
