"""North-star logit parity: reference .pth checkpoint -> our test.py pipeline.

Builds the reference's DeepLabV2 eval graph in torch (dilated ResNet50
backbone under an IntermediateLayerGetter-style 'backbone.' prefix + ASPP
classifier), saves a reference-format checkpoint dict
({'feature_extractor', 'classifier'}, aspp_tester.py:25-31), loads it through
Tester._load_torch_checkpoint, and requires probabilities within 1e-3
(BASELINE.md parity budget).
"""

import sys
import types

import numpy as np
import pytest

import jax.numpy as jnp
import torch
import torch.nn.functional as TF

from rnd_semantic_segmentation_tpu.configs import get_default_cfg
from rnd_semantic_segmentation_tpu.eval.tester import Tester
from rnd_semantic_segmentation_tpu.utils import setup_logger

from torch_ref import load_ref_module, to_nchw


def _stub_intermediate_layer_getter():
    """classifier.py imports torchvision.models._utils; stub it."""
    if "torchvision.models._utils" not in sys.modules:
        mod = types.ModuleType("torchvision.models._utils")

        class IntermediateLayerGetter(dict):  # unused by the classifier
            pass

        mod.IntermediateLayerGetter = IntermediateLayerGetter
        sys.modules["torchvision.models._utils"] = mod


class _OneBatchLoader:
    def __init__(self, batch):
        self.batch = batch

    def __iter__(self):
        yield self.batch

    def __len__(self):
        return 1


def test_deeplab_checkpoint_logit_parity(tmp_path, rng):
    _stub_intermediate_layer_getter()
    resnet_mod = load_ref_module("core/components/resnet.py", "ref_resnet_lp")
    cls_mod = load_ref_module("core/models/classifiers/aspp/classifier.py",
                              "ref_aspp_cls")

    tbackbone = resnet_mod.ResNet(resnet_mod.Bottleneck, [3, 4, 6, 3],
                                  replace_stride_with_dilation=[False, True, True])
    tcls = cls_mod.ASPP_Classifier_V2(2048, [6, 12, 18, 24], [6, 12, 18, 24], 5)
    tbackbone.eval()
    tcls.eval()

    x = rng.rand(1, 64, 64, 3).astype(np.float32)
    with torch.no_grad():
        t = to_nchw(x)
        t = tbackbone.maxpool(tbackbone.relu(tbackbone.bn1(tbackbone.conv1(t))))
        fea = tbackbone.layer4(tbackbone.layer3(tbackbone.layer2(tbackbone.layer1(t))))
        logits = tcls(fea)  # no size: raw head output (utility.py:185 resizes)
        out = TF.interpolate(logits, size=(64, 64), mode="bilinear", align_corners=True)
        ref_probs = torch.softmax(out, dim=1).numpy().transpose(0, 2, 3, 1)

    # reference checkpoint layout: 'backbone.'-prefixed feature extractor
    ckpt = {
        "feature_extractor": {f"backbone.{k}": v for k, v in
                              tbackbone.state_dict().items()},
        "classifier": tcls.state_dict(),
    }
    path = str(tmp_path / "Aspp-ref.pth")
    torch.save(ckpt, path)

    cfg = get_default_cfg()
    cfg.MODEL.NAME = "deeplab_resnet50"
    cfg.MODEL.NUM_CLASSES = 5
    cfg.MODEL.FREEZE_BN = False
    cfg.OUTPUT_DIR = str(tmp_path)
    cfg.resume = path
    logger = setup_logger("parity_test", str(tmp_path), 0)
    batch = {"image": x, "label": np.zeros((1, 64, 64), np.int32), "name": ["p"]}
    tester = Tester(cfg, _OneBatchLoader(batch), logger)
    tester._load_checkpoint()
    probs = np.asarray(tester._probs(tester.variables, jnp.asarray(x), (64, 64)))

    diff = np.abs(probs - ref_probs).max()
    assert diff < 1e-3, f"logit-parity budget exceeded: {diff}"
