"""GCPA-CC ("GALD") full-pipeline parity vs the reference torch modules.

Loads the reference's GCPADecoder + HarDNet with dependency stubs, patches the
CUDA-only INF helper (ccnet.py:29-34) for CPU, pushes random weights through a
reference-format checkpoint ({'encoder','decoder'}, gald_trainer.py:26-35) into
our Tester, and compares eval probabilities.
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

from torch_ref import _stub_modules, to_nchw


@pytest.fixture(scope="module")
def ref_gcpa():
    _stub_modules()
    if "torchvision.models._utils" not in sys.modules:
        mod = types.ModuleType("torchvision.models._utils")
        mod.IntermediateLayerGetter = dict
        sys.modules["torchvision.models._utils"] = mod
    sys.path.insert(0, "/root/reference")
    from core.models.classifiers.gcpacc.contextagg import ccnet
    ccnet.INF = lambda B, H, W: (
        -torch.diag(torch.tensor(float("inf")).repeat(H), 0)
        .unsqueeze(0).repeat(B * W, 1, 1))
    from core.models.classifiers.gcpacc import gcpa_cc2
    from core.models.classifiers.gcpacc.encoders import hardnet_68
    return gcpa_cc2, hardnet_68


class _OneBatchLoader:
    def __init__(self, batch):
        self.batch = batch

    def __iter__(self):
        yield self.batch

    def __len__(self):
        return 1


def test_gald_checkpoint_parity(tmp_path, rng, ref_gcpa):
    gcpa_cc2, hardnet_68 = ref_gcpa
    thardnet = hardnet_68.HarDNet(arch=68)
    tdecoder = gcpa_cc2.GCPADecoder(num_classes=4)
    thardnet.eval()
    tdecoder.eval()
    # make the shared criss-cross pass matter: gamma=0 at init means the CC
    # output equals its input; give it a nonzero value
    with torch.no_grad():
        tdecoder.long_relation.gamma.fill_(0.5)

    x = rng.rand(1, 224, 224, 3).astype(np.float32)
    with torch.no_grad():
        taps = thardnet(to_nchw(x))
        res5, res4, res3, res2 = tdecoder(to_nchw(x), taps)
        out = TF.interpolate(res2, size=(224, 224), mode="bilinear",
                             align_corners=False)
        ref_probs = torch.softmax(out, dim=1).numpy().transpose(0, 2, 3, 1)

    ckpt = {"encoder": {f"hardnet.{k}": v for k, v in thardnet.state_dict().items()},
            "decoder": tdecoder.state_dict()}
    path = str(tmp_path / "Gald-ref.pth")
    torch.save(ckpt, path)

    cfg = get_default_cfg()
    cfg.MODEL.NAME = "gald_hardnet68"
    cfg.MODEL.NUM_CLASSES = 4
    cfg.OUTPUT_DIR = str(tmp_path)
    cfg.resume = path
    logger = setup_logger("gald_parity", str(tmp_path), 0)
    batch = {"image": x, "label": np.zeros((1, 224, 224), np.int32), "name": ["g"]}
    tester = Tester(cfg, _OneBatchLoader(batch), logger)
    tester._load_checkpoint()
    probs = np.asarray(tester._probs(tester.variables, jnp.asarray(x), (224, 224)))

    diff = np.abs(probs - ref_probs).max()
    assert diff < 2e-3, f"gald parity budget exceeded: {diff}"
