"""Load reference (read-only, /root/reference) torch modules as parity ORACLES.

We import single files with importlib, stubbing the unavailable native deps
(mmcv, inplace_abn, torchvision.models.utils) whose functionality is only
pretrained-weight loading.  Nothing from the reference is copied into the
framework — these oracles live in tests only and drive activation-parity
assertions against our Flax implementations.
"""

import importlib.util
import sys
import types

import numpy as np
import torch

REF = "/root/reference"


def _stub_modules():
    if "mmcv" not in sys.modules:
        mmcv = types.ModuleType("mmcv")
        runner = types.ModuleType("mmcv.runner")
        runner.load_checkpoint = lambda *a, **k: None
        mmcv.runner = runner
        sys.modules["mmcv"] = mmcv
        sys.modules["mmcv.runner"] = runner
    if "torchvision" not in sys.modules:
        tv = types.ModuleType("torchvision")
        models = types.ModuleType("torchvision.models")
        utils = types.ModuleType("torchvision.models.utils")
        utils.load_state_dict_from_url = lambda *a, **k: {}
        _utils = types.ModuleType("torchvision.models._utils")
        _utils.IntermediateLayerGetter = dict
        models.utils = utils
        models._utils = _utils
        models.ResNet = object
        tv.models = models
        sys.modules["torchvision"] = tv
        sys.modules["torchvision.models"] = models
        sys.modules["torchvision.models.utils"] = utils
        sys.modules["torchvision.models._utils"] = _utils
    if "inplace_abn" not in sys.modules:
        iabn = types.ModuleType("inplace_abn")

        class InPlaceABNSync(torch.nn.BatchNorm2d):
            def __init__(self, num_features, activation="none", **kw):
                super().__init__(num_features)

        iabn.InPlaceABN = InPlaceABNSync
        iabn.InPlaceABNSync = InPlaceABNSync
        sys.modules["inplace_abn"] = iabn


def load_ref_module(relpath: str, name: str, package: str = None):
    """Load a single reference file; `package` enables its relative imports."""
    _stub_modules()
    spec = importlib.util.spec_from_file_location(
        name if package is None else f"{package}.{name.rsplit('.', 1)[-1]}",
        f"{REF}/{relpath}")
    mod = importlib.util.module_from_spec(spec)
    sys.modules[spec.name] = mod
    spec.loader.exec_module(mod)
    return mod


def load_pranet():
    """PraNet_Res2Net with its relative Res2Net import shimmed and the
    pretrained load disabled."""
    _stub_modules()
    pkg = types.ModuleType("refpranet")
    pkg.__path__ = [f"{REF}/core/models/classifiers/pranet"]
    sys.modules["refpranet"] = pkg
    res2net = load_ref_module(
        "core/models/classifiers/pranet/Res2Net_v1b.py", "refpranet.Res2Net_v1b")
    res2net_fn = res2net.res2net50_v1b_26w_4s
    res2net.res2net50_v1b_26w_4s = lambda pretrained=False, **kw: res2net_fn(False, **kw)
    pranet = load_ref_module(
        "core/models/classifiers/pranet/PraNet_Res2Net.py", "refpranet.PraNet_Res2Net")
    return pranet


def to_nhwc(t: torch.Tensor) -> np.ndarray:
    return np.transpose(t.detach().numpy(), (0, 2, 3, 1))


def to_nchw(x: np.ndarray) -> torch.Tensor:
    return torch.from_numpy(np.transpose(x, (0, 3, 1, 2)))


def torch_state_dict_np(model) -> dict:
    return {k: v.detach().cpu().numpy() for k, v in model.state_dict().items()}
