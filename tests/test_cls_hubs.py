"""Classification hubs: NL-ResNet (nonlocal.py:251-323) and CGNL-ResNet
(cgnonlocal.py:390-552) — shape tests for every variant plus full-network
torch parity through the weight importer for the two NL insertions."""

import sys
import types

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import torch

from rnd_semantic_segmentation_tpu.ckpt.torch_import import convert_state_dict, nl_hub_rules
from rnd_semantic_segmentation_tpu.models.cls_hubs import CGNLResNet, NLResNet

from torch_ref import load_ref_module, to_nchw


def _randomize(model, seed=0):
    g = torch.Generator().manual_seed(seed)
    with torch.no_grad():
        for p in model.parameters():
            p.copy_(torch.randn(p.shape, generator=g) * 0.05)
        for m in model.modules():
            if isinstance(m, torch.nn.BatchNorm2d):
                m.running_mean.copy_(torch.randn(m.running_mean.shape, generator=g) * 0.1)
                m.running_var.copy_(torch.rand(m.running_var.shape, generator=g) + 0.5)
    model.eval()
    return model


@pytest.mark.parametrize("arch,non_local", [("resnet18", False), ("resnet18", True),
                                            ("resnet50", True)])
def test_nlresnet_shapes(rng, arch, non_local):
    m = NLResNet(arch=arch, num_classes=10, non_local=non_local)
    x = jnp.asarray(rng.rand(2, 32, 32, 3).astype(np.float32))
    v = m.init(jax.random.PRNGKey(0), x)
    out = m.apply(v, x)
    assert out.shape == (2, 10)
    assert np.isfinite(np.asarray(out)).all()


@pytest.mark.parametrize("nl_type", [None, "nl", "cgnl", "cgnlx"])
def test_cgnlresnet_shapes(rng, nl_type):
    m = CGNLResNet(arch="resnet50", num_classes=5, nl_type=nl_type,
                   nl_nums=1 if nl_type else 0, pool_size=2)
    x = jnp.asarray(rng.rand(1, 64, 64, 3).astype(np.float32))
    v = m.init(jax.random.PRNGKey(0), x)
    out = m.apply(v, x)
    assert out.shape == (1, 5)
    assert np.isfinite(np.asarray(out)).all()


def test_nlresnet18_torch_parity(rng):
    ref_mod = load_ref_module(
        "core/models/classifiers/gcpacc/contextagg/nonlocal.py", "ref_nonlocal")
    tnet = _randomize(ref_mod.ResNet(ref_mod.BasicBlock, [2, 2, 2, 2],
                                     num_classes=10, non_local=True), seed=1)
    x = rng.rand(2, 32, 32, 3).astype(np.float32)
    with torch.no_grad():
        ref = tnet(to_nchw(x)).numpy()

    sd = {k: v.detach().numpy() for k, v in tnet.state_dict().items()}
    variables = convert_state_dict(sd, nl_hub_rules(2, True),
                                   skip=("num_batches_tracked",))
    ours = NLResNet(arch="resnet18", num_classes=10, non_local=True).apply(
        variables, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(ours), ref, rtol=1e-3, atol=1e-3)


def _load_cgnonlocal(monkeypatch):
    if "termcolor" not in sys.modules:
        tc = types.ModuleType("termcolor")
        tc.cprint = lambda *a, **k: None
        sys.modules["termcolor"] = tc
    # SpatialCGNLx.kernel calls alpha.cuda() unconditionally (cgnonlocal.py:287)
    monkeypatch.setattr(torch.Tensor, "cuda", lambda self, *a, **k: self)
    return load_ref_module(
        "core/models/classifiers/gcpacc/contextagg/cgnonlocal.py", "ref_cgnonlocal")


@pytest.mark.parametrize("nl_type", ["nl", "cgnl", "cgnlx"])
def test_cgnlresnet50_torch_parity(rng, monkeypatch, nl_type):
    ref_mod = _load_cgnonlocal(monkeypatch)
    tnet = _randomize(ref_mod.ResNet(ref_mod.Bottleneck, [3, 4, 6, 3],
                                     num_classes=5, nl_type=nl_type, nl_nums=1,
                                     pool_size=2), seed=2)
    x = rng.rand(1, 64, 64, 3).astype(np.float32)
    with torch.no_grad():
        # .contiguous(): the CGNL kernels' split+view chain (cgnonlocal.py:166)
        # requires NCHW-contiguous input; to_nchw's permute propagates
        # channels-last strides through every conv.
        ref = tnet(to_nchw(x).contiguous()).numpy()

    sd = {k: v.detach().numpy() for k, v in tnet.state_dict().items()}
    variables = convert_state_dict(sd, nl_hub_rules(6, True),
                                   skip=("num_batches_tracked",))
    ours = CGNLResNet(arch="resnet50", num_classes=5, nl_type=nl_type, nl_nums=1,
                      pool_size=2).apply(variables, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(ours), ref, rtol=1e-3, atol=1e-3)


@pytest.mark.parametrize("use_scale", [False, True])
def test_spatial_cgnl_block_parity(rng, monkeypatch, use_scale):
    """Grouped dot-product kernel vs the torch bmm chain (cgnonlocal.py:127-194)."""
    from rnd_semantic_segmentation_tpu.models.gcpa import SpatialCGNL

    ref_mod = _load_cgnonlocal(monkeypatch)
    tblk = _randomize(ref_mod.SpatialCGNL(32, 16, use_scale=use_scale, groups=8),
                      seed=3)
    x = rng.rand(2, 6, 6, 32).astype(np.float32)
    with torch.no_grad():
        ref = tblk(to_nchw(x).contiguous()).permute(0, 2, 3, 1).numpy()

    sd = {k: v.detach().numpy() for k, v in tblk.state_dict().items()}
    variables = convert_state_dict(sd, [(r"\.", "/")], skip=("num_batches_tracked",))
    ours = SpatialCGNL(planes=16, groups=8, use_scale=use_scale).apply(
        variables, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(ours), ref, rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("order,use_scale", [(2, False), (3, False), (3, True)])
def test_spatial_cgnlx_block_parity(rng, monkeypatch, order, use_scale):
    """Taylor-expanded RBF kernel: our per-order alpha*<p^n,g>*t^n sum vs the
    torch sqrt(alpha)-weighted bmm chain (cgnonlocal.py:247-306)."""
    from rnd_semantic_segmentation_tpu.models.zoo import SpatialCGNLx

    ref_mod = _load_cgnonlocal(monkeypatch)
    tblk = _randomize(ref_mod.SpatialCGNLx(32, 16, use_scale=use_scale, groups=8,
                                           order=order), seed=4)
    x = rng.rand(2, 6, 6, 32).astype(np.float32)
    with torch.no_grad():
        ref = tblk(to_nchw(x).contiguous()).permute(0, 2, 3, 1).numpy()

    sd = {k: v.detach().numpy() for k, v in tblk.state_dict().items()}
    variables = convert_state_dict(sd, [(r"\.", "/")], skip=("num_batches_tracked",))
    ours = SpatialCGNLx(planes=16, groups=8, order=order, use_scale=use_scale).apply(
        variables, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(ours), ref, rtol=1e-4, atol=1e-4)
