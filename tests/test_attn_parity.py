"""Attn-UNet parity vs the reference modules.

The reference encoder needs efficientnet-pytorch (not installed): the Decoder
and gates are self-contained, so we stub the efficientnet import, feed
identical random endpoints to both decoders through the checkpoint importer,
and compare all 5 scale outputs.  The EfficientNet ENCODER is verified against
an independent torch re-implementation of the published architecture
(tests/torch_effnet.py) driven through the production EFFICIENTNET_RULES
importer — the same path real pretrained weights would take.
"""

import sys
import types

import numpy as np
import pytest

import jax.numpy as jnp
import torch

from rnd_semantic_segmentation_tpu.ckpt.torch_import import (
    ATTN_DECODER_RULES,
    ATTN_DECODER_TRANSPOSED,
    convert_state_dict,
)
from rnd_semantic_segmentation_tpu.models.attn_unet import AdditiveAttnGate, AttnDecoder

from torch_ref import load_ref_module, to_nchw


@pytest.fixture(scope="module")
def ref_eff():
    from torch_ref import _stub_modules
    _stub_modules()
    if "efficientnet_pytorch" not in sys.modules:
        enp = types.ModuleType("efficientnet_pytorch")

        class EfficientNet:
            @classmethod
            def from_pretrained(cls, name):
                raise RuntimeError("stub")

        utils = types.ModuleType("efficientnet_pytorch.utils")
        utils.efficientnet_params = lambda name: None
        enp.EfficientNet = EfficientNet
        enp.utils = utils
        sys.modules["efficientnet_pytorch"] = enp
        sys.modules["efficientnet_pytorch.utils"] = utils
    if "torchvision.models" in sys.modules and not hasattr(
            sys.modules["torchvision.models"], "ResNet"):
        sys.modules["torchvision.models"].ResNet = object
    # attn.py first (eff.py imports it package-relatively via core...)
    sys.path.insert(0, "/root/reference")
    from core.models.classifiers.attn import attn as ref_attn
    from core.models.classifiers.attn import eff as ref_eff_mod
    return ref_attn, ref_eff_mod


def test_additive_attn_gate_parity(rng, ref_eff):
    ref_attn, _ = ref_eff
    tgate = ref_attn.AdditiveAttnGate(64, 32)
    tgate.eval()
    x = rng.rand(2, 8, 8, 64).astype(np.float32)
    g = rng.rand(2, 16, 16, 32).astype(np.float32)
    with torch.no_grad():
        ref = tgate(to_nchw(x), to_nchw(g)).numpy().transpose(0, 2, 3, 1)

    sd = {k: v.detach().numpy() for k, v in tgate.state_dict().items()}
    variables = convert_state_dict(sd, [(r"\.", "/")])
    ours = AdditiveAttnGate(64, 32).apply(variables, jnp.asarray(x), jnp.asarray(g))
    np.testing.assert_allclose(np.asarray(ours), ref, rtol=1e-4, atol=1e-4)


def test_attn_decoder_parity(rng, ref_eff):
    _, eff_mod = ref_eff
    tdec = eff_mod.Decoder(backbone_name="efficientnet-b0", num_classes=2)
    tdec.eval()

    # endpoints for a 64x64 input on b0
    shapes = {"reduction_1": (1, 32, 32, 16), "reduction_2": (1, 16, 16, 24),
              "reduction_3": (1, 8, 8, 40), "reduction_4": (1, 4, 4, 112),
              "reduction_5": (1, 2, 2, 1280)}
    eps = {k: rng.rand(*s).astype(np.float32) for k, s in shapes.items()}
    teps = {k: to_nchw(v) for k, v in eps.items()}
    with torch.no_grad():
        ref_outs = tdec(teps)

    sd = {k: v.detach().numpy() for k, v in tdec.state_dict().items()}
    variables = convert_state_dict(
        sd, ATTN_DECODER_RULES,
        transposed_conv_paths=ATTN_DECODER_TRANSPOSED,
        skip=("num_batches_tracked", "decode_0"))
    ours = AttnDecoder(backbone_name="efficientnet-b0", num_classes=2).apply(
        variables, {k: jnp.asarray(v) for k, v in eps.items()})
    assert len(ours) == len(ref_outs) == 5
    for o, r in zip(ours, ref_outs):
        rnp = r.numpy().transpose(0, 2, 3, 1)
        assert o.shape == rnp.shape
        np.testing.assert_allclose(np.asarray(o), rnp, rtol=1e-3, atol=1e-3)


@pytest.mark.parametrize("name", ["efficientnet-b0", "efficientnet-b2"])
def test_efficientnet_encoder_parity(rng, name):
    """All 5 reduction_* endpoints match an independent torch EfficientNet
    (eff.py:16-20 `EfficientNet.from_pretrained` + `extract_endpoints`)."""
    from torch_effnet import TorchEfficientNet, randomize_
    from rnd_semantic_segmentation_tpu.ckpt.torch_import import EFFICIENTNET_RULES
    from rnd_semantic_segmentation_tpu.models.efficientnet import EfficientNetEncoder

    tnet = randomize_(TorchEfficientNet(name), seed=3)
    x = rng.rand(2, 64, 96, 3).astype(np.float32)
    with torch.no_grad():
        ref = tnet.extract_endpoints(to_nchw(x))

    sd = {k: v.detach().numpy() for k, v in tnet.state_dict().items()}
    variables = convert_state_dict(sd, EFFICIENTNET_RULES)
    ours = EfficientNetEncoder(backbone_name=name).apply(
        variables, jnp.asarray(x), train=False)

    assert set(ours) == set(ref) == {f"reduction_{i}" for i in range(1, 6)}
    for k in sorted(ref):
        r = ref[k].numpy().transpose(0, 2, 3, 1)
        o = np.asarray(ours[k])
        assert o.shape == r.shape, (k, o.shape, r.shape)
        np.testing.assert_allclose(o, r, rtol=1e-3, atol=1e-3, err_msg=k)
