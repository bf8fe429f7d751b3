"""FADA step loss parity vs the reference's adversarial math (aspp_fada.py).

Builds the reference torch graph (dilated ResNet backbone + ASPP classifier +
PixelDiscriminator), computes one iteration's four losses exactly as
aspp_fada.py:91-136 does (temperature 1.8, soft-label clip 0.9, lambda 0.001,
0.5/0.5 D loss), pushes the same weights through our importer, runs our jitted
FADA step, and compares the reported metrics.
"""

import sys
import types

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import torch
import torch.nn.functional as TF

from rnd_semantic_segmentation_tpu.ckpt.torch_import import (
    ASPP_CLASSIFIER_RULES,
    DISCRIMINATOR_RULES,
    RESNET_RULES,
    convert_state_dict,
)
from rnd_semantic_segmentation_tpu.configs import get_default_cfg
from rnd_semantic_segmentation_tpu.models import build_adversarial_discriminator, build_segmentor
from rnd_semantic_segmentation_tpu.train import Segmentor, make_optimizers
from rnd_semantic_segmentation_tpu.train.fada import FadaState, init_disc_state, make_fada_train_step
from rnd_semantic_segmentation_tpu.train.state import ModuleState

from torch_ref import _stub_modules, load_ref_module, to_nchw


def _soft_ce(pred, soft):
    # utility.py:172-177
    loss = -soft.float() * TF.log_softmax(pred, dim=1)
    return torch.mean(torch.sum(loss, dim=1))


def test_fada_losses_match_reference(tmp_path, rng):
    _stub_modules()
    if "torchvision.models._utils" not in sys.modules:
        m = types.ModuleType("torchvision.models._utils")
        m.IntermediateLayerGetter = dict
        sys.modules["torchvision.models._utils"] = m
    resnet_mod = load_ref_module("core/components/resnet.py", "ref_resnet_fada")
    cls_mod = load_ref_module("core/models/classifiers/aspp/classifier.py",
                              "ref_cls_fada")
    disc_mod = load_ref_module("core/models/discriminator.py", "ref_disc_fada")

    nc = 4
    tfe = resnet_mod.ResNet(resnet_mod.Bottleneck, [3, 4, 6, 3],
                            replace_stride_with_dilation=[False, True, True])
    tcls = cls_mod.ASPP_Classifier_V2(2048, [6, 12, 18, 24], [6, 12, 18, 24], nc)
    tdisc = disc_mod.PixelDiscriminator(2048, 256, num_classes=nc)
    for m in (tfe, tcls, tdisc):
        m.eval()  # FrozenBN equivalence; our cfg uses FREEZE_BN below

    def t_forward_fe(x):
        t = tfe.maxpool(tfe.relu(tfe.bn1(tfe.conv1(x))))
        return tfe.layer4(tfe.layer3(tfe.layer2(tfe.layer1(t))))

    src = rng.rand(2, 32, 32, 3).astype(np.float32)
    tgt = rng.rand(2, 32, 32, 3).astype(np.float32)
    src_label = rng.randint(0, nc, size=(2, 32, 32)).astype(np.int32)

    # ---- reference math (aspp_fada.py:91-136) ----
    T = 1.8
    with torch.no_grad():
        src_fea = t_forward_fe(to_nchw(src))
        src_pred = tcls(src_fea, (32, 32)) / T
        loss_seg = TF.cross_entropy(src_pred, torch.from_numpy(src_label).long(),
                                    ignore_index=255)
        src_soft = TF.softmax(src_pred, dim=1)
        src_soft = torch.clamp_max(src_soft, 0.9)

        tgt_fea = t_forward_fe(to_nchw(tgt))
        tgt_pred = tcls(tgt_fea, (32, 32)) / T
        tgt_soft = torch.clamp_max(TF.softmax(tgt_pred, dim=1), 0.9)

        tgt_D = tdisc(tgt_fea, (32, 32))
        loss_adv = 0.001 * _soft_ce(tgt_D, torch.cat(
            [tgt_soft, torch.zeros_like(tgt_soft)], dim=1))

        src_D = tdisc(src_fea, (32, 32))
        loss_D_src = 0.5 * _soft_ce(src_D, torch.cat(
            [src_soft, torch.zeros_like(src_soft)], dim=1))
        tgt_D2 = tdisc(tgt_fea, (32, 32))
        loss_D_tgt = 0.5 * _soft_ce(tgt_D2, torch.cat(
            [torch.zeros_like(tgt_soft), tgt_soft], dim=1))

    # ---- our side: same weights through the importer ----
    cfg = get_default_cfg()
    cfg.MODEL.NAME = "deeplab_resnet50"
    cfg.MODEL.DTYPE = "float32"
    cfg.MODEL.NUM_CLASSES = nc
    cfg.MODEL.FREEZE_BN = True
    cfg.SOLVER.BASE_LR = 1e-4
    cfg.SOLVER.BASE_LR_D = 1e-4
    spec = build_segmentor(cfg)
    seg = Segmentor(spec, nc)

    fe_sd = {k: v.detach().numpy() for k, v in tfe.state_dict().items()}
    fe_vars = convert_state_dict(fe_sd, [(r"^", "backbone/")] + RESNET_RULES,
                                 freeze_bn=True)
    cls_sd = {k: v.detach().numpy() for k, v in tcls.state_dict().items()}
    cls_vars = convert_state_dict(cls_sd, ASPP_CLASSIFIER_RULES)
    variables = {"feature_extractor": fe_vars, "classifier": cls_vars}
    seg_state = seg.make_states(variables, make_optimizers(spec, cfg))

    disc = build_adversarial_discriminator(cfg)
    d_sd = {k: v.detach().numpy() for k, v in tdisc.state_dict().items()}
    d_vars = convert_state_dict(d_sd, DISCRIMINATOR_RULES)
    disc_state = init_disc_state(disc, jax.random.PRNGKey(0),
                                 jnp.zeros((2, 4, 4, 2048), jnp.float32), cfg)
    disc_state = ModuleState(params=d_vars["params"], stats={},
                             opt_state=disc_state.opt_state)

    step = make_fada_train_step(seg, disc, cfg, steps_per_epoch=10)
    state = FadaState(seg=seg_state, disc=disc_state)
    _, metrics = step(state,
                      {"image": jnp.asarray(src), "label": jnp.asarray(src_label)},
                      {"image": jnp.asarray(tgt),
                       "label": jnp.zeros((2, 32, 32), jnp.int32)},
                      jnp.float32(0))

    assert abs(float(metrics["loss_seg"]) - loss_seg.item()) < 5e-4
    assert abs(float(metrics["loss_adv_tgt"]) - loss_adv.item()) < 2e-5
    assert abs(float(metrics["loss_D_src"]) - loss_D_src.item()) < 5e-4
    assert abs(float(metrics["loss_D_tgt"]) - loss_D_tgt.item()) < 5e-4
