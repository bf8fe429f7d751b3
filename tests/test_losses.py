"""Loss parity vs torch implementations of the reference's loss definitions."""

import numpy as np
import pytest

import jax.numpy as jnp
import torch
import torch.nn.functional as TF

from rnd_semantic_segmentation_tpu.losses import (
    bce_with_logits,
    cross_entropy,
    generalized_dice_loss,
    soft_label_cross_entropy,
    structure_loss,
    tversky_loss,
)


def _t(x_nhwc):  # NHWC numpy -> NCHW torch
    return torch.from_numpy(np.transpose(x_nhwc, (0, 3, 1, 2)))


def test_cross_entropy_ignore_matches_torch(rng):
    logits = rng.randn(2, 8, 8, 19).astype(np.float32)
    labels = rng.randint(0, 19, size=(2, 8, 8)).astype(np.int32)
    labels[0, :3] = 255  # ignored region
    ours = float(cross_entropy(jnp.asarray(logits), jnp.asarray(labels)))
    ref = TF.cross_entropy(_t(logits), torch.from_numpy(labels).long(),
                           ignore_index=255).item()
    assert abs(ours - ref) < 1e-4


def test_soft_label_ce_matches_reference_formula(rng):
    pred = rng.randn(2, 4, 4, 6).astype(np.float32)
    soft = rng.rand(2, 4, 4, 6).astype(np.float32)
    ours = float(soft_label_cross_entropy(jnp.asarray(pred), jnp.asarray(soft)))
    # reference utility.py:172-177
    t_pred, t_soft = _t(pred), _t(soft)
    ref = torch.mean(torch.sum(-t_soft * TF.log_softmax(t_pred, dim=1), dim=1)).item()
    assert abs(ours - ref) < 1e-4


def test_bce_matches_torch(rng):
    pred = rng.randn(2, 8, 8, 2).astype(np.float32)
    label = (rng.rand(2, 8, 8, 2) > 0.5).astype(np.float32)
    ours = float(bce_with_logits(jnp.asarray(pred), jnp.asarray(label)))
    ref = TF.binary_cross_entropy_with_logits(_t(pred), _t(label)).item()
    assert abs(ours - ref) < 1e-4


def test_tversky_matches_reference_formula(rng):
    pred = rng.randn(2, 8, 8, 2).astype(np.float32)
    label = (rng.rand(2, 8, 8, 2) > 0.5).astype(np.float32)
    ours = float(tversky_loss(jnp.asarray(pred), jnp.asarray(label)))
    probs = torch.sigmoid(_t(pred))
    tl = _t(label)
    tp = torch.sum(probs * tl, dim=[0, 2, 3])
    fn = torch.sum(tl * (1 - probs), dim=[0, 2, 3])
    fp = torch.sum(probs * (1 - tl), dim=[0, 2, 3])
    ref = (1 - torch.mean((tp + 1) / (tp + 0.7 * fn + 0.3 * fp + 1))).item()
    assert abs(ours - ref) < 1e-4


def test_structure_loss_matches_reference_behavior(rng):
    """Replicates pranet_trainer.py:22-31 including the reduce='none' quirk
    (legacy arg resolves to 'mean', so the BCE term is a global mean)."""
    pred = rng.randn(2, 33, 33, 1).astype(np.float32)
    mask = (rng.rand(2, 33, 33, 1) > 0.5).astype(np.float32)
    ours = float(structure_loss(jnp.asarray(pred), jnp.asarray(mask)))

    tp, tm = _t(pred), _t(mask)
    weit = 1 + 5 * torch.abs(TF.avg_pool2d(tm, kernel_size=31, stride=1, padding=15) - tm)
    wbce = TF.binary_cross_entropy_with_logits(tp, tm)  # 'mean' (see quirk)
    wbce = (weit * wbce).sum(dim=(2, 3)) / weit.sum(dim=(2, 3))
    ps = torch.sigmoid(tp)
    inter = ((ps * tm) * weit).sum(dim=(2, 3))
    union = ((ps + tm) * weit).sum(dim=(2, 3))
    wiou = 1 - (inter + 1) / (union - inter + 1)
    ref = (wbce + wiou).mean().item()
    assert abs(ours - ref) < 1e-4


def test_generalized_dice_runs_with_ignore(rng):
    out = rng.randn(2, 8, 8, 3).astype(np.float32)
    target = rng.randint(0, 3, size=(2, 8, 8)).astype(np.int32)
    target[:, 0] = 255
    val = float(generalized_dice_loss(jnp.asarray(out), jnp.asarray(target)))
    assert 0.0 <= val <= 1.0
