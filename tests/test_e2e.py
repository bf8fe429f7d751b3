"""End-to-end pipeline smoke: train -> checkpoint -> test (synthetic data).

This is the framework's overfit-style harness in the spirit of the
reference's debug fixtures (SURVEY §4): the full CLI path must run with no
datasets on disk via the synthetic catalog entries.
"""

import json
import os

import numpy as np
import pytest

from rnd_semantic_segmentation_tpu.configs import get_default_cfg
from rnd_semantic_segmentation_tpu.data import DataLoader, build_collate_fn, build_dataset
from rnd_semantic_segmentation_tpu.eval.tester import Tester
from rnd_semantic_segmentation_tpu.train.trainer import FadaTrainer, Trainer
from rnd_semantic_segmentation_tpu.utils import setup_logger


def _cfg(tmp_path, name="deeplab_resnet18", nc=3, epochs=1):
    cfg = get_default_cfg()
    cfg.MODEL.NAME = name
    cfg.MODEL.DTYPE = "float32"
    cfg.MODEL.NUM_CLASSES = nc
    cfg.MODEL.FREEZE_BN = True
    cfg.DATASETS.SOURCE_TRAIN = "synthetic_train"
    cfg.DATASETS.TARGET_TRAIN = "synthetic_train"
    cfg.DATASETS.TEST = "synthetic_val"
    cfg.AUG.NAME = "none"
    cfg.INPUT.SOURCE_INPUT_SIZE_TRAIN = (32, 32)
    cfg.INPUT.TARGET_INPUT_SIZE_TRAIN = (32, 32)
    cfg.INPUT.INPUT_SIZE_TEST = (32, 32)
    cfg.SOLVER.BATCH_SIZE = 4
    cfg.SOLVER.BASE_LR = 1e-4
    cfg.SOLVER.BASE_LR_D = 1e-4
    cfg.SOLVER.EPOCHS = epochs
    cfg.SOLVER.CHECKPOINT_PERIOD = 1
    cfg.OUTPUT_DIR = str(tmp_path)
    cfg.PSEUDO_DIR = str(tmp_path / "pseudo")
    cfg.DATA_PIPE.NUM_WORKERS = 2
    return cfg


def _loader(cfg, mode="train", is_source=True, batch=None, shuffle=True):
    data = build_dataset(cfg, mode, is_source)
    return DataLoader(data, batch_size=batch or cfg.SOLVER.BATCH_SIZE,
                      shuffle=shuffle, drop_last=shuffle,
                      num_workers=2, collate_fn=build_collate_fn(cfg))


def test_train_checkpoint_eval_cycle(tmp_path):
    cfg = _cfg(tmp_path)
    trainer = Trainer("e2e", cfg, _loader(cfg), 0)
    trainer.train()

    # chart dump exists
    chart = json.load(open(tmp_path / "deeplab_chart_params.json"))
    assert len(chart["loss"]) == trainer.steps_per_epoch
    # checkpoint written
    ckpt = tmp_path / "Aspp-1"
    assert ckpt.exists()

    # eval from the checkpoint, with pseudo-label export
    cfg2 = cfg.clone()
    cfg2.resume = str(ckpt)
    logger = setup_logger("e2e_test", str(tmp_path), 0)
    tester = Tester(cfg2, _loader(cfg2, "test", False, batch=2, shuffle=False),
                    logger, palette=[0, 0, 0, 255, 255, 255, 128, 128, 128],
                    trainid2name={0: "bg", 1: "a", 2: "b"}, saveres=True)
    tester._load_checkpoint()
    summary = tester.test()
    assert 0.0 <= summary["macro_miou"] <= 1.0
    assert (tmp_path / "deeplab_confusion_matrix.json").exists()
    # pseudo labels exported for self-distillation
    exported = os.listdir(tmp_path / "pseudo" / "inference" / "synthetic_val")
    assert len(exported) > 0


def test_resume_continues(tmp_path):
    cfg = _cfg(tmp_path)
    Trainer("e2e_r1", cfg, _loader(cfg), 0).train()
    cfg2 = cfg.clone()
    cfg2.resume = str(tmp_path / "Aspp-1")
    cfg2.SOLVER.EPOCHS = 2
    t2 = Trainer("e2e_r2", cfg2, _loader(cfg2), 0)
    assert t2.start_epoch == 2
    t2.train()
    assert (tmp_path / "Aspp-2").exists()


def test_fada_trainer_e2e(tmp_path):
    cfg = _cfg(tmp_path)
    src = _loader(cfg, batch=cfg.SOLVER.BATCH_SIZE // 2)
    tgt = _loader(cfg, is_source=False, batch=cfg.SOLVER.BATCH_SIZE // 2)
    FadaTrainer("e2e_fada", cfg, src, tgt, 0).train()
    assert (tmp_path / "AsppFada-1").exists()
    chart = json.load(open(tmp_path / "deeplab_fada_chart_params.json"))
    assert len(chart["segmentation loss"]) > 0


@pytest.mark.slow  # 133 s on the 1-core host: full multiscale trainer (ROUND5.md budget split)
def test_device_aug_trainer_pranet_multiscale(tmp_path):
    """DEVICE_AUG end-to-end through the pranet family: the device pipeline
    (rot90/flip/jitter/normalize) feeds the multiscale rate loop, whose
    host-side `_resize_batch_to` must survive device-resident batches."""
    cfg = _cfg(tmp_path, name="pranet_res2net50")
    cfg.AUG.NAME = "pra"
    cfg.INPUT.TRAINSIZE = 32
    cfg.DATA_PIPE.DEVICE_AUG = True
    trainer = Trainer("e2e_devaug", cfg, _loader(cfg), 0)
    assert trainer.device_aug is not None
    trainer.train()
    assert np.isfinite(trainer.loss_data).all()


def test_device_aug_fada_e2e(tmp_path):
    """FADA with device augmentation: source jitters, target only
    flips/normalizes, both streams ride the device pipeline."""
    cfg = _cfg(tmp_path)
    cfg.AUG.NAME = "aspp"
    cfg.DATA_PIPE.DEVICE_AUG = True
    src = _loader(cfg, batch=cfg.SOLVER.BATCH_SIZE // 2)
    tgt = _loader(cfg, is_source=False, batch=cfg.SOLVER.BATCH_SIZE // 2)
    ft = FadaTrainer("e2e_fada_devaug", cfg, src, tgt, 0)
    assert ft.device_aug_src is not None and ft.device_aug_tgt is not None
    ft.train()
    assert (tmp_path / "AsppFada-1").exists()


def test_bn_recal_uses_device_aug_distribution(tmp_path, monkeypatch):
    """With DATA_PIPE.DEVICE_AUG, _recalibrate_bn must feed the jitted
    device pipeline's output (normalized for the pra family), not raw
    [0,1] loader images — otherwise the final checkpoint's BN stats come
    from a distribution the model never sees (review finding, round 4)."""
    cfg = _cfg(tmp_path, name="pranet_res2net50", nc=2)
    cfg.AUG.NAME = "pra"
    cfg.AUG.COLLATE = "pranet"
    cfg.INPUT.TRAINSIZE = 64
    cfg.INPUT.SOURCE_INPUT_SIZE_TRAIN = (64, 64)
    cfg.DATA_PIPE.DEVICE_AUG = True
    cfg.SOLVER.BN_RECAL_BATCHES = 0  # call _recalibrate_bn directly below
    trainer = Trainer("bnrecal", cfg, _loader(cfg), 0)

    seen = []

    def fake_recal(segmentor, params, stats, batches, rng=None):
        seen.extend(batches)
        return stats

    monkeypatch.setattr("rnd_semantic_segmentation_tpu.train.bn_recal."
                        "recalibrate_batch_stats", fake_recal)
    trainer._recalibrate_bn(2)
    assert len(seen) == 2
    for b in seen:
        img = np.asarray(b["image"], np.float32)
        # pra device pipeline imagenet-normalizes: mean ~0 and values far
        # outside [0,1]; raw loader batches would be entirely within [0,1]
        assert img.min() < -0.5 and img.max() > 1.5, (img.min(), img.max())
