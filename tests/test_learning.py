"""Learning validation: the full Trainer must actually learn a separable task.

SyntheticDataset paints class blobs into the image (datasets.py), so a
correct train/eval pipeline must reach high mIoU quickly; a silent bug in the
loss/optimizer/data wiring shows up here even when every unit test passes.
"""

import numpy as np
import pytest

from rnd_semantic_segmentation_tpu.configs import get_default_cfg
from rnd_semantic_segmentation_tpu.data import DataLoader, build_collate_fn, build_dataset
from rnd_semantic_segmentation_tpu.eval.tester import Tester
from rnd_semantic_segmentation_tpu.train.trainer import Trainer
from rnd_semantic_segmentation_tpu.utils import setup_logger


@pytest.mark.slow
def test_trainer_learns_synthetic_blobs(tmp_path):
    cfg = get_default_cfg()
    cfg.MODEL.NAME = "deeplab_resnet18"
    cfg.MODEL.DTYPE = "float32"
    cfg.MODEL.NUM_CLASSES = 2
    cfg.MODEL.FREEZE_BN = False  # trainable BN (random init needs normalization)
    cfg.DATASETS.SOURCE_TRAIN = "synthetic_train"
    cfg.DATASETS.TEST = "synthetic_val"
    cfg.AUG.NAME = "none"
    cfg.INPUT.SOURCE_INPUT_SIZE_TRAIN = (48, 48)
    cfg.INPUT.INPUT_SIZE_TEST = (48, 48)
    cfg.SOLVER.BATCH_SIZE = 8
    cfg.SOLVER.BASE_LR = 5e-4
    cfg.SOLVER.EPOCHS = 10
    cfg.SOLVER.CHECKPOINT_PERIOD = 10
    cfg.OUTPUT_DIR = str(tmp_path)
    cfg.DATA_PIPE.NUM_WORKERS = 2

    loader = DataLoader(build_dataset(cfg, "train", True),
                        batch_size=cfg.SOLVER.BATCH_SIZE, shuffle=True,
                        drop_last=True, num_workers=2,
                        collate_fn=build_collate_fn(cfg))
    trainer = Trainer("learn", cfg, loader, 0)
    trainer.train()
    # loss must have dropped substantially
    assert trainer.loss_data[-1] < 0.65 * trainer.loss_data[0], (
        trainer.loss_data[0], trainer.loss_data[-1])

    cfg2 = cfg.clone()
    cfg2.resume = str(tmp_path / "Aspp-10")
    logger = setup_logger("learn_test", str(tmp_path), 0)
    test_loader = DataLoader(build_dataset(cfg2, "test", False), batch_size=2,
                             shuffle=False, drop_last=False, num_workers=2,
                             collate_fn=build_collate_fn(cfg2))
    tester = Tester(cfg2, test_loader, logger, trainid2name={0: "bg", 1: "blob"})
    tester._load_checkpoint()
    summary = tester.test()
    # the blob task is nearly separable from pixel intensity; a working
    # pipeline clears 0.55 macro-mIoU after ~32 steps (random ~0.33)
    assert summary["macro_miou"] > 0.55, summary["macro_miou"]
