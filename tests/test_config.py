import os
import textwrap

import pytest

from rnd_semantic_segmentation_tpu.configs import ConfigError, get_default_cfg


def test_defaults_match_reference_surface():
    cfg = get_default_cfg()
    # spot-check the keys every reference entry point touches
    assert cfg.MODEL.NAME == "deeplab_resnet101"
    assert cfg.MODEL.NUM_CLASSES == 2
    assert cfg.INPUT.IGNORE_LABEL == 255
    assert cfg.SOLVER.LR_METHOD == "poly"
    assert cfg.SOLVER.BASE_LR == 0.02
    assert cfg.SOLVER.BATCH_SIZE == 8
    assert cfg.TEST.BATCH_SIZE == 1
    assert cfg.OUTPUT_DIR == "."
    assert cfg.resume == ""
    assert cfg.PSEUDO_DIR == ""


def test_merge_from_file_and_list(tmp_path):
    yaml_path = tmp_path / "cfg.yaml"
    yaml_path.write_text(textwrap.dedent("""
        MODEL:
          NAME: "deeplab_resnet101"
          FREEZE_BN: True
          NUM_CLASSES: 19
        SOLVER:
          BASE_LR: 5e-4
          BATCH_SIZE: 12
    """))
    cfg = get_default_cfg()
    cfg.merge_from_file(str(yaml_path))
    assert cfg.MODEL.FREEZE_BN is True
    assert cfg.MODEL.NUM_CLASSES == 19
    assert cfg.SOLVER.BASE_LR == 5e-4

    # CLI override surface: `KEY VALUE ...` exactly like run.sh:7
    cfg.merge_from_list(["OUTPUT_DIR", "results/x", "resume", "ckpt.pth",
                         "SOLVER.BASE_LR", "0.01", "MODEL.FREEZE_BN", "False"])
    assert cfg.OUTPUT_DIR == "results/x"
    assert cfg.resume == "ckpt.pth"
    assert cfg.SOLVER.BASE_LR == 0.01
    assert cfg.MODEL.FREEZE_BN is False


def test_freeze_blocks_writes():
    cfg = get_default_cfg()
    cfg.freeze()
    with pytest.raises(ConfigError):
        cfg.SOLVER.BASE_LR = 1.0
    cfg.defrost()
    cfg.SOLVER.BASE_LR = 1.0
    assert cfg.SOLVER.BASE_LR == 1.0


def test_unknown_cli_key_rejected():
    cfg = get_default_cfg()
    with pytest.raises(ConfigError):
        cfg.merge_from_list(["SOLVER.NOPE_TYPO.X", "1"])


def test_tuple_coercion():
    cfg = get_default_cfg()
    cfg.merge_from_list(["INPUT.INPUT_SIZE_TEST", "[352, 352]"])
    assert cfg.INPUT.INPUT_SIZE_TEST == (352, 352)


def test_clone_isolation():
    a = get_default_cfg()
    b = a.clone()
    b.SOLVER.BASE_LR = 99.0
    assert a.SOLVER.BASE_LR == 0.02
