"""Productized multi-device eval (VERDICT r2 item 1).

Drives the REAL product surface — ``cli/test.py``'s ``test()`` — on the
8-virtual-device CPU mesh with ``DIST.SPATIAL_PARALLEL 2`` + ``TEST.BATCH_SIZE
8`` (a (4,2) ('data','spatial') mesh) and asserts the sharded run reproduces
the single-device mIoU/F1/confusion numbers.  Matches the reference's eval
metric reduction (/root/reference/core/utils/utility.py:148-161) done with
on-device psums instead of a host loop.
"""

import argparse
import json

import numpy as np
import pytest

import jax

from rnd_semantic_segmentation_tpu.cli.test import test as cli_test
from rnd_semantic_segmentation_tpu.configs import get_default_cfg
from rnd_semantic_segmentation_tpu.data import (DataLoader, build_collate_fn,
                                                build_dataset)
from rnd_semantic_segmentation_tpu.eval.tester import Tester
from rnd_semantic_segmentation_tpu.train.trainer import Trainer
from rnd_semantic_segmentation_tpu.utils import setup_logger

RENDER = {"name": "dist_eval",
          "palette": [0, 0, 0, 255, 255, 255, 128, 128, 128],
          "trainid2name": {"0": "bg", "1": "a", "2": "b"}}


def _cfg(out_dir, nc=3):
    cfg = get_default_cfg()
    cfg.MODEL.NAME = "deeplab_resnet18"
    cfg.MODEL.DTYPE = "float32"
    cfg.MODEL.NUM_CLASSES = nc
    cfg.MODEL.FREEZE_BN = True
    cfg.DATASETS.SOURCE_TRAIN = "synthetic_train"
    cfg.DATASETS.TEST = "synthetic_val"
    cfg.AUG.NAME = "none"
    cfg.INPUT.SOURCE_INPUT_SIZE_TRAIN = (32, 32)
    cfg.INPUT.INPUT_SIZE_TEST = (32, 32)
    cfg.SOLVER.BATCH_SIZE = 4
    cfg.SOLVER.BASE_LR = 1e-3
    cfg.SOLVER.EPOCHS = 1
    cfg.SOLVER.CHECKPOINT_PERIOD = 1
    cfg.OUTPUT_DIR = str(out_dir)
    cfg.DATA_PIPE.NUM_WORKERS = 2
    return cfg


@pytest.fixture(scope="module")
def ckpt(tmp_path_factory):
    """One trained epoch -> checkpoint shared by every test in the module."""
    out = tmp_path_factory.mktemp("dist_eval_train")
    cfg = _cfg(out)
    data = build_dataset(cfg, "train", True)
    loader = DataLoader(data, batch_size=cfg.SOLVER.BATCH_SIZE, shuffle=True,
                        drop_last=True, num_workers=2,
                        collate_fn=build_collate_fn(cfg))
    Trainer("dist_eval", cfg, loader, 0).train()
    return str(out / "Aspp-1")


def _summary_and_cmt(out_dir, cfg, args):
    summary = cli_test(cfg, RENDER, args)
    cm = json.load(open(f"{out_dir}/deeplab_confusion_matrix.json"))
    return summary, np.asarray(cm["cmt"])


def test_cli_eval_dp_spatial_matches_single_device(ckpt, tmp_path):
    """(4,2) data x spatial mesh through the real CLI == single device."""
    args = argparse.Namespace(saveres=False)

    ref_dir = tmp_path / "ref"
    ref_cfg = _cfg(ref_dir)
    ref_cfg.resume = ckpt
    ref_cfg.TEST.BATCH_SIZE = 8
    ref_cfg.DIST.NUM_DEVICES = 1      # forced single-device baseline
    ref, ref_cmt = _summary_and_cmt(ref_dir, ref_cfg, args)

    sh_dir = tmp_path / "sharded"
    sh_cfg = _cfg(sh_dir)
    sh_cfg.resume = ckpt
    sh_cfg.TEST.BATCH_SIZE = 8
    sh_cfg.DIST.SPATIAL_PARALLEL = 2  # 8 devices -> (4,2) mesh
    out, out_cmt = _summary_and_cmt(sh_dir, sh_cfg, args)

    np.testing.assert_array_equal(out_cmt, ref_cmt)
    for key in ("macro_miou", "macro_mf1", "micro_miou", "micro_mf1"):
        assert abs(out[key] - ref[key]) < 1e-6, (key, out[key], ref[key])


def test_tester_builds_expected_mesh(ckpt, tmp_path):
    cfg = _cfg(tmp_path)
    cfg.TEST.BATCH_SIZE = 8
    cfg.DIST.SPATIAL_PARALLEL = 2
    loader = DataLoader(build_dataset(cfg, "test", False), batch_size=8,
                        shuffle=False, drop_last=False, num_workers=2,
                        collate_fn=build_collate_fn(cfg))
    tester = Tester(cfg, loader, setup_logger("mesh_t", str(tmp_path), 0))
    assert tester.mesh.devices.shape == (4, 2)
    assert tester.mesh.axis_names == ("data", "spatial")


def test_eval_short_batch_padding(ckpt, tmp_path):
    """64 samples / batch 6 -> final batch of 4 padded with ignore rows;
    metrics identical to the single-device run at the same batch size."""
    logger = setup_logger("pad_t", str(tmp_path), 0)

    def run(num_devices, spatial):
        cfg = _cfg(tmp_path / f"d{num_devices}s{spatial}")
        cfg.resume = ckpt
        cfg.DIST.NUM_DEVICES = num_devices
        cfg.DIST.SPATIAL_PARALLEL = spatial
        loader = DataLoader(build_dataset(cfg, "test", False), batch_size=6,
                            shuffle=False, drop_last=False, num_workers=2,
                            collate_fn=build_collate_fn(cfg))
        tester = Tester(cfg, loader, logger)
        tester._load_checkpoint()
        return tester.test()

    ref = run(1, 1)
    out = run(0, 2)
    for key in ("macro_miou", "macro_mf1", "micro_miou", "micro_mf1"):
        assert abs(out[key] - ref[key]) < 1e-6, (key, out[key], ref[key])


@pytest.mark.slow  # 75 s: mesh-padded short-batch eval (ROUND5.md budget split)
def test_pranet_short_batch_padding_masks_minmax(tmp_path):
    """pranet's min-max rescale is batch-GLOBAL (reference
    pranet_tester.py:41), so the Tester's ignore-padded rows must be masked
    out of the statistics — a padded short batch must predict exactly what
    the unpadded rows predict on their own.  (deeplab's softmax head is
    per-pixel; only pranet couples rows through the head.)"""
    import jax.numpy as jnp

    from rnd_semantic_segmentation_tpu.data import SyntheticDataset
    from rnd_semantic_segmentation_tpu.eval.metrics import (
        intersection_and_union)

    cfg = get_default_cfg()
    cfg.MODEL.NAME = "pranet_res2net50"
    cfg.MODEL.DTYPE = "float32"
    cfg.MODEL.NUM_CLASSES = 2
    cfg.MODEL.FREEZE_BN = True
    cfg.INPUT.INPUT_SIZE_TEST = (64, 64)
    cfg.DATASETS.TEST = "synthetic_val"
    cfg.OUTPUT_DIR = str(tmp_path)

    ds = SyntheticDataset(size=(64, 64), length=6, num_classes=2)
    loader = DataLoader(ds, batch_size=4, shuffle=False, drop_last=False,
                        num_workers=2, collate_fn=build_collate_fn(cfg))
    tester = Tester(cfg, loader, setup_logger("pra_pad", str(tmp_path), 0))
    tester.variables = tester._replicate(tester.segmentor.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3), jnp.float32)))
    host_vars = jax.device_get(tester.variables)
    summary = tester.test()  # batches: [4 rows, 2 rows padded to 4]

    # reference: the same model on the UNPADDED row groups [0:4] and [4:6]
    inter_s = np.zeros(2)
    union_s = np.zeros(2)
    for lo, hi in ((0, 4), (4, 6)):
        items = [ds[j] for j in range(lo, hi)]
        x = jnp.asarray(np.stack([it[0] for it in items]), jnp.float32)
        y = jnp.asarray(np.stack([it[1] for it in items]).astype(np.int32))
        pred = jnp.argmax(tester._probs_impl(host_vars, x, (64, 64)), axis=-1)
        inter, union, _, _ = intersection_and_union(pred, y, 2, 255)
        inter_s += np.asarray(inter)
        union_s += np.asarray(union)
    ref_micro = float(np.mean(inter_s / (union_s + 1e-10)))
    assert abs(summary["micro_miou"] - ref_micro) < 1e-6, (
        summary["micro_miou"], ref_micro)

    # sharp mask-semantics check: pad rows with EXTREME inputs (which drive
    # sigmoid toward 0/1 and would certainly stretch an unmasked batch
    # min/max); masked probs of the real rows must equal the probs of the
    # real rows evaluated alone
    rng = np.random.RandomState(0)
    x_real = jnp.asarray(rng.rand(2, 64, 64, 3).astype(np.float32))
    x_pad = jnp.full((2, 64, 64, 3), 50.0, jnp.float32)
    x_full = jnp.concatenate([x_real, x_pad])
    valid = jnp.asarray([True, True, False, False])
    masked = tester._probs_impl(host_vars, x_full, (64, 64), valid=valid)[:2]
    # expected: the SAME [4,...] forward (XLA tiles convs differently per
    # batch size, so a [2,...] run is not bit-comparable) with min/max taken
    # over the real rows only
    from rnd_semantic_segmentation_tpu.ops import resize_bilinear
    params = {n: dict(v)["params"] for n, v in host_vars.items()}
    stats = {n: {k: c for k, c in dict(v).items() if k != "params"}
             for n, v in host_vars.items()}
    outputs, _, _ = tester.segmentor.forward(params, stats, x_full,
                                             label_size=(64, 64), train=False)
    out = resize_bilinear(outputs[-1].astype(jnp.float32), (64, 64),
                          align_corners=False)
    p = jax.nn.sigmoid(out)[..., 0]
    pmin, pmax = p[:2].min(), p[:2].max()
    pr = (p[:2] - pmin) / (pmax - pmin + 1e-8)
    expected = jnp.stack([1 - pr, pr], axis=-1)
    # an UNMASKED min/max would be off by O(0.1) here (the 50.0 rows drive
    # sigmoid toward 1 and stretch the rescale range)
    np.testing.assert_allclose(np.asarray(masked), np.asarray(expected),
                               atol=1e-5)
