"""Native C++ decode/resize/normalize loader vs PIL fallback."""

import os

import numpy as np
import pytest
from PIL import Image

from rnd_semantic_segmentation_tpu.data.native_loader import (
    load_batch,
    native_available,
    _load_batch_pil,
)


@pytest.fixture
def image_files(tmp_path, rng):
    paths = []
    for i, ext in enumerate(["png", "jpg", "png"]):
        arr = (rng.rand(40 + i * 8, 52, 3) * 255).astype(np.uint8)
        p = str(tmp_path / f"img_{i}.{ext}")
        Image.fromarray(arr).save(p, quality=95)
        paths.append(p)
    return paths


def test_native_builds():
    assert native_available(), "native libsegdata.so failed to build"


def test_load_batch_shapes_and_normalization(image_files):
    batch, ok = load_batch(image_files, (32, 48))
    assert batch.shape == (3, 32, 48, 3)
    assert batch.dtype == np.float32
    assert ok.all()
    assert np.isfinite(batch).all()
    assert abs(batch).max() < 6.0  # imagenet-normalized range


def test_native_matches_pil_for_png(image_files):
    if not native_available():
        pytest.skip("no native lib")
    png_paths = [p for p in image_files if p.endswith(".png")]
    nat, ok1 = load_batch(png_paths, (40, 52))
    pil, ok2 = _load_batch_pil(png_paths, (40, 52), (0.485, 0.456, 0.406),
                               (0.229, 0.224, 0.225), 1 / 255.0)
    assert ok1.all() and ok2.all()
    # PNG decode is lossless and both resizers are bilinear
    # (PIL's box-filter bilinear differs slightly from torch-style; allow slack)
    assert np.abs(nat - pil).mean() < 0.2


def test_missing_file_flagged(tmp_path, image_files):
    paths = image_files + [str(tmp_path / "nope.png")]
    batch, ok = load_batch(paths, (16, 16))
    assert ok[:3].all() and not ok[3]
    assert (batch[3] == 0).all() or np.isfinite(batch[3]).all()


def test_native_decode_in_dataset(tmp_path, rng):
    """KvasirDataSet with DATA_PIPE.NATIVE_DECODE: native decode == PIL."""
    from rnd_semantic_segmentation_tpu.configs import get_default_cfg
    from rnd_semantic_segmentation_tpu.data import build_dataset

    root = tmp_path / "kvasir"
    for sub in ("images", "masks"):
        (root / "fold_1" / sub).mkdir(parents=True)
    arr = (rng.rand(24, 30, 3) * 255).astype(np.uint8)
    Image.fromarray(arr).save(root / "fold_1" / "images" / "a.png")
    Image.fromarray((arr[..., 0] > 128).astype(np.uint8)).save(
        root / "fold_1" / "masks" / "a.png")

    cfg = get_default_cfg()
    cfg.DATASETS.DATASET_DIR = str(tmp_path)
    cfg.DATASETS.SOURCE_TRAIN = "kvasir_train"
    cfg.AUG.NAME = "none"
    cfg.DATA_PIPE.NATIVE_DECODE = True
    ds = build_dataset(cfg, "train", True)
    assert ds.use_native_decode
    img_native, label, _ = ds[0]
    ds.use_native_decode = False
    img_pil, _, _ = ds[0]
    np.testing.assert_array_equal(np.asarray(img_native), np.asarray(img_pil))
