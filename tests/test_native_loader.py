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


def test_native_palette_png_matches_pil(tmp_path):
    """segdata_save_palette_png must produce P-mode PNGs whose class ids and
    palette read back identical to the PIL path (the --saveres pseudo-label
    format, reference utility.py:211-217)."""
    from rnd_semantic_segmentation_tpu.data.native_loader import (
        native_available, save_palette_png, save_palette_png_batch)
    from rnd_semantic_segmentation_tpu.eval.palette import get_color_palette

    if not native_available():
        import pytest
        pytest.skip("native lib unavailable")
    rng = np.random.RandomState(0)
    pred = rng.randint(0, 19, (48, 72)).astype(np.uint8)
    palette = list(rng.randint(0, 256, 57))

    native_p = str(tmp_path / "native.png")
    assert save_palette_png(native_p, pred, palette)
    pil_p = str(tmp_path / "pil.png")
    get_color_palette(pred, palette).save(pil_p)

    a, b = Image.open(native_p), Image.open(pil_p)
    assert a.mode == b.mode == "P"
    np.testing.assert_array_equal(np.asarray(a), pred)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert a.getpalette()[:57] == b.getpalette()[:57]

    preds = rng.randint(0, 19, (3, 48, 72)).astype(np.uint8)
    paths = [str(tmp_path / f"b{i}.png") for i in range(3)]
    ok = save_palette_png_batch(paths, preds, palette, num_threads=2)
    assert ok.all()
    for i, p in enumerate(paths):
        np.testing.assert_array_equal(np.asarray(Image.open(p)), preds[i])


def test_save_pseudo_label_uses_native_or_pil(tmp_path):
    """save_pseudo_label end-to-end: file lands in PSEUDO_DIR/inference/<ds>
    and reads back as the argmax map regardless of which writer ran."""
    from rnd_semantic_segmentation_tpu.eval.palette import save_pseudo_label

    rng = np.random.RandomState(1)
    pred = rng.randint(0, 19, (32, 40))
    palette = list(rng.randint(0, 256, 57))
    path = save_pseudo_label(pred, palette, str(tmp_path), "cityscapes_train",
                             "frankfurt_000000_000294_leftImg8bit.png")
    assert path.endswith(".png") and "inference/cityscapes_train" in path
    np.testing.assert_array_equal(np.asarray(Image.open(path)), pred)
