import numpy as np
import os

from PIL import Image

from rnd_semantic_segmentation_tpu.configs import get_default_cfg
from rnd_semantic_segmentation_tpu.data import (
    DataLoader,
    DatasetCatalog,
    KvasirDataSet,
    SyntheticDataset,
    build_dataset,
)
from rnd_semantic_segmentation_tpu.data.datasets import (
    CITYSCAPES_ID_TO_TRAINID,
    remap_labels,
)


def _make_kvasir_tree(root, folds=("fold_0", "fold_1"), n=3, size=(32, 40)):
    rng = np.random.RandomState(0)
    for fold in folds:
        for sub in ("images", "masks"):
            os.makedirs(os.path.join(root, fold, sub), exist_ok=True)
        for i in range(n):
            img = (rng.rand(*size, 3) * 255).astype(np.uint8)
            mask = (rng.rand(*size) > 0.5).astype(np.uint8)
            Image.fromarray(img).save(os.path.join(root, fold, "images", f"{fold}_{i}.png"))
            Image.fromarray(mask).save(os.path.join(root, fold, "masks", f"{fold}_{i}.png"))


def test_kvasir_kfold_split(tmp_path):
    root = str(tmp_path / "kvasir")
    _make_kvasir_tree(root)
    train = KvasirDataSet(root, mode="train", cross_val=0)
    val = KvasirDataSet(root, mode="val", cross_val=0)
    # fold containing "0" goes to val, the rest to train (kvasir.py:22-30)
    assert len(train) == 3 and len(val) == 3
    img, label, name = train[0]
    assert img.ndim == 3 and label.shape == img.shape[:2]
    assert set(np.unique(label)).issubset({0.0, 1.0, 255.0})


def test_remap_labels_cityscapes():
    raw = np.array([[7, 8, 0], [33, 26, 99]], np.float32)
    out = remap_labels(raw, CITYSCAPES_ID_TO_TRAINID)
    assert out.tolist() == [[0, 1, 255], [18, 13, 255]]


def test_synthetic_through_catalog_and_loader():
    cfg = get_default_cfg()
    cfg.DATASETS.SOURCE_TRAIN = "synthetic_train"
    cfg.AUG.NAME = "none"
    cfg.INPUT.SOURCE_INPUT_SIZE_TRAIN = (64, 48)  # (W,H)
    ds = build_dataset(cfg, "train", is_source=True)
    assert isinstance(ds, SyntheticDataset)
    loader = DataLoader(ds, batch_size=4, num_workers=2, seed=0)
    batch = next(iter(loader))
    assert batch["image"].shape == (4, 48, 64, 3)
    assert batch["label"].shape == (4, 48, 64)
    assert batch["image"].dtype == np.float32
    assert batch["label"].dtype == np.int32
    assert len(batch["name"]) == 4


def test_debug_flag_pins_sample():
    ds = SyntheticDataset(size=(16, 16), length=8, debug=True)
    a = ds[0][0]
    b = ds[5][0]
    np.testing.assert_array_equal(a, b)


def test_loader_determinism_with_seed():
    ds = SyntheticDataset(size=(8, 8), length=16)
    l1 = DataLoader(ds, batch_size=4, seed=7)
    l2 = DataLoader(ds, batch_size=4, seed=7)
    b1 = next(iter(l1))
    b2 = next(iter(l2))
    np.testing.assert_array_equal(b1["image"], b2["image"])


def test_synthia_dataset(tmp_path):
    from rnd_semantic_segmentation_tpu.data.datasets import SynthiaDataSet
    root = str(tmp_path / "synthia")
    os.makedirs(os.path.join(root, "RGB"))
    os.makedirs(os.path.join(root, "GT/LABELS"))
    rng = np.random.RandomState(0)
    img = (rng.rand(20, 24, 3) * 255).astype(np.uint8)
    # SYNTHIA ids incl. some unmapped
    lab = np.array([[3, 4, 2, 21], [99, 15, 1, 11]] * 10, np.uint8)[:20, :4]
    lab = np.pad(lab, ((0, 0), (0, 20)), constant_values=0)
    Image.fromarray(img).save(os.path.join(root, "RGB", "a.png"))
    Image.fromarray(lab).save(os.path.join(root, "GT/LABELS", "a.png"))
    ds = SynthiaDataSet(root)
    image, label, name = ds[0]
    assert name == "a"
    assert label.shape == (20, 24)
    assert label[0, 0] == 0 and label[0, 1] == 1  # 3->0, 4->1
    assert label[1, 0] == 255  # unmapped id 99 -> ignore


def test_process_sharded_loader():
    """DistributedSampler semantics: disjoint epoch-consistent shards."""
    ds = SyntheticDataset(size=(8, 8), length=17)
    loaders = [DataLoader(ds, batch_size=2, shuffle=True, seed=5,
                          process_shard=True, process_index=i, process_count=2)
               for i in range(2)]
    names = [set(), set()]
    for i, l in enumerate(loaders):
        assert len(l) == 4  # 17 // 2 = 8 samples -> 4 batches
        for batch in l:
            names[i].update(batch["name"])
    assert not (names[0] & names[1])          # disjoint
    assert len(names[0]) == len(names[1]) == 8
