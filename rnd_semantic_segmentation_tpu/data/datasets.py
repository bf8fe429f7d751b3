"""Dataset classes (host indexing + decode; everything returns numpy).

Faithful reimplementations of /root/reference/core/datasets/:
  * KvasirDataSet / KvasirFoldDataset — k-fold split by folder name containing
    the cross_val digit (kvasir.py:22-30,69-80), images/ + masks/ pairing,
    {0:0,1:1} id remap with ignore fill (kvasir.py:104-116); the Fold variant
    resizes to SOURCE_INPUT_SIZE_TRAIN / INPUT_SIZE_TEST (kvasir.py:60-63).
  * cityscapesDataSet — leftImg8bit/<mode>/*/ glob, gtFine labelIds pairing,
    34->19 trainId remap, 16-class SYNTHIA remap when num_classes==16
    (cityscapes.py:24-120).
  * cityscapesSelfDistillDataSet — labels read from a pseudo-label dir with
    identity remap over train ids (cityscapes.py:153-182).
  * GTA5FoldDataSet — k-fold glob + labels/ dir + 19-class remap (gta5.py).
  * BLIDataset — jpg/JPG/png/jpeg glob, mask=imread/255 channel 0, resize to
    TARGET_INPUT_SIZE_TRAIN / INPUT_SIZE_TEST (bli.py:26-55).
  * SyntheticDataset — deterministic random blobs; the framework's test/bench
    stand-in (the reference had no offline-data-free path).

Every class keeps the reference's ``debug`` flag (index pinned to 0) — the
overfit-one-sample harness (kvasir.py:43-44).
"""

from __future__ import annotations

import os
from glob import glob
from typing import Callable, Dict, Optional, Sequence, Tuple

import numpy as np
from PIL import Image

from .augment import cv2_resize

CITYSCAPES_ID_TO_TRAINID = {
    7: 0, 8: 1, 11: 2, 12: 3, 13: 4, 17: 5, 19: 6, 20: 7, 21: 8, 22: 9,
    23: 10, 24: 11, 25: 12, 26: 13, 27: 14, 28: 15, 31: 16, 32: 17, 33: 18,
}
CITYSCAPES_TRAINID2NAME = {
    0: "road", 1: "sidewalk", 2: "building", 3: "wall", 4: "fence", 5: "pole",
    6: "light", 7: "sign", 8: "vegetation", 9: "terrain", 10: "sky",
    11: "person", 12: "rider", 13: "car", 14: "truck", 15: "bus", 16: "train",
    17: "motocycle", 18: "bicycle",
}
SYNTHIA_ID_TO_TRAINID = {
    7: 0, 8: 1, 11: 2, 12: 3, 13: 4, 17: 5, 19: 6, 20: 7, 21: 8, 23: 9,
    24: 10, 25: 11, 26: 12, 28: 13, 32: 14, 33: 15,
}
SYNTHIA_TRAINID2NAME = {
    0: "road", 1: "sidewalk", 2: "building", 3: "wall", 4: "fence", 5: "pole",
    6: "light", 7: "sign", 8: "vegetation", 9: "sky", 10: "person",
    11: "rider", 12: "car", 13: "bus", 14: "motocycle", 15: "bicycle",
}


def remap_labels(label: np.ndarray, id_to_trainid: Dict[int, int],
                 ignore_label: int = 255) -> np.ndarray:
    out = np.full(label.shape, ignore_label, dtype=np.float32)
    for k, v in id_to_trainid.items():
        out[label == k] = v
    return out


import threading as _threading

_decode_tls = _threading.local()  # per-thread native-decode scratch buffer


def _kfold_image_paths(data_root: str, mode: str, cross_val: int) -> list:
    paths = []
    for kfold_path in glob(data_root + "/*/"):
        name = os.path.basename(kfold_path[:-1])
        in_fold = str(cross_val) in name
        if (mode == "train") != in_fold:
            paths += sorted(glob(os.path.join(kfold_path, "images") + "/*.png"))
    return paths


class _Base:
    image_paths: list
    debug: bool = False
    transform: Optional[Callable] = None
    use_native_decode: bool = False   # set by build_dataset from DATA_PIPE

    def __len__(self):
        return len(self.image_paths)

    def _open_rgb(self, path: str):
        """Image decode: native C++ (libjpeg/libpng) fast path when enabled,
        PIL otherwise.  Returns a PIL RGB image either way so downstream
        transforms are unchanged."""
        if self.use_native_decode:
            from .native_loader import get_lib
            import ctypes
            import threading

            lib = get_lib()
            if lib is not None:
                tls = _decode_tls
                buf = getattr(tls, "buf", None)
                if buf is None:
                    buf = tls.buf = np.empty(64 * 1024 * 1024, np.uint8)
                h = ctypes.c_int()
                w = ctypes.c_int()
                c = ctypes.c_int()
                ok = lib.segdata_decode(
                    path.encode(),
                    buf.ctypes.data_as(ctypes.POINTER(ctypes.c_ubyte)),
                    buf.nbytes, ctypes.byref(h), ctypes.byref(w), ctypes.byref(c))
                if ok:
                    arr = buf[: h.value * w.value * c.value].reshape(
                        h.value, w.value, c.value)
                    if c.value == 1:
                        arr = np.repeat(arr, 3, axis=-1)
                    return Image.fromarray(arr.copy(), "RGB")
        return Image.open(path).convert("RGB")


class KvasirDataSet(_Base):
    def __init__(self, data_root, num_classes=2, mode="train", cross_val=0,
                 transform=None, ignore_label=255, debug=False):
        self.image_paths = _kfold_image_paths(data_root, mode, cross_val or 0)
        self.id_to_trainid = {0: 0, 1: 1}
        self.ignore_label = ignore_label
        self.transform = transform
        self.debug = debug

    def __getitem__(self, index):
        if self.debug:
            index = 0
        path = self.image_paths[index]
        img_name = os.path.basename(path)
        img_dir = os.path.dirname(os.path.dirname(path))
        image = self._open_rgb(path)
        label = np.array(Image.open(os.path.join(img_dir, "masks", img_name)),
                         dtype=np.float32)
        label = Image.fromarray(remap_labels(label, self.id_to_trainid,
                                             self.ignore_label))
        name = img_name[:-4]
        if self.transform is not None:
            image, label = self.transform(image, label)
        return np.asarray(image), np.asarray(label), name


class KvasirFoldDataset(_Base):
    def __init__(self, cfg, data_root, mode="train", cross_val=0,
                 transform=None, debug=False):
        self.cfg = cfg
        self.mode = mode
        self.transform = transform
        self.debug = debug
        self.image_paths = _kfold_image_paths(data_root, mode, cross_val or 0)

    def __getitem__(self, index):
        if self.debug:
            index = 0
        path = self.image_paths[index]
        img_name = os.path.basename(path)
        img_dir = os.path.dirname(os.path.dirname(path))
        image = np.asarray(self._open_rgb(path))
        mask = np.asarray(Image.open(os.path.join(img_dir, "masks", img_name)))
        if mask.ndim == 3:
            mask = mask[..., 0]
        name = img_name[:-4]
        if self.transform is not None:
            image, mask = self.transform(image, mask)
        size = (self.cfg.INPUT.SOURCE_INPUT_SIZE_TRAIN if self.mode == "train"
                else self.cfg.INPUT.INPUT_SIZE_TEST)
        image, mask = cv2_resize(image, mask, size)
        return image, mask, name


class CityscapesDataSet(_Base):
    def __init__(self, data_root, num_classes=19, mode="train", transform=None,
                 ignore_label=255, debug=False):
        self.mode = mode
        self.data_root = data_root
        self.transform = transform
        self.ignore_label = ignore_label
        self.debug = debug
        self.image_paths = []
        for img_dir in sorted(glob(os.path.join(data_root, f"leftImg8bit/{mode}") + "/*/")):
            self.image_paths += sorted(glob(img_dir + "/*.png"))
        if num_classes == 16:  # SYNTHIA target mode
            self.id_to_trainid = SYNTHIA_ID_TO_TRAINID
            self.trainid2name = SYNTHIA_TRAINID2NAME
        else:
            self.id_to_trainid = CITYSCAPES_ID_TO_TRAINID
            self.trainid2name = CITYSCAPES_TRAINID2NAME

    def _label_path(self, path):
        img_name = os.path.basename(path)
        img_dir = os.path.basename(os.path.dirname(path))
        return os.path.join(self.data_root, "gtFine", self.mode, img_dir,
                            img_name.split("_leftImg8bit")[0] + "_gtFine_labelIds.png")

    def __getitem__(self, index):
        if self.debug:
            index = 0
        path = self.image_paths[index]
        image = self._open_rgb(path)
        label = np.array(Image.open(self._label_path(path)), dtype=np.float32)
        label = Image.fromarray(remap_labels(label, self.id_to_trainid,
                                             self.ignore_label))
        name = os.path.basename(path)[:-4]
        if self.transform is not None:
            image, label = self.transform(image, label)
        return np.asarray(image), np.asarray(label), name


class CityscapesSelfDistillDataSet(CityscapesDataSet):
    """Pseudo-label training set: labels from PSEUDO_DIR exports."""

    def __init__(self, data_root, label_dir, num_classes=19, mode="train",
                 transform=None, ignore_label=255, debug=False):
        super().__init__(data_root, num_classes, mode, transform, ignore_label, debug)
        self.label_dir = label_dir

    def __getitem__(self, index):
        if self.debug:
            index = 0
        path = self.image_paths[index]
        img_name = os.path.basename(path)
        image = self._open_rgb(path)
        label = np.array(Image.open(os.path.join(self.label_dir, img_name)),
                         dtype=np.float32)
        # identity remap over train ids (cityscapes.py:175-177)
        identity = {k: k for k in self.trainid2name}
        label = Image.fromarray(remap_labels(label, identity, self.ignore_label))
        name = img_name[:-4]
        if self.transform is not None:
            image, label = self.transform(image, label)
        return np.asarray(image), np.asarray(label), name


class GTA5FoldDataSet(_Base):
    def __init__(self, cfg, data_root, mode="train", cross_val=0,
                 transform=None, debug=False, ignore_label=255):
        self.cfg = cfg
        self.transform = transform
        self.ignore_label = ignore_label
        self.debug = debug
        self.image_paths = _kfold_image_paths(data_root, mode, cross_val or 0)
        self.id_to_trainid = CITYSCAPES_ID_TO_TRAINID
        self.trainid2name = CITYSCAPES_TRAINID2NAME

    def __getitem__(self, index):
        if self.debug:
            index = 0
        path = self.image_paths[index]
        img_name = os.path.basename(path)
        img_dir = os.path.dirname(os.path.dirname(path))
        image = self._open_rgb(path)
        label = np.array(Image.open(os.path.join(img_dir, "labels", img_name)),
                         dtype=np.float32)
        label = Image.fromarray(remap_labels(label, self.id_to_trainid,
                                             self.ignore_label))
        name = img_name[:-4]
        if self.transform is not None:
            image, label = self.transform(image, label)
        return np.asarray(image), np.asarray(label), name


class BLIDataset(_Base):
    def __init__(self, cfg, data_root, mode="train", transform=None, debug=False):
        self.cfg = cfg
        self.mode = mode
        self.transform = transform
        self.debug = debug
        exts = ("JPG", "jpg", "png", "jpeg")
        self.image_paths = [p for p in sorted(glob(os.path.join(data_root, "images") + "/*.*"))
                            if p.endswith(exts)]

    def __getitem__(self, index):
        if self.debug:
            index = 0
        path = self.image_paths[index]
        img_name = os.path.basename(path)
        img_dir = os.path.dirname(os.path.dirname(path))
        image = np.asarray(self._open_rgb(path))
        mask_path = os.path.join(img_dir, "masks", img_name[:-5] + ".png")
        mask = np.asarray(Image.open(mask_path))
        if mask.ndim == 3:
            mask = mask[..., 0]
        mask = (mask / 255).astype(np.uint8)
        name = img_name[:-5]
        if self.transform is not None:
            image, mask = self.transform(image, mask)
        size = (self.cfg.INPUT.TARGET_INPUT_SIZE_TRAIN if self.mode == "train"
                else self.cfg.INPUT.INPUT_SIZE_TEST)
        image, mask = cv2_resize(image, mask, size)
        return image, mask, name


class SynthiaDataSet(_Base):
    """SYNTHIA-RAND-CITYSCAPES source dataset.

    The reference's catalog dispatches to ``synthiaDataSet`` whose import is
    commented out (dataset_path_catalog.py:4, :80-86 would NameError) — the
    class itself never shipped.  This implementation follows the standard
    FADA/SYNTHIA layout the configs imply: images under RGB/, labels under
    GT/LABELS/ (uint16 PNG, class ids in channel 0), remapped to the 16-class
    Cityscapes-compatible train ids.
    """

    # SYNTHIA class id -> 16-class train id (FADA convention)
    ID_TO_TRAINID = {3: 0, 4: 1, 2: 2, 21: 3, 5: 4, 7: 5, 15: 6, 9: 7,
                     6: 8, 1: 9, 10: 10, 17: 11, 8: 12, 19: 13, 12: 14, 11: 15}

    def __init__(self, data_root, data_list="", num_classes=16, mode="train",
                 transform=None, ignore_label=255, debug=False):
        self.data_root = data_root
        self.transform = transform
        self.ignore_label = ignore_label
        self.debug = debug
        self.image_paths = sorted(glob(os.path.join(data_root, "RGB") + "/*.png"))
        if data_list and os.path.exists(data_list):
            names = {l.strip() for l in open(data_list)}
            self.image_paths = [p for p in self.image_paths
                                if os.path.basename(p) in names]

    def __getitem__(self, index):
        if self.debug:
            index = 0
        path = self.image_paths[index]
        img_name = os.path.basename(path)
        image = self._open_rgb(path)
        label_arr = np.asarray(
            Image.open(os.path.join(self.data_root, "GT/LABELS", img_name)))
        if label_arr.ndim == 3:
            label_arr = label_arr[..., 0]
        label = Image.fromarray(remap_labels(label_arr.astype(np.float32),
                                             self.ID_TO_TRAINID,
                                             self.ignore_label))
        name = img_name[:-4]
        if self.transform is not None:
            image, label = self.transform(image, label)
        return np.asarray(image), np.asarray(label), name


class SyntheticDataset(_Base):
    """Deterministic random-blob segmentation data for tests and benchmarks.

    ``shift="swap"`` produces a covariate-shifted TARGET domain for
    domain-adaptation efficacy tests: the blob signal moves to the opposite
    channel and global brightness drops — same labels, shifted input
    distribution (the synthetic stand-in for GTA5->Cityscapes)."""

    def __init__(self, size: Tuple[int, int] = (352, 352), num_classes: int = 2,
                 length: int = 64, transform=None, seed: int = 0, debug=False,
                 shift: str = "none"):
        self.size = size
        self.num_classes = num_classes
        self.length = length
        self.transform = transform
        self.seed = seed
        self.debug = debug
        self.shift = shift
        self.image_paths = [f"synthetic_{i:05d}" for i in range(length)]

    def _gen(self, index):
        """(image, label, name) before the paired transform."""
        rng = np.random.RandomState(self.seed * 100003 + index)
        h, w = self.size
        image = rng.rand(h, w, 3).astype(np.float32)
        yy, xx = np.mgrid[0:h, 0:w]
        label = np.zeros((h, w), np.float32)
        for c in range(1, self.num_classes):
            cy, cx = rng.randint(0, h), rng.randint(0, w)
            r = rng.randint(min(h, w) // 8, min(h, w) // 3)
            label[(yy - cy) ** 2 + (xx - cx) ** 2 < r * r] = c
        # paint the blobs into the image so the task is learnable
        image[..., 0] += 0.5 * (label > 0)
        image = np.clip(image, 0, 1)
        if self.shift == "swap":
            # severe: signal channel flipped + brightness drop
            image = np.ascontiguousarray(image[..., ::-1]) * 0.7
        elif self.shift == "blend":
            # moderate: half the signal leaks to the opposite channel
            image = np.ascontiguousarray(
                0.5 * image + 0.5 * image[..., ::-1]) * 0.8
        elif self.shift == "dim":
            # mild: global brightness/contrast shift (BN-stat mismatch)
            image = np.clip(0.55 * image + 0.3, 0, 1)
        return image, label, self.image_paths[index]

    def __getitem__(self, index):
        if self.debug:
            index = 0
        image, label, name = self._gen(index)
        if self.transform is not None:
            image, label = self.transform(image, label)
        return np.asarray(image), np.asarray(label), name


class SyntheticSelfDistillDataset(SyntheticDataset):
    """Stage-B dataset of the offline two-stage self-distill recipe
    (cityscapes.py:153-182 semantics with identity remap): the deterministic
    synthetic images paired with the pseudo-label PNGs that ``test.py
    --saveres`` exported into ``PSEUDO_DIR/inference/<dataset>/``."""

    def __init__(self, label_dir: str, **kw):
        super().__init__(**kw)
        self.label_dir = label_dir

    def _gen(self, index):
        image, _, name = super()._gen(index)
        label = np.asarray(
            Image.open(os.path.join(self.label_dir, f"{name}.png")),
            dtype=np.float32)
        return image, label, name
