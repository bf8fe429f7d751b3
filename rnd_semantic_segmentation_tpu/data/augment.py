"""Augmentation pipeline factory (`cfg.AUG.NAME` dispatch).

Re-implements /root/reference/core/components/augment.py:26-120 without the
albumentations/cv2 dependency:
  * attn_trans (:35-53) — MotionBlur / Rotate / ColorJitter / Flip with the
    configured probabilities, wrapped in an outer apply-probability.
  * pra_trans (:55-85) — rotate90 / flip / HSV & brightness jitter / transpose
    / random-or-center crop 220 / resize to TRAINSIZE / imagenet Normalize.
    (The reference references an undefined ``self.trainsize`` — a latent bug;
    we use cfg.INPUT.TRAINSIZE, which is what the committed configs intend.)
  * aspp_trans (:87-120) — torchvision-style Compose built from
    data/transforms.py with ColorJitter only for the source domain.
  * "none"/"gald" — identity transform.  (The reference raises AttributeError
    for AUG.NAME="gald" committed in configs/gald_src.yaml:17; we make it the
    identity so that config actually runs.)

Augmentations are stochastic; parity is distributional, not bitwise.
"""

from __future__ import annotations

import random
from typing import Tuple

import numpy as np
from PIL import Image

from . import transforms as T


def cv2_resize(image, label, size=(512, 512)):
    """Bilinear resize of both image and label to (w,h) — augment.py:12-17
    resizes the *label with bilinear interpolation* too (cv2.resize default);
    faithful reproduction since the binary masks survive it."""
    w, h = size
    img = T._as_pil(image).resize((w, h), Image.BILINEAR)
    image = np.asarray(img)
    if label is None:
        return image, None
    lab = Image.fromarray(np.asarray(label).astype(np.float32)).resize((w, h), Image.BILINEAR)
    return image, np.asarray(lab)


def _motion_blur(image: np.ndarray, ksize: int) -> np.ndarray:
    """Line-kernel blur: average of k shifted copies along a random direction."""
    arr = image.astype(np.float32)
    direction = random.choice(["h", "v", "d1", "d2"])
    acc = np.zeros_like(arr)
    offs = range(-(ksize // 2), ksize // 2 + 1)
    for o in offs:
        if direction == "h":
            acc += np.roll(arr, o, axis=1)
        elif direction == "v":
            acc += np.roll(arr, o, axis=0)
        elif direction == "d1":
            acc += np.roll(np.roll(arr, o, axis=0), o, axis=1)
        else:
            acc += np.roll(np.roll(arr, o, axis=0), -o, axis=1)
    out = acc / len(list(offs))
    return out.astype(image.dtype)



def _pra_random_crop(image, label, crop=220):
    """pra_trans' p=0.5 random-or-center crop (needs the original-resolution
    image, so it stays on the host even under DATA_PIPE.DEVICE_AUG) — shared
    by pra_trans and the device-aug host residue so the two paths can't
    drift."""
    if random.random() < 0.5 and min(image.shape[:2]) > crop:
        h, w = image.shape[:2]
        if random.random() < 0.5:   # random crop
            i, j = random.randint(0, h - crop), random.randint(0, w - crop)
        else:                        # center crop
            i, j = (h - crop) // 2, (w - crop) // 2
        image = image[i:i + crop, j:j + crop]
        label = label[i:i + crop, j:j + crop]
    return image, label


def _pra_resize(image, label, trainsize):
    """BILINEAR image / NEAREST label resize pair to the square trainsize."""
    im = T._as_pil(image).resize((trainsize, trainsize), Image.BILINEAR)
    lb = Image.fromarray(label.astype(np.float32)).resize(
        (trainsize, trainsize), Image.NEAREST)
    return im, lb


class Augmenter:
    def __init__(self, cfg, mode: str = "train", is_source: bool = True):
        self.cfg = cfg
        self.mode = mode
        self.is_source = is_source

    def build_transform(self):
        name = self.cfg.AUG.NAME
        if self.mode == "train":
            from .device_pipe import device_aug_active
            if device_aug_active(self.cfg, self.mode):
                return self._device_stub(name)
        if name == "attn":
            return self.attn_trans()
        if name == "pra":
            return self.pra_trans()
        if name == "aspp":
            return self.aspp_trans()
        # identity (incl. "gald", "none")
        return lambda image, label: (image, label)

    def _device_stub(self, name):
        """Minimal host residue when DATA_PIPE.DEVICE_AUG moves the per-pixel
        augment math onto the device (data/device_pipe.py family pipelines):
        keep only the variable-shape geometric ops that need the pre-collate
        image — everything elementwise runs in the jitted device graph."""
        cfg = self.cfg
        if name == "pra":
            trainsize = cfg.INPUT.TRAINSIZE

            def fn(image, label):
                image, label = _pra_random_crop(np.asarray(image),
                                                np.asarray(label))
                im, lb = _pra_resize(image, label, trainsize)
                # uint8 out -> the collate /255 rule feeds the device [0,1]
                return np.asarray(im), np.asarray(lb)
            return fn
        if name == "aspp":
            scales = cfg.INPUT.INPUT_SCALES_TRAIN
            trans_list = [T.ToArray()]
            if not (scales[0] == scales[1] == 1):
                w, h = (cfg.INPUT.SOURCE_INPUT_SIZE_TRAIN if self.is_source
                        else cfg.INPUT.TARGET_INPUT_SIZE_TRAIN)
                trans_list = [T.RandomScale(scale=scales),
                              T.RandomCrop(size=(h, w), pad_if_needed=True)] + trans_list
            return T.Compose(trans_list)
        # attn / none / gald: identity — the dataset's cv2_resize still runs,
        # blur/rotate/jitter/flip ride on the device
        return lambda image, label: (image, label)

    # -- attn ---------------------------------------------------------------
    def attn_trans(self):
        cfg = self.cfg
        if self.mode != "train":
            return lambda image, label: (image, label)

        def fn(image, label):
            image = np.asarray(image)
            label = np.asarray(label)
            if random.random() > cfg.AUG.PROB:
                return image, label
            if random.random() < cfg.AUG.BLUR_PROB:
                image = _motion_blur(image, random.choice([3, 5, 7]))
            if random.random() < cfg.AUG.ROTATE_PROB:
                angle = random.uniform(-90, 90)
                im = T._as_pil(image).rotate(angle, Image.BILINEAR)
                lb = Image.fromarray(label.astype(np.float32)).rotate(angle, Image.NEAREST)
                image, label = np.asarray(im), np.asarray(lb).astype(label.dtype)
            if random.random() < cfg.AUG.JITTER_PROB:
                im, _ = T.ColorJitter(0.2, 0.2, 0.2, 0.2)(image, None)
                image = np.asarray(im)
            if random.random() < cfg.AUG.FLIP_PROB:
                d = random.choice([0, 1, -1])  # albumentations Flip codes
                if d in (0, -1):
                    image, label = image[::-1].copy(), label[::-1].copy()
                if d in (1, -1):
                    image, label = image[:, ::-1].copy(), label[:, ::-1].copy()
            return image, label
        return fn

    # -- pranet -------------------------------------------------------------
    def pra_trans(self):
        cfg = self.cfg
        trainsize = cfg.INPUT.TRAINSIZE
        mean = np.asarray((0.485, 0.456, 0.406), np.float32)
        std = np.asarray((0.229, 0.224, 0.225), np.float32)

        def fn(image, label):
            image = np.asarray(image)
            label = np.asarray(label)
            if self.mode == "train":
                k = random.randint(0, 3)
                if k:
                    image, label = np.rot90(image, k).copy(), np.rot90(label, k).copy()
                d = random.choice([0, 1, -1, None])
                if d is not None:
                    if d in (0, -1):
                        image, label = image[::-1].copy(), label[::-1].copy()
                    if d in (1, -1):
                        image, label = image[:, ::-1].copy(), label[:, ::-1].copy()
                im, _ = T.ColorJitter(0.2, 0.2, 0.2, 0.1)(image, None)
                image = np.asarray(im)
                image, label = _pra_random_crop(image, label)
            im, lb = _pra_resize(image, label, trainsize)
            image = np.asarray(im, np.float32) / 255.0
            image = (image - mean) / std
            return image.astype(np.float32), np.asarray(lb)
        return fn

    # -- aspp ---------------------------------------------------------------
    def aspp_trans(self):
        cfg = self.cfg
        if self.mode == "train":
            w, h = (cfg.INPUT.SOURCE_INPUT_SIZE_TRAIN if self.is_source
                    else cfg.INPUT.TARGET_INPUT_SIZE_TRAIN)
            trans_list = [
                T.ToArray(),
                T.Normalize(mean=cfg.INPUT.PIXEL_MEAN, std=cfg.INPUT.PIXEL_STD,
                            to_bgr255=cfg.INPUT.TO_BGR255),
            ]
            if cfg.INPUT.HORIZONTAL_FLIP_PROB_TRAIN > 0:
                trans_list = [T.RandomHorizontalFlip(cfg.INPUT.HORIZONTAL_FLIP_PROB_TRAIN)] + trans_list
            scales = cfg.INPUT.INPUT_SCALES_TRAIN
            if scales[0] == scales[1] == 1:
                trans_list = [T.Resize((h, w))] + trans_list
            else:
                trans_list = [T.RandomScale(scale=scales),
                              T.RandomCrop(size=(h, w), pad_if_needed=True)] + trans_list
            if self.is_source:
                trans_list = [T.ColorJitter(
                    brightness=cfg.INPUT.BRIGHTNESS, contrast=cfg.INPUT.CONTRAST,
                    saturation=cfg.INPUT.SATURATION, hue=cfg.INPUT.HUE)] + trans_list
            return T.Compose(trans_list)
        w, h = cfg.INPUT.INPUT_SIZE_TEST
        return T.Compose([
            T.Resize((h, w), resize_label=False),
            T.ToArray(),
            T.Normalize(mean=cfg.INPUT.PIXEL_MEAN, std=cfg.INPUT.PIXEL_STD,
                        to_bgr255=cfg.INPUT.TO_BGR255),
        ])
