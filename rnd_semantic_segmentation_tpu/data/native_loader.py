"""ctypes bindings for the native C++ data-loader core (native/segdata.cpp).

Builds ``libsegdata.so`` on first use (g++, links libjpeg/libpng) and exposes
``load_batch(paths, size, mean, std)`` — threaded decode→bilinear-resize→
normalize straight into an NHWC float32 numpy buffer.  Falls back to PIL
transparently when the toolchain or codec libraries are unavailable, so the
framework never hard-depends on the native path.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional, Sequence, Tuple

import numpy as np

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
_SRC = os.path.join(_REPO_ROOT, "native", "segdata.cpp")
_BUILD_DIR = os.path.join(_REPO_ROOT, "native", "build")
_SO = os.path.join(_BUILD_DIR, "libsegdata.so")

_lib = None
_tried = False


def _build() -> bool:
    os.makedirs(_BUILD_DIR, exist_ok=True)
    cmd = ["g++", "-O3", "-shared", "-fPIC", _SRC, "-o", _SO,
           "-ljpeg", "-lpng", "-lpthread"]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        return True
    except Exception:
        return False


def get_lib() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    if not os.path.exists(_SO) or os.path.getmtime(_SO) < os.path.getmtime(_SRC):
        if not os.path.exists(_SRC) or not _build():
            return None
    try:
        lib = ctypes.CDLL(_SO)
    except OSError:
        return None
    lib.segdata_load_batch.restype = ctypes.c_int
    lib.segdata_load_batch.argtypes = [
        ctypes.POINTER(ctypes.c_char_p), ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
        ctypes.c_float, ctypes.c_int,
        ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_ubyte)]
    lib.segdata_decode.restype = ctypes.c_int
    lib.segdata_decode.argtypes = [
        ctypes.c_char_p, ctypes.POINTER(ctypes.c_ubyte), ctypes.c_long,
        ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
        ctypes.POINTER(ctypes.c_int)]
    lib.segdata_save_palette_png.restype = ctypes.c_int
    lib.segdata_save_palette_png.argtypes = [
        ctypes.c_char_p, ctypes.POINTER(ctypes.c_ubyte), ctypes.c_int,
        ctypes.c_int, ctypes.POINTER(ctypes.c_ubyte), ctypes.c_int]
    lib.segdata_save_palette_png_batch.restype = ctypes.c_int
    lib.segdata_save_palette_png_batch.argtypes = [
        ctypes.POINTER(ctypes.c_char_p), ctypes.POINTER(ctypes.c_ubyte),
        ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.POINTER(ctypes.c_ubyte), ctypes.c_int, ctypes.c_int,
        ctypes.POINTER(ctypes.c_ubyte)]
    _lib = lib
    return _lib


def native_available() -> bool:
    return get_lib() is not None


def load_batch(paths: Sequence[str], size: Tuple[int, int],
               mean: Sequence[float] = (0.485, 0.456, 0.406),
               std: Sequence[float] = (0.229, 0.224, 0.225),
               scale: float = 1.0 / 255.0,
               num_threads: int = 8) -> Tuple[np.ndarray, np.ndarray]:
    """Returns (batch [N,H,W,3] f32, ok [N] bool).  size = (H, W)."""
    lib = get_lib()
    h, w = int(size[0]), int(size[1])
    n = len(paths)
    out = np.zeros((n, h, w, 3), np.float32)
    okv = np.zeros((n,), np.uint8)
    if lib is None:
        return _load_batch_pil(paths, (h, w), mean, std, scale)
    arr = (ctypes.c_char_p * n)(*[p.encode() for p in paths])
    mean_a = (ctypes.c_float * 3)(*[float(m) for m in mean])
    std_a = (ctypes.c_float * 3)(*[float(s) for s in std])
    lib.segdata_load_batch(
        arr, n, h, w, mean_a, std_a, ctypes.c_float(scale), num_threads,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        okv.ctypes.data_as(ctypes.POINTER(ctypes.c_ubyte)))
    return out, okv.astype(bool)


def save_palette_png(path: str, pred: np.ndarray,
                     palette: Sequence[int]) -> bool:
    """Native fast path for writing one HxW uint8 class-id map as a P-mode
    PNG (the ``--saveres`` pseudo-label format).  Returns False when the
    native library is unavailable (caller falls back to PIL)."""
    lib = get_lib()
    if lib is None:
        return False
    pred = np.ascontiguousarray(pred, np.uint8)
    pal = np.zeros(768, np.uint8)
    flat = np.asarray(list(palette), np.uint8).ravel()
    pal[:min(len(flat), 768)] = flat[:768]
    h, w = pred.shape
    r = lib.segdata_save_palette_png(
        path.encode(), pred.ctypes.data_as(ctypes.POINTER(ctypes.c_ubyte)),
        h, w, pal.ctypes.data_as(ctypes.POINTER(ctypes.c_ubyte)), 256)
    return bool(r)


def save_palette_png_batch(paths: Sequence[str], preds: np.ndarray,
                           palette: Sequence[int],
                           num_threads: int = 8) -> np.ndarray:
    """Threaded batch export: preds [N,H,W] uint8.  Returns ok[N] bool."""
    lib = get_lib()
    n = len(paths)
    okv = np.zeros((n,), np.uint8)
    preds = np.ascontiguousarray(preds, np.uint8)
    if lib is None or n == 0:
        return okv.astype(bool)
    pal = np.zeros(768, np.uint8)
    flat = np.asarray(list(palette), np.uint8).ravel()
    pal[:min(len(flat), 768)] = flat[:768]
    arr = (ctypes.c_char_p * n)(*[p.encode() for p in paths])
    lib.segdata_save_palette_png_batch(
        arr, preds.ctypes.data_as(ctypes.POINTER(ctypes.c_ubyte)),
        n, preds.shape[1], preds.shape[2],
        pal.ctypes.data_as(ctypes.POINTER(ctypes.c_ubyte)), 256,
        num_threads, okv.ctypes.data_as(ctypes.POINTER(ctypes.c_ubyte)))
    return okv.astype(bool)


def _load_batch_pil(paths, size, mean, std, scale):
    from PIL import Image

    h, w = size
    n = len(paths)
    out = np.zeros((n, h, w, 3), np.float32)
    okv = np.zeros((n,), bool)
    mean = np.asarray(mean, np.float32)
    std = np.asarray(std, np.float32)
    for i, p in enumerate(paths):
        try:
            img = Image.open(p).convert("RGB").resize((w, h), Image.BILINEAR)
            out[i] = (np.asarray(img, np.float32) * scale - mean) / std
            okv[i] = True
        except Exception:
            pass
    return out, okv
