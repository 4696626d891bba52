"""ctypes binding for the native C++ image pipeline
(``native/image_pipeline.cpp``), with build-on-first-use and a PIL
fallback.

Usage:
    from opadpo_tpu.data.native_image import preprocess_jpeg_batch
    arrs = preprocess_jpeg_batch([jpeg_bytes, ...], out_size=336)

Falls back transparently to the PIL path (``image_processing.py``) when
the toolchain or libjpeg is unavailable, or when an image is not a JPEG
(PNG etc.).
"""

from __future__ import annotations

import ctypes
import io
import os
import subprocess
import threading
from typing import List, Optional

import numpy as np

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
_NATIVE_DIR = os.path.join(_REPO_ROOT, "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "libopadpo_image.so")

_lib = None
_lib_lock = threading.Lock()
_build_failed = False


def _load_library() -> Optional[ctypes.CDLL]:
    global _lib, _build_failed
    if _lib is not None:
        return _lib
    if _build_failed:
        return None
    with _lib_lock:
        if _lib is not None:
            return _lib
        try:
            if not os.path.exists(_LIB_PATH):
                subprocess.run(["make", "-C", _NATIVE_DIR],
                               check=True, capture_output=True)
            lib = ctypes.CDLL(_LIB_PATH)
            lib.opadpo_preprocess_rgb.restype = ctypes.c_int
            lib.opadpo_preprocess_rgb.argtypes = [
                ctypes.POINTER(ctypes.c_uint8), ctypes.c_int, ctypes.c_int,
                ctypes.c_int, ctypes.POINTER(ctypes.c_float)]
            lib.opadpo_preprocess_jpeg.restype = ctypes.c_int
            lib.opadpo_preprocess_jpeg.argtypes = [
                ctypes.POINTER(ctypes.c_uint8), ctypes.c_size_t,
                ctypes.c_int, ctypes.POINTER(ctypes.c_float)]
            lib.opadpo_preprocess_jpeg_batch.restype = None
            lib.opadpo_preprocess_jpeg_batch.argtypes = [
                ctypes.POINTER(ctypes.POINTER(ctypes.c_uint8)),
                ctypes.POINTER(ctypes.c_size_t), ctypes.c_int, ctypes.c_int,
                ctypes.POINTER(ctypes.c_float),
                ctypes.POINTER(ctypes.c_int)]
            _lib = lib
            return _lib
        except Exception as e:
            print(f"native image pipeline unavailable ({e}); using PIL")
            _build_failed = True
            return None


def native_available() -> bool:
    return _load_library() is not None


def preprocess_rgb(rgb: np.ndarray, out_size: int = 336
                   ) -> Optional[np.ndarray]:
    """u8 [H, W, 3] → normalized f32 [out, out, 3]; None if unavailable."""
    lib = _load_library()
    if lib is None:
        return None
    rgb = np.ascontiguousarray(rgb, np.uint8)
    h, w = rgb.shape[:2]
    out = np.empty((out_size, out_size, 3), np.float32)
    rc = lib.opadpo_preprocess_rgb(
        rgb.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), h, w, out_size,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)))
    return out if rc == 0 else None


def _is_jpeg(data: bytes) -> bool:
    return len(data) > 3 and data[:3] == b"\xff\xd8\xff"


def preprocess_jpeg_batch(jpegs: List[bytes], out_size: int = 336
                          ) -> np.ndarray:
    """Batch JPEG decode+preprocess (OpenMP); PIL fallback per image."""
    lib = _load_library()
    n = len(jpegs)
    outs = np.empty((n, out_size, out_size, 3), np.float32)

    if lib is not None:
        jpeg_idx = [i for i, d in enumerate(jpegs) if _is_jpeg(d)]
        if jpeg_idx:
            bufs = [np.frombuffer(jpegs[i], np.uint8) for i in jpeg_idx]
            ptrs = (ctypes.POINTER(ctypes.c_uint8) * len(jpeg_idx))(
                *[b.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))
                  for b in bufs])
            lens = (ctypes.c_size_t * len(jpeg_idx))(
                *[len(jpegs[i]) for i in jpeg_idx])
            sub = np.empty((len(jpeg_idx), out_size, out_size, 3),
                           np.float32)
            statuses = (ctypes.c_int * len(jpeg_idx))()
            lib.opadpo_preprocess_jpeg_batch(
                ptrs, lens, len(jpeg_idx), out_size,
                sub.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), statuses)
            for k, i in enumerate(jpeg_idx):
                if statuses[k] == 0:
                    outs[i] = sub[k]
                else:
                    outs[i] = _pil_one(jpegs[i], out_size)
        for i, d in enumerate(jpegs):
            if not _is_jpeg(d):
                outs[i] = _pil_one(d, out_size)
        return outs

    for i, d in enumerate(jpegs):
        outs[i] = _pil_one(d, out_size)
    return outs


def _pil_one(data: bytes, out_size: int) -> np.ndarray:
    from PIL import Image
    from opadpo_tpu.data.image_processing import clip_preprocess
    return clip_preprocess(Image.open(io.BytesIO(data)), size=out_size)
