"""Host-side image preprocessing with HF CLIPImageProcessor parity.

The reference repeats ``expand2square`` + ``CLIPImageProcessor.preprocess``
verbatim in six files (e.g. ``utils/data_utils_dpo.py:319-341``).  Eval
score parity is sensitive to these exact numerics (SURVEY §7), so the host
path uses PIL bicubic resize exactly like HF; golden tests compare against
``transformers.CLIPImageProcessor`` directly.

Output layout is channel-LAST float32 [H, W, 3] (the model stack is NHWC;
HF emits CHW — transposed here once, at the edge).
"""

from __future__ import annotations

import base64
import io
from typing import Optional, Tuple

import numpy as np
from PIL import Image

from opadpo_tpu.ops.image_ops import CLIP_MEAN, CLIP_STD

CROP_SIZE = 336
SHORTEST_EDGE = 336


def expand2square(pil_img: Image.Image,
                  background_color: Tuple[int, int, int]) -> Image.Image:
    """Pad to square with the CLIP mean color (reference
    data_utils_dpo.py:320-335)."""
    width, height = pil_img.size
    if width == height:
        return pil_img
    if width > height:
        result = Image.new(pil_img.mode, (width, width), background_color)
        result.paste(pil_img, (0, (width - height) // 2))
        return result
    result = Image.new(pil_img.mode, (height, height), background_color)
    result.paste(pil_img, ((height - width) // 2, 0))
    return result


def _resize_shortest_edge(img: Image.Image, target: int) -> Image.Image:
    w, h = img.size
    short, long = (w, h) if w <= h else (h, w)
    if short == target:
        return img
    new_short = target
    new_long = int(target * long / short)
    new_w, new_h = (new_short, new_long) if w <= h else (new_long, new_short)
    return img.resize((new_w, new_h), Image.BICUBIC)


def _center_crop(arr: np.ndarray, size: int) -> np.ndarray:
    h, w = arr.shape[:2]
    top = (h - size) // 2
    left = (w - size) // 2
    return arr[top:top + size, left:left + size]


def clip_preprocess(img: Image.Image, pad_to_square: bool = True,
                    size: int = CROP_SIZE) -> np.ndarray:
    """PIL image → normalized float32 [size, size, 3] (HWC)."""
    img = img.convert("RGB")
    if pad_to_square:
        bg = tuple(int(x * 255) for x in CLIP_MEAN)
        img = expand2square(img, bg)
    img = _resize_shortest_edge(img, size)
    arr = np.asarray(img, np.float32)
    arr = _center_crop(arr, size)
    arr = arr / 255.0
    mean = np.asarray(CLIP_MEAN, np.float32)
    std = np.asarray(CLIP_STD, np.float32)
    return (arr - mean) / std


def load_image(source, image_dir: Optional[str] = None) -> Image.Image:
    """Open an image from a path (under image_dir), raw bytes, or base64
    string — the three source kinds the reference datasets handle
    (data_utils_dpo.py:304-317)."""
    if isinstance(source, Image.Image):
        return source
    if isinstance(source, bytes):
        return Image.open(io.BytesIO(source))
    if isinstance(source, str):
        import os
        path = os.path.join(image_dir, source) if image_dir else source
        if os.path.exists(path):
            return Image.open(path)
        return Image.open(io.BytesIO(base64.b64decode(source.encode())))
    raise TypeError(f"unsupported image source: {type(source)}")


# ---------------------------------------------------------------------
# Unified preprocessing entry: native C++ (libjpeg + OpenMP,
# native/image_pipeline.cpp) by default for JPEG bytes, PIL otherwise.
# The native path matches PIL within mean|diff| < 0.02 normalized units
# (float separable bicubic vs Pillow fixed-point — tests/
# test_native_image.py); strict-parity evals opt out via
# --pil-preprocess / set_pil_preprocess(True) / OPADPO_PIL_PREPROCESS=1.

import os as _os

_PIL_ONLY = bool(int(_os.environ.get("OPADPO_PIL_PREPROCESS", "0")))


def set_pil_preprocess(flag: bool) -> None:
    """Force the PIL path everywhere (strict HF-numerics parity mode)."""
    global _PIL_ONLY
    _PIL_ONLY = bool(flag)


def _resolve_bytes(source, image_dir: Optional[str]) -> Optional[bytes]:
    """Raw encoded bytes for a source, or None when only a decoded
    PIL/array form exists (those take the PIL path)."""
    if isinstance(source, bytes):
        return source
    if isinstance(source, str):
        path = _os.path.join(image_dir, source) if image_dir else source
        if _os.path.exists(path):
            with open(path, "rb") as f:
                return f.read()
        try:
            return base64.b64decode(source.encode())
        except Exception:
            return None
    return None


def preprocess_images(sources, image_dir: Optional[str] = None,
                      size: int = CROP_SIZE,
                      pad_to_square: bool = True) -> np.ndarray:
    """Source list (paths / bytes / base64 / PIL) → f32 [N, size, size, 3].

    JPEG byte sources ride the native batch pipeline (one OpenMP call
    decodes + expand2squares + resizes + normalizes the whole batch —
    reference PIL loop: ``utils/data_utils_dpo.py:319-341``); everything
    else (PNG, PIL objects, pil-only mode, native build unavailable)
    falls back per-image to ``clip_preprocess``."""
    n = len(sources)
    out = np.empty((n, size, size, 3), np.float32)
    native_idx: list = []
    native_bytes: list = []
    if not _PIL_ONLY and pad_to_square:
        from opadpo_tpu.data.native_image import _is_jpeg, native_available
        if native_available():
            for i, s in enumerate(sources):
                b = _resolve_bytes(s, image_dir)
                if b is not None and _is_jpeg(b):
                    native_idx.append(i)
                    native_bytes.append(b)
    if native_bytes:
        from opadpo_tpu.data.native_image import preprocess_jpeg_batch
        sub = preprocess_jpeg_batch(native_bytes, out_size=size)
        for k, i in enumerate(native_idx):
            out[i] = sub[k]
    remaining = set(range(n)) - set(native_idx)
    for i in remaining:
        out[i] = clip_preprocess(load_image(sources[i], image_dir),
                                 pad_to_square=pad_to_square, size=size)
    return out


def preprocess_image(source, image_dir: Optional[str] = None,
                     size: int = CROP_SIZE,
                     pad_to_square: bool = True) -> np.ndarray:
    """Single-image convenience wrapper over ``preprocess_images``."""
    return preprocess_images([source], image_dir=image_dir, size=size,
                             pad_to_square=pad_to_square)[0]
