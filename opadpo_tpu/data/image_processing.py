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
