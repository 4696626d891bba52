"""Image-side device ops: CLIP normalization and the CoPO masking family.

The reference's CoPO builds "vision-degraded" inputs three ways
(``dpo_trainer.py:83-125,294-323``):

- ``random``: mask int(H*W*ratio) random pixels to the image mean,
- ``blockwise``: mask random 14x14 blocks to the image mean,
- ``attention``: keep pixels, mask int(576*ratio) random image *patches*
  out of the attention mask instead.

There these run on host in torch; here they are jitted JAX ops on device
(a [B,336,336,3] batch never round-trips to host mid-step).  Exact-count
masking uses a sort-derived threshold over uniform noise — same
distribution as torch.randperm selection.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

# HF CLIPImageProcessor constants (openai/clip-vit-large-patch14-336)
CLIP_MEAN = (0.48145466, 0.4578275, 0.40821073)
CLIP_STD = (0.26862954, 0.26130258, 0.27577711)


def normalize_images(images: jax.Array) -> jax.Array:
    """[B, H, W, 3] float in [0,1] → CLIP-normalized."""
    mean = jnp.asarray(CLIP_MEAN, images.dtype)
    std = jnp.asarray(CLIP_STD, images.dtype)
    return (images - mean) / std


def preprocess_images_device(
    images: jax.Array,            # [B, H, W, 3] uint8 or float in [0, 255]
    out_size: int = 336,
) -> jax.Array:
    """Fused on-device preprocess: expand2square (CLIP mean background) →
    bicubic resize → normalize, all in one jitted program (SURVEY §2.10:
    the device-side replacement for the reference's PIL pipeline when raw
    frames already live on device — e.g. streaming rollout input).

    Matches the host path (data/image_processing.clip_preprocess) within
    resampler tolerance: jax.image bicubic vs Pillow's fixed-point bicubic
    differ by a few /255 per pixel, which the CLIP tower is insensitive to
    (the exact-parity host path remains the default for eval).
    """
    b, h, w, c = images.shape
    x = images.astype(jnp.float32)
    side = max(h, w)
    bg = jnp.asarray(CLIP_MEAN, jnp.float32) * 255.0
    canvas = jnp.broadcast_to(bg, (b, side, side, c))
    off_y, off_x = (side - h) // 2, (side - w) // 2
    x = jax.lax.dynamic_update_slice(canvas, x, (0, off_y, off_x, 0))
    x = jax.image.resize(x, (b, out_size, out_size, c), method="bicubic")
    x = jnp.clip(x, 0.0, 255.0) / 255.0
    mean = jnp.asarray(CLIP_MEAN, jnp.float32)
    std = jnp.asarray(CLIP_STD, jnp.float32)
    return (x - mean) / std


def _exact_count_mask(rng: jax.Array, n: int, count: int) -> jax.Array:
    """Boolean [n] with exactly ``count`` True, uniformly at random."""
    noise = jax.random.uniform(rng, (n,))
    if count <= 0:
        return jnp.zeros((n,), bool)
    threshold = jnp.sort(noise)[count - 1]
    return noise <= threshold


def mask_images_random(rng: jax.Array, images: jax.Array, ratio: float
                       ) -> jax.Array:
    """Per-image: int(H*W*ratio) random pixels → per-image mean value
    (all channels share the pixel selection and the scalar mean, matching
    reference ``mask_single_image`` 'random')."""
    b, h, w, c = images.shape
    count = int(h * w * ratio)

    def one(rng, img):
        mean = jnp.mean(img)
        m = _exact_count_mask(rng, h * w, count).reshape(h, w, 1)
        return jnp.where(m, mean.astype(img.dtype), img)

    return jax.vmap(one)(jax.random.split(rng, b), images)


def mask_images_blockwise(rng: jax.Array, images: jax.Array, ratio: float,
                          block_size: int = 14) -> jax.Array:
    """Per-image: int(num_blocks*ratio) random block columns/rows of
    ``block_size`` → image mean (reference 'blockwise')."""
    b, h, w, c = images.shape
    hb, wb = h // block_size, w // block_size
    count = int(hb * wb * ratio)

    def one(rng, img):
        mean = jnp.mean(img)
        m = _exact_count_mask(rng, hb * wb, count).reshape(hb, 1, wb, 1, 1)
        m = jnp.broadcast_to(m, (hb, block_size, wb, block_size, c))
        m = m.reshape(h, w, c)
        return jnp.where(m, mean.astype(img.dtype), img)

    return jax.vmap(one)(jax.random.split(rng, b), images)


def mask_patches_per_row(rng: jax.Array, batch: int, num_patches: int,
                         ratio: float) -> jax.Array:
    """[B, num_patches] validity mask with exactly int(num_patches*ratio)
    zeros per row (reference ``mask_percentage_per_row``, used by the
    'attention' CoPO method and the OPA entropy loss)."""
    count = int(num_patches * ratio)

    def one(rng):
        return jnp.logical_not(_exact_count_mask(rng, num_patches, count))

    return jax.vmap(one)(jax.random.split(rng, batch)).astype(jnp.int32)
