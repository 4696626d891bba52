"""Rotary position embeddings (LLaMA flavor).

Matches HF LLaMA numerics: pairs are (x[..., :d/2], x[..., d/2:]) rotated by
angles theta_i = base^(-2i/d), positions supplied explicitly so left-padded
batches work (position_ids = cumsum(mask)-1, as LLaVA's
``prepare_inputs_for_generation`` computes them).
"""

from __future__ import annotations

import jax.numpy as jnp


def rope_frequencies(head_dim: int, max_len: int, base: float = 10000.0,
                     dtype=jnp.float32):
    """Precompute cos/sin tables [max_len, head_dim]."""
    inv_freq = 1.0 / (base ** (jnp.arange(0, head_dim, 2, dtype=jnp.float32) / head_dim))
    t = jnp.arange(max_len, dtype=jnp.float32)
    freqs = jnp.outer(t, inv_freq)              # [max_len, head_dim/2]
    emb = jnp.concatenate([freqs, freqs], axis=-1)
    return jnp.cos(emb).astype(dtype), jnp.sin(emb).astype(dtype)


def apply_rope(q, k, cos_table, sin_table, positions):
    """Apply RoPE.

    q, k: [B, S, H, D]; positions: [B, S] int32; tables: [max_len, D].

    Same math as HF's ``q*cos + rotate_half(q)*sin`` (the cos/sin tables
    repeat their half, so only the first half is gathered), but expressed
    as one split-multiply-concat expression per tensor so XLA emits a
    single fusion — the negate+concat form cost ~120 ms per 7B forward in
    separate slice_negate fusions (profiled on v5e).
    """
    half = q.shape[-1] // 2
    cos_h = cos_table[positions][:, :, None, :half].astype(jnp.float32)
    sin_h = sin_table[positions][:, :, None, :half].astype(jnp.float32)

    def rot(x):
        x32 = x.astype(jnp.float32)
        x1, x2 = x32[..., :half], x32[..., half:]
        return jnp.concatenate(
            [x1 * cos_h - x2 * sin_h, x2 * cos_h + x1 * sin_h],
            axis=-1).astype(x.dtype)

    return rot(q), rot(k)
