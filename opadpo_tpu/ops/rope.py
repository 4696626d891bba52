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


def _rotate_half(x):
    half = x.shape[-1] // 2
    x1, x2 = x[..., :half], x[..., half:]
    return jnp.concatenate([-x2, x1], axis=-1)


def apply_rope(q, k, cos_table, sin_table, positions):
    """Apply RoPE.

    q, k: [B, S, H, D]; positions: [B, S] int32; tables: [max_len, D].
    """
    cos = cos_table[positions][:, :, None, :]   # [B, S, 1, D]
    sin = sin_table[positions][:, :, None, :]
    q_dtype, k_dtype = q.dtype, k.dtype
    q32, k32 = q.astype(jnp.float32), k.astype(jnp.float32)
    cos32, sin32 = cos.astype(jnp.float32), sin.astype(jnp.float32)
    q_out = q32 * cos32 + _rotate_half(q32) * sin32
    k_out = k32 * cos32 + _rotate_half(k32) * sin32
    return q_out.astype(q_dtype), k_out.astype(k_dtype)
