"""Per-token logprob / entropy math.

Reference numerics to preserve (SURVEY §2.2):
- per-token logprobs = ``-cross_entropy(logits, labels, reduction='none',
  ignore_index=pad)`` (reference ``utils/common_utils.py:112-118``), then
  multiplied by ``response != pad`` (``rl_models.py:112,127``).  Positions
  whose label equals the ignore index contribute exactly 0.
- entropies = ``-(softmax * log_softmax).sum(-1)`` of temperature-scaled
  logits (``rl_models.py:128``), also masked.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def per_token_logprobs(logits: jax.Array, labels: jax.Array,
                       ignore_index: int) -> jax.Array:
    """log p(labels | logits) per position; 0 where label == ignore_index.

    logits: [..., S, V] (any float dtype; computed in f32), labels: [..., S].
    """
    logits = logits.astype(jnp.float32)
    logz = jax.nn.logsumexp(logits, axis=-1)
    safe_labels = jnp.where(labels == ignore_index, 0, labels)
    picked = jnp.take_along_axis(
        logits, safe_labels[..., None], axis=-1
    )[..., 0]
    lp = picked - logz
    return jnp.where(labels == ignore_index, 0.0, lp)


def per_token_entropy(logits: jax.Array) -> jax.Array:
    """Entropy of softmax(logits) per position, in nats. [..., S, V] → [..., S]."""
    logits = logits.astype(jnp.float32)
    logp = jax.nn.log_softmax(logits, axis=-1)
    p = jnp.exp(logp)
    return -jnp.sum(p * logp, axis=-1)


def masked_mean(x: jax.Array, mask: jax.Array, axis=None) -> jax.Array:
    """Mean of x over mask (reference utils.trainer_utils masked_mean)."""
    mask = mask.astype(x.dtype)
    return jnp.sum(x * mask, axis=axis) / jnp.maximum(jnp.sum(mask, axis=axis), 1e-9)
