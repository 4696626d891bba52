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


# ---------------------------------------------------------------------------
# Chunked lm_head readout: logprobs/entropy without [N, S, V] logits
# ---------------------------------------------------------------------------
#
# Materializing full-vocab f32 logits ([3B, R, V] in DPO scoring — ~330 MB
# per batch row at 7B) caps the batch size: round-1 measurements showed B=2/4
# REGRESSING vs B=1 from logits-buffer memory pressure.  This readout streams
# the lm_head matmul over vocab chunks with a running (max, sumexp) merge, so
# peak extra memory is one [N, S, chunk] block.  Gradients flow to ``hidden``
# (and an optional lm_head LoRA) via autodiff with a rematerialized chunk
# body — only the [N, S] carries are saved for the backward pass.


def chunked_logprobs(
    hidden: jax.Array,          # [N, S, D]
    lm_head: jax.Array,         # [D, V]
    labels: jax.Array,          # [N, S] int
    ignore_index: int,
    temperature: float = 1.0,
    with_entropy: bool = False,
    head_lora=None,             # optional {"a": [D, r], "b": [r, V]}
    lora_scaling: float = 1.0,
    chunk_size: int = 2000,     # divides the LLaMA vocab (32000) exactly
):
    """Per-token ``log p(label)`` (and optionally entropy, in nats) of
    ``softmax(hidden @ lm_head / temperature)``.

    Returns ``(logprobs [N, S], entropy [N, S] | None)``; logprob is 0 where
    ``label == ignore_index`` (reference cross_entropy ``ignore_index``
    semantics, ``utils/common_utils.py:112-118``).
    """
    n, s, d = hidden.shape
    v = lm_head.shape[1]
    vc = min(chunk_size, v)
    nc = -(-v // vc)
    vp = nc * vc
    padded = vp != v

    w = lm_head
    b_full = None
    ha = None
    if head_lora is not None:
        ha = jnp.einsum("nsd,dr->nsr", hidden, head_lora["a"],
                        preferred_element_type=jnp.float32
                        ).astype(head_lora["b"].dtype)
        b_full = head_lora["b"]
    if padded:
        w = jnp.pad(w, ((0, 0), (0, vp - v)))
        if b_full is not None:
            b_full = jnp.pad(b_full, ((0, 0), (0, vp - v)))

    inv_t = 1.0 / temperature
    neg_big = jnp.float32(-1e30)

    def body(carry, c):
        m, acc_s, acc_t, picked = carry
        start = c * vc
        w_c = jax.lax.dynamic_slice(w, (0, start), (d, vc))
        logits = jnp.einsum("nsd,dv->nsv", hidden, w_c,
                            preferred_element_type=jnp.float32)
        if b_full is not None:
            b_c = jax.lax.dynamic_slice(b_full, (0, start),
                                        (b_full.shape[0], vc))
            logits = logits + jnp.einsum(
                "nsr,rv->nsv", ha, b_c,
                preferred_element_type=jnp.float32) * lora_scaling
        logits = logits * inv_t
        if padded:
            col = start + jax.lax.broadcasted_iota(jnp.int32, (vc,), 0)
            logits = jnp.where(col[None, None, :] < v, logits, neg_big)

        local = labels - start
        in_range = jnp.logical_and(local >= 0, local < vc)
        p_c = jnp.take_along_axis(
            logits, jnp.clip(local, 0, vc - 1)[..., None], axis=-1)[..., 0]
        picked = picked + jnp.where(in_range, p_c, 0.0)

        m_c = jnp.max(logits, axis=-1)
        e = jnp.exp(logits - m_c[..., None])
        s_c = jnp.sum(e, axis=-1)
        m_new = jnp.maximum(m, m_c)
        scale_old = jnp.exp(m - m_new)
        scale_new = jnp.exp(m_c - m_new)
        acc_s = acc_s * scale_old + s_c * scale_new
        if with_entropy:
            t_c = jnp.sum(e * logits, axis=-1)
            acc_t = acc_t * scale_old + t_c * scale_new
        return (m_new, acc_s, acc_t, picked), None

    zeros = jnp.zeros((n, s), jnp.float32)
    init = (jnp.full((n, s), neg_big), zeros, zeros, zeros)
    (m, acc_s, acc_t, picked), _ = jax.lax.scan(
        jax.checkpoint(body), init, jnp.arange(nc))

    logz = m + jnp.log(acc_s)
    lp = jnp.where(labels == ignore_index, 0.0, picked - logz)
    entropy = None
    if with_entropy:
        entropy = logz - acc_t / acc_s
    return lp, entropy
