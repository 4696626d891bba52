"""Token-sampling primitives (temperature / top-k / top-p / greedy).

Replaces the HF ``generate`` logits processors the reference drives with
``top_k=30, top_p=0.95, temperature=1.0`` for rollout
(``run/online_generate.sh:75-77,115-116``) and plain temperature sampling
(``top_p=1.0, top_k=0``) inside DPO ``_respond`` (``rl_models.py:178-180``).
All ops are static-shape and sort-based → MXU/VPU friendly under jit.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

_NEG_INF = -1e30


@dataclasses.dataclass(frozen=True)
class SamplingConfig:
    temperature: float = 1.0
    top_k: int = 0              # 0 = disabled
    top_p: float = 1.0          # 1.0 = disabled
    greedy: bool = False
    topk_impl: str = "sort"     # "sort" = lax.top_k; "approx" =
    # lax.approx_max_k(recall_target=1.0) — same exact top-k set (TPU
    # PartialReduce lowering, avoids the 32000-wide sort each step;
    # may reorder TIES, which leaves the sampling distribution
    # unchanged).  Flag exists for on-chip A/B.
    suppress_eos: bool = False  # reference suppress_tokens=[eos]
    eos_token_id: int = 2
    pad_token_id: int = 0
    max_new_tokens: int = 896

    def __post_init__(self):
        if self.topk_impl not in ("sort", "approx"):
            raise ValueError(f"topk_impl={self.topk_impl!r} "
                             "(expected 'sort' or 'approx')")


def sample_tokens(rng: jax.Array, logits: jax.Array,
                  cfg: SamplingConfig) -> jax.Array:
    """logits [B, V] → token ids [B]."""
    logits = logits.astype(jnp.float32)
    if cfg.suppress_eos:
        logits = logits.at[:, cfg.eos_token_id].set(_NEG_INF)
    if cfg.greedy:
        return jnp.argmax(logits, axis=-1).astype(jnp.int32)

    logits = logits / jnp.maximum(cfg.temperature, 1e-6)

    if cfg.top_k and cfg.top_k > 0:
        # Everything below the k-th logit is filtered anyway, so do the
        # top-p warp AND the categorical draw in the k-wide space (k=30 in
        # the rollout recipe) — the full-vocab variant paid a 32000-wide
        # sort per decode step.  Distribution is identical: softmax over
        # the top-k filtered logits == softmax over the top-k values.
        if cfg.topk_impl == "approx":
            vals, idx = jax.lax.approx_max_k(logits, cfg.top_k,
                                             recall_target=1.0)
        else:
            vals, idx = jax.lax.top_k(logits, cfg.top_k)  # sorted desc
        if cfg.top_p < 1.0:
            probs = jax.nn.softmax(vals, axis=-1)
            cum = jnp.cumsum(probs, axis=-1)
            # HF TopPLogitsWarper semantics: keep the minimal prefix whose
            # cumulative mass reaches top_p (the crossing token included).
            keep = (cum - probs) < cfg.top_p
            vals = jnp.where(keep, vals, _NEG_INF)
        local = jax.random.categorical(rng, vals, axis=-1)
        return jnp.take_along_axis(idx, local[:, None], axis=1)[:, 0].astype(
            jnp.int32)

    if cfg.top_p < 1.0:
        sorted_logits = jnp.sort(logits, axis=-1)[:, ::-1]
        probs = jax.nn.softmax(sorted_logits, axis=-1)
        cum = jnp.cumsum(probs, axis=-1)
        keep = (cum - probs) < cfg.top_p                 # [B, V] sorted space
        threshold = jnp.min(
            jnp.where(keep, sorted_logits, jnp.inf), axis=-1, keepdims=True)
        logits = jnp.where(logits >= threshold, logits, _NEG_INF)

    return jax.random.categorical(rng, logits, axis=-1).astype(jnp.int32)
