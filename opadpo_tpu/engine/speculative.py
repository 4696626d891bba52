"""Speculative decoding (draft → one batched verify forward).

Single-token decode on this chip is HBM-bound: every step re-reads the
whole quantized base (+ prompt KV), so verifying ``k`` draft tokens in
ONE forward (``llama.decode_forward_multi`` + the multi-query Pallas
prompt kernel) costs roughly one normal step while emitting up to
``k+1`` tokens.  The reference has no equivalent (HF ``generate``,
``online_generator.py:292-309``).

Batch synchronization: every row advances by the SAME count
``n = min_b(accepted_b) + 1`` each group.  Group KV rows land at the
shared suffix pointer ``[step, step+G)``; the next group's first (carry)
token overwrites the first not-kept slot, so the suffix stays a
contiguous batch-uniform prefix — no per-row scatter, no layout churn.
A prefix of an exact speculative sample is an exact sample, and
re-drafting the rest with fresh randomness preserves the target
distribution, so the shared-min rule is distribution-exact; it is
throughput-optimal at SMALL batch (the min over B rows throttles large
B — use the per-row continuous engine there).

Acceptance rule (sampled targets): draft token ``d`` with the warped
target distribution ``p`` (identical warping to ``sample_tokens``:
temperature → top-k → top-p) is accepted w.p. ``p(d)``; on rejection the
replacement is drawn from ``p`` with ``d`` zeroed and renormalized —
for a deterministic (delta) draft proposal this leaves every output
token exactly ``p``-distributed.  Greedy targets accept iff
``d == argmax`` and correct with the argmax, which makes speculative
greedy BIT-IDENTICAL to normal greedy decoding for ANY draft (pinned by
tests/test_speculative.py).
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from opadpo_tpu.engine.sampling import SamplingConfig
from opadpo_tpu.models import llava as llava_model
from opadpo_tpu.models.llava import LlavaConfig

_NEG_INF = -1e30


def warped_topk_dist(logits: jax.Array, cfg: SamplingConfig
                     ) -> Tuple[jax.Array, jax.Array]:
    """The exact sampling distribution of ``sample_tokens`` in top-k
    space: (probs [B, K], token ids idx [B, K]).  Requires
    ``cfg.top_k > 0`` (the rollout recipe's top_k=30) or greedy."""
    assert cfg.top_k and cfg.top_k > 0, \
        "speculative sampling needs top_k > 0 or greedy"
    logits = logits.astype(jnp.float32)
    if cfg.suppress_eos:
        logits = logits.at[:, cfg.eos_token_id].set(_NEG_INF)
    logits = logits / jnp.maximum(cfg.temperature, 1e-6)
    if cfg.topk_impl == "approx":
        vals, idx = jax.lax.approx_max_k(logits, cfg.top_k,
                                         recall_target=1.0)
    else:
        vals, idx = jax.lax.top_k(logits, cfg.top_k)
    if cfg.top_p < 1.0:
        probs = jax.nn.softmax(vals, axis=-1)
        cum = jnp.cumsum(probs, axis=-1)
        keep = (cum - probs) < cfg.top_p
        vals = jnp.where(keep, vals, _NEG_INF)
    return jax.nn.softmax(vals, axis=-1), idx


def _accept_and_correct(rng, logits_g, drafts, cfg):
    """Vectorized accept/correct over one group.

    logits_g: [B, G, V] (G = k+1); drafts: [B, k].
    Returns (acc [B, k] bool — per-token accept BEFORE the leading-run
    rule, corrections [B, k+1] — the replacement token to emit at
    position j if the group stops there: residual sample for j<k,
    bonus sample for j=k)."""
    b, g, v = logits_g.shape
    k = g - 1
    if cfg.greedy:
        arg = jnp.argmax(logits_g, axis=-1).astype(jnp.int32)  # [B, G]
        acc = drafts == arg[:, :k]
        return acc, arg
    r_acc, r_fix, r_bonus = jax.random.split(rng, 3)
    flat = logits_g[:, :k].reshape(b * k, v)
    probs, idx = warped_topk_dist(flat, cfg)        # [B*k, K]
    d = drafts.reshape(b * k, 1)
    p_d = jnp.sum(probs * (idx == d), axis=-1)      # [B*k]
    u = jax.random.uniform(r_acc, (b * k,))
    acc = (u < p_d).reshape(b, k)
    # residual: p with the draft token zeroed, renormalized (categorical
    # accepts unnormalized logs; a fully-zero row cannot be selected —
    # rejection implies p_d < 1 so some other mass exists)
    resid = jnp.where(idx == d, 0.0, probs)
    local = jax.random.categorical(r_fix, jnp.log(resid + 1e-30), axis=-1)
    fix = jnp.take_along_axis(idx, local[:, None], axis=1)[:, 0]
    fix = fix.reshape(b, k).astype(jnp.int32)
    # bonus token (all k accepted): a plain sample from the last dist
    pb, ib = warped_topk_dist(logits_g[:, k], cfg)
    local_b = jax.random.categorical(r_bonus, jnp.log(pb + 1e-30), axis=-1)
    bonus = jnp.take_along_axis(ib, local_b[:, None], axis=1)[:, 0]
    corrections = jnp.concatenate(
        [fix, bonus[:, None].astype(jnp.int32)], axis=1)     # [B, k+1]
    return acc, corrections


def _ngram_drafts(out_buf, e, last_tok, k, pad_id):
    """2-gram lookup drafts: find the latest earlier occurrence of the
    last two generated tokens and propose the k tokens that followed.
    Zero device-weight cost; acceptance is workload-dependent (repeated
    phrasing).  Wrong guesses only cost acceptance, never correctness."""
    b, n = out_buf.shape
    e = jnp.broadcast_to(jnp.asarray(e, jnp.int32), (b,))  # scalar or [B]
    prev = jnp.take_along_axis(
        out_buf, jnp.maximum(e - 2, 0)[:, None], axis=1)[:, 0]
    pos = jax.lax.broadcasted_iota(jnp.int32, (b, n), 1)
    match = (out_buf == prev[:, None])
    nxt = jnp.concatenate([out_buf[:, 1:], out_buf[:, :1]], axis=1)
    match = match & (nxt == last_tok[:, None])
    match = match & (pos + 1 < (e - 1)[:, None])  # strictly earlier occ.
    score = jnp.where(match, pos, -1)
    j = jnp.argmax(score, axis=1)           # [B] match position of `prev`
    found = jnp.max(score, axis=1) >= 0
    cols = j[:, None] + 2 + jnp.arange(k)[None, :]
    cols = jnp.minimum(cols, n - 1)
    cand = jnp.take_along_axis(out_buf, cols, axis=1).astype(jnp.int32)
    return jnp.where(found[:, None], cand, jnp.int32(pad_id))


@dataclasses.dataclass(frozen=True)
class SpecConfig:
    k: int = 4                    # drafts per group (verify width k+1)
    draft: str = "ngram"          # "ngram" | "oracle" | "pad"
    advance: str = "shared"       # "shared" | "per_row"
    compact_every: int = 32       # per_row: groups between compactions


def decode_loop_spec(
    params: dict,
    cfg: LlavaConfig,
    prompt_kv_list: list,
    prompt_mask: jax.Array,
    positions: jax.Array,          # [B] position of the first new token
    last_logits: jax.Array,        # [B, V] prefill logits
    rng: jax.Array,
    sampling: SamplingConfig,
    spec: SpecConfig,
    oracle_tokens: Optional[jax.Array] = None,   # [B, >= max_new+k]
    lora: Optional[dict] = None,
    lora_scaling: float = 1.0,
    sp_used: Optional[int] = None,
    eos_id: Optional[jax.Array] = None,
    pad_id: Optional[jax.Array] = None,
    done_init: Optional[jax.Array] = None,
    max_new: Optional[int] = None,
    return_state: bool = False,
):
    """Speculative decode loop (unrolled per-layer layout, kv8/kv16
    prompt cache) → (tokens [B, max_new], stats).

    ``oracle_tokens`` serves the controlled-acceptance A/B benchmark: a
    perfect draft measures the machinery ceiling, a corrupted one any
    target acceptance rate — wrong drafts cost acceptance only (the
    output distribution is exact regardless of the draft source).

    ``spec.advance``: "shared" (batch-synchronized min-over-batch, best
    at B=1) or "per_row" (every row keeps its own accepted run — see
    ``_decode_loop_spec_per_row``; kills the min-over-batch throttle at
    B>1)."""
    if spec.advance == "per_row":
        return _decode_loop_spec_per_row(
            params, cfg, prompt_kv_list, prompt_mask, positions,
            last_logits, rng, sampling, spec,
            oracle_tokens=oracle_tokens, lora=lora,
            lora_scaling=lora_scaling, sp_used=sp_used, eos_id=eos_id,
            pad_id=pad_id, done_init=done_init, max_new=max_new,
            return_state=return_state)
    assert spec.advance == "shared", spec.advance
    assert not return_state and done_init is None and max_new is None, \
        "segment mode (continuous engine) requires advance='per_row'"
    from opadpo_tpu.models import llama as llama_model

    b = prompt_mask.shape[0]
    k = spec.k
    g = k + 1
    total = sampling.max_new_tokens
    eos = sampling.eos_token_id if eos_id is None else eos_id
    pad = sampling.pad_token_id if pad_id is None else pad_id
    n_layers = len(prompt_kv_list)
    nkv, hd = cfg.llama.num_kv_heads, cfg.llama.head_dim
    dt = cfg.llama.dtype
    # suffix sized for the worst case (every group advances by 1 but
    # writes g rows; the next group overwrites from its carry slot, so
    # only ``total + g`` rows are ever addressed)
    n_max = total + g
    suffix0 = tuple(
        (jnp.zeros((b, n_max, nkv, hd), dt),
         jnp.zeros((b, n_max, nkv, hd), dt))
        for _ in range(n_layers))

    from opadpo_tpu.engine.sampling import sample_tokens
    rng, r0 = jax.random.split(rng)
    t1 = sample_tokens(r0, last_logits, sampling)
    out0 = jnp.full((b, total + g), pad, jnp.int32)
    out0 = out0.at[:, 0].set(t1)
    done0 = t1 == eos

    def cond(state):
        e, done = state[0], state[4]
        return jnp.logical_and(e < total, jnp.logical_not(jnp.all(done)))

    def body(state):
        e, rng, suffix, positions, done, out, n_groups, n_acc = state
        rng, r_draft, r_ac = jax.random.split(rng, 3)
        last_tok = jax.lax.dynamic_slice(out, (0, e - 1), (b, 1))[:, 0]

        if spec.draft == "oracle":
            drafts = jax.lax.dynamic_slice(oracle_tokens, (0, e), (b, k))
        elif spec.draft == "ngram":
            drafts = _ngram_drafts(out, e, last_tok, k, pad)
        else:                                   # "pad": worst-case draft
            drafts = jnp.full((b, k), pad, jnp.int32)
        drafts = drafts.astype(jnp.int32)

        toks_in = jnp.concatenate([last_tok[:, None], drafts], axis=1)
        toks_in = jnp.where(done[:, None], pad, toks_in)
        logits, suffix = llava_model.decode_step_multi(
            params, cfg, toks_in, prompt_kv_list, prompt_mask,
            list(suffix), e - 1, positions, lora=lora,
            lora_scaling=lora_scaling, sp_used=sp_used)
        suffix = tuple(suffix)          # keep the carry pytree stable

        acc, corrections = _accept_and_correct(r_ac, logits, drafts,
                                               sampling)
        acc = acc | done[:, None]               # done rows never throttle
        lead = jnp.sum(jnp.cumprod(acc.astype(jnp.int32), axis=1), axis=1)
        n = jnp.min(lead) + 1                   # shared advance, 1..k+1

        # emitted token j (1-indexed): draft j while j<n; at j==n the
        # rows that rejected there take the correction, rows that
        # accepted keep their draft (both exact)
        cand = jnp.concatenate(
            [drafts, corrections[:, k:]], axis=1)       # [B, k+1]
        at_n = (lead == (n - 1))[:, None]
        jpos = jnp.arange(g)[None, :]
        take_fix = at_n & (jpos == (n - 1))
        corr_n = jnp.where(n - 1 < k,
                           jnp.take_along_axis(
                               corrections,
                               jnp.broadcast_to(n - 1, (b, 1)).astype(
                                   jnp.int32), axis=1)[:, 0],
                           corrections[:, k])
        emit = jnp.where(take_fix, corr_n[:, None], cand)
        emit = jnp.where(done[:, None], pad, emit).astype(jnp.int32)

        # eos inside the emitted prefix finishes the row; tokens past a
        # row's eos are cleaned by truncate_after_tokens on the host
        in_prefix = jpos < n
        hit_eos = jnp.any((emit == eos) & in_prefix, axis=1)
        out = jax.lax.dynamic_update_slice(out, emit, (0, e))
        done = done | hit_eos
        return (e + n, rng, suffix, positions + n, done, out,
                n_groups + 1, n_acc + n - 1)

    state = (jnp.int32(1), rng, suffix0, positions, done0, out0,
             jnp.int32(0), jnp.int32(0))
    e, _, _, _, done, out, n_groups, n_acc = jax.lax.while_loop(
        cond, body, state)
    # mask the slack columns and anything past the final count
    valid = jax.lax.broadcasted_iota(jnp.int32, out.shape, 1) < e
    out = jnp.where(valid, out, pad)[:, :total]
    stats = {"groups": n_groups, "accepted_drafts": n_acc,
             "tokens": jnp.minimum(e, total) - 1}
    return out, stats


def compact_suffix_pr(raw_list, settled_list, rawtgt):
    """One-hot-MXU compaction of accepted raw rows into the settled
    buffers.  ``rawtgt [B, Craw]`` holds each raw row's target settled
    index (the generated-token index whose KV it carries) or −1.
    Targets are unique per row, so the 0/1 einsum is an exact select
    (per-row gathers on TPU must be one-hot dots — measured rule)."""
    b, craw = rawtgt.shape
    ntot = settled_list[0][0].shape[1]
    tids = jax.lax.broadcasted_iota(jnp.int32, (b, ntot, craw), 1)
    oh = rawtgt[:, None, :] == tids                  # [B, Ntot, Craw]
    sel = jnp.any(oh, axis=2)[:, :, None, None]      # [B, Ntot, 1, 1]
    new_settled = []
    for (rk, rv), (ck, cv) in zip(raw_list, settled_list):
        ohf = oh.astype(rk.dtype)
        nk = jnp.einsum("btc,bchd->bthd", ohf, rk,
                        preferred_element_type=jnp.float32)
        nv = jnp.einsum("btc,bchd->bthd", ohf, rv,
                        preferred_element_type=jnp.float32)
        new_settled.append((jnp.where(sel, nk.astype(ck.dtype), ck),
                            jnp.where(sel, nv.astype(cv.dtype), cv)))
    return new_settled


def _decode_loop_spec_per_row(
    params: dict,
    cfg: LlavaConfig,
    prompt_kv_list: list,
    prompt_mask: jax.Array,
    positions: jax.Array,
    last_logits: jax.Array,
    rng: jax.Array,
    sampling: SamplingConfig,
    spec: SpecConfig,
    oracle_tokens: Optional[jax.Array] = None,
    lora: Optional[dict] = None,
    lora_scaling: float = 1.0,
    sp_used: Optional[int] = None,
    eos_id: Optional[jax.Array] = None,
    pad_id: Optional[jax.Array] = None,
    done_init: Optional[jax.Array] = None,
    max_new: Optional[int] = None,
    return_state: bool = False,
):
    """Per-row-advance speculative decode → (tokens [B, max_new], stats).

    Every row keeps its FULL accepted run each group (n_b = lead_b + 1)
    instead of the batch min — the shared rule throttles hard at B>1
    (measured: B=4 oracle-0.8 realized group acceptance 0.19 vs 0.62 at
    B=1).  Per-row state is masks, not layout:

    - group KV lands at shared raw slots (``(gi % C)·g``); ``rawtgt``
      records which rows each ROW accepted and where they belong;
    - every C groups the accepted rows compact into per-token settled
      buffers via one 0/1 MXU einsum (``compact_suffix_pr``);
    - emitted tokens one-hot-scatter into ``out`` at per-row offsets
      (tiny [B, g, total] select — int32 tokens, not KV).

    Distribution exactness is per-row independent: each row consumes
    its own lanes of the group RNG and its own accept/correct decision,
    identical math to the shared loop.

    SEGMENT mode (``done_init``/``max_new``/``return_state``, mirroring
    ``sampler.decode_loop_unrolled``'s chunk contract): run up to
    ``max_new`` tokens per row, then return ``(out, state)`` where
    ``state`` carries the per-token settled KV as ``suffix`` (ready for
    the continuous engine's per-row fold), ``positions`` (next-token
    RoPE position per row), ``last_logits`` (predicting each row's next
    token), and ``done``.  The in-loop verify never feeds a row's LAST
    emitted token (the next group's carry would), so segment exit runs
    one FLUSH forward — carry token only, pad drafts — to compute that
    token's KV (the engine folds it) and the next-token logits, then a
    final compaction settles every pending raw row."""
    b = prompt_mask.shape[0]
    k = spec.k
    g = k + 1
    total = max_new or sampling.max_new_tokens
    eos = sampling.eos_token_id if eos_id is None else eos_id
    pad = sampling.pad_token_id if pad_id is None else pad_id
    n_layers = len(prompt_kv_list)
    nkv, hd = cfg.llama.num_kv_heads, cfg.llama.head_dim
    dt = cfg.llama.dtype
    c_groups = spec.compact_every
    craw = c_groups * g
    raw0 = tuple((jnp.zeros((b, craw, nkv, hd), dt),
                  jnp.zeros((b, craw, nkv, hd), dt))
                 for _ in range(n_layers))
    # settled row t = generated token t's KV; the final token's KV is
    # never needed, so ``total`` rows suffice (max target = total − 2)
    settled0 = tuple((jnp.zeros((b, total, nkv, hd), dt),
                      jnp.zeros((b, total, nkv, hd), dt))
                     for _ in range(n_layers))
    rawtgt0 = jnp.full((b, craw), -1, jnp.int32)
    w0 = jnp.zeros((b,), jnp.int32)

    from opadpo_tpu.engine.sampling import sample_tokens
    rng, r0 = jax.random.split(rng)
    t1 = sample_tokens(r0, last_logits, sampling)
    if done_init is not None:
        t1 = jnp.where(done_init, pad, t1)
    out0 = jnp.full((b, total + g), pad, jnp.int32)
    out0 = out0.at[:, 0].set(t1)
    done0 = t1 == eos
    if done_init is not None:
        done0 = done0 | done_init
    e0 = jnp.ones((b,), jnp.int32)

    def cond(state):
        e, done = state[0], state[8]
        return jnp.any(jnp.logical_not(done) & (e < total))

    def body(state):
        (e, rng, raw, settled, rawtgt, w, gi, positions, done, out,
         n_acc) = state
        rng, r_draft, r_ac = jax.random.split(rng, 3)
        slot = (gi % c_groups) * g
        last_tok = jnp.take_along_axis(
            out, jnp.maximum(e - 1, 0)[:, None], axis=1)[:, 0]

        if spec.draft == "oracle":
            cols = e[:, None] + jnp.arange(k, dtype=jnp.int32)[None, :]
            drafts = jnp.take_along_axis(oracle_tokens, cols, axis=1)
        elif spec.draft == "ngram":
            drafts = _ngram_drafts(out, e, last_tok, k, pad)
        else:                                   # "pad": worst-case draft
            drafts = jnp.full((b, k), pad, jnp.int32)
        drafts = drafts.astype(jnp.int32)

        toks_in = jnp.concatenate([last_tok[:, None], drafts], axis=1)
        toks_in = jnp.where(done[:, None], pad, toks_in)
        logits, raw = llava_model.decode_step_multi_pr(
            params, cfg, toks_in, prompt_kv_list, prompt_mask,
            list(raw), list(settled), slot, rawtgt >= 0, w, positions,
            lora=lora, lora_scaling=lora_scaling, sp_used=sp_used)
        raw = tuple(raw)

        acc, corrections = _accept_and_correct(r_ac, logits, drafts,
                                               sampling)
        lead = jnp.sum(jnp.cumprod(acc.astype(jnp.int32), axis=1), axis=1)
        n = jnp.where(done, 0, jnp.minimum(lead + 1, total - e))  # [B]

        jpos = jnp.arange(g, dtype=jnp.int32)[None, :]
        in_prefix = jpos < n[:, None]
        cand = jnp.concatenate([drafts, corrections[:, k:]], axis=1)
        # row's last emitted slot takes the correction/bonus only when
        # the row actually stopped there (not when clamped by budget)
        corr_n = jnp.take_along_axis(
            corrections, jnp.clip(n - 1, 0, k)[:, None], axis=1)[:, 0]
        take_fix = ((lead == (n - 1))[:, None] & (jpos == (n - 1)[:, None])
                    & (n > 0)[:, None])
        emit = jnp.where(take_fix, corr_n[:, None], cand).astype(jnp.int32)

        hit_eos = jnp.any((emit == eos) & in_prefix, axis=1)
        # out: per-row one-hot scatter of the n_b emitted tokens (tiny)
        tgt_out = jnp.where(in_prefix, e[:, None] + jpos, -1)  # [B, g]
        ocols = jax.lax.broadcasted_iota(jnp.int32,
                                         (b, g, total + g), 2)
        oh = tgt_out[:, :, None] == ocols
        out = jnp.where(jnp.any(oh, axis=1),
                        jnp.sum(jnp.where(oh, emit[:, :, None], 0),
                                axis=1), out)
        # raw rows j = 0..n_b−1 carry KV for tokens e_b−1..e_b+n_b−2
        tgt_raw = jnp.where(in_prefix, e[:, None] - 1 + jpos, -1)
        rawtgt = jax.lax.dynamic_update_slice(rawtgt, tgt_raw, (0, slot))

        e = e + n
        positions = positions + n
        done = done | hit_eos
        gi = gi + 1
        n_acc = n_acc + jnp.sum(jnp.maximum(n - 1, 0))

        def _compact(op):
            raw_, settled_, rawtgt_, w_, e_ = op
            return (compact_suffix_pr(list(raw_), list(settled_),
                                      rawtgt_),
                    jnp.full_like(rawtgt_, -1), e_ - 1)

        def _keep(op):
            _raw, settled_, rawtgt_, w_, _e = op
            return (list(settled_), rawtgt_, w_)

        settled_l, rawtgt, w = jax.lax.cond(
            gi % c_groups == 0, _compact, _keep,
            (raw, settled, rawtgt, w, e))
        settled = tuple(settled_l)
        return (e, rng, raw, settled, rawtgt, w, gi, positions, done,
                out, n_acc)

    state = (e0, rng, raw0, settled0, rawtgt0, w0, jnp.int32(0),
             positions, done0, out0, jnp.int32(0))
    (e, _, raw, settled, rawtgt, w, gi, positions, done, out,
     n_acc) = jax.lax.while_loop(cond, body, state)
    valid = (jax.lax.broadcasted_iota(jnp.int32, out.shape, 1)
             < e[:, None])
    out_final = jnp.where(valid, out, pad)[:, :total]
    stats = {"groups": gi, "accepted_drafts": n_acc,
             "tokens": jnp.minimum(e, total) - 1}
    if not return_state:
        return out_final, stats

    # FLUSH: one carry-only forward computes (a) the last emitted
    # token's KV — the in-loop verify never feeds it, but the engine's
    # fold needs every emitted token's KV — and (b) the logits that
    # predict each row's next token (the segment-carry contract of
    # decode_loop_unrolled).  Pad drafts ride along with rawtgt −1, so
    # their KV rows stay invisible.
    last_tok = jnp.take_along_axis(
        out, jnp.maximum(e - 1, 0)[:, None], axis=1)[:, 0]
    toks_f = jnp.concatenate(
        [last_tok[:, None],
         jnp.broadcast_to(jnp.asarray(pad, jnp.int32), (b, k))], axis=1)
    slot_f = (gi % c_groups) * g
    logits_f, raw = llava_model.decode_step_multi_pr(
        params, cfg, toks_f, prompt_kv_list, prompt_mask,
        list(raw), list(settled), slot_f, rawtgt >= 0, w, positions,
        lora=lora, lora_scaling=lora_scaling, sp_used=sp_used)
    tgt_f = jnp.concatenate(
        [(e - 1)[:, None], jnp.full((b, k), -1, jnp.int32)], axis=1)
    rawtgt = jax.lax.dynamic_update_slice(rawtgt, tgt_f, (0, slot_f))
    settled = compact_suffix_pr(list(raw), list(settled), rawtgt)
    state_out = {
        "suffix": tuple(settled),
        # loop invariant: positions tracks the carry token (= the last
        # emitted one), so +1 is the next new token's RoPE position
        "positions": positions + 1,
        "last_logits": logits_f[:, 0].astype(jnp.float32),
        "done": done,
        "emitted": jnp.minimum(e, total),     # per-row tokens in `out`
    }
    return out_final, state_out, stats
