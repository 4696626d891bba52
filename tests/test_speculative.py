"""Speculative decoding: multi-token verify parity, exact-greedy
bit-match, acceptance machinery, and distribution exactness.

The reference has no speculative path (HF ``generate``,
``online_generator.py:292-309``); these tests define the contract:
the OUTPUT DISTRIBUTION never depends on the draft source.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from opadpo_tpu.constants import IMAGE_TOKEN_INDEX
from opadpo_tpu.engine.sampler import decode_loop_unrolled
from opadpo_tpu.engine.sampling import SamplingConfig
from opadpo_tpu.engine.speculative import (
    SpecConfig, _accept_and_correct, decode_loop_spec, warped_topk_dist,
)
from opadpo_tpu.models import llama as llama_model
from opadpo_tpu.models import llava as llava_model
from opadpo_tpu.models.llava import LlavaConfig

CFG = LlavaConfig.tiny()
CFG32 = LlavaConfig(
    dataclasses.replace(CFG.llama, dtype=jnp.float32),
    dataclasses.replace(CFG.vision, dtype=jnp.float32),
    dataclasses.replace(CFG.projector, dtype=jnp.float32))
PARAMS32 = llava_model.init_params(jax.random.PRNGKey(0), CFG32)


def _prefill(b=2, l=10):
    k1, k2 = jax.random.split(jax.random.PRNGKey(4))
    ids = jax.random.randint(k1, (b, l), 5, CFG32.llama.vocab_size)
    ids = ids.at[:, 2].set(IMAGE_TOKEN_INDEX)
    mask = jnp.ones((b, l), jnp.int32).at[1, 0].set(0)
    sz = CFG32.vision.image_size
    images = jax.random.normal(k2, (b, sz, sz, 3))
    up, _ = llava_model.unstack_for_decode(PARAMS32, None)
    pf = llava_model.prefill_unrolled(up, CFG32, ids, mask, images)
    return up, pf


def _suffix(b, n_max, n_layers):
    nkv, hd = CFG32.llama.num_kv_heads, CFG32.llama.head_dim
    return [(jnp.zeros((b, n_max, nkv, hd), jnp.float32),
             jnp.zeros((b, n_max, nkv, hd), jnp.float32))
            for _ in range(n_layers)]


def test_multi_forward_matches_sequential_bf16():
    """decode_step_multi over [t0, t1, t2] must equal three sequential
    decode_step_unrolled steps: logits per position and KV rows."""
    up, pf = _prefill()
    b = 2
    toks = jnp.array([[7, 11, 23], [9, 5, 31]], jnp.int32)
    n_layers = len(pf["kv_list"])

    suffix = _suffix(b, 8, n_layers)
    seq_logits = []
    pos = pf["next_position"]
    for j in range(3):
        lg, suffix = llava_model.decode_step_unrolled(
            up, CFG32, toks[:, j], list(pf["kv_list"]), pf["key_mask"],
            list(suffix), jnp.int32(j), pos)
        pos = pos + 1
        seq_logits.append(lg)

    suffix_m = _suffix(b, 8, n_layers)
    lg_m, suffix_m = llava_model.decode_step_multi(
        up, CFG32, toks, list(pf["kv_list"]), pf["key_mask"],
        list(suffix_m), jnp.int32(0), pf["next_position"])

    for j in range(3):
        np.testing.assert_allclose(np.asarray(lg_m[:, j]),
                                   np.asarray(seq_logits[j]),
                                   atol=2e-4, rtol=2e-4)
    for (sk_s, sv_s), (sk_m, sv_m) in zip(suffix, suffix_m):
        np.testing.assert_allclose(np.asarray(sk_m[:, :3]),
                                   np.asarray(sk_s[:, :3]),
                                   atol=2e-4, rtol=2e-4)
        np.testing.assert_allclose(np.asarray(sv_m[:, :3]),
                                   np.asarray(sv_s[:, :3]),
                                   atol=2e-4, rtol=2e-4)


def test_multi_forward_matches_sequential_kv8():
    """Same parity through the int8 prompt cache (multi-query kernel vs
    the single-query kernel)."""
    up, pf = _prefill()
    b = 2
    kv_q = llama_model.quantize_prompt_kv_list(list(pf["kv_list"]))
    toks = jnp.array([[7, 11, 23], [9, 5, 31]], jnp.int32)
    n_layers = len(kv_q)

    suffix = _suffix(b, 8, n_layers)
    seq_logits = []
    pos = pf["next_position"]
    for j in range(3):
        lg, suffix = llava_model.decode_step_unrolled(
            up, CFG32, toks[:, j], kv_q, pf["key_mask"],
            list(suffix), jnp.int32(j), pos)
        pos = pos + 1
        seq_logits.append(lg)

    suffix_m = _suffix(b, 8, n_layers)
    lg_m, _ = llava_model.decode_step_multi(
        up, CFG32, toks, kv_q, pf["key_mask"], list(suffix_m),
        jnp.int32(0), pf["next_position"])
    for j in range(3):
        np.testing.assert_allclose(np.asarray(lg_m[:, j]),
                                   np.asarray(seq_logits[j]),
                                   atol=2e-3, rtol=2e-3)


def _run_spec(sampling, spec, oracle=None, kv8=False, seed=0):
    up, pf = _prefill()
    kv = (llama_model.quantize_prompt_kv_list(list(pf["kv_list"]))
          if kv8 else list(pf["kv_list"]))
    return decode_loop_spec(
        up, CFG32, kv, pf["key_mask"], pf["next_position"],
        pf["last_logits"], jax.random.PRNGKey(seed), sampling, spec,
        oracle_tokens=oracle)


def _run_normal(sampling, kv8=False, seed=0):
    up, pf = _prefill()
    kv = (llama_model.quantize_prompt_kv_list(list(pf["kv_list"]))
          if kv8 else list(pf["kv_list"]))
    return decode_loop_unrolled(
        up, CFG32, kv, pf["key_mask"], pf["next_position"],
        pf["last_logits"], jax.random.PRNGKey(seed), sampling)


def test_spec_greedy_bitmatches_normal_greedy_any_draft():
    """Greedy speculative decoding is bit-identical to normal greedy for
    ANY draft source — wrong drafts cost acceptance, never output."""
    sampling = SamplingConfig(greedy=True, max_new_tokens=12,
                              eos_token_id=-1, pad_token_id=0)
    ref = np.asarray(_run_normal(sampling))
    for draft in ("pad", "ngram"):
        out, stats = _run_spec(sampling, SpecConfig(k=3, draft=draft))
        np.testing.assert_array_equal(np.asarray(out), ref), draft
    # kv8 variant too
    ref8 = np.asarray(_run_normal(sampling, kv8=True))
    out8, _ = _run_spec(sampling, SpecConfig(k=3, draft="pad"), kv8=True)
    np.testing.assert_array_equal(np.asarray(out8), ref8)


def test_spec_oracle_draft_accepts_and_speeds_up():
    """A perfect (oracle = the greedy continuation) draft must be fully
    accepted: far fewer groups than tokens, same output."""
    sampling = SamplingConfig(greedy=True, max_new_tokens=12,
                              eos_token_id=-1, pad_token_id=0)
    ref = np.asarray(_run_normal(sampling))
    k = 3
    oracle = jnp.asarray(np.pad(ref, ((0, 0), (0, k + 1))), jnp.int32)
    out, stats = _run_spec(sampling, SpecConfig(k=k, draft="oracle"),
                           oracle=oracle)
    np.testing.assert_array_equal(np.asarray(out), ref)
    assert int(stats["groups"]) <= -(-12 // (k + 1)) + 1
    assert int(stats["accepted_drafts"]) >= 8


def test_spec_eos_stops():
    sampling0 = SamplingConfig(greedy=True, max_new_tokens=4,
                               eos_token_id=-1, pad_token_id=0)
    probe = np.asarray(_run_normal(sampling0))
    eos = int(probe[0, 1])
    sampling = SamplingConfig(greedy=True, max_new_tokens=10,
                              eos_token_id=eos, pad_token_id=0)
    out, _ = _run_spec(sampling, SpecConfig(k=3, draft="pad"))
    row = np.asarray(out)[0]
    hits = np.nonzero(row == eos)[0]
    assert hits.size and hits[0] <= 2


def test_sampled_spec_output_distribution_is_exact():
    """MC check of the accept/resample math: for a fixed target
    distribution and an arbitrary delta draft, the emitted first token
    must be distributed exactly as the warped target (analytically
    P(out=x) = p(d)·1[x=d] + (1−p(d))·p(x)/(1−p(d)) = p(x))."""
    v = 16
    logits = jnp.asarray(
        np.random.default_rng(0).standard_normal((1, v)) * 2.0,
        jnp.float32)
    cfg = SamplingConfig(temperature=1.0, top_k=8, top_p=0.9)
    probs, idx = warped_topk_dist(logits, cfg)
    target = np.zeros(v)
    for j in range(8):
        target[int(idx[0, j])] += float(probs[0, j])

    draft = jnp.asarray([[int(idx[0, 1])]], jnp.int32)   # in-topk draft
    lg = jnp.broadcast_to(logits[:, None, :], (1, 2, v))  # G=2 (k=1)
    counts = np.zeros(v)
    n = 20000
    # vectorize the MC over one batch axis for speed
    lg_b = jnp.broadcast_to(logits[None, :, :], (n, 1, v)).reshape(n, 1, v)
    lg_b = jnp.concatenate([lg_b, lg_b], axis=1)          # [n, 2, v]
    drafts_b = jnp.broadcast_to(draft, (n, 1))
    acc, corr = _accept_and_correct(jax.random.PRNGKey(1), lg_b,
                                    drafts_b, cfg)
    emitted = np.where(np.asarray(acc[:, 0]), np.asarray(drafts_b[:, 0]),
                       np.asarray(corr[:, 0]))
    for t in emitted:
        counts[int(t)] += 1
    emp = counts / n
    np.testing.assert_allclose(emp, target, atol=0.015)

    # out-of-top-k draft: never accepted, output still exact
    oov = int(idx[0, -1])
    # find a token NOT in the top-8 set
    in_set = {int(idx[0, j]) for j in range(8)}
    oov = next(t for t in range(v) if t not in in_set)
    drafts_o = jnp.full((n, 1), oov, jnp.int32)
    acc, corr = _accept_and_correct(jax.random.PRNGKey(2), lg_b,
                                    drafts_o, cfg)
    assert not np.asarray(acc).any()
    counts = np.zeros(v)
    for t in np.asarray(corr[:, 0]):
        counts[int(t)] += 1
    np.testing.assert_allclose(counts / n, target, atol=0.015)


def test_spec_per_row_greedy_bitmatches_normal_greedy():
    """Per-row advance: greedy output is bit-identical to normal greedy
    for any draft, including across compaction boundaries (small
    compact_every forces several compactions inside 12 tokens)."""
    sampling = SamplingConfig(greedy=True, max_new_tokens=12,
                              eos_token_id=-1, pad_token_id=0)
    ref = np.asarray(_run_normal(sampling))
    for draft in ("pad", "ngram"):
        for ce in (2, 3, 32):
            out, stats = _run_spec(
                sampling, SpecConfig(k=3, draft=draft, advance="per_row",
                                     compact_every=ce))
            np.testing.assert_array_equal(np.asarray(out), ref), (draft, ce)
    ref8 = np.asarray(_run_normal(sampling, kv8=True))
    out8, _ = _run_spec(sampling,
                        SpecConfig(k=3, draft="pad", advance="per_row",
                                   compact_every=2), kv8=True)
    np.testing.assert_array_equal(np.asarray(out8), ref8)


def test_spec_per_row_advances_rows_independently():
    """A draft that is perfect for row 0 and garbage for row 1 must let
    row 0 accept full groups while row 1 crawls — the per-row token
    counts diverge (exactly what the shared-min rule cannot do) and the
    output still bit-matches normal greedy."""
    sampling = SamplingConfig(greedy=True, max_new_tokens=12,
                              eos_token_id=-1, pad_token_id=0)
    ref = np.asarray(_run_normal(sampling))
    k = 3
    oracle = np.pad(ref, ((0, 0), (0, k + 1)))
    oracle[1] = 3                              # row 1: garbage draft
    out, stats = _run_spec(
        sampling, SpecConfig(k=k, draft="oracle", advance="per_row"),
        oracle=jnp.asarray(oracle, jnp.int32))
    np.testing.assert_array_equal(np.asarray(out), ref)
    # both rows finish (tokens == max_new each), but row 0 accepted
    # drafts while row 1 accepted ~none: with per-row advance the group
    # count sits well below row-1-alone (12 groups) yet row 1 finishing
    # proves it kept decoding at its own pace
    toks = np.asarray(stats["tokens"])     # convention: e−1 (excludes
    assert toks.shape == (2,) and (toks == 11).all(), toks  # prefill tok)
    assert int(stats["accepted_drafts"]) >= 8
    # group COUNT is paced by the slowest row either way; the per-row
    # win is row 0 accepting k drafts/group while row 1 crawls — the
    # shared-min rule accepts ~nothing on this draft
    _, stats_sh = _run_spec(
        sampling, SpecConfig(k=k, draft="oracle", advance="shared"),
        oracle=jnp.asarray(oracle, jnp.int32))
    assert int(stats["accepted_drafts"]) > int(stats_sh["accepted_drafts"]) + 4, (
        int(stats["accepted_drafts"]), int(stats_sh["accepted_drafts"]))


def test_spec_per_row_sampled_matches_shared_exactness():
    """Sampled per-row spec emits from the exact warped target
    distribution — same accept/correct math as shared; here we pin that
    the loop runs and rows stop at eos independently."""
    sampling0 = SamplingConfig(greedy=True, max_new_tokens=4,
                               eos_token_id=-1, pad_token_id=0)
    probe = np.asarray(_run_normal(sampling0))
    eos = int(probe[0, 1])
    sampling = SamplingConfig(greedy=True, max_new_tokens=10,
                              eos_token_id=eos, pad_token_id=0)
    out, _ = _run_spec(sampling,
                       SpecConfig(k=3, draft="pad", advance="per_row"))
    row = np.asarray(out)[0]
    hits = np.nonzero(row == eos)[0]
    assert hits.size and hits[0] <= 2


def test_sampler_spec_flag_matches_plain_greedy():
    """Sampler(spec_k=3) greedy generate == Sampler() greedy generate."""
    from opadpo_tpu.engine.sampler import Sampler

    k1, k2 = jax.random.split(jax.random.PRNGKey(4))
    ids = jax.random.randint(k1, (2, 10), 5, CFG32.llama.vocab_size)
    ids = ids.at[:, 2].set(IMAGE_TOKEN_INDEX)
    mask = jnp.ones((2, 10), jnp.int32)
    sz = CFG32.vision.image_size
    images = jax.random.normal(k2, (2, sz, sz, 3))
    sampling = SamplingConfig(greedy=True, max_new_tokens=8,
                              eos_token_id=-1, pad_token_id=0)
    ref = Sampler(CFG32, sampling).generate(
        PARAMS32, ids, mask, images, jax.random.PRNGKey(0))
    for kv_bits in (16, 8):
        out = Sampler(CFG32, sampling, kv_bits=kv_bits, spec_k=3,
                      spec_draft="ngram").generate(
            PARAMS32, ids, mask, images, jax.random.PRNGKey(0))
        np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))
