"""Continuous (slot-pool) batching engine: per-row isolation, slot
reuse, EOS slot-freeing, and ground-truth greedy parity on the tiny
model.  (The reference has no serving path at all — HF ``generate`` is
batch-synchronous — so these tests define the behavior contract.)"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from opadpo_tpu.constants import IMAGE_TOKEN_INDEX
from opadpo_tpu.engine.continuous import ContinuousEngine
from opadpo_tpu.engine.sampler import Sampler
from opadpo_tpu.engine.sampling import SamplingConfig
from opadpo_tpu.models import llava as llava_model
from opadpo_tpu.models.llava import LlavaConfig

CFG = LlavaConfig.tiny()
# f32 everywhere: bf16 eager-vs-jit rounding flips argmax on the
# near-uniform tiny model (same choice as test_sampler)
CFG32 = LlavaConfig(
    dataclasses.replace(CFG.llama, dtype=jnp.float32),
    dataclasses.replace(CFG.vision, dtype=jnp.float32),
    dataclasses.replace(CFG.projector, dtype=jnp.float32))
PARAMS32 = llava_model.init_params(jax.random.PRNGKey(0), CFG32)
QLEN = 10


def _request(seed: int):
    k1, k2 = jax.random.split(jax.random.PRNGKey(seed))
    ids = np.array(jax.random.randint(k1, (QLEN,), 5,
                                      CFG32.llama.vocab_size))
    ids[2] = IMAGE_TOKEN_INDEX
    mask = np.ones((QLEN,), np.int32)
    sz = CFG32.vision.image_size
    image = np.asarray(jax.random.normal(k2, (sz, sz, 3)), np.float32)
    return ids, mask, image


def _engine(max_batch: int, max_new: int, seg_len: int, eos: int = -1,
            kv_bits: int = 8, spec_k: int = 0, spec_draft: str = "ngram"):
    sampling = SamplingConfig(greedy=True, max_new_tokens=max_new,
                              eos_token_id=eos, pad_token_id=0)
    params, _ = Sampler(CFG32, sampling,
                        kv_bits=kv_bits).prepare_params(PARAMS32)
    return ContinuousEngine(CFG32, sampling, params, max_batch=max_batch,
                            qlen=QLEN, seg_len=seg_len, kv_bits=kv_bits,
                            spec_k=spec_k, spec_draft=spec_draft,
                            collect_spec_stats=bool(spec_k))


def _run_all(eng):
    done = {}
    for _ in range(200):
        if not eng.has_work():
            break
        for rid, toks in eng.step():
            done[rid] = toks
    assert not eng.has_work()
    return done


def _naive_greedy(ids, mask, image, n_new):
    """Ground truth: rerun the full forward per step, argmax."""
    cur_ids = jnp.asarray(ids)[None]
    cur_mask = jnp.asarray(mask)[None]
    img = jnp.asarray(image)[None]
    out = []
    for _ in range(n_new):
        o = llava_model.forward(PARAMS32, CFG32, cur_ids, cur_mask, img,
                                remat=False)
        nxt = jnp.argmax(o["logits"][:, -1, :], axis=-1).astype(jnp.int32)
        out.append(int(nxt[0]))
        cur_ids = jnp.concatenate([cur_ids, nxt[:, None]], axis=1)
        cur_mask = jnp.concatenate(
            [cur_mask, jnp.ones((1, 1), jnp.int32)], axis=1)
    return np.asarray(out, np.int32)


def test_single_request_matches_naive_greedy():
    """One request through segments+folds equals full-forward greedy
    (int8 KV rounding does not flip argmax on the f32 tiny model —
    same tolerance contract as test_int8_prompt_kv_decode)."""
    ids, mask, image = _request(7)
    eng = _engine(max_batch=2, max_new=6, seg_len=2)
    rid = eng.add_request(ids, mask, image)
    done = _run_all(eng)
    np.testing.assert_array_equal(done[rid],
                                  _naive_greedy(ids, mask, image, 6))


def test_slot_isolation_and_reuse():
    """4 requests through a 2-slot pool: every request's tokens must be
    bitwise identical to running it alone through the engine — neighbors
    in other slots and slot reuse must not leak."""
    reqs = [_request(s) for s in (11, 12, 13, 14)]
    solo = {}
    for i, (ids, mask, image) in enumerate(reqs):
        eng = _engine(max_batch=2, max_new=4, seg_len=2)
        rid = eng.add_request(ids, mask, image)
        solo[i] = _run_all(eng)[rid]

    eng = _engine(max_batch=2, max_new=4, seg_len=2)
    rids = [eng.add_request(*r) for r in reqs]
    done = _run_all(eng)
    assert len(done) == 4
    for i, rid in enumerate(rids):
        np.testing.assert_array_equal(done[rid], solo[i], err_msg=f"req {i}")


def test_staggered_admission_matches_solo():
    """A request admitted mid-stream (after another request's segments
    already advanced the pool) still matches its solo run."""
    r1, r2 = _request(21), _request(22)
    eng = _engine(max_batch=2, max_new=6, seg_len=2)
    rid1 = eng.add_request(*r1)
    eng.step()                      # r1 runs a segment alone
    rid2 = eng.add_request(*r2)     # r2 admitted into the running pool
    done = _run_all(eng)
    done.setdefault(rid1, None)

    solo2 = _engine(max_batch=2, max_new=6, seg_len=2)
    srid = solo2.add_request(*r2)
    np.testing.assert_array_equal(done[rid2], _run_all(solo2)[srid])


def test_eos_frees_slot_and_budget_cap():
    """EOS finishes a request early (tokens end at EOS) and the freed
    slot serves a queued request; a never-EOS request stops at the cap,
    including a cap that is not a multiple of seg_len."""
    ids, mask, image = _request(31)
    probe = _engine(max_batch=1, max_new=3, seg_len=2)
    prid = probe.add_request(ids, mask, image)
    first = int(_run_all(probe)[prid][1])   # 2nd greedy token → EOS below

    eng = _engine(max_batch=1, max_new=5, seg_len=2, eos=first)
    rid1 = eng.add_request(ids, mask, image)
    other = _request(32)
    rid2 = eng.add_request(*other)          # queued: pool is 1 slot
    done = _run_all(eng)
    # EOS ends the response (the chosen id may also be sampled earlier
    # than step 1 — only the termination contract is asserted)
    assert done[rid1].shape[0] <= 2 and done[rid1][-1] == first
    assert rid2 in done                     # slot was reused

    # cap=5 with seg_len=2: final segment keeps only 1 token
    eng2 = _engine(max_batch=1, max_new=5, seg_len=2)
    r = eng2.add_request(*_request(33))
    out = _run_all(eng2)[r]
    assert out.shape[0] == 5


def test_int4_engine_matches_naive_and_solo():
    """kv_bits=4 slot pool (packed int4 cache, nibble-wise per-row fold):
    a single request matches full-forward greedy, and staggered pool
    requests bitwise match their solo runs."""
    ids, mask, image = _request(61)
    eng = _engine(max_batch=2, max_new=6, seg_len=2, kv_bits=4)
    rid = eng.add_request(ids, mask, image)
    eng.step()                                   # r1 advances alone
    other = _request(62)
    rid2 = eng.add_request(*other)               # admitted mid-stream
    done = _run_all(eng)
    np.testing.assert_array_equal(done[rid],
                                  _naive_greedy(ids, mask, image, 6))
    solo = _engine(max_batch=1, max_new=6, seg_len=2, kv_bits=4)
    srid = solo.add_request(*other)
    np.testing.assert_array_equal(done[rid2], _run_all(solo)[srid])


def test_per_row_fold_int4_arbitrary_offsets():
    """The nibble-wise int4 per-row fold writes each row at an ARBITRARY
    (unaligned, distinct) offset: folded positions must dequantize to the
    suffix's own int4 quantization, untouched positions must be
    preserved bit-exactly, and the mask must extend per row."""
    from opadpo_tpu.engine.continuous import fold_suffix_per_row_int4
    from opadpo_tpu.models import llama as llama_model

    rng = np.random.default_rng(5)
    b, h, hd, nseg, s_total = 2, 3, 8, 128, 512
    kv_prompt = jnp.asarray(rng.standard_normal((b, 300, h, hd)),
                            jnp.float32)
    pk = llama_model.quantize_prompt_kv_int4(kv_prompt, total_len=s_total)
    suffix = jnp.asarray(rng.standard_normal((b, nseg, h, hd)), jnp.float32)
    row_len = jnp.asarray([157, 300], jnp.int32)     # unaligned + odd mix
    n_valid = jnp.asarray([33, 70], jnp.int32)
    pm = (jax.lax.broadcasted_iota(jnp.int32, (b, s_total), 1)
          < row_len[:, None]).astype(jnp.int32)

    new_kv, new_pm = fold_suffix_per_row_int4(
        [(jax.tree_util.tree_map(jnp.copy, pk),
          jax.tree_util.tree_map(jnp.copy, pk))],
        [(suffix, suffix)], pm, row_len, n_valid)

    ref_vals = llama_model.quantize_prompt_kv_int4_values(suffix)
    exp = np.asarray(ref_vals["qv"], np.float64) \
        * np.asarray(ref_vals["scale"])[..., None]
    for got in new_kv[0]:
        deq = np.asarray(llama_model.dequantize_prompt_kv_int4(got),
                         np.float64)
        old = np.asarray(llama_model.dequantize_prompt_kv_int4(pk),
                         np.float64)
        for i in range(b):
            o, n = int(row_len[i]), int(n_valid[i])
            np.testing.assert_allclose(deq[i, :, o:o + n],
                                       exp[i, :, :n], rtol=1e-6, atol=1e-7)
            # untouched regions preserved exactly
            np.testing.assert_array_equal(deq[i, :, :o], old[i, :, :o])
            np.testing.assert_array_equal(deq[i, :, o + n:],
                                          old[i, :, o + n:])
    for i in range(b):
        exp_pm = (np.arange(s_total) < int(row_len[i]) + int(n_valid[i]))
        np.testing.assert_array_equal(np.asarray(new_pm[i]),
                                      exp_pm.astype(np.int32))


def test_per_row_fold_matches_shared_offset_fold():
    """When every row sits at the same fill length, the continuous
    engine's gather-based per-row fold must produce exactly the same
    cache as the rollout sampler's shared-offset DUS fold."""
    from opadpo_tpu.engine.continuous import fold_suffix_per_row
    from opadpo_tpu.models import llama as llama_model

    # nseg must be 128-aligned (quantize_prompt_kv pads to 128-multiples,
    # as every real chunk/segment length is)
    b, h, s_total, hd, nseg, off, n = 2, 3, 384, 8, 128, 130, 60
    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, 10)

    def cache(k1, k2):
        return {"q": jax.random.randint(k1, (b, h, s_total, hd), -127, 128,
                                        jnp.int32).astype(jnp.int8),
                "scale": jax.random.uniform(k2, (b, h, s_total),
                                            jnp.float32)}

    kv = [(cache(ks[0], ks[1]), cache(ks[2], ks[3]))]
    sfx = [(jax.random.normal(ks[4], (b, nseg, h, hd), jnp.float32),
            jax.random.normal(ks[5], (b, nseg, h, hd), jnp.float32))]
    pm = (jax.lax.broadcasted_iota(jnp.int32, (b, s_total), 1)
          < off).astype(jnp.int32)

    ref_kv, ref_pm = llama_model.fold_suffix_into_prompt_kv(
        [tuple(jax.tree_util.tree_map(jnp.copy, kv[0]))],
        list(sfx), pm, jnp.asarray(n), jnp.int32(off))
    row_kv, row_pm = fold_suffix_per_row(
        [tuple(jax.tree_util.tree_map(jnp.copy, kv[0]))], list(sfx), pm,
        jnp.full((b,), off, jnp.int32), jnp.full((b,), n, jnp.int32))

    np.testing.assert_array_equal(np.asarray(row_pm), np.asarray(ref_pm))
    # contents must agree on every VALID position (the shared fold also
    # writes the chunk's unfilled tail, the per-row fold does not — both
    # regions are masked out by pm, so only the valid window is the
    # contract)
    valid = np.asarray(ref_pm)[:, None, :, None] != 0      # [B,1,S,1]
    for (rk, rv), (pk, pv) in zip(row_kv, ref_kv):
        for rc, pc in ((rk, pk), (rv, pv)):
            np.testing.assert_array_equal(
                np.where(valid, np.asarray(rc["q"]), 0),
                np.where(valid, np.asarray(pc["q"]), 0))
            np.testing.assert_allclose(
                np.where(valid[..., 0], np.asarray(rc["scale"]), 0),
                np.where(valid[..., 0], np.asarray(pc["scale"]), 0),
                rtol=1e-6)


def test_batched_admission_matches_solo():
    """5 requests into a 4-slot pool exercise the grouped-admission
    buckets (one k=4 prefill+admit, then k=1 after a slot frees): every
    request must still be bitwise identical to its solo run."""
    reqs = [_request(s) for s in (51, 52, 53, 54, 55)]
    eng = _engine(max_batch=4, max_new=4, seg_len=2)
    rids = [eng.add_request(*r) for r in reqs]
    done = _run_all(eng)
    assert len(done) == 5
    for i, rid in enumerate(rids):
        solo = _engine(max_batch=1, max_new=4, seg_len=2)
        srid = solo.add_request(*reqs[i])
        np.testing.assert_array_equal(done[rid], _run_all(solo)[srid],
                                      err_msg=f"req {i}")


def test_per_request_budgets():
    """Mixed per-request max_new caps in one pool: each request stops at
    its own budget and its tokens prefix-match the uncapped solo run."""
    reqs = [_request(41), _request(42)]
    eng = _engine(max_batch=2, max_new=6, seg_len=2)
    rid_a = eng.add_request(*reqs[0], max_new=3)
    rid_b = eng.add_request(*reqs[1])            # full cap 6
    done = _run_all(eng)
    assert done[rid_a].shape[0] == 3
    assert done[rid_b].shape[0] == 6

    solo = _engine(max_batch=1, max_new=6, seg_len=2)
    sr = solo.add_request(*reqs[0])
    np.testing.assert_array_equal(done[rid_a], _run_all(solo)[sr][:3])


def test_program_hash_parity_across_eos():
    """VERDICT r4 weak #4: entry points whose sampling differs only in
    eos/pad must compile byte-identical decode programs (eos/pad are
    traced args).  Lower the segment program for eos=-1 and eos=2
    engines and compare the stableHLO text."""
    e1 = _engine(max_batch=2, max_new=8, seg_len=4, eos=-1)
    e2 = _engine(max_batch=2, max_new=8, seg_len=4, eos=2)
    for e in (e1, e2):
        ids, mask, image = _request(0)
        e.add_request(ids, mask, image)
        e.step()        # builds device state + runs one segment
    args = lambda e: (e.params, e.lora, e._state[0], e._state[1],
                      e._state[2], e._state[3], jax.random.PRNGKey(0),
                      jnp.zeros((e.b,), bool), e.seg_len, e.s_total,
                      *e._eos_pad)
    t1 = e1._seg_fn.lower(*args(e1)).as_text()
    t2 = e2._seg_fn.lower(*args(e2)).as_text()
    assert t1 == t2, "decode segment HLO diverged across eos ids"


def test_serving_config_constructor_matches_engine_defaults():
    """serve.py / bench.py / bench_serve / rollout all build engines
    through make_continuous_engine — its pinned geometry must equal the
    engine defaults it claims to share."""
    from opadpo_tpu.engine.serving_config import (
        ENGINE_GEOMETRY, make_continuous_engine, make_serving_sampling,
    )
    sampling = make_serving_sampling(max_new_tokens=8, eos_token_id=-1)
    assert sampling.top_k == 30 and sampling.top_p == 0.95
    params, _ = Sampler(CFG32, sampling, kv_bits=8).prepare_params(PARAMS32)
    eng = make_continuous_engine(CFG32, sampling, params, slots=2,
                                 qlen=QLEN, seg_len=4)
    assert eng.b == 2 and eng.qlen == QLEN and eng.seg_len == 4
    assert eng.su_bucket == ENGINE_GEOMETRY["su_bucket"]
    assert eng.max_admit_group == ENGINE_GEOMETRY["max_admit_group"]


# -- speculative segments (spec_k > 0) --------------------------------


def test_spec_engine_greedy_parity_staggered():
    """Speculative segments (per-row advance + flush) through the slot
    pool are bit-identical to the non-spec engine, including staggered
    admission and slot reuse (3 requests / 2 slots)."""
    reqs = [_request(s) for s in (31, 32, 33)]
    base = _engine(max_batch=2, max_new=8, seg_len=4)
    rb = [base.add_request(*r) for r in reqs]
    done_b = _run_all(base)

    spec = _engine(max_batch=2, max_new=8, seg_len=4, spec_k=2)
    rs = [spec.add_request(*r) for r in reqs]
    done_s = _run_all(spec)
    for i, (b, s) in enumerate(zip(rb, rs)):
        np.testing.assert_array_equal(done_b[b], done_s[s],
                                      err_msg=f"req {i}")
    assert spec.spec_stats["groups"] > 0
    # stats["tokens"] counts verify-loop tokens (the acceptance-rate
    # denominator); each segment's carry-sampled first token is excluded
    emitted = sum(len(done_s[r]) for r in rs)
    assert 0 < spec.spec_stats["tokens"] < emitted


def test_spec_engine_budgets_and_eos():
    """Per-request budgets + a real eos id under spec segments: each
    request stops exactly where the non-spec engine stops."""
    reqs = [_request(s) for s in (41, 42)]
    base = _engine(max_batch=2, max_new=6, seg_len=3, eos=5)
    rb = [base.add_request(*reqs[0], max_new=4),
          base.add_request(*reqs[1])]
    done_b = _run_all(base)

    spec = _engine(max_batch=2, max_new=6, seg_len=3, eos=5, spec_k=2)
    rs = [spec.add_request(*reqs[0], max_new=4),
          spec.add_request(*reqs[1])]
    done_s = _run_all(spec)
    for b, s in zip(rb, rs):
        np.testing.assert_array_equal(done_b[b], done_s[s])


def test_spec_engine_oracle_acceptance():
    """spec_draft="oracle" fed each request's own greedy output accepts
    (nearly) every draft — and stays bit-identical.  This is the
    controlled-acceptance A/B path used on chip."""
    reqs = [_request(s) for s in (51, 52)]
    base = _engine(max_batch=2, max_new=8, seg_len=4)
    rb = [base.add_request(*r) for r in reqs]
    done_b = _run_all(base)

    spec = _engine(max_batch=2, max_new=8, seg_len=4, spec_k=2,
                   spec_draft="oracle")
    # oracle convention: oracle_tokens[t] IS generated token t (drafts
    # at offset e predict tokens e..e+k-1) — same as bench_spec's A/B
    rs = [spec.add_request(*r, oracle_tokens=np.concatenate(
            [done_b[b], np.zeros((2,), np.int32)]))
          for r, b in zip(reqs, rb)]
    done_s = _run_all(spec)
    for b, s in zip(rb, rs):
        np.testing.assert_array_equal(done_b[b], done_s[s])
    st = spec.spec_stats
    assert st["accepted_drafts"] > 0, st
    # perfect oracle: ~k accepted per group (edges lose a little)
    assert st["accepted_drafts"] >= st["groups"], st
