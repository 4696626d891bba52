"""Sampler vs. naive full-forward greedy decoding on the tiny model."""

import jax
import jax.numpy as jnp
import numpy as np

from opadpo_tpu.constants import IMAGE_TOKEN_INDEX
from opadpo_tpu.engine.sampler import generate, truncate_after_tokens
from opadpo_tpu.engine.sampling import SamplingConfig, sample_tokens
from opadpo_tpu.models import llava as llava_model
from opadpo_tpu.models.llava import LlavaConfig

CFG = LlavaConfig.tiny()
PARAMS = llava_model.init_params(jax.random.PRNGKey(0), CFG)


def _inputs(b=2, l=10):
    k1, k2 = jax.random.split(jax.random.PRNGKey(4))
    ids = jax.random.randint(k1, (b, l), 5, CFG.llama.vocab_size)
    ids = ids.at[:, 2].set(IMAGE_TOKEN_INDEX)
    mask = jnp.ones((b, l), jnp.int32).at[1, 0].set(0)
    sz = CFG.vision.image_size
    images = jax.random.normal(k2, (b, sz, sz, 3))
    return ids, mask, images


def test_greedy_generate_matches_full_forward():
    ids, mask, images = _inputs()
    n_new = 5
    sampling = SamplingConfig(greedy=True, max_new_tokens=n_new,
                              eos_token_id=-1)  # never stop
    out = generate(PARAMS, CFG, ids, mask, images, jax.random.PRNGKey(0),
                   sampling)
    assert out.shape == (2, n_new)

    # naive loop: rerun the full forward each step, take argmax
    cur_ids, cur_mask = ids, mask
    naive = []
    for _ in range(n_new):
        o = llava_model.forward(PARAMS, CFG, cur_ids, cur_mask, images,
                                remat=False)
        nxt = jnp.argmax(o["logits"][:, -1, :], axis=-1).astype(jnp.int32)
        naive.append(nxt)
        cur_ids = jnp.concatenate([cur_ids, nxt[:, None]], axis=1)
        cur_mask = jnp.concatenate(
            [cur_mask, jnp.ones((2, 1), jnp.int32)], axis=1)
    naive = jnp.stack(naive, axis=1)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(naive))


def test_eos_stops_and_pads():
    ids, mask, images = _inputs()
    # run greedy, find what token comes first, then declare it EOS
    probe = generate(PARAMS, CFG, ids, mask, images, jax.random.PRNGKey(0),
                     SamplingConfig(greedy=True, max_new_tokens=4,
                                    eos_token_id=-1))
    eos = int(probe[0, 0])
    sampling = SamplingConfig(greedy=True, max_new_tokens=6,
                              eos_token_id=eos, pad_token_id=0)
    out = np.asarray(generate(PARAMS, CFG, ids, mask, images,
                              jax.random.PRNGKey(0), sampling))
    row = out[0]
    assert row[0] == eos
    assert (row[1:] == 0).all()


def test_sample_tokens_top_k_top_p():
    rng = jax.random.PRNGKey(0)
    logits = jnp.log(jnp.array([[0.5, 0.3, 0.15, 0.05]]))
    # top_k=1 → always argmax
    cfg = SamplingConfig(top_k=1)
    for i in range(5):
        tok = sample_tokens(jax.random.fold_in(rng, i), logits, cfg)
        assert int(tok[0]) == 0
    # top_p=0.6 → only tokens {0, 1} survive (0.5 then crossing token 0.3)
    cfg = SamplingConfig(top_p=0.6)
    seen = {int(sample_tokens(jax.random.fold_in(rng, i), logits, cfg)[0])
            for i in range(50)}
    assert seen <= {0, 1}
    assert 1 in seen  # crossing token is kept


def test_approx_topk_impl_matches_sort():
    """topk_impl="approx" (lax.approx_max_k, recall_target=1.0) draws the
    same tokens as the sort-based top_k on tie-free logits — it is an
    exact top-k, only the TPU lowering differs."""
    rng = jax.random.PRNGKey(3)
    logits = jax.random.normal(rng, (4, 503))   # continuous → no ties
    for i in range(5):
        key = jax.random.fold_in(rng, i)
        a = sample_tokens(key, logits,
                          SamplingConfig(top_k=30, top_p=0.95,
                                         topk_impl="approx"))
        b = sample_tokens(key, logits,
                          SamplingConfig(top_k=30, top_p=0.95,
                                         topk_impl="sort"))
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_truncate_after_tokens():
    resp = np.array([[5, 7, 2, 9, 9], [5, 1577, 7, 2, 9], [4, 4, 4, 4, 4]])
    out = truncate_after_tokens(resp, eos_token_id=2, pad_token_id=0,
                                additional_tokens=(1577,))
    np.testing.assert_array_equal(out[0], [5, 7, 2, 0, 0])
    np.testing.assert_array_equal(out[1], [5, 1577, 0, 0, 0])
    np.testing.assert_array_equal(out[2], [4, 4, 4, 4, 4])


def test_split_sampler_matches_generate():
    # f32 model: in bf16, eager-vs-jit fusion rounding (~2^-8) flips
    # argmax on the near-uniform random tiny model
    import dataclasses
    from opadpo_tpu.engine.sampler import Sampler
    import jax.numpy as jnp
    cfg32 = LlavaConfig(
        dataclasses.replace(CFG.llama, dtype=jnp.float32),
        dataclasses.replace(CFG.vision, dtype=jnp.float32),
        dataclasses.replace(CFG.projector, dtype=jnp.float32))
    params32 = llava_model.init_params(jax.random.PRNGKey(0), cfg32)
    ids, mask, images = _inputs()
    sampling = SamplingConfig(greedy=True, max_new_tokens=5,
                              eos_token_id=-1)
    ref = generate(params32, cfg32, ids, mask, images,
                   jax.random.PRNGKey(0), sampling)
    # default: unrolled per-layer decode (weights as loop constants)
    s = Sampler(cfg32, sampling)
    out = s.generate(params32, ids, mask, images, jax.random.PRNGKey(0))
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))
    # second call hits the cached compiled fns + cached unstacked params
    out2 = s.generate(params32, ids, mask, images, jax.random.PRNGKey(0))
    np.testing.assert_array_equal(np.asarray(out2), np.asarray(ref))
    # legacy stacked-scan decode stays available and agrees
    s_scan = Sampler(cfg32, sampling, unroll=False)
    out3 = s_scan.generate(params32, ids, mask, images, jax.random.PRNGKey(0))
    np.testing.assert_array_equal(np.asarray(out3), np.asarray(ref))


def test_top_k_plus_top_p_support_and_distribution():
    """The k-space fast path (no full-vocab sort) keeps HF warper
    semantics: support = top-p prefix of the top-k set, and sampling
    frequencies match the softmax over that support."""
    import numpy as np
    rng = jax.random.PRNGKey(0)
    base = jnp.log(jnp.asarray([[0.4, 0.3, 0.15, 0.1, 0.05]], jnp.float32))
    logits = jnp.pad(base, ((0, 0), (0, 3)), constant_values=-1e9)

    # top_k=4 keeps {0,1,2,3}; top_p=0.8 keeps the prefix {0,1,2}
    # (0.4+0.3 < 0.8, crossing token 2 included; 0.4+0.3+0.15 >= 0.8 stops)
    cfg = SamplingConfig(top_k=4, top_p=0.8)
    counts = np.zeros(8)
    n = 3000
    for i in range(n):
        tok = int(sample_tokens(jax.random.fold_in(rng, i), logits, cfg)[0])
        counts[tok] += 1
    assert counts[3:].sum() == 0, counts
    freq = counts[:3] / n
    expect = np.array([0.4, 0.3, 0.15])
    expect = expect / expect.sum()
    np.testing.assert_allclose(freq, expect, atol=0.04)

def test_int8_prompt_kv_decode_matches_bf16():
    """kv_bits=8 (int8 prompt-KV cache): greedy decode tokens match the
    full-precision KV path on the tiny f32 model, and one direct
    decode_step_unrolled call has close logits."""
    import dataclasses
    from opadpo_tpu.engine.sampler import Sampler
    from opadpo_tpu.models import llama as llama_model
    cfg32 = LlavaConfig(
        dataclasses.replace(CFG.llama, dtype=jnp.float32),
        dataclasses.replace(CFG.vision, dtype=jnp.float32),
        dataclasses.replace(CFG.projector, dtype=jnp.float32))
    params32 = llava_model.init_params(jax.random.PRNGKey(0), cfg32)
    ids, mask, images = _inputs()
    sampling = SamplingConfig(greedy=True, max_new_tokens=5,
                              eos_token_id=-1)
    ref = Sampler(cfg32, sampling).generate(
        params32, ids, mask, images, jax.random.PRNGKey(0))
    out = Sampler(cfg32, sampling, kv_bits=8).generate(
        params32, ids, mask, images, jax.random.PRNGKey(0))
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))

    # direct logits comparison through one unrolled decode step
    up, _ = llava_model.unstack_for_decode(params32, None)
    pf = llava_model.prefill_unrolled(up, cfg32, ids, mask, images)
    kv_q = llama_model.quantize_prompt_kv_list(list(pf["kv_list"]))
    tok = jnp.full((ids.shape[0],), 7, jnp.int32)
    step = jnp.zeros((), jnp.int32)
    nkv, hd = cfg32.llama.num_kv_heads, cfg32.llama.head_dim
    suffix = [(jnp.zeros((2, 4, nkv, hd), jnp.float32),
               jnp.zeros((2, 4, nkv, hd), jnp.float32))
              for _ in range(len(pf["kv_list"]))]
    lg_ref, _ = llava_model.decode_step_unrolled(
        up, cfg32, tok, list(pf["kv_list"]), pf["key_mask"],
        list(suffix), step, pf["next_position"])
    lg_q, _ = llava_model.decode_step_unrolled(
        up, cfg32, tok, kv_q, pf["key_mask"],
        list(suffix), step, pf["next_position"])
    np.testing.assert_allclose(np.asarray(lg_q), np.asarray(lg_ref),
                               atol=0.05, rtol=0.05)

def test_int4_prompt_kv_decode_matches_dequantized_reference():
    """kv_bits=4 (packed int4 prompt-KV): one unrolled decode step through
    the int4 kernel matches the bf16 decode path fed the DEQUANTIZED int4
    cache (same values, kernel-vs-einsum math only → tight tolerance),
    and greedy generate matches the kv16 tokens on the tiny f32 model."""
    import dataclasses
    from opadpo_tpu.engine.sampler import Sampler
    from opadpo_tpu.models import llama as llama_model
    cfg32 = LlavaConfig(
        dataclasses.replace(CFG.llama, dtype=jnp.float32),
        dataclasses.replace(CFG.vision, dtype=jnp.float32),
        dataclasses.replace(CFG.projector, dtype=jnp.float32))
    params32 = llava_model.init_params(jax.random.PRNGKey(0), cfg32)
    ids, mask, images = _inputs()

    up, _ = llava_model.unstack_for_decode(params32, None)
    pf = llava_model.prefill_unrolled(up, cfg32, ids, mask, images)
    kv4 = llama_model.quantize_prompt_kv_list(list(pf["kv_list"]),
                                              kv_bits=4)
    sp_pad = kv4[0][0]["scale"].shape[2]
    # bf16-path reference cache: the same int4 values, dequantized back
    # to the seq-major layout (padding trimmed; mask handles the rest)
    kv_deq = [tuple(
        llama_model.dequantize_prompt_kv_int4(c).transpose(0, 2, 1, 3)[
            :, :pf["key_mask"].shape[1]]
        for c in layer) for layer in kv4]
    tok = jnp.full((ids.shape[0],), 7, jnp.int32)
    step = jnp.zeros((), jnp.int32)
    nkv, hd = cfg32.llama.num_kv_heads, cfg32.llama.head_dim
    suffix = [(jnp.zeros((2, 4, nkv, hd), jnp.float32),
               jnp.zeros((2, 4, nkv, hd), jnp.float32))
              for _ in range(len(pf["kv_list"]))]
    lg_ref, _ = llava_model.decode_step_unrolled(
        up, cfg32, tok, kv_deq, pf["key_mask"],
        list(suffix), step, pf["next_position"])
    lg_q, _ = llava_model.decode_step_unrolled(
        up, cfg32, tok, kv4, pf["key_mask"],
        list(suffix), step, pf["next_position"])
    np.testing.assert_allclose(np.asarray(lg_q), np.asarray(lg_ref),
                               atol=2e-3, rtol=2e-3)
    # s_used watermark (256-aligned) on the padded cache
    if sp_pad > 256:
        lg_w, _ = llava_model.decode_step_unrolled(
            up, cfg32, tok, kv4, pf["key_mask"],
            list(suffix), step, pf["next_position"], sp_used=256)
        np.testing.assert_allclose(np.asarray(lg_w), np.asarray(lg_q),
                                   atol=2e-3, rtol=2e-3)

    # end-to-end greedy: int4 KV rounding does not flip argmax here
    sampling = SamplingConfig(greedy=True, max_new_tokens=5,
                              eos_token_id=-1)
    ref = Sampler(cfg32, sampling).generate(
        params32, ids, mask, images, jax.random.PRNGKey(0))
    out = Sampler(cfg32, sampling, kv_bits=4).generate(
        params32, ids, mask, images, jax.random.PRNGKey(0))
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))
    out_c = Sampler(cfg32, sampling, kv_bits=4, chunk=256).generate(
        params32, ids, mask, images, jax.random.PRNGKey(0))
    np.testing.assert_array_equal(np.asarray(out_c), np.asarray(ref))


def test_quantized_decode_head_logits_close():
    """head_bits 8/4: decode logits through the quantized lm_head stay
    close to the bf16 head (decode-only layout; quantize_head_for_decode)."""
    import dataclasses
    from opadpo_tpu.models import llama as llama_model
    cfg32 = LlavaConfig(
        dataclasses.replace(CFG.llama, dtype=jnp.float32),
        dataclasses.replace(CFG.vision, dtype=jnp.float32),
        dataclasses.replace(CFG.projector, dtype=jnp.float32))
    params32 = llava_model.init_params(jax.random.PRNGKey(0), cfg32)
    ids, mask, images = _inputs()
    up, _ = llava_model.unstack_for_decode(params32, None)
    pf = llava_model.prefill_unrolled(up, cfg32, ids, mask, images)
    tok = jnp.full((ids.shape[0],), 7, jnp.int32)
    step = jnp.zeros((), jnp.int32)
    nkv, hd = cfg32.llama.num_kv_heads, cfg32.llama.head_dim
    suffix = [(jnp.zeros((2, 4, nkv, hd), jnp.float32),
               jnp.zeros((2, 4, nkv, hd), jnp.float32))
              for _ in range(len(pf["kv_list"]))]
    lg_ref, _ = llava_model.decode_step_unrolled(
        up, cfg32, tok, list(pf["kv_list"]), pf["key_mask"],
        list(suffix), step, pf["next_position"])
    for bits in (8, 4):
        upq = dict(up)
        upq["llama"] = llama_model.quantize_head_for_decode(up["llama"], bits)
        assert isinstance(upq["llama"]["lm_head"], dict)
        lg_q, _ = llava_model.decode_step_unrolled(
            upq, cfg32, tok, list(pf["kv_list"]), pf["key_mask"],
            list(suffix), step, pf["next_position"])
        tol = 0.05 if bits == 8 else 0.2
        np.testing.assert_allclose(np.asarray(lg_q), np.asarray(lg_ref),
                                   atol=tol, rtol=tol)

def test_chunked_decode_matches_single_chunk():
    """Sampler(chunk=...): a chunk large enough to never fold matches the
    plain kv_bits=8 path exactly; a small chunk exercises the
    append/fold path and stays deterministic with correct shapes."""
    import dataclasses
    from opadpo_tpu.engine.sampler import Sampler
    cfg32 = LlavaConfig(
        dataclasses.replace(CFG.llama, dtype=jnp.float32),
        dataclasses.replace(CFG.vision, dtype=jnp.float32),
        dataclasses.replace(CFG.projector, dtype=jnp.float32))
    params32 = llava_model.init_params(jax.random.PRNGKey(0), cfg32)
    ids, mask, images = _inputs()
    sampling = SamplingConfig(greedy=True, max_new_tokens=6,
                              eos_token_id=-1)
    ref = Sampler(cfg32, sampling, kv_bits=8).generate(
        params32, ids, mask, images, jax.random.PRNGKey(0))
    # one big chunk: identical math, no fold
    out1 = Sampler(cfg32, sampling, kv_bits=8, chunk=128).generate(
        params32, ids, mask, images, jax.random.PRNGKey(0))
    np.testing.assert_array_equal(np.asarray(out1[:, :6]),
                                  np.asarray(ref))

    # small chunks over a longer run: fold path runs; deterministic
    sampling_long = SamplingConfig(greedy=True, max_new_tokens=140,
                                   eos_token_id=-1)
    s = Sampler(cfg32, sampling_long, kv_bits=8, chunk=128)
    outa = s.generate(params32, ids, mask, images, jax.random.PRNGKey(0))
    outb = s.generate(params32, ids, mask, images, jax.random.PRNGKey(0))
    assert outa.shape == (2, 140)
    np.testing.assert_array_equal(np.asarray(outa), np.asarray(outb))
    # first chunk must equal the no-fold reference's first 128 tokens
    ref_long = Sampler(cfg32, sampling_long, kv_bits=8).generate(
        params32, ids, mask, images, jax.random.PRNGKey(0))
    np.testing.assert_array_equal(np.asarray(outa[:, :128]),
                                  np.asarray(ref_long[:, :128]))

def test_append_suffix_fold_preserves_decode_logits():
    """llama.append_suffix_to_prompt_kv: one decode step with KV held in
    the bf16 suffix buffer == the same KV folded into the int8 prompt
    cache (within prompt-KV quantization tolerance) — validates the
    fold's layout, masks, scales, and position handling."""
    import dataclasses
    from opadpo_tpu.models import llama as llama_model
    cfg32 = LlavaConfig(
        dataclasses.replace(CFG.llama, dtype=jnp.float32),
        dataclasses.replace(CFG.vision, dtype=jnp.float32),
        dataclasses.replace(CFG.projector, dtype=jnp.float32))
    params32 = llava_model.init_params(jax.random.PRNGKey(0), cfg32)
    ids, mask, images = _inputs()
    up, _ = llava_model.unstack_for_decode(params32, None)
    pf = llava_model.prefill_unrolled(up, cfg32, ids, mask, images)
    kv_q = llama_model.quantize_prompt_kv_list(list(pf["kv_list"]))
    b = ids.shape[0]
    nkv, hd = cfg32.llama.num_kv_heads, cfg32.llama.head_dim
    sp_pad = kv_q[0][0]["q"].shape[2]
    pm_cache = jnp.pad(pf["key_mask"],
                       ((0, 0), (0, sp_pad - pf["key_mask"].shape[1])))

    # generate a 128-slot suffix with 3 filled slots of real KV by
    # running 3 greedy decode steps
    c = 128
    suffix = [(jnp.zeros((b, c, nkv, hd), jnp.float32),
               jnp.zeros((b, c, nkv, hd), jnp.float32))
              for _ in range(len(kv_q))]
    pos = pf["next_position"]
    tok = jnp.full((b,), 7, jnp.int32)
    for i in range(3):
        lg, suffix = llava_model.decode_step_unrolled(
            up, cfg32, tok, kv_q, pm_cache, list(suffix),
            jnp.asarray(i), pos)
        pos = pos + 1
        tok = jnp.argmax(lg, axis=-1).astype(jnp.int32)

    # (a) 4th step with the suffix as-is
    lg_a, _ = llava_model.decode_step_unrolled(
        up, cfg32, tok, kv_q, pm_cache, list(suffix), jnp.asarray(3), pos)
    # (b) fold the suffix (3 filled slots) into the cache, empty suffix
    kv2, pm2 = llama_model.append_suffix_to_prompt_kv(
        list(kv_q), list(suffix), pm_cache, jnp.asarray(3))
    empty = [(jnp.zeros((b, c, nkv, hd), jnp.float32),
              jnp.zeros((b, c, nkv, hd), jnp.float32))
             for _ in range(len(kv_q))]
    lg_b, _ = llava_model.decode_step_unrolled(
        up, cfg32, tok, kv2, pm2, empty, jnp.asarray(0), pos)
    np.testing.assert_allclose(np.asarray(lg_b), np.asarray(lg_a),
                               atol=0.05, rtol=0.05)

    # (c) in-place variant: same fold into a cache PREALLOCATED at the
    # final length (quantize_prompt_kv_list(total_len=)), written at the
    # old watermark via fold_suffix_into_prompt_kv, decode reading only
    # up to the new watermark via sp_used — must match (b) exactly
    sp_used0 = kv_q[0][0]["q"].shape[2]
    total = sp_used0 + c
    kv_pre = llama_model.quantize_prompt_kv_list(list(pf["kv_list"]),
                                                 total_len=total)
    pm_pre = jnp.pad(pf["key_mask"],
                     ((0, 0), (0, total - pf["key_mask"].shape[1])))
    kv3, pm3 = llama_model.fold_suffix_into_prompt_kv(
        list(kv_pre), list(suffix), pm_pre, jnp.asarray(3),
        jnp.int32(sp_used0))
    lg_c, _ = llava_model.decode_step_unrolled(
        up, cfg32, tok, kv3, pm3, empty, jnp.asarray(0), pos,
        sp_used=total)
    np.testing.assert_allclose(np.asarray(lg_c), np.asarray(lg_b),
                               atol=1e-5, rtol=1e-5)
    # reading only the filled prefix (sp_used < physical length) must
    # not change the result either: grow the preallocation by one more
    # unused chunk and keep sp_used at `total`
    kv_pre2 = llama_model.quantize_prompt_kv_list(list(pf["kv_list"]),
                                                  total_len=total + c)
    pm_pre2 = jnp.pad(pf["key_mask"],
                      ((0, 0), (0, total + c - pf["key_mask"].shape[1])))
    kv4, pm4 = llama_model.fold_suffix_into_prompt_kv(
        list(kv_pre2), list(suffix), pm_pre2, jnp.asarray(3),
        jnp.int32(sp_used0))
    lg_d, _ = llava_model.decode_step_unrolled(
        up, cfg32, tok, kv4, pm4, empty, jnp.asarray(0), pos,
        sp_used=total)
    np.testing.assert_allclose(np.asarray(lg_d), np.asarray(lg_b),
                               atol=1e-5, rtol=1e-5)
