"""Autoregressive sampler: prefill + ``lax.while_loop`` decode over a
static KV cache.

Replaces HF ``generate`` (reference ``rl_models.py:146-191`` and the eval
scripts' greedy decode, ``model_vqa.py:213-227``).  Design notes:

- One SPMD program: the reference needed ``synced_gpus=True`` to keep DDP
  ranks lock-stepped during generation; under pjit the whole batch is one
  program, so that machinery disappears (SURVEY §2.8).
- Cache size is statically ``prompt_len + response_len + num_patches``
  exactly like the reference's ``config.cache_shape`` (rl_models.py:157-162).
- The loop exits early once every row has emitted EOS (while_loop, not a
  fixed-trip scan) — rollout batches with short answers don't pay for 896
  steps.
- Post-EOS padding + the "?" extra-truncation tokens are host-side numpy
  (``truncate_after_eos_with_padding``, rl_trainer.py:370-399 semantics).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from opadpo_tpu.models import llava as llava_model
from opadpo_tpu.models.llava import LlavaConfig
from opadpo_tpu.engine.sampling import SamplingConfig, sample_tokens


def generate(
    params: dict,
    cfg: LlavaConfig,
    input_ids: jax.Array,       # [B, L] left-padded prompts w/ image token
    text_mask: jax.Array,       # [B, L]
    images: jax.Array,          # [B, H, W, 3]
    rng: jax.Array,
    sampling: SamplingConfig,
    lora: Optional[dict] = None,
    lora_scaling: float = 1.0,
) -> jax.Array:
    """Returns sampled token ids [B, max_new_tokens] (pad after EOS)."""
    b, l = input_ids.shape
    s_prompt = l - 1 + cfg.num_patches
    cache_len = s_prompt + sampling.max_new_tokens
    eos = sampling.eos_token_id
    pad = sampling.pad_token_id

    pf = llava_model.prefill(params, cfg, input_ids, text_mask, images,
                             cache_len, lora=lora, lora_scaling=lora_scaling)

    def cond(state):
        step, _, _, _, _, _, done, _ = state
        return jnp.logical_and(step < sampling.max_new_tokens,
                               jnp.logical_not(jnp.all(done)))

    def body(state):
        step, rng, cache, key_mask, positions, last_logits, done, out = state
        rng, sub = jax.random.split(rng)
        tok = sample_tokens(sub, last_logits, sampling)
        tok = jnp.where(done, pad, tok)
        out = out.at[:, step].set(tok)
        done = jnp.logical_or(done, tok == eos)

        # mark the new token's cache slot valid, run one decode step
        key_mask = jax.lax.dynamic_update_slice(
            key_mask, jnp.ones((b, 1), key_mask.dtype), (0, s_prompt + step))
        logits, cache = llava_model.decode_step(
            params, cfg, tok, cache, key_mask, positions,
            lora=lora, lora_scaling=lora_scaling)
        return (step + 1, rng, cache, key_mask, positions + 1, logits,
                done, out)

    out0 = jnp.full((b, sampling.max_new_tokens), pad, jnp.int32)
    state = (jnp.zeros((), jnp.int32), rng, pf["cache"], pf["key_mask"],
             pf["next_position"], pf["last_logits"],
             jnp.zeros((b,), bool), out0)
    state = jax.lax.while_loop(cond, body, state)
    return state[-1]


def decode_loop(
    params: dict,
    cfg: LlavaConfig,
    cache: dict,
    key_mask: jax.Array,
    positions: jax.Array,
    last_logits: jax.Array,
    rng: jax.Array,
    sampling: SamplingConfig,
    s_prompt: int,
    lora: Optional[dict] = None,
    lora_scaling: float = 1.0,
) -> jax.Array:
    """The decode while_loop alone (post-prefill) → tokens [B, max_new]."""
    b = key_mask.shape[0]
    eos = sampling.eos_token_id
    pad = sampling.pad_token_id

    def cond(state):
        step, _, _, _, _, _, done, _ = state
        return jnp.logical_and(step < sampling.max_new_tokens,
                               jnp.logical_not(jnp.all(done)))

    def body(state):
        step, rng, cache, key_mask, positions, last_logits, done, out = state
        rng, sub = jax.random.split(rng)
        tok = sample_tokens(sub, last_logits, sampling)
        tok = jnp.where(done, pad, tok)
        out = out.at[:, step].set(tok)
        done = jnp.logical_or(done, tok == eos)
        key_mask = jax.lax.dynamic_update_slice(
            key_mask, jnp.ones((b, 1), key_mask.dtype), (0, s_prompt + step))
        logits, cache = llava_model.decode_step(
            params, cfg, tok, cache, key_mask, positions,
            lora=lora, lora_scaling=lora_scaling)
        return (step + 1, rng, cache, key_mask, positions + 1, logits,
                done, out)

    out0 = jnp.full((b, sampling.max_new_tokens), pad, jnp.int32)
    state = (jnp.zeros((), jnp.int32), rng, cache, key_mask, positions,
             last_logits, jnp.zeros((b,), bool), out0)
    state = jax.lax.while_loop(cond, body, state)
    return state[-1]


def decode_loop_split(
    params: dict,
    cfg: LlavaConfig,
    prompt_kv: dict,
    prompt_mask: jax.Array,       # [B, Sp]
    positions: jax.Array,         # [B] position of the first new token
    last_logits: jax.Array,       # [B, V] prefill logits
    rng: jax.Array,
    sampling: SamplingConfig,
    lora: Optional[dict] = None,
    lora_scaling: float = 1.0,
    eos_id: Optional[jax.Array] = None,
    pad_id: Optional[jax.Array] = None,
) -> jax.Array:
    """Decode over the split cache: the prompt KV is a loop CONSTANT and
    only the [max_new_tokens] suffix buffer is carried — the program the
    compile service actually handles (see llama.decode_forward_split).
    ``eos_id``/``pad_id``: traced overrides, see decode_loop_unrolled."""
    from opadpo_tpu.models import llama as llama_model

    b = prompt_mask.shape[0]
    eos = sampling.eos_token_id if eos_id is None else eos_id
    pad = sampling.pad_token_id if pad_id is None else pad_id
    suffix0 = llama_model.init_suffix_cache(cfg.llama, b,
                                            sampling.max_new_tokens)

    def cond(state):
        step = state[0]
        done = state[-2]
        return jnp.logical_and(step < sampling.max_new_tokens,
                               jnp.logical_not(jnp.all(done)))

    def body(state):
        step, rng, suffix, positions, last_logits, done, out = state
        rng, sub = jax.random.split(rng)
        tok = sample_tokens(sub, last_logits, sampling)
        tok = jnp.where(done, pad, tok)
        out = out.at[:, step].set(tok)
        done = jnp.logical_or(done, tok == eos)
        logits, suffix = llava_model.decode_step_split(
            params, cfg, tok, prompt_kv, prompt_mask, suffix, step,
            positions, lora=lora, lora_scaling=lora_scaling)
        return (step + 1, rng, suffix, positions + 1, logits, done, out)

    out0 = jnp.full((b, sampling.max_new_tokens), pad, jnp.int32)
    state = (jnp.zeros((), jnp.int32), rng, suffix0, positions,
             last_logits, jnp.zeros((b,), bool), out0)
    return jax.lax.while_loop(cond, body, state)[-1]


def decode_loop_unrolled(
    params: dict,                 # unstacked (llava.unstack_for_decode)
    cfg: LlavaConfig,
    prompt_kv_list: list,         # L × (pk, pv) [B, Sp, H, hd]
    prompt_mask: jax.Array,
    positions: jax.Array,
    last_logits: jax.Array,
    rng: jax.Array,
    sampling: SamplingConfig,
    lora: Optional[dict] = None,
    lora_scaling: float = 1.0,
    done_init: Optional[jax.Array] = None,
    max_new: Optional[int] = None,
    return_state: bool = False,
    sp_used: Optional[int] = None,
    eos_id: Optional[jax.Array] = None,
    pad_id: Optional[jax.Array] = None,
):
    """Decode over per-layer weights/KV: the while body inlines all layers
    so every weight is a loop constant — the scanned variant re-copied the
    full int8 base per token via the layer dynamic-slices (8.8 of 17.9 ms
    at 7B B=4, profiled).

    ``max_new``/``done_init``/``return_state`` support CHUNKED decode
    (``Sampler(chunk=...)``): run ``max_new`` steps, then hand
    ``(out, state)`` back so the caller can fold the suffix into the
    quantized prompt cache and continue.

    ``eos_id``/``pad_id``: optional TRACED scalar overrides of the
    sampling config's values.  Passing them as program arguments (the
    Sampler/ContinuousEngine do) keeps the compiled HLO byte-identical
    across entry points that differ only in eos/pad — the r4 silent
    18-minute recompile was bench_serve's ``eos_token_id=-1`` hashing a
    different decode program than serve.py's tokenizer eos."""
    from opadpo_tpu.models import llama as llama_model

    b = prompt_mask.shape[0]
    eos = sampling.eos_token_id if eos_id is None else eos_id
    pad = sampling.pad_token_id if pad_id is None else pad_id
    n_new = max_new or sampling.max_new_tokens
    n_layers = len(prompt_kv_list)
    nkv, hd = cfg.llama.num_kv_heads, cfg.llama.head_dim
    dt = cfg.llama.dtype
    suffix0 = tuple(
        (jnp.zeros((b, n_new, nkv, hd), dt),
         jnp.zeros((b, n_new, nkv, hd), dt))
        for _ in range(n_layers))

    def cond(state):
        step = state[0]
        done = state[-2]
        return jnp.logical_and(step < n_new,
                               jnp.logical_not(jnp.all(done)))

    def body(state):
        step, rng, suffix, positions, last_logits, done, out = state
        rng, sub = jax.random.split(rng)
        tok = sample_tokens(sub, last_logits, sampling)
        tok = jnp.where(done, pad, tok)
        out = out.at[:, step].set(tok)
        done = jnp.logical_or(done, tok == eos)
        logits, suffix = llava_model.decode_step_unrolled(
            params, cfg, tok, prompt_kv_list, prompt_mask, list(suffix),
            step, positions, lora=lora, lora_scaling=lora_scaling,
            sp_used=sp_used)
        return (step + 1, rng, tuple(suffix), positions + 1, logits, done,
                out)

    out0 = jnp.full((b, n_new), pad, jnp.int32)
    done0 = (jnp.zeros((b,), bool) if done_init is None else done_init)
    state = (jnp.zeros((), jnp.int32), rng, suffix0, positions,
             last_logits, jnp.zeros((b,), bool) | done0, out0)
    state = jax.lax.while_loop(cond, body, state)
    if return_state:
        step, rng, suffix, positions, last_logits, done, out = state
        return out, {"step": step, "rng": rng, "suffix": suffix,
                     "positions": positions, "last_logits": last_logits,
                     "done": done}
    return state[-1]


class Sampler:
    """Production sampler: prefill and the decode loop are compiled as TWO
    separate programs; weights live in the per-layer (unstacked) layout
    and the decode while-body inlines all layers.

    A single jitted prefill+decode program at 7B exceeds HBM (both phases'
    peaks coexist); a scan-over-layers decode body re-copies the whole
    base per token (layer dynamic-slices) and a monolithic KV cache as the
    loop carry blows up the remote compile service — hence: split cache,
    unstacked weights, unrolled layers.  ``generate()`` above remains the
    single-program path used by the tiny CPU tests.

    ``unroll=False`` falls back to the stacked scan decode (round-1
    layout); the default unrolls.

    ``kv_bits=8`` quantizes the prompt KV cache to int8 after prefill
    (``llama.quantize_prompt_kv``): decode is bandwidth-bound on the
    prompt-KV reads, so this trades ~0.4%% KV rounding error for halved
    cache traffic.  ``kv_bits=4`` packs two positions per byte
    (``llama.quantize_prompt_kv_int4``) — cache memory halves again,
    raising the decode batch ceiling; lengths/offsets (and ``chunk``)
    must then be 256-multiples.  Default 16 keeps the reference's bf16
    cache.

    ``chunk`` (with ``kv_bits=8|4``) enables CHUNKED decode: every
    ``chunk`` steps the bf16 suffix carry is re-quantized and folded
    into the int8 prompt cache, so the growing-suffix attention cost is
    bounded — full-length 896-step rollouts averaged 17.5 ms/step at
    B=8 with a monolithic suffix vs 11.1 over the first 128 steps.  The
    cache is PREALLOCATED at its final length by prefill and each fold
    writes in place under buffer donation
    (``llama.fold_suffix_into_prompt_kv``) — the concat-grow variant
    transiently held two caches and capped the batch at B=8 on a 16 GB
    chip (B=16 fits in-place: 778 tok/s full-896 vs 627).  Decode
    programs read only to a static fill watermark (``sp_used``), one
    compile per chunk index (persistent-cached).  Must be a multiple of
    128 for kv8 / 256 for kv4 (quantizer padding / watermark alignment).
    """

    def __init__(self, cfg: LlavaConfig, sampling: SamplingConfig,
                 lora_scaling: float = 1.0, unroll: bool = True,
                 kv_bits: int = 16, head_bits: int = 16, chunk: int = 0,
                 spec_k: int = 0, spec_draft: str = "ngram",
                 spec_advance: str = "shared"):
        assert kv_bits in (16, 8, 4), kv_bits
        assert head_bits in (16, 8, 4), head_bits
        # speculative decoding (engine/speculative.py): k drafts verified
        # per group in one multi-token forward; exact distribution.  v1
        # scope: unrolled layout, kv16/kv8 cache, no chunking, MHA.
        if spec_k:
            assert unroll and chunk == 0 and kv_bits in (16, 8), \
                "spec decode v1: unrolled, kv_bits 16/8, chunk=0"
            assert cfg.llama.num_heads == cfg.llama.num_kv_heads
            assert sampling.greedy or (sampling.top_k or 0) > 0, \
                "spec sampling needs greedy or top_k > 0"
        self.spec_k = int(spec_k)
        self.spec_draft = spec_draft
        self.spec_advance = spec_advance
        self._spec_fn = None
        # int4 cache: 256 is the packed group size (llama.quantize_
        # prompt_kv_int4) — every length/offset must be 256-aligned
        align = 256 if kv_bits == 4 else 128
        assert chunk == 0 or (kv_bits in (8, 4) and chunk % align == 0), \
            (chunk, kv_bits)
        self._kv_align = align
        self.cfg = cfg
        self.sampling = sampling
        self.lora_scaling = lora_scaling
        self.unroll = unroll
        self.kv_bits = kv_bits
        self.head_bits = head_bits
        self.chunk = chunk
        self._prefill_fn = {}
        self._decode_fn = {}
        self._chunk_fn = None
        self._append_fn = None
        self._unstacked = None     # (params_id, lora_id) -> pytrees

    def _get_prefill(self, s_prompt: int):
        if s_prompt not in self._prefill_fn:
            if self.unroll:
                # kv8: quantize inside the prefill program — the bf16
                # cache stays a per-layer intermediate instead of a
                # program output (see llava.prefill_unrolled docstring).
                # Chunked: preallocate at the final folded length so the
                # folds are in-place (llama.fold_suffix_into_prompt_kv).
                qkv = self.kv_bits in (8, 4)
                total = self._kv_total_len(s_prompt) if (
                    qkv and self.chunk) else None
                self._prefill_fn[s_prompt] = jax.jit(
                    lambda p, lo, q, m, im: llava_model.prefill_unrolled(
                        p, self.cfg, q, m, im, lora=lo,
                        lora_scaling=self.lora_scaling, quantize_kv=qkv,
                        kv_total_len=total, kv_bits=self.kv_bits))
            else:
                self._prefill_fn[s_prompt] = jax.jit(
                    lambda p, lo, q, m, im: llava_model.prefill(
                        p, self.cfg, q, m, im, s_prompt, lora=lo,
                        lora_scaling=self.lora_scaling))
        return self._prefill_fn[s_prompt]

    def _kv_total_len(self, s_prompt: int) -> int:
        """Final quantized-cache length after all chunked-decode folds:
        padded prompt + one chunk per fold (the last chunk never folds)."""
        a = self._kv_align
        sp_pad0 = -(-s_prompt // a) * a
        n_chunks = -(-self.sampling.max_new_tokens // self.chunk)
        return sp_pad0 + (n_chunks - 1) * self.chunk

    def _get_decode(self, s_prompt: int):
        # eos/pad ride as TRACED arguments so the compiled decode program
        # is shared across entry points whose sampling differs only in
        # eos/pad ids (persistent-cache hash parity; see
        # decode_loop_unrolled docstring)
        if s_prompt not in self._decode_fn:
            if self.unroll:
                self._decode_fn[s_prompt] = jax.jit(
                    lambda p, lo, pk, pm, pos, ll, r, e, pd:
                    decode_loop_unrolled(
                        p, self.cfg, pk, pm, pos, ll, r, self.sampling,
                        lora=lo, lora_scaling=self.lora_scaling,
                        eos_id=e, pad_id=pd))
            else:
                self._decode_fn[s_prompt] = jax.jit(
                    lambda p, lo, pk, pm, pos, ll, r, e, pd:
                    decode_loop_split(
                        p, self.cfg, pk, pm, pos, ll, r, self.sampling,
                        lora=lo, lora_scaling=self.lora_scaling,
                        eos_id=e, pad_id=pd))
        return self._decode_fn[s_prompt]

    def _eos_pad_args(self):
        return (jnp.int32(self.sampling.eos_token_id),
                jnp.int32(self.sampling.pad_token_id))

    def prepare_params(self, params, lora=None):
        """Convert (once) to the per-layer decode layout.  Callers should
        rebind their references to the return values so the stacked copies
        free — the conversion transiently holds both layouts on device."""
        if not self.unroll or "layer_list" in params.get("llama", {}):
            return params, lora
        key = (id(params), id(lora))
        if self._unstacked is not None and self._unstacked[0] == key:
            return self._unstacked[1]
        converted = llava_model.unstack_for_decode(params, lora)
        if self.head_bits != 16:
            from opadpo_tpu.models.llama import quantize_head_for_decode
            bits = self.head_bits
            p2 = dict(converted[0])
            lp = dict(p2["llama"])
            # jit only the head (the rest of the pytree must not round-trip
            # through an un-donated jit, which would copy the whole base)
            lp["lm_head"] = jax.jit(
                lambda w: quantize_head_for_decode(
                    {"lm_head": w}, bits)["lm_head"])(lp["lm_head"])
            p2["llama"] = lp
            converted = (p2, converted[1])
        self._unstacked = (key, converted)
        return converted

    def _generate_chunked(self, params, lora, kv_list, key_mask,
                          positions, last_logits, rng):
        """Outer python loop over decode chunks.  The int8 prompt cache
        is PREALLOCATED at its final length by prefill; each fold writes
        the re-quantized suffix in place (one compiled program, donated
        → aliased buffers, no two-cache transient), and each chunk's
        decode program reads only up to its static fill watermark
        ``sp_used`` (one compile per chunk index, shape-cached)."""
        import numpy as np

        from opadpo_tpu.models import llama as llama_model

        c = self.chunk
        total = self.sampling.max_new_tokens
        b = key_mask.shape[0]
        if self._chunk_fn is None:
            # n and sp_used are static: the FINAL chunk is capped to the
            # remaining budget, and sp_used keeps the decode-attention
            # kernel's reads proportional to the FILLED cache prefix
            self._chunk_fn = jax.jit(
                lambda p, lo, kv, pm, pos, ll, r, d0, n, su, e, pd:
                decode_loop_unrolled(
                    p, self.cfg, list(kv), pm, pos, ll, r, self.sampling,
                    lora=lo, lora_scaling=self.lora_scaling,
                    done_init=d0, max_new=n, return_state=True,
                    sp_used=su, eos_id=e, pad_id=pd),
                static_argnums=(8, 9))
            self._append_fn = jax.jit(
                lambda kv, sfx, pm, filled, off:
                llama_model.fold_suffix_into_prompt_kv(
                    list(kv), list(sfx), pm, filled, off),
                donate_argnums=(0, 1, 2))
        # mask in CACHE layout (padded to the preallocated length):
        # zeros on the quantizer's padding and the not-yet-filled tail
        sp_total = kv_list[0][0]["scale"].shape[2]
        a = self._kv_align
        sp_pad0 = -(-key_mask.shape[1] // a) * a
        pm = jnp.pad(key_mask, ((0, 0), (0, sp_total - key_mask.shape[1])))
        done = jnp.zeros((b,), bool)
        outs = []
        kv = tuple(kv_list)
        eos_a, pad_a = self._eos_pad_args()
        for ci in range(-(-total // c)):
            n = min(c, total - ci * c)
            sp_used = sp_pad0 + ci * c
            out_c, st = self._chunk_fn(params, lora, kv, pm, positions,
                                       last_logits, rng, done, n, sp_used,
                                       eos_a, pad_a)
            outs.append(np.asarray(out_c))
            done = st["done"]
            rng, positions, last_logits = (st["rng"], st["positions"],
                                           st["last_logits"])
            if ci < -(-total // c) - 1:
                if bool(jnp.all(done)):
                    break
                kv, pm = self._append_fn(kv, st["suffix"], pm, st["step"],
                                         jnp.int32(sp_used))
                kv = tuple(kv)
        out = np.concatenate(outs, axis=1)
        if out.shape[1] < total:
            out = np.pad(out, ((0, 0), (0, total - out.shape[1])),
                         constant_values=self.sampling.pad_token_id)
        return jnp.asarray(out[:, :total])

    def generate(self, params, input_ids, text_mask, images, rng,
                 lora: Optional[dict] = None) -> jax.Array:
        b, l = input_ids.shape
        s_prompt = l - 1 + self.cfg.num_patches
        if self.unroll and "layer_list" not in params.get("llama", {}):
            params, lora = self.prepare_params(params, lora)
        pf = self._get_prefill(s_prompt)(params, lora, input_ids,
                                         text_mask, images)
        if self.unroll:
            kv_list = pf["kv_list"]     # quant dicts when kv_bits < 16
            if self.kv_bits in (8, 4):
                if self.chunk:
                    return self._generate_chunked(
                        params, lora, kv_list, pf["key_mask"],
                        pf["next_position"], pf["last_logits"], rng)
            if self.spec_k:
                from opadpo_tpu.engine.speculative import (
                    SpecConfig, decode_loop_spec,
                )
                if self._spec_fn is None:
                    spec = SpecConfig(k=self.spec_k, draft=self.spec_draft,
                                      advance=self.spec_advance)
                    self._spec_fn = jax.jit(
                        lambda p, lo, pk, pm, pos, ll, r, e, pd:
                        decode_loop_spec(
                            p, self.cfg, list(pk), pm, pos, ll, r,
                            self.sampling, spec, lora=lo,
                            lora_scaling=self.lora_scaling,
                            eos_id=e, pad_id=pd))
                out, _stats = self._spec_fn(
                    params, lora, tuple(kv_list), pf["key_mask"],
                    pf["next_position"], pf["last_logits"], rng,
                    *self._eos_pad_args())
                return out
            return self._get_decode(s_prompt)(
                params, lora, tuple(kv_list), pf["key_mask"],
                pf["next_position"], pf["last_logits"], rng,
                *self._eos_pad_args())
        prompt_kv = {"k": pf["cache"]["k"], "v": pf["cache"]["v"]}
        return self._get_decode(s_prompt)(
            params, lora, prompt_kv, pf["key_mask"], pf["next_position"],
            pf["last_logits"], rng, *self._eos_pad_args())


def truncate_after_tokens(
    responses: np.ndarray,      # [B, R] sampled ids
    eos_token_id: int,
    pad_token_id: int,
    additional_tokens: Optional[Tuple[int, ...]] = None,
) -> np.ndarray:
    """Host-side cleanup: keep through the first EOS (or any additional
    stop token), pad the rest (reference truncate_after_eos_with_padding;
    the rollout adds the two "?" token ids, online_generator.py:312-323)."""
    out = responses.copy()
    stops = {eos_token_id}
    if additional_tokens:
        stops.update(additional_tokens)
    for i in range(out.shape[0]):
        row = out[i]
        idxs = np.nonzero(np.isin(row, list(stops)))[0]
        if idxs.size:
            end = idxs[0]
            out[i, end + 1:] = pad_token_id
    return out
