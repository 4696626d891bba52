"""Continuous (in-flight) batching over the preallocated int8 KV cache.

The reference serves nothing (offline eval scripts only) and its HF
``generate`` path is batch-synchronous: a batch's slowest sequence holds
every response, and new requests wait for the whole batch to finish.
This engine decodes a fixed pool of B slots in short SEGMENTS and refills
finished slots between segments, so a request's latency tracks its OWN
length — the TPU-idiomatic version of vLLM-style continuous batching
under XLA's static-shape rules:

- The KV cache is the chunked-decode design (engine/sampler.Sampler
  docstring): per-layer int8 prompt cache preallocated at
  ``S_total = prompt_cap + max_new`` plus a small bf16 suffix carried
  through each segment's ``lax.while_loop``.  Admission and folds are
  same-shape donated updates — nothing reallocates, ever.
- ADMISSION: waiting requests are prefilled together in small batch
  buckets (B ∈ {1, 2, 4}, fixed prompt length → a handful of compiles)
  and written into their slot rows with ``jax.lax.dynamic_update_slice``
  under buffer donation — one prefill + one admit dispatch per GROUP, not
  per request (the ~37 ms tunnel dispatch latency made per-request
  admission a large fraction of serving time under short-request mixes).
- SEGMENT: ``decode_loop_unrolled`` runs ``seg_len`` steps for the whole
  pool; finished/free rows ride along masked by ``done`` (they emit pads
  and their logits are ignored).  One compiled program for every segment
  (the prompt-read watermark ``sp_used`` is bucketed to limit recompiles).
- FOLD: each row's new tokens are re-quantized and folded into the cache
  at that row's OWN fill offset — rows are at different lengths, so
  unlike the rollout sampler's shared static offset this fold selects
  suffix entries through per-row one-hot einsums over the suffix axis
  (exact 0/1 int8 dots on the MXU; a sequence-axis ``take_along_axis``
  over the cache measured ~40 s per fold on the chip) — a full cache
  rewrite, amortized over ``seg_len`` steps.
- ``kv_bits=4`` packs the pool cache (llama.quantize_prompt_kv_int4):
  half the HBM per slot → up to 2x the slots.  The per-row fold rebuilds
  each packed byte nibble-wise (old nibble outside the row's write
  window, gathered new int4 value inside), so per-row offsets stay
  ARBITRARY — no alignment constraint, unlike the batch sampler's DUS
  fold.

Rope positions, attention masks, and EOS handling are all per-row
already (the rollout sampler needs them for ragged prompts), which is
what makes slot reuse a pure bookkeeping exercise on top.
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from opadpo_tpu.engine.sampler import decode_loop_unrolled
from opadpo_tpu.engine.sampling import SamplingConfig
from opadpo_tpu.models import llama as llama_model
from opadpo_tpu.models import llava as llava_model
from opadpo_tpu.models.llava import LlavaConfig


def fold_suffix_per_row(kv_list: list, suffix_list: list,
                        pm: jax.Array,          # [B, S_total]
                        row_len: jax.Array,     # [B] fill offset per row
                        n_valid: jax.Array) -> tuple:
    """Fold each row's first ``n_valid[i]`` suffix entries into the int8
    cache at position ``row_len[i]`` — the per-row-offset analogue of
    ``llama.fold_suffix_into_prompt_kv`` (whose single static offset
    assumes every row is at the same length; continuous slots are not).

    For cache position j of row i, take suffix slot ``j - row_len[i]``
    when ``0 <= j - row_len[i] < n_valid[i]``, else keep the existing
    entry.  The selection rides the MXU as a one-hot einsum over the
    (small) suffix axis — NOT ``take_along_axis``: a sequence-axis
    gather over the [B,H,S,hd] cache cost ~300 ms per tensor on the
    chip (~40 s per fold across 32 layers, measured 2026-08-19; same
    failure mode as the w8a8 outlier-gather lesson), while the one-hot
    int8 dot is exact (0/1 weights, int32 accumulation) and trivial
    FLOPs.  One pass over the cache per fold, amortized over the
    segment.  Quantization is per-(row, position, head)
    (llama.quantize_prompt_kv) so values are identical regardless of
    when a token is folded.
    """
    b, s_total = pm.shape
    j = jax.lax.broadcasted_iota(jnp.int32, (b, s_total), 1)
    idx = j - row_len[:, None]                              # [B, S]
    in_rng = jnp.logical_and(idx >= 0, idx < n_valid[:, None])
    nseg = suffix_list[0][0].shape[1]
    # [B, S, N] 0/1 selector: exact equality, zero outside the window
    onehot = jnp.logical_and(
        idx[:, :, None] == jnp.arange(nseg)[None, None, :],
        in_rng[:, :, None])
    oh8 = onehot.astype(jnp.int8)
    ohf = onehot.astype(jnp.float32)

    new_kv = []
    for (pk, pv), (sk, sv) in zip(kv_list, suffix_list):
        row = []
        for pc, sc in ((pk, sk), (pv, sv)):
            qc = llama_model.quantize_prompt_kv(sc)  # q [B,H,Sp_pad,hd]
            # quantize pads Sp for kernel alignment — select only the
            # real nseg suffix slots
            gq = jnp.einsum("bsn,bhnd->bhsd", oh8, qc["q"][:, :, :nseg],
                            preferred_element_type=jnp.int32
                            ).astype(jnp.int8)
            gs = jnp.einsum("bsn,bhn->bhs", ohf,
                            qc["scale"][:, :, :nseg].astype(jnp.float32)
                            ).astype(pc["scale"].dtype)
            row.append({
                "q": jnp.where(in_rng[:, None, :, None], gq, pc["q"]),
                "scale": jnp.where(in_rng[:, None, :], gs, pc["scale"]),
            })
        new_kv.append(tuple(row))
    new_pm = jnp.where(in_rng, jnp.ones_like(pm), pm)
    return new_kv, new_pm


def fold_suffix_per_row_int4(kv_list: list, suffix_list: list,
                             pm: jax.Array,        # [B, S_total]
                             row_len: jax.Array,   # [B]
                             n_valid: jax.Array) -> tuple:
    """Per-row fold into the PACKED int4 cache.  Unlike the shared-offset
    DUS fold (which needs 256-aligned offsets), this rebuilds every packed
    byte elementwise — old nibble where the position is outside the row's
    write window, gathered new int4 value inside it — so per-row offsets
    can be ARBITRARY: packed byte j2 of group g holds positions
    ``g*256 + (j2%128)`` (low) and ``+128`` (high), and each nibble is
    selected independently.  One unpack+repack pass over the cache per
    fold, amortized over the segment."""
    b, s_total = pm.shape
    nseg = suffix_list[0][0].shape[1]

    j2 = jax.lax.broadcasted_iota(jnp.int32, (b, s_total // 2), 1)
    p_lo = (j2 // 128) * 256 + (j2 % 128)
    p_hi = p_lo + 128
    j = jax.lax.broadcasted_iota(jnp.int32, (b, s_total), 1)

    def win(pos):
        # in-window mask only: the one-hot rewrite below replaced the
        # clipped take_along_axis gathers, so no index tensor is needed
        idx = pos - row_len[:, None]
        return jnp.logical_and(idx >= 0, idx < n_valid[:, None])

    in_lo = win(p_lo)
    in_hi = win(p_hi)
    in_sc = win(j)

    # one-hot selectors over the suffix axis (see fold_suffix_per_row:
    # sequence-axis gathers cost ~300 ms/tensor on the chip; the exact
    # 0/1 int8 einsum is effectively free)
    ar = jnp.arange(nseg)[None, None, :]
    oh_lo = jnp.logical_and((p_lo - row_len[:, None])[:, :, None] == ar,
                            in_lo[:, :, None]).astype(jnp.int8)
    oh_hi = jnp.logical_and((p_hi - row_len[:, None])[:, :, None] == ar,
                            in_hi[:, :, None]).astype(jnp.int8)
    oh_sc = jnp.logical_and((j - row_len[:, None])[:, :, None] == ar,
                            in_sc[:, :, None]).astype(jnp.float32)

    new_kv = []
    for (pk, pv), (sk, sv) in zip(kv_list, suffix_list):
        row = []
        for pc, sc in ((pk, sk), (pv, sv)):
            qc = llama_model.quantize_prompt_kv_int4_values(sc)
            # values in [-8, 7]; slice off any alignment padding
            qv8 = qc["qv"][:, :, :nseg].astype(jnp.int8)

            def sel_vals(oh):
                return jnp.einsum("bpn,bhnd->bhpd", oh, qv8,
                                  preferred_element_type=jnp.int32)

            p32 = pc["q4"].astype(jnp.int32)
            old_lo = ((p32 & 0xF) ^ 8) - 8
            old_hi = p32 >> 4
            new_lo = jnp.where(in_lo[:, None, :, None],
                               sel_vals(oh_lo), old_lo)
            new_hi = jnp.where(in_hi[:, None, :, None],
                               sel_vals(oh_hi), old_hi)
            packed = (new_hi * 16 + (new_lo & 0xF)).astype(jnp.int8)

            gs = jnp.einsum("bsn,bhn->bhs", oh_sc,
                            qc["scale"][:, :, :nseg].astype(jnp.float32)
                            ).astype(pc["scale"].dtype)
            row.append({
                "q4": packed,
                "scale": jnp.where(in_sc[:, None, :], gs, pc["scale"]),
            })
        new_kv.append(tuple(row))
    new_pm = jnp.where(in_sc, jnp.ones_like(pm), pm)
    return new_kv, new_pm


@dataclasses.dataclass
class _Slot:
    request_id: int
    tokens: List[np.ndarray]            # per-segment kept tokens
    budget: int                         # per-request max_new cap
    emitted: int = 0
    finished: bool = False
    oracle: Optional[np.ndarray] = None  # spec_draft="oracle" A/B drafts


class ContinuousEngine:
    """Slot-pool decode engine.  Usage::

        eng = ContinuousEngine(cfg, sampling, params, lora=...,
                               max_batch=8, qlen=128, seg_len=64)
        rid = eng.add_request(ids_1d, mask_1d, image)   # host numpy/jnp
        while eng.has_work():
            for rid, toks in eng.step():
                ...                                     # finished rollouts

    ``params``/``lora`` must already be in the per-layer decode layout
    (``Sampler.prepare_params``).  ``sampling.max_new_tokens`` is the
    per-request generation cap; ``seg_len`` is the scheduling quantum
    (latency ≈ one segment; admission happens between segments).
    """

    def __init__(self, cfg: LlavaConfig, sampling: SamplingConfig,
                 params: dict, lora: Optional[dict] = None,
                 lora_scaling: float = 1.0, max_batch: int = 8,
                 qlen: int = 128, seg_len: int = 64, su_bucket: int = 256,
                 max_admit_group: int = 4, kv_bits: int = 8,
                 rng: Optional[jax.Array] = None,
                 spec_k: int = 0, spec_draft: str = "ngram",
                 collect_spec_stats: bool = False):
        assert "layer_list" in params.get("llama", {}), \
            "params must be in decode layout (Sampler.prepare_params)"
        self.cfg = cfg
        self.sampling = sampling
        self.params = params
        self.lora = lora
        self.lora_scaling = lora_scaling
        self.b = max_batch
        self.qlen = qlen
        self.seg_len = seg_len
        assert kv_bits in (8, 4), kv_bits
        self.kv_bits = kv_bits
        # int4 cache: the decode kernel's watermark must be 256-aligned
        # (packed group size); the per-row GATHER fold itself needs no
        # alignment — it rebuilds packed bytes nibble-wise
        a = 256 if kv_bits == 4 else 128
        self.su_bucket = max(a, (su_bucket // a) * a)
        # cap on the admission prefill batch: a B=k prefill's activation
        # + kv_list peak coexists with the full slot-pool cache, so large
        # models (13B int4) should cap this at 1-2 to keep HBM headroom
        assert max_admit_group in (1, 2, 4), max_admit_group
        self.max_admit_group = max_admit_group
        self.rng = jax.random.PRNGKey(0) if rng is None else rng

        self.sp_splice = qlen - 1 + cfg.num_patches
        self.s_total = -(-(self.sp_splice + sampling.max_new_tokens)
                         // a) * a
        self._queue: List[tuple] = []   # (rid, q, m, img, budget, oracle)
        self._slots: List[Optional[_Slot]] = [None] * self.b
        self._next_id = 0
        self._state = None          # (kv, pm, pos, ll, row_len)
        # host mirror of row_len: fill offsets are deterministic host
        # bookkeeping (admission sets sp_splice, folds add n_valid), so
        # the per-segment watermark never needs a device->host transfer
        # (~37 ms tunnel round-trip per segment)
        self._row_len_host = np.zeros((self.b,), np.int64)

        self._prefill_fn = jax.jit(
            lambda p, lo, q, m, im: llava_model.prefill_unrolled(
                p, cfg, q, m, im, lora=lo, lora_scaling=lora_scaling,
                quantize_kv=True, kv_bits=kv_bits))
        # eos/pad are TRACED args: engines differing only in eos/pad ids
        # compile byte-identical HLO (persistent-cache hash parity — the
        # r4 bench/serve divergence silently recompiled for 18 min)
        self._eos_pad = (jnp.int32(sampling.eos_token_id),
                         jnp.int32(sampling.pad_token_id))
        # speculative segments (opt-in): each segment decodes with the
        # PER-ROW-advance spec loop (engine/speculative.py) — per-row
        # acceptance matches the engine's per-row offsets/folds/budgets,
        # and the settled suffix is per-token ordered exactly like the
        # normal loop's, so the fold below is untouched.  Greedy spec is
        # bit-identical to the non-spec engine (pinned by
        # tests/test_continuous.py).
        self.spec_k = int(spec_k)
        self.spec_draft = spec_draft
        self.collect_spec_stats = collect_spec_stats
        self.spec_stats = {"groups": 0, "accepted_drafts": 0, "tokens": 0}
        if spec_k:
            assert kv_bits == 8, "spec segments need the int8 pool cache"
            assert cfg.llama.num_heads == cfg.llama.num_kv_heads, \
                "spec decode v1 is MHA-only"
            assert sampling.greedy or (sampling.top_k or 0) > 0, \
                "spec sampling needs greedy or top_k > 0"
            from opadpo_tpu.engine.speculative import (
                SpecConfig, decode_loop_spec,
            )
            spec = SpecConfig(k=int(spec_k), draft=spec_draft,
                              advance="per_row",
                              compact_every=max(4, min(32, seg_len)))

            def _spec_seg(p, lo, kv, pm, pos, ll, r, d0, n, su, e, pd,
                          oracle):
                out, st, stats = decode_loop_spec(
                    p, cfg, list(kv), pm, pos, ll, r, sampling, spec,
                    oracle_tokens=oracle, lora=lo,
                    lora_scaling=lora_scaling, sp_used=su, eos_id=e,
                    pad_id=pd, done_init=d0, max_new=n,
                    return_state=True)
                packed = jnp.stack([stats["groups"],
                                    stats["accepted_drafts"],
                                    jnp.sum(stats["tokens"])])
                return out, st, packed

            self._seg_fn = jax.jit(_spec_seg, static_argnums=(8, 9))
        else:
            self._seg_fn = jax.jit(
                lambda p, lo, kv, pm, pos, ll, r, d0, n, su, e, pd:
                decode_loop_unrolled(
                    p, cfg, list(kv), pm, pos, ll, r, sampling, lora=lo,
                    lora_scaling=lora_scaling, done_init=d0, max_new=n,
                    return_state=True, sp_used=su, eos_id=e, pad_id=pd),
                static_argnums=(8, 9))
        fold = (fold_suffix_per_row if kv_bits == 8
                else fold_suffix_per_row_int4)
        self._fold_fn = jax.jit(
            lambda kv, sfx, pm, rl, nv: fold(
                list(kv), list(sfx), pm, rl, nv),
            donate_argnums=(0, 2))
        self._admit_fn = jax.jit(self._admit_impl,
                                 donate_argnums=(0, 1, 2, 3, 4))

    # -- request intake -------------------------------------------------

    def add_request(self, input_ids, text_mask, image,
                    max_new: Optional[int] = None,
                    oracle_tokens: Optional[np.ndarray] = None) -> int:
        """Queue one request (1-D prompt ids/mask, one image).  The prompt
        is left-padded/truncated to the engine's fixed ``qlen`` bucket;
        ``max_new`` caps this request's generation (clipped to the
        engine-wide ``sampling.max_new_tokens``, which sizes the cache).
        ``oracle_tokens`` feeds the ``spec_draft="oracle"`` controlled-
        acceptance A/B: the request's draft at generated-token offset t
        is ``oracle_tokens[t:t+k]`` (wrong entries only cost acceptance,
        never correctness)."""
        ids = np.asarray(input_ids)[-self.qlen:]
        msk = np.asarray(text_mask)[-self.qlen:]
        q = np.zeros((self.qlen,), ids.dtype)
        m = np.zeros((self.qlen,), msk.dtype)
        q[-len(ids):] = ids
        m[-len(msk):] = msk
        budget = self.sampling.max_new_tokens if max_new is None else \
            max(1, min(max_new, self.sampling.max_new_tokens))
        rid = self._next_id
        self._next_id += 1
        ora = None if oracle_tokens is None else \
            np.asarray(oracle_tokens, np.int32)
        self._queue.append((rid, q, m, np.asarray(image), budget, ora))
        return rid

    def has_work(self) -> bool:
        return bool(self._queue) or any(
            s is not None and not s.finished for s in self._slots)

    def _segment_oracle(self) -> jax.Array:
        """[B, seg_len + k] draft-oracle slice for this segment: each
        active row's oracle tokens at its own emitted offset (pads when
        the row has none / the draft source is not "oracle")."""
        pad = self.sampling.pad_token_id
        width = self.seg_len + self.spec_k
        if self.spec_draft != "oracle":
            if getattr(self, "_oracle_pad", None) is None:
                self._oracle_pad = jnp.full((self.b, width), pad,
                                            jnp.int32)
            return self._oracle_pad
        ora = np.full((self.b, width), pad, np.int32)
        for i, slot in enumerate(self._slots):
            if slot is None or slot.finished or slot.oracle is None:
                continue
            chunk = slot.oracle[slot.emitted:slot.emitted + width]
            ora[i, :len(chunk)] = chunk
        return jnp.asarray(ora)

    # -- device state ---------------------------------------------------

    def _init_state(self, row_kv):
        """Zero pool state shaped from the first admitted row's prefill."""
        st = self.s_total

        def mk():
            kv = []
            for pk, pv in row_kv:
                key = "q4" if "q4" in pk else "q"
                h, hd = pk[key].shape[1], pk[key].shape[3]
                sq = st // 2 if key == "q4" else st
                kv.append(tuple(
                    {key: jnp.zeros((self.b, h, sq, hd), jnp.int8),
                     "scale": jnp.zeros((self.b, h, st),
                                        pk["scale"].dtype)}
                    for _ in range(2)))
            return tuple(kv)

        kv = jax.jit(mk)()
        pm = jnp.zeros((self.b, st), jnp.int32)
        pos = jnp.zeros((self.b,), jnp.int32)
        v = self.cfg.llama.vocab_size
        ll = jnp.zeros((self.b, v), jnp.float32)
        row_len = jnp.zeros((self.b,), jnp.int32)
        return [kv, pm, pos, ll, row_len]

    def _admit_impl(self, kv, pm, pos, ll, row_len,
                    row_kv, row_mask, row_pos, row_ll, slots):
        """Write ``k`` prefilled rows into slots ``slots`` ([k] traced
        vector; k is baked by shape → one compiled program per admission
        GROUP SIZE, shared by every admission at that size)."""
        k = row_mask.shape[0]
        for i in range(k):
            slot = slots[i]
            new_kv = []
            for (pk, pv), (rk, rv) in zip(kv, row_kv):
                row = []
                for pc, rc in ((pk, rk), (pv, rv)):
                    key = "q4" if "q4" in pc else "q"
                    sp = rc[key].shape[2]
                    q = jax.lax.dynamic_update_slice(
                        pc[key],
                        jnp.zeros_like(pc[key][:1]).at[:, :, :sp].set(
                            rc[key][i:i + 1].astype(pc[key].dtype)),
                        (slot, 0, 0, 0))
                    ssp = rc["scale"].shape[2]
                    sc = jax.lax.dynamic_update_slice(
                        pc["scale"],
                        jnp.zeros_like(pc["scale"][:1]).at[:, :, :ssp].set(
                            rc["scale"][i:i + 1].astype(pc["scale"].dtype)),
                        (slot, 0, 0))
                    row.append({key: q, "scale": sc})
                new_kv.append(tuple(row))
            kv = tuple(new_kv)
            mrow = jnp.zeros_like(pm[:1]).at[:, :row_mask.shape[1]].set(
                row_mask[i:i + 1].astype(pm.dtype))
            pm = jax.lax.dynamic_update_slice(pm, mrow, (slot, 0))
            pos = jax.lax.dynamic_update_slice(
                pos, row_pos[i:i + 1].astype(pos.dtype), (slot,))
            ll = jax.lax.dynamic_update_slice(
                ll, row_ll[i:i + 1].astype(ll.dtype), (slot, 0))
            row_len = jax.lax.dynamic_update_slice(
                row_len, jnp.full((1,), self.sp_splice, row_len.dtype),
                (slot,))
        return kv, pm, pos, ll, row_len

    # -- scheduling -----------------------------------------------------

    def _admit_pending(self):
        free = [i for i in range(self.b)
                if self._slots[i] is None or self._slots[i].finished]
        take = min(len(free), len(self._queue))
        if not take:
            return
        assignments = list(zip(free[:take],
                               [self._queue.pop(0) for _ in range(take)]))
        # group into fixed batch buckets {4, 2, 1} so admissions share a
        # handful of prefill/admit compiles (one per bucket size) while
        # bursts pay one dispatch per GROUP rather than per request
        i = 0
        while i < len(assignments):
            left = len(assignments) - i
            k = min(self.max_admit_group, 4 if left >= 4 else
                    2 if left >= 2 else 1)
            group = assignments[i:i + k]
            i += k
            pf = self._prefill_fn(
                self.params, self.lora,
                jnp.asarray(np.stack([g[1][1] for g in group])),
                jnp.asarray(np.stack([g[1][2] for g in group])),
                jnp.asarray(np.stack([g[1][3] for g in group])))
            if self._state is None:
                self._state = self._init_state(pf["kv_list"])
            kv, pm, pos, ll, row_len = self._state
            kv, pm, pos, ll, row_len = self._admit_fn(
                kv, pm, pos, ll, row_len, tuple(pf["kv_list"]),
                pf["key_mask"], pf["next_position"], pf["last_logits"],
                jnp.asarray([g[0] for g in group], jnp.int32))
            self._state = [kv, pm, pos, ll, row_len]
            for slot_idx, (rid, _, _, _, budget, ora) in group:
                self._slots[slot_idx] = _Slot(request_id=rid, tokens=[],
                                              budget=budget, oracle=ora)
                self._row_len_host[slot_idx] = self.sp_splice

    def step(self) -> List[Tuple[int, np.ndarray]]:
        """Admit pending requests, decode one segment, fold, and return
        the requests that finished this segment as (request_id, tokens)."""
        self._admit_pending()
        if self._state is None:
            return []
        active = [s is not None and not s.finished for s in self._slots]
        if not any(active):
            return []
        kv, pm, pos, ll, row_len = self._state

        max_len = max(int(x) for x, a in
                      zip(self._row_len_host, active) if a)
        su = min(self.s_total,
                 -(-max_len // self.su_bucket) * self.su_bucket)
        assert max_len + 0 <= self.s_total, (max_len, self.s_total)

        done0 = jnp.asarray(np.logical_not(active))
        self.rng, sub = jax.random.split(self.rng)
        if self.spec_k:
            out_c, st, stats_c = self._seg_fn(
                self.params, self.lora, kv, pm, pos, ll, sub, done0,
                self.seg_len, su, *self._eos_pad, self._segment_oracle())
            if self.collect_spec_stats:
                s = np.asarray(stats_c)
                self.spec_stats["groups"] += int(s[0])
                self.spec_stats["accepted_drafts"] += int(s[1])
                self.spec_stats["tokens"] += int(s[2])
        else:
            out_c, st = self._seg_fn(self.params, self.lora, kv, pm, pos,
                                     ll, sub, done0, self.seg_len, su,
                                     *self._eos_pad)
        out = np.asarray(out_c)
        eos = self.sampling.eos_token_id

        finished: List[Tuple[int, np.ndarray]] = []
        n_valid = np.zeros((self.b,), np.int32)
        for i, slot in enumerate(self._slots):
            if slot is None or slot.finished or not active[i]:
                continue
            row = out[i]
            hit = np.nonzero(row == eos)[0]
            raw = int(hit[0]) + 1 if hit.size else self.seg_len
            keep = min(raw, slot.budget - slot.emitted)
            n_valid[i] = keep
            slot.tokens.append(row[:keep])
            slot.emitted += keep
            if hit.size and hit[0] < keep or slot.emitted >= slot.budget:
                slot.finished = True
                toks = np.concatenate(slot.tokens) if slot.tokens \
                    else np.zeros((0,), np.int32)
                finished.append((slot.request_id, toks))

        kv, pm = self._fold_fn(kv, st["suffix"], pm,
                               row_len, jnp.asarray(n_valid))
        row_len = row_len + jnp.asarray(n_valid)
        self._row_len_host += n_valid
        self._state = [tuple(kv), pm, st["positions"], st["last_logits"],
                       row_len]
        return finished
