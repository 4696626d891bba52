"""Benchmark: OPA-DPO reference-scoring throughput at LLaVA-7B on one chip.

Measures ``score_responses`` — the DPO rollout hot loop (one decoder
forward over 3 response types with the vision tower encoded once;
reference ``rl_models.py:74-144`` runs on 4×A100-80GB) — on the single
local TPU chip and prints ONE JSON line.

Baseline derivation (the reference publishes no throughput numbers —
BASELINE.md): the same scoring forward costs ~2 FLOPs/param/token; an
A100-80GB at a generous 50% bf16 MXU utilization (156 TFLOP/s) over 7B
params sustains ≈ 11,000 scored tokens/s/GPU.  ``vs_baseline`` is
measured-tokens/s ÷ 11,000 — i.e. this chip vs one reference GPU on the
identical workload.

Timing forces a host transfer per measurement because the axon tunnel's
``block_until_ready`` does not reliably wait for execution.
"""

from __future__ import annotations

import json
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

# Persistent compilation cache: the 7B scoring program takes ~4 min to
# compile cold over the device tunnel; warm runs start in seconds.
jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.abspath(__file__)),
                               ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

A100_BASELINE_TOKENS_PER_SEC = 11000.0

# Measured single-op ceilings on THIS chip (v5e, CLAUDE.md): large bf16
# matmuls sustain ~167 TFLOP/s, int8 MXU (w8a8) ~227 TOPS.  MFU fields
# divide achieved decoder weight-matmul FLOP/s by these, so every perf
# record is self-interpreting (VERDICT r4 weak #1).
BF16_CEILING_TFLOPS = 167.0
INT8_CEILING_TFLOPS = 227.0

# Decoder parameter counts (weight-matmul FLOPs = 2·P per computed
# position; attention QK/AV FLOPs excluded, so mfu is an upper-ish bound
# of utilization on long sequences).
DECODER_PARAMS = {"7b": 6.74e9, "13b": 13.02e9}


def _cheap_params(cfg):
    from opadpo_tpu.models import llava as llava_model
    shapes = jax.eval_shape(
        lambda: llava_model.init_params(jax.random.PRNGKey(0), cfg))
    return jax.jit(lambda: jax.tree_util.tree_map(
        lambda s: jnp.full(s.shape, 0.01, s.dtype), shapes))()


def _score_throughput(cfg, dpo, b: int, n_iters: int = 8,
                      quant_mode: str = "bf16",
                      probe_gb: float = 0.0) -> dict:
    """DPO scoring forward throughput at batch size b.

    quant_mode: "bf16" (replicates the reference's bits=16 numerics),
    "w8a8" (int8 base weights — required to fit 7B training on this
    16 GB chip anyway — plus per-token int8 activations on the int8 MXU;
    LLM.int8-class scoring quantization, ops/quant.py), or "int4"
    (weight-only int4 group-128 base — the 13B single-chip config).

    probe_gb > 0 compiles first and refuses to execute if XLA's
    estimated peak exceeds it (runtime OOMs wedge the service for hours).

    Returns {tokens_per_sec (stacked-equivalent), seconds_per_forward,
    positions_computed, positions_stacked}.
    """
    from opadpo_tpu.constants import IMAGE_TOKEN_INDEX
    from opadpo_tpu.engine.dpo import score_responses
    from opadpo_tpu.models import llava as llava_model
    from opadpo_tpu.ops import quant

    if quant_mode in ("w8a8", "int4"):
        quant.set_act_quant(quant_mode == "w8a8")
        bits = 4 if quant_mode == "int4" else 8
        shapes = jax.eval_shape(lambda: quant.quantize_params(
            llava_model.init_params(jax.random.PRNGKey(0), cfg), bits=bits))
        params = jax.jit(lambda: jax.tree_util.tree_map(
            lambda s: jnp.full(s.shape, 0.01, s.dtype), shapes))()
    else:
        quant.set_act_quant(False)
        params = _cheap_params(cfg)
    rng = np.random.default_rng(0)
    queries = rng.integers(5, 32000, (b, dpo.query_len)).astype(np.int32)
    queries[:, 1] = IMAGE_TOKEN_INDEX
    q_mask = np.ones_like(queries)
    images = jnp.zeros((b, 336, 336, 3), jnp.bfloat16)

    def resp(seed):
        r = np.random.default_rng(seed)
        ids = r.integers(5, 32000, (b, dpo.response_len)).astype(np.int32)
        ids[:, -64:] = 0
        return jnp.asarray(ids), jnp.asarray((ids != 0).astype(np.int32))

    responses = tuple(resp(s)[0] for s in (1, 2, 3))
    masks = tuple(resp(s)[1] for s in (1, 2, 3))

    # responses/masks MUST be jit arguments: closed-over token arrays
    # become XLA constants and constant-folding through the embedding
    # gathers blows compile time up from minutes to >25 min (measured).
    fn = jax.jit(lambda p, q, m, im, r, rm: score_responses(
        p, cfg, dpo, q, m, im, r, rm, remat=False))

    args = (params, jnp.asarray(queries), jnp.asarray(q_mask), images,
            responses, masks)
    if probe_gb > 0:
        compiled = fn.lower(*args).compile()
        try:
            ma = compiled.memory_analysis()
            peak = (ma.argument_size_in_bytes + ma.output_size_in_bytes
                    + ma.temp_size_in_bytes - ma.alias_size_in_bytes) / 1e9
        except Exception:
            peak = None
        if peak is not None and peak > probe_gb:
            raise RuntimeError(f"est peak {peak:.2f} GB > {probe_gb} GB "
                               "probe gate")
    out = fn(*args)
    _ = float(jnp.sum(out["logprobs"][0]))      # force execution

    t0 = time.perf_counter()
    for _ in range(n_iters):
        out = fn(*args)
    _ = float(jnp.sum(out["logprobs"][0]))
    dt = (time.perf_counter() - t0) / n_iters

    # "stacked-equivalent" accounting: the reference stacks prefix +
    # response for all 3 response types (3·B·(query−1+patches+response)
    # positions); the shared-prefix forward (default ON) computes the
    # prefix ONCE per example — ~29% fewer real positions for the same
    # scored workload.  tokens_per_sec stays workload-normalized so it is
    # comparable across rounds and to the A100 baseline; positions_computed
    # feeds the honest achieved-FLOPs fields.
    prefix = dpo.query_len - 1 + cfg.num_patches
    seq_len = prefix + dpo.response_len
    stacked = 3 * b * seq_len
    computed = b * (prefix + 3 * dpo.response_len)
    return {"tokens_per_sec": stacked / dt,
            "seconds_per_forward": dt,
            "positions_stacked": stacked,
            "positions_computed": computed}


def _mfu_fields(mode: str, model: str, positions_per_sec: float) -> dict:
    """Achieved decoder weight-matmul FLOP/s (2·P per computed position)
    and utilization vs the measured matmul ceiling for that numerics
    mode.  Attention FLOPs are excluded, so this slightly UNDERcounts
    achieved compute; it exists to anchor tokens/s claims to hardware."""
    tflops = 2 * DECODER_PARAMS[model] * positions_per_sec / 1e12
    ceiling = (INT8_CEILING_TFLOPS if mode.startswith("w8a8")
               else BF16_CEILING_TFLOPS)
    return {"achieved_tflops": round(tflops, 1),
            "mfu": round(tflops / ceiling, 3),
            "mfu_ceiling_tflops": ceiling}


def _scoring_record(results: dict, model: str = "7b") -> dict:
    # headline: the production scoring config on this 16 GB chip (int8
    # base is mandatory for 7B training memory; w8a8 rides the int8 MXU —
    # the DOCUMENTED default, README "Numerics defaults"; bits=16 opt-out)
    best = max(results, key=lambda k: results[k]["tokens_per_sec"])
    r = results[best]
    tps = round(r["tokens_per_sec"], 1)
    mode = best.split("_b")[0]
    rec = {
        "metric": f"llava{model}_dpo_score_tokens_per_sec",
        "value": tps,
        "unit": "tokens/s",
        "vs_baseline": round(tps / A100_BASELINE_TOKENS_PER_SEC, 3),
        "config": best,
        "accounting": "stacked-equivalent positions "
                      "(3*B*(query-1+patches+response))/s; the "
                      "shared-prefix forward computes the query+image "
                      "prefix once per example (~29% fewer real "
                      "positions for the same scored workload)",
        "detail": {f"{k}_tokens_per_sec": round(v["tokens_per_sec"], 1)
                   for k, v in results.items()},
    }
    rec.update(_mfu_fields(
        mode, model, r["positions_computed"] / r["seconds_per_forward"]))
    return rec


def bench_dpo_scoring(on_update=None) -> dict:
    """Scoring throughput over three configs, best-first so a partial
    (budget-killed) run still carries the headline number.  ``on_update``
    is called with the cumulative record after EVERY config finishes —
    main() prints it, so the driver's last-JSON-line parse always sees
    real data (BENCH_r03 was rc-124/null because everything printed at
    the very end)."""
    from opadpo_tpu.engine.dpo import DpoConfig
    from opadpo_tpu.models.llava import LlavaConfig

    cfg = LlavaConfig.llava_7b()
    dpo = DpoConfig(response_len=896, query_len=128, lora_scaling=2.0)

    results = {}
    # best-first; B=8 probes at 9.37 GB peak under the shared-prefix
    # forward (bf16 B>=2 stays out: 14.5+ GB est < 1.5 GB headroom rule)
    for mode, b in (("w8a8", 8), ("w8a8", 1), ("bf16", 1)):
        try:
            results[f"{mode}_b{b}"] = _score_throughput(
                cfg, dpo, b, quant_mode=mode)
        except Exception as e:
            print(f"{mode} B={b} scoring failed: {e}", file=sys.stderr)
        if results and on_update is not None:
            on_update(_scoring_record(results))
    if not results:
        raise RuntimeError("all scoring configs failed")
    return _scoring_record(results)


def bench_scoring_13b(b: int = 4) -> dict:
    """13B DPO scoring at the single-chip 13B config (int4-g128 base —
    BASELINE.json config #5 names the 13B pipeline; 13B bf16/int8 do not
    fit 16 GB).  Memory-gated: compile-probe must stay under 14.25 GB
    before executing (runtime OOMs wedge the service)."""
    from opadpo_tpu.engine.dpo import DpoConfig
    from opadpo_tpu.models.llava import LlavaConfig

    cfg = LlavaConfig.llava_13b()
    dpo = DpoConfig(response_len=896, query_len=128, lora_scaling=2.0)
    results = {}
    for mode, bb in (("int4", b), ("int4", 1)):
        try:
            results[f"{mode}_b{bb}"] = _score_throughput(
                cfg, dpo, bb, n_iters=4, quant_mode=mode, probe_gb=14.25)
        except Exception as e:
            print(f"13b {mode} B={bb} scoring failed: {e}", file=sys.stderr)
        if results:
            break       # B=1 is the fallback, not an extra config
    if not results:
        return {"error": "all 13b scoring configs failed"}
    rec = _scoring_record(results, model="13b")
    del rec["vs_baseline"]      # the A100 baseline derivation is 7B-only
    return rec


def bench_rollout_decode(b: int = 16, steps: int = 896,
                         kv_bits: int = 8, model: str = "7b") -> dict:
    """Full-length rollout decode at the recommended decode config
    (bits=4 base, quantized prompt-KV + fused decode kernel, int4
    lm_head, chunk=256) — reference hot loop #1 (HF ``generate`` 896 new
    tokens, rl_models.py:146-191).  kv_bits 4 packs the prompt cache to
    int4 (group-local half-split layout, 256-aligned).  model="13b"
    runs the 13B single-chip ceiling (B=8 at kv8 — B=12 peaks 15.02 GB,
    below the headroom rule)."""
    from opadpo_tpu.constants import IMAGE_TOKEN_INDEX
    from opadpo_tpu.engine.sampler import decode_loop_unrolled
    from opadpo_tpu.engine.sampling import SamplingConfig
    from opadpo_tpu.models import llama as llama_model
    from opadpo_tpu.models import llava as llava_model
    from opadpo_tpu.models.llava import LlavaConfig
    from opadpo_tpu.ops import quant

    quant.set_act_quant(False)
    cfg = (LlavaConfig.llava_13b() if model == "13b"
           else LlavaConfig.llava_7b())
    chunk = 256

    def build():
        params = llava_model.init_params(jax.random.PRNGKey(0), cfg)
        params = quant.quantize_params(params, bits=4)
        llama = llama_model.fuse_for_inference(params["llama"])
        llama = llama_model.quantize_head_for_decode(llama, 4)
        return {**params, "llama": llama_model.unstack_layers(llama)}

    shapes = jax.eval_shape(build)
    params = jax.jit(lambda: jax.tree_util.tree_map(
        lambda s: jnp.full(s.shape, 0.01, s.dtype), shapes))()

    rng = np.random.default_rng(0)
    q = rng.integers(5, 32000, (b, 128)).astype(np.int32)
    q[:, 1] = IMAGE_TOKEN_INDEX
    images = jnp.zeros((b, 336, 336, 3), jnp.bfloat16)
    # quantize_kv=True: the bf16 prompt cache never leaves the prefill
    # program (per-layer intermediate) — it was the decode-batch HBM
    # ceiling next to the int8 cache.  Preallocated at final length so
    # the chunk folds are in-place (fold_suffix_into_prompt_kv).
    s_prompt = 128 - 1 + cfg.num_patches
    align = 256 if kv_bits == 4 else 128
    sp_pad0 = -(-s_prompt // align) * align
    kv_total = sp_pad0 + (-(-steps // chunk) - 1) * chunk
    pf_fn = jax.jit(lambda p, q_, m_, im: llava_model.prefill_unrolled(
        p, cfg, q_, m_, im, quantize_kv=True, kv_total_len=kv_total,
        kv_bits=kv_bits))
    pf = pf_fn(params, jnp.asarray(q), jnp.ones_like(jnp.asarray(q)),
               images)
    _ = float(jnp.sum(pf["last_logits"]))

    sampling = SamplingConfig(max_new_tokens=steps, temperature=1.0,
                              top_k=30, top_p=0.95, eos_token_id=-1,
                              pad_token_id=0)
    chunk_fn = jax.jit(
        lambda p, kv, pm, pos, ll, r, d0, n, su: decode_loop_unrolled(
            p, cfg, list(kv), pm, pos, ll, r, sampling,
            done_init=d0, max_new=n, return_state=True, sp_used=su),
        static_argnums=(7, 8))
    fold_fn = jax.jit(
        lambda kv, sfx, pm, filled, off:
        llama_model.fold_suffix_into_prompt_kv(
            list(kv), list(sfx), pm, filled, off),
        donate_argnums=(0, 1, 2))

    def run(kv0, rng_key):
        # consumes kv0 (the folds donate it): callers pass a fresh
        # prefill cache per run — a held duplicate is the batch ceiling
        sp_total = kv0[0][0]["scale"].shape[2]
        pm = jnp.pad(pf["key_mask"],
                     ((0, 0), (0, sp_total - pf["key_mask"].shape[1])))
        kv, pos, ll = tuple(kv0), pf["next_position"], pf["last_logits"]
        done = jnp.zeros((b,), bool)
        n = 0
        n_chunks = -(-steps // chunk)
        for ci in range(n_chunks):
            nc = min(chunk, steps - ci * chunk)
            su = sp_pad0 + ci * chunk
            out_c, st = chunk_fn(params, kv, pm, pos, ll, rng_key, done,
                                 nc, su)
            n += int(st["step"])
            done, rng_key = st["done"], st["rng"]
            pos, ll = st["positions"], st["last_logits"]
            if ci < n_chunks - 1:
                kv, pm = fold_fn(kv, st["suffix"], pm, st["step"],
                                 jnp.int32(su))
                kv = tuple(kv)
        _ = int(jnp.sum(out_c))
        return n

    run(pf["kv_list"], jax.random.PRNGKey(1))   # compile all chunk shapes
    kv2 = pf_fn(params, jnp.asarray(q), jnp.ones_like(jnp.asarray(q)),
                images)["kv_list"]              # fresh cache for timing
    t0 = time.perf_counter()
    n = run(kv2, jax.random.PRNGKey(1))
    dt = time.perf_counter() - t0
    # decode is HBM-bound (one full weight read per step): report the
    # achieved weight-stream bandwidth next to tokens/s so the number is
    # self-interpreting (int4 base ≈ P/2 bytes + int4 head + KV reads,
    # which this floor estimate omits)
    wbytes = DECODER_PARAMS[model] / 2
    return {"steps_per_sec": round(n / dt, 1),
            "tokens_per_sec": round(n * b / dt, 1),
            "bound": "hbm",
            "weight_stream_gbs_floor": round(wbytes * n / dt / 1e9, 1),
            "config": f"{model}_int4_kv{kv_bits}_head4_chunk{chunk}_b{b}"
                      f"_steps{steps}"}


def bench_serving(slots: int = 16, requests: int = 32,
                  max_new: int = 512) -> dict:
    """Continuous (slot-pool) serving throughput + request latency on a
    short-heavy mixed-length workload (engine/continuous.py; the
    reference's HF ``generate`` is batch-synchronous — no equivalent).
    slots=16 is the measured-best pool on this chip (421 tok/s vs 355 at
    slots=8 on the same mixed workload, 2026-08-19); qlen/seg/max_new
    geometry matches scripts/bench_serve.py so compiled programs are
    shared with the standalone comparison benchmark."""
    from opadpo_tpu.constants import IMAGE_TOKEN_INDEX
    from opadpo_tpu.engine.serving_config import (
        make_continuous_engine, make_serving_sampling,
    )
    from opadpo_tpu.models import llama as llama_model
    from opadpo_tpu.models import llava as llava_model
    from opadpo_tpu.models.llava import LlavaConfig
    from opadpo_tpu.ops import quant

    quant.set_act_quant(False)
    cfg = LlavaConfig.llava_7b()

    def build():
        params = llava_model.init_params(jax.random.PRNGKey(0), cfg)
        params = quant.quantize_params(params, bits=4)
        llama = llama_model.fuse_for_inference(params["llama"])
        llama = llama_model.quantize_head_for_decode(llama, 4)
        return {**params, "llama": llama_model.unstack_layers(llama)}

    shapes = jax.eval_shape(build)
    params = jax.jit(lambda: jax.tree_util.tree_map(
        lambda s: jnp.full(s.shape, 0.01, s.dtype), shapes))()

    rng = np.random.default_rng(0)
    budgets = rng.choice(
        [max_new // 16, max_new // 8, max_new // 4, max_new // 2, max_new],
        size=requests, p=[0.25, 0.25, 0.2, 0.15, 0.15]).astype(int)
    reqs = []
    for i in range(requests):
        q = rng.integers(5, 32000, (128,)).astype(np.int32)
        q[1] = IMAGE_TOKEN_INDEX
        reqs.append((q, np.ones_like(q),
                     np.zeros((336, 336, 3), np.float32), int(budgets[i])))
    total_tokens = int(budgets.sum())
    # eos=-1 (never terminate — rows run to their budgets) is SAFE for
    # program sharing with serve.py: eos/pad are traced decode args now
    sampling = make_serving_sampling(max_new_tokens=max_new,
                                     eos_token_id=-1)
    eng = make_continuous_engine(cfg, sampling, params, slots=slots)

    def run():
        for q, m, im, budget in reqs:
            eng.add_request(q, m, im, max_new=budget)
        t0 = time.perf_counter()
        lat = []
        while eng.has_work():
            for _rid, _toks in eng.step():
                lat.append(time.perf_counter() - t0)
        assert len(lat) == requests, len(lat)
        return time.perf_counter() - t0, lat

    run()                       # compile warmup (prefill/segment/fold/admit)
    dt, lat = run()
    lat = np.asarray(lat)
    return {"tokens_per_sec": round(total_tokens / dt, 1),
            "latency_p50_s": round(float(np.percentile(lat, 50)), 2),
            "latency_p95_s": round(float(np.percentile(lat, 95)), 2),
            "config": f"int4_kv8_head4_slots{slots}_seg64_"
                      f"reqs{requests}_mixed{max_new}"}


def bench_sft_step(b: int = 4, seq: int = 1600, iters: int = 2,
                   quant_mode: str = "w8a8") -> dict:
    """OPA SFT step (reference hot loop #2: LLaVATrainer fwd/bwd on 4x
    A100, run/train_opa.sh; stage wall-clock ~30 min, README.md:121).

    quant_mode "w8a8" is the documented default (README "Numerics
    defaults"); "bf16" replicates the reference's bits=16 numerics for
    the both-variants wall-clock comparison (B is capped at 2 there —
    bf16 7B SFT B=4 needs 17.75 GB and does not fit this chip)."""
    from opadpo_tpu.constants import IMAGE_TOKEN_INDEX
    from opadpo_tpu.engine.sft import SftConfig, sft_train_step
    from opadpo_tpu.engine.train_state import (
        OptimizerConfig, TrainState, make_optimizer,
    )
    from opadpo_tpu.models import llava as llava_model
    from opadpo_tpu.models.llava import LlavaConfig
    from opadpo_tpu.models.lora import LoraConfig
    from opadpo_tpu.ops import quant

    cfg = LlavaConfig.llava_7b()
    lora_cfg = LoraConfig(rank=64, alpha=128.0)

    if quant_mode == "bf16" and os.environ.get("BENCH_PROBE_BF16") != "1":
        # Static skip, measured repeatedly (r4 09:48, r5 11:36): bf16 7B
        # SFT does not compile on 16 GB at ANY batch (B=1 compile-OOMs:
        # HTTP 500 tpu_compile_helper exit 1).  Re-probing every bench
        # run adds no information and the compile-OOM appears to RESTART
        # the axon service, invalidating the persistent compile cache
        # for every later run (observed 2026-08-20 ~11:41).  Set
        # BENCH_PROBE_BF16=1 to re-measure live (e.g. on a bigger chip).
        return {"skipped": "bf16 7B SFT does not compile on 16 GB "
                           "(static skip; measured r4/r5 — "
                           "BENCH_PROBE_BF16=1 re-probes live)",
                "config": f"bf16_r64_b{min(b, 2)}_seq{seq}"}

    if quant_mode == "bf16":
        quant.set_act_quant(False)
        b = min(b, 2)
        try:
            params = jax.jit(lambda: jax.tree_util.tree_map(
                lambda s: jnp.full(s.shape, 0.01, s.dtype),
                jax.eval_shape(lambda: llava_model.init_params(
                    jax.random.PRNGKey(0), cfg))))()
        except Exception as e:
            # The full bf16 7B pytree is ~13.5 GB — init itself can OOM
            # on a 16 GB chip.  Report a parseable skip, never a crash
            # (the subprocess harness must always find a JSON line).
            return {"skipped": f"bf16 param init failed: {str(e)[:120]}",
                    "config": f"bf16_r64_b{b}_seq{seq}"}
    else:
        # act_bwd_int8: measured grad-cosine 0.9999933 vs bf16 — identical
        # to the bf16-backward w8a8 mode (QUALITY_r03.json) at −12% step
        quant.set_act_quant(True, bwd_int8=True)
        params = jax.jit(lambda: jax.tree_util.tree_map(
            lambda s: jnp.full(s.shape, 0.01, s.dtype),
            jax.eval_shape(lambda: quant.quantize_params(
                llava_model.init_params(jax.random.PRNGKey(0), cfg)))))()
    lora0 = jax.jit(lambda: jax.tree_util.tree_map(
        lambda s: jnp.full(s.shape, 0.01, s.dtype),
        jax.eval_shape(lambda: llava_model.init_lora(
            jax.random.PRNGKey(1), cfg, lora_cfg, include_vision=True))))()

    rng = np.random.default_rng(0)
    ids = rng.integers(5, 32000, (b, seq)).astype(np.int32)
    ids[:, 1] = IMAGE_TOKEN_INDEX
    labels = ids.copy()
    labels[:, :128] = -100
    batch = {
        "input_ids": jnp.asarray(ids),
        "attention_mask": jnp.ones_like(jnp.asarray(ids)),
        "labels": jnp.asarray(labels),
        "images": jnp.zeros((b, 336, 336, 3), jnp.bfloat16),
    }
    tx = make_optimizer(OptimizerConfig(learning_rate=1e-5, warmup_steps=0,
                                        total_steps=10))
    state = TrainState.create(lora0, tx)
    scfg = SftConfig(lora_scaling=lora_cfg.scaling)
    step = jax.jit(lambda s, p, bt: sft_train_step(s, p, bt, tx, cfg, scfg),
                   donate_argnums=(0,))
    if quant_mode == "bf16":
        # A runtime OOM wedges the axon TPU service for hours (observed
        # 2026-08-17) — compile-only probe first and keep >=1.5 GB of
        # estimated headroom before executing an unproven (mode, batch).
        # The compile itself can OOM (recoverable HTTP 500): fall back to
        # B=1, the smallest honest bf16 measurement.
        try:
            compiled = step.lower(state, params, batch).compile()
        except Exception as e:
            if b > 1:
                return bench_sft_step(b=1, seq=seq, iters=iters,
                                      quant_mode="bf16")
            return {"skipped": f"bf16 b{b} does not compile on 16 GB: "
                               f"{str(e)[:120]}",
                    "config": f"bf16_r64_b{b}_seq{seq}"}
        try:
            ma = compiled.memory_analysis()
            peak = (ma.argument_size_in_bytes + ma.output_size_in_bytes
                    + ma.temp_size_in_bytes - ma.alias_size_in_bytes)
        except Exception:
            peak = None
        if peak is not None and peak / 1e9 > 14.25:
            if b > 1:
                return bench_sft_step(b=1, seq=seq, iters=iters,
                                      quant_mode="bf16")
            return {"skipped": f"bf16 b{b} est peak {peak/1e9:.2f} GB "
                               "> 14.25 GB headroom rule",
                    "config": f"bf16_r64_b{b}_seq{seq}"}
    try:
        state, stats = step(state, params, batch)
        _ = float(stats["loss/total"])
    except Exception as e:
        # Execution-time failure (e.g. a runtime OOM the compile-time
        # probe under-estimated): return a parseable skip so the bench
        # line still prints.  bf16 runs last in the loop order, so even
        # a wedged service cannot cost the earlier loops their numbers.
        return {"skipped": f"{quant_mode} b{b} failed at execution: "
                           f"{str(e)[:120]}",
                "config": f"{quant_mode}_r64_b{b}_seq{seq}"}
    t0 = time.perf_counter()
    for _ in range(iters):
        state, stats = step(state, params, batch)
    _ = float(stats["loss/total"])
    dt = (time.perf_counter() - t0) / iters
    tag = "w8a8_bwd8" if quant_mode == "w8a8" else "bf16"
    rec = {"seconds_per_step": round(dt, 3),
           "seq_per_sec_chip": round(b / dt, 3),
           "config": f"{tag}_r64_b{b}_seq{seq}"}
    # fwd + bwd + remat-fwd ≈ 4x the forward matmul FLOPs (approx)
    rec.update(_mfu_fields(tag, "7b", 4 * b * seq / dt))
    rec["mfu_note"] = "fwd+bwd+remat ~= 4x fwd matmul FLOPs, approx"
    return rec


def bench_dpo_step(b: int = 2, iters: int = 2, model: str = "7b") -> dict:
    """OPA-DPO train step, CoPO+AncPO 4 pairs (reference hot loop #3:
    compute_policy_loss + backward, dpo_trainer.py:475-802).  model="13b"
    runs the int4-base B=1 single-chip config (w8a8 requires bits=8,
    which does not fit 13B on 16 GB; B=2 probes 21.22 GB donated-est)."""
    from opadpo_tpu.constants import IMAGE_TOKEN_INDEX
    from opadpo_tpu.engine.dpo import DpoConfig, dpo_train_step, rollout_score
    from opadpo_tpu.engine.train_state import (
        OptimizerConfig, TrainState, make_optimizer,
    )
    from opadpo_tpu.models import llava as llava_model
    from opadpo_tpu.models.llava import LlavaConfig
    from opadpo_tpu.models.lora import LoraConfig
    from opadpo_tpu.ops import quant

    if model == "13b":
        quant.set_act_quant(False)
        cfg, b, bits, tag = LlavaConfig.llava_13b(), 1, 4, "int4"
    else:
        quant.set_act_quant(True, bwd_int8=True)
        cfg, bits, tag = LlavaConfig.llava_7b(), 8, "w8a8_bwd8"
    lora_cfg = LoraConfig(rank=64, alpha=128.0)
    dpo = DpoConfig(response_len=896, query_len=128,
                    lora_scaling=lora_cfg.scaling)

    params = jax.jit(lambda: jax.tree_util.tree_map(
        lambda s: jnp.full(s.shape, 0.01, s.dtype),
        jax.eval_shape(lambda: quant.quantize_params(
            llava_model.init_params(jax.random.PRNGKey(0), cfg),
            bits=bits))))()

    def cheap_lora(seed):
        return jax.jit(lambda: jax.tree_util.tree_map(
            lambda s: jnp.full(s.shape, 0.01, s.dtype),
            jax.eval_shape(lambda: llava_model.init_lora(
                jax.random.PRNGKey(seed), cfg, lora_cfg))))()

    rng = np.random.default_rng(0)
    q = rng.integers(5, 32000, (b, dpo.query_len)).astype(np.int32)
    q[:, 1] = IMAGE_TOKEN_INDEX
    batch = {
        "queries": jnp.asarray(q),
        "queries_attention_mask": jnp.ones_like(jnp.asarray(q)),
        "images": jnp.zeros((b, 336, 336, 3), jnp.bfloat16),
    }
    for name in ("standard_response", "original_generate_response",
                 "AI_pseudo_response"):
        ids = rng.integers(5, 32000, (b, dpo.response_len)).astype(np.int32)
        ids[:, -64:] = 0
        batch[name] = jnp.asarray(ids)
        batch[name + "_attention_mask"] = jnp.asarray(
            (ids != 0).astype(np.int32))
    batch["AI_pseudo_response_scores"] = jnp.full(
        (b, dpo.response_len), 2.0, jnp.float32)
    batch["original_generate_response_scores"] = jnp.ones(
        (b, dpo.response_len), jnp.float32)
    batch["AI_pseudo_response_image_relations"] = jnp.full(
        (b, dpo.response_len), 1.0, jnp.float32)

    ref_lora = cheap_lora(1)
    roll = jax.jit(lambda p, rl, bt, r: rollout_score(p, cfg, dpo, rl, bt, r))
    rollouts = roll(params, ref_lora, batch, jax.random.PRNGKey(2))
    _ = float(jnp.sum(rollouts["ref_base_standard_response_logprobs"]))
    t0 = time.perf_counter()
    rollouts = roll(params, ref_lora, batch, jax.random.PRNGKey(2))
    _ = float(jnp.sum(rollouts["ref_base_standard_response_logprobs"]))
    roll_dt = time.perf_counter() - t0

    full_batch = {**batch, **dict(rollouts)}
    tx = make_optimizer(OptimizerConfig(learning_rate=1e-6, warmup_steps=0,
                                        total_steps=10))
    state = TrainState.create(cheap_lora(3), tx)
    step = jax.jit(lambda s, p, bt: dpo_train_step(s, p, bt, tx, cfg, dpo),
                   donate_argnums=(0,))
    state, stats = step(state, params, full_batch)
    _ = float(stats["loss/total"])
    t0 = time.perf_counter()
    for _ in range(iters):
        state, stats = step(state, params, full_batch)
    _ = float(stats["loss/total"])
    dt = (time.perf_counter() - t0) / iters
    # fwd + bwd + remat-fwd ≈ 4x the forward matmul FLOPs over the real
    # (shared-prefix) positions; approximate, for self-interpretation only
    prefix = dpo.query_len - 1 + cfg.num_patches
    positions = b * (prefix + 3 * dpo.response_len)
    rec = {"seconds_per_step": round(dt, 3),
           "rollout_score_seconds": round(roll_dt, 3),
           "config": f"{tag}_r64_copo_ancpo_b{b}"
                     + ("_13b" if model == "13b" else "")}
    rec.update(_mfu_fields(tag, model, 4 * positions / dt))
    rec["mfu_note"] = "fwd+bwd+remat ~= 4x fwd matmul FLOPs, approx"
    return rec


def bench_flash_attention() -> dict:
    """Fallback benchmark if the 7B model does not fit."""
    from opadpo_tpu.ops.attention import flash_attention

    b, s, h, d = 4, 1664, 32, 128
    key = jax.random.PRNGKey(0)
    q = jax.random.normal(key, (b, s, h, d), jnp.bfloat16)
    k = jax.random.normal(key, (b, s, h, d), jnp.bfloat16)
    v = jax.random.normal(key, (b, s, h, d), jnp.bfloat16)
    km = jnp.ones((b, s), jnp.int32)
    f = jax.jit(lambda q, k, v: flash_attention(q, k, v, key_mask=km,
                                                causal=True))
    o = f(q, k, v)
    _ = float(jnp.sum(o.astype(jnp.float32)))
    n = 20
    t0 = time.perf_counter()
    for _ in range(n):
        o = f(o, k, v)
    _ = float(jnp.sum(o.astype(jnp.float32)))
    dt = (time.perf_counter() - t0) / n
    tflops = 4 * b * h * s * s * d * 0.5 / dt / 1e12
    return {
        "metric": "flash_attention_fwd_tflops",
        "value": round(tflops, 2),
        "unit": "TFLOP/s",
        "vs_baseline": round(tflops / 100.0, 3),   # vs flash-attn2 on A100
    }


_HOT_LOOPS = {
    "rollout_decode": lambda: bench_rollout_decode(),
    "sft_step": lambda: bench_sft_step(),
    "dpo_step": lambda: bench_dpo_step(),
    "serving_continuous": lambda: bench_serving(),
    "sft_step_bf16": lambda: bench_sft_step(quant_mode="bf16"),
    # 13B single-chip records (BASELINE.json config #5; VERDICT r4 ask 1):
    # int4-g128 base throughout — bf16/int8 13B do not fit 16 GB
    "scoring_13b": lambda: bench_scoring_13b(),
    "rollout_decode_13b": lambda: bench_rollout_decode(b=8, model="13b"),
    "dpo_step_13b": lambda: bench_dpo_step(model="13b"),
}

# Execution order under the wall-clock budget.  The 13B loops run before
# serving_continuous and sft_step_bf16: under budget pressure the first
# loops to survive must be the first-class BASELINE #5 evidence
# (VERDICT r4 ask 1) — serving already has standalone A/B artifacts
# (bench_serve --out) and the bf16 probe's outcome is a documented
# permanent skip (does not compile on 16 GB).
_HOT_LOOP_ORDER = (
    "rollout_decode", "sft_step", "dpo_step",
    "scoring_13b", "rollout_decode_13b", "dpo_step_13b",
    "serving_continuous", "sft_step_bf16",
)

# A hot loop is only attempted when at least this much budget remains:
# warm-cache runs finish well inside it, and a cold compile that cannot
# finish is better skipped explicitly than timed out after eating the
# rest of the window (the BENCH_r03 failure mode).
_MIN_LOOP_BUDGET_S = 300.0


def _run_hot_loop_subprocess(name: str, timeout_s: float) -> dict:
    """Each hot-loop bench runs in its OWN process: after the scoring
    bench (which transiently holds the bf16 7B pytree), in-process HBM
    fragmentation intermittently OOMs the follow-on benches — a fresh
    device context per bench is deterministic."""
    import subprocess
    try:
        proc = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--only", name],
            capture_output=True, text=True, timeout=timeout_s)
    except subprocess.TimeoutExpired:
        return {"error": f"timeout after {int(timeout_s)}s"}
    for line in reversed(proc.stdout.strip().splitlines()):
        line = line.strip()
        if line.startswith("{"):
            return json.loads(line)
    return {"error": (proc.stderr or "no output")[-200:]}


def _probe_device(timeout_s: int = 420, attempts: int = 2) -> bool:
    """A device-side OOM can wedge the axon TPU service for an hour
    (observed twice) and a wedged service HANGS rather than erroring —
    which would stall this whole bench.  Probe with a tiny transfer in a
    subprocess so a wedged service fails fast and visibly.

    Two generous attempts, not one tight one: a HEALTHY probe measured
    152 s under CPU contention (2026-08-19 — a parallel pytest run), so
    a 240 s single shot false-negatived the whole bench into the
    diagnostic path.  A truly wedged service still fails both attempts
    well inside the driver's window."""
    import subprocess
    code = ("import numpy as np, jax\n"
            "x = jax.device_put(np.ones((8, 8), np.float32))\n"
            "assert float(np.asarray(x).sum()) == 64.0\n")
    for _ in range(attempts):
        try:
            proc = subprocess.run([sys.executable, "-c", code],
                                  capture_output=True, timeout=timeout_s)
            if proc.returncode == 0:
                return True
        except subprocess.TimeoutExpired:
            pass
    return False


def _annotate(result: dict) -> dict:
    """Derived fields recomputed on every emission so each printed line
    is a complete record on its own."""
    hot_loops = result.get("hot_loops", {})

    # Projected v5e-8 OPA-stage wall-clock vs the reference's ~30 min on
    # 4x A100 (README.md:121): 4.8k pairs x 2 response types x 2 epochs
    # of SFT sequences, data-parallel over 8 chips.  Emitted for BOTH
    # numerics variants (README "Numerics defaults": w8a8 default,
    # bits=16 opt-out) when their SFT loops have run.
    total_seq = 4800 * 2 * 2
    for loop, key in (("sft_step", "projected_v5e8_opa_stage_minutes"),
                      ("sft_step_bf16",
                       "projected_v5e8_opa_stage_minutes_bf16")):
        sft = hot_loops.get(loop, {})
        if "seq_per_sec_chip" in sft:
            minutes = total_seq / (8 * sft["seq_per_sec_chip"]) / 60.0
            result[key] = round(minutes, 1)
            result["reference_a100x4_opa_stage_minutes"] = 30.0

    # Projected v5e-8 DPO-stage wall-clock: 9.6k pairs, rollout-scoring
    # + noptepochs=2 policy steps at the measured per-step costs,
    # data-parallel over 8 chips (reference stage ~120 min, README:121).
    dpo = hot_loops.get("dpo_step", {})
    if "seconds_per_step" in dpo and "rollout_score_seconds" in dpo:
        pairs, b = 9600, 2
        sec = (pairs / b / 8) * (dpo["rollout_score_seconds"]
                                 + 2 * dpo["seconds_per_step"])
        result["projected_v5e8_dpo_stage_minutes"] = round(sec / 60.0, 1)
        result["reference_a100x4_dpo_stage_minutes"] = 120.0

    # Projected v5e-8 rollout-stage wall-clock (SURVEY §3.1 hot loop #1):
    # 2 phases x 2500 samples x 896 new tokens at the measured full-896
    # chunked-decode throughput, data-parallel over 8 chips.  GPT-4V
    # correction runs async/overlapped (pipeline/online_generation.py)
    # and is API-bound, so it is excluded from the device projection.
    roll = hot_loops.get("rollout_decode", {})
    if "tokens_per_sec" in roll:
        tokens = 2 * 2500 * 896
        result["projected_v5e8_rollout_stage_minutes"] = round(
            tokens / (8 * roll["tokens_per_sec"]) / 60.0, 1)
        result["rollout_projection_note"] = (
            "decode only; GPT-4V correction is async-overlapped and "
            "API-bound")

    # 13B stage projections (BASELINE #5: 13B full pipeline) from the
    # 13B hot-loop records, same batch math as the 7B projections.
    dpo13 = hot_loops.get("dpo_step_13b", {})
    if "seconds_per_step" in dpo13:
        pairs, b13 = 9600, 1
        roll_s = dpo13.get("rollout_score_seconds", 0.0)
        sec = (pairs / b13 / 8) * (roll_s + 2 * dpo13["seconds_per_step"])
        result["projected_v5e8_dpo_stage_minutes_13b"] = round(sec / 60.0, 1)
    roll13 = hot_loops.get("rollout_decode_13b", {})
    if "tokens_per_sec" in roll13:
        tokens = 2 * 2500 * 896
        result["projected_v5e8_rollout_stage_minutes_13b"] = round(
            tokens / (8 * roll13["tokens_per_sec"]) / 60.0, 1)

    # Annotate the headline with the measured quantization-quality cost
    # (scripts/bench_quality.py artifact) so the w8a8 number is never read
    # without its divergence-vs-bf16 context.
    import glob as _glob
    import re as _re

    def _round_key(p):
        # numeric round sort — lexicographic misorders double-digit rounds
        # (QUALITY_r9 would sort after QUALITY_r10); fall back to mtime
        m = _re.search(r"QUALITY_r(\d+)", os.path.basename(p))
        rnd = int(m.group(1)) if m else -1
        try:
            mt = os.path.getmtime(p)
        except OSError:
            mt = 0.0
        return (rnd, mt)

    qcands = sorted(_glob.glob(os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "QUALITY_r*.json")),
        key=_round_key)
    if "config" in result:
        mode = result.get("config", "").split("_b")[0]
        # newest artifact that actually carries a scoring entry for this
        # mode wins (partial artifacts like QUALITY_r04_decode.json hold
        # only the decode section — skip them, don't drop the annotation)
        for qpath in reversed(qcands):
            try:
                with open(qpath) as f:
                    q = json.load(f)
                # everything below must stay inside the try: a malformed
                # artifact (non-dict top level, non-dict scoring entry)
                # must never crash emit() — an unprinted JSON line is the
                # BENCH_r03 failure mode this file exists to prevent
                entry = q.get("scoring", {}).get(mode)
                if not entry:
                    continue
                result["quality_vs_bf16"] = {
                    "mode": mode,
                    "logprob_mae": entry.get("logprob_mae"),
                    "lora_grad_cosine": entry.get(
                        "lora_grad_cosine_vs_bf16",
                        entry.get("lora_grad_cosine_vs_int8")),
                    "artifact": os.path.basename(qpath),
                }
                break
            except Exception as e:
                print(f"quality annotation failed: {e}", file=sys.stderr)
                continue
    return result


def main():
    import argparse
    ap = argparse.ArgumentParser()
    ap.add_argument("--only", choices=sorted(_HOT_LOOPS),
                    help="run one hot-loop bench and print its JSON "
                         "(used by the subprocess isolation)")
    ap.add_argument("--budget-s", type=float,
                    default=float(os.environ.get("BENCH_BUDGET_S", "9000")),
                    help="total wall-clock budget; remaining hot loops "
                         "are skipped (marked) once it is exhausted")
    args = ap.parse_args()
    if args.only:
        print(json.dumps(_HOT_LOOPS[args.only]()))
        return

    t_start = time.perf_counter()

    def remaining() -> float:
        return args.budget_s - (time.perf_counter() - t_start)

    def emit(record: dict) -> None:
        # One complete JSON record per line, flushed immediately: the
        # driver parses the LAST JSON line in the tail, so partial
        # progress survives a kill (BENCH_r03 was rc-124/null because a
        # single print waited on every hot loop).
        print(json.dumps(_annotate(record)), flush=True)

    last_good_path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "bench_last_good.json")
    if not _probe_device():
        record = {
            "metric": "llava7b_dpo_score_tokens_per_sec", "value": 0.0,
            "unit": "tokens/s", "vs_baseline": 0.0,
            "error": "TPU service unreachable (device probe timed out — "
                     "likely wedged after a device OOM; retry in ~1h)"}
        try:
            with open(last_good_path) as f:
                record["last_good"] = json.load(f)
        except (OSError, json.JSONDecodeError):
            pass        # missing or corrupt record must not kill the
        print(json.dumps(record))   # diagnostic line it exists to serve
        return

    try:
        result = bench_dpo_scoring(on_update=emit)
    except Exception as e:                          # OOM / compile failure
        print(f"7B scoring bench failed ({e}); falling back",
              file=sys.stderr)
        result = bench_flash_attention()
        print(json.dumps(result))
        return

    # All hot loops in one driver-captured artifact (VERDICT r2 item 3):
    # scoring is the headline; rollout decode / SFT / DPO step / serving
    # land in hot_loops so regressions are bench-visible.  Cumulative
    # re-emission after each loop + an explicit budget keep the artifact
    # non-empty no matter where the driver's window ends (VERDICT r3
    # item 1).
    hot_loops = {}
    result["hot_loops"] = hot_loops
    emit(result)
    for name in _HOT_LOOP_ORDER:
        budget_left = remaining()
        if budget_left < _MIN_LOOP_BUDGET_S:
            hot_loops[name] = {"skipped": "budget"}
            emit(result)
            continue
        try:
            # Per-loop cap: the longest observed cold compile+run is
            # scoring_13b at ~28 min; a service that wedges mid-loop
            # must not consume the entire remaining budget (45 min cap
            # leaves the tail loops their attempt).
            hot_loops[name] = _run_hot_loop_subprocess(
                name, min(budget_left, 2700.0))
        except Exception as e:
            print(f"{name} bench failed: {e}", file=sys.stderr)
            hot_loops[name] = {"error": str(e)[:200]}
        emit(result)

    # preserved verbatim for the unreachable-device record above — only
    # when FULLY good (a mid-bench wedge would otherwise clobber the
    # genuine record with one whose hot loops are all errors), and
    # written atomically (a truncated file would corrupt the fallback)
    def _degrading(v: dict) -> bool:
        # A loop blocks the last-good snapshot only when something went
        # WRONG: an error, a budget starvation, or an execution failure.
        # Deliberate capability skips (bf16 7B SFT does not compile on
        # 16 GB — the documented permanent outcome) must not stop the
        # record from refreshing, or it would go stale forever.
        if "error" in v:
            return True
        sk = v.get("skipped", "")
        return sk == "budget" or "failed" in sk
    degraded = any(_degrading(v) for v in hot_loops.values())
    if not degraded:
        try:
            tmp = last_good_path + ".tmp"
            with open(tmp, "w") as f:
                json.dump({"measured_at":
                           time.strftime("%Y-%m-%dT%H:%M:%S"),
                           "result": result}, f)
            os.replace(tmp, last_good_path)
        except OSError as e:
            print(f"last-good record not written: {e}", file=sys.stderr)


if __name__ == "__main__":
    main()
