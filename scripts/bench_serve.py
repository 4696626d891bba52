"""Serving-throughput benchmark: continuous (slot-pool) batching vs
batch-synchronous generate on mixed-length requests, 7B shapes, one chip.

The reference serves nothing (HF ``generate`` inside offline scripts);
this measures the scheduling win the continuous engine adds: with
response lengths drawn from a mixed distribution, batch-sync decode pays
the batch max every round while the slot pool refills as requests finish.

    python scripts/bench_serve.py [--bits 4] [--slots 8] [--requests 32]
        [--seg-len 64] [--max-new 512] [--mode both|continuous|batch]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.dirname(
                      os.path.abspath(__file__))), ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--model", default="7b", choices=("7b", "13b", "tiny"))
    p.add_argument("--platform", default=None,
                   help="force a jax platform (\"cpu\" validates the "
                        "script end-to-end without the chip; the axon "
                        "plugin ignores the env var, so this uses "
                        "jax.config)")
    p.add_argument("--bits", type=int, default=4, choices=(16, 8, 4))
    p.add_argument("--head-bits", type=int, default=4, choices=(16, 8, 4))
    p.add_argument("--kv-bits", type=int, default=8, choices=(8, 4),
                   help="KV-cache quantization for BOTH modes (4 halves "
                        "cache memory -> more slots fit)")
    p.add_argument("--slots", type=int, default=8,
                   help="slot-pool size (default 8 for A/B continuity; "
                        "16 measured best for 7B throughput — 421 vs "
                        "355 tok/s — and is bench.py's serving default)")
    p.add_argument("--requests", type=int, default=32)
    p.add_argument("--seg-len", type=int, default=64)
    p.add_argument("--admit-group", type=int, default=4, choices=(1, 2, 4))
    p.add_argument("--max-new", type=int, default=512)
    p.add_argument("--query-len", type=int, default=128)
    p.add_argument("--mode", default="both",
                   choices=("both", "continuous", "batch"))
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--budget-mix", default="short",
                   choices=("short", "long", "uniform"),
                   help="response-length distribution: 'short' = "
                        "short-heavy chat/VQA traffic (default, keeps "
                        "historical A/B comparability); 'long' = "
                        "long-heavy like rollout generation, where "
                        "detailed-caption responses skew toward the "
                        "896-token cap but EOS still varies lengths "
                        "(reference run/online_generate.sh:79,118); "
                        "'uniform' = every request at max_new — the "
                        "continuous engine's worst case (no length "
                        "variance to exploit; measures pure overhead)")
    p.add_argument("--spec-k", type=int, default=0,
                   help="speculative segments in the continuous engine: "
                        "verify k drafts per group (per-row advance; "
                        "greedy bit-identical; needs --kv-bits 8)")
    p.add_argument("--spec-draft", default="ngram",
                   choices=("ngram", "oracle", "pad"),
                   help="'oracle' feeds each request its own warmup-run "
                        "continuation corrupted to --spec-accept — the "
                        "controlled-acceptance A/B (random-init weights "
                        "make ngram acceptance unrepresentative)")
    p.add_argument("--spec-accept", type=float, default=0.8,
                   help="oracle draft corruption target (per-token "
                        "keep probability)")
    p.add_argument("--greedy", action="store_true",
                   help="greedy decoding instead of the serving default "
                        "(top-k 30 / top-p 0.95); forced on for "
                        "--spec-draft oracle, whose warmup-seeded drafts "
                        "and exact-match check need a deterministic "
                        "target")
    p.add_argument("--out", default=None,
                   help="write the A/B record to this JSON path")
    args = p.parse_args()
    record = {"model": args.model, "requests": args.requests,
              "slots": args.slots, "max_new": args.max_new,
              "bits": args.bits, "kv_bits": args.kv_bits,
              "head_bits": args.head_bits, "query_len": args.query_len,
              "budget_mix": args.budget_mix}
    if args.platform:
        jax.config.update("jax_platforms", args.platform)

    from opadpo_tpu.constants import IMAGE_TOKEN_INDEX
    from opadpo_tpu.engine.sampler import Sampler
    from opadpo_tpu.engine.serving_config import (
        make_continuous_engine, make_serving_sampling,
    )
    from opadpo_tpu.models import llama as llama_model
    from opadpo_tpu.models import llava as llava_model
    from opadpo_tpu.ops import quant

    cfg = {"7b": llava_model.LlavaConfig.llava_7b,
           "13b": llava_model.LlavaConfig.llava_13b,
           "tiny": llava_model.LlavaConfig.tiny}[args.model]()

    def build():
        params = llava_model.init_params(jax.random.PRNGKey(0), cfg)
        if args.bits in (4, 8):
            params = quant.quantize_params(params, bits=args.bits)
        llama = llama_model.fuse_for_inference(params["llama"])
        llama = llama_model.quantize_head_for_decode(llama, args.head_bits)
        return {**params, "llama": llama_model.unstack_layers(llama)}

    shapes = jax.eval_shape(build)
    params = jax.jit(lambda: jax.tree_util.tree_map(
        lambda s: jnp.full(s.shape, 0.01, s.dtype), shapes))()
    print(f"params ready (model={args.model}, bits={args.bits})",
          flush=True)

    rng = np.random.default_rng(args.seed)
    # mixed response lengths: short-heavy, like real chat/VQA traffic
    # (fractions of max_new so the mix scales with the cap)
    mn = args.max_new
    if args.budget_mix == "short":
        budgets = rng.choice(
            [max(1, mn // 16), max(1, mn // 8), max(1, mn // 4),
             max(1, mn // 2), mn], size=args.requests,
            p=[0.25, 0.25, 0.2, 0.15, 0.15]).astype(int)
    elif args.budget_mix == "long":
        budgets = rng.choice(
            [max(1, mn // 4), max(1, mn // 2), max(1, 3 * mn // 4), mn],
            size=args.requests, p=[0.1, 0.2, 0.3, 0.4]).astype(int)
    else:  # uniform: every request runs to the cap
        budgets = np.full(args.requests, mn, dtype=int)
    print("budgets:", np.sort(budgets)[::-1][:12], "...", flush=True)
    reqs = []
    sz = cfg.vision.image_size
    for i in range(args.requests):
        q = rng.integers(5, cfg.llama.vocab_size,
                         (args.query_len,)).astype(np.int32)
        q[1] = IMAGE_TOKEN_INDEX
        reqs.append((q, np.ones_like(q),
                     np.zeros((sz, sz, 3), np.float32), int(budgets[i])))

    total_tokens = int(budgets.sum())

    def lat_str(lat):
        return (f"request latency mean {lat.mean():.1f}s "
                f"p50 {np.percentile(lat, 50):.1f}s "
                f"p95 {np.percentile(lat, 95):.1f}s")
    # shared constructor (engine/serving_config): program-affecting
    # values are pinned there so this benchmark's compiled programs are
    # byte-identical to serve.py's (eos/pad are traced decode args)
    if args.spec_k and args.spec_draft == "oracle":
        args.greedy = True
    if args.greedy:
        sampling = make_serving_sampling(max_new_tokens=args.max_new,
                                         eos_token_id=-1, greedy=True,
                                         top_k=0, top_p=1.0,
                                         temperature=1e-4)
    else:
        sampling = make_serving_sampling(max_new_tokens=args.max_new,
                                         eos_token_id=-1)
    record["target"] = "greedy" if args.greedy else "sampled_topk30"

    if args.mode in ("both", "continuous"):
        # ONE engine across warmup and timed pass: the jit wrappers are
        # per-instance, so a fresh engine would re-trace inside the timed
        # region (the drained pool is reusable — admission overwrites)
        eng = make_continuous_engine(cfg, sampling, params,
                                     slots=args.slots,
                                     qlen=args.query_len,
                                     seg_len=args.seg_len,
                                     max_admit_group=args.admit_group,
                                     kv_bits=args.kv_bits,
                                     spec_k=args.spec_k,
                                     spec_draft=args.spec_draft,
                                     collect_spec_stats=args.spec_k > 0)

        def run_continuous(oracles=None):
            rid_to_idx = {}
            for i, (q, m, im, budget) in enumerate(reqs):
                rid = eng.add_request(
                    q, m, im, max_new=budget,
                    oracle_tokens=None if oracles is None else oracles[i])
                rid_to_idx[rid] = i
            t0 = time.perf_counter()
            lat, outs = [], {}
            while eng.has_work():
                for rid, toks in eng.step():
                    lat.append(time.perf_counter() - t0)
                    outs[rid_to_idx[rid]] = np.asarray(toks)
            assert len(lat) == args.requests, len(lat)
            return time.perf_counter() - t0, np.asarray(lat), outs

        # compile warmup (prefill/seg/fold/admit); its outputs seed the
        # oracle drafts — greedy spec is bit-identical, so the timed
        # run's true continuations equal the warmup's
        _, _, warm_outs = run_continuous()
        oracles = None
        if args.spec_k and args.spec_draft == "oracle":
            oracles = []
            for i in range(args.requests):
                o = warm_outs[i].astype(np.int32).copy()
                corrupt = rng.random(o.shape) > args.spec_accept
                o[corrupt] = rng.integers(5, cfg.llama.vocab_size,
                                          int(corrupt.sum()))
                oracles.append(np.pad(o, (0, args.spec_k + 1)))
        eng.spec_stats = {"groups": 0, "accepted_drafts": 0, "tokens": 0}
        dt, lat, timed_outs = run_continuous(oracles)
        record["continuous"] = {
            "tokens_per_sec": round(total_tokens / dt, 1),
            "latency_p50_s": round(float(np.percentile(lat, 50)), 2),
            "latency_p95_s": round(float(np.percentile(lat, 95)), 2)}
        if args.spec_k:
            st = eng.spec_stats
            record["continuous"]["spec"] = {
                "k": args.spec_k, "draft": args.spec_draft,
                "target_accept": (args.spec_accept
                                  if args.spec_draft == "oracle" else None),
                "groups": st["groups"],
                "accepted_drafts": st["accepted_drafts"],
                "verify_tokens": st["tokens"],
                "exact_match_nonspec_warmup": all(
                    np.array_equal(warm_outs[i], timed_outs[i])
                    for i in range(args.requests))}
        print(f"continuous: {args.requests} reqs ({total_tokens} tok) in "
              f"{dt:.1f}s = {total_tokens/dt:.0f} tok/s "
              f"(slots={args.slots}, seg={args.seg_len}); "
              + lat_str(lat), flush=True)
        # free the slot-pool cache before the batch phase — at 896-token
        # budgets × 16 slots the pool + the batch sampler's chunked cache
        # do not fit HBM together (measured RESOURCE_EXHAUSTED)
        del run_continuous, eng
        import gc
        gc.collect()

    if args.mode in ("both", "batch"):
        # batch-synchronous: fill a batch, run ALL of it to the batch max
        # budget (HF-generate semantics with early-exit on all-EOS; with
        # eos=-1 synthetic rollouts, that is the max budget in the batch)
        s = Sampler(cfg, sampling, kv_bits=args.kv_bits,
                    head_bits=args.head_bits, chunk=256)
        params_d, _ = s.prepare_params(params)
        samplers = {}

        def run_batch():
            t0 = time.perf_counter()
            lat = []
            for i in range(0, args.requests, args.slots):
                chunk = reqs[i:i + args.slots]
                n_real = len(chunk)
                while len(chunk) < args.slots:
                    chunk.append(chunk[-1])
                q = jnp.asarray(np.stack([c[0] for c in chunk]))
                m = jnp.asarray(np.stack([c[1] for c in chunk]))
                im = jnp.asarray(np.stack([c[2] for c in chunk]),
                                 jnp.bfloat16)
                cap = -(-max(c[3] for c in chunk[:n_real]) // 128) * 128
                if cap not in samplers:
                    samplers[cap] = Sampler(
                        cfg, make_serving_sampling(
                            max_new_tokens=cap, eos_token_id=-1),
                        kv_bits=args.kv_bits, head_bits=args.head_bits,
                        chunk=256)
                out = samplers[cap].generate(params_d, q, m, im,
                                             jax.random.PRNGKey(i))
                _ = np.asarray(out)
                # every request in the batch responds only when the whole
                # batch does — that IS the batch-sync latency profile
                lat.extend([time.perf_counter() - t0] * n_real)
            return time.perf_counter() - t0, np.asarray(lat)

        run_batch()             # compile warmup per cap bucket
        dt, lat = run_batch()
        record["batch_sync"] = {
            "tokens_per_sec": round(total_tokens / dt, 1),
            "latency_p50_s": round(float(np.percentile(lat, 50)), 2),
            "latency_p95_s": round(float(np.percentile(lat, 95)), 2)}
        print(f"batch-sync: {args.requests} reqs ({total_tokens} tok) in "
              f"{dt:.1f}s = {total_tokens/dt:.0f} tok/s "
              f"(batch={args.slots}); " + lat_str(lat), flush=True)

    if "continuous" in record and "batch_sync" in record:
        record["continuous_speedup"] = round(
            record["continuous"]["tokens_per_sec"]
            / record["batch_sync"]["tokens_per_sec"], 2)
    import json
    print(json.dumps(record), flush=True)
    if args.out:
        with open(args.out, "w") as f:
            json.dump(record, f, indent=1)


if __name__ == "__main__":
    main()
