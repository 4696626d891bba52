"""Speculative-decode A/B on the real chip (VERDICT r4 ask 5).

Measures 7B decode (int4 base, int8 prompt KV, int4 lm_head — the
recommended single-chip decode numerics) at small batch:

  baseline   — normal decode_loop_unrolled
  spec:oracle@a — controlled acceptance: the oracle draft is the true
                greedy continuation with tokens corrupted w.p. (1−a);
                measures the machinery's speedup curve vs accept rate
  spec:ngram — the honest zero-cost draft on this (random-weight)
                workload

Exact-distribution sampling is preserved by construction (greedy spec
bit-matches greedy — tests/test_speculative.py); random-init weights
make real-text acceptance unmeasurable offline, which is exactly why
the oracle sweep exists.  Writes SPEC_r05.json at the repo root.

    python scripts/bench_spec.py [--batch 1] [--steps 256] [--k 4]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax                                                    # noqa: E402
import jax.numpy as jnp                                       # noqa: E402

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.dirname(
                      os.path.abspath(__file__))), ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=1)
    ap.add_argument("--steps", type=int, default=256)
    ap.add_argument("--k", type=int, default=4)
    ap.add_argument("--model", default="7b", choices=("7b", "13b", "tiny"))
    ap.add_argument("--greedy", action="store_true", default=True)
    ap.add_argument("--sampled", dest="greedy", action="store_false",
                    help="temperature-1.0 top-k-30 target instead of greedy")
    ap.add_argument("--accept-rates", default="1.0,0.8,0.6")
    ap.add_argument("--advance", default="shared",
                    choices=("shared", "per_row"),
                    help="per_row: every row keeps its own accepted run "
                         "(kills the min-over-batch throttle at B>1)")
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    from opadpo_tpu.constants import IMAGE_TOKEN_INDEX
    from opadpo_tpu.engine.sampler import decode_loop_unrolled
    from opadpo_tpu.engine.serving_config import make_serving_sampling
    from opadpo_tpu.engine.speculative import SpecConfig, decode_loop_spec
    from opadpo_tpu.models import llama as llama_model
    from opadpo_tpu.models import llava as llava_model
    from opadpo_tpu.models.llava import LlavaConfig
    from opadpo_tpu.ops import quant

    quant.set_act_quant(False)
    cfg = {"7b": LlavaConfig.llava_7b, "13b": LlavaConfig.llava_13b,
           "tiny": LlavaConfig.tiny}[args.model]()
    if args.model == "tiny":
        jax.config.update("jax_platforms", "cpu")
    b, steps, k = args.batch, args.steps, args.k

    def build():
        params = llava_model.init_params(jax.random.PRNGKey(0), cfg)
        params = quant.quantize_params(params, bits=4)
        llama = llama_model.fuse_for_inference(params["llama"])
        llama = llama_model.quantize_head_for_decode(llama, 4)
        return {**params, "llama": llama_model.unstack_layers(llama)}

    shapes = jax.eval_shape(build)
    params = jax.jit(lambda: jax.tree_util.tree_map(
        lambda s: jnp.full(s.shape, 0.01, s.dtype), shapes))()

    rng_np = np.random.default_rng(0)
    qlen = 128 if args.model != "tiny" else 10
    v = cfg.llama.vocab_size
    q = rng_np.integers(5, v, (b, qlen)).astype(np.int32)
    q[:, 1] = IMAGE_TOKEN_INDEX
    sz = cfg.vision.image_size
    images = jnp.zeros((b, sz, sz, 3), jnp.bfloat16)
    pf_fn = jax.jit(lambda p, q_, m_, im: llava_model.prefill_unrolled(
        p, cfg, q_, m_, im, quantize_kv=True, kv_bits=8))
    pf = pf_fn(params, jnp.asarray(q), jnp.ones_like(jnp.asarray(q)),
               images)
    _ = float(jnp.sum(pf["last_logits"]))

    if args.greedy:
        sampling = make_serving_sampling(max_new_tokens=steps,
                                         eos_token_id=-1, greedy=True,
                                         top_k=0, top_p=1.0,
                                         temperature=1e-4)
    else:
        sampling = make_serving_sampling(max_new_tokens=steps,
                                         eos_token_id=-1)

    base_fn = jax.jit(lambda p, pk, pm, pos, ll, r: decode_loop_unrolled(
        p, cfg, list(pk), pm, pos, ll, r, sampling))

    def timed(fn, *a):
        out = fn(*a)
        tokens = out[0] if isinstance(out, tuple) else out
        _ = int(jnp.sum(tokens))                 # force device completion
        t0 = time.perf_counter()
        out = fn(*a)
        tokens = out[0] if isinstance(out, tuple) else out
        _ = int(jnp.sum(tokens))
        dt = time.perf_counter() - t0
        return out, dt

    kv = tuple(pf["kv_list"])
    common = (params, kv, pf["key_mask"], pf["next_position"],
              pf["last_logits"], jax.random.PRNGKey(1))
    base_out, base_dt = timed(base_fn, *common)
    rec = {"model": args.model, "batch": b, "steps": steps, "k": k,
           "target": "greedy" if args.greedy else "sampled_topk30",
           "advance": args.advance,
           "config": "int4_kv8_head4",
           "baseline": {"steps_per_sec": round(steps / base_dt, 1),
                        "tokens_per_sec": round(steps * b / base_dt, 1)}}
    print(json.dumps({"baseline": rec["baseline"]}), flush=True)

    def run_spec(draft, oracle=None, label=None):
        spec = SpecConfig(k=k, draft=draft, advance=args.advance)
        fn = jax.jit(lambda p, pk, pm, pos, ll, r, o: decode_loop_spec(
            p, cfg, list(pk), pm, pos, ll, r, sampling, spec,
            oracle_tokens=o))
        o = (oracle if oracle is not None
             else jnp.zeros((b, steps + k + 1), jnp.int32))
        (out, stats), dt = timed(fn, *common, o)
        tk = np.asarray(stats["tokens"])
        # shared: scalar tokens (batch-uniform); per_row: [B] per-row
        total_toks = int(tk.sum()) if tk.ndim else int(tk) * b
        min_toks = int(tk.min()) if tk.ndim else int(tk)
        groups = int(stats["groups"])
        acc = int(stats["accepted_drafts"])
        # accepted_drafts counts per-row in per_row mode (≤ B·k/group)
        denom = groups * k * (b if args.advance == "per_row" else 1)
        entry = {
            "tokens_per_sec": round(total_toks / dt, 1),
            "emitted_per_group": round(total_toks / b / max(groups, 1), 2),
            "accept_rate": round(acc / max(denom, 1), 3),
            "groups": groups,
            "speedup_vs_baseline": round(
                (total_toks / dt) / (steps * b / base_dt), 2),
        }
        if args.greedy:
            entry["exact_match_baseline"] = bool(
                np.array_equal(np.asarray(out)[:, :min_toks],
                               np.asarray(base_out)[:, :min_toks]))
        rec[label or f"spec_{draft}"] = entry
        print(json.dumps({label or f"spec_{draft}": entry}), flush=True)

    # controlled-acceptance oracle sweep: corrupt the true continuation
    base_np = np.asarray(base_out)
    for a in [float(x) for x in args.accept_rates.split(",")]:
        orac = base_np.copy()
        mask = rng_np.random(orac.shape) > a
        orac[mask] = rng_np.integers(5, v, mask.sum())
        orac = np.pad(orac, ((0, 0), (0, k + 1)))
        run_spec("oracle", jnp.asarray(orac, jnp.int32),
                 label=f"spec_oracle_a{a}")

    run_spec("ngram")

    out_path = args.out or os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "SPEC_r05.json")
    with open(out_path, "w") as f:
        json.dump(rec, f, indent=1)
    print(json.dumps(rec), flush=True)


if __name__ == "__main__":
    main()
