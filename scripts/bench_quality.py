"""Quantization QUALITY measurement at LLaVA-7B scale on the real chip.

The perf headline rides quantized modes (w8a8 / int4 / int8-KV / int4-head)
whose numeric cost vs the reference's bf16 (qlora_model.py:135-147 loads
bf16 + flash-attn) must be measured, not asserted.  For each mode, on
IDENTICAL inputs and the SAME underlying weights (deterministic on-device
init, quantized from the regenerated bf16 tensor):

- per-token logprob MAE / max-abs vs bf16 over the valid response tokens
  (DPO's raw signal);
- DPO pair-margin delta: |Δ(Σ chosen_lp − Σ rejected_lp)| for the
  GT≻gen and AI≻gen pairs (the quantity the sigmoid loss sees);
- LoRA-gradient cosine similarity for one full CoPO+AncPO train-step
  gradient (r=64), with the reference logprobs held fixed across modes.

Decode accelerators (same int8 weights, so the deltas isolate each knob):
- kv_bits=8: first-decode-step logit MAE vs the bf16-KV decode path;
- head_bits=4: first-step logit MAE vs the bf16 lm_head.

Writes QUALITY_r{N}.json at the repo root and prints the JSON.

Usage: python scripts/bench_quality.py [--out QUALITY_r03.json]
       [--response-len 896] [--batch 1]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

jax.config.update("jax_compilation_cache_dir", os.path.join(REPO, ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)


def _init_bf16_params(cfg, seed=0):
    """Realistic random-init 7B weights, generated ON DEVICE (one jitted
    program; quantization error depends on the weight distribution, so the
    cheap constant-fill used by the speed benches is not usable here)."""
    from opadpo_tpu.models import llava as llava_model
    return jax.jit(lambda: llava_model.init_params(
        jax.random.PRNGKey(seed), cfg))()


def _quantized_params(cfg, bits, seed=0):
    """Same weights as ``_init_bf16_params(seed)``, quantized, WITHOUT
    ever materializing the full bf16 pytree on device (the piecewise
    builder lives in the product now — models/llava.py, also used by
    ``skip_loading_weights`` full-scale runs)."""
    from opadpo_tpu.models import llava as llava_model
    return llava_model.init_params_quantized(
        jax.random.PRNGKey(seed), cfg, bits=bits)


def _lora(cfg, lora_cfg, seed=5):
    from opadpo_tpu.models import llava as llava_model
    lora = jax.jit(lambda: llava_model.init_lora(
        jax.random.PRNGKey(seed), cfg, lora_cfg))()
    # push B factors off zero so LoRA contributes to the forward
    return jax.tree_util.tree_map(
        lambda x: x + jnp.asarray(0.01, x.dtype), lora)


def _batch(cfg, dpo, b, rng_seed=0):
    from opadpo_tpu.constants import IMAGE_TOKEN_INDEX
    rng = np.random.default_rng(rng_seed)
    v = cfg.llama.vocab_size
    sz = cfg.vision.image_size
    q = rng.integers(5, v, (b, dpo.query_len)).astype(np.int32)
    q[:, 1] = IMAGE_TOKEN_INDEX
    batch = {
        "queries": jnp.asarray(q),
        "queries_attention_mask": jnp.ones_like(jnp.asarray(q)),
        "images": jnp.asarray(
            rng.normal(size=(b, sz, sz, 3)) * 0.5, jnp.bfloat16),
    }
    for name in ("standard_response", "original_generate_response",
                 "AI_pseudo_response"):
        ids = rng.integers(5, v, (b, dpo.response_len)).astype(np.int32)
        ids[:, -max(2, dpo.response_len // 14):] = 0
        batch[name] = jnp.asarray(ids)
        batch[name + "_attention_mask"] = jnp.asarray(
            (ids != 0).astype(np.int32))
    batch["AI_pseudo_response_scores"] = jnp.full(
        (b, dpo.response_len), 2.0, jnp.float32)
    batch["original_generate_response_scores"] = jnp.ones(
        (b, dpo.response_len), jnp.float32)
    batch["AI_pseudo_response_image_relations"] = jnp.full(
        (b, dpo.response_len), 1.0, jnp.float32)
    return batch


def _score(params, cfg, dpo, batch, lora=None):
    """3-response logprobs → host float64 [3, B, R]."""
    from opadpo_tpu.engine.dpo import score_responses
    fn = jax.jit(lambda p, lo, q, m, im, r, rm: score_responses(
        p, cfg, dpo, q, m, im, r, rm, lora=lo, remat=True))
    out = fn(params, lora, batch["queries"],
             batch["queries_attention_mask"], batch["images"],
             (batch["standard_response"],
              batch["original_generate_response"],
              batch["AI_pseudo_response"]),
             (batch["standard_response_attention_mask"],
              batch["original_generate_response_attention_mask"],
              batch["AI_pseudo_response_attention_mask"]))
    lp = np.stack([np.asarray(x, np.float64) for x in out["logprobs"]])
    return lp


def _grads(params, cfg, dpo, full_batch, lora):
    """One CoPO+AncPO train-step LoRA gradient → host flat f64 vector."""
    from opadpo_tpu.engine.dpo import dpo_loss_and_stats
    gfn = jax.jit(lambda lo, p, bt: jax.grad(
        lambda l: dpo_loss_and_stats(l, p, cfg, dpo, bt)[0])(lo))
    g = gfn(lora, params, full_batch)
    leaves = jax.tree_util.tree_leaves(g)
    flat = np.concatenate(
        [np.asarray(x, np.float64).ravel() for x in leaves])
    return flat


def _logprob_metrics(lp, lp_ref, masks):
    valid = masks.astype(bool)
    d = np.abs(lp - lp_ref)[valid]
    # pair margins: Σ chosen − Σ rejected per row, pairs (std≻gen, AI≻gen)
    sums = (lp * masks).sum(axis=-1)          # [3, B]
    sums_ref = (lp_ref * masks).sum(axis=-1)
    m1 = (sums[0] - sums[1]) - (sums_ref[0] - sums_ref[1])
    m2 = (sums[2] - sums[1]) - (sums_ref[2] - sums_ref[1])
    return {
        "logprob_mae": float(d.mean()),
        "logprob_max_abs": float(d.max()),
        "pair_margin_abs_delta_std_gen": float(np.abs(m1).mean()),
        "pair_margin_abs_delta_ai_gen": float(np.abs(m2).mean()),
    }


def _cosine(a, b):
    na, nb = np.linalg.norm(a), np.linalg.norm(b)
    if na == 0 or nb == 0:
        return float("nan")
    return float(np.dot(a, b) / (na * nb))


def _model_cfg(args):
    from opadpo_tpu.models.llava import LlavaConfig
    return LlavaConfig.tiny() if args.tiny else LlavaConfig.llava_7b()


def run_scoring_quality(args) -> dict:
    from opadpo_tpu.engine.dpo import DpoConfig, rollout_score
    from opadpo_tpu.models.lora import LoraConfig
    from opadpo_tpu.ops import quant

    cfg = _model_cfg(args)
    lora_cfg = LoraConfig(rank=4 if args.tiny else 64,
                          alpha=8.0 if args.tiny else 128.0)
    dpo = DpoConfig(response_len=args.response_len, query_len=128,
                    lora_scaling=lora_cfg.scaling)
    # grads at a reduced response length: the bf16 backward at r=896
    # needs 13.4G params + 3.3G program temps > 15.75G HBM, and r=256
    # still OOMs at runtime (both measured); r=128 fits.  All modes are
    # compared at the SAME length so the cosines stay apples-to-apples.
    grad_len = min(args.response_len, 32 if args.tiny else 128)
    dpo_g = DpoConfig(response_len=grad_len, query_len=128,
                      lora_scaling=lora_cfg.scaling)
    b = args.batch
    batch = _batch(cfg, dpo, b)
    grad_batch = _batch(cfg, dpo_g, b, rng_seed=1)
    masks = np.stack([
        np.asarray(batch["standard_response_attention_mask"]),
        np.asarray(batch["original_generate_response_attention_mask"]),
        np.asarray(batch["AI_pseudo_response_attention_mask"])],
    ).astype(np.float64)
    results = {}

    # ---- bf16 baseline: logprobs + frozen-reference rollout + grads ----
    quant.set_act_quant(False)
    params = _init_bf16_params(cfg)
    lora = _lora(cfg, lora_cfg)
    t0 = time.time()
    lp_ref = _score(params, cfg, dpo, batch, lora=lora)
    print(f"bf16 scoring done in {time.time() - t0:.0f}s", flush=True)
    roll_fn = jax.jit(lambda p, bt, r: rollout_score(
        p, cfg, dpo_g, None, bt, r))
    rollouts = roll_fn(params, grad_batch, jax.random.PRNGKey(9))
    rollouts = {k: np.asarray(v) for k, v in rollouts.items()}
    grad_full = {**grad_batch,
                 **{k: jnp.asarray(v) for k, v in rollouts.items()}}
    grads_ref, grad_baseline = None, "bf16"
    try:
        grads_ref = _grads(params, cfg, dpo_g, grad_full, lora)
        print("bf16 grads done", flush=True)
    except Exception as e:
        grad_baseline = "int8"
        print(f"bf16 grad pass failed ({e}); grad cosines will use the "
              f"int8 weight-only mode as baseline", file=sys.stderr)
    del params
    results["bf16"] = {"logprob_mae": 0.0, "note": "baseline",
                       "grad_response_len": grad_len}

    # ---- quantized modes, same underlying weights -----------------------
    modes = [
        ("int8", dict(bits=8, act=False, outl=0)),
        ("w8a8", dict(bits=8, act=True, outl=0)),
        ("w8a8_out32", dict(bits=8, act=True, outl=32)),
        ("w8a8_bwd8", dict(bits=8, act=True, outl=0, bwd=True)),
        ("int4", dict(bits=4, act=False, outl=0)),
    ]
    for name, m in modes:
        quant.set_act_quant(m["act"], outlier_cols=m["outl"],
                            bwd_int8=m.get("bwd", False))
        qp = _quantized_params(cfg, m["bits"])   # same seed/weights
        t0 = time.time()
        lp = _score(qp, cfg, dpo, batch, lora=lora)
        entry = _logprob_metrics(lp, lp_ref, masks)
        try:
            g = _grads(qp, cfg, dpo_g, grad_full, lora)
            if grads_ref is None and name == "int8":
                grads_ref = g
            if grads_ref is not None:
                entry[f"lora_grad_cosine_vs_{grad_baseline}"] = \
                    _cosine(g, grads_ref)
        except Exception as e:
            entry["grad_error"] = str(e)[:160]
        print(f"{name}: {entry} ({time.time() - t0:.0f}s)", flush=True)
        results[name] = entry
        del qp
        quant.set_act_quant(False, bwd_int8=False)
    return results


def run_decode_quality(args) -> dict:
    """Decode-accelerator deltas on the SAME int8 weights: kv_bits=8 and
    head_bits=4 each compared via first-decode-step logits (bf16 7B decode
    does not fit this chip — CLAUDE.md — so int8 weight-only decode is the
    cleanest available baseline; each knob's delta is isolated)."""
    from opadpo_tpu.constants import IMAGE_TOKEN_INDEX
    from opadpo_tpu.models import llama as llama_model
    from opadpo_tpu.models import llava as llava_model
    from opadpo_tpu.ops import quant

    quant.set_act_quant(False)
    cfg = _model_cfg(args)
    b = 1
    qp = _quantized_params(cfg, 8)
    # fuse+unstack in ONE donated program: the eager version held the
    # original + fused + unstacked layouts (3x weights) and OOM'd
    convert = jax.jit(
        lambda ll: llama_model.unstack_layers(
            llama_model.fuse_for_inference(ll)),
        donate_argnums=(0,))
    llama_u = convert(qp["llama"])
    params = {**{k: v for k, v in qp.items() if k != "llama"},
              "llama": llama_u}
    del qp, llama_u

    rng = np.random.default_rng(3)
    sz = cfg.vision.image_size
    q = rng.integers(5, cfg.llama.vocab_size,
                     (b, 16 if cfg.llama.num_layers < 8 else 128)
                     ).astype(np.int32)
    q[:, 1] = IMAGE_TOKEN_INDEX
    images = jnp.asarray(rng.normal(size=(b, sz, sz, 3)) * 0.5,
                         jnp.bfloat16)
    pf = jax.jit(lambda p, q_, m_, im: llava_model.prefill_unrolled(
        p, cfg, q_, m_, im))(params, jnp.asarray(q),
                             jnp.ones_like(jnp.asarray(q)), images)
    tok = jnp.argmax(pf["last_logits"], axis=-1).astype(jnp.int32)
    nkv, hd = cfg.llama.num_kv_heads, cfg.llama.head_dim
    suffix = [(jnp.zeros((b, 8, nkv, hd), jnp.bfloat16),
               jnp.zeros((b, 8, nkv, hd), jnp.bfloat16))
              for _ in range(cfg.llama.num_layers)]
    step = jnp.zeros((), jnp.int32)

    dec = jax.jit(lambda p, kv, pm, sfx: llava_model.decode_step_unrolled(
        p, cfg, tok, list(kv), pm, list(sfx), step, pf["next_position"]))
    lg_base, _ = dec(params, tuple(pf["kv_list"]), pf["key_mask"],
                     tuple(suffix))
    lg_base = np.asarray(lg_base, np.float64)

    out = {}
    # kv8: quantized prompt cache + fused kernel, same weights
    kv_q = jax.jit(lambda kv: llama_model.quantize_prompt_kv_list(
        list(kv)))(tuple(pf["kv_list"]))
    lg_kv8, _ = dec(params, tuple(kv_q), pf["key_mask"], tuple(suffix))
    d = np.abs(np.asarray(lg_kv8, np.float64) - lg_base)
    out["kv8_first_step_logit_mae"] = float(d.mean())
    out["kv8_first_step_logit_max_abs"] = float(d.max())
    out["kv8_argmax_agrees"] = bool(
        (np.argmax(np.asarray(lg_kv8), -1) == np.argmax(lg_base, -1)).all())
    del kv_q

    # kv4: packed int4 prompt cache + its fused kernel, same weights
    kv_q4 = jax.jit(lambda kv: llama_model.quantize_prompt_kv_list(
        list(kv), kv_bits=4))(tuple(pf["kv_list"]))
    lg_kv4, _ = dec(params, tuple(kv_q4), pf["key_mask"], tuple(suffix))
    d = np.abs(np.asarray(lg_kv4, np.float64) - lg_base)
    out["kv4_first_step_logit_mae"] = float(d.mean())
    out["kv4_first_step_logit_max_abs"] = float(d.max())
    out["kv4_argmax_agrees"] = bool(
        (np.argmax(np.asarray(lg_kv4), -1) == np.argmax(lg_base, -1)).all())
    del kv_q4

    # head4: int4 lm_head, same weights, bf16 KV
    p4 = dict(params)
    p4["llama"] = llama_model.quantize_head_for_decode(params["llama"], 4)
    lg_h4, _ = jax.jit(
        lambda p, kv, pm, sfx: llava_model.decode_step_unrolled(
            p, cfg, tok, list(kv), pm, list(sfx), step,
            pf["next_position"]))(p4, tuple(pf["kv_list"]), pf["key_mask"],
                                  tuple(suffix))
    d = np.abs(np.asarray(lg_h4, np.float64) - lg_base)
    out["head4_first_step_logit_mae"] = float(d.mean())
    out["head4_first_step_logit_max_abs"] = float(d.max())
    out["head4_argmax_agrees"] = bool(
        (np.argmax(np.asarray(lg_h4), -1) == np.argmax(lg_base, -1)).all())
    return out


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--out", default=os.path.join(REPO, "QUALITY_r03.json"))
    p.add_argument("--response-len", type=int, default=896)
    p.add_argument("--batch", type=int, default=1)
    p.add_argument("--skip-decode", action="store_true")
    p.add_argument("--skip-scoring", action="store_true",
                   help="only (re)run the decode section, merging into an "
                        "existing --out artifact")
    p.add_argument("--tiny", action="store_true",
                   help="tiny model on CPU (machinery smoke test only)")
    args = p.parse_args()
    if args.tiny:
        jax.config.update("jax_platforms", "cpu")

    result = {"scale": "tiny" if args.tiny else "llava-7b",
              "batch": args.batch,
              "response_len": args.response_len,
              "baseline": "bf16 (reference numerics, qlora_model.py:135-147)"}
    # partial reruns merge into the existing artifact instead of dropping
    # the sections they skip
    if os.path.exists(args.out):
        try:
            with open(args.out) as f:
                prior = json.load(f)
            if prior.get("scale") == result["scale"]:
                result = {**prior, **result}
        except Exception:
            pass
    if not args.skip_scoring:
        result["scoring"] = run_scoring_quality(args)
    if not args.skip_decode:
        import gc
        gc.collect()
        try:
            result["decode"] = run_decode_quality(args)
        except Exception as e:
            result["decode"] = {"error": str(e)[:200]}

    with open(args.out, "w") as f:
        json.dump(result, f, indent=2)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
