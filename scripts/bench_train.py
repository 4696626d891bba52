"""Train-step wall-clock benchmark on one chip: 7B OPA-DPO step
(CoPO+AncPO, 4 pairs) and 7B OPA SFT step.

Reference wall-clock to beat: OPA stage ~30 min on 4x A100-80GB
(README.md:121); see BASELINE.md.  Run:

    python scripts/bench_train.py [--mode dpo|sft|rollout] [--bits 8]
        [--act-bits 8] [--batch 2] [--lora-rank 64]
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


def cheap(tree_fn):
    shapes = jax.eval_shape(tree_fn)
    return jax.jit(lambda: jax.tree_util.tree_map(
        lambda s: jnp.full(s.shape, 0.01, s.dtype), shapes))()


def probe_memory(name, jitted, *args):
    """Compile without executing and report XLA's HBM budget.  The axon
    tunnel reports compile-time OOM as a recoverable HTTP 500, but a
    runtime OOM (transfer/execute) can wedge the TPU service — so new
    (model, batch) points go through this first."""
    compiled = jitted.lower(*args).compile()
    try:
        ma = compiled.memory_analysis()
        peak = (ma.argument_size_in_bytes + ma.output_size_in_bytes
                + ma.temp_size_in_bytes - ma.alias_size_in_bytes)
        print(f"{name}: args={ma.argument_size_in_bytes/1e9:.2f} GB "
              f"out={ma.output_size_in_bytes/1e9:.2f} GB "
              f"temp={ma.temp_size_in_bytes/1e9:.2f} GB "
              f"aliased={ma.alias_size_in_bytes/1e9:.2f} GB "
              f"-> peak~{peak/1e9:.2f} GB (usable 15.75)", flush=True)
    except Exception as e:                    # older jaxlib / backend gap
        print(f"{name}: compiled ok; memory_analysis unavailable ({e})",
              flush=True)
    return compiled


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--mode", default="dpo", choices=("dpo", "sft", "rollout"))
    p.add_argument("--bits", type=int, default=8, choices=(16, 8, 4))
    p.add_argument("--act-bits", type=int, default=8, choices=(16, 8))
    p.add_argument("--bwd-int8", action="store_true",
                   help="int8-MXU dx backward (quant.set_act_quant bwd_int8)")
    p.add_argument("--batch", type=int, default=2)
    p.add_argument("--lora-rank", type=int, default=64)
    p.add_argument("--iters", type=int, default=3)
    p.add_argument("--model", default="7b", choices=("7b", "13b"))
    p.add_argument("--probe-memory", action="store_true",
                   help="compile the step and print XLA's peak-HBM "
                        "analysis WITHOUT executing — a runtime OOM can "
                        "wedge the TPU service for ~30-60 min, so probe "
                        "new (model, batch) points first")
    p.add_argument("--profile", metavar="DIR", default=None,
                   help="wrap the timed iterations in jax.profiler.trace "
                        "(device op events DO land over the axon tunnel — "
                        "CLAUDE.md; summarize with scripts/summarize_trace.py)")
    args = p.parse_args()

    import contextlib
    profile_ctx = (lambda: jax.profiler.trace(args.profile)) \
        if args.profile else contextlib.nullcontext

    from opadpo_tpu.constants import IMAGE_TOKEN_INDEX
    from opadpo_tpu.engine.dpo import (
        DpoConfig, dpo_train_step, rollout_score,
    )
    from opadpo_tpu.engine.train_state import (
        OptimizerConfig, TrainState, make_optimizer,
    )
    from opadpo_tpu.models import llava as llava_model
    from opadpo_tpu.models.lora import LoraConfig
    from opadpo_tpu.ops import quant

    quant.set_act_quant(args.act_bits == 8 and args.bits == 8,
                        bwd_int8=args.bwd_int8)
    cfg = (llava_model.LlavaConfig.llava_13b() if args.model == "13b"
           else llava_model.LlavaConfig.llava_7b())
    lora_cfg = LoraConfig(rank=args.lora_rank, alpha=2.0 * args.lora_rank)
    dpo = DpoConfig(response_len=896, query_len=128,
                    lora_scaling=lora_cfg.scaling)
    b = args.batch

    def build_params():
        params = llava_model.init_params(jax.random.PRNGKey(0), cfg)
        if args.bits in (4, 8):
            params = quant.quantize_params(params, bits=args.bits)
        return params

    params = cheap(build_params)
    print(f"params ready bits={args.bits} act_bits={args.act_bits}",
          flush=True)

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

    if args.mode == "sft":
        from opadpo_tpu.engine.sft import SftConfig, sft_train_step
        seq = 1600
        ids = rng.integers(5, 32000, (b * 2, seq)).astype(np.int32)
        ids[:, 1] = IMAGE_TOKEN_INDEX
        labels = ids.copy()
        labels[:, :128] = -100
        sft_batch = {
            "input_ids": jnp.asarray(ids),
            "attention_mask": jnp.ones_like(jnp.asarray(ids)),
            "labels": jnp.asarray(labels),
            "images": jnp.zeros((b * 2, 336, 336, 3), jnp.bfloat16),
        }
        lora0 = cheap(lambda: llava_model.init_lora(
            jax.random.PRNGKey(1), cfg, lora_cfg, include_vision=True))
        tx = make_optimizer(OptimizerConfig(learning_rate=1e-5,
                                            warmup_steps=0, total_steps=10))
        state = TrainState.create(lora0, tx)
        scfg = SftConfig(lora_scaling=lora_cfg.scaling)
        # params MUST be a jit argument: closed-over arrays become XLA
        # constants and constant folding blows up compile time (CLAUDE.md)
        # donate the train state like the production driver
        # (opa_train.py) — at 13B the non-donated output is 1.67 GB of
        # the 15.75 GB budget
        step = jax.jit(lambda s, p, bt: sft_train_step(s, p, bt, tx, cfg,
                                                       scfg),
                       donate_argnums=(0,))
        if args.probe_memory:
            probe_memory("sft_step", step, state, params, sft_batch)
            return
        state, stats = step(state, params, sft_batch)
        _ = float(stats["loss/total"])
        t0 = time.perf_counter()
        with profile_ctx():
            for _ in range(args.iters):
                state, stats = step(state, params, sft_batch)
            _ = float(stats["loss/total"])
        dt = (time.perf_counter() - t0) / args.iters
        print(f"OPA SFT step (B={b * 2}, seq~{seq}): {dt:.2f} s "
              f"= {b * 2 / dt:.2f} seq/s/chip")
        return

    ref_lora = cheap(lambda: llava_model.init_lora(
        jax.random.PRNGKey(1), cfg, lora_cfg))
    roll = jax.jit(lambda p, rl, bt, r: rollout_score(p, cfg, dpo, rl, bt, r))
    if args.probe_memory:
        probe_memory("rollout_score", roll, params, ref_lora, batch,
                     jax.random.PRNGKey(2))
        if args.mode == "rollout":
            return
        # synthesize the rollout outputs so the dpo step can be probed
        # without executing the scoring program
        rollouts = cheap(lambda: rollout_score(
            params, cfg, dpo, ref_lora, batch, jax.random.PRNGKey(2)))
    else:
        rollouts = roll(params, ref_lora, batch, jax.random.PRNGKey(2))
        _ = float(jnp.sum(rollouts["ref_base_standard_response_logprobs"]))
    if args.mode == "rollout":
        t0 = time.perf_counter()
        for _ in range(args.iters):
            rollouts = roll(params, ref_lora, batch, jax.random.PRNGKey(2))
        _ = float(jnp.sum(rollouts["ref_base_standard_response_logprobs"]))
        dt = (time.perf_counter() - t0) / args.iters
        print(f"rollout scoring step (B={b}): {dt:.2f} s")
        return

    full_batch = {**batch, **{k: v for k, v in rollouts.items()}}
    lora0 = cheap(lambda: llava_model.init_lora(
        jax.random.PRNGKey(3), cfg, lora_cfg))
    tx = make_optimizer(OptimizerConfig(learning_rate=1e-6, warmup_steps=0,
                                        total_steps=10))
    state = TrainState.create(lora0, tx)
    step = jax.jit(lambda s, p, bt: dpo_train_step(s, p, bt, tx, cfg, dpo),
                   donate_argnums=(0,))
    if args.probe_memory:
        probe_memory("dpo_step", step, state, params, full_batch)
        return
    state, stats = step(state, params, full_batch)
    _ = float(stats["loss/total"])
    t0 = time.perf_counter()
    with profile_ctx():
        for _ in range(args.iters):
            state, stats = step(state, params, full_batch)
        _ = float(stats["loss/total"])
    dt = (time.perf_counter() - t0) / args.iters
    print(f"DPO train step (CoPO+AncPO, r={args.lora_rank}, B={b}): "
          f"{dt:.2f} s")


if __name__ == "__main__":
    main()
