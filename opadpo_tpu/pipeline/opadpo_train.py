"""Stage 4 — OPA-DPO training driver.

The reference's ``opadpo_train.py`` + ``DPOTrainer.train``/``RLTrainer``
outer loop (rl_trainer.py:215-279) re-expressed as: per step, (a) draw
``rollout_accumulation_steps`` query batches and run the jitted
reference-scoring function (frozen OPA adapter), caching results on host;
(b) run ``noptepochs`` × minibatch gradient steps over the cached
rollouts with optax MultiSteps accumulation; (c) checkpoint every
``save_steps`` under the reference's ``checkpoint-N`` contract and
fast-forward the dataloader on resume.

Run:  python -m opadpo_tpu.pipeline.opadpo_train --config configs/llava_dpo.yaml \\
          [key.path=value ...]
"""

from __future__ import annotations

import argparse
import functools
import json
import logging
import os
import time
from typing import Dict, List

import jax
import numpy as np

from opadpo_tpu.engine import dpo as dpo_engine
from opadpo_tpu.engine.dpo import DpoConfig
from opadpo_tpu.engine.train_state import (
    OptimizerConfig, TrainState, make_optimizer,
)
from opadpo_tpu.data.datasets import make_dpo_data_module
from opadpo_tpu.data.loading import DataLoader, InfiniteLoader
from opadpo_tpu.models import llava as llava_model
from opadpo_tpu.models.loader import load_peft_adapter
from opadpo_tpu.models.lora import LoraConfig
from opadpo_tpu.parallel import MeshConfig, shard_train_state_zero1
from opadpo_tpu.pipeline import checkpoints as ckpt_lib
from opadpo_tpu.pipeline.config import (
    Config, apply_overrides, load_config, save_config,
)
from opadpo_tpu.pipeline.runtime import (
    StepTimer, device_put_batch, load_tokenizer, maybe_start_profiler,
    setup_model,
)
from opadpo_tpu.utils.metrics import MetricsLogger

logger = logging.getLogger("opadpo_train")


def _merge_host(dicts: List[Dict[str, np.ndarray]]) -> Dict[str, np.ndarray]:
    return {k: np.concatenate([np.asarray(d[k]) for d in dicts], axis=0)
            for k in dicts[0]}


def train(cfg: Config) -> None:
    t = cfg.training
    if bool(t.get("pil_preprocess", False)):
        # strict HF-numerics image path (native C++ JPEG pipeline off)
        from opadpo_tpu.data.image_processing import set_pil_preprocess
        set_pil_preprocess(True)
    output_dir = os.environ.get("OUTPUT_DIR", t.get("output_dir", "./output"))
    os.makedirs(output_dir, exist_ok=True)
    save_config(cfg, output_dir)
    logging.basicConfig(level=logging.INFO)

    tiny = bool(cfg.get_path("debug.tiny", False))
    model_dir = os.environ.get("MODEL_DIR", cfg.get_path("base_model"))
    llava_cfg, base_params, mesh = setup_model(
        model_dir=model_dir,
        vision_dir=cfg.get_path("image_checkpoint"),
        mesh_config=MeshConfig(model=int(cfg.get_path("mesh.model", 1))),
        skip_loading_weights=bool(cfg.get_path("model.skip_loading_weights",
                                               False)),
        tiny=tiny,
        seed=int(t.get("seed", 42)),
        bits=int(t.get("bits", 16)),
        act_bits=int(t.get("act_bits", 16)),
        act_outlier_cols=int(t.get("act_outlier_cols", 0)),
        act_bwd_int8=bool(t.get("act_bwd_int8", False)),
        fused_attention=bool(t.get("fused_attention", True)),
    )
    n_data = mesh.shape["data"]

    lora_cfg = LoraConfig(rank=int(t.get("lora_r", 256)),
                          alpha=float(t.get("lora_alpha", 512)))
    dpo_cfg = DpoConfig(
        beta=float(t.get("beta", 0.1)),
        label_smoothing=float(t.get("label_smoothing", 0.0)),
        temperature=float(t.get("temperature", 1.0)),
        reference_free=bool(t.get("reference_free", False)),
        f_divergence_type=str(t.get("f_divergence_type", "reverse_kl")),
        standard_pair_coef=float(t.get("standard_pair_coef", 1.0)),
        AI_pair_coef=float(t.get("AI_pair_coef", 1.0)),
        CoPO=bool(t.get("CoPO", True)),
        CoPO_method=str(t.get("CoPO_method", "random")),
        CoPO_mask_ratio=float(t.get("CoPO_mask_ratio", 0.3)),
        CoPO_coef=float(t.get("CoPO_coef", 0.2)),
        AncPO=bool(t.get("AncPO", True)),
        mDPO_anchor=bool(t.get("mDPO_anchor", True)),
        Anchor_value=float(t.get("Anchor_value", 0.0)),
        Anchor_coef=float(t.get("Anchor_coef", 1.0)),
        detailed_report=bool(t.get("detailed_report", True)),
        response_score=bool(t.get("response_score", True)),
        response_image_relation=bool(t.get("response_image_relation", True)),
        response_len=int(t.get("response_len", 896)),
        query_len=int(t.get("query_len", 128)),
        lora_scaling=lora_cfg.scaling,
        shared_prefix=bool(t.get("shared_prefix", True)),
    )

    # --- adapters: policy (trainable) + frozen reference, shared base ---
    policy_lora_dir = os.environ.get("POLICY_LORA_DIR",
                                     cfg.get_path("policy_lora_dir"))
    if policy_lora_dir and os.path.isdir(policy_lora_dir) and not tiny:
        logger.info("loading OPA adapter from %s", policy_lora_dir)
        policy_lora = load_peft_adapter(policy_lora_dir, llava_cfg.llama)
    else:
        logger.info("bootstrapping fresh init adapter (reference "
                    "opadpo_train.py:735-763)")
        policy_lora = {"llama": llava_model.init_lora(
            jax.random.PRNGKey(int(t.get("seed", 42))), llava_cfg,
            lora_cfg)["llama"]}
    # real copy: the policy state is donated into the jitted train step, so
    # the frozen reference must own distinct buffers
    import jax.numpy as jnp
    ref_lora = jax.tree_util.tree_map(jnp.copy, policy_lora)

    # --- batch math (reference opadpo_train.py:383-439) ---
    rollout_batch = int(t.get("rollout_batch_size", 64))
    step_batch = int(t.get("step_batch_size", 32))
    rollout_per_dev = int(t.get("rollout_per_device_batch_size", 2))
    step_per_dev = int(t.get("step_per_device_batch_size", 2))
    noptepochs = int(t.get("noptepochs", 1))
    rollout_global = rollout_per_dev * n_data
    step_global = step_per_dev * n_data
    assert rollout_batch % rollout_global == 0
    assert step_batch % step_global == 0
    assert rollout_batch % step_batch == 0
    rollout_accum = rollout_batch // rollout_global
    grad_accum = step_batch // step_global

    opt_cfg = OptimizerConfig(
        learning_rate=float(t.get("learning_rate", 1e-6)),
        lr_scheduler_type=str(t.get("lr_scheduler_type", "cosine")),
        warmup_steps=int(t.get("warmup_steps", 5)),
        total_steps=int(t.get("max_step", 500)),
        weight_decay=float(t.get("weight_decay", 0.0)),
        max_grad_norm=float(t.get("max_grad_norm", 1.0)),
        grad_accum_steps=grad_accum,
    )
    tx = make_optimizer(opt_cfg)
    state = shard_train_state_zero1(TrainState.create(policy_lora, tx), mesh)

    # --- data ---
    tokenizer = None
    if tiny or bool(cfg.get_path("debug.fake_tokenizer", False)):
        # debug.fake_tokenizer: real model shapes, test tokenizer (offline
        # full-scale rehearsals — scripts/e2e_rehearsal.py)
        from tests.fake_tokenizer import FakeTokenizer
        tokenizer = FakeTokenizer()
    else:
        tokenizer = load_tokenizer(model_dir,
                                   int(t.get("model_max_length", 2048)))
    data_path = os.environ.get("DATA_DIR", cfg.get_path("data.data_path"))
    module = make_dpo_data_module(
        tokenizer, data_path,
        image_dir=os.environ.get("IMAGE_DIR"),
        query_len=dpo_cfg.query_len, response_len=dpo_cfg.response_len,
        detailed_report=dpo_cfg.detailed_report,
        image_size=llava_cfg.vision.image_size)
    loader = InfiniteLoader(DataLoader(
        module["train_dataset"], module["data_collator"],
        batch_size=rollout_global, shuffle=True, drop_last=True,
        seed=int(t.get("seed", 42))))

    # --- resume ---
    start_step = 1
    last_ckpt, completed = ckpt_lib.get_last_checkpoint(output_dir)
    if completed:
        logger.info("training already completed")
        return
    if last_ckpt is not None and bool(t.get("resume_from_training", True)):
        state = shard_train_state_zero1(
            ckpt_lib.restore_train_state(last_ckpt, state, llava_cfg.llama),
            mesh)
        start_step = ckpt_lib.parse_checkpoint_step(last_ckpt) + 1
        logger.info("resumed from %s at step %d", last_ckpt, start_step)

    # --- jitted steps ---
    rollout_fn = jax.jit(functools.partial(
        dpo_engine.rollout_score, cfg=llava_cfg, dpo=dpo_cfg))
    train_step_fn = jax.jit(
        lambda s, bp, b: dpo_engine.dpo_train_step(s, bp, b, tx, llava_cfg,
                                                   dpo_cfg),
        donate_argnums=(0,))

    total_epochs = int(t.get("total_epochs", 4))
    dataset_len = len(module["train_dataset"])
    total_steps = min((dataset_len * total_epochs) // rollout_batch,
                      int(t.get("max_step", 500)))
    save_steps = int(t.get("save_steps", 100))
    timer = StepTimer()
    # replay-deterministic randomness: every step derives its keys from
    # (root, step_idx) via fold_in, so a resumed run bit-matches an
    # uninterrupted one at the same step — the reference fast-forwards the
    # dataloader but lets its RNG streams drift on resume
    seed = int(t.get("seed", 42))
    root_rng = jax.random.PRNGKey(seed)
    metrics = MetricsLogger(output_dir, run_name="opadpo",
                            report_to=str(t.get("report_to", "jsonl")))
    profile_at = int(t.get("profile_start_step", 0))

    for step_idx in range(1, total_steps + 1):
        if step_idx < start_step:
            for _ in range(rollout_accum):
                next(loader)                 # dataloader fast-forward
            continue

        # -- rollout: reference scoring, cached to host --
        # reward_model_per_device_batch_size re-chunks scoring to fit
        # memory (reference dpo_trainer.py:329-387 sub-batch path)
        sub_bs = t.get("reward_model_per_device_batch_size")
        sub_bs = int(sub_bs) * n_data if sub_bs else rollout_global
        assert rollout_global % sub_bs == 0
        t0 = time.time()
        step_rng = jax.random.fold_in(root_rng, step_idx)
        chunk_idx = 0
        rollouts: List[Dict[str, np.ndarray]] = []
        for _ in range(rollout_accum):
            host_batch = next(loader)
            for start in range(0, rollout_global, sub_bs):
                chunk = {k: (v[start:start + sub_bs]
                             if isinstance(v, np.ndarray) else v)
                         for k, v in host_batch.items()}
                batch = device_put_batch(chunk, mesh)
                sub = jax.random.fold_in(step_rng, chunk_idx)
                chunk_idx += 1
                scored = rollout_fn(params=base_params, ref_lora=ref_lora,
                                    batch=batch, rng=sub)
                merged = {**batch, **scored}
                rollouts.append(
                    {k: np.asarray(v) for k, v in merged.items()
                     if isinstance(v, (np.ndarray, jax.Array))})
        rollouts_all = _merge_host(rollouts)
        timer.record("rollout", time.time() - t0)

        # -- policy updates over cached rollouts --
        t0 = time.time()
        n = rollouts_all["queries"].shape[0]
        stats = {}
        for ep in range(noptepochs):
            order = np.random.default_rng(
                (seed, step_idx, ep)).permutation(n)
            for mb_start in range(0, n - step_global + 1, step_global):
                idxs = order[mb_start:mb_start + step_global]
                mb = {k: v[idxs] for k, v in rollouts_all.items()}
                state, stats = train_step_fn(state, base_params,
                                             device_put_batch(mb, mesh))
        timer.record("train", time.time() - t0)

        if stats:
            line = {k: float(v) for k, v in stats.items()}
            # rollout entropy means per response type (reference
            # record_step_stats, dpo_trainer.py:804-835)
            for key, val in rollouts_all.items():
                if key.endswith("_entropies"):
                    mask = val != 0.0
                    denom = np.maximum(mask.sum(), 1)
                    line[f"objective/{key}"] = float(
                        (val * mask).sum() / denom)
            line["objective/rollout_seconds"] = timer.history[-2]["seconds"]
            line["objective/train_seconds"] = timer.history[-1]["seconds"]
            metrics.log(line, step=step_idx)
            logger.info("step %d loss=%.4f", step_idx,
                        float(stats.get("loss/total", 0.0)))

        if profile_at:
            maybe_start_profiler(output_dir, step_idx, profile_at)

        if step_idx % save_steps == 0 or step_idx == total_steps:
            ckpt_dir = os.path.join(output_dir, f"checkpoint-{step_idx}")
            ckpt_lib.save_train_state(ckpt_dir, state, lora_cfg,
                                      extra={"step": step_idx,
                                             "timers": timer.summary()})
            logger.info("saved %s", ckpt_dir)

    ckpt_lib.mark_completed(output_dir)
    logger.info("training complete: %s", json.dumps(timer.summary()))


def parse_args():
    p = argparse.ArgumentParser(description="OPA-DPO training (TPU)")
    p.add_argument("--config", default="configs/llava_dpo.yaml")
    p.add_argument("overrides", nargs="*", help="key.path=value overrides")
    return p.parse_args()


def main():
    args = parse_args()
    cfg = load_config(args.config)
    cfg = apply_overrides(cfg, args.overrides)
    train(cfg)


if __name__ == "__main__":
    main()
