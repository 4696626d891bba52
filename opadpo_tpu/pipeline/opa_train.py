"""Stage 3 — OPA (LoRA-SFT) training driver.

The reference's ``opa_train.py`` + HF ``LLaVATrainer`` + DeepSpeed ZeRO-1
collapse into one jitted SFT step over the mesh; optimizer-state sharding
(the ZeRO-1 equivalent) comes from ``parallel.zero1_opt_state_specs``.
Production recipe: LoRA r=256 α=512 over all linears including the vision
tower and projector, bf16, per-device bs 4 × accum 8, 2 epochs, lr 2e-5
cosine (run/train_opa.sh:31-50).

Run:  python -m opadpo_tpu.pipeline.opa_train --config configs/llava_opa.yaml
"""

from __future__ import annotations

import argparse
import json
import logging
import os
import time

import jax
import numpy as np

from opadpo_tpu.data.datasets import make_sft_data_module
from opadpo_tpu.data.loading import DataLoader
from opadpo_tpu.engine.sft import SftConfig, sft_train_step
from opadpo_tpu.engine.train_state import (
    OptimizerConfig, TrainState, make_optimizer,
)
from opadpo_tpu.models import llava as llava_model
from opadpo_tpu.models.lora import LoraConfig
from opadpo_tpu.parallel import MeshConfig, shard_train_state_zero1
from opadpo_tpu.pipeline import checkpoints as ckpt_lib
from opadpo_tpu.pipeline.config import (
    Config, apply_overrides, load_config, save_config,
)
from opadpo_tpu.pipeline.runtime import (
    StepTimer, device_put_batch, load_tokenizer, setup_model,
)
from opadpo_tpu.utils.metrics import MetricsLogger

logger = logging.getLogger("opa_train")


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
        tiny=tiny, seed=int(t.get("seed", 42)),
        bits=int(t.get("bits", 16)),
        act_bits=int(t.get("act_bits", 16)),
        act_outlier_cols=int(t.get("act_outlier_cols", 0)),
        act_bwd_int8=bool(t.get("act_bwd_int8", False)),
        fused_attention=bool(t.get("fused_attention", True)))
    n_data = mesh.shape["data"]

    lora_cfg = LoraConfig(rank=int(t.get("lora_r", 256)),
                          alpha=float(t.get("lora_alpha", 512)))
    tune_vision = bool(t.get("tune_vision_tower", True))
    lora = llava_model.init_lora(
        jax.random.PRNGKey(int(t.get("seed", 42))), llava_cfg, lora_cfg,
        include_vision=tune_vision)

    sft_cfg = SftConfig(
        entropy_loss=bool(t.get("entropy_loss", False)),
        entropy_mask_method=str(t.get("entropy_mask_method", "random")),
        entropy_mask_ratio=float(t.get("entropy_mask_ratio", 0.3)),
        entropy_loss_coef=float(t.get("entropy_loss_coef", 0.0)),
        lora_scaling=lora_cfg.scaling)

    per_dev = int(t.get("per_device_train_batch_size", 4))
    grad_accum = int(t.get("gradient_accumulation_steps", 8))
    global_batch = per_dev * n_data

    if tiny or bool(cfg.get_path("debug.fake_tokenizer", False)):
        # debug.fake_tokenizer: real model shapes, test tokenizer (offline
        # full-scale rehearsals — scripts/e2e_rehearsal.py)
        from tests.fake_tokenizer import FakeTokenizer
        tokenizer = FakeTokenizer()
    else:
        tokenizer = load_tokenizer(model_dir,
                                   int(t.get("model_max_length", 2048)))
    data_path = os.environ.get("DATA_DIR", cfg.get_path("data.data_path"))
    module = make_sft_data_module(
        tokenizer, data_path, image_dir=os.environ.get("IMAGE_DIR"),
        query_len=int(t.get("query_len", 128)),
        response_len=int(t.get("response_len", 896)),
        image_size=llava_cfg.vision.image_size)
    loader = DataLoader(module["train_dataset"], module["data_collator"],
                        batch_size=global_batch, shuffle=True,
                        drop_last=True, seed=int(t.get("seed", 42)))

    epochs = int(t.get("num_train_epochs") or 2)
    steps_per_epoch = len(loader)
    total_opt_steps = max(1, (steps_per_epoch * epochs) // grad_accum)
    opt_cfg = OptimizerConfig(
        learning_rate=float(t.get("learning_rate", 2e-5)),
        lr_scheduler_type=str(t.get("lr_scheduler_type", "cosine")),
        warmup_steps=int(float(t.get("warmup_ratio", 0.03))
                         * total_opt_steps),
        total_steps=total_opt_steps,
        weight_decay=float(t.get("weight_decay", 0.0)),
        max_grad_norm=(float(t["max_grad_norm"])
                       if t.get("max_grad_norm") else 1.0),
        grad_accum_steps=grad_accum)
    tx = make_optimizer(opt_cfg)
    state = TrainState.create(lora, tx)
    # ZeRO-1: optimizer moments sharded over the data axis (reference ships
    # DeepSpeed stage-1 for this stage, deepspeed_stage_1_config.json)
    state = shard_train_state_zero1(state, mesh)

    step_fn = jax.jit(
        lambda s, bp, b, r: sft_train_step(s, bp, b, tx, llava_cfg,
                                           sft_cfg, r),
        donate_argnums=(0,))

    save_steps = int(t.get("save_steps", 100))
    timer = StepTimer()
    rng = jax.random.PRNGKey(int(t.get("seed", 42)))
    metrics = MetricsLogger(output_dir, run_name="opa",
                            report_to=str(t.get("report_to", "jsonl")))
    micro_step = 0

    for epoch in range(epochs):
        for batch in loader:
            micro_step += 1
            t0 = time.time()
            rng, sub = jax.random.split(rng)
            state, stats = step_fn(state, base_params,
                                   device_put_batch(batch, mesh), sub)
            timer.record("sft_step", time.time() - t0,
                         tokens=int(batch["input_ids"].size))
            if micro_step % int(t.get("logging_steps", 10)) == 0:
                line = {"epoch": epoch,
                        **{k: float(v) for k, v in stats.items()},
                        "step_seconds": timer.history[-1]["seconds"]}
                metrics.log(line, step=micro_step)
                logger.info("epoch %d micro %d loss=%.4f", epoch, micro_step,
                            float(stats["loss/total"]))
            if micro_step % (save_steps * grad_accum) == 0:
                step = micro_step // grad_accum
                ckpt_lib.save_train_state(
                    os.path.join(output_dir, f"checkpoint-{step}"),
                    state, lora_cfg)

    final_dir = os.path.join(output_dir, "checkpoint-final")
    ckpt_lib.save_train_state(final_dir, state, lora_cfg,
                              extra={"timers": timer.summary()})
    ckpt_lib.mark_completed(output_dir)
    logger.info("OPA training complete → %s", final_dir)


def parse_args():
    p = argparse.ArgumentParser(description="OPA LoRA-SFT training (TPU)")
    p.add_argument("--config", default="configs/llava_opa.yaml")
    p.add_argument("overrides", nargs="*")
    return p.parse_args()


def main():
    args = parse_args()
    cfg = apply_overrides(load_config(args.config), args.overrides)
    train(cfg)


if __name__ == "__main__":
    main()
