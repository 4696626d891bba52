"""Stages 1–2 — on-policy rollout + GPT-4V correction driver.

Reference: ``opadpo/online_generation.py`` + ``Online_Generator``
(``generator_models/online_generator.py``).  Per step: sample responses on
TPU (temperature 1.0, top_k 30, top_p 0.95, response_len 896 —
run/online_generate.sh:75-77,115-116), truncate after EOS/'?' tokens,
decode, then one GPT-4V correction call per sample, and dump
``rollouts/step{N}_rank{R}.json`` shards (resume scans existing shards —
``find_max_step``).

TPU-first improvement (SURVEY §7 hard parts): the serial HTTPS GPT-4V
calls are overlapped with TPU sampling — batch N's corrections run on a
thread pool while batch N+1 samples on device.  The reference alternates
serially.

Run:  python -m opadpo_tpu.pipeline.online_generation \\
          --config configs/llava_online_generation.yaml
"""

from __future__ import annotations

import argparse
import base64
import concurrent.futures
import json
import logging
import os
import re
import time
from typing import Dict, List, Optional

import jax
import numpy as np

from opadpo_tpu.constants import (
    LLAMA_NL_QMARK_TOKEN, LLAMA_QMARK_TOKEN,
)
from opadpo_tpu.data.datasets import make_rollout_data_module
from opadpo_tpu.data.loading import DataLoader, InfiniteLoader, ShardedDataset
from opadpo_tpu.engine.sampler import Sampler, truncate_after_tokens
from opadpo_tpu.models.loader import load_peft_adapter
from opadpo_tpu.parallel import MeshConfig
from opadpo_tpu.pipeline import checkpoints as ckpt_lib
from opadpo_tpu.pipeline.config import (
    Config, apply_overrides, load_config, save_config,
)
from opadpo_tpu.pipeline.gpt4v_client import APIService, get_api_service
from opadpo_tpu.pipeline.prompts import build_correction_messages
from opadpo_tpu.pipeline.runtime import (
    device_put_batch, load_tokenizer, setup_model,
)

logger = logging.getLogger("online_generation")

_JSON_FENCE_RE = re.compile(r"```(?:json)?\s*(.*?)\s*```", re.DOTALL)


def parse_correction_report(text: str, original_response: str) -> Dict:
    """LLM output → (report dict, AI_pseudo, copied) with graceful
    degradation: on any parse failure the raw response substitutes for
    both (reference online_generator.py:214-224; such rows are filtered
    later by make_opadpo_dataset)."""
    try:
        m = _JSON_FENCE_RE.search(text)
        payload = m.group(1) if m else text
        start, end = payload.find("{"), payload.rfind("}")
        report = json.loads(payload[start:end + 1])
        rewritten, copied = [], []
        for key, entry in report.items():
            if not isinstance(entry, dict):
                continue
            if key in ("image_description", "image description"):
                continue
            rw = entry.get("rewritten_content",
                           entry.get("rewritten content", ""))
            if rw:
                rewritten.append(rw.strip())
            if key != "Added":
                cp = entry.get("copied_content",
                               entry.get("copied content", ""))
                if cp:
                    copied.append(cp.strip())
        ai_pseudo = " ".join(rewritten).strip()
        copied_joined = " ".join(copied).strip()
        if not ai_pseudo:
            raise ValueError("empty rewritten content")
        return {"report": json.dumps(report), "AI_pseudo": ai_pseudo,
                "copied": copied_joined, "success": True}
    except Exception as e:
        logger.warning("report parse failed (%s); using raw response", e)
        return {"report": "", "AI_pseudo": original_response,
                "copied": original_response, "success": False}


def correct_one(api: APIService, question: str, response: str,
                image_b64: str, standard_response: str = "") -> Dict:
    try:
        messages = build_correction_messages(
            question, response, image_b64,
            standard_response=standard_response)
        text = api.call_llm_with_messages(messages)
        return parse_correction_report(text, response)
    except Exception as e:
        logger.warning("GPT-4V call failed: %s", e)
        return {"report": "", "AI_pseudo": response, "copied": response,
                "success": False}


def run(cfg: Config) -> None:
    t = cfg.training if "training" in cfg else Config()
    if bool(t.get("pil_preprocess", False)):
        # strict HF-numerics image path (native C++ JPEG pipeline off)
        from opadpo_tpu.data.image_processing import set_pil_preprocess
        set_pil_preprocess(True)
    output_dir = os.environ.get("OUTPUT_DIR", cfg.get_path(
        "training.output_dir", "./output"))
    rollout_dir = os.path.join(output_dir, "rollouts")
    os.makedirs(rollout_dir, exist_ok=True)
    save_config(cfg, output_dir)
    logging.basicConfig(level=logging.INFO)

    tiny = bool(cfg.get_path("debug.tiny", False))
    model_dir = os.environ.get("MODEL_DIR", cfg.get_path("base_model"))
    llava_cfg, params, mesh = setup_model(
        model_dir=model_dir,
        vision_dir=cfg.get_path("image_checkpoint"),
        mesh_config=MeshConfig(model=int(cfg.get_path("mesh.model", 1))),
        skip_loading_weights=bool(cfg.get_path("model.skip_loading_weights",
                                               False)),
        tiny=tiny,
        seed=int(t.get("seed", 42)),
        # honor the numerics config like the trainers do: the bf16 7B
        # base (14.2 GB) + a decode KV cache does not fit a 16 GB chip —
        # rollout must be able to run the quantized base (CLAUDE.md;
        # found when the E2E rehearsal's rollout stage runtime-OOMed)
        bits=int(t.get("bits", 16)),
        act_bits=int(t.get("act_bits", 16)),
        act_outlier_cols=int(t.get("act_outlier_cols", 0)),
        act_bwd_int8=bool(t.get("act_bwd_int8", False)),
        fused_attention=bool(t.get("fused_attention", True)))

    lora = None
    lora_scaling = 1.0
    adapter_dir = os.environ.get("POLICY_LORA_DIR",
                                 cfg.get_path("policy_lora_dir"))
    if adapter_dir and os.path.isdir(adapter_dir):
        lora = load_peft_adapter(adapter_dir, llava_cfg.llama)
        with open(os.path.join(adapter_dir, "adapter_config.json")) as f:
            acfg = json.load(f)
        lora_scaling = acfg["lora_alpha"] / acfg["r"]

    if tiny or bool(cfg.get_path("debug.fake_tokenizer", False)):
        # debug.fake_tokenizer: real model shapes with the character-level
        # test tokenizer — for offline full-scale rehearsals (no tokenizer
        # checkpoint on disk, zero egress; scripts/e2e_rehearsal.py)
        from tests.fake_tokenizer import FakeTokenizer
        tokenizer = FakeTokenizer()
    else:
        tokenizer = load_tokenizer(model_dir)

    query_len = int(t.get("query_len", 128))
    response_len = int(t.get("response_len", 896))
    # shared constructor (engine/serving_config): pins the
    # program-affecting defaults so rollout programs coincide with
    # serve.py / bench_serve compiled programs where shapes match
    from opadpo_tpu.engine.serving_config import make_serving_sampling
    sampling = make_serving_sampling(
        temperature=float(t.get("temperature", 1.0)),
        top_k=int(t.get("top_k", 30)),
        top_p=float(t.get("top_p", 0.95)),
        topk_impl=str(t.get("topk_impl", "sort")),
        eos_token_id=tokenizer.eos_token_id,
        pad_token_id=tokenizer.pad_token_id,
        max_new_tokens=response_len)

    # multi-rank fan-out: each process takes rows rank::world, selects its
    # API key as RANK % API_NUM, and writes step{N}_rank{R}.json shards
    # (reference generator.py:87-93 + record_step_stats)
    rank = int(os.environ.get("RANK", str(jax.process_index())))
    world = int(os.environ.get("WORLD_SIZE", str(jax.process_count())))

    data_path = os.environ.get("DATA_DIR", cfg.get_path("data.data_path"))
    module = make_rollout_data_module(
        tokenizer, data_path, image_dir=os.environ.get("IMAGE_DIR"),
        query_len=query_len, image_size=llava_cfg.vision.image_size)
    train_dataset = module["train_dataset"]
    if world > 1:
        train_dataset = ShardedDataset(train_dataset, rank, world)
    batch_size = int(t.get("rollout_per_device_batch_size", 8)) \
        * mesh.shape["data"]
    loader = DataLoader(train_dataset, module["data_collator"],
                        batch_size=batch_size, shuffle=False, drop_last=False)
    num_steps = len(loader)

    start_step = ckpt_lib.find_max_step(rollout_dir, rank=rank)
    logger.info("rank %d/%d resuming at rollout step %d / %d", rank, world,
                start_step, num_steps)

    api = get_api_service(rank=rank, cache_path=os.path.join(
        output_dir, f"history_rank{rank}.sqlite" if world > 1
        else "history.sqlite"))
    dry_run_api = not (os.environ.get("API_KEY0")
                       or os.environ.get("API_KEY"))
    if dry_run_api:
        logger.warning("no API_KEY configured — responses pass through "
                       "uncorrected (degraded mode)")

    sampler = Sampler(llava_cfg, sampling, lora_scaling=lora_scaling,
                      kv_bits=int(t.get("kv_bits", 16)),
                      head_bits=int(t.get("head_bits", 16)),
                      chunk=int(t.get("decode_chunk", 0)))
    # rebind to the per-layer decode layout so the stacked weight copy
    # frees (7B int8: 7 GB; holding both layouts would OOM the chip)
    params, lora = sampler.prepare_params(params, lora)

    # continuous_slots: N > 0 routes generation through the slot-pool
    # engine — rows that EOS early free their slot for the next query,
    # so a batch costs ~sum-of-lengths/slots instead of the batch max.
    # Designed for the per-rank single-chip rollout topology (the
    # multi-rank fan-out above shards ROWS, not the mesh).
    engine = None
    slots = int(t.get("continuous_slots", 0))
    if slots:
        from opadpo_tpu.engine.serving_config import make_continuous_engine
        kvb = int(t.get("kv_bits", 16))
        engine = make_continuous_engine(
            llava_cfg, sampling, params, lora=lora,
            lora_scaling=lora_scaling, slots=slots, qlen=query_len,
            seg_len=int(t.get("continuous_seg_len", 64)),
            kv_bits=4 if kvb == 4 else 8,
            rng=jax.random.PRNGKey(int(t.get("seed", 42)) + 1000 + rank))

    pool = concurrent.futures.ThreadPoolExecutor(
        max_workers=int(os.environ.get("API_WORKERS", "8")))
    pending = None       # (step_idx, futures, records)
    rng = jax.random.PRNGKey(int(t.get("seed", 42)))

    def flush(step_idx: int, futures, records) -> None:
        for rec, fut in zip(records, futures):
            result = fut.result() if fut is not None else {
                "report": "", "AI_pseudo": rec["original_generate_response"],
                "copied": rec["original_generate_response"], "success": False}
            rec["AI_pseudo_response"] = result["AI_pseudo"]
            rec["AI_json_report"] = result["report"]
            rec["API_success"] = result["success"]
        path = os.path.join(rollout_dir, f"step{step_idx}_rank{rank}.json")
        with open(path, "w") as f:
            json.dump(records, f)
        logger.info("wrote %s (%d records)", path, len(records))

    for step_idx, batch in enumerate(loader, start=1):
        if step_idx <= start_step:
            continue
        t0 = time.time()
        rng, sub = jax.random.split(rng)
        if engine is not None:
            n = batch["queries"].shape[0]
            rids = [engine.add_request(np.asarray(batch["queries"][i]),
                                       np.asarray(batch["query_attn_masks"][i]),
                                       np.asarray(batch["images"][i]))
                    for i in range(n)]
            order = {rid: i for i, rid in enumerate(rids)}
            tokens = np.full((n, response_len),
                             tokenizer.pad_token_id, np.int32)
            while engine.has_work():
                for rid, toks in engine.step():
                    tokens[order[rid], :len(toks)] = toks[:response_len]
        else:
            dev = device_put_batch(
                {k: batch[k]
                 for k in ("queries", "query_attn_masks", "images")},
                mesh)
            tokens = np.asarray(sampler.generate(
                params, dev["queries"], dev["query_attn_masks"],
                dev["images"], sub, lora=lora))
        tokens = truncate_after_tokens(
            tokens, tokenizer.eos_token_id, tokenizer.pad_token_id,
            additional_tokens=(LLAMA_QMARK_TOKEN, LLAMA_NL_QMARK_TOKEN))
        texts = tokenizer.batch_decode(tokens, skip_special_tokens=True)
        sample_time = time.time() - t0

        records, futures = [], []
        for i, text in enumerate(texts):
            # shard record schema matches the reference rollout JSON so
            # make_opadpo_dataset-style merging works on either side
            rec = {
                "query": batch["query_text"][i],
                "image_id": batch["image_id"][i],
                "standard_response": batch["standard_response_text"][i],
                "original_generate_response": text.strip(),
                "image_bytes": batch["image_bytes"][i],
            }
            records.append(rec)
            if dry_run_api:
                futures.append(None)
            else:
                img_b64 = rec["image_bytes"]
                if isinstance(img_b64, bytes):
                    img_b64 = base64.b64encode(img_b64).decode()
                futures.append(pool.submit(correct_one, api, rec["query"],
                                           rec["original_generate_response"],
                                           img_b64,
                                           rec["standard_response"]))

        # overlap: flush the previous step's corrections while this step's
        # futures run and the next step samples
        if pending is not None:
            flush(*pending)
        pending = (step_idx, futures, records)
        logger.info("step %d sampled %d responses in %.1fs", step_idx,
                    len(texts), sample_time)

    if pending is not None:
        flush(*pending)
    pool.shutdown(wait=True)
    logger.info("rollout complete")


def parse_args():
    p = argparse.ArgumentParser(description="Online generation (TPU)")
    p.add_argument("--config",
                   default="configs/llava_online_generation.yaml")
    p.add_argument("overrides", nargs="*")
    return p.parse_args()


def main():
    args = parse_args()
    cfg = apply_overrides(load_config(args.config), args.overrides)
    run(cfg)


if __name__ == "__main__":
    main()
