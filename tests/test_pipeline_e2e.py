"""End-to-end 4-stage pipeline smoke test on the tiny model (CPU, 8 virtual
devices): rollout → dataset construction → OPA SFT → OPA-DPO, exercising
the real drivers, collators, checkpoint contract, and resume paths."""

import base64
import io
import json
import os

import numpy as np
import pytest
from PIL import Image

from opadpo_tpu.pipeline.config import Config
from opadpo_tpu.pipeline import checkpoints as ckpt_lib


def _tiny_prompt_dataset(path, n=16):
    from datasets import Dataset
    rng = np.random.default_rng(0)
    imgs = []
    for _ in range(n):
        arr = rng.integers(0, 255, (20, 30, 3), dtype=np.uint8)
        buf = io.BytesIO()
        Image.fromarray(arr).save(buf, format="PNG")
        imgs.append(base64.b64encode(buf.getvalue()).decode())
    Dataset.from_dict({
        "queries": [f"<image>\nWhat is in image {i}?" for i in range(n)],
        "image_bytes": imgs,
        "standard_response": [f"A standard answer number {i}." for i in range(n)],
        "image_id": [f"img{i}.png" for i in range(n)],
    }).save_to_disk(path)


def _base_cfg(output_dir, data_path, **training):
    return Config({
        "debug": {"tiny": True},
        "model": {"skip_loading_weights": True},
        "mesh": {"model": 1},
        "data": {"data_path": data_path},
        "training": {"output_dir": output_dir, "seed": 0, **training},
    })


@pytest.fixture(autouse=True)
def _clean_env(monkeypatch):
    for var in ("OUTPUT_DIR", "MODEL_DIR", "DATA_DIR", "IMAGE_DIR",
                "POLICY_LORA_DIR", "API_KEY", "API_KEY0"):
        monkeypatch.delenv(var, raising=False)


def test_full_pipeline(tmp_path):
    prompts = str(tmp_path / "prompts")
    _tiny_prompt_dataset(prompts, n=16)

    # ---- stage 1-2: rollout (dry API mode) ----
    from opadpo_tpu.pipeline import online_generation
    gen_out = str(tmp_path / "gen")
    cfg = _base_cfg(gen_out, prompts, response_len=8, query_len=64,
                    rollout_per_device_batch_size=1, top_k=4, top_p=0.9)
    online_generation.run(cfg)
    rollout_dir = os.path.join(gen_out, "rollouts")
    shards = sorted(os.listdir(rollout_dir))
    assert len(shards) == 2          # 16 rows / (1*8 per batch)

    # resume is a no-op (all steps already done)
    online_generation.run(cfg)
    assert sorted(os.listdir(rollout_dir)) == shards

    # dry-run API → empty reports; inject a fake GPT-4V report so the
    # dataset filters keep the rows
    for name in shards:
        p = os.path.join(rollout_dir, name)
        with open(p) as f:
            records = json.load(f)
        for rec in records:
            resp = rec["original_generate_response"] or "placeholder resp"
            rec["original_generate_response"] = resp
            rec["AI_pseudo_response"] = "A corrected answer."
            rec["AI_json_report"] = json.dumps({
                "sentence_1": {"copied content": resp, "score": 2,
                               "error type": "image_recognition_error",
                               "rewritten content": "A corrected answer."},
                "Added": {"rewritten content": ""},
            })
        with open(p, "w") as f:
            json.dump(records, f)

    # ---- dataset construction ----
    from opadpo_tpu.pipeline.dataset_ops import build_opadpo_datasets
    opa_data = str(tmp_path / "opa_data")
    dpo_data = str(tmp_path / "dpo_data")
    build_opadpo_datasets([rollout_dir], opa_data, dpo_data)
    from datasets import load_from_disk
    assert len(load_from_disk(dpo_data)) == 16

    # ---- stage 3: OPA SFT ----
    from opadpo_tpu.pipeline import opa_train
    opa_out = str(tmp_path / "opa_out")
    cfg = _base_cfg(opa_out, opa_data, num_train_epochs=1,
                    per_device_train_batch_size=1,
                    gradient_accumulation_steps=1, save_steps=1000,
                    query_len=64, response_len=32, logging_steps=1,
                    tune_vision_tower=True, lora_r=4, lora_alpha=8)
    opa_train.train(cfg)
    final = os.path.join(opa_out, "checkpoint-final")
    assert os.path.isdir(os.path.join(final, "adapter_model", "lora_policy"))
    _, completed = ckpt_lib.get_last_checkpoint(opa_out)
    assert completed
    assert os.path.exists(os.path.join(opa_out, "train_log.jsonl"))

    # ---- stage 4: OPA-DPO ----
    from opadpo_tpu.pipeline import opadpo_train
    dpo_out = str(tmp_path / "dpo_out")
    cfg = _base_cfg(
        dpo_out, dpo_data, total_epochs=1, max_step=2,
        rollout_batch_size=8, step_batch_size=8,
        rollout_per_device_batch_size=1, step_per_device_batch_size=1,
        noptepochs=1, save_steps=1, query_len=256, response_len=16,
        lora_r=4, lora_alpha=8, CoPO=True, CoPO_method="random",
        AncPO=True, warmup_steps=0)
    opadpo_train.train(cfg)
    assert os.path.isdir(os.path.join(dpo_out, "checkpoint-2"))
    assert os.path.exists(os.path.join(dpo_out, COMPLETED := "completed"))
    with open(os.path.join(dpo_out, "train_log.jsonl")) as f:
        lines = [json.loads(l) for l in f]
    assert len(lines) == 2
    assert np.isfinite(lines[-1]["loss/total"])

    # ---- resume path: completed run is a no-op ----
    opadpo_train.train(cfg)


def _tiny_dpo_dataset(path, n=16):
    from datasets import Dataset
    rng = np.random.default_rng(1)
    imgs, reports = [], []
    for i in range(n):
        arr = rng.integers(0, 255, (20, 30, 3), dtype=np.uint8)
        buf = io.BytesIO()
        Image.fromarray(arr).save(buf, format="PNG")
        imgs.append(base64.b64encode(buf.getvalue()).decode())
        reports.append(json.dumps({
            "sentence_1": {"copied content": f"A generated answer {i}.",
                           "score": 2,
                           "error type": "image_recognition_error",
                           "rewritten content": "A corrected answer."},
            "Added": {"rewritten content": ""},
        }))
    Dataset.from_dict({
        "queries": [f"<image>\nWhat is in image {i}?" for i in range(n)],
        "image_bytes": imgs,
        "standard_response": [f"A standard answer {i}." for i in range(n)],
        "original_generate_response": [f"A generated answer {i}."
                                       for i in range(n)],
        "AI_pseudo_response": ["A corrected answer."] * n,
        "AI_json_report": reports,
        "image_id": [f"img{i}.png" for i in range(n)],
    }).save_to_disk(path)


def _final_adapter(out_dir, step):
    import orbax.checkpoint as ocp
    path = os.path.join(out_dir, f"checkpoint-{step}", "adapter_full.ckpt")
    tree = ocp.StandardCheckpointer().restore(os.path.abspath(path))
    return ckpt_lib._flatten_numpy(tree)


def test_resume_is_replay_deterministic(tmp_path):
    """2-steps-then-resume must bit-match 4-straight: per-step randomness
    derives from fold_in(root, step) and the minibatch permutation from
    (seed, step, epoch), so skipped steps leave no RNG drift (VERDICT r2
    item 7; the reference's resume diverges here)."""
    from opadpo_tpu.pipeline import opadpo_train

    data = str(tmp_path / "dpo_data")
    _tiny_dpo_dataset(data, n=16)
    common = dict(max_step=4, rollout_batch_size=8, step_batch_size=8,
                  rollout_per_device_batch_size=1,
                  step_per_device_batch_size=1, noptepochs=2, save_steps=2,
                  query_len=256, response_len=16, lora_r=4, lora_alpha=8,
                  CoPO=True, CoPO_method="random", AncPO=True,
                  warmup_steps=0)

    straight = str(tmp_path / "straight")
    opadpo_train.train(_base_cfg(straight, data, total_epochs=2, **common))
    ref = _final_adapter(straight, 4)

    resumed = str(tmp_path / "resumed")
    # phase 1 stops after 2 steps (epoch budget), phase 2 resumes to 4
    opadpo_train.train(_base_cfg(resumed, data, total_epochs=1, **common))
    assert os.path.isdir(os.path.join(resumed, "checkpoint-2"))
    os.remove(os.path.join(resumed, "completed"))
    opadpo_train.train(_base_cfg(resumed, data, total_epochs=2, **common))
    got = _final_adapter(resumed, 4)

    assert set(ref) == set(got)
    for key in ref:
        np.testing.assert_array_equal(ref[key], got[key], err_msg=key)


def test_multi_rank_rollout(tmp_path, monkeypatch):
    """Two simulated ranks produce disjoint step{N}_rank{R}.json shards
    that dataset_ops merges (reference generator.py:87-93 fan-out)."""
    from opadpo_tpu.pipeline import online_generation
    from opadpo_tpu.pipeline.dataset_ops import merge_and_filter

    prompts = str(tmp_path / "prompts")
    _tiny_prompt_dataset(prompts, n=16)
    gen_out = str(tmp_path / "gen")
    rollout_dir = os.path.join(gen_out, "rollouts")

    for rank in (0, 1):
        monkeypatch.setenv("RANK", str(rank))
        monkeypatch.setenv("WORLD_SIZE", "2")
        cfg = _base_cfg(gen_out, prompts, response_len=8, query_len=64,
                        rollout_per_device_batch_size=1, top_k=4, top_p=0.9)
        online_generation.run(cfg)

    shards = sorted(os.listdir(rollout_dir))
    assert shards == ["step1_rank0.json", "step1_rank1.json"]

    by_rank = {}
    for name in shards:
        with open(os.path.join(rollout_dir, name)) as f:
            recs = json.load(f)
        by_rank[name] = {r["image_id"] for r in recs}
        for r in recs:   # keep rows through the merge filters
            r["AI_pseudo_response"] = "A corrected answer."
            r["AI_json_report"] = json.dumps({"sentence_1": {
                "copied content": r["original_generate_response"] or "x",
                "score": 3, "rewritten content": "A corrected answer."}})
        with open(os.path.join(rollout_dir, name), "w") as f:
            json.dump(recs, f)

    # disjoint interleaved split covering all 16 rows
    assert by_rank["step1_rank0.json"] == {f"img{i}.png"
                                           for i in range(0, 16, 2)}
    assert by_rank["step1_rank1.json"] == {f"img{i}.png"
                                           for i in range(1, 16, 2)}

    merged = merge_and_filter([rollout_dir])
    assert len(merged) == 16

    # per-rank resume: rank 1 restarting is a no-op, a fresh rank 0 with
    # its shard deleted re-does step 1
    os.remove(os.path.join(rollout_dir, "step1_rank0.json"))
    from opadpo_tpu.pipeline import checkpoints as ck
    assert ck.find_max_step(rollout_dir, rank=1) == 1
    assert ck.find_max_step(rollout_dir, rank=0) == 0
    assert ck.find_max_step(rollout_dir) == 1


def test_rollout_continuous_slots(tmp_path):
    """training.continuous_slots routes rollout generation through the
    slot-pool engine: 8 queries through 2 slots (4 admissions per slot)
    produce the same shard schema and row coverage as batch generate."""
    from opadpo_tpu.pipeline import online_generation

    prompts = str(tmp_path / "prompts")
    _tiny_prompt_dataset(prompts, n=8)
    gen_out = str(tmp_path / "gen")
    cfg = _base_cfg(gen_out, prompts, response_len=8, query_len=64,
                    rollout_per_device_batch_size=1, top_k=4, top_p=0.9,
                    continuous_slots=2, continuous_seg_len=4)
    online_generation.run(cfg)

    rollout_dir = os.path.join(gen_out, "rollouts")
    shards = sorted(os.listdir(rollout_dir))
    assert shards == ["step1_rank0.json"]
    with open(os.path.join(rollout_dir, shards[0])) as f:
        recs = json.load(f)
    assert {r["image_id"] for r in recs} == {f"img{i}.png"
                                             for i in range(8)}
    for r in recs:
        assert isinstance(r["original_generate_response"], str)
