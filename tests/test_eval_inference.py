"""End-to-end eval inference on the tiny model: run_inference over a
POPE-style question file → answers JSONL → rule-based scoring."""

import json
import os

import jax
import numpy as np
from PIL import Image

from opadpo_tpu.eval.model_vqa import iter_jsonl_questions, run_inference
from opadpo_tpu.eval.pope import evaluate_pope_files
from opadpo_tpu.models import llava as llava_model
from opadpo_tpu.models.llava import LlavaConfig
from tests.fake_tokenizer import FakeTokenizer

CFG = LlavaConfig.tiny()
PARAMS = llava_model.init_params(jax.random.PRNGKey(0), CFG)


def test_run_inference_pope_roundtrip(tmp_path):
    img_dir = tmp_path / "imgs"
    img_dir.mkdir()
    rng = np.random.default_rng(0)
    qfile = tmp_path / "pope.jsonl"
    with open(qfile, "w") as f:
        for i in range(5):
            name = f"img{i}.png"
            Image.fromarray(rng.integers(0, 255, (30, 40, 3),
                                         dtype=np.uint8)).save(img_dir / name)
            f.write(json.dumps({
                "question_id": i, "image": name,
                "text": f"Is there a dog in the image {i}?",
                "label": "yes" if i % 2 == 0 else "no",
            }) + "\n")

    questions = list(iter_jsonl_questions(str(qfile)))
    answers = tmp_path / "answers.jsonl"
    run_inference(PARAMS, CFG, FakeTokenizer(), questions, str(img_dir),
                  str(answers), batch_size=2, max_new_tokens=4,
                  temperature=0.0, short_eval=True, query_len=64)

    recs = [json.loads(l) for l in open(answers)]
    assert len(recs) == 5
    assert {r["question_id"] for r in recs} == set(range(5))
    assert all("text" in r and "answer_id" in r for r in recs)

    # scorer consumes the produced files end-to-end
    metrics = evaluate_pope_files(str(answers), str(qfile))
    assert metrics["num_examples"] == 5
    assert 0.0 <= metrics["accuracy"] <= 1.0


def test_continuous_inference_matches_batch(tmp_path):
    """--continuous-slots routes eval through the slot-pool engine: the
    answers must match the batch-sync sampler's per question (f32 tiny
    model so int8-KV rounding cannot flip the near-uniform argmax)."""
    import dataclasses

    import jax.numpy as jnp

    cfg32 = LlavaConfig(
        dataclasses.replace(CFG.llama, dtype=jnp.float32),
        dataclasses.replace(CFG.vision, dtype=jnp.float32),
        dataclasses.replace(CFG.projector, dtype=jnp.float32))
    params32 = llava_model.init_params(jax.random.PRNGKey(0), cfg32)

    img_dir = tmp_path / "imgs"
    img_dir.mkdir()
    rng = np.random.default_rng(1)
    qfile = tmp_path / "q.jsonl"
    with open(qfile, "w") as f:
        for i in range(5):
            name = f"img{i}.png"
            Image.fromarray(rng.integers(0, 255, (30, 40, 3),
                                         dtype=np.uint8)).save(img_dir / name)
            f.write(json.dumps({
                "question_id": i, "image": name,
                "text": f"Describe object number {i}.",
            }) + "\n")
    questions = list(iter_jsonl_questions(str(qfile)))

    a_batch = tmp_path / "batch.jsonl"
    run_inference(params32, cfg32, FakeTokenizer(), questions,
                  str(img_dir), str(a_batch), batch_size=2,
                  max_new_tokens=4, temperature=0.0, query_len=64,
                  kv_bits=8)
    a_cont = tmp_path / "cont.jsonl"
    run_inference(params32, cfg32, FakeTokenizer(), questions,
                  str(img_dir), str(a_cont), batch_size=2,
                  max_new_tokens=4, temperature=0.0, query_len=64,
                  continuous_slots=2, seg_len=2)

    by_id = lambda p: {r["question_id"]: r["text"]
                       for r in map(json.loads, open(p))}
    got, ref = by_id(a_cont), by_id(a_batch)
    assert set(got) == set(ref) == set(range(5))
    assert got == ref, (got, ref)
