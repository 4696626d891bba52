"""Benchmark inference CLI — the TPU replacement for the reference's
``model_vqa*.py`` family (``eval_llava_rlhf_coco/model_vqa.py:71-260``,
``model_vqa_mmhal.py``, ``model_vqa_objectHal.py``, ``AMBER_generate.py``).

One driver covers all five benchmarks: per question it renders the
vicuna_v1 conversation, preprocesses the image (expand2square + CLIP), and
greedy-decodes on the batched KV-cache sampler (the reference loops one
question at a time with HF ``generate`` and a static ``cache_shape``;
batching is the TPU win).  Answers are written in the same JSONL schema so
the judge/summarizer stages interoperate.

``--short_eval`` appends the single-word-answer instruction used for POPE
(reference model_vqa.py behavior with short_eval=True).
"""

from __future__ import annotations

import argparse
import json
import os
import time
import uuid
from typing import Dict, Iterator, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from opadpo_tpu.constants import DEFAULT_IMAGE_TOKEN
from opadpo_tpu.data import conversation as conversation_lib
from opadpo_tpu.data.image_processing import preprocess_images
from opadpo_tpu.data.tokenization import tokenizer_image_token
from opadpo_tpu.engine.sampler import Sampler, truncate_after_tokens
from opadpo_tpu.engine.sampling import SamplingConfig

SHORT_EVAL_SUFFIX = ("\nAnswer the question using a single word or phrase.")


def iter_jsonl_questions(path: str) -> Iterator[Dict]:
    with open(path) as f:
        for line in f:
            line = line.strip()
            if line:
                yield json.loads(line)


def iter_amber_questions(path: str) -> Iterator[Dict]:
    """AMBER query json: [{"id", "image", "query"}]."""
    for item in json.load(open(path)):
        yield {"question_id": item["id"], "image": item["image"],
               "text": item["query"]}


def iter_mmhal_questions(path: str) -> Iterator[Dict]:
    """MMHal-Bench response template json (list of dicts with 'question',
    'image_src'/'image_path')."""
    data = json.load(open(path))
    for i, item in enumerate(data):
        yield {"question_id": i, "image": item.get("image_path")
               or item.get("image_src"), "text": item["question"],
               "meta": item}


def build_prompt(question: str, short_eval: bool = False) -> str:
    q = question
    if DEFAULT_IMAGE_TOKEN not in q:
        q = DEFAULT_IMAGE_TOKEN + "\n" + q
    if short_eval:
        q = q + SHORT_EVAL_SUFFIX
    conv = conversation_lib.default_conversation.copy()
    conv.append_message(conv.roles[0], q)
    conv.append_message(conv.roles[1], None)
    return conv.get_prompt()


def run_inference(
    params: dict,
    cfg,
    tokenizer,
    questions: List[Dict],
    image_dir: Optional[str],
    answers_file: str,
    lora: Optional[dict] = None,
    lora_scaling: float = 1.0,
    batch_size: int = 8,
    max_new_tokens: int = 1024,
    temperature: float = 0.0,
    short_eval: bool = False,
    query_len: int = 128,
    model_id: str = "llava-tpu",
    kv_bits: int = 16,
    head_bits: int = 16,
    decode_chunk: int = 0,
    continuous_slots: int = 0,
    seg_len: int = 64,
) -> None:
    sampling = SamplingConfig(
        greedy=(temperature == 0.0), temperature=max(temperature, 1e-4),
        eos_token_id=tokenizer.eos_token_id,
        pad_token_id=tokenizer.pad_token_id,
        max_new_tokens=max_new_tokens)

    if continuous_slots:
        # slot-pool scheduling across questions: generative benchmarks
        # (AMBER/MMHal/LLaVA-Bench) have wildly variable answer lengths,
        # so batch-sync decode pays every batch's max while the pool
        # refills finished slots between segments.  Uses the engine's
        # int8 KV cache (kv8 argmax measured stable, QUALITY_r03.json).
        return _run_inference_continuous(
            params, cfg, tokenizer, questions, image_dir, answers_file,
            lora=lora, lora_scaling=lora_scaling, slots=continuous_slots,
            seg_len=seg_len, sampling=sampling, short_eval=short_eval,
            query_len=query_len, model_id=model_id, head_bits=head_bits)

    sampler = Sampler(cfg, sampling, lora_scaling=lora_scaling,
                      kv_bits=kv_bits, head_bits=head_bits,
                      chunk=decode_chunk)
    # per-layer decode layout; rebind so the stacked weights free
    params, lora = sampler.prepare_params(params, lora)

    os.makedirs(os.path.dirname(answers_file) or ".", exist_ok=True)
    rng = jax.random.PRNGKey(0)
    img_size = cfg.vision.image_size

    with open(answers_file, "w") as out_f:
        for start in range(0, len(questions), batch_size):
            chunk = questions[start:start + batch_size]
            ids_rows, pixels = [], []
            for q in chunk:
                prompt = build_prompt(q["text"], short_eval)
                ids = tokenizer_image_token(prompt, tokenizer)
                ids_rows.append(np.asarray(ids, np.int64))
            # one native batch decode per chunk (PIL fallback inside)
            pixels = list(preprocess_images([q["image"] for q in chunk],
                                            image_dir, size=img_size))

            # bucket prompt length to multiples of 64 and pad the batch to
            # full size — each unique (qlen, batch) shape is a fresh ~3 min
            # compile at 7B
            longest = max(len(r) for r in ids_rows)
            qlen = max(query_len, -(-longest // 64) * 64)
            b = len(chunk)
            queries = np.zeros((batch_size, qlen), np.int64)
            mask = np.zeros((batch_size, qlen), np.int64)
            for i, r in enumerate(ids_rows):
                r = r[-qlen:]
                queries[i, -len(r):] = r
                mask[i, -len(r):] = 1
            images = np.zeros((batch_size, img_size, img_size, 3),
                              np.float32)
            images[:b] = np.stack(pixels)

            rng, sub = jax.random.split(rng)
            t0 = time.time()
            tokens = np.asarray(sampler.generate(
                params, jnp.asarray(queries), jnp.asarray(mask),
                jnp.asarray(images), sub, lora=lora))[:b]
            tokens = truncate_after_tokens(tokens, tokenizer.eos_token_id,
                                           tokenizer.pad_token_id)
            texts = tokenizer.batch_decode(tokens, skip_special_tokens=True)
            dt = time.time() - t0

            for q, text in zip(chunk, texts):
                rec = {
                    "question_id": q["question_id"],
                    "prompt": q["text"],
                    "text": text.strip(),
                    "answer_id": uuid.uuid4().hex[:22],
                    "model_id": model_id,
                    "metadata": {},
                }
                if "meta" in q:
                    rec["meta"] = q["meta"]
                out_f.write(json.dumps(rec) + "\n")
            out_f.flush()
            print(f"[{start + len(chunk)}/{len(questions)}] "
                  f"{len(chunk)} answers in {dt:.1f}s", flush=True)


def _run_inference_continuous(
    params, cfg, tokenizer, questions, image_dir, answers_file, *,
    lora, lora_scaling, slots, seg_len, sampling, short_eval, query_len,
    model_id, head_bits,
) -> None:
    """Drive all questions through the slot-pool engine: images load
    lazily at admission (the whole question set's pixels never sit in
    host RAM at once) and answers are buffered, then written in the
    original question order (scorers that zip answers with labels by
    line order stay correct)."""
    from opadpo_tpu.engine.continuous import ContinuousEngine

    rows = []
    for q in questions:
        prompt = build_prompt(q["text"], short_eval)
        rows.append(np.asarray(tokenizer_image_token(prompt, tokenizer),
                               np.int32))
    longest = max((len(r) for r in rows), default=query_len)
    qlen = max(query_len, -(-longest // 64) * 64)

    prep = Sampler(cfg, sampling, lora_scaling=lora_scaling,
                   kv_bits=8, head_bits=head_bits)
    params, lora = prep.prepare_params(params, lora)
    eng = ContinuousEngine(cfg, sampling, params, lora=lora,
                           lora_scaling=lora_scaling, max_batch=slots,
                           qlen=qlen, seg_len=seg_len)

    img_size = cfg.vision.image_size
    rid_to_idx: Dict[int, int] = {}
    answers: Dict[int, str] = {}
    next_q = 0
    t0 = time.time()
    while next_q < len(questions) or eng.has_work():
        # keep one admission wave queued ahead of the decode segments
        while next_q < len(questions) and len(eng._queue) < slots:
            q = questions[next_q]
            pix = preprocess_images([q["image"]], image_dir,
                                    size=img_size)[0]
            rid = eng.add_request(rows[next_q],
                                  np.ones_like(rows[next_q]), pix)
            rid_to_idx[rid] = next_q
            next_q += 1
        for rid, toks in eng.step():
            text = tokenizer.batch_decode(toks[None],
                                          skip_special_tokens=True)[0]
            answers[rid_to_idx[rid]] = text.strip()
            n_done = len(answers)
            if n_done % 50 == 0 or n_done == len(questions):
                print(f"[{n_done}/{len(questions)}] "
                      f"{time.time() - t0:.1f}s", flush=True)
    assert len(answers) == len(questions), (len(answers), len(questions))

    os.makedirs(os.path.dirname(answers_file) or ".", exist_ok=True)
    with open(answers_file, "w") as out_f:
        for i, q in enumerate(questions):
            rec = {
                "question_id": q["question_id"],
                "prompt": q["text"],
                "text": answers[i],
                "answer_id": uuid.uuid4().hex[:22],
                "model_id": model_id,
                "metadata": {},
            }
            if "meta" in q:
                rec["meta"] = q["meta"]
            out_f.write(json.dumps(rec) + "\n")


def main():
    p = argparse.ArgumentParser(description="benchmark inference (TPU)")
    p.add_argument("--model-path", required=True)
    p.add_argument("--vision-path", default=None)
    p.add_argument("--adapter-path", default=None)
    p.add_argument("--question-file", required=True)
    p.add_argument("--question-format", default="jsonl",
                   choices=["jsonl", "amber", "mmhal"])
    p.add_argument("--image-folder", default=None)
    p.add_argument("--answers-file", required=True)
    p.add_argument("--batch-size", type=int, default=8)
    p.add_argument("--max-new-tokens", type=int, default=1024)
    p.add_argument("--temperature", type=float, default=0.0)
    p.add_argument("--short_eval", action="store_true")
    p.add_argument("--kv-bits", type=int, default=16, choices=(16, 8, 4))
    p.add_argument("--head-bits", type=int, default=16, choices=(16, 8, 4))
    p.add_argument("--decode-chunk", type=int, default=0)
    p.add_argument("--continuous-slots", type=int, default=0,
                   help="slot-pool scheduling across questions (int8 KV): "
                        "finished answers free their slot immediately — "
                        "wins on variable-length generative benchmarks")
    p.add_argument("--seg-len", type=int, default=64,
                   help="continuous mode: decode steps per segment")
    p.add_argument("--pil-preprocess", action="store_true",
                   help="force the PIL image path (strict HF-numerics "
                        "parity) instead of the native C++ JPEG pipeline")
    p.add_argument("--visual-tokens", type=int, default=0,
                   help="training-free visual-token pruning: keep only "
                        "the top-K projected patches (0 = all 576, "
                        "reference numerics)")
    args = p.parse_args()

    if args.pil_preprocess:
        from opadpo_tpu.data.image_processing import set_pil_preprocess
        set_pil_preprocess(True)

    from opadpo_tpu.models.loader import load_peft_adapter
    from opadpo_tpu.pipeline.runtime import (
        llava_config_from_hf, load_tokenizer, setup_model,
    )

    cfg, params, _ = setup_model(args.model_path,
                                 vision_dir=args.vision_path,
                                 visual_tokens=args.visual_tokens or None)
    tokenizer = load_tokenizer(args.model_path)
    lora, scaling = None, 1.0
    if args.adapter_path:
        lora = load_peft_adapter(args.adapter_path, cfg.llama)
        with open(os.path.join(args.adapter_path,
                               "adapter_config.json")) as f:
            acfg = json.load(f)
        scaling = acfg["lora_alpha"] / acfg["r"]

    iters = {"jsonl": iter_jsonl_questions, "amber": iter_amber_questions,
             "mmhal": iter_mmhal_questions}
    questions = list(iters[args.question_format](args.question_file))

    run_inference(params, cfg, tokenizer, questions, args.image_folder,
                  args.answers_file, lora=lora, lora_scaling=scaling,
                  batch_size=args.batch_size,
                  max_new_tokens=args.max_new_tokens,
                  temperature=args.temperature, short_eval=args.short_eval,
                  kv_bits=args.kv_bits, head_bits=args.head_bits,
                  decode_chunk=args.decode_chunk,
                  continuous_slots=args.continuous_slots,
                  seg_len=args.seg_len)


if __name__ == "__main__":
    main()
