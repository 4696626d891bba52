"""Yes/No logit readout eval (reference ``model_vqa_logit.py``, 266 LoC):
instead of decoding text, read the first-token probabilities of the
yes/no variants (" Yes"/" No"/"\\nYes"/"\\nNo"/"yes"/"no") after the
prompt and answer with the argmax — a deterministic, fast alternative for
binary benchmarks like POPE.
"""

from __future__ import annotations

import argparse
import json
import os
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from opadpo_tpu.data.image_processing import preprocess_images
from opadpo_tpu.data.tokenization import tokenizer_image_token
from opadpo_tpu.eval.model_vqa import build_prompt, iter_jsonl_questions
from opadpo_tpu.models import llava as llava_model


def yes_no_token_ids(tokenizer) -> Dict[str, int]:
    """Last token id of each textual yes/no variant (reference :107-114)."""
    variants = ("yes", "no", " Yes", " No", "\nYes", "\nNo")
    return {v.strip().lower() + ("_nl" if v.startswith("\n") else
                                 "_sp" if v.startswith(" ") else ""):
            tokenizer(v).input_ids[-1] for v in variants}


def run_logit_inference(
    params: dict,
    cfg,
    tokenizer,
    questions: List[Dict],
    image_dir: Optional[str],
    answers_file: str,
    lora: Optional[dict] = None,
    lora_scaling: float = 1.0,
    batch_size: int = 8,
    query_len: int = 128,
    short_eval: bool = True,
) -> None:
    tok_ids = yes_no_token_ids(tokenizer)
    yes_ids = [v for k, v in tok_ids.items() if k.startswith("yes")]
    no_ids = [v for k, v in tok_ids.items() if k.startswith("no")]
    img_size = cfg.vision.image_size

    prefill_fn = jax.jit(lambda p, lo, q, m, im: llava_model.prefill(
        p, cfg, q, m, im, cache_len=q.shape[1] - 1 + cfg.num_patches + 8,
        lora=lo, lora_scaling=lora_scaling))

    os.makedirs(os.path.dirname(answers_file) or ".", exist_ok=True)
    with open(answers_file, "w") as out_f:
        for start in range(0, len(questions), batch_size):
            chunk = questions[start:start + batch_size]
            b = len(chunk)
            rows, pixels = [], []
            for q in chunk:
                ids = tokenizer_image_token(
                    build_prompt(q["text"], short_eval), tokenizer)
                rows.append(np.asarray(ids, np.int64))
            pixels = list(preprocess_images([q["image"] for q in chunk],
                                            image_dir, size=img_size))
            longest = max(len(r) for r in rows)
            qlen = max(query_len, -(-longest // 64) * 64)
            queries = np.zeros((batch_size, qlen), np.int64)
            mask = np.zeros((batch_size, qlen), np.int64)
            for i, r in enumerate(rows):
                r = r[-qlen:]
                queries[i, -len(r):] = r
                mask[i, -len(r):] = 1
            images = np.zeros((batch_size, img_size, img_size, 3),
                              np.float32)
            images[:b] = np.stack(pixels)

            pf = prefill_fn(params, lora, jnp.asarray(queries),
                            jnp.asarray(mask), jnp.asarray(images))
            logits = np.asarray(pf["last_logits"])[:b]
            probs = np.asarray(jax.nn.softmax(jnp.asarray(logits), axis=-1))

            for i, q in enumerate(chunk):
                p_yes = float(probs[i, yes_ids].sum())
                p_no = float(probs[i, no_ids].sum())
                out_f.write(json.dumps({
                    "question_id": q["question_id"],
                    "prompt": q["text"],
                    "text": "Yes" if p_yes >= p_no else "No",
                    "p_yes": p_yes,
                    "p_no": p_no,
                    "model_id": "llava-tpu-logit",
                }) + "\n")
            out_f.flush()
            print(f"[{start + b}/{len(questions)}]", flush=True)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--model-path", required=True)
    p.add_argument("--vision-path", default=None)
    p.add_argument("--adapter-path", default=None)
    p.add_argument("--question-file", required=True)
    p.add_argument("--image-folder", default=None)
    p.add_argument("--answers-file", required=True)
    p.add_argument("--batch-size", type=int, default=8)
    args = p.parse_args()

    from opadpo_tpu.models.loader import load_peft_adapter
    from opadpo_tpu.pipeline.runtime import load_tokenizer, setup_model

    cfg, params, _ = setup_model(args.model_path,
                                 vision_dir=args.vision_path)
    tokenizer = load_tokenizer(args.model_path)
    lora, scaling = None, 1.0
    if args.adapter_path:
        lora = load_peft_adapter(args.adapter_path, cfg.llama)
        acfg = json.load(open(os.path.join(args.adapter_path,
                                           "adapter_config.json")))
        scaling = acfg["lora_alpha"] / acfg["r"]

    questions = list(iter_jsonl_questions(args.question_file))
    run_logit_inference(params, cfg, tokenizer, questions,
                        args.image_folder, args.answers_file,
                        lora=lora, lora_scaling=scaling,
                        batch_size=args.batch_size)


if __name__ == "__main__":
    main()
