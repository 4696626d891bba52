"""ScienceQA inference + scorer (reference ``model_vqa_science.py``,
a stock-LLaVA extra): multiple-choice science questions with optional
image + context hint; the answer letter is parsed from the generation.
"""

from __future__ import annotations

import argparse
import json
import os
import re
from typing import Dict, List

OPTION_LETTERS = ("A", "B", "C", "D", "E")


def build_science_prompt(item: Dict) -> str:
    """question + hint + lettered choices → single-letter-answer prompt."""
    q = item["conversations"][0]["value"] if "conversations" in item \
        else item["question"]
    parts = [q]
    hint = item.get("hint", "")
    if hint:
        parts.insert(0, f"Context: {hint}")
    choices = item.get("choices", [])
    if choices:
        lettered = " ".join(f"({OPTION_LETTERS[i]}) {c}"
                            for i, c in enumerate(choices))
        parts.append(lettered)
    parts.append("Answer with the option's letter from the given choices "
                 "directly.")
    return "\n".join(parts)


def science_questions(path: str, image_dir: str) -> List[Dict]:
    data = json.load(open(path))
    if isinstance(data, dict):
        data = [{"id": k, **v} for k, v in data.items()]
    out = []
    for item in data:
        img = item.get("image")
        out.append({
            "question_id": item.get("id"),
            "text": build_science_prompt(item),
            "image": os.path.join(item.get("id", ""), img) if img else None,
            "answer_idx": item.get("answer"),
        })
    return out


_LETTER_RE = re.compile(r"\b([A-E])\b")


def parse_answer_letter(text: str) -> str:
    m = _LETTER_RE.search(text.strip())
    return m.group(1) if m else ""


def score_science(answers_file: str, questions: List[Dict]) -> Dict:
    by_id = {q["question_id"]: q for q in questions}
    total, correct = 0, 0
    for line in open(answers_file):
        rec = json.loads(line)
        q = by_id.get(rec["question_id"])
        if q is None or q.get("answer_idx") is None:
            continue
        total += 1
        pred = parse_answer_letter(rec["text"])
        gold = OPTION_LETTERS[q["answer_idx"]]
        if pred == gold:
            correct += 1
    return {"accuracy": round(correct / max(total, 1) * 100, 2),
            "num_questions": total}


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--model-path", required=True)
    p.add_argument("--vision-path", default=None)
    p.add_argument("--adapter-path", default=None)
    p.add_argument("--question-file", required=True)
    p.add_argument("--image-folder", required=True)
    p.add_argument("--answers-file", required=True)
    p.add_argument("--batch-size", type=int, default=8)
    args = p.parse_args()

    from opadpo_tpu.eval.model_vqa import run_inference
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

    questions = [q for q in science_questions(args.question_file,
                                              args.image_folder)
                 if q["image"]]
    run_inference(params, cfg, tokenizer, questions, args.image_folder,
                  args.answers_file, lora=lora, lora_scaling=scaling,
                  batch_size=args.batch_size, max_new_tokens=64)
    print(json.dumps(score_science(args.answers_file, questions)))


if __name__ == "__main__":
    main()
