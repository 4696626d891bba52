"""GPT-3.5 baseline answers (reference ``qa_baseline_gpt35.py``): produce
answers JSONL for a question file via the chat API, for relative-score
comparisons in the LLaVA-Bench pipeline.
"""

from __future__ import annotations

import argparse
import json
import uuid

from opadpo_tpu.eval.model_vqa import iter_jsonl_questions
from opadpo_tpu.pipeline.gpt4v_client import get_api_service


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--question-file", required=True)
    p.add_argument("--answers-file", required=True)
    p.add_argument("--model", default="gpt-3.5-turbo")
    args = p.parse_args()

    api = get_api_service()
    api.model = args.model
    with open(args.answers_file, "w") as out_f:
        for q in iter_jsonl_questions(args.question_file):
            text = api.call_llm_with_messages([
                {"role": "system",
                 "content": "You are a helpful assistant."},
                {"role": "user", "content": q["text"]},
            ])
            out_f.write(json.dumps({
                "question_id": q["question_id"],
                "prompt": q["text"],
                "text": text.strip(),
                "answer_id": uuid.uuid4().hex[:22],
                "model_id": args.model,
            }) + "\n")
            out_f.flush()


if __name__ == "__main__":
    main()
