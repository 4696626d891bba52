"""Eval orchestrator — the reference's ``run/eval_all_metrics.sh`` stages
as one CLI: inference (TPU) for each benchmark, then judge/summarize.

Stages (subset selectable with --benchmarks):
  pope        model_vqa --short_eval over coco_pope_{random,popular,
              adversarial}.jsonl → rule-based F1
  llava_bench qa90 inference → GPT-4 pairwise review → relative %
  mmhal       96-question inference → GPT-4 judge → avg score + hal rate
  amber       AMBER_data queries → generative+discriminative scoring
  objhal      Object-HalBench 300 → CHAIR metrics
"""

from __future__ import annotations

import argparse
import json
import os


def main():
    p = argparse.ArgumentParser(description="run hallucination eval suite")
    p.add_argument("--model-path", required=True)
    p.add_argument("--vision-path", default=None)
    p.add_argument("--adapter-path", default=None)
    p.add_argument("--data-root", required=True,
                   help="dir with pope/, AMBER_data/, qa90 files, etc.")
    p.add_argument("--image-root", required=True)
    p.add_argument("--output-dir", required=True)
    p.add_argument("--benchmarks", nargs="+",
                   default=["pope", "amber", "mmhal", "llava_bench",
                            "objhal"])
    p.add_argument("--batch-size", type=int, default=8)
    p.add_argument("--continuous-slots", type=int, default=0,
                   help="slot-pool scheduling across questions "
                        "(model_vqa --continuous-slots; int8 KV)")
    p.add_argument("--judge", action="store_true",
                   help="run GPT-4 judge stages (needs API_KEY)")
    p.add_argument("--objhal-gpt-extraction", action="store_true",
                   help="Object-Hal: extract mentioned objects with the "
                        "GPT-4 API (the reference's shipped mode) instead "
                        "of the regex+synonym matcher (needs API_KEY)")
    p.add_argument("--pil-preprocess", action="store_true",
                   help="force the PIL image path (strict HF-numerics "
                        "parity) instead of the native C++ JPEG pipeline")
    args = p.parse_args()

    if args.pil_preprocess:
        from opadpo_tpu.data.image_processing import set_pil_preprocess
        set_pil_preprocess(True)

    from opadpo_tpu.eval import model_vqa as mv
    from opadpo_tpu.models.loader import load_peft_adapter
    from opadpo_tpu.pipeline.runtime import load_tokenizer, setup_model

    os.makedirs(args.output_dir, exist_ok=True)
    cfg, params, _ = setup_model(args.model_path,
                                 vision_dir=args.vision_path)
    tokenizer = load_tokenizer(args.model_path)
    lora, scaling = None, 1.0
    if args.adapter_path:
        lora = load_peft_adapter(args.adapter_path, cfg.llama)
        with open(os.path.join(args.adapter_path,
                               "adapter_config.json")) as f:
            acfg = json.load(f)
        scaling = acfg["lora_alpha"] / acfg["r"]

    def infer(questions, answers_file, **kw):
        mv.run_inference(params, cfg, tokenizer, questions, args.image_root,
                         answers_file, lora=lora, lora_scaling=scaling,
                         batch_size=args.batch_size,
                         continuous_slots=args.continuous_slots, **kw)

    results = {}

    if "pope" in args.benchmarks:
        from opadpo_tpu.eval.pope import evaluate_pope_files
        for split in ("random", "popular", "adversarial"):
            qfile = os.path.join(args.data_root, "pope",
                                 f"coco_pope_{split}.jsonl")
            afile = os.path.join(args.output_dir, f"pope_{split}.jsonl")
            qs = list(mv.iter_jsonl_questions(qfile))
            infer(qs, afile, short_eval=True, max_new_tokens=64)
            results[f"pope_{split}"] = evaluate_pope_files(afile, qfile)

    if "amber" in args.benchmarks:
        amber_dir = os.path.join(args.data_root, "AMBER_data")
        qfile = os.path.join(amber_dir, "query", "query_all.json")
        afile = os.path.join(args.output_dir, "amber_answers.jsonl")
        qs = list(mv.iter_amber_questions(qfile))
        infer(qs, afile, max_new_tokens=512)
        from opadpo_tpu.eval.amber import evaluate_amber
        inference = []
        for line in open(afile):
            rec = json.loads(line)
            inference.append({"id": rec["question_id"],
                              "response": rec["text"]})
        results["amber"] = evaluate_amber(
            inference,
            json.load(open(os.path.join(amber_dir, "annotations.json"))),
            json.load(open(os.path.join(amber_dir, "relation.json"))),
            [l.rstrip("\n") for l in
             open(os.path.join(amber_dir, "safe_words.txt"))])

    if "mmhal" in args.benchmarks:
        tmpl = os.path.join(args.data_root, "mmhal",
                            "response_template.json")
        afile = os.path.join(args.output_dir, "mmhal_answers.jsonl")
        qs = list(mv.iter_mmhal_questions(tmpl))
        infer(qs, afile, max_new_tokens=512)
        records = []
        for line in open(afile):
            rec = json.loads(line)
            meta = rec["meta"]
            meta["model_answer"] = rec["text"]
            records.append(meta)
        resp_file = os.path.join(args.output_dir, "mmhal_responses.json")
        json.dump(records, open(resp_file, "w"), indent=2)
        if args.judge:
            from opadpo_tpu.eval.mmhal import judge_answers, summarize
            from opadpo_tpu.pipeline.gpt4v_client import get_api_service
            reviewed = judge_answers(
                records, get_api_service(),
                reviews_out=os.path.join(args.output_dir,
                                         "mmhal_reviews.json"))
            results["mmhal"] = summarize(reviewed)

    if "llava_bench" in args.benchmarks:
        qfile = os.path.join(args.data_root, "qa90_questions.jsonl")
        afile = os.path.join(args.output_dir, "qa90_answers.jsonl")
        qs = list(mv.iter_jsonl_questions(qfile))
        infer(qs, afile, max_new_tokens=1024)
        if args.judge:
            from opadpo_tpu.eval.llava_bench import run_reviews, summarize
            from opadpo_tpu.pipeline.gpt4v_client import get_api_service
            gpt4_answers = [json.loads(l) for l in open(
                os.path.join(args.data_root, "qa90_gpt4_answer.jsonl"))]
            model_answers = [json.loads(l) for l in open(afile)]
            ctx_path = os.path.join(args.data_root, "caps_boxes_coco2014.jsonl")
            contexts = {}
            if os.path.exists(ctx_path):
                for line in open(ctx_path):
                    c = json.loads(line)
                    contexts[str(c["image"])] = c.get("caption", "")
            reviews = run_reviews(
                qs, gpt4_answers, model_answers, contexts,
                get_api_service(),
                out_file=os.path.join(args.output_dir, "qa90_reviews.jsonl"))
            results["llava_bench"] = summarize(reviews)

    if "objhal" in args.benchmarks:
        qfile = os.path.join(args.data_root, "obj_halbench_300.jsonl")
        afile = os.path.join(args.output_dir, "objhal_answers.jsonl")
        qs = list(mv.iter_jsonl_questions(qfile))
        infer(qs, afile, max_new_tokens=1024)
        gt_path = os.path.join(args.data_root, "objhal_gt_objects.json")
        if os.path.exists(gt_path):
            from opadpo_tpu.eval.object_hal import (
                evaluate_chair, make_gpt_extractor,
            )
            responses = [json.loads(l) for l in open(afile)]
            extractor = None
            if args.objhal_gpt_extraction:
                # the reference's shipped eval uses the GPT-4 extraction
                # mode (eval_gpt_obj_halbench.py gpt_process=True)
                from opadpo_tpu.pipeline.gpt4v_client import get_api_service
                extractor = make_gpt_extractor(get_api_service(
                    cache_path=os.path.join(args.output_dir,
                                            "objhal_extract.sqlite")))
            results["objhal"] = evaluate_chair(responses,
                                               json.load(open(gt_path)),
                                               extract_objects_fn=extractor)

    out = os.path.join(args.output_dir, "eval_results.json")
    with open(out, "w") as f:
        json.dump(results, f, indent=2)
    print(json.dumps(results, indent=2))


if __name__ == "__main__":
    main()
