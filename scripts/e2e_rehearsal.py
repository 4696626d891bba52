"""On-chip end-to-end pipeline rehearsal (VERDICT r3 item 7).

Runs the full 4-stage OPA-DPO pipeline through the REAL entry points —
rollout generation (dry GPT-4V, reports injected), dataset construction,
OPA SFT, OPA-DPO — plus a POPE-format eval pass, at random-init weights,
and records per-stage wall-clock seconds to a JSON artifact
(``E2E_r04.json``).  The CPU test suite proves the plumbing composes
(tests/test_pipeline_e2e.py); THIS proves the chip-side compile/memory
story of the composed stages (reference stage chain:
``run/train_opa_dpo.sh:96-166``).

Usage:
    python scripts/e2e_rehearsal.py --model tiny --platform cpu  # preflight
    python scripts/e2e_rehearsal.py --model 7b --out E2E_r04.json
"""

from __future__ import annotations

import argparse
import base64
import io
import json
import os
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def _make_prompt_dataset(path: str, n: int) -> None:
    import numpy as np
    from datasets import Dataset
    from PIL import Image

    rng = np.random.default_rng(0)
    imgs = []
    for _ in range(n):
        arr = rng.integers(0, 255, (224, 224, 3), dtype=np.uint8)
        buf = io.BytesIO()
        Image.fromarray(arr).save(buf, format="PNG")
        imgs.append(base64.b64encode(buf.getvalue()).decode())
    Dataset.from_dict({
        "queries": [f"<image>\nDescribe scene number {i}." for i in range(n)],
        "image_bytes": imgs,
        "standard_response": [f"A standard description of scene {i}, "
                              "with several visible objects."
                              for i in range(n)],
        "image_id": [f"img{i}.png" for i in range(n)],
    }).save_to_disk(path)


def _inject_fake_reports(rollout_dir: str) -> None:
    """Stand-in for the GPT-4V correction API (dry mode leaves reports
    empty): write schema-exact reports so the dataset filters keep rows."""
    for name in sorted(os.listdir(rollout_dir)):
        p = os.path.join(rollout_dir, name)
        with open(p) as f:
            records = json.load(f)
        for rec in records:
            resp = rec["original_generate_response"] or "placeholder resp"
            rec["original_generate_response"] = resp
            rec["AI_pseudo_response"] = "A corrected, grounded answer."
            rec["AI_json_report"] = json.dumps({
                "sentence_1": {"copied content": resp, "score": 2,
                               "error type": "image_recognition_error",
                               "rewritten content":
                                   "A corrected, grounded answer."},
                "Added": {"rewritten content": ""},
            })
        with open(p, "w") as f:
            json.dump(records, f)


def _pope_questions(path: str, img_dir: str, n: int) -> None:
    import numpy as np
    from PIL import Image

    rng = np.random.default_rng(3)
    os.makedirs(img_dir, exist_ok=True)
    with open(path, "w") as f:
        for i in range(n):
            name = f"pope{i}.png"
            Image.fromarray(rng.integers(0, 255, (224, 224, 3),
                                         dtype=np.uint8)).save(
                os.path.join(img_dir, name))
            f.write(json.dumps({
                "question_id": i, "image": name,
                "text": f"Is there a dog in the image {i}?",
                "label": "yes" if i % 2 == 0 else "no",
            }) + "\n")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", choices=("tiny", "7b"), default="7b")
    ap.add_argument("--platform", choices=("default", "cpu"),
                    default="default",
                    help="cpu: force the CPU backend for a preflight run")
    ap.add_argument("--out", default=os.path.join(REPO, "E2E_r05.json"))
    ap.add_argument("--workdir", default=None)
    ap.add_argument("--n-prompts", type=int, default=8)
    ap.add_argument("--response-len", type=int, default=128)
    ap.add_argument("--pope-questions", type=int, default=0,
                    help="POPE question count (default: n_prompts)")
    ap.add_argument("--dpo-steps", type=int, default=2)
    ap.add_argument("--rollout-batch", type=int, default=4,
                    help="rollout per-device batch (16 matches the "
                         "bench's warm decode programs)")
    ap.add_argument("--scale", action="store_true",
                    help="production-representative scale (VERDICT r5 "
                         "ask 3): 64 prompts, full 896-token rollouts at "
                         "the bench decode config, 2 DPO steps at the "
                         "production batch math, 128 POPE questions")
    args = ap.parse_args()
    if args.scale:
        args.n_prompts = max(args.n_prompts, 64)
        args.response_len = 896
        args.rollout_batch = 16
        args.pope_questions = max(args.pope_questions, 128)

    if args.platform == "cpu":
        import jax
        jax.config.update("jax_platforms", "cpu")

    from opadpo_tpu.pipeline.config import Config

    work = args.workdir or tempfile.mkdtemp(prefix="e2e_rehearsal_")
    os.makedirs(work, exist_ok=True)
    tiny = args.model == "tiny"
    # 7B chip budget (CLAUDE.md): int8 base mandatory; w8a8 default; SFT
    # B=4 / DPO B=2 / rollout B=4 are the measured-safe single-chip points
    numerics = ({} if tiny else
                {"bits": 8, "act_bits": 8, "act_bwd_int8": True})
    qlen = 64 if tiny else 128
    rlen = 8 if tiny else args.response_len

    def base_cfg(out_dir, data_path, **training):
        return Config({
            # fake_tokenizer: full-scale shapes need a tokenizer but none
            # ships offline — the character-level test tokenizer rehearses
            # the identical compiled programs (ids stay inside the vocab)
            "debug": {"tiny": tiny, "fake_tokenizer": True},
            "model": {"skip_loading_weights": True},
            "mesh": {"model": 1},
            "data": {"data_path": data_path},
            "training": {"output_dir": out_dir, "seed": 0,
                         **numerics, **training},
        })

    stages = {}
    t_all = time.perf_counter()

    def timed(name):
        class _T:
            def __enter__(self):
                self.t0 = time.perf_counter()
                print(f"=== stage: {name}", flush=True)

            def __exit__(self, et, ev, tb):
                stages[name] = round(time.perf_counter() - self.t0, 1)
                print(f"=== stage {name}: {stages[name]} s "
                      f"({'FAILED' if et else 'ok'})", flush=True)
        return _T()

    prompts = os.path.join(work, "prompts")
    _make_prompt_dataset(prompts, args.n_prompts)

    # ---- stage 1: rollout generation (dry API) ----
    # production decode numerics (the bench rollout loop's exact
    # programs: int4 base + int8 prompt KV + int4 head + chunk 256) —
    # persistent-cache-warm when bench.py has run on this machine
    rollout_numerics = ({} if tiny else
                        {"bits": 4, "kv_bits": 8, "head_bits": 4,
                         "decode_chunk": 256})
    from opadpo_tpu.pipeline import online_generation
    gen_out = os.path.join(work, "gen")
    with timed("rollout_generation"):
        online_generation.run(Config({
            "debug": {"tiny": tiny, "fake_tokenizer": True},
            "model": {"skip_loading_weights": True},
            "mesh": {"model": 1},
            "data": {"data_path": prompts},
            "training": {"output_dir": gen_out, "seed": 0,
                         "response_len": rlen, "query_len": qlen,
                         "rollout_per_device_batch_size":
                             1 if tiny else args.rollout_batch,
                         "top_k": 30, "top_p": 0.95,
                         **rollout_numerics}}))
    rollout_dir = os.path.join(gen_out, "rollouts")
    shard_times = sorted(
        os.path.getmtime(os.path.join(rollout_dir, f))
        for f in os.listdir(rollout_dir))
    _inject_fake_reports(rollout_dir)

    # ---- stage 2: dataset construction ----
    from opadpo_tpu.pipeline.dataset_ops import build_opadpo_datasets
    opa_data = os.path.join(work, "opa_data")
    dpo_data = os.path.join(work, "dpo_data")
    with timed("dataset_build"):
        build_opadpo_datasets([rollout_dir], opa_data, dpo_data)

    # ---- stage 3: OPA SFT ----
    from opadpo_tpu.pipeline import opa_train
    opa_out = os.path.join(work, "opa_out")
    with timed("opa_sft"):
        opa_train.train(base_cfg(
            opa_out, opa_data, num_train_epochs=1,
            per_device_train_batch_size=1 if tiny else 4,
            gradient_accumulation_steps=1, save_steps=1000,
            query_len=qlen, response_len=max(rlen, 32), logging_steps=1,
            tune_vision_tower=True, lora_r=4 if tiny else 64,
            lora_alpha=8 if tiny else 128))

    # ---- stage 4: OPA-DPO ----
    from opadpo_tpu.pipeline import opadpo_train
    dpo_out = os.path.join(work, "dpo_out")
    with timed("opa_dpo"):
        opadpo_train.train(base_cfg(
            dpo_out, dpo_data, total_epochs=1, max_step=args.dpo_steps,
            rollout_batch_size=min(args.n_prompts, 32),
            step_batch_size=min(args.n_prompts, 32),
            rollout_per_device_batch_size=1 if tiny else 2,
            step_per_device_batch_size=1 if tiny else 2,
            noptepochs=1 if tiny else 2, save_steps=1000,
            # --scale runs the PRODUCTION DPO shapes (query 128 /
            # response 896, configs/llava_training_base.yaml) so the
            # composed step is comparable to bench.py's dpo_step record
            # and hits its warm compile cache
            query_len=qlen if args.scale else 256,
            response_len=rlen if args.scale else max(rlen // 2, 16),
            lora_r=4 if tiny else 64, lora_alpha=8 if tiny else 128,
            CoPO=True, CoPO_method="random", AncPO=True, warmup_steps=0))

    # ---- stage 5: POPE-format eval ----
    import jax
    from opadpo_tpu.eval.model_vqa import iter_jsonl_questions, run_inference
    from opadpo_tpu.eval.pope import evaluate_pope_files
    from opadpo_tpu.models import llava as llava_model
    from opadpo_tpu.models.llava import LlavaConfig
    from tests.fake_tokenizer import FakeTokenizer

    qfile = os.path.join(work, "pope.jsonl")
    img_dir = os.path.join(work, "pope_imgs")
    answers = os.path.join(work, "pope_answers.jsonl")
    _pope_questions(qfile, img_dir, args.pope_questions or args.n_prompts)
    with timed("pope_eval"):
        cfg = LlavaConfig.tiny() if tiny else LlavaConfig.llava_7b()
        if tiny:
            params = jax.jit(lambda: llava_model.init_params(
                jax.random.PRNGKey(0), cfg))()
        else:
            # bf16 7B params (14.2 GB) + KV cache do NOT fit this chip
            # for decode — eval runs the int8 base like every other
            # stage.  Fill the QUANTIZED shapes directly: a fused
            # init->quantize program peaks at bf16+int8 HBM and OOMs.
            import jax.numpy as jnp

            from opadpo_tpu.ops import quant
            shapes = jax.eval_shape(lambda: quant.quantize_params(
                llava_model.init_params(jax.random.PRNGKey(0), cfg)))
            params = jax.jit(lambda: jax.tree_util.tree_map(
                lambda s: jnp.full(s.shape, 0.01, s.dtype), shapes))()
        run_inference(params, cfg, FakeTokenizer(),
                      list(iter_jsonl_questions(qfile)), img_dir, answers,
                      batch_size=4, max_new_tokens=8, temperature=0.0,
                      short_eval=True, query_len=qlen)
        metrics = evaluate_pope_files(answers, qfile)

    # ---- steady-state per-stage rates (compile excluded) ----
    def _jsonl_step_seconds(path):
        """Median wall_s delta between consecutive logged steps,
        excluding the first delta (which carries the compile)."""
        try:
            with open(path) as f:
                walls = [json.loads(ln).get("wall_s") for ln in f]
            walls = [w for w in walls if w is not None]
            deltas = [b - a for a, b in zip(walls, walls[1:])]
            deltas = deltas[1:] if len(deltas) > 2 else deltas
            if not deltas:
                return None
            deltas.sort()
            return round(deltas[len(deltas) // 2], 3)
        except OSError:
            return None

    steady = {}
    # rollout: per-shard mtime gaps = per-batch wall; steady excludes
    # the first (compile-heavy) batch
    if len(shard_times) >= 3:
        gaps = sorted(b - a for a, b in zip(shard_times, shard_times[1:]))
        med = gaps[len(gaps) // 2]
        bsz = 1 if tiny else args.rollout_batch
        steady["rollout_tokens_per_sec"] = round(rlen * bsz / med, 1)
    sft_step_s = _jsonl_step_seconds(os.path.join(opa_out,
                                                  "train_log.jsonl"))
    if sft_step_s:
        steady["sft_seconds_per_microstep"] = sft_step_s
    dpo_step_s = _jsonl_step_seconds(os.path.join(dpo_out,
                                                  "train_log.jsonl"))
    if dpo_step_s:
        steady["dpo_seconds_per_logged_step"] = dpo_step_s

    # ---- projection check vs the bench-derived hot-loop rates ----
    # (VERDICT r5 ask 3: the 20.9/59-minute stage projections must
    # survive composition; flag any stage off by > 20%)
    projection_check = {}
    bench = {}
    try:
        with open(os.path.join(REPO, "bench_last_good.json")) as f:
            bench = json.load(f)["result"].get("hot_loops", {})
    except (OSError, KeyError, json.JSONDecodeError):
        pass

    def _check(name, measured, bench_val, invert=False):
        if measured is None or not bench_val:
            return
        ratio = (measured / bench_val) if not invert else             (bench_val / measured)
        projection_check[name] = {
            "composed": measured, "bench": bench_val,
            "ratio": round(ratio, 3),
            "off_by_gt_20pct": bool(abs(ratio - 1.0) > 0.20),
        }

    _check("rollout_tokens_per_sec",
           steady.get("rollout_tokens_per_sec"),
           bench.get("rollout_decode", {}).get("tokens_per_sec"))
    _check("sft_seconds_per_step",
           steady.get("sft_seconds_per_microstep"),
           bench.get("sft_step", {}).get("seconds_per_step"))
    # the composed DPO logged step = per-pair reference scoring plus
    # noptepochs policy micro-steps over rollout_batch/step_batch rows —
    # the same batch math the v5e-8 stage projection assumes
    dpo_bench = bench.get("dpo_step", {})
    if (steady.get("dpo_seconds_per_logged_step")
            and dpo_bench.get("seconds_per_step")
            and dpo_bench.get("rollout_score_seconds") is not None):
        micro = min(args.n_prompts, 32) // (1 if tiny else 2)
        nopt = 1 if tiny else 2
        expected = micro * (dpo_bench["rollout_score_seconds"]
                            + nopt * dpo_bench["seconds_per_step"])
        _check("dpo_seconds_per_step",
               steady["dpo_seconds_per_logged_step"], expected)

    record = {
        "model": args.model,
        "platform": args.platform,
        "n_prompts": args.n_prompts,
        "response_len": rlen,
        "dpo_steps": args.dpo_steps,
        "pope_questions": args.pope_questions or args.n_prompts,
        "numerics": numerics or {"bits": 16},
        "rollout_numerics": rollout_numerics or {"bits": 16},
        "stage_seconds": stages,
        "steady_state": steady,
        "projection_check": projection_check,
        "total_seconds": round(time.perf_counter() - t_all, 1),
        "pope_num_examples": metrics["num_examples"],
        "measured_at": time.strftime("%Y-%m-%dT%H:%M:%S"),
        "note": "random-init weights; rehearses the composed pipeline's "
                "chip-side compile+memory story, not model quality",
    }
    with open(args.out, "w") as f:
        json.dump(record, f, indent=2)
    print(json.dumps(record))


if __name__ == "__main__":
    main()
