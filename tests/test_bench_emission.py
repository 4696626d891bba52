"""bench.py incremental-emission / budget logic (VERDICT r3 item 1).

The chip-side benches cannot run under CI, but the structural guarantee
— "the driver's artifact is never empty again" — lives in pure-Python
logic that CAN: `_annotate` recomputes every derived field per emission
so each printed line is a complete record on its own, and the hot-loop
driver emits a cumulative line after EVERY loop, skipping loops the
wall-clock budget can no longer fit with explicit markers.
"""

import importlib.util
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _load_bench():
    spec = importlib.util.spec_from_file_location(
        "bench", os.path.join(REPO, "bench.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_annotate_projects_both_numerics_variants():
    bench = _load_bench()
    rec = {
        "config": "w8a8_b1_seq2048",
        "hot_loops": {
            "sft_step": {"seq_per_sec_chip": 1.917},
            "sft_step_bf16": {"seq_per_sec_chip": 0.5},
            "dpo_step": {"seconds_per_step": 3.477,
                         "rollout_score_seconds": 1.06},
        },
    }
    out = bench._annotate(dict(rec))
    # OPA stage: 4800*2*2 sequences over 8 chips at the measured rate.
    assert out["projected_v5e8_opa_stage_minutes"] == round(
        (4800 * 2 * 2) / (8 * 1.917) / 60.0, 1)
    assert "projected_v5e8_opa_stage_minutes_bf16" in out
    assert out["reference_a100x4_opa_stage_minutes"] == 30.0
    # DPO stage: 9600 pairs / B=2 / 8 chips, scoring + 2 policy steps.
    sec = (9600 / 2 / 8) * (1.06 + 2 * 3.477)
    assert out["projected_v5e8_dpo_stage_minutes"] == round(sec / 60.0, 1)


def test_annotate_rollout_and_13b_projections():
    bench = _load_bench()
    rec = {
        "config": "w8a8_b8",
        "hot_loops": {
            "rollout_decode": {"tokens_per_sec": 778.0},
            "rollout_decode_13b": {"tokens_per_sec": 334.0},
            "dpo_step_13b": {"seconds_per_step": 3.97,
                             "rollout_score_seconds": 1.2},
        },
    }
    out = bench._annotate(dict(rec))
    tokens = 2 * 2500 * 896
    assert out["projected_v5e8_rollout_stage_minutes"] == round(
        tokens / (8 * 778.0) / 60.0, 1)
    assert out["projected_v5e8_rollout_stage_minutes_13b"] == round(
        tokens / (8 * 334.0) / 60.0, 1)
    sec = (9600 / 1 / 8) * (1.2 + 2 * 3.97)
    assert out["projected_v5e8_dpo_stage_minutes_13b"] == round(
        sec / 60.0, 1)
    assert "rollout_projection_note" in out


def test_scoring_record_is_self_interpreting():
    """VERDICT r4 weak #1: the stacked-equivalent accounting and the
    achieved-FLOPs/MFU anchor must ride every scoring record."""
    bench = _load_bench()
    results = {"w8a8_b8": {"tokens_per_sec": 23354.0,
                           "seconds_per_forward": 1.643,
                           "positions_stacked": 38376,
                           "positions_computed": 27128},
               "bf16_b1": {"tokens_per_sec": 15940.0,
                           "seconds_per_forward": 0.301,
                           "positions_stacked": 4797,
                           "positions_computed": 3391}}
    rec = bench._scoring_record(results)
    assert rec["config"] == "w8a8_b8"
    assert "stacked-equivalent" in rec["accounting"]
    pps = 27128 / 1.643
    assert rec["achieved_tflops"] == round(2 * 6.74e9 * pps / 1e12, 1)
    assert abs(rec["mfu"] - rec["achieved_tflops"] / 227.0) < 2e-3
    assert rec["mfu_ceiling_tflops"] == 227.0
    # 13B records use the bf16 ceiling (int4 dequant matmuls are bf16)
    rec13 = bench._scoring_record(
        {"int4_b4": {"tokens_per_sec": 5158.0, "seconds_per_forward": 3.7,
                     "positions_stacked": 19188,
                     "positions_computed": 13564}}, model="13b")
    assert rec13["metric"] == "llava13b_dpo_score_tokens_per_sec"
    assert rec13["mfu_ceiling_tflops"] == 167.0


def test_annotate_is_per_emission_idempotent():
    """Each emitted line must be complete on its own — annotating a
    record twice (as successive cumulative emissions do) cannot differ
    from annotating it once."""
    bench = _load_bench()
    rec = {"config": "w8a8_b1",
           "hot_loops": {"sft_step": {"seq_per_sec_chip": 2.0}}}
    once = bench._annotate(dict(rec))
    twice = bench._annotate(dict(once))
    assert once == twice


def test_annotate_picks_latest_quality_artifact(tmp_path, monkeypatch):
    bench = _load_bench()
    # _annotate globs QUALITY_r*.json next to bench.py; point it at a
    # temp dir with two artifacts and check the LATEST round wins.
    fake_bench = tmp_path / "bench.py"
    fake_bench.write_text("")
    (tmp_path / "QUALITY_r03.json").write_text(json.dumps(
        {"scoring": {"w8a8": {"logprob_mae": 0.9}}}))
    (tmp_path / "QUALITY_r04.json").write_text(json.dumps(
        {"scoring": {"w8a8": {"logprob_mae": 0.0038,
                              "lora_grad_cosine_vs_bf16": 0.999993}}}))
    monkeypatch.setattr(bench.os.path, "abspath",
                        lambda p: str(fake_bench))
    out = bench._annotate({"config": "w8a8_b1_seq2048"})
    assert out["quality_vs_bf16"]["logprob_mae"] == 0.0038
    assert out["quality_vs_bf16"]["artifact"] == "QUALITY_r04.json"
    # A NEWER artifact without a scoring section (decode-only partials
    # like QUALITY_r04_decode.json) must not shadow the annotation.
    (tmp_path / "QUALITY_r04_decode.json").write_text(json.dumps(
        {"decode": {"kv8_first_step_logit_mae": 0.032}}))
    out = bench._annotate({"config": "w8a8_b1_seq2048"})
    assert out["quality_vs_bf16"]["artifact"] == "QUALITY_r04.json"


def test_budget_exhaustion_emits_marked_skips(monkeypatch, capsys):
    """Drive main()'s hot-loop section with a tiny budget: every loop
    after exhaustion must land as {"skipped": "budget"} and a cumulative
    line must be printed after EVERY loop (the BENCH_r03 failure was one
    print at the very end)."""
    bench = _load_bench()
    monkeypatch.setattr(bench, "_probe_device", lambda *a, **k: True)
    monkeypatch.setattr(bench, "bench_dpo_scoring",
                        lambda on_update=None: {
                            "metric": "llava7b_dpo_score_tokens_per_sec",
                            "value": 18102.0, "unit": "tokens/s",
                            "vs_baseline": 1.65, "config": "w8a8_b1"})
    calls = []

    def fake_subprocess(name, timeout_s):
        calls.append(name)
        return {"tokens_per_sec": 1.0}

    monkeypatch.setattr(bench, "_run_hot_loop_subprocess", fake_subprocess)
    # Budget already exhausted when the hot loops start: scoring emits,
    # then all five loops must be skipped-with-marker, never attempted.
    monkeypatch.setattr(sys, "argv", ["bench.py", "--budget-s", "0"])
    bench.main()
    lines = [json.loads(l) for l in capsys.readouterr().out.splitlines()
             if l.strip().startswith("{")]
    # >= 6 emissions: headline + one cumulative line per hot loop.
    assert len(lines) >= 6
    assert calls == []
    final = lines[-1]
    assert final["value"] == 18102.0
    assert all(v == {"skipped": "budget"}
               for v in final["hot_loops"].values())
    # Every intermediate line is a parseable, headline-bearing record.
    assert all(l.get("metric") == "llava7b_dpo_score_tokens_per_sec"
               for l in lines)


def test_generous_budget_runs_all_loops_and_writes_last_good(
        monkeypatch, capsys, tmp_path):
    bench = _load_bench()
    monkeypatch.setattr(bench, "_probe_device", lambda *a, **k: True)
    monkeypatch.setattr(bench, "bench_dpo_scoring",
                        lambda on_update=None: {
                            "metric": "llava7b_dpo_score_tokens_per_sec",
                            "value": 18102.0, "unit": "tokens/s",
                            "vs_baseline": 1.65, "config": "w8a8_b1"})
    monkeypatch.setattr(bench, "_run_hot_loop_subprocess",
                        lambda name, t: {"tokens_per_sec": 7.0})
    fake_bench = tmp_path / "bench.py"
    fake_bench.write_text("")
    monkeypatch.setattr(bench.os.path, "abspath",
                        lambda p: str(fake_bench))
    monkeypatch.setattr(sys, "argv", ["bench.py", "--budget-s", "100000"])
    bench.main()
    lines = [json.loads(l) for l in capsys.readouterr().out.splitlines()
             if l.strip().startswith("{")]
    final = lines[-1]
    assert set(final["hot_loops"]) == set(bench._HOT_LOOPS)
    assert all(v == {"tokens_per_sec": 7.0}
               for v in final["hot_loops"].values())
    # Fully-good run -> last-good record written atomically next to
    # bench.py (the wedged-device diagnostic path serves it back).
    with open(tmp_path / "bench_last_good.json") as f:
        saved = json.load(f)
    assert saved["result"]["value"] == 18102.0


def test_capability_skip_does_not_block_last_good(
        monkeypatch, capsys, tmp_path):
    """A deliberate capability skip (bf16 7B SFT does not compile on this
    chip — the documented permanent outcome) must not stop the last-good
    snapshot from refreshing; budget skips and failures must."""
    bench = _load_bench()
    monkeypatch.setattr(bench, "_probe_device", lambda *a, **k: True)
    monkeypatch.setattr(bench, "bench_dpo_scoring",
                        lambda on_update=None: {
                            "metric": "llava7b_dpo_score_tokens_per_sec",
                            "value": 1.0, "unit": "tokens/s",
                            "vs_baseline": 1.0, "config": "w8a8_b1"})
    results = {"sft_step_bf16": {
        "skipped": "bf16 b1 does not compile on 16 GB: ..."}}
    monkeypatch.setattr(bench, "_run_hot_loop_subprocess",
                        lambda name, t: results.get(
                            name, {"tokens_per_sec": 7.0}))
    fake_bench = tmp_path / "bench.py"
    fake_bench.write_text("")
    monkeypatch.setattr(bench.os.path, "abspath",
                        lambda p: str(fake_bench))
    monkeypatch.setattr(sys, "argv", ["bench.py", "--budget-s", "100000"])
    bench.main()
    capsys.readouterr()
    assert (tmp_path / "bench_last_good.json").exists()

    # an execution FAILURE in the same loop does block the snapshot
    results["sft_step_bf16"] = {
        "skipped": "bf16 b1 failed at execution: RESOURCE_EXHAUSTED"}
    (tmp_path / "bench_last_good.json").unlink()
    bench.main()
    capsys.readouterr()
    assert not (tmp_path / "bench_last_good.json").exists()


def test_malformed_quality_artifact_cannot_crash_emit(
        tmp_path, monkeypatch):
    """A QUALITY_r*.json with a non-dict top level (or garbage scoring
    entry) must be skipped, never crash the emission path — an unprinted
    JSON line is the BENCH_r03 failure mode."""
    bench = _load_bench()
    fake_bench = tmp_path / "bench.py"
    fake_bench.write_text("")
    (tmp_path / "QUALITY_r03.json").write_text(json.dumps(
        {"scoring": {"w8a8": {"logprob_mae": 0.0038}}}))
    (tmp_path / "QUALITY_r09.json").write_text(json.dumps([1, 2, 3]))
    monkeypatch.setattr(bench.os.path, "abspath",
                        lambda p: str(fake_bench))
    out = bench._annotate({"config": "w8a8_b1"})
    assert out["quality_vs_bf16"]["artifact"] == "QUALITY_r03.json"


def test_hot_loop_order_prioritizes_13b_over_serving():
    """Under budget pressure the first loops to survive must be the
    first-class 13B BASELINE #5 evidence (VERDICT r4 ask 1); serving has
    standalone A/B artifacts and bf16-SFT is a documented permanent
    skip, so both run last."""
    bench = _load_bench()
    order = bench._HOT_LOOP_ORDER
    assert set(order) == set(bench._HOT_LOOPS)
    assert len(order) == len(bench._HOT_LOOPS)
    serving = order.index("serving_continuous")
    for name in ("scoring_13b", "rollout_decode_13b", "dpo_step_13b"):
        assert order.index(name) < serving
    assert order.index("sft_step_bf16") == len(order) - 1
