"""Metrics logger + step timer unit tests."""

import json

from opadpo_tpu.pipeline.runtime import StepTimer
from opadpo_tpu.utils.metrics import MetricsLogger, flatten_dict


def test_flatten_dict():
    out = flatten_dict({"loss": {"total": 1.0, "dpo": {"p1": 2.0}},
                        "lr": 3.0})
    assert out == {"loss/total": 1.0, "loss/dpo/p1": 2.0, "lr": 3.0}


def test_metrics_logger_jsonl(tmp_path):
    logger = MetricsLogger(str(tmp_path), report_to="jsonl")
    logger.log({"loss": {"total": 0.5}, "skipme": "not-a-number"}, step=1)
    logger.log({"loss": {"total": 0.25}}, step=2)
    logger.close()
    lines = [json.loads(l) for l in open(tmp_path / "train_log.jsonl")]
    assert len(lines) == 2
    assert lines[0]["step"] == 1 and lines[0]["loss/total"] == 0.5
    assert "skipme" not in lines[0]
    assert "wall_s" in lines[1]


def test_step_timer_summary():
    t = StepTimer()
    t.record("rollout", 1.0, tokens=10)
    t.record("rollout", 3.0)
    t.record("train", 2.0)
    s = t.summary()
    assert s["rollout"]["mean_s"] == 2.0
    assert s["rollout"]["count"] == 2
    assert s["train"]["count"] == 1
