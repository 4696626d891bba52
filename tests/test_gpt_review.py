"""GPT-4 pairwise review extras (reference eval_gpt_review[_bench].py)."""

import json

import pytest

from opadpo_tpu.eval.gpt_review import (
    build_review_content, pick_rule, run_reviews,
)
from opadpo_tpu.eval.llava_bench import parse_scores


RULES = {
    "default": {"role": "Assistant", "prompt": "Rate both answers 1-10."},
    "conv": {"role": "Assistant", "prompt": "Judge the conversation."},
    "llava_bench_detail": {"role": "Assistant",
                           "prompt": "Judge detail vs the captions."},
}


class FakeApi:
    def __init__(self, reply="7 9\n\nSecond answer is better."):
        self.reply = reply
        self.calls = []

    def call_llm_with_messages(self, messages, **kw):
        self.calls.append(messages)
        return self.reply


def _rows(n, category=None, image=None):
    qs, a1, a2 = [], [], []
    for i in range(n):
        q = {"question_id": i, "text": f"What is in image {i}?"}
        if category:
            q["category"] = category
        if image:
            q["image"] = f"{image}{i}.jpg"
        qs.append(q)
        a1.append({"question_id": i, "answer_id": f"a1-{i}",
                   "text": f"Ref answer {i}"})
        a2.append({"question_id": i, "answer_id": f"a2-{i}",
                   "text": f"Model answer {i}"})
    return qs, a1, a2


def test_rule_fallback_and_bench_assert():
    assert pick_rule(RULES, "conv") == RULES["conv"]
    assert pick_rule(RULES, "unknown") == RULES["default"]
    assert pick_rule(RULES, "detail", bench_mode=True) \
        == RULES["llava_bench_detail"]
    with pytest.raises(KeyError):
        pick_rule(RULES, "unknown", bench_mode=True)


def test_plain_review_run(tmp_path):
    qs, a1, a2 = _rows(3, category="conv")
    api = FakeApi()
    out = str(tmp_path / "reviews.jsonl")
    reviews = run_reviews(qs, a1, a2, RULES, api, out)
    assert len(reviews) == 3
    assert all(r["tuple"] == [7.0, 9.0] for r in reviews)
    assert reviews[0]["category"] == "conv"
    # both answers and the rule prompt reached the judge
    content = api.calls[0][1]["content"]
    assert "Ref answer 0" in content and "Model answer 0" in content
    assert RULES["conv"]["prompt"] in content
    # file round-trips
    lines = [json.loads(l) for l in open(out)]
    assert [l["question_id"] for l in lines] == [0, 1, 2]


def test_bench_mode_context_and_resume(tmp_path):
    qs, a1, a2 = _rows(4, category="detail", image="img")
    contexts = {f"img{i}.jpg": {"caption": [f"cap {i} line1", "line2"]}
                for i in range(4)}
    out = str(tmp_path / "reviews.jsonl")

    # first run reviews only 2 (simulate interruption by truncating inputs)
    api = FakeApi()
    run_reviews(qs[:2], a1[:2], a2[:2], RULES, api, out,
                contexts=contexts, bench_mode=True)
    assert len(api.calls) == 2
    assert "cap 0 line1" in api.calls[0][1]["content"]

    # resumed full run skips the first 2
    api2 = FakeApi(reply="3 4\nok")
    reviews = run_reviews(qs, a1, a2, RULES, api2, out,
                          contexts=contexts, bench_mode=True)
    assert len(api2.calls) == 2          # only the missing ones
    assert len(reviews) == 4
    assert reviews[0]["tuple"] == [7.0, 9.0]
    assert reviews[-1]["tuple"] == [3.0, 4.0]
    assert reviews[-1]["category"] == "llava_bench_detail"


def test_malformed_score_parses_to_minus_one():
    assert parse_scores("great answers!") == (-1.0, -1.0)
    assert parse_scores("8, 6\nexplanation") == (8.0, 6.0)


def test_content_layout_contract():
    c = build_review_content("Q?", "A1", "A2", RULES["default"],
                             context="some captions")
    # structural markers the rule prompts reference, in order
    for marker in ("[Context]", "[Question]", "[Assistant 1]",
                   "[End of Assistant 1]", "[Assistant 2]", "[System]"):
        assert marker in c
    assert c.index("[Context]") < c.index("[Question]") \
        < c.index("[Assistant 1]") < c.index("[System]")
