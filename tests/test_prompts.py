"""GPT-4V correction-prompt payload tests.

The reference sends three text inputs per correction call — query,
generated_response, and the GT ``standard_response`` ("approximate ideal
answer", ``input_format_coco_4V`` + ``online_generator.py:158``).  Round 1
dropped the third; these tests pin all three into the message payload.
"""

import json

from opadpo_tpu.pipeline.prompts import (
    CORRECTION_SYSTEM_PROMPT, build_correction_messages,
)


def _flatten_text(messages):
    parts = []
    for m in messages:
        c = m["content"]
        if isinstance(c, str):
            parts.append(c)
        else:
            parts.extend(p["text"] for p in c if p.get("type") == "text")
    return "\n".join(parts)


def test_messages_carry_all_three_inputs():
    msgs = build_correction_messages(
        question="What is on the table?",
        response="A red apple sits on the table.",
        image_b64="QUJD",
        standard_response="There is a green pear on the table.")
    text = _flatten_text(msgs)
    assert "What is on the table?" in text
    assert "A red apple sits on the table." in text
    assert "There is a green pear on the table." in text
    # image rides along as an inline data URL
    urls = [p["image_url"]["url"] for m in msgs
            if isinstance(m["content"], list) for p in m["content"]
            if p.get("type") == "image_url"]
    assert urls == ["data:image/jpeg;base64,QUJD"]


def test_system_prompt_mentions_reference_answer_role():
    # the system prompt must explain the approximate-ideal-answer input so
    # the judge actually uses it (reference PROMPT_LONG_coco_4V leans on it)
    assert "reference answer" in CORRECTION_SYSTEM_PROMPT.lower()


def test_correct_one_passes_standard_response():
    from opadpo_tpu.pipeline import online_generation

    captured = {}

    class FakeApi:
        def call_llm_with_messages(self, messages):
            captured["messages"] = messages
            return json.dumps({
                "sentence_1": {"copied_content": "A cat.", "score": 2,
                               "error_type": "image_recognition_error",
                               "object": ["cat -> dog"],
                               "rewritten_content": "A dog.",
                               "reason": "it is a dog"},
                "Added": {"rewritten_content": "", "reason": ""},
            })

    out = online_generation.correct_one(
        FakeApi(), "What animal?", "A cat.", "QUJD",
        standard_response="A brown dog.")
    assert out["success"]
    assert out["AI_pseudo"] == "A dog."
    assert "A brown dog." in _flatten_text(captured["messages"])
