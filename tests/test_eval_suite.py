"""Eval-suite scorer tests (rule-based parts are deterministic — they are
the regression harness the reference relies on, SURVEY §4)."""

import json

import numpy as np

from opadpo_tpu.eval.amber import evaluate_amber, extract_nouns
from opadpo_tpu.eval.llava_bench import parse_scores, summarize as lb_summarize
from opadpo_tpu.eval.mmhal import parse_rating, summarize as mmhal_summarize
from opadpo_tpu.eval.object_hal import evaluate_chair, extract_coco_objects
from opadpo_tpu.eval.pope import evaluate_pope, parse_answer_to_label


def test_pope_parsing():
    assert parse_answer_to_label("Yes, there is a dog.") == 1
    assert parse_answer_to_label("No.") == 0
    assert parse_answer_to_label("There is not a cat, I think.") == 0
    assert parse_answer_to_label("no way") == 0
    assert parse_answer_to_label("Absolutely") == 1


def test_pope_metrics():
    answers = [{"text": t} for t in
               ("Yes.", "No.", "Yes.", "No.", "Yes it is.", "not really")]
    labels = ["yes", "no", "no", "yes", "yes", "no"]
    m = evaluate_pope(answers, labels)
    # preds: 1,0,1,0,1,0 ; gold: 1,0,0,1,1,0 → TP=2 FP=1 TN=2 FN=1
    assert (m["tp"], m["fp"], m["tn"], m["fn"]) == (2, 1, 2, 1)
    assert abs(m["f1"] - 2 * (2 / 3) * (2 / 3) / (4 / 3)) < 1e-9
    assert abs(m["yes_ratio"] - 0.5) < 1e-9


def test_coco_object_extraction():
    objs = extract_coco_objects(
        "A man riding a motorbike past a fire hydrant while two dogs watch "
        "near some hot dogs.")
    assert "person" in objs
    assert "motorcycle" in objs
    assert "fire hydrant" in objs
    assert "dog" in objs
    assert "hot dog" in objs
    # "hot dogs" must not ALSO count as plain dog twice
    assert objs.count("dog") == 1


def test_chair_metrics():
    responses = [
        {"image_id": 1, "text": "A dog and a cat on a couch."},
        {"image_id": 2, "text": "A man holding an umbrella."},
    ]
    gt = {1: ["dog", "couch"], 2: ["person", "umbrella"]}
    m = evaluate_chair(responses, gt)
    # resp1 hallucinates cat; resp2 clean
    assert m["CHAIRs"] == 50.0
    assert m["CHAIRi"] == 20.0          # 1 of 5 instances
    assert m["object_recall"] == 100.0
    assert m["num_responses"] == 2


def test_mmhal_rating_parse_and_summary():
    assert parse_rating("blah blah\nRating: 5") == 5
    assert parse_rating("no rating here") == -1
    records = [{"gpt4_review": f"Rating: {s}",
                "question_type": "attribute" if i % 2 == 0 else "counting"}
               for i, s in enumerate([6, 2, 4, 1])]
    out = mmhal_summarize(records)
    assert out["average_score"] == round((6 + 2 + 4 + 1) / 4, 3)
    assert out["hallucination_rate"] == 0.5
    assert out["average_score_per_type"]["attribute"] == 5.0


def test_llava_bench_scores():
    assert parse_scores("8 7\n\nGood answers") == (8.0, 7.0)
    assert parse_scores("garbage") == (-1.0, -1.0)
    reviews = [{"tuple": [8.0, 6.0]}, {"tuple": [10.0, 9.0]},
               {"tuple": [-1.0, -1.0]}]
    out = lb_summarize(reviews)
    assert out["num_reviews"] == 2
    assert out["relative_score"] == round((7.5 / 9.0) * 100, 1)


def _amber_fixture():
    association = {
        "dog": ["puppy", "canine"],
        "cat": ["kitten", "feline"],
        "tree": ["plant"],
    }
    annotations = [
        {"type": "generative", "truth": ["dog"], "hallu": ["cat"]},
        {"type": "discriminative-hallucination", "truth": "yes"},
        {"type": "discriminative-hallucination", "truth": "no"},
    ]
    return association, annotations


def test_amber_generative_and_discriminative():
    association, annotations = _amber_fixture()
    inference = [
        {"id": 1, "response": "A dog next to a cat under a tree."},
        {"id": 2, "response": "Yes"},
        {"id": 3, "response": "No"},
    ]
    out = evaluate_amber(inference, annotations, association,
                         safe_words=[])
    # nouns: dog (truth, covered), cat (hallu, cog), tree (not in truth or
    # hallu → CHAIR hit)
    assert out["Cover"] == 100.0
    assert out["Cog"] == 100.0
    assert out["CHAIR"] > 0
    assert out["Hal"] == 100.0
    assert out["d_Accuracy"] == 100.0
    assert out["repeat_ratio"] == 0.0


def test_amber_noun_extraction_fallback():
    vocab = {"dog", "cat", "tree"}
    nouns = extract_nouns("Two dogs chase the cats around trees.", vocab)
    assert set(nouns) >= {"dog", "cat", "tree"}


def test_science_prompt_and_scoring(tmp_path):
    from opadpo_tpu.eval.model_vqa_science import (
        build_science_prompt, parse_answer_letter, score_science,
    )
    item = {"question": "What is H2O?", "hint": "Think chemistry.",
            "choices": ["water", "salt"], "answer": 0}
    prompt = build_science_prompt(item)
    assert "Context: Think chemistry." in prompt
    assert "(A) water" in prompt and "(B) salt" in prompt
    assert parse_answer_letter("The answer is B.") == "B"
    assert parse_answer_letter("A") == "A"
    assert parse_answer_letter("no letter here") == ""

    questions = [{"question_id": 1, "answer_idx": 0},
                 {"question_id": 2, "answer_idx": 1}]
    af = tmp_path / "ans.jsonl"
    af.write_text('{"question_id": 1, "text": "A"}\n'
                  '{"question_id": 2, "text": "A"}\n')
    out = score_science(str(af), questions)
    assert out == {"accuracy": 50.0, "num_questions": 2}


def test_text_qa_sampler_tiny():
    import jax
    import jax.numpy as jnp
    from opadpo_tpu.engine.sampling import SamplingConfig
    from opadpo_tpu.eval.model_qa import TextSampler
    from opadpo_tpu.models import llava as llava_model
    from opadpo_tpu.models.llava import LlavaConfig

    cfg = LlavaConfig.tiny()
    params = llava_model.init_params(jax.random.PRNGKey(0), cfg)
    sampler = TextSampler(cfg.llama, SamplingConfig(
        greedy=True, max_new_tokens=4, eos_token_id=-1))
    ids = jnp.ones((2, 8), jnp.int32) * 7
    mask = jnp.ones((2, 8), jnp.int32)
    out = sampler.generate(params, ids, mask, jax.random.PRNGKey(0))
    assert out.shape == (2, 4)
    assert (np.asarray(out) >= 0).all()
