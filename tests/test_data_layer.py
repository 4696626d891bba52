"""Data layer tests: templating, image-token tokenization, CLIP preprocess
parity vs HF, DPO collator report alignment."""

import json

import numpy as np
import pytest
from PIL import Image

from opadpo_tpu.constants import IGNORE_INDEX, IMAGE_TOKEN_INDEX
from opadpo_tpu.data.collators import (
    DPOCollator, SCORE_MAPPING, complete_copied_content,
)
from opadpo_tpu.data.conversation import conv_vicuna_v1
from opadpo_tpu.data.image_processing import clip_preprocess, expand2square
from opadpo_tpu.data.tokenization import preprocess_v1, tokenizer_image_token
from tests.fake_tokenizer import FakeTokenizer

TOK = FakeTokenizer()


def test_vicuna_template_rendering():
    conv = conv_vicuna_v1.copy()
    conv.append_message("USER", "hello <image>")
    conv.append_message("ASSISTANT", "hi there")
    prompt = conv.get_prompt()
    assert prompt.startswith("A chat between a curious user")
    assert "USER: hello <image> ASSISTANT: hi there</s>" in prompt

    conv2 = conv_vicuna_v1.copy()
    conv2.append_message("USER", "q")
    conv2.append_message("ASSISTANT", None)
    assert conv2.get_prompt().endswith("USER: q ASSISTANT:")


def test_tokenizer_image_token():
    ids = tokenizer_image_token("ab<image>cd", TOK)
    # bos + 'ab' + IMG + 'cd'
    exp = [TOK.bos_token_id] + TOK._encode_one("ab", False) + \
        [IMAGE_TOKEN_INDEX] + TOK._encode_one("cd", False)
    assert ids == exp
    # no image
    assert tokenizer_image_token("ab", TOK) == TOK._encode_one("ab")
    # two images
    ids2 = tokenizer_image_token("a<image>b<image>c", TOK)
    assert ids2.count(IMAGE_TOKEN_INDEX) == 2


def test_preprocess_v1_masks_instruction():
    source = [
        {"from": "human", "value": "<image>\nwhat?"},
        {"from": "gpt", "value": "cat"},
    ]
    out = preprocess_v1([source], TOK, has_image=True)
    ids, labels = out["input_ids"][0], out["labels"][0]
    assert IMAGE_TOKEN_INDEX in ids
    # response tokens are supervised, instruction masked
    n_masked = (labels == IGNORE_INDEX).sum()
    assert 0 < n_masked < len(labels)
    sup = labels[labels != IGNORE_INDEX]
    resp_ids = TOK._encode_one("cat", add_bos=False)
    # supervised tail must contain the response chars
    assert set(resp_ids) <= set(sup.tolist())
    assert out["validity"] == [True]


def test_llama_2_template_rendering():
    from opadpo_tpu.data.conversation import conv_llava_llama_2
    conv = conv_llava_llama_2.copy()
    conv.append_message("USER", "q1")
    conv.append_message("ASSISTANT", "a1")
    conv.append_message("USER", "q2")
    conv.append_message("ASSISTANT", "a2")
    prompt = conv.get_prompt()
    # first round carries the <<SYS>> block inside the first [INST]
    assert prompt.startswith("[INST] <<SYS>>\n")
    assert "<</SYS>>\n\nq1 [/INST] a1 </s>" in prompt
    # later rounds: <s>[INST] q [/INST] a </s>
    assert "</s><s>[INST] q2 [/INST] a2 </s>" in prompt


def test_preprocess_llama_2_masks_instruction():
    from opadpo_tpu.data.tokenization import preprocess_llama_2
    source = [
        {"from": "human", "value": "<image>\nwhat is shown?"},
        {"from": "gpt", "value": "cat"},
        {"from": "human", "value": "sure?"},
        {"from": "gpt", "value": "yes"},
    ]
    out = preprocess_llama_2([source], TOK, has_image=True)
    ids, labels = out["input_ids"][0], out["labels"][0]
    assert IMAGE_TOKEN_INDEX in ids
    n_masked = (labels == IGNORE_INDEX).sum()
    assert 0 < n_masked < len(labels)
    sup = labels[labels != IGNORE_INDEX]
    # both rounds' responses supervised, both instructions masked
    for resp in ("cat", "yes"):
        resp_ids = TOK._encode_one(resp, add_bos=False)
        assert set(resp_ids) <= set(sup.tolist()), resp
    # instruction body must be masked: '[INST]' chars never supervised
    instr_ids = set(TOK._encode_one("[INST", add_bos=False))
    assert not (instr_ids & set(sup.tolist()))
    assert out["validity"] == [True]


def test_preprocess_dispatches_on_default_conversation():
    from opadpo_tpu.data import conversation as conversation_lib
    from opadpo_tpu.data.tokenization import preprocess
    source = [
        {"from": "human", "value": "q"},
        {"from": "gpt", "value": "a"},
    ]
    out_v1 = preprocess([source], TOK)
    saved = conversation_lib.default_conversation
    conversation_lib.default_conversation = conversation_lib.conv_llava_llama_2
    try:
        out_l2 = preprocess([source], TOK)
    finally:
        conversation_lib.default_conversation = saved
    # the two templates tokenize differently (different system prompts)
    assert out_v1["input_ids"].shape != out_l2["input_ids"].shape \
        or (out_v1["input_ids"] != out_l2["input_ids"]).any()
    assert out_l2["validity"] == [True]


def test_preprocess_llama_2_validity_limits():
    from opadpo_tpu.data.tokenization import preprocess_llama_2
    source = [
        {"from": "human", "value": "a long question " * 8},
        {"from": "gpt", "value": "short"},
    ]
    ok = preprocess_llama_2([source], TOK, query_len=2048, response_len=2048)
    assert ok["validity"] == [True]
    # response_len below the final round length → invalid, still tokenized
    bad = preprocess_llama_2([source], TOK, response_len=4)
    assert bad["validity"] == [False]
    assert bad["input_ids"].shape == ok["input_ids"].shape


def test_clip_preprocess_matches_hf():
    from transformers import CLIPImageProcessor
    from opadpo_tpu.ops.image_ops import CLIP_MEAN, CLIP_STD
    hf = CLIPImageProcessor(
        do_resize=True, size={"shortest_edge": 336}, resample=3,
        do_center_crop=True, crop_size={"height": 336, "width": 336},
        do_rescale=True, do_normalize=True,
        image_mean=list(CLIP_MEAN), image_std=list(CLIP_STD))
    rng = np.random.default_rng(0)
    img = Image.fromarray(rng.integers(0, 255, (200, 320, 3), np.uint8))
    bg = tuple(int(x * 255) for x in CLIP_MEAN)
    squared = expand2square(img, bg)
    ref = hf.preprocess(squared, return_tensors="np")["pixel_values"][0]
    ref = np.transpose(ref, (1, 2, 0))          # CHW → HWC
    ours = clip_preprocess(img, pad_to_square=True)
    np.testing.assert_allclose(ours, ref, atol=1e-5, rtol=1e-5)


def test_complete_copied_content():
    orig = "The cat sat. The dog ran. End."
    frags = ["The cat sat.", "The dog ran."]
    fixed = complete_copied_content(orig, frags)
    assert fixed[0] == "The cat sat."
    # remainder attaches to last fragment (stripped, reference :71-73)
    assert fixed[1] == "The dog ran.End."
    # failed match → passthrough
    assert complete_copied_content("xyz", ["abc"]) == ["abc"]


def _report(orig_sentences, scores, error_types, rewritten):
    rep = {}
    for i, (c, s, e, r) in enumerate(
            zip(orig_sentences, scores, error_types, rewritten)):
        rep[f"sentence_{i}"] = {
            "copied content": c, "score": s, "error type": e,
            "rewritten content": r,
        }
    return json.dumps(rep)


def _instance(report_json, orig):
    img = np.zeros((8, 8, 3), np.float32)
    return {
        "queries": "what 图 now",
        "images": img,
        "standard_response": "gt answer",
        "original_generate_response": orig,
        "AI_pseudo_response": "rewritten full",
        "AI_json_report": report_json,
    }


def test_dpo_collator_detailed_report():
    orig = "The cat sat. The dog flew."
    rep = _report(
        ["The cat sat.", "The dog flew."], [4, 1],
        ["correct", "image_recognition_error"],
        ["The cat sat.", "The dog ran."])
    coll = DPOCollator(tokenizer=FakeTokenizer(), query_len=16,
                       response_len=40, detailed_report=True)
    batch = coll([_instance(rep, orig)])

    orig_ids = batch["original_generate_response"][0]
    orig_sc = batch["original_generate_response_scores"][0]
    orig_rel = batch["original_generate_response_image_relations"][0]
    valid = orig_ids != 0
    n1 = len(FakeTokenizer()._encode_one("The cat sat.")) - 1 + 1  # bos kept on 1st
    # first sentence: score weight 1.0 (score 4), second: 2.5 (score 1)
    assert orig_sc[0] == SCORE_MAPPING[4]
    assert SCORE_MAPPING[1] in orig_sc[valid]
    # image relation: second sentence flagged image_recognition_error → 3.0
    assert 3.0 in orig_rel[valid]
    # EOS inserted into AI response & inherits previous weight
    ai_ids = batch["AI_pseudo_response"][0]
    ai_sc = batch["AI_pseudo_response_scores"][0]
    eos_pos = np.nonzero(ai_ids == FakeTokenizer.eos_token_id)[0]
    assert eos_pos.size == 1
    assert ai_sc[eos_pos[0]] != 0

    # query glyph remap: '图' char token → IMAGE_TOKEN_INDEX is only done for
    # the real tokenizer id 30861; fake tokenizer keeps chars, so just check
    # shapes here.
    assert batch["queries"].shape == (1, 16)


def test_dpo_collator_fallback_on_bad_report():
    coll = DPOCollator(tokenizer=FakeTokenizer(), query_len=16,
                       response_len=40, detailed_report=True)
    batch = coll([_instance("NOT JSON{{{", "some response")])
    # fallback: plain tokenization + zero scores
    assert (batch["AI_pseudo_response_scores"] == 0).all()
    assert batch["original_generate_response"].shape == (1, 40)
    # EOS added at first pad
    row = batch["original_generate_response"][0]
    pads = np.nonzero(row == 0)[0]
    eos = np.nonzero(row == FakeTokenizer.eos_token_id)[0]
    assert eos.size == 1 and (pads.size == 0 or eos[0] < pads[0])
