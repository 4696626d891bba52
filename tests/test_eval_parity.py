"""Reference-vs-port differential tests for the eval scorers.

VERDICT r3 item 3: feed identical synthetic answer files through the
reference implementation and the ported scorer and assert identical
metrics.

- POPE: the reference script (``summarize_eval_pope.py``) is pure
  stdlib — it runs as a subprocess on the same files and its printed
  summary line is diffed against ``evaluate_pope`` exactly.
- AMBER: the reference script needs spaCy/nltk models that are not in
  this image, so its counting algorithm (``AMBER_eval.py:93-272``) is
  vendored below with the noun extraction and similarity check
  injectable; both sides then run with the SAME extraction/similarity so
  the counting logic is the test subject.  Uses the REAL AMBER data
  files (relation.json / safe_words.txt / annotations.json).
- CHAIR: the reference counting loop (``eval_gpt_obj_halbench.py:
  475-565``) is vendored with the reference's real synonyms_refine.txt;
  the port runs with the same table loaded via ``load_synonym_file``.
- The bundled AMBER similarity table is pinned on representative
  accept/reject pairs.
"""

import json
import re
import subprocess
import sys

import pytest

REF = "/root/reference/eval_llava_rlhf_coco"

pytestmark = pytest.mark.skipif(
    not __import__("os").path.isdir(REF),
    reason="reference checkout not available")


# ---------------------------------------------------------------- POPE

POPE_TEXTS = [
    "Yes, there is a dog in the image.",
    "No, I cannot see one.",
    "There is not a cat here, only a sofa.",
    "Absolutely. The picture shows a red bus, no doubt about it.",
    "no",
    "Yes",
    "It does not appear so. But maybe yes.",
    "The answer is No, there is nothing like that.",
    "I think so, yes it is there.",
    "Nothing of the sort",
]
POPE_LABELS = ["yes", "no", "no", "yes", "no",
               "yes", "yes", "no", "yes", "no"]


def test_pope_parity_vs_reference_script(tmp_path):
    answers = tmp_path / "answers.jsonl"
    labels = tmp_path / "labels.jsonl"
    with open(answers, "w") as f:
        for i, t in enumerate(POPE_TEXTS):
            f.write(json.dumps({"question_id": i, "text": t}) + "\n")
    with open(labels, "w") as f:
        for lab in POPE_LABELS:
            f.write(json.dumps({"label": lab}) + "\n")

    proc = subprocess.run(
        [sys.executable, f"{REF}/summarize_eval_pope.py",
         "--answers-file", str(answers), "--label-file", str(labels)],
        capture_output=True, text=True, timeout=120)
    assert proc.returncode == 0, proc.stderr
    # last line: "f1, acc, precision, recall, yes_ratio" at 3 decimals
    ref_line = proc.stdout.strip().splitlines()[-1]
    ref_vals = [float(x) for x in ref_line.split(",")]

    from opadpo_tpu.eval.pope import evaluate_pope_files
    m = evaluate_pope_files(str(answers), str(labels))
    port_vals = [round(m[k], 3) for k in
                 ("f1", "accuracy", "precision", "recall", "yes_ratio")]
    assert port_vals == ref_vals, (port_vals, ref_vals)

    # TP/FP/TN/FN row too
    counts = re.search(r"^(\d+)\t(\d+)\t(\d+)\t(\d+)", proc.stdout,
                       re.MULTILINE)
    assert [int(g) for g in counts.groups()] == [
        m["tp"], m["fp"], m["tn"], m["fn"]]


# --------------------------------------------------------------- AMBER

def _reference_amber(inference_data, ground_truth, association,
                     global_safe_words, extract_nouns, check_synonyms):
    """Vendored reference counting algorithm (AMBER_eval.py:93-272),
    with noun extraction + similarity injected.  Returns the raw metric
    counters the reference accumulates."""
    hallucination_words = []
    for w1 in association.keys():
        hallucination_words.append(w1)
        for w2 in association[w1]:
            hallucination_words.append(w2)

    m = {k: 0 for k in [
        "chair_score", "chair_num", "safe_cover_score", "safe_cover_num",
        "hallu_cover_score", "hallu_cover_num", "non_hallu_score",
        "non_hallu_num"]}
    for g in ("", "as_", "an_", "aa_", "ha_", "asso_"):
        for s in ("qa_correct", "qa_no", "qa_ans_no"):
            m[f"{g}{s}_score"] = 0
            m[f"{g}{s}_num"] = 0

    def grp(t):
        return {"discriminative-attribute-state": "as_",
                "discriminative-attribute-number": "an_",
                "discriminative-attribute-action": "aa_",
                "discriminative-hallucination": "ha_"}.get(t, "asso_")

    for row in inference_data:
        gid = row["id"]
        gt = ground_truth[gid - 1]
        if gt["type"] == "generative":
            nouns = extract_nouns(row["response"])
            after = [n for n in nouns if n in hallucination_words]

            safe_words, safe_list = [], []
            for idx, word in enumerate(gt["truth"]):
                safe_words += association[word]
                safe_list += [idx] * len(association[word])
            ha_words, ha_list = [], []
            for idx, word in enumerate(gt["hallu"]):
                ha_words += association[word]
                ha_list += [idx] * len(association[word])

            safe_words += gt["truth"]
            safe_len = len(gt["truth"])
            safe_list += [0] * safe_len
            flags = [0] * len(after)
            ha_words += gt["hallu"]
            ha_len = len(gt["hallu"])
            ha_list += [0] * ha_len

            for idx, noun in enumerate(after):
                if noun in global_safe_words:
                    continue
                if noun in safe_words:
                    for j in range(len(safe_words)):
                        if noun == safe_words[j]:
                            if j < (len(safe_list) - safe_len):
                                safe_list[safe_list[j] + len(safe_list)
                                          - safe_len] = 1
                            else:
                                safe_list[j] = 1
                            break
                    continue
                if noun in ha_words:
                    for j in range(len(ha_words)):
                        if noun == ha_words[j]:
                            if j < (len(ha_list) - ha_len):
                                ha_list[ha_list[j] + len(ha_list)
                                        - ha_len] = 1
                            else:
                                ha_list[j] = 1
                            break
                for j, check in enumerate(ha_words):
                    if check_synonyms(noun, check):
                        if j < (len(ha_list) - ha_len):
                            ha_list[ha_list[j] + len(ha_list) - ha_len] = 1
                        else:
                            ha_list[j] = 1
                        break
                flag = False
                for j, check in enumerate(safe_words):
                    if check_synonyms(noun, check):
                        flag = True
                        if j < (len(safe_list) - safe_len):
                            safe_list[safe_list[j] + len(safe_list)
                                      - safe_len] = 1
                        else:
                            safe_list[j] = 1
                        break
                if flag:
                    continue
                flags[idx] = 1

            m["chair_score"] += sum(flags)
            m["chair_num"] += len(flags)
            m["safe_cover_score"] += sum(safe_list[-safe_len:])
            m["safe_cover_num"] += len(safe_list[-safe_len:])
            m["hallu_cover_score"] += sum(ha_list[-ha_len:])
            m["hallu_cover_num"] += len(ha_list[-ha_len:])
            if sum(flags) == 0:
                m["non_hallu_score"] += 1
            m["non_hallu_num"] += 1
        else:
            g = grp(gt["type"])
            m["qa_correct_num"] += 1
            m[f"{g}qa_correct_num"] += 1
            truth, response = gt["truth"], row["response"]
            if truth == "yes":
                if response == "Yes":
                    m["qa_correct_score"] += 1
                    m[f"{g}qa_correct_score"] += 1
            else:
                m["qa_no_num"] += 1
                m[f"{g}qa_no_num"] += 1
                if response == "No":
                    m["qa_correct_score"] += 1
                    m["qa_no_score"] += 1
                    m[f"{g}qa_correct_score"] += 1
                    m[f"{g}qa_no_score"] += 1
            if response == "No":
                m["qa_ans_no_num"] += 1
                m[f"{g}qa_ans_no_num"] += 1
                if truth == "no":
                    m["qa_ans_no_score"] += 1
                    m[f"{g}qa_ans_no_score"] += 1
    return m


def _reference_amber_summary(m):
    """Reference final formulas (AMBER_eval.py:280-300)."""
    out = {}
    if m["chair_num"]:
        out["CHAIR"] = round(m["chair_score"] / m["chair_num"] * 100, 1)
        out["Cover"] = round(
            m["safe_cover_score"] / m["safe_cover_num"] * 100, 1)
        out["Hal"] = round(
            100 - m["non_hallu_score"] / m["non_hallu_num"] * 100, 1)
        out["Cog"] = round(
            m["hallu_cover_score"] / m["hallu_cover_num"] * 100, 1)
    if m["qa_correct_num"]:
        acc = round(m["qa_correct_score"] / m["qa_correct_num"] * 100, 1)
        prec = round(m["qa_ans_no_score"] / m["qa_ans_no_num"] * 100, 1)
        rec = round(m["qa_no_score"] / m["qa_no_num"] * 100, 1)
        f1 = round(2 * (prec / 100) * (rec / 100)
                   / ((prec / 100) + (rec / 100) + 0.0001) * 100, 1)
        out.update({"d_Accuracy": acc, "d_Precision": prec,
                    "d_Recall": rec, "d_F1": f1})
    return out


def _amber_fixtures():
    association = json.load(
        open(f"{REF}/AMBER_data/relation.json", encoding="utf-8"))
    safe_words = [l.rstrip("\n") for l in
                  open(f"{REF}/AMBER_data/safe_words.txt", encoding="utf-8")]
    annotations = json.load(
        open(f"{REF}/AMBER_data/annotations.json", encoding="utf-8"))
    return association, safe_words, annotations


def _amber_inference(annotations, association):
    """Synthetic responses over the real annotations: truth words,
    hallu words, association synonyms, bundled-similarity words, safe
    words, and both Yes/No discriminative answers."""
    import random
    rng = random.Random(7)
    rows = []
    gen = [a for a in annotations if a["type"] == "generative"][:40]
    disc = [a for a in annotations if a["type"] != "generative"][:60]
    for a in gen:
        gid = a["id"]
        parts = []
        if a["truth"]:
            parts.append(f"There is a {rng.choice(a['truth'])} here")
            syns = association.get(a["truth"][0], [])
            if syns:
                parts.append(f"next to a {rng.choice(syns)}")
        if a["hallu"]:
            parts.append(f"and a {rng.choice(a['hallu'])}")
        # a couch/sofa-style bundled-similarity pair plus a safe word
        parts.append("with a sofa, a couch, and some image of a scene")
        rows.append({"id": gid, "response": ", ".join(parts) + "."})
    for a in disc:
        rows.append({"id": a["id"],
                     "response": rng.choice(["Yes", "No", "maybe"])})
    return rows


@pytest.mark.parametrize("with_similarity", [False, True])
def test_amber_parity_vs_vendored_reference(with_similarity):
    from opadpo_tpu.eval import amber
    from opadpo_tpu.eval.amber_similarity import bundled_similarity

    association, safe_words, annotations = _amber_fixtures()
    rows = _amber_inference(annotations, association)

    vocab = set()
    for w, syns in association.items():
        vocab.add(w)
        vocab.update(syns)

    def extraction(text):
        return [n for n in amber.extract_nouns(text, vocab)]

    if with_similarity:
        threshold = 0.8
        check = lambda a, b: bundled_similarity(a, b) > 0.8  # noqa: E731
    else:
        threshold = 2.0      # nothing crosses it: pure exact-match path
        check = lambda a, b: False  # noqa: E731

    ref_m = _reference_amber(rows, annotations, association,
                             safe_words, extraction, check)
    expected = _reference_amber_summary(ref_m)

    got = amber.evaluate_amber(rows, annotations, association, safe_words,
                               similarity_score=threshold)
    for k, v in expected.items():
        assert got[k] == pytest.approx(v), (k, got[k], v)


def test_amber_similarity_changes_scores():
    """The bundled table must actually fire: scoring with it enabled
    differs from the exact-match-only path on responses that use
    bundled pairs (sofa for a couch annotation etc.)."""
    from opadpo_tpu.eval import amber
    association, safe_words, annotations = _amber_fixtures()
    rows = _amber_inference(annotations, association)
    with_sim = amber.evaluate_amber(rows, annotations, association,
                                    safe_words, similarity_score=0.8)
    without = amber.evaluate_amber(rows, annotations, association,
                                   safe_words, similarity_score=2.0)
    assert with_sim != without


# ----------------------------------------------- bundled similarity pins

def test_bundled_similarity_pinned_pairs():
    from opadpo_tpu.eval.amber_similarity import bundled_similarity as sim
    # accepts (en_core_web_lg scores these above 0.8)
    for a, b in [("couch", "sofa"), ("motorbike", "motorcycle"),
                 ("TV", "television"), ("boy", "girl"),
                 ("bike", "bicycle"), ("fridge", "refrigerator"),
                 ("dogs", "dog"), ("street", "road")]:
        assert sim(a, b) > 0.8, (a, b)
        assert sim(b, a) == sim(a, b)
    # rejects (documented near-misses and unrelated pairs)
    for a, b in [("cat", "dog"), ("rock", "stone"), ("watch", "clock"),
                 ("zebra", "pizza"), ("desk", "table"),
                 ("umbrella", "giraffe")]:
        assert sim(a, b) <= 0.8, (a, b)


def test_amber_check_synonyms_uses_bundled_table():
    from opadpo_tpu.eval.amber import check_synonyms_word
    assert check_synonyms_word("couch", "sofa")
    assert not check_synonyms_word("zebra", "pizza")
    # threshold interface honored
    assert not check_synonyms_word("couch", "sofa", similarity_score=0.99)


# --------------------------------------------------------------- CHAIR

def _reference_chair_counting(caps, imid_to_objects, extract):
    """Vendored reference counting loop (eval_gpt_obj_halbench.py:
    475-560) over per-caption canonical object lists."""
    num_caps = num_hallucinated = 0
    word_count = hallu_word_count = 0
    gt_word_count = coco_obj_cls_count = 0
    total_words = 0
    for cap in caps:
        objs = extract(cap["caption"])
        gts = imid_to_objects[cap["image_id"]]
        total_words += len(cap["caption"].split())
        gt_word_count += len(gts)
        word_count += len(objs)
        hallucinated = False
        kept = []
        for o in objs:
            if o not in gts:
                hallu_word_count += 1
                hallucinated = True
            else:
                kept.append(o)
        coco_obj_cls_count += len(set(kept))
        num_caps += 1
        if hallucinated:
            num_hallucinated += 1
    return {
        "CHAIRs": round(num_hallucinated / num_caps * 100, 1),
        "CHAIRi": round(hallu_word_count / word_count * 100, 1),
        "object_recall": round(coco_obj_cls_count / gt_word_count * 100, 1),
        "avg_length": round(total_words / num_caps, 1),
    }


def test_chair_parity_with_reference_synonym_table():
    from opadpo_tpu.eval.object_hal import (
        SynonymTables, evaluate_chair, extract_coco_objects,
        load_synonym_file,
    )
    tables = SynonymTables(load_synonym_file(
        f"{REF}/object_hal/synonyms_refine.txt"))

    caps = [
        {"image_id": 1, "caption":
         "A man rides his bike past a fire hydrant and two dogs."},
        {"image_id": 2, "caption":
         "There is a dining table with wine glasses and a bowl of "
         "oranges, next to a passenger jet photo."},
        {"image_id": 3, "caption":
         "the seat of the toilet is up; a baby elephant stands nearby"},
        {"image_id": 4, "caption": "An empty street at night."},
    ]
    gts = {1: ["person", "bicycle", "dog"],
           2: ["dining table", "bowl", "orange"],
           3: ["toilet"], 4: ["car"]}

    expected = _reference_chair_counting(
        caps, gts, lambda t: extract_coco_objects(t, tables))
    got = evaluate_chair(
        [{"image_id": c["image_id"], "text": c["caption"]} for c in caps],
        gts, tables=tables)
    for k, v in expected.items():
        assert got[k] == pytest.approx(v), (k, got[k], v)
    # and the reference table must ground reference-only synonyms
    assert "airplane" in extract_coco_objects("a passenger jet", tables)


# --------------------------------------------- GPT extraction (fake API)

class _FakeService:
    """Mimics APIService.call_llm_with_messages with canned replies and
    a call counter (for cache/retry assertions)."""

    def __init__(self, replies):
        self.replies = dict(replies)
        self.calls = []

    def call_llm_with_messages(self, messages, temperature=0.0,
                               max_tokens=2048, use_cache=True):
        prompt = messages[0]["content"]
        self.calls.append(prompt)
        for key, reply in self.replies.items():
            if key in prompt:
                if isinstance(reply, Exception):
                    raise reply
                return reply
        return "[]"


def test_gpt_extraction_mode():
    from opadpo_tpu.eval.object_hal import evaluate_chair, make_gpt_extractor

    svc = _FakeService({
        "a man and his dog": '["man", "dog", "red frisbee"]',
        "two cats on the couch": '```json\n["cat", "cat", "sofa"]\n```',
    })
    extract = make_gpt_extractor(svc)

    responses = [
        {"image_id": 1, "text": "The photo shows a man and his dog."},
        {"image_id": 2, "text": "I can see two cats on the couch today."},
        {"image_id": 3, "text": "Yes."},        # short answer: no API call
    ]
    gts = {1: ["person", "dog"], 2: ["cat"], 3: ["bed"]}
    m = evaluate_chair(responses, gts, extract_objects_fn=extract)
    # image 1: person+dog+frisbee -> frisbee hallucinated
    # image 2: cat (dedup) + couch -> couch hallucinated
    # image 3: no objects -> not hallucinated
    assert m["CHAIRs"] == pytest.approx(round(2 / 3 * 100, 1))
    assert m["CHAIRi"] == pytest.approx(round(2 / 5 * 100, 1))
    assert len(svc.calls) == 2          # short answer never hit the API

    # extraction prompt carries the question when the record has one
    svc2 = _FakeService({"What animals are shown?": '["dog"]'})
    extract2 = make_gpt_extractor(svc2)
    m2 = evaluate_chair(
        [{"image_id": 1, "text": "A dog is running through the park.",
          "question": "What animals are shown?"}],
        {1: ["dog"]}, extract_objects_fn=extract2)
    assert m2["CHAIRs"] == 0.0
    assert "What animals are shown?" in svc2.calls[0]


def test_gpt_extraction_retry_then_raise():
    from opadpo_tpu.eval.object_hal import make_gpt_extractor

    svc = _FakeService({"always": RuntimeError("boom")})
    svc.replies = {"": RuntimeError("boom")}    # every call raises

    class _Raising(_FakeService):
        def call_llm_with_messages(self, messages, **kw):
            self.calls.append(1)
            raise RuntimeError("api down")

    svc = _Raising({})
    extract = make_gpt_extractor(svc, fail_limit=3)
    with pytest.raises(RuntimeError, match="after 3 tries"):
        extract("a long enough answer with many words here")
    assert len(svc.calls) == 3


def test_bundled_similarity_singular_s_words():
    """Singulars that themselves end in s must still match their plural
    (first-match suffix stripping turned 'glass' into 'glas' while
    'glasses' became 'glass', missing the pair)."""
    from opadpo_tpu.eval.amber_similarity import bundled_similarity as sim
    for a, b in [("glass", "glasses"), ("bus", "buses"),
                 ("horse", "horses"), ("dish", "dishes"),
                 ("box", "boxes")]:
        assert sim(a, b) > 0.8, (a, b)
    assert sim("glass", "grass") <= 0.8


def test_gpt_extraction_retries_bypass_poisoned_cache():
    """The sqlite cache stores any 200 reply BEFORE parsing; retries
    after a parse failure must bypass the cache or a malformed cached
    reply replays forever (and poisons the resume path)."""
    from opadpo_tpu.eval.object_hal import make_gpt_extractor

    class _Healing:
        def __init__(self):
            self.cache_hits = 0
            self.fresh = 0

        def call_llm_with_messages(self, messages, temperature=0.0,
                                   max_tokens=2048, use_cache=True):
            if use_cache:
                self.cache_hits += 1
                return "()"        # malformed cached reply
            self.fresh += 1
            return '["dog", "frisbee"]'

    svc = _Healing()
    extract = make_gpt_extractor(svc, fail_limit=3)
    objs = extract("A dog catches a frisbee in the park today.")
    assert objs == ["dog", "frisbee"]
    assert svc.cache_hits == 1 and svc.fresh == 1


def test_gpt_extraction_api_errors_keep_cache_on():
    """Transient API failures (RuntimeError) must NOT flip use_cache off:
    the cache was never the problem, and bypassing it re-spends API
    calls on every network blip."""
    from opadpo_tpu.eval.object_hal import make_gpt_extractor

    class _Flaky:
        def __init__(self):
            self.cached_calls = 0
            self.uncached_calls = 0
            self.n = 0

        def call_llm_with_messages(self, messages, temperature=0.0,
                                   max_tokens=2048, use_cache=True):
            if use_cache:
                self.cached_calls += 1
            else:
                self.uncached_calls += 1
            self.n += 1
            if self.n < 3:
                raise RuntimeError("api down")
            return '["dog"]'

    svc = _Flaky()
    extract = make_gpt_extractor(svc, fail_limit=5)
    objs = extract("A dog catches a frisbee in the park today.")
    assert objs == ["dog"]
    assert svc.cached_calls == 3 and svc.uncached_calls == 0


def test_two_arg_text_extractor_not_misrouted():
    """An extractor whose second parameter is NOT named 'record' (e.g.
    the (text, tables) shape of extract_coco_objects) must be called
    text-only — arity-based routing bound the record dict to tables."""
    from opadpo_tpu.eval.object_hal import (
        SynonymTables, evaluate_chair, extract_coco_objects,
    )
    responses = [{"image_id": 1, "text": "A dog sits on a couch."}]
    gts = {1: ["dog", "couch"]}
    m = evaluate_chair(responses, gts,
                       extract_objects_fn=extract_coco_objects)
    assert m["CHAIRi"] == 0.0 and m["object_recall"] == 100.0

    # and a 'record'-named parameter still receives the full record
    seen = []

    def rec_extract(text, record=None):
        seen.append(record)
        return ["dog"]

    evaluate_chair(responses, gts, extract_objects_fn=rec_extract)
    assert seen and seen[0]["image_id"] == 1
