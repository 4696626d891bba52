"""Object-HalBench: CHAIR metrics over COCO objects.

Reference: ``eval_llava_rlhf_coco/eval_gpt_obj_halbench.py`` (751 LoC
``CHAIR`` class, ``:132-565``) + ``summarize_gpt_obj_halbench_review.py``.
Metrics: CHAIRs (fraction of responses with ≥1 hallucinated object),
CHAIRi (fraction of mentioned object instances that are hallucinated),
object recall, and average response length.

Object grounding uses the standard MSCOCO 80-class synonym table from the
original CHAIR evaluation (Rohrbach et al. 2018, public) with the usual
double-word and plural handling.  The reference's optional GPT-4 object
extraction mode (``:323-408``) is available via ``extract_objects_fn``.
"""

from __future__ import annotations

import json
import re
from typing import Callable, Dict, List, Optional, Sequence, Set

# MSCOCO 80 objects + common synonyms (standard CHAIR table).
COCO_SYNONYMS: Dict[str, Sequence[str]] = {
    "person": ("person", "girl", "boy", "man", "woman", "kid", "child",
               "chef", "baker", "people", "adult", "rider", "children",
               "baby", "worker", "passenger", "sister", "biker", "policeman",
               "cop", "officer", "lady", "cowboy", "bride", "groom", "male",
               "female", "guy", "traveler", "mother", "father", "gentleman",
               "pitcher", "player", "skier", "snowboarder", "skater",
               "skateboarder", "foreigner", "caller", "offender", "coworker",
               "trespasser", "patient", "politician", "soldier", "grandchild",
               "serviceman", "walker", "drinker", "doctor", "lawyer",
               "judge", "fireman", "driver", "commuter"),
    "bicycle": ("bicycle", "bike", "unicycle", "minibike", "trike"),
    "car": ("car", "automobile", "van", "minivan", "sedan", "suv", "hatchback",
            "cab", "jeep", "coupe", "taxicab", "limo", "taxi"),
    "motorcycle": ("motorcycle", "scooter", "moped", "motorbike"),
    "airplane": ("airplane", "jetliner", "plane", "air plane", "monoplane",
                 "aircraft", "jet", "airbus", "biplane", "seaplane"),
    "bus": ("bus", "minibus", "trolley"),
    "train": ("train", "locomotive", "tramway", "caboose"),
    "truck": ("truck", "pickup", "lorry", "hauler", "firetruck"),
    "boat": ("boat", "ship", "liner", "sailboat", "motorboat", "dinghy",
             "powerboat", "speedboat", "canoe", "skiff", "yacht", "kayak",
             "catamaran", "pontoon", "houseboat", "vessel", "rowboat",
             "trawler", "ferryboat", "watercraft", "tugboat", "schooner",
             "barge", "ferry", "sailboard", "paddleboat", "lifeboat",
             "freighter", "steamboat", "riverboat", "battleship", "steamship"),
    "traffic light": ("traffic light", "street light", "traffic signal",
                      "stop light", "streetlight", "stoplight"),
    "fire hydrant": ("fire hydrant", "hydrant"),
    "stop sign": ("stop sign",),
    "parking meter": ("parking meter",),
    "bench": ("bench", "pew"),
    "bird": ("bird", "ostrich", "owl", "seagull", "goose", "duck", "parakeet",
             "falcon", "robin", "pelican", "waterfowl", "heron", "hummingbird",
             "mallard", "finch", "pigeon", "sparrow", "seabird", "osprey",
             "blackbird", "fowl", "shorebird", "woodpecker", "egret",
             "chickadee", "quail", "bluebird", "kingfisher", "buzzard",
             "willet", "gull", "swan", "bluejay", "flamingo", "cormorant",
             "parrot", "loon", "gosling", "waterbird", "pheasant", "rooster",
             "sandpiper", "puffin", "condor", "vulture", "macaw", "peacock",
             "cockatoo", "songbird", "jay", "crow", "raven", "turkey",
             "eagle", "hawk", "chicken", "dove"),
    "cat": ("cat", "kitten", "feline", "tabby"),
    "dog": ("dog", "puppy", "beagle", "pup", "chihuahua", "schnauzer",
            "dachshund", "rottweiler", "canine", "pitbull", "collie",
            "pug", "terrier", "poodle", "labrador", "doggie", "doberman",
            "mutt", "doggy", "spaniel", "bulldog", "sheepdog", "weimaraner",
            "corgi", "cocker", "greyhound", "retriever", "brindle", "hound",
            "whippet", "husky"),
    "horse": ("horse", "colt", "pony", "racehorse", "stallion", "equine",
              "mare", "foal", "palomino", "mustang", "clydesdale", "bronc",
              "bronco"),
    "sheep": ("sheep", "lamb", "ram", "goat", "ewe"),
    "cow": ("cow", "cattle", "oxen", "ox", "calf", "holstein", "heifer",
            "buffalo", "bull", "zebu", "bison"),
    "elephant": ("elephant",),
    "bear": ("bear", "panda"),
    "zebra": ("zebra",),
    "giraffe": ("giraffe",),
    "backpack": ("backpack", "knapsack"),
    "umbrella": ("umbrella",),
    "handbag": ("handbag", "wallet", "purse", "briefcase"),
    "tie": ("tie", "bow tie"),
    "suitcase": ("suitcase", "suit case", "luggage"),
    "frisbee": ("frisbee",),
    "skis": ("skis", "ski"),
    "snowboard": ("snowboard",),
    "sports ball": ("sports ball", "ball"),
    "kite": ("kite",),
    "baseball bat": ("baseball bat",),
    "baseball glove": ("baseball glove",),
    "skateboard": ("skateboard",),
    "surfboard": ("surfboard", "longboard", "skimboard", "shortboard",
                  "wakeboard"),
    "tennis racket": ("tennis racket", "racket"),
    "bottle": ("bottle",),
    "wine glass": ("wine glass",),
    "cup": ("cup",),
    "fork": ("fork",),
    "knife": ("knife", "pocketknife", "knive"),
    "spoon": ("spoon",),
    "bowl": ("bowl", "container"),
    "banana": ("banana",),
    "apple": ("apple",),
    "sandwich": ("sandwich", "burger", "sub", "cheeseburger", "hamburger"),
    "orange": ("orange",),
    "broccoli": ("broccoli",),
    "carrot": ("carrot",),
    "hot dog": ("hot dog",),
    "pizza": ("pizza",),
    "donut": ("donut", "doughnut", "bagel"),
    "cake": ("cake", "cheesecake", "cupcake", "shortcake", "coffeecake",
             "pancake"),
    "chair": ("chair", "seat", "stool"),
    "couch": ("couch", "sofa", "recliner", "futon", "loveseat", "settee",
              "chesterfield"),
    "potted plant": ("potted plant", "houseplant"),
    "bed": ("bed",),
    "dining table": ("dining table", "table", "desk"),
    "toilet": ("toilet", "urinal", "commode", "lavatory", "potty"),
    "tv": ("tv", "television", "monitor", "televison"),
    "laptop": ("laptop",),
    "mouse": ("mouse",),
    "remote": ("remote",),
    "keyboard": ("keyboard",),
    "cell phone": ("cell phone", "mobile phone", "phone", "cellphone",
                   "telephone", "phon", "smartphone", "iphone"),
    "microwave": ("microwave",),
    "oven": ("oven", "stovetop", "stove", "stove top oven"),
    "toaster": ("toaster",),
    "sink": ("sink",),
    "refrigerator": ("refrigerator", "fridge", "freezer"),
    "book": ("book",),
    "clock": ("clock",),
    "vase": ("vase",),
    "scissors": ("scissors",),
    "teddy bear": ("teddy bear", "teddybear"),
    "hair drier": ("hair drier", "hairdryer"),
    "toothbrush": ("toothbrush",),
}

_WORD_RE = re.compile(r"[a-z]+(?: [a-z]+)?")


def _build_lookup() -> Dict[str, str]:
    lookup: Dict[str, str] = {}
    for obj, syns in COCO_SYNONYMS.items():
        for s in syns:
            lookup[s] = obj
    return lookup


_LOOKUP = _build_lookup()
_DOUBLE_WORDS = sorted((s for s in _LOOKUP if " " in s),
                       key=len, reverse=True)


def _singularize(word: str) -> str:
    for suffix, repl in (("ies", "y"), ("ves", "f"), ("sses", "ss"),
                         ("es", "e"), ("s", "")):
        if word.endswith(suffix) and len(word) > len(suffix) + 1:
            cand = word[: -len(suffix)] + repl
            if cand in _LOOKUP:
                return cand
    return word


def extract_coco_objects(text: str) -> List[str]:
    """Canonical COCO object names mentioned in free text."""
    text = text.lower()
    found: List[str] = []
    # double-word synonyms first, removing them so single words don't
    # double count
    for phrase in _DOUBLE_WORDS:
        pattern = phrase.replace(" ", r"\s+")
        if re.search(rf"\b{pattern}s?\b", text):
            found.append(_LOOKUP[phrase])
            text = re.sub(rf"\b{pattern}s?\b", " ", text)
    for word in re.findall(r"[a-z]+", text):
        word = _singularize(word)
        if word in _LOOKUP:
            found.append(_LOOKUP[word])
    return found


def evaluate_chair(
    responses: List[Dict],            # {'question_id'|'image_id', 'text'}
    gt_objects: Dict,                 # image_id → list of GT coco objects
    extract_objects_fn: Optional[Callable[[str], List[str]]] = None,
) -> Dict[str, float]:
    extract = extract_objects_fn or extract_coco_objects
    n_resp = 0
    n_resp_hallu = 0
    n_inst = 0
    n_inst_hallu = 0
    n_gt_total = 0
    n_gt_covered = 0
    total_words = 0

    for rec in responses:
        img_id = rec.get("image_id", rec.get("question_id"))
        gts: Set[str] = {g.lower() for g in gt_objects.get(img_id, [])}
        mentioned = extract(rec["text"])
        total_words += len(rec["text"].split())
        n_resp += 1
        hallu = [m for m in mentioned if m not in gts]
        n_inst += len(mentioned)
        n_inst_hallu += len(hallu)
        if hallu:
            n_resp_hallu += 1
        n_gt_total += len(gts)
        n_gt_covered += len(gts & set(mentioned))

    return {
        "CHAIRs": round(n_resp_hallu / max(n_resp, 1) * 100, 1),
        "CHAIRi": round(n_inst_hallu / max(n_inst, 1) * 100, 1),
        "object_recall": round(n_gt_covered / max(n_gt_total, 1) * 100, 1),
        "avg_length": round(total_words / max(n_resp, 1), 1),
        "num_responses": n_resp,
    }


def main():
    import argparse
    p = argparse.ArgumentParser()
    p.add_argument("--answers-file", required=True)
    p.add_argument("--gt-objects", required=True,
                   help="json: image_id → [coco object names]")
    args = p.parse_args()
    responses = [json.loads(l) for l in open(args.answers_file)]
    gts = json.load(open(args.gt_objects))
    # json keys are strings; normalize
    gts = {type(responses[0].get("image_id",
                                 responses[0].get("question_id")))(k)
           if k.isdigit() else k: v for k, v in gts.items()}
    print(json.dumps(evaluate_chair(responses, gts), indent=2))


if __name__ == "__main__":
    main()
