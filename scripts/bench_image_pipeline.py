"""Host image-preprocess A/B: native C++ (libjpeg + OpenMP) vs PIL on
the two production surfaces it now serves (VERDICT r4 ask 2):

  1. rollout data loading — QueryDataset rows with JPEG image_bytes
     (reference PIL loop: utils/data_utils_dpo.py:319-341)
  2. serving admission — the batch preprocess in front of every request
     (serve.py InferenceWorker._run_batch / ContinuousWorker._admit)

Host-only (no TPU).  Writes IMAGEPIPE_r05.json at the repo root:

    python scripts/bench_image_pipeline.py [--images 64] [--size 640]
"""

from __future__ import annotations

import argparse
import io
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def make_jpegs(n: int, hw: int, seed: int = 0):
    from PIL import Image
    rng = np.random.default_rng(seed)
    out = []
    for _ in range(n):
        # smooth content so the JPEGs are realistically sized
        base = rng.normal(size=(hw // 16, hw // 16, 3))
        arr = np.kron(base, np.ones((16, 16, 1)))
        arr = ((arr - arr.min()) / (arr.max() - arr.min() + 1e-9) * 255)
        buf = io.BytesIO()
        Image.fromarray(arr.astype(np.uint8)).save(buf, format="JPEG",
                                                   quality=90)
        out.append(buf.getvalue())
    return out


def best_of(fn, n=3):
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        fn()
        ts.append(time.perf_counter() - t0)
    return min(ts)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--images", type=int, default=64)
    ap.add_argument("--size", type=int, default=640,
                    help="source image edge (COCO-scale)")
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    from opadpo_tpu.data.image_processing import (
        preprocess_images, set_pil_preprocess,
    )
    from opadpo_tpu.data.native_image import native_available

    jpegs = make_jpegs(args.images, args.size)
    rec = {"images": args.images, "source_edge": args.size,
           "native_available": native_available(),
           "cores": os.cpu_count()}

    # --- surface 1: batch preprocess (serving admission / eval chunks)
    preprocess_images(jpegs, size=336)                 # warm allocations
    t_native = best_of(lambda: preprocess_images(jpegs, size=336))
    set_pil_preprocess(True)
    try:
        t_pil = best_of(lambda: preprocess_images(jpegs, size=336))
    finally:
        set_pil_preprocess(False)
    rec["batch_preprocess"] = {
        "native_ms_per_image": round(t_native / args.images * 1e3, 3),
        "pil_ms_per_image": round(t_pil / args.images * 1e3, 3),
        "speedup": round(t_pil / t_native, 2),
    }

    # --- surface 2: rollout dataset rows (QueryDataset __getitem__)
    import base64

    from datasets import Dataset

    from opadpo_tpu.data.datasets import QueryDataset
    from tests.fake_tokenizer import FakeTokenizer

    ds = Dataset.from_dict({
        "queries": [f"<image>\nDescribe image {i}."
                    for i in range(args.images)],
        "image_bytes": [base64.b64encode(j).decode() for j in jpegs],
        "standard_response": ["x"] * args.images,
        "image_id": [f"img{i}.jpg" for i in range(args.images)],
    })
    qds = QueryDataset(ds, FakeTokenizer(), query_len=128, image_size=336)

    def load_all():
        for i in range(len(qds)):
            qds[i]

    load_all()                                          # tokenizer warm
    t_native = best_of(load_all)
    set_pil_preprocess(True)
    try:
        t_pil = best_of(load_all)
    finally:
        set_pil_preprocess(False)
    rec["rollout_rows"] = {
        "native_rows_per_sec": round(args.images / t_native, 1),
        "pil_rows_per_sec": round(args.images / t_pil, 1),
        "speedup": round(t_pil / t_native, 2),
    }

    out_path = args.out or os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        if "scripts" in os.path.abspath(__file__) else ".",
        "IMAGEPIPE_r05.json")
    # scripts/.. == repo root
    out_path = args.out or os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "IMAGEPIPE_r05.json")
    with open(out_path, "w") as f:
        json.dump(rec, f, indent=1)
    print(json.dumps(rec))


if __name__ == "__main__":
    main()
