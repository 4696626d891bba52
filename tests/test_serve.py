"""Serving path: worker micro-batching + HTTP round trip (tiny model)."""

import base64
import io
import json
import threading
import urllib.request

import jax
import numpy as np
from PIL import Image

from opadpo_tpu.models import llava as llava_model
from opadpo_tpu.models.llava import LlavaConfig
from opadpo_tpu.serve import ContinuousWorker, InferenceWorker, make_handler
from tests.fake_tokenizer import FakeTokenizer

CFG = LlavaConfig.tiny()
PARAMS = llava_model.init_params(jax.random.PRNGKey(0), CFG)


def _png_b64():
    img = Image.fromarray(np.zeros((24, 24, 3), np.uint8))
    buf = io.BytesIO()
    img.save(buf, format="PNG")
    return base64.b64encode(buf.getvalue()).decode()


def test_worker_and_http_roundtrip():
    worker = InferenceWorker(PARAMS, CFG, FakeTokenizer(), max_batch=2,
                             max_new_tokens=4)
    resp = worker.submit({"prompt": "what is this?",
                          "image_b64": _png_b64()})
    assert "text" in resp and "error" not in resp

    # per-request max_new_tokens caps THIS request below the server max:
    # the 1-token answer must be a prefix of the 4-token one
    short = worker.submit({"prompt": "what is this?",
                           "image_b64": _png_b64(),
                           "max_new_tokens": 1})
    assert "error" not in short
    assert resp["text"].startswith(short["text"]), (short, resp)
    assert len(short["text"].split()) <= len(resp["text"].split())

    from http.server import ThreadingHTTPServer
    server = ThreadingHTTPServer(("127.0.0.1", 0), make_handler(worker))
    threading.Thread(target=server.serve_forever, daemon=True).start()
    port = server.server_address[1]

    with urllib.request.urlopen(
            f"http://127.0.0.1:{port}/healthz") as r:
        assert json.loads(r.read())["status"] == "ok"

    body = json.dumps({"prompt": "hi", "image_b64": _png_b64()}).encode()
    req = urllib.request.Request(
        f"http://127.0.0.1:{port}/v1/generate", data=body,
        headers={"Content-Type": "application/json"})
    with urllib.request.urlopen(req) as r:
        out = json.loads(r.read())
    assert "text" in out
    server.shutdown()


def test_continuous_worker_concurrent_requests():
    """--continuous mode: concurrent submits all complete, each with its
    own latency (slot-pool admission instead of batch-sync generate)."""
    worker = ContinuousWorker(PARAMS, CFG, FakeTokenizer(), max_batch=2,
                              max_new_tokens=4, seg_len=2)
    results = [None] * 3

    def go(i):
        results[i] = worker.submit({"prompt": f"q{i}",
                                    "image_b64": _png_b64()})

    threads = [threading.Thread(target=go, args=(i,)) for i in range(3)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=300)
    for r in results:
        assert r is not None and "error" not in r and "text" in r, r
