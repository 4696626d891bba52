"""Minimal production serving entry: HTTP batch-inference server.

The reference stops at offline eval scripts; this adds the deployment
surface a production TPU setup needs: a single-process HTTP server that
micro-batches concurrent requests onto the Sampler (prefill +
donated-cache decode), with the int8 base option for memory headroom.

    python -m opadpo_tpu.serve --model-path <ckpt> [--adapter-path <dir>]
        [--port 8400] [--bits 8]

POST /v1/generate  {"prompt": "...", "image_b64": "...",
                    "max_new_tokens": N}   # N caps THIS request (≤ server max)
GET  /healthz

Sampling (greedy by default; --temperature/--top-k/--top-p set a
server-level sampled mode) is per-SERVER, not per-request: every request
in a micro-batch / slot pool rides one compiled program, so the sampling
config is baked at startup.
"""

from __future__ import annotations

import argparse
import base64
import io
import json
import queue
import threading
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np


class InferenceWorker:
    """Single device-owning thread; micro-batches queued requests."""

    def __init__(self, params, cfg, tokenizer, lora=None,
                 lora_scaling: float = 1.0, max_batch: int = 8,
                 max_new_tokens: int = 512, batch_window_s: float = 0.02,
                 kv_bits: int = 16, head_bits: int = 16,
                 decode_chunk: int = 0, temperature: float = 0.0,
                 top_k: int = 0, top_p: float = 1.0,
                 spec_k: int = 0, spec_draft: str = "ngram",
                 spec_advance: str = "shared"):
        from opadpo_tpu.engine.sampler import Sampler
        from opadpo_tpu.engine.serving_config import make_serving_sampling

        self.params = params
        self.cfg = cfg
        self.tokenizer = tokenizer
        self.lora = lora
        self.max_batch = max_batch
        self.batch_window_s = batch_window_s
        self.queue: "queue.Queue" = queue.Queue()
        self.sampling = make_serving_sampling(
            greedy=(temperature == 0.0),
            temperature=max(temperature, 1e-4), top_k=top_k, top_p=top_p,
            max_new_tokens=max_new_tokens,
            eos_token_id=tokenizer.eos_token_id,
            pad_token_id=tokenizer.pad_token_id)
        self.sampler = Sampler(cfg, self.sampling, lora_scaling=lora_scaling,
                               kv_bits=kv_bits, head_bits=head_bits,
                               chunk=decode_chunk, spec_k=spec_k,
                               spec_draft=spec_draft,
                               spec_advance=spec_advance)
        self.params, self.lora = self.sampler.prepare_params(self.params,
                                                             self.lora)
        self.rng = jax.random.PRNGKey(0)
        threading.Thread(target=self._loop, daemon=True).start()

    def submit(self, request: Dict) -> Dict:
        done = threading.Event()
        slot = {"request": request, "done": done, "response": None}
        self.queue.put(slot)
        done.wait()
        return slot["response"]

    def _loop(self):
        while True:
            slots = [self.queue.get()]
            t0 = time.time()
            while (len(slots) < self.max_batch
                   and time.time() - t0 < self.batch_window_s):
                try:
                    slots.append(self.queue.get(timeout=self.batch_window_s))
                except queue.Empty:
                    break
            try:
                self._run_batch(slots)
            except Exception as e:
                for s in slots:
                    s["response"] = {"error": str(e)}
                    s["done"].set()

    def _run_batch(self, slots: List[Dict]):
        from PIL import Image

        from opadpo_tpu.data.image_processing import preprocess_images
        from opadpo_tpu.data.tokenization import tokenizer_image_token
        from opadpo_tpu.eval.model_vqa import build_prompt
        from opadpo_tpu.engine.sampler import truncate_after_tokens

        img_size = self.cfg.vision.image_size
        b = self.max_batch                      # fixed shape → one compile
        rows, srcs = [], []
        for s in slots:
            req = s["request"]
            prompt = build_prompt(req.get("prompt", ""))
            rows.append(np.asarray(tokenizer_image_token(
                prompt, self.tokenizer), np.int64))
            img_b64 = req.get("image_b64")
            srcs.append(base64.b64decode(img_b64) if img_b64
                        else Image.new("RGB", (img_size, img_size)))
        # JPEG payloads decode in ONE native OpenMP batch — admission
        # preprocess is host-side latency in front of every request
        pixels = list(preprocess_images(srcs, size=img_size))

        longest = max(len(r) for r in rows)
        qlen = max(128, -(-longest // 64) * 64)
        queries = np.zeros((b, qlen), np.int64)
        mask = np.zeros((b, qlen), np.int64)
        for i, r in enumerate(rows):
            r = r[-qlen:]
            queries[i, -len(r):] = r
            mask[i, -len(r):] = 1
        images = np.zeros((b, img_size, img_size, 3), np.float32)
        images[:len(pixels)] = np.stack(pixels)

        self.rng, sub = jax.random.split(self.rng)
        t0 = time.time()
        tokens = np.asarray(self.sampler.generate(
            self.params, jnp.asarray(queries), jnp.asarray(mask),
            jnp.asarray(images), sub, lora=self.lora))
        tokens = truncate_after_tokens(tokens, self.tokenizer.eos_token_id,
                                       self.tokenizer.pad_token_id)
        # per-request max_new_tokens: the batch decodes to the server max
        # in one program; each row is cut to ITS requested budget here
        rows_out = []
        for i, s in enumerate(slots):
            mn = s["request"].get("max_new_tokens")
            rows_out.append(tokens[i][:mn] if mn else tokens[i])
        texts = [self.tokenizer.decode(r, skip_special_tokens=True)
                 for r in rows_out]
        dt = time.time() - t0
        for i, s in enumerate(slots):
            s["response"] = {"text": texts[i].strip(),
                             "latency_s": round(dt, 3),
                             "batch_size": len(slots)}
            s["done"].set()


class ContinuousWorker:
    """Slot-pool serving (``--continuous``): requests are admitted into a
    fixed pool of decode slots between short segments and respond when
    THEIR generation finishes — a long response no longer holds back the
    micro-batch (engine/continuous.ContinuousEngine)."""

    def __init__(self, params, cfg, tokenizer, lora=None,
                 lora_scaling: float = 1.0, max_batch: int = 8,
                 max_new_tokens: int = 512, seg_len: int = 64,
                 head_bits: int = 16, max_admit_group: int = 4,
                 temperature: float = 0.0, top_k: int = 0,
                 top_p: float = 1.0, kv_bits: int = 8,
                 query_len: int = 128, spec_k: int = 0,
                 spec_draft: str = "ngram"):
        from opadpo_tpu.engine.sampler import Sampler
        from opadpo_tpu.engine.serving_config import (
            make_continuous_engine, make_serving_sampling,
        )

        self.tokenizer = tokenizer
        self.cfg = cfg
        self.sampling = make_serving_sampling(
            greedy=(temperature == 0.0),
            temperature=max(temperature, 1e-4), top_k=top_k, top_p=top_p,
            max_new_tokens=max_new_tokens,
            eos_token_id=tokenizer.eos_token_id,
            pad_token_id=tokenizer.pad_token_id)
        kv_bits = 8 if kv_bits == 16 else kv_bits
        prep = Sampler(cfg, self.sampling, lora_scaling=lora_scaling,
                       kv_bits=kv_bits, head_bits=head_bits)
        params, lora = prep.prepare_params(params, lora)

        def mk_engine():
            # the slot pool's prompt bucket is FIXED (one prefill shape);
            # prompts longer than query_len are left-truncated by
            # add_request — size it for the deployment's longest prompt
            return make_continuous_engine(
                cfg, self.sampling, params, lora=lora,
                lora_scaling=lora_scaling, slots=max_batch,
                seg_len=seg_len, max_admit_group=max_admit_group,
                kv_bits=kv_bits, qlen=query_len, spec_k=spec_k,
                spec_draft=spec_draft)

        self._mk_engine = mk_engine
        self.engine = mk_engine()
        self.queue: "queue.Queue" = queue.Queue()
        self._pending: Dict[int, Dict] = {}
        self._t0: Dict[int, float] = {}
        threading.Thread(target=self._loop, daemon=True).start()

    submit = InferenceWorker.submit

    def _admit(self, slot: Dict):
        from PIL import Image

        from opadpo_tpu.data.image_processing import preprocess_images
        from opadpo_tpu.data.tokenization import tokenizer_image_token
        from opadpo_tpu.eval.model_vqa import build_prompt

        req = slot["request"]
        img_size = self.cfg.vision.image_size
        prompt = build_prompt(req.get("prompt", ""))
        ids = np.asarray(tokenizer_image_token(prompt, self.tokenizer),
                         np.int64)
        img_b64 = req.get("image_b64")
        src = (base64.b64decode(img_b64) if img_b64
               else Image.new("RGB", (img_size, img_size)))
        pixels = preprocess_images([src], size=img_size)[0]
        rid = self.engine.add_request(ids, np.ones_like(ids), pixels,
                                      max_new=req.get("max_new_tokens"))
        self._pending[rid] = slot
        self._t0[rid] = time.time()

    def _loop(self):
        from opadpo_tpu.engine.sampler import truncate_after_tokens
        while True:
            # block only when idle; otherwise drain without waiting
            if not self.engine.has_work():
                self._admit(self.queue.get())
            while True:
                try:
                    self._admit(self.queue.get_nowait())
                except queue.Empty:
                    break
            try:
                for rid, toks in self.engine.step():
                    # pop only after the response is fully set: a decode
                    # failure between pop and done.set() would otherwise
                    # orphan the slot (its HTTP thread waits forever)
                    slot = self._pending[rid]
                    toks = truncate_after_tokens(
                        toks[None], self.tokenizer.eos_token_id,
                        self.tokenizer.pad_token_id)
                    text = self.tokenizer.batch_decode(
                        toks, skip_special_tokens=True)[0]
                    slot["response"] = {
                        "text": text.strip(),
                        "latency_s": round(time.time()
                                           - self._t0.pop(rid), 3)}
                    slot["done"].set()
                    del self._pending[rid]
            except Exception as e:
                for rid, slot in list(self._pending.items()):
                    slot["response"] = {"error": str(e)}
                    slot["done"].set()
                self._pending.clear()
                self._t0.clear()
                # the pool state may be mid-update — rebuild so the
                # worker keeps serving subsequent requests
                self.engine = self._mk_engine()


def make_handler(worker: InferenceWorker):
    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *a):
            pass

        def _send(self, code: int, payload: Dict):
            body = json.dumps(payload).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            if self.path == "/healthz":
                self._send(200, {"status": "ok"})
            else:
                self._send(404, {"error": "not found"})

        def do_POST(self):
            if self.path != "/v1/generate":
                self._send(404, {"error": "not found"})
                return
            length = int(self.headers.get("Content-Length", 0))
            try:
                req = json.loads(self.rfile.read(length))
                resp = worker.submit(req)
                self._send(200 if "error" not in resp else 500, resp)
            except Exception as e:
                self._send(400, {"error": str(e)})

    return Handler


def main():
    p = argparse.ArgumentParser(description="LLaVA TPU inference server")
    p.add_argument("--model-path", required=True)
    p.add_argument("--vision-path", default=None)
    p.add_argument("--adapter-path", default=None)
    p.add_argument("--port", type=int, default=8400)
    p.add_argument("--bits", type=int, default=16, choices=(16, 8, 4))
    p.add_argument("--max-batch", type=int, default=8)
    p.add_argument("--max-new-tokens", type=int, default=512)
    p.add_argument("--temperature", type=float, default=0.0,
                   help="0 = greedy (default); >0 = sampled decoding "
                        "(server-level — one compiled program)")
    p.add_argument("--top-k", type=int, default=0)
    p.add_argument("--top-p", type=float, default=1.0)
    p.add_argument("--kv-bits", type=int, default=16, choices=(16, 8, 4),
                   help="quantized prompt-KV cache (8 = int8, 4 = packed "
                        "int4) + fused decode-attention kernel; batch "
                        "mode only — the continuous engine is int8")
    p.add_argument("--head-bits", type=int, default=16, choices=(16, 4),
                   help="int4 lm_head during decode")
    p.add_argument("--decode-chunk", type=int, default=0,
                   help="fold suffix KV into the prompt cache every N steps")
    p.add_argument("--continuous", action="store_true",
                   help="slot-pool continuous batching: admit requests "
                        "into free decode slots between segments instead "
                        "of batch-synchronous generate (implies int8 KV)")
    p.add_argument("--seg-len", type=int, default=64,
                   help="continuous mode: decode steps per scheduling "
                        "segment (admission latency quantum)")
    p.add_argument("--query-len", type=int, default=128,
                   help="continuous mode: fixed prompt bucket (tokens); "
                        "longer prompts are LEFT-TRUNCATED at admission "
                        "(batch mode instead buckets per micro-batch)")
    p.add_argument("--admit-group", type=int, default=4, choices=(1, 2, 4),
                   help="continuous mode: max admission prefill batch — "
                        "cap at 1-2 for large models to keep HBM headroom")
    p.add_argument("--visual-tokens", type=int, default=0,
                   help="EXPERIMENTAL training-free visual-token pruning: "
                        "keep only the top-K projected patches (0 = all "
                        "576); quality unvalidated on real weights")
    p.add_argument("--pil-preprocess", action="store_true",
                   help="force the PIL image path (strict HF-numerics "
                        "parity) instead of the native C++ JPEG pipeline")
    p.add_argument("--spec-k", type=int, default=0,
                   help="speculative decoding: verify k draft tokens per "
                        "group (exact distribution; small-batch latency "
                        "lever; continuous mode uses per-row segments "
                        "and needs kv-bits 8)")
    p.add_argument("--spec-draft", default="ngram",
                   choices=("ngram", "pad"),
                   help="draft source for --spec-k")
    p.add_argument("--spec-advance", default="shared",
                   choices=("shared", "per_row"),
                   help="per_row keeps each request's accepted run "
                        "(better at batch>1)")
    args = p.parse_args()

    if args.pil_preprocess:
        from opadpo_tpu.data.image_processing import set_pil_preprocess
        set_pil_preprocess(True)

    from opadpo_tpu.models.loader import load_peft_adapter
    from opadpo_tpu.pipeline.runtime import load_tokenizer, setup_model

    cfg, params, _ = setup_model(args.model_path,
                                 vision_dir=args.vision_path,
                                 bits=args.bits,
                                 visual_tokens=args.visual_tokens or None)
    tokenizer = load_tokenizer(args.model_path)
    lora, scaling = None, 1.0
    if args.adapter_path:
        import os
        lora = load_peft_adapter(args.adapter_path, cfg.llama)
        acfg = json.load(open(os.path.join(args.adapter_path,
                                           "adapter_config.json")))
        scaling = acfg["lora_alpha"] / acfg["r"]

    if args.continuous:
        if args.kv_bits == 16:
            print("note: --continuous quantizes the KV cache (int8 "
                  "default; --kv-bits 4 halves it again)", flush=True)
        worker = ContinuousWorker(params, cfg, tokenizer, lora=lora,
                                  lora_scaling=scaling,
                                  max_batch=args.max_batch,
                                  max_new_tokens=args.max_new_tokens,
                                  seg_len=args.seg_len,
                                  head_bits=args.head_bits,
                                  max_admit_group=args.admit_group,
                                  temperature=args.temperature,
                                  top_k=args.top_k, top_p=args.top_p,
                                  kv_bits=args.kv_bits,
                                  query_len=args.query_len,
                                  spec_k=args.spec_k,
                                  spec_draft=args.spec_draft)
    else:
        worker = InferenceWorker(params, cfg, tokenizer, lora=lora,
                                 lora_scaling=scaling,
                                 max_batch=args.max_batch,
                                 max_new_tokens=args.max_new_tokens,
                                 kv_bits=args.kv_bits,
                                 head_bits=args.head_bits,
                                 decode_chunk=args.decode_chunk,
                                 temperature=args.temperature,
                                 top_k=args.top_k, top_p=args.top_p,
                                 spec_k=args.spec_k,
                                 spec_draft=args.spec_draft,
                                 spec_advance=args.spec_advance)
    server = ThreadingHTTPServer(("0.0.0.0", args.port),
                                 make_handler(worker))
    print(f"serving on :{args.port}")
    server.serve_forever()


if __name__ == "__main__":
    main()
