"""Text-only QA inference (reference ``eval_llava_rlhf_coco/model_qa.py``):
language-side generation without the vision tower, for pure-language
sanity benchmarks and the GPT-3.5 baseline comparisons.
"""

from __future__ import annotations

import argparse
import json
import os
import uuid
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from opadpo_tpu.data import conversation as conversation_lib
from opadpo_tpu.engine.sampler import truncate_after_tokens
from opadpo_tpu.engine.sampling import SamplingConfig, sample_tokens
from opadpo_tpu.models import llama as llama_model


class TextSampler:
    """Prefill + split-cache decode on the language model only."""

    def __init__(self, llama_cfg, sampling: SamplingConfig,
                 lora_scaling: float = 1.0):
        self.cfg = llama_cfg
        self.sampling = sampling
        self.lora_scaling = lora_scaling
        self._fns = {}

    def _prefill(self, params, lora, ids, mask):
        embeds = llama_model.embed_tokens(params["llama"], ids)
        positions = jnp.maximum(jnp.cumsum(mask, axis=1) - 1, 0
                                ).astype(jnp.int32)
        cache = llama_model.init_kv_cache(self.cfg, ids.shape[0],
                                          ids.shape[1])
        logits, cache = llama_model.forward(
            params["llama"], self.cfg, embeds, mask, positions,
            lora=(lora or {}).get("llama"), lora_scaling=self.lora_scaling,
            cache=cache, remat=False)
        return {"prompt_kv": {"k": cache["k"], "v": cache["v"]},
                "mask": mask, "last_logits": logits[:, -1, :],
                "positions": positions[:, -1] + 1}

    def _decode(self, params, lora, pf, rng):
        b = pf["mask"].shape[0]
        samp = self.sampling
        suffix = llama_model.init_suffix_cache(self.cfg, b,
                                               samp.max_new_tokens)

        def cond(state):
            return jnp.logical_and(state[0] < samp.max_new_tokens,
                                   jnp.logical_not(jnp.all(state[-2])))

        def body(state):
            step, rng, suffix, positions, last_logits, done, out = state
            rng, sub = jax.random.split(rng)
            tok = sample_tokens(sub, last_logits, samp)
            tok = jnp.where(done, samp.pad_token_id, tok)
            out = out.at[:, step].set(tok)
            done = jnp.logical_or(done, tok == samp.eos_token_id)
            embeds = llama_model.embed_tokens(params["llama"],
                                              tok[:, None])
            logits, suffix = llama_model.decode_forward_split(
                params["llama"], self.cfg, embeds, pf["prompt_kv"],
                pf["mask"], suffix, step, positions,
                lora=(lora or {}).get("llama"),
                lora_scaling=self.lora_scaling)
            return (step + 1, rng, suffix, positions + 1, logits, done, out)

        out0 = jnp.full((b, samp.max_new_tokens), samp.pad_token_id,
                        jnp.int32)
        state = (jnp.zeros((), jnp.int32), rng, suffix, pf["positions"],
                 pf["last_logits"], jnp.zeros((b,), bool), out0)
        return jax.lax.while_loop(cond, body, state)[-1]

    def generate(self, params, ids, mask, rng, lora=None):
        key = (ids.shape[0], ids.shape[1])
        if key not in self._fns:
            pf_fn = jax.jit(lambda p, lo, i, m: self._prefill(p, lo, i, m))
            dec_fn = jax.jit(
                lambda p, lo, pf, r: self._decode(p, lo, pf, r))
            self._fns[key] = (pf_fn, dec_fn)
        pf_fn, dec_fn = self._fns[key]
        pf = pf_fn(params, lora, ids, mask)
        return dec_fn(params, lora, pf, rng)


def run_text_qa(params, llama_cfg, tokenizer, questions: List[Dict],
                answers_file: str, lora=None, lora_scaling: float = 1.0,
                batch_size: int = 8, max_new_tokens: int = 512) -> None:
    sampling = SamplingConfig(greedy=True, max_new_tokens=max_new_tokens,
                              eos_token_id=tokenizer.eos_token_id,
                              pad_token_id=tokenizer.pad_token_id)
    sampler = TextSampler(llama_cfg, sampling, lora_scaling)
    rng = jax.random.PRNGKey(0)
    os.makedirs(os.path.dirname(answers_file) or ".", exist_ok=True)
    with open(answers_file, "w") as out_f:
        for start in range(0, len(questions), batch_size):
            chunk = questions[start:start + batch_size]
            rows = []
            for q in chunk:
                conv = conversation_lib.default_conversation.copy()
                conv.append_message(conv.roles[0], q["text"])
                conv.append_message(conv.roles[1], None)
                rows.append(np.asarray(
                    tokenizer(conv.get_prompt()).input_ids, np.int64))
            longest = max(len(r) for r in rows)
            qlen = -(-longest // 64) * 64
            b = len(chunk)
            ids = np.zeros((batch_size, qlen), np.int64)
            mask = np.zeros((batch_size, qlen), np.int64)
            for i, r in enumerate(rows):
                r = r[-qlen:]
                ids[i, -len(r):] = r
                mask[i, -len(r):] = 1
            rng, sub = jax.random.split(rng)
            tokens = np.asarray(sampler.generate(
                params, jnp.asarray(ids), jnp.asarray(mask), sub,
                lora=lora))[:b]
            tokens = truncate_after_tokens(tokens, tokenizer.eos_token_id,
                                           tokenizer.pad_token_id)
            texts = tokenizer.batch_decode(tokens, skip_special_tokens=True)
            for q, text in zip(chunk, texts):
                out_f.write(json.dumps({
                    "question_id": q.get("question_id", q.get("id")),
                    "prompt": q["text"],
                    "text": text.strip(),
                    "answer_id": uuid.uuid4().hex[:22],
                    "model_id": "llava-tpu-textqa",
                }) + "\n")
            out_f.flush()


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--model-path", required=True)
    p.add_argument("--adapter-path", default=None)
    p.add_argument("--question-file", required=True)
    p.add_argument("--answers-file", required=True)
    p.add_argument("--batch-size", type=int, default=8)
    args = p.parse_args()

    from opadpo_tpu.models.loader import load_peft_adapter
    from opadpo_tpu.pipeline.runtime import load_tokenizer, setup_model

    cfg, params, _ = setup_model(args.model_path)
    tokenizer = load_tokenizer(args.model_path)
    lora, scaling = None, 1.0
    if args.adapter_path:
        lora = load_peft_adapter(args.adapter_path, cfg.llama)
        acfg = json.load(open(os.path.join(args.adapter_path,
                                           "adapter_config.json")))
        scaling = acfg["lora_alpha"] / acfg["r"]

    questions = [json.loads(l) for l in open(args.question_file)]
    run_text_qa(params, cfg.llama, tokenizer, questions, args.answers_file,
                lora=lora, lora_scaling=scaling,
                batch_size=args.batch_size)


if __name__ == "__main__":
    main()
