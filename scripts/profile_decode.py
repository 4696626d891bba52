"""Profile the unrolled decode step on the real chip (jax.profiler trace).

Captures one chunked-decode chunk (default 64 steps at B=16, chunk-0
watermark) under ``jax.profiler.trace`` so per-fusion device durations
land in ``vm.trace.json.gz`` — per CLAUDE.md the tunnel forwards device
op events.  Use to find where the decode step's non-bandwidth overhead
lives (suffix einsums, sampling top_k, rope, int4 matmul prologues...).

Usage:
    PYTHONPATH=/root/.axon_site:/root/repo python scripts/profile_decode.py \
        --batch 16 --steps 64 --outdir /tmp/prof_decode
Then: python scripts/summarize_trace.py /tmp/prof_decode
"""
from __future__ import annotations

import argparse
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=16)
    p.add_argument("--steps", type=int, default=64)
    p.add_argument("--chunk", type=int, default=256)
    p.add_argument("--n-chunks", type=int, default=4,
                   help="preallocate the cache as if decoding this many "
                        "chunks (matches the 896-step run's chunk-0 shape)")
    p.add_argument("--outdir", default="/tmp/prof_decode")
    args = p.parse_args()

    from opadpo_tpu.constants import IMAGE_TOKEN_INDEX
    from opadpo_tpu.engine.sampler import decode_loop_unrolled
    from opadpo_tpu.engine.sampling import SamplingConfig
    from opadpo_tpu.models import llama as llama_model
    from opadpo_tpu.models import llava as llava_model
    from opadpo_tpu.ops import quant

    cfg = llava_model.LlavaConfig.llava_7b()
    b = args.batch

    def build():
        params = llava_model.init_params(jax.random.PRNGKey(0), cfg)
        params = quant.quantize_params(params, bits=4)
        llama = llama_model.fuse_for_inference(params["llama"])
        llama = llama_model.quantize_head_for_decode(llama, 4)
        return {**params, "llama": llama_model.unstack_layers(llama)}

    shapes = jax.eval_shape(build)
    params = jax.jit(lambda: jax.tree_util.tree_map(
        lambda s: jnp.full(s.shape, 0.01, s.dtype), shapes))()
    print("params ready", flush=True)

    rng = np.random.default_rng(0)
    q = rng.integers(5, 32000, (b, 128)).astype(np.int32)
    q[:, 1] = IMAGE_TOKEN_INDEX
    images = jnp.zeros((b, 336, 336, 3), jnp.bfloat16)
    s_prompt = 128 - 1 + cfg.num_patches
    sp_pad0 = -(-s_prompt // 128) * 128
    kv_total = sp_pad0 + (args.n_chunks - 1) * args.chunk
    pf = jax.jit(lambda p, q_, m_, im: llava_model.prefill_unrolled(
        p, cfg, q_, m_, im, quantize_kv=True, kv_total_len=kv_total))(
            params, jnp.asarray(q), jnp.ones_like(jnp.asarray(q)), images)
    _ = float(jnp.sum(pf["last_logits"]))
    print("prefill done", flush=True)

    sampling = SamplingConfig(max_new_tokens=args.chunk, temperature=1.0,
                              top_k=30, top_p=0.95, eos_token_id=-1,
                              pad_token_id=0)
    chunk_fn = jax.jit(
        lambda p, kv, pm, pos, ll, r, n, su: decode_loop_unrolled(
            p, cfg, list(kv), pm, pos, ll, r, sampling,
            max_new=n, return_state=True, sp_used=su),
        static_argnums=(6, 7))

    kv = tuple(pf["kv_list"])
    pm = jnp.pad(pf["key_mask"],
                 ((0, 0), (0, kv_total - pf["key_mask"].shape[1])))
    a = (params, kv, pm, pf["next_position"], pf["last_logits"],
         jax.random.PRNGKey(1), args.steps, sp_pad0)
    out, st = chunk_fn(*a)                       # compile + warm
    _ = int(jnp.sum(out))
    print("warm done", flush=True)

    t0 = time.perf_counter()
    with jax.profiler.trace(args.outdir):
        out, st = chunk_fn(*a)
        _ = int(jnp.sum(out))
    dt = time.perf_counter() - t0
    print(f"traced {args.steps} steps @ B={b}: "
          f"{dt / args.steps * 1e3:.2f} ms/step -> {args.outdir}", flush=True)


if __name__ == "__main__":
    main()
