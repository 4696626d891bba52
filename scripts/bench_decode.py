"""Decode throughput benchmark: 7B LLaVA rollout-shaped sampling on one
chip (reference hot loop: HF ``generate`` in ``rl_models.py:146-191``).

Measures steps/s of the unrolled split-cache decode loop at B=4 with the
rollout sampling config (top_k=30/top_p=0.95/T=1.0), for the quantized
base layouts that fit this 16 GB chip (bits=8 / bits=4).

Usage: python scripts/bench_decode.py [--bits 8] [--batch 4] [--steps 128]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.dirname(
                      os.path.abspath(__file__))), ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--bits", type=int, default=8, choices=(16, 8, 4))
    p.add_argument("--kv-bits", type=int, default=16, choices=(16, 8, 4))
    p.add_argument("--head-bits", type=int, default=16, choices=(16, 8, 4))
    p.add_argument("--chunk", type=int, default=0,
                   help="chunked decode: fold the suffix into the int8 "
                        "prompt cache every CHUNK steps (needs --kv-bits 8)")
    p.add_argument("--batch", type=int, default=4)
    p.add_argument("--steps", type=int, default=128)
    p.add_argument("--query-len", type=int, default=128)
    p.add_argument("--model", default="7b", choices=("7b", "13b", "tiny"))
    p.add_argument("--platform", default=None,
                   help="force a jax platform (\"cpu\" + --model tiny "
                        "validates the script without the chip)")
    p.add_argument("--topk-impl", default="sort",
                   choices=("sort", "approx"))
    p.add_argument("--probe-memory", action="store_true",
                   help="compile the prefill/chunk/fold programs WITHOUT "
                        "executing (no device buffers at all) and print "
                        "XLA's HBM budget — run this before any new "
                        "(model, kv-bits, batch) point; runtime OOMs "
                        "wedge the TPU service (CLAUDE.md)")
    p.add_argument("--kv-extra", type=int, default=0,
                   help="A/B probe: preallocate this many EXTRA unused "
                        "alignment-multiples (128 kv8 / 256 kv4) of cache "
                        "length beyond the chunked final length (identical work, longer physical "
                        "arrays — isolates the cost of reading a prefix "
                        "of a bigger buffer)")
    args = p.parse_args()
    if args.platform:
        jax.config.update("jax_platforms", args.platform)

    from opadpo_tpu.constants import IMAGE_TOKEN_INDEX
    from opadpo_tpu.engine.sampler import decode_loop_unrolled
    from opadpo_tpu.engine.sampling import SamplingConfig
    from opadpo_tpu.models import llama as llama_model
    from opadpo_tpu.models import llava as llava_model
    from opadpo_tpu.ops import quant

    cfg = {"7b": llava_model.LlavaConfig.llava_7b,
           "13b": llava_model.LlavaConfig.llava_13b,
           "tiny": llava_model.LlavaConfig.tiny}[args.model]()
    b = args.batch

    def build():
        params = llava_model.init_params(jax.random.PRNGKey(0), cfg)
        if args.bits in (4, 8):
            params = quant.quantize_params(params, bits=args.bits)
        llama = llama_model.fuse_for_inference(params["llama"])
        llama = llama_model.quantize_head_for_decode(llama, args.head_bits)
        return {**params, "llama": llama_model.unstack_layers(llama)}

    shapes = jax.eval_shape(build)
    if args.probe_memory:
        params = shapes          # ShapeDtypeStructs: lower-only, no HBM
    else:
        params = jax.jit(lambda: jax.tree_util.tree_map(
            lambda s: jnp.full(s.shape, 0.01, s.dtype), shapes))()
        print(f"params ready (bits={args.bits})", flush=True)

    rng = np.random.default_rng(0)
    q = rng.integers(5, cfg.llama.vocab_size,
                     (b, args.query_len)).astype(np.int32)
    q[:, 1] = IMAGE_TOKEN_INDEX
    qm = np.ones_like(q)
    sz = cfg.vision.image_size
    images = jnp.zeros((b, sz, sz, 3), jnp.bfloat16)

    # kv8: quantize inside prefill so the bf16 cache never hits HBM as a
    # program output (it set the decode-batch memory ceiling); chunked:
    # preallocate at final length so folds are in-place
    s_prompt = args.query_len - 1 + cfg.num_patches
    align = 256 if args.kv_bits == 4 else 128
    sp_pad0 = -(-s_prompt // align) * align
    kv_total = None
    if args.chunk:
        kv_total = sp_pad0 + (-(-args.steps // args.chunk) - 1) * args.chunk \
            + args.kv_extra * align
    pf_fn = jax.jit(lambda p, q, m, im: llava_model.prefill_unrolled(
        p, cfg, q, m, im, quantize_kv=(args.kv_bits in (8, 4)),
        kv_total_len=kv_total, kv_bits=args.kv_bits))

    if args.probe_memory:
        import bench_train
        from opadpo_tpu.engine.sampler import decode_loop_unrolled as dlu
        sds = jax.ShapeDtypeStruct
        q_s = sds(q.shape, jnp.int32)
        m_s = sds(qm.shape, jnp.int32)
        im_s = sds((b, sz, sz, 3), jnp.bfloat16)
        bench_train.probe_memory("prefill", pf_fn, params, q_s, m_s, im_s)
        pf_sh = jax.eval_shape(pf_fn, params, q_s, m_s, im_s)
        sampling_p = SamplingConfig(
            max_new_tokens=args.steps, temperature=1.0, top_k=30,
            top_p=0.95, eos_token_id=-1, pad_token_id=0,
            topk_impl=args.topk_impl)
        cdef = args.chunk or args.steps
        chunk_fn_p = jax.jit(
            lambda p, kv, pm, pos, ll, r, d0, n, su: dlu(
                p, cfg, list(kv), pm, pos, ll, r, sampling_p,
                done_init=d0, max_new=n, return_state=True, sp_used=su),
            static_argnums=(7, 8))
        sp_total = pf_sh["kv_list"][0][0]["scale"].shape[2] \
            if isinstance(pf_sh["kv_list"][0][0], dict) \
            else pf_sh["kv_list"][0][0].shape[1]
        probe_args = (params, tuple(pf_sh["kv_list"]),
                      sds((b, sp_total), jnp.int32), sds((b,), jnp.int32),
                      pf_sh["last_logits"], jax.random.PRNGKey(0),
                      sds((b,), jnp.bool_), min(cdef, args.steps),
                      sp_pad0 if args.chunk else None)
        compiled = bench_train.probe_memory("decode_chunk0", chunk_fn_p,
                                            *probe_args)
        if args.chunk and args.steps > args.chunk:
            st_sh = jax.eval_shape(chunk_fn_p, *probe_args)[1]
            fold_fn_p = jax.jit(
                lambda kv, sfx, pm, filled, off:
                llama_model.fold_suffix_into_prompt_kv(
                    list(kv), list(sfx), pm, filled, off),
                donate_argnums=(0, 1, 2))
            bench_train.probe_memory(
                "fold", fold_fn_p, tuple(pf_sh["kv_list"]),
                st_sh["suffix"], sds((b, sp_total), jnp.int32),
                sds((), jnp.int32), sds((), jnp.int32))
        return

    pf = pf_fn(params, jnp.asarray(q), jnp.asarray(qm), images)
    _ = float(jnp.sum(pf["last_logits"]))
    print("prefill done", flush=True)

    # eos that never fires → the loop runs all `steps` steps
    sampling = SamplingConfig(max_new_tokens=args.steps, temperature=1.0,
                              top_k=30, top_p=0.95, eos_token_id=-1,
                              pad_token_id=0, topk_impl=args.topk_impl)
    kv_list = pf["kv_list"]     # int8 dicts when --kv-bits 8

    if args.chunk:
        assert args.kv_bits in (8, 4) and args.chunk % align == 0
        c = args.chunk
        chunk_fn = jax.jit(
            lambda p, kv, pm, pos, ll, r, d0, n, su: decode_loop_unrolled(
                p, cfg, list(kv), pm, pos, ll, r, sampling,
                done_init=d0, max_new=n, return_state=True, sp_used=su),
            static_argnums=(7, 8))
        fold_fn = jax.jit(
            lambda kv, sfx, pm, filled, off:
            llama_model.fold_suffix_into_prompt_kv(
                list(kv), list(sfx), pm, filled, off),
            donate_argnums=(0, 1, 2))

        def run_chunked(kv0, rng):
            # consumes kv0 (the folds donate it) — caller passes a fresh
            # prefill cache per run; holding a second copy for the timed
            # run is itself 2.4 GB at B=12 and OOMs
            sp_total = kv0[0][0]["scale"].shape[2]
            pm = jnp.pad(pf["key_mask"],
                         ((0, 0), (0, sp_total - pf["key_mask"].shape[1])))
            kv = tuple(kv0)
            pos, ll = pf["next_position"], pf["last_logits"]
            done = jnp.zeros((b,), bool)
            n = 0
            for ci in range(-(-args.steps // c)):
                nc = min(c, args.steps - ci * c)
                su = sp_pad0 + ci * c
                out_c, st = chunk_fn(params, kv, pm, pos, ll, rng, done,
                                     nc, su)
                n += int(st["step"])
                done, rng = st["done"], st["rng"]
                pos, ll = st["positions"], st["last_logits"]
                if ci < -(-args.steps // c) - 1:
                    kv, pm = fold_fn(kv, st["suffix"], pm, st["step"],
                                     jnp.int32(su))
                    kv = tuple(kv)
            _ = int(jnp.sum(out_c))
            return n

        run_chunked(kv_list, jax.random.PRNGKey(1))     # compile all shapes
        kv2 = pf_fn(params, jnp.asarray(q), jnp.asarray(qm),
                    images)["kv_list"]                  # fresh cache
        t0 = time.perf_counter()
        n = run_chunked(kv2, jax.random.PRNGKey(1))
        dt = time.perf_counter() - t0
        sps = n / dt
        print(f"bits={args.bits} kv={args.kv_bits} head={args.head_bits} "
              f"chunk={c} B={b}: {sps:.1f} steps/s "
              f"({sps*b:.0f} tok/s), {dt/n*1e3:.2f} ms/step")
        return

    dec = jax.jit(lambda p, pk, pm, pos, ll, r: decode_loop_unrolled(
        p, cfg, pk, pm, pos, ll, r, sampling))
    dargs = (params, tuple(kv_list), pf["key_mask"],
             pf["next_position"], pf["last_logits"], jax.random.PRNGKey(1))
    out = dec(*dargs)
    _ = int(jnp.sum(out))
    t0 = time.perf_counter()
    out = dec(*dargs)
    _ = int(jnp.sum(out))
    dt = time.perf_counter() - t0
    sps = args.steps / dt
    print(f"bits={args.bits} kv={args.kv_bits} head={args.head_bits} "
          f"B={b}: {sps:.1f} steps/s "
          f"({sps*b:.0f} tok/s), {dt/args.steps*1e3:.2f} ms/step")


if __name__ == "__main__":
    main()
