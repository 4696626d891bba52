"""Int8 weight quantization + Pallas dequantizing matmul.

The reference's 4/8-bit path is bitsandbytes QLoRA (``qlora_model.py:
151-160``: bnb Linear4bit/8bit with ``llm_int8_skip_modules=["mm_projector",
"lm_head"]``) — a CUDA-only stack.  TPU-native replacement:

- weights quantize per-output-channel symmetric int8 (absmax / 127);
- the matmul kernel streams int8 blocks HBM→VMEM, dequantizes in VMEM and
  feeds the MXU in bf16 — the full-precision weight never exists in HBM,
  halving weight memory vs bf16 (7B base: 14 GB → 7 GB, which is what
  lets the frozen DPO base + LoRA + optimizer fit one 16 GB v5e chip);
- LoRA deltas stay bf16 on top, exactly like QLoRA.

``quantize_params`` walks a params pytree and replaces every 2-D+ weight
(except norms/embeddings/projector, mirroring the reference's skip list)
with a ``{"q": int8, "scale": f32}`` dict; ``lora_dense`` dispatches on
that structure.
"""

from __future__ import annotations

import functools
from typing import Any, Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _cdiv(a, b):
    return -(-a // b)


def _round_up(x, m):
    return _cdiv(x, m) * m


def is_quantized(w: Any) -> bool:
    return isinstance(w, dict) and "q" in w and "scale" in w


def quantize_weight(w: jax.Array) -> dict:
    """[.., in, out] → int8 q + f32 scale per output channel (last dim)."""
    w32 = w.astype(jnp.float32)
    absmax = jnp.max(jnp.abs(w32), axis=-2, keepdims=True)      # [.., 1, out]
    scale = jnp.where(absmax == 0, 1.0, absmax / 127.0)
    q = jnp.clip(jnp.round(w32 / scale), -127, 127).astype(jnp.int8)
    return {"q": q, "scale": scale.astype(jnp.float32)}


def dequantize_weight(wq: dict, dtype=jnp.bfloat16) -> jax.Array:
    return (wq["q"].astype(jnp.float32) * wq["scale"]).astype(dtype)


# ---------------------------------------------------------------------------
# Pallas kernel: x[bm, K] @ dequant(w[K, bn]) with K-blocked accumulation
# ---------------------------------------------------------------------------

def _q8_matmul_kernel(x_ref, q_ref, s_ref, o_ref, acc_scr, *, nk, bk):
    j = pl.program_id(1)
    kk = pl.program_id(2)

    @pl.when(kk == 0)
    def _():
        acc_scr[:] = jnp.zeros_like(acc_scr)

    x_blk = x_ref[0]                          # [bm, bk]
    w_blk = q_ref[0]                          # [bk, bn] int8
    w_deq = w_blk.astype(jnp.bfloat16)
    acc_scr[:] += jax.lax.dot_general(
        x_blk, w_deq, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)

    @pl.when(kk == nk - 1)
    def _():
        scale = s_ref[0, 0]                   # [bn]
        o_ref[0] = (acc_scr[:] * scale[None, :]).astype(o_ref.dtype)


def _pick_block_k(k: int, block_n: int,
                  vmem_budget: int = 3 * 1024 * 1024) -> int:
    """Largest K-block (multiple of the 32-sublane int8 tile) whose
    [bk, bn] int8 block fits the VMEM budget — measured 760 GB/s weight
    streaming at full-K blocks vs 26 GB/s at bk=512 on v5e."""
    max_bk = max(32, (vmem_budget // block_n) // 32 * 32)
    if k <= max_bk:
        return _round_up(k, 32)
    nk = _cdiv(k, max_bk)
    return _round_up(_cdiv(k, nk), 32)


def quant_matmul(
    x: jax.Array,        # [M, K] bf16/f32
    wq: dict,            # {"q": [K, N] int8, "scale": [1, N] f32}
    block_m: int = 256,
    block_n: int = 512,
    block_k: Optional[int] = None,
    out_dtype=None,
) -> jax.Array:
    """x @ dequant(wq) with in-VMEM dequantization."""
    q, scale = wq["q"], wq["scale"]
    m, k = x.shape
    k2, n = q.shape
    assert k == k2, (x.shape, q.shape)
    out_dtype = out_dtype or x.dtype
    if block_k is None:
        block_k = _pick_block_k(k, block_n)

    mp = _round_up(m, 8)
    kp = _round_up(k, block_k)
    np_ = _round_up(n, block_n)
    bm = min(block_m, mp)

    xp = jnp.pad(x, ((0, mp - m), (0, kp - k)))[None]           # [1, Mp, Kp]
    qp = jnp.pad(q, ((0, kp - k), (0, np_ - n)))[None]
    sp = jnp.pad(scale.reshape(1, n), ((0, 0), (0, np_ - n)))[None]

    nk = kp // block_k
    grid = (_cdiv(mp, bm), np_ // block_n, nk)
    out = pl.pallas_call(
        functools.partial(_q8_matmul_kernel, nk=nk, bk=block_k),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, bm, block_k), lambda i, j, kk: (0, i, kk),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_k, block_n), lambda i, j, kk: (0, kk, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, block_n), lambda i, j, kk: (0, 0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, bm, block_n), lambda i, j, kk: (0, i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1, mp, np_), out_dtype),
        scratch_shapes=[pltpu.VMEM((bm, block_n), jnp.float32)],
        interpret=jax.default_backend() != "tpu",
    )(xp, qp, sp)
    return out[0, :m, :n]


def _q8_matmul_t_kernel(g_ref, q_ref, o_ref, acc_scr, *, nn):
    """dx[bm, bk] += g_scaled[bm, bn] @ q[bk, bn]^T, N-blocked."""
    j = pl.program_id(1)
    kk = pl.program_id(2)

    @pl.when(kk == 0)
    def _():
        acc_scr[:] = jnp.zeros_like(acc_scr)

    g_blk = g_ref[0]                          # [bm, bn] (already × scale)
    q_blk = q_ref[0]                          # [bk, bn] int8
    acc_scr[:] += jax.lax.dot_general(
        g_blk, q_blk.astype(jnp.bfloat16), (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)

    @pl.when(kk == nn - 1)
    def _():
        o_ref[0] = acc_scr[:].astype(o_ref.dtype)


def quant_matmul_transposed(
    g: jax.Array,        # [M, N] cotangent
    wq: dict,            # {"q": [K, N] int8, "scale": [1, N]}
    block_m: int = 256,
    block_n: Optional[int] = None,
    block_k: int = 512,
    out_dtype=None,
) -> jax.Array:
    """g @ dequant(wq)^T → [M, K] (int8 streamed, dequant in VMEM)."""
    q, scale = wq["q"], wq["scale"]
    m, n = g.shape
    k, n2 = q.shape
    assert n == n2
    out_dtype = out_dtype or g.dtype
    if block_n is None:
        block_n = _pick_block_k(n, block_k)

    # fold the per-output-channel scale into g's columns
    gs = (g.astype(jnp.float32) * scale.reshape(1, n)).astype(jnp.bfloat16)

    mp = _round_up(m, 8)
    np_ = _round_up(n, block_n)
    kp = _round_up(k, block_k)
    bm = min(block_m, mp)
    gp = jnp.pad(gs, ((0, mp - m), (0, np_ - n)))[None]
    qp = jnp.pad(q, ((0, kp - k), (0, np_ - n)))[None]
    nn = np_ // block_n
    out = pl.pallas_call(
        functools.partial(_q8_matmul_t_kernel, nn=nn),
        grid=(_cdiv(mp, bm), kp // block_k, nn),
        in_specs=[
            pl.BlockSpec((1, bm, block_n), lambda i, j, kk: (0, i, kk),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_k, block_n), lambda i, j, kk: (0, j, kk),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, bm, block_k), lambda i, j, kk: (0, i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1, mp, kp), out_dtype),
        scratch_shapes=[pltpu.VMEM((bm, block_k), jnp.float32)],
        interpret=jax.default_backend() != "tpu",
    )(gp, qp)
    return out[0, :m, :k]


# Below this row count the matmul is weight-bandwidth-bound and the Pallas
# streaming kernel wins (int8 weights never touch HBM as bf16: 760 GB/s
# measured).  At or above it the matmul is MXU-bound and per-tile in-VMEM
# dequantization costs ~30% (116 vs 170 TF/s measured at M=19k on v5e);
# dequantizing the whole weight once and letting XLA run a plain bf16
# einsum amortizes the dequant over all rows (17 µs vs 3.8 ms of matmul).
_STREAMING_MAX_M = 1024

# w8a8 mode: dynamically quantize activations per-row to int8 and run the
# matmul on the int8 MXU path (227 TOPS measured on v5e vs 170 TF/s bf16).
# Off by default — the reference ships bits=16 and weight-only int8 is
# near-lossless, while per-token activation int8 is a small, documented
# quality trade (LLM.int8-class, minus bnb's outlier decomposition).
# Gradients use a straight-through estimator: the backward pass is the
# same dequantized-bf16 path as weight-only int8.
_ACT_QUANT = False


def set_act_quant(enabled: bool) -> None:
    """Toggle w8a8.  Read at trace time — set it BEFORE jitting the
    functions that should use it (already-compiled programs keep the mode
    they were traced with)."""
    global _ACT_QUANT
    _ACT_QUANT = bool(enabled)


def get_act_quant() -> bool:
    return _ACT_QUANT


def _w8a8_2d(x2: jax.Array, q: jax.Array, scale: jax.Array) -> jax.Array:
    """x [M, K] float @ int8 weight on the int8 MXU: per-row dynamic
    activation quantization, int32 accumulation, f32 scale epilogue."""
    ax = jnp.max(jnp.abs(x2.astype(jnp.float32)), axis=1, keepdims=True)
    ax = jnp.maximum(ax, 1e-8)
    xq = jnp.clip(jnp.round(x2.astype(jnp.float32) * (127.0 / ax)),
                  -127, 127).astype(jnp.int8)
    acc = jax.lax.dot_general(xq, q, (((1,), (0,)), ((), ())),
                              preferred_element_type=jnp.int32)
    y = acc.astype(jnp.float32) * (ax / 127.0) * scale.reshape(1, -1)
    return y.astype(x2.dtype)


def _q8_dense_2d(x2: jax.Array, q: jax.Array, scale: jax.Array) -> jax.Array:
    wq = {"q": q, "scale": scale}
    if jax.default_backend() == "tpu":
        if x2.shape[0] > _STREAMING_MAX_M:
            if _ACT_QUANT:
                return _w8a8_2d(x2, q, scale)
            w = dequantize_weight(wq, dtype=jnp.bfloat16)
            return jnp.einsum("mk,kn->mn", x2, w,
                              preferred_element_type=jnp.float32
                              ).astype(x2.dtype)
        return quant_matmul(x2, wq)
    if _ACT_QUANT and x2.shape[0] > _STREAMING_MAX_M:
        return _w8a8_2d(x2, q, scale)
    return jnp.einsum("mk,kn->mn", x2.astype(jnp.float32),
                      q.astype(jnp.float32) * scale,
                      preferred_element_type=jnp.float32).astype(x2.dtype)


@jax.custom_vjp
def _q8_dense_vjp(x2, q, scale):
    return _q8_dense_2d(x2, q, scale)


def _q8_dense_fwd(x2, q, scale):
    return _q8_dense_2d(x2, q, scale), (q, scale)


def _q8_dense_bwd(res, g):
    """Gradient flows THROUGH the frozen int8 weight (QLoRA training:
    upstream LoRA layers need dx); the weight itself gets a float0/zero
    cotangent — it is never trained."""
    q, scale = res
    if jax.default_backend() == "tpu":
        if g.shape[0] > _STREAMING_MAX_M:
            w = dequantize_weight({"q": q, "scale": scale},
                                  dtype=jnp.bfloat16)
            dx = jnp.einsum("mn,kn->mk", g.astype(jnp.bfloat16), w,
                            preferred_element_type=jnp.float32
                            ).astype(g.dtype)
        else:
            dx = quant_matmul_transposed(g, {"q": q, "scale": scale})
    else:
        w = q.astype(jnp.float32) * scale
        dx = jnp.einsum("mn,kn->mk", g.astype(jnp.float32), w
                        ).astype(g.dtype)
    import numpy as _np
    dq = _np.zeros(q.shape, dtype=jax.dtypes.float0)
    return dx, dq, jnp.zeros_like(scale)


_q8_dense_vjp.defvjp(_q8_dense_fwd, _q8_dense_bwd)


def q8_dense(x: jax.Array, wq: dict) -> jax.Array:
    """[..., in] @ quantized [in, out], any leading dims, differentiable
    w.r.t. x (frozen weight).

    Small-M inputs (decode: M = batch) are padded up to the 8-sublane
    minimum — int8 weight streaming halves HBM traffic, which is the
    whole cost of bandwidth-bound decode."""
    lead = x.shape[:-1]
    k = x.shape[-1]
    x2 = x.reshape(-1, k)
    y = _q8_dense_vjp(x2, wq["q"], wq["scale"])
    return y.reshape(*lead, -1)


# ---------------------------------------------------------------------------
# pytree quantization (reference get_accelerate_model bits=8 equivalent)
# ---------------------------------------------------------------------------

# skip list mirrors the reference's llm_int8_skip_modules + norms/embeds
_SKIP_SUBSTRINGS = ("norm", "embed", "lm_head", "pos_embed", "class_embed",
                    "projector", "b1", "b2", "bq", "bk", "bv", "bo",
                    "b_fc1", "b_fc2", "ln1", "ln2", "scale", "bias")


def _should_quantize(path_str: str, leaf) -> bool:
    if getattr(leaf, "ndim", 0) < 2:
        return False
    name = path_str.rsplit("/", 1)[-1]
    return not any(s in name or s in path_str.split("/")[0]
                   for s in _SKIP_SUBSTRINGS)


def quantize_params(params: Any) -> Any:
    """Replace eligible weights with {"q", "scale"} dicts (llama decoder
    linears; vision tower linears).  Projector / lm_head / norms /
    embeddings stay bf16 (reference skip list)."""

    def walk(node, path):
        if isinstance(node, dict):
            return {k: walk(v, path + [k]) for k, v in node.items()}
        path_str = "/".join(path)
        if _should_quantize(path_str, node):
            return quantize_weight(node)
        return node

    return walk(params, [])


def quantized_bytes(params: Any) -> int:
    total = 0
    for leaf in jax.tree_util.tree_leaves(params):
        total += leaf.size * leaf.dtype.itemsize
    return total
