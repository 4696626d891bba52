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
from typing import Any, Optional, Tuple

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


def _pick_block_n(n: int, block_n: int) -> int:
    """Prefer a lane-aligned block_n that DIVIDES n: the jnp.pad of the
    weight operand is not hoisted out of decode while-loops (profiled at
    ~90 us/step on the int4 lm_head, N=32000 → 32256), so an aligned
    no-pad launch beats the nominally better tile."""
    if n % block_n == 0:
        return block_n
    for cand in (640, 768, 384, 256, 128):
        if n % cand == 0:
            return cand
    return block_n


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
    block_n = _pick_block_n(n, block_n)
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
# quality trade.  Gradients use a straight-through estimator: the backward
# pass is the same dequantized-bf16 path as weight-only int8.
#
# Outlier decomposition (LLM.int8): emergent-feature columns with large
# activations dominate the per-token amax and crush the int8 resolution of
# every other column.  bnb splits columns by a magnitude THRESHOLD, which
# gives dynamic shapes; the TPU-native form keeps a STATIC top-k — the k
# largest-amplitude feature columns (per matmul call, via lax.top_k on the
# column amax) run as a tiny bf16 [M, k] @ [k, N] side matmul, and are
# zeroed out of the int8 base quantization.  k=0 disables it.
_ACT_QUANT = False
_ACT_OUTLIER_COLS = 0
_ACT_BWD_INT8 = False


def set_act_quant(enabled: bool, outlier_cols: int = None,
                  bwd_int8: bool = None) -> None:
    """Toggle w8a8 (and optionally the outlier-column count).  Read at
    trace time — set it BEFORE jitting the functions that should use it
    (already-compiled programs keep the mode they were traced with).

    ``bwd_int8`` additionally runs the dx backward of the frozen int8
    base on the int8 MXU (per-token int8 gradient quantization with the
    weight's per-column scale folded into the gradient BEFORE
    quantization — the scale rides the contraction axis in the
    transposed dot, so it cannot be applied after).  Removes the bf16
    weight dematerialization pass the dequant-einsum backward pays.
    Config key: ``act_bwd_int8``; quality measured by
    scripts/bench_quality.py (mode ``w8a8_bwd8``)."""
    global _ACT_QUANT, _ACT_OUTLIER_COLS, _ACT_BWD_INT8
    _ACT_QUANT = bool(enabled)
    if outlier_cols is not None:
        assert outlier_cols >= 0, outlier_cols
        _ACT_OUTLIER_COLS = int(outlier_cols)
    if bwd_int8 is not None:
        _ACT_BWD_INT8 = bool(bwd_int8)


def get_act_quant() -> bool:
    return _ACT_QUANT


def get_act_outlier_cols() -> int:
    return _ACT_OUTLIER_COLS


def get_act_bwd_int8() -> bool:
    return _ACT_BWD_INT8


def _rows(x: jax.Array) -> int:
    n = 1
    for d in x.shape[:-1]:
        n *= d
    return n


def _w8a8_nd(x: jax.Array, q: jax.Array, scale: jax.Array) -> jax.Array:
    """x [..., K] float @ int8 weight on the int8 MXU: per-token dynamic
    activation quantization, int32 accumulation, f32 scale epilogue.

    Keeps the leading dims intact — an explicit [N,S,K]→[M,K] reshape is a
    physical tiled-layout copy on TPU (profiled at ~25% of decoder time at
    B=4, the round-2 batch-scaling regression); dot_general contracts the
    last axis natively.

    With ``_ACT_OUTLIER_COLS > 0`` the top-k amplitude feature columns are
    carried in bf16 through a side matmul and excluded from the int8 base
    (static-shape LLM.int8 outlier decomposition — see set_act_quant)."""
    nd = x.ndim
    x32 = x.astype(jnp.float32)
    k_out = _ACT_OUTLIER_COLS
    y_out = None
    if k_out > 0:
        # select outlier columns via a [K, k] one-hot matrix and MXU dots:
        # a take_along_axis gather on the minor dim costs ~1.8 ms per
        # matmul on TPU (profiled — 4x slower than the matmul itself)
        col_amax = jnp.max(jnp.abs(x32), axis=tuple(range(nd - 1)))  # [K]
        _, idx = jax.lax.top_k(col_amax, k_out)
        sel = jnp.zeros((x.shape[-1], k_out), jnp.bfloat16).at[
            idx, jnp.arange(k_out)].set(1.0)
        x_o = jax.lax.dot_general(
            x.astype(jnp.bfloat16), sel, (((nd - 1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)                      # [.., k]
        w_o = (jnp.take(q, idx, axis=0).astype(jnp.float32)
               * scale.reshape(1, -1))                               # [k, N]
        y_out = jax.lax.dot_general(
            x_o.astype(jnp.bfloat16), w_o.astype(jnp.bfloat16),
            (((nd - 1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32).astype(x.dtype)
        keep = 1.0 - jnp.sum(sel, axis=1).astype(jnp.float32)        # [K]
        x32 = x32 * keep
    ax = jnp.max(jnp.abs(x32), axis=-1, keepdims=True)
    ax = jnp.maximum(ax, 1e-8)
    xq = jnp.clip(jnp.round(x32 * (127.0 / ax)), -127, 127).astype(jnp.int8)
    acc = jax.lax.dot_general(xq, q, (((nd - 1,), (0,)), ((), ())),
                              preferred_element_type=jnp.int32)
    y = (acc.astype(jnp.float32) * (ax / 127.0) * scale.reshape(
        (1,) * (nd - 1) + (-1,))).astype(x.dtype)
    if y_out is not None:
        y = y + y_out
    return y


def _deq_einsum(x: jax.Array, w: jax.Array) -> jax.Array:
    nd = x.ndim
    return jax.lax.dot_general(
        x, w, (((nd - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32).astype(x.dtype)


def _q8_dense_nd(x: jax.Array, q: jax.Array, scale: jax.Array) -> jax.Array:
    wq = {"q": q, "scale": scale}
    m = _rows(x)
    if jax.default_backend() == "tpu":
        if m > _STREAMING_MAX_M:
            if _ACT_QUANT:
                return _w8a8_nd(x, q, scale)
            return _deq_einsum(x, dequantize_weight(wq, dtype=jnp.bfloat16))
        y2 = quant_matmul(x.reshape(m, x.shape[-1]), wq)
        return y2.reshape(*x.shape[:-1], -1)
    if _ACT_QUANT and m > _STREAMING_MAX_M:
        return _w8a8_nd(x, q, scale)
    return _deq_einsum(x.astype(jnp.float32),
                       q.astype(jnp.float32) * scale).astype(x.dtype)


@jax.custom_vjp
def _q8_dense_vjp(x, q, scale):
    return _q8_dense_nd(x, q, scale)


def _q8_dense_fwd(x, q, scale):
    return _q8_dense_nd(x, q, scale), (q, scale)


def _q8_dense_bwd(res, g):
    """Gradient flows THROUGH the frozen int8 weight (QLoRA training:
    upstream LoRA layers need dx); the weight itself gets a float0/zero
    cotangent — it is never trained."""
    q, scale = res
    m = _rows(g)
    nd = g.ndim

    def int8_dx():
        # int8-MXU dx: the weight scale is per OUTPUT column — the
        # contraction axis of gᵀW — so fold it into g first, then
        # per-token-quantize the scaled gradient
        gs = (g.astype(jnp.float32)
              * scale.reshape((1,) * (nd - 1) + (-1,)))
        ax = jnp.maximum(
            jnp.max(jnp.abs(gs), axis=-1, keepdims=True), 1e-20)
        gq = jnp.clip(jnp.round(gs * (127.0 / ax)),
                      -127, 127).astype(jnp.int8)
        acc = jax.lax.dot_general(
            gq, q, (((nd - 1,), (1,)), ((), ())),
            preferred_element_type=jnp.int32)
        return (acc.astype(jnp.float32) * (ax / 127.0)).astype(g.dtype)

    use_bwd8 = _ACT_QUANT and _ACT_BWD_INT8 and m > _STREAMING_MAX_M
    if jax.default_backend() == "tpu":
        if m > _STREAMING_MAX_M:
            if use_bwd8:
                dx = int8_dx()
            else:
                w = dequantize_weight({"q": q, "scale": scale},
                                      dtype=jnp.bfloat16)
                dx = jax.lax.dot_general(
                    g.astype(jnp.bfloat16), w,
                    (((nd - 1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32).astype(g.dtype)
        else:
            dx2 = quant_matmul_transposed(g.reshape(m, g.shape[-1]),
                                          {"q": q, "scale": scale})
            dx = dx2.reshape(*g.shape[:-1], -1)
    elif use_bwd8:
        dx = int8_dx()
    else:
        w = q.astype(jnp.float32) * scale
        dx = jax.lax.dot_general(
            g.astype(jnp.float32), w, (((nd - 1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32).astype(g.dtype)
    import numpy as _np
    dq = _np.zeros(q.shape, dtype=jax.dtypes.float0)
    return dx, dq, jnp.zeros_like(scale)


_q8_dense_vjp.defvjp(_q8_dense_fwd, _q8_dense_bwd)


def q8_dense(x: jax.Array, wq: dict) -> jax.Array:
    """[..., in] @ quantized [in, out], any leading dims, differentiable
    w.r.t. x (frozen weight).

    Large-M inputs keep their leading dims end-to-end (no reshape copies);
    small-M inputs (decode: M = batch) go through the Pallas streaming
    kernel — int8 weight streaming halves HBM traffic, which is the whole
    cost of bandwidth-bound decode."""
    return _q8_dense_vjp(x, wq["q"], wq["scale"])


# ---------------------------------------------------------------------------
# Int4: group-wise symmetric 4-bit weights (reference bits=4 / bnb NF4 path,
# qlora_model.py:151-160).  TPU-native design instead of a CUDA codebook:
# per-group (along the contraction dim, default 128 rows) symmetric int4
# with an f32 scale — the standard GPTQ/AWQ-style layout that the MXU can
# consume after a cheap in-VMEM unpack, quality-comparable to NF4 at
# group 128 without a 16-entry codebook gather (which the VPU has no fast
# primitive for).  Memory: 7B base 14 GB bf16 → 3.6 GB (+0.5% scales).
#
# Packing layout (group-local half-split): within each group of g rows,
# byte r holds row r in its LOW nibble and row r+g/2 in its HIGH nibble:
#     packed = hi*16 + (lo & 0xF)  ∈ [-128, 127]  (exactly int8)
# so the kernel reconstructs a [g, bn] slab with two shifts and ONE
# sublane-axis concat — no per-element interleave, which Mosaic lowers
# poorly.  The group size is implicit: g = K / scale.shape[-2].
# ---------------------------------------------------------------------------


def is_quantized4(w: Any) -> bool:
    return isinstance(w, dict) and "q4" in w


def quantize_weight_int4(w: jax.Array, group: int = 128) -> dict:
    """[.., K, N] → {"q4": int8 [.., K/2, N], "scale": f32 [.., K/g, N]}."""
    k, n = w.shape[-2], w.shape[-1]
    assert k % group == 0 and group % 2 == 0, (w.shape, group)
    lead = w.shape[:-2]
    g2 = group // 2
    w32 = w.astype(jnp.float32).reshape(*lead, k // group, group, n)
    absmax = jnp.max(jnp.abs(w32), axis=-2, keepdims=True)   # [.., G, 1, N]
    scale = jnp.where(absmax == 0, 1.0, absmax / 7.0)
    q = jnp.clip(jnp.round(w32 / scale), -8, 7).astype(jnp.int32)
    lo = q[..., :g2, :]
    hi = q[..., g2:, :]
    packed = (hi * 16 + (lo & 0xF)).astype(jnp.int8)
    return {
        "q4": packed.reshape(*lead, k // 2, n),
        "scale": scale[..., 0, :].astype(jnp.float32),        # [.., G, N]
    }


def _unpack_nibbles(p32: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """int32 packed bytes → (lo, hi) int32 nibble values in [-8, 7]."""
    hi = p32 >> 4                       # arithmetic: floor((hi*16+lo4)/16)=hi
    lo = ((p32 & 0xF) ^ 8) - 8          # sign-extend the low nibble
    return lo, hi


def dequantize_weight4(wq: dict, dtype=jnp.bfloat16) -> jax.Array:
    packed, scale = wq["q4"], wq["scale"]
    kp, n = packed.shape[-2], packed.shape[-1]
    lead = packed.shape[:-2]
    ngroups = scale.shape[-2]
    k = 2 * kp
    g = k // ngroups
    p32 = packed.reshape(*lead, ngroups, g // 2, n).astype(jnp.int32)
    lo, hi = _unpack_nibbles(p32)
    q = jnp.concatenate([lo, hi], axis=-2).astype(jnp.float32)  # [.., G, g, N]
    w = q * scale[..., :, None, :]
    return w.reshape(*lead, k, n).astype(dtype)


def _q4_matmul_kernel(x_ref, q_ref, s_ref, o_ref, acc_scr, *, nk, bk, g):
    kk = pl.program_id(2)

    @pl.when(kk == 0)
    def _():
        acc_scr[:] = jnp.zeros_like(acc_scr)

    x_blk = x_ref[0]                          # [bm, bk] bf16
    packed = q_ref[0]                         # [bk/2, bn] int8
    scales = s_ref[0]                         # [bk/g, bn] f32
    g2 = g // 2
    for gi in range(bk // g):
        # int32 unpack: Mosaic cannot legalize int8 vector shifts
        # (arith.shli on vector<..x4xi8>), so nibbles are extracted in
        # 32-bit lanes; shift-pair sign-extend is the cheapest legal form
        p32 = packed[gi * g2:(gi + 1) * g2, :].astype(jnp.int32)
        lo = jnp.right_shift(jnp.left_shift(p32, 28), 28)
        hi = jnp.right_shift(p32, 4)
        slab = jnp.concatenate([lo, hi], axis=0).astype(jnp.bfloat16)
        partial = jax.lax.dot_general(
            x_blk[:, gi * g:(gi + 1) * g], slab, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        acc_scr[:] += partial * scales[gi, :][None, :]

    @pl.when(kk == nk - 1)
    def _():
        o_ref[0] = acc_scr[:].astype(o_ref.dtype)


def quant_matmul4(
    x: jax.Array,        # [M, K] bf16/f32
    wq: dict,            # {"q4": [K/2, N] int8, "scale": [K/g, N] f32}
    block_m: int = 256,
    block_n: int = 512,
    block_k: Optional[int] = None,
    out_dtype=None,
) -> jax.Array:
    """x @ dequant4(wq): packed int4 streamed HBM→VMEM (half the int8
    kernel's weight traffic — decode is weight-bandwidth-bound), unpacked
    and dequantized per group in VMEM, bf16 MXU dots of depth g."""
    q, scale = wq["q4"], wq["scale"]
    m, k = x.shape
    kp2, n = q.shape
    assert k == 2 * kp2, (x.shape, q.shape)
    ngroups = scale.shape[0]
    g = k // ngroups
    out_dtype = out_dtype or x.dtype
    block_n = _pick_block_n(n, block_n)
    if block_k is None:
        # budget the packed block ([bk/2, bn] int8) like the int8 kernel
        bk_cap = max(g, (2 * 3 * 1024 * 1024 // block_n) // g * g)
        if k <= bk_cap:
            block_k = k
        else:
            nk = _cdiv(k, bk_cap)
            block_k = _round_up(_cdiv(k, nk), g)
            # Mosaic tiling rule: the scale block's second-to-last dim is
            # block_k//g, which must be a multiple of 8 or span the whole
            # group axis — 13B's down-proj (K=13824 → bk 6912, 54 groups)
            # lowered fine in interpret mode and failed on the chip.
            # Grow to the next K-divisor with 8-aligned groups; K itself
            # always qualifies (whole-axis block).
            while block_k < k and (k % block_k or (block_k // g) % 8):
                block_k += g
    assert block_k % g == 0 and k % block_k == 0, (k, block_k, g)
    assert (block_k // g) % 8 == 0 or block_k == k, (k, block_k, g)

    mp = _round_up(m, 8)
    np_ = _round_up(n, block_n)
    bm = min(block_m, mp)
    # The divisor + 8-aligned-group rule above can force block_k to the
    # WHOLE K (13B down-proj: K=13824 has no aligned proper divisor), so
    # the [bm, block_k] bf16 x-block must shrink instead: bm=256 at
    # K=13824 hit a 21 MB scoped-vmem OOM on hardware (16 MB limit) when
    # the shared-prefix stream's M=704 first took this kernel at 13B.
    bm_cap = max(8, (2_500_000 // (2 * block_k)) // 8 * 8)
    bm = min(bm, bm_cap)

    xp = jnp.pad(x, ((0, mp - m), (0, 0)))[None]
    qp = jnp.pad(q, ((0, 0), (0, np_ - n)))[None]
    sp = jnp.pad(scale, ((0, 0), (0, np_ - n)))[None]

    nk = k // block_k
    grid = (_cdiv(mp, bm), np_ // block_n, nk)
    out = pl.pallas_call(
        functools.partial(_q4_matmul_kernel, nk=nk, bk=block_k, g=g),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, bm, block_k), lambda i, j, kk: (0, i, kk),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_k // 2, block_n),
                         lambda i, j, kk: (0, kk, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_k // g, block_n),
                         lambda i, j, kk: (0, kk, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, bm, block_n), lambda i, j, kk: (0, i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1, mp, np_), out_dtype),
        scratch_shapes=[pltpu.VMEM((bm, block_n), jnp.float32)],
        interpret=jax.default_backend() != "tpu",
    )(xp, qp, sp)
    return out[0, :m, :n]


def _q4_dense_nd(x: jax.Array, q4: jax.Array, scale: jax.Array) -> jax.Array:
    wq = {"q4": q4, "scale": scale}
    m = _rows(x)
    if jax.default_backend() == "tpu":
        if m > _STREAMING_MAX_M:
            # MXU-bound: dequantize once, plain bf16 matmul keeping the
            # leading dims (same rationale as the int8 large-M path; w4a8
            # int8-MXU would need per-group dots, not worth it here)
            return _deq_einsum(x, dequantize_weight4(wq, dtype=jnp.bfloat16))
        y2 = quant_matmul4(x.reshape(m, x.shape[-1]), wq)
        return y2.reshape(*x.shape[:-1], -1)
    return _deq_einsum(x.astype(jnp.float32),
                       dequantize_weight4(wq, dtype=jnp.float32)
                       ).astype(x.dtype)


@jax.custom_vjp
def _q4_dense_vjp(x, q4, scale):
    return _q4_dense_nd(x, q4, scale)


def _q4_dense_fwd(x, q4, scale):
    return _q4_dense_nd(x, q4, scale), (q4, scale)


def _q4_dense_bwd(res, grad):
    """dx through the frozen int4 weight (QLoRA: upstream adapters need
    dx); weight/scale get float0/zero cotangents."""
    q4, scale = res
    wq = {"q4": q4, "scale": scale}
    dt = jnp.bfloat16 if jax.default_backend() == "tpu" else jnp.float32
    w = dequantize_weight4(wq, dtype=dt)
    nd = grad.ndim
    dx = jax.lax.dot_general(
        grad.astype(dt), w, (((nd - 1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32).astype(grad.dtype)
    import numpy as _np
    dq = _np.zeros(q4.shape, dtype=jax.dtypes.float0)
    return dx, dq, jnp.zeros_like(scale)


_q4_dense_vjp.defvjp(_q4_dense_fwd, _q4_dense_bwd)


def q4_dense(x: jax.Array, wq: dict) -> jax.Array:
    """[..., in] @ int4-quantized [in, out]; differentiable w.r.t. x."""
    return _q4_dense_vjp(x, wq["q4"], wq["scale"])


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


def quantize_params(params: Any, bits: int = 8, group: int = 128) -> Any:
    """Replace eligible weights with quantized dicts (llama decoder
    linears; vision tower linears).  Projector / lm_head / norms /
    embeddings stay bf16 (reference skip list).

    bits=8 → {"q", "scale"} per-channel int8; bits=4 → {"q4", "scale"}
    group-wise int4 (reference bnb 4-bit, qlora_model.py:151-160; weights
    whose contraction dim is not a multiple of ``group`` fall back to
    int8)."""
    assert bits in (4, 8), bits

    def quant_one(leaf):
        if bits == 4 and leaf.shape[-2] % group == 0:
            return quantize_weight_int4(leaf, group=group)
        return quantize_weight(leaf)

    def walk(node, path):
        if isinstance(node, dict):
            return {k: walk(v, path + [k]) for k, v in node.items()}
        path_str = "/".join(path)
        if _should_quantize(path_str, node):
            return quant_one(node)
        return node

    return walk(params, [])


def quantized_bytes(params: Any) -> int:
    total = 0
    for leaf in jax.tree_util.tree_leaves(params):
        total += leaf.size * leaf.dtype.itemsize
    return total
