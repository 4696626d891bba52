"""Attention ops: XLA reference + Pallas TPU flash attention (fwd/bwd).

Replaces flash-attn 2.5.3 CUDA kernels (reference ``environment.yaml``,
``qlora_model.py:135,147``) with a TPU-native design:

- ``multi_head_attention`` is the single public entry point used by both
  the CLIP tower (bidirectional) and the LLaMA decoder (causal).
- The mask model is exactly what OPA-DPO needs (SURVEY §5 long-context
  note): a per-row *key validity* mask ``[B, S]`` combined with an optional
  causal constraint.  Padding masks and the CoPO image-patch attention mask
  (reference ``dpo_trainer.py:307-323``) are both expressed as key masks of
  the full spliced sequence, so one kernel serves training, CoPO, and any
  future sequence sharding.

Kernel structure (tuned for OPA-DPO's seq lengths, ≤ ~2k):
grid = (batch, heads, q-blocks); K/V for the whole (b, h) row live in VMEM
(re-used across q-blocks because their index map ignores the q index), and
an in-kernel ``fori_loop`` with a *dynamic causal bound* walks KV blocks —
so causal sparsity is actually skipped, and the grid stays small enough
that per-step overhead doesn't dominate (a (B,H,Sq/128,Sk/128) grid was
measured ~25x slower on v5e than this layout).  Online softmax in f32,
logsumexp saved for the backward; backward = separate dq and dk/dv kernels
with the same structure.

Fully-masked rows degrade to a uniform distribution over keys instead of
NaN (pad queries are ignored by every downstream loss).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG_INF = -1e30

# Global default attention implementation consulted by impl="auto".
# GSPMD cannot partition a pallas_call across a sharded head axis; under
# tensor parallelism the runtime registers the mesh here (set_tp_mesh) and
# the flash kernel runs inside a shard_map — heads are fully local under
# head-sharding, so the mapped kernel needs no cross-device communication.
_DEFAULT_IMPL = "auto"
_TP_MESH = None
# Fused rope+layout prologue/epilogue kernels around the flash kernel
# (flash_attention_fused).  On by default for eligible TPU shapes; the
# toggle exists so configs can fall back to the unfused path.
_FUSED_QKV = True


def set_fused_attention(enabled: bool) -> None:
    global _FUSED_QKV
    _FUSED_QKV = bool(enabled)


def get_fused_attention() -> bool:
    return _FUSED_QKV


def set_default_impl(impl: str) -> None:
    global _DEFAULT_IMPL
    assert impl in ("auto", "flash", "xla"), impl
    _DEFAULT_IMPL = impl


def get_default_impl() -> str:
    return _DEFAULT_IMPL


def set_tp_mesh(mesh) -> None:
    """Register (or clear, with None) the mesh used to shard_map the flash
    kernel when the model axis is >1 (replaces round 1's blanket XLA
    fallback, runtime.py:103-107)."""
    global _TP_MESH
    _TP_MESH = mesh


def get_tp_mesh():
    return _TP_MESH


DEFAULT_BLOCK_Q = 512
DEFAULT_BLOCK_K = 512
# Above this padded length the full-KV-in-VMEM layout stops fitting; fall
# back to XLA (OPA-DPO never exceeds 2048 — reference model_max_length).
MAX_FLASH_SEQ = 4096


def _cdiv(a, b):
    return -(-a // b)


def _round_up(x, m):
    return _cdiv(x, m) * m


# ---------------------------------------------------------------------------
# XLA reference implementation (used on CPU tests and as numerics oracle)
# ---------------------------------------------------------------------------

def mha_reference(
    q: jax.Array,            # [B, Sq, H, D]
    k: jax.Array,            # [B, Sk, H, D]
    v: jax.Array,            # [B, Sk, H, D]
    key_mask: Optional[jax.Array] = None,   # [B, Sk] bool
    causal: bool = True,
    scale: Optional[float] = None,
) -> jax.Array:
    if scale is None:
        scale = q.shape[-1] ** -0.5
    logits = jnp.einsum(
        "bqhd,bkhd->bhqk", q, k, preferred_element_type=jnp.float32
    ) * scale
    sq, sk = q.shape[1], k.shape[1]
    mask = jnp.ones((sq, sk), dtype=bool)
    if causal:
        # offset supports decode where sq < sk (query aligned to the end)
        offset = sk - sq
        row = jax.lax.broadcasted_iota(jnp.int32, (sq, sk), 0)
        col = jax.lax.broadcasted_iota(jnp.int32, (sq, sk), 1)
        mask = col <= (row + offset)
    mask = mask[None, None]
    if key_mask is not None:
        mask = jnp.logical_and(mask, key_mask[:, None, None, :])
    logits = jnp.where(mask, logits, _NEG_INF)
    probs = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
    return jnp.einsum("bhqk,bkhd->bqhd", probs, v)


# ---------------------------------------------------------------------------
# Pallas flash attention — forward
# ---------------------------------------------------------------------------

def _scores(q, k_blk, kbias_blk, i, jj, scale, diag, bq, bk, offset=0):
    """Scaled scores for one (q-block, kv-block) tile, f32.

    The key validity mask arrives as an ADDITIVE f32 bias (0 or -1e30) — one
    VPU add instead of broadcast+and+select.  The causal iota mask is built
    only on DIAGONAL tiles (``diag=True``); interior tiles (col_max ≤
    row_min) skip all mask work, which roughly doubles kernel throughput
    (measured 10.3 → 18.9 TF/s at [3,1599,32,128] on v5e).

    ``offset`` (static) generalizes causality to rectangular layouts:
    query row r may attend key col c iff c <= r + offset.  offset=0 is
    square self-attention; the shared-prefix scoring forward uses
    offset = prefix length with KV = [prefix ++ response].
    """
    s = jax.lax.dot_general(
        q, k_blk, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) * scale                                  # [bq, bk]
    s = s + kbias_blk[None, :]
    if diag:
        row = jax.lax.broadcasted_iota(jnp.int32, s.shape, 0) + i * bq
        col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1) + jj * bk
        s = jnp.where(col <= row + offset, s, _NEG_INF)
    return s


def _causal_kv_bound(i, bq, bk, nkv, offset=0):
    """Number of kv blocks a causal q-block i needs (dynamic in i)."""
    return jnp.minimum(nkv, (i * bq + bq + offset + bk - 1) // bk)


def _causal_inner_bound(i, bq, bk, offset=0):
    """kv blocks fully inside the causal region for q-block i (no masking
    needed): block jj is interior iff jj*bk + bk - 1 <= i*bq + offset."""
    return (i * bq + offset + 1) // bk


def _fwd_kernel(kb_ref, q_ref, k_ref, v_ref, o_ref, lse_ref,
                *, causal, scale, bq, bk, nkv, offset=0):
    i = pl.program_id(2)
    q = q_ref[0, 0]                            # [bq, d]
    d = q.shape[-1]

    def step(jj, carry, diag):
        m_prev, l_prev, acc = carry
        k_blk = k_ref[0, 0, pl.ds(jj * bk, bk), :]
        v_blk = v_ref[0, 0, pl.ds(jj * bk, bk), :]
        kbias_blk = kb_ref[0, 0, pl.ds(jj * bk, bk)]
        s = _scores(q, k_blk, kbias_blk, i, jj, scale, diag, bq, bk, offset)
        m_cur = jnp.max(s, axis=-1, keepdims=True)
        m_new = jnp.maximum(m_prev, m_cur)
        alpha = jnp.exp(m_prev - m_new)
        p = jnp.exp(s - m_new)
        l_new = alpha * l_prev + jnp.sum(p, axis=-1, keepdims=True)
        acc_new = acc * alpha + jax.lax.dot_general(
            p.astype(v_blk.dtype), v_blk, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        return m_new, l_new, acc_new

    m0 = jnp.full((bq, 1), -jnp.inf, jnp.float32)
    l0 = jnp.zeros((bq, 1), jnp.float32)
    acc0 = jnp.zeros((bq, d), jnp.float32)
    carry = (m0, l0, acc0)
    if causal:
        bound = _causal_kv_bound(i, bq, bk, nkv, offset)
        inner = jnp.minimum(_causal_inner_bound(i, bq, bk, offset), bound)
        carry = jax.lax.fori_loop(
            0, inner, lambda jj, c: step(jj, c, diag=False), carry)
        carry = jax.lax.fori_loop(
            inner, bound, lambda jj, c: step(jj, c, diag=True), carry)
    else:
        carry = jax.lax.fori_loop(
            0, nkv, lambda jj, c: step(jj, c, diag=False), carry)
    m, l, acc = carry

    l_safe = jnp.where(l == 0.0, 1.0, l)
    o_ref[0, 0] = (acc / l_safe).astype(o_ref.dtype)
    lse = jnp.where(l == 0.0, _NEG_INF, m + jnp.log(l_safe))   # [bq, 1]
    lse_ref[0, 0] = jnp.broadcast_to(lse, (bq, 8))


def _flash_fwd(q, k, v, kbias, causal, scale, bq, bk, offset=0):
    """q: [B, H, Sq, D]; k,v: [B, H, Skv, D] padded; kbias: [B, 1, Skv] f32
    additive → (o, lse).  Sq == Skv with offset=0 is plain self-attention;
    Sq < Skv with a static ``offset`` is the shared-prefix layout (query
    row r sees key col c iff c <= r + offset)."""
    b, h, sq, d = q.shape
    skv = k.shape[2]
    grid = (b, h, sq // bq)
    kernel = functools.partial(
        _fwd_kernel, causal=causal, scale=scale, bq=bq, bk=bk,
        nkv=skv // bk, offset=offset,
    )
    o, lse = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 1, skv), lambda b_, h_, i: (b_, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, bq, d), lambda b_, h_, i: (b_, h_, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, skv, d), lambda b_, h_, i: (b_, h_, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, skv, d), lambda b_, h_, i: (b_, h_, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, 1, bq, d), lambda b_, h_, i: (b_, h_, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, bq, 8), lambda b_, h_, i: (b_, h_, i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, h, sq, d), q.dtype),
            jax.ShapeDtypeStruct((b, h, sq, 8), jnp.float32),
        ],
        interpret=_interpret_mode(),
    )(kbias, q, k, v)
    return o, lse


# ---------------------------------------------------------------------------
# Pallas flash attention — backward
# ---------------------------------------------------------------------------

def _dq_kernel(kb_ref, q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref,
               dq_ref, *, causal, scale, bq, bk, nkv, offset=0):
    i = pl.program_id(2)
    q = q_ref[0, 0]                            # [bq, d]
    do = do_ref[0, 0]
    lse = lse_ref[0, 0][:, 0:1]
    delta = delta_ref[0, 0][:, 0:1]
    d = q.shape[-1]

    def step(jj, dq_acc, diag):
        k_blk = k_ref[0, 0, pl.ds(jj * bk, bk), :]
        v_blk = v_ref[0, 0, pl.ds(jj * bk, bk), :]
        kbias_blk = kb_ref[0, 0, pl.ds(jj * bk, bk)]
        s = _scores(q, k_blk, kbias_blk, i, jj, scale, diag, bq, bk, offset)
        p = jnp.exp(s - lse)                   # [bq, bk]
        dp = jax.lax.dot_general(
            do, v_blk, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        ds = p * (dp - delta) * scale
        return dq_acc + jax.lax.dot_general(
            ds.astype(k_blk.dtype), k_blk, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    dq = jnp.zeros((bq, d), jnp.float32)
    if causal:
        bound = _causal_kv_bound(i, bq, bk, nkv, offset)
        inner = jnp.minimum(_causal_inner_bound(i, bq, bk, offset), bound)
        dq = jax.lax.fori_loop(
            0, inner, lambda jj, a: step(jj, a, diag=False), dq)
        dq = jax.lax.fori_loop(
            inner, bound, lambda jj, a: step(jj, a, diag=True), dq)
    else:
        dq = jax.lax.fori_loop(
            0, nkv, lambda jj, a: step(jj, a, diag=False), dq)
    dq_ref[0, 0] = dq.astype(dq_ref.dtype)


def _dkv_kernel(kb_ref, q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref,
                dk_ref, dv_ref, *, causal, scale, bq, bk, nq, offset=0):
    j = pl.program_id(2)                       # kv block index
    k_blk = k_ref[0, 0]                        # [bk, d]
    v_blk = v_ref[0, 0]
    kbias_blk = kb_ref[0, 0]
    d = k_blk.shape[-1]

    def step(ii, carry, diag):
        dk_acc, dv_acc = carry
        q = q_ref[0, 0, pl.ds(ii * bq, bq), :]
        do = do_ref[0, 0, pl.ds(ii * bq, bq), :]
        lse = lse_ref[0, 0, pl.ds(ii * bq, bq), 0:1]
        delta = delta_ref[0, 0, pl.ds(ii * bq, bq), 0:1]
        s = _scores(q, k_blk, kbias_blk, ii, j, scale, diag, bq, bk, offset)
        p = jnp.exp(s - lse)                   # [bq, bk]
        dv_new = dv_acc + jax.lax.dot_general(
            p.astype(do.dtype), do, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        dp = jax.lax.dot_general(
            do, v_blk, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        ds = p * (dp - delta) * scale
        dk_new = dk_acc + jax.lax.dot_general(
            ds.astype(q.dtype), q, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        return dk_new, dv_new

    dk0 = jnp.zeros((bk, d), jnp.float32)
    dv0 = jnp.zeros((bk, d), jnp.float32)
    carry = (dk0, dv0)
    if causal:
        # q blocks strictly before this kv block never attend to it; q
        # blocks whose rows all sit past the tile's last column need no
        # causal mask.  With a shared-prefix offset the visibility line is
        # col <= row + offset, shifting both bounds left by offset rows.
        start = jnp.maximum(0, j * bk - offset) // bq
        inner_start = jnp.maximum(
            start, ((j + 1) * bk - 1 - offset + bq - 1) // bq)
        carry = jax.lax.fori_loop(
            start, jnp.minimum(inner_start, nq),
            lambda ii, c: step(ii, c, diag=True), carry)
        carry = jax.lax.fori_loop(
            jnp.minimum(inner_start, nq), nq,
            lambda ii, c: step(ii, c, diag=False), carry)
    else:
        carry = jax.lax.fori_loop(
            0, nq, lambda ii, c: step(ii, c, diag=False), carry)
    dk, dv = carry
    dk_ref[0, 0] = dk.astype(dk_ref.dtype)
    dv_ref[0, 0] = dv.astype(dv_ref.dtype)


def _flash_bwd(q, k, v, kbias, o, lse, do, causal, scale, bq, bk, offset=0):
    b, h, sq, d = q.shape
    skv = k.shape[2]
    delta = jnp.sum(do.astype(jnp.float32) * o.astype(jnp.float32), axis=-1)
    delta = jnp.broadcast_to(delta[..., None], (*delta.shape, 8))

    dq = pl.pallas_call(
        functools.partial(_dq_kernel, causal=causal, scale=scale,
                          bq=bq, bk=bk, nkv=skv // bk, offset=offset),
        grid=(b, h, sq // bq),
        in_specs=[
            pl.BlockSpec((1, 1, skv), lambda b_, h_, i: (b_, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, bq, d), lambda b_, h_, i: (b_, h_, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, skv, d), lambda b_, h_, i: (b_, h_, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, skv, d), lambda b_, h_, i: (b_, h_, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, bq, d), lambda b_, h_, i: (b_, h_, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, bq, 8), lambda b_, h_, i: (b_, h_, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, bq, 8), lambda b_, h_, i: (b_, h_, i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, bq, d), lambda b_, h_, i: (b_, h_, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, h, sq, d), q.dtype),
        interpret=_interpret_mode(),
    )(kbias, q, k, v, do, lse, delta)

    dk, dv = pl.pallas_call(
        functools.partial(_dkv_kernel, causal=causal, scale=scale,
                          bq=bq, bk=bk, nq=sq // bq, offset=offset),
        grid=(b, h, skv // bk),
        in_specs=[
            pl.BlockSpec((1, 1, bk), lambda b_, h_, j: (b_, 0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, sq, d), lambda b_, h_, j: (b_, h_, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, bk, d), lambda b_, h_, j: (b_, h_, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, bk, d), lambda b_, h_, j: (b_, h_, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, sq, d), lambda b_, h_, j: (b_, h_, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, sq, 8), lambda b_, h_, j: (b_, h_, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, sq, 8), lambda b_, h_, j: (b_, h_, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, 1, bk, d), lambda b_, h_, j: (b_, h_, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, bk, d), lambda b_, h_, j: (b_, h_, j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, h, skv, d), k.dtype),
            jax.ShapeDtypeStruct((b, h, skv, d), v.dtype),
        ],
        interpret=_interpret_mode(),
    )(kbias, q, k, v, do, lse, delta)
    return dq, dk, dv


# ---------------------------------------------------------------------------
# custom_vjp wrapper over padded [B, H, S, D] tensors
# ---------------------------------------------------------------------------

@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7, 8))
def _flash_attention_padded(q, k, v, kbias, causal, scale, bq, bk, offset=0):
    o, _ = _flash_fwd(q, k, v, kbias, causal, scale, bq, bk, offset)
    return o


def _flash_attention_padded_fwd(q, k, v, kbias, causal, scale, bq, bk,
                                offset=0):
    o, lse = _flash_fwd(q, k, v, kbias, causal, scale, bq, bk, offset)
    return o, (q, k, v, kbias, o, lse)


def _flash_attention_padded_bwd(causal, scale, bq, bk, offset, res, do):
    q, k, v, kbias, o, lse = res
    dq, dk, dv = _flash_bwd(q, k, v, kbias, o, lse, do, causal, scale, bq, bk,
                            offset)
    return dq, dk, dv, None


_flash_attention_padded.defvjp(
    _flash_attention_padded_fwd, _flash_attention_padded_bwd
)


def _interpret_mode() -> bool:
    return jax.default_backend() != "tpu"


def flash_attention(
    q: jax.Array,            # [B, Sq, H, D]
    k: jax.Array,
    v: jax.Array,
    key_mask: Optional[jax.Array] = None,
    causal: bool = True,
    scale: Optional[float] = None,
    block_q: int = DEFAULT_BLOCK_Q,
    block_k: int = DEFAULT_BLOCK_K,
) -> jax.Array:
    """Pallas flash attention over [B, S, H, D] inputs (pads internally)."""
    b, s, h, d = q.shape
    if scale is None:
        scale = d ** -0.5
    if key_mask is None:
        key_mask = jnp.ones((b, s), dtype=jnp.int32)
    key_mask = key_mask.astype(jnp.int32)

    s_aligned = _round_up(s, 128)
    block_q = min(block_q, s_aligned)
    block_k = min(block_k, s_aligned)
    s_pad = _round_up(s, max(block_q, block_k))
    d_pad = _round_up(d, 128)

    def pad_to(x, target_s, target_d):
        return jnp.pad(
            x, ((0, 0), (0, target_s - x.shape[1]), (0, 0),
                (0, target_d - x.shape[3]))
        )

    qp = pad_to(q, s_pad, d_pad).transpose(0, 2, 1, 3)
    kp = pad_to(k, s_pad, d_pad).transpose(0, 2, 1, 3)
    vp = pad_to(v, s_pad, d_pad).transpose(0, 2, 1, 3)
    # key validity as an additive f32 bias (0 valid / -1e30 masked) — the
    # kernels add it instead of building boolean masks per tile
    kbias = jnp.where(
        jnp.pad(key_mask, ((0, 0), (0, s_pad - s))) != 0, 0.0, _NEG_INF
    ).astype(jnp.float32)[:, None, :]

    o = _flash_attention_padded(qp, kp, vp, kbias, causal, scale, block_q,
                                block_k)
    return o.transpose(0, 2, 1, 3)[:, :s, :, :d]


def flash_attention_prefix(
    q: jax.Array,            # [B, Sq, H, D]
    k: jax.Array,            # [B, Skv, H, D], Skv >= Sq
    v: jax.Array,
    key_mask: Optional[jax.Array] = None,   # [B, Skv]
    offset: Optional[int] = None,
    scale: Optional[float] = None,
    block_q: int = DEFAULT_BLOCK_Q,
    block_k: int = DEFAULT_BLOCK_K,
) -> jax.Array:
    """Rectangular causal flash attention: query row r attends key col c
    iff ``c <= r + offset`` (default ``offset = Skv - Sq``, i.e. queries
    aligned to the end of the keys — the shared-prefix scoring layout
    where KV = [prefix ++ response] and the queries are the response).
    Matches ``mha_reference(q, k, v, causal=True)`` at Sq < Skv.  Both
    lengths pad independently at the end (pad keys are bias-masked, pad
    query rows are sliced off), which keeps ``offset`` valid in padded
    coordinates."""
    b, sq, h, d = q.shape
    skv = k.shape[1]
    if offset is None:
        offset = skv - sq
    if scale is None:
        scale = d ** -0.5
    if key_mask is None:
        key_mask = jnp.ones((b, skv), dtype=jnp.int32)

    block_q = min(block_q, _round_up(sq, 128))
    block_k = min(block_k, _round_up(skv, 128))
    sq_pad = _round_up(sq, block_q)
    skv_pad = _round_up(skv, block_k)
    d_pad = _round_up(d, 128)

    def pad_to(x, target_s):
        return jnp.pad(
            x, ((0, 0), (0, target_s - x.shape[1]), (0, 0),
                (0, d_pad - x.shape[3]))
        )

    qp = pad_to(q, sq_pad).transpose(0, 2, 1, 3)
    kp = pad_to(k, skv_pad).transpose(0, 2, 1, 3)
    vp = pad_to(v, skv_pad).transpose(0, 2, 1, 3)
    kbias = jnp.where(
        jnp.pad(key_mask.astype(jnp.int32),
                ((0, 0), (0, skv_pad - skv))) != 0, 0.0, _NEG_INF
    ).astype(jnp.float32)[:, None, :]

    o = _flash_attention_padded(qp, kp, vp, kbias, True, scale, block_q,
                                block_k, offset)
    return o.transpose(0, 2, 1, 3)[:, :sq, :, :d]


# ---------------------------------------------------------------------------
# Fused layout kernels: projection output [B, S, H*hd] ⇄ kernel layout
# [B, H, S_pad, hd] with RoPE folded in.
#
# XLA fragments the q/k path (reshape → layout copy → rope+pad fusion)
# into ~3 full-tensor passes and keeps them f32 (profiled at ~15% of the
# 7B scoring forward).  These kernels do the whole prologue/epilogue as
# ONE read + ONE write each: the [bs, H*hd] row-block stays resident in
# VMEM across the innermost head grid dimension (index map ignores h),
# each head step lane-slices its 128 columns, applies the rotation in
# f32, and writes a contiguous [bs, hd] block of the [B, H, S_pad, hd]
# output.  The inverse kernel accumulates head lanes into a resident
# output row-block.  Rotation sign is reversed for the VJP (Rᵀ = R(−θ)).
# ---------------------------------------------------------------------------

_LAYOUT_BS = 256          # row-block: [256, 4096] f32 = 4 MB resident


def _rot_block(xh, cos_b, sin_b, hd, inverse):
    x32 = xh.astype(jnp.float32)
    half = hd // 2
    x1, x2 = x32[:, :half], x32[:, half:]
    if inverse:
        return jnp.concatenate(
            [x1 * cos_b + x2 * sin_b, x2 * cos_b - x1 * sin_b], axis=-1)
    return jnp.concatenate(
        [x1 * cos_b - x2 * sin_b, x2 * cos_b + x1 * sin_b], axis=-1)


def _scatter_heads_kernel(x_ref, cos_ref, sin_ref, o_ref, *, h, hd, s, bs,
                          rope, inverse, rep=1):
    i = pl.program_id(1)
    xb = x_ref[0]                                      # [bs, Hkv*hd]
    rows = jax.lax.broadcasted_iota(jnp.int32, (bs, 1), 0) + i * bs
    valid = rows < s
    cos_b = cos_ref[0] if rope else None
    sin_b = sin_ref[0] if rope else None
    for hh in range(h):                                # static lane slices
        # GQA: output head hh reads source kv head hh // rep (the fused
        # form of jnp.repeat(k, rep, axis=2) — no materialized repeat)
        src = hh // rep
        xh = jnp.where(valid, xb[:, src * hd:(src + 1) * hd], 0)
        if rope:
            out = _rot_block(xh, cos_b, sin_b, hd, inverse)
        else:
            out = xh.astype(jnp.float32)
        o_ref[0, hh] = out.astype(o_ref.dtype)


def _gather_heads_kernel(x_ref, cos_ref, sin_ref, o_ref, *, h, hd, bs,
                         rope, inverse, group=1):
    cos_b = cos_ref[0] if rope else None
    sin_b = sin_ref[0] if rope else None
    for j in range(h // group):
        # group>1 (GQA VJP): accumulate the `group` repeated heads' grads
        # back into their shared kv head lane slice
        acc = None
        for g in range(group):
            xh = x_ref[0, j * group + g]               # [bs, hd]
            if rope:
                out = _rot_block(xh, cos_b, sin_b, hd, inverse)
            else:
                out = xh.astype(jnp.float32)
            acc = out if acc is None else acc + out
        o_ref[0, :, j * hd:(j + 1) * hd] = acc.astype(o_ref.dtype)


def _scatter_heads_call(x, cos_g, sin_g, h, hd, s_pad, rope, inverse,
                        out_dtype=jnp.bfloat16, rep=1):
    """[B, S, Hkv*hd] → [B, H, S_pad, hd] (+rope), H = rep·Hkv.
    cos_g/sin_g: [B, S_pad, hd/2] f32 (ignored when rope=False).  One grid
    step per row-block handles ALL heads (static python loop + static lane
    slices — Mosaic has no dynamic lane indexing): one contiguous
    [bs, Hkv*hd] read, one [H, bs, hd] write.  rep>1 fuses the GQA
    KV-head repeat into the expansion."""
    b, s, d = x.shape
    bs = min(_LAYOUT_BS, s_pad)
    grid = (b, s_pad // bs)
    # the grid covers s_pad rows but x only has s: clamp the x block index
    # so no block starts past the array (fully out-of-bounds input DMAs
    # fault on hardware; the in-kernel `rows < s` mask discards whatever
    # the clamped tail blocks re-read)
    last_blk = (s - 1) // bs
    return pl.pallas_call(
        functools.partial(_scatter_heads_kernel, h=h, hd=hd, s=s, bs=bs,
                          rope=rope, inverse=inverse, rep=rep),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, bs, d),
                         lambda b_, i: (b_, jnp.minimum(i, last_blk), 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bs, hd // 2), lambda b_, i: (b_, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bs, hd // 2), lambda b_, i: (b_, i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, h, bs, hd), lambda b_, i: (b_, 0, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, h, s_pad, hd), out_dtype),
        interpret=_interpret_mode(),
    )(x, cos_g, sin_g)


def _gather_heads_call(x_t, cos_g, sin_g, rope, inverse, out_dtype,
                       group=1):
    """[B, H, S_pad, hd] → [B, S_pad, (H/group)*hd] (+rope per head slice).
    Stays padded — callers row-slice outside (cheap, layout-preserving).
    group>1 is the GQA VJP: each output kv-head lane accumulates its
    `group` repeated heads."""
    b, h, s_pad, hd = x_t.shape
    h_out = h // group
    bs = min(_LAYOUT_BS, s_pad)
    grid = (b, s_pad // bs)
    return pl.pallas_call(
        functools.partial(_gather_heads_kernel, h=h, hd=hd, bs=bs,
                          rope=rope, inverse=inverse, group=group),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, h, bs, hd), lambda b_, i: (b_, 0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bs, hd // 2), lambda b_, i: (b_, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bs, hd // 2), lambda b_, i: (b_, i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, bs, h_out * hd),
                               lambda b_, i: (b_, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, s_pad, h_out * hd), out_dtype),
        interpret=_interpret_mode(),
    )(x_t, cos_g, sin_g)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6, 7, 8))
def _to_heads(x, cos_g, sin_g, h, s_pad, rope, s_len, x_dt, rep=1):
    hd = x.shape[-1] // (h // rep)
    return _scatter_heads_call(x, cos_g, sin_g, h, hd, s_pad, rope,
                               inverse=False, rep=rep)


def _to_heads_fwd(x, cos_g, sin_g, h, s_pad, rope, s_len, x_dt, rep=1):
    return _to_heads(x, cos_g, sin_g, h, s_pad, rope, s_len, x_dt, rep), \
        (cos_g, sin_g)


def _to_heads_bwd(h, s_pad, rope, s_len, x_dt, rep, res, g):
    cos_g, sin_g = res
    dx_pad = _gather_heads_call(g, cos_g, sin_g, rope,
                                inverse=True, out_dtype=x_dt, group=rep)
    return dx_pad[:, :s_len, :], None, None


_to_heads.defvjp(_to_heads_fwd, _to_heads_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2, 3))
def _from_heads(x_t, out_dtype, in_dtype, h):
    b, _, s_pad, hd = x_t.shape
    dummy = jnp.zeros((b, s_pad, hd // 2), jnp.float32)
    return _gather_heads_call(x_t, dummy, dummy, rope=False,
                              inverse=False, out_dtype=out_dtype)


def _from_heads_fwd(x_t, out_dtype, in_dtype, h):
    return _from_heads(x_t, out_dtype, in_dtype, h), None


def _from_heads_bwd(out_dtype, in_dtype, h, res, g):
    b, s_pad, d = g.shape
    hd = d // h
    dummy = jnp.zeros((b, s_pad, hd // 2), jnp.float32)
    dx = _scatter_heads_call(g, dummy, dummy, h, hd, s_pad, rope=False,
                             inverse=False, out_dtype=in_dtype)
    return (dx,)


_from_heads.defvjp(_from_heads_fwd, _from_heads_bwd)


def flash_attention_fused(
    q2: jax.Array,           # [B, S, H*hd] projection output (+lora)
    k2: jax.Array,
    v2: jax.Array,
    cos_table: jax.Array,    # [max_len, hd]
    sin_table: jax.Array,
    positions: jax.Array,    # [B, S] int32
    num_heads: int,
    key_mask: Optional[jax.Array] = None,
    causal: bool = True,
    scale: Optional[float] = None,
    block_q: int = DEFAULT_BLOCK_Q,
    block_k: int = DEFAULT_BLOCK_K,
    num_kv_heads: Optional[int] = None,
) -> jax.Array:
    """Self-attention straight from projection outputs: fused Pallas
    prologue (RoPE + head-split + pad + transpose in one pass per tensor),
    flash kernel, fused epilogue.  Returns [B, S, H*hd] bf16-like q2.

    GQA (``num_kv_heads`` < ``num_heads``): k2/v2 are the smaller
    [B, S, Hkv*hd] projections; the prologue kernel expands each kv head
    to its ``H/Hkv`` query heads while head-splitting (no materialized
    ``jnp.repeat``), and its VJP accumulates the repeated heads' grads
    back into the shared lanes.

    Under tensor parallelism (a mesh registered via ``set_tp_mesh``) the
    whole pipeline runs inside a shard_map: the feature axis of the
    [B, S, H*hd] projection outputs is head-sharded along ``model``, so
    each shard applies the fused kernels to its local heads with no
    communication (callers must ensure H — and Hkv, for GQA — divide the
    model axis; see ``models/llama._use_fused_flash``)."""
    b, s, d = q2.shape
    if key_mask is None:
        key_mask = jnp.ones((b, s), jnp.int32)
    if num_kv_heads is None:
        num_kv_heads = num_heads
    if _TP_MESH is not None:
        return _flash_attention_fused_tp(
            q2, k2, v2, cos_table, sin_table, positions, num_heads,
            key_mask, causal, scale, block_q, block_k, _TP_MESH,
            num_kv_heads)
    return _flash_attention_fused_local(
        q2, k2, v2, cos_table, sin_table, positions, num_heads,
        key_mask, causal, scale, block_q, block_k, num_kv_heads)


def _flash_attention_fused_local(q2, k2, v2, cos_table, sin_table,
                                 positions, num_heads, key_mask, causal,
                                 scale, block_q, block_k,
                                 num_kv_heads=None):
    b, s, d = q2.shape
    hd = d // num_heads
    if num_kv_heads is None:
        num_kv_heads = num_heads
    rep = num_heads // num_kv_heads
    if scale is None:
        scale = hd ** -0.5
    s_pad = _round_up(s, max(block_q, block_k))

    half = hd // 2
    cos_g = jnp.pad(cos_table[positions][..., :half],
                    ((0, 0), (0, s_pad - s), (0, 0))).astype(jnp.float32)
    sin_g = jnp.pad(sin_table[positions][..., :half],
                    ((0, 0), (0, s_pad - s), (0, 0))).astype(jnp.float32)

    q_t = _to_heads(q2, cos_g, sin_g, num_heads, s_pad, True, s, q2.dtype)
    k_t = _to_heads(k2, cos_g, sin_g, num_heads, s_pad, True, s, k2.dtype,
                    rep)
    v_t = _to_heads(v2, cos_g, sin_g, num_heads, s_pad, False, s, v2.dtype,
                    rep)
    kbias = jnp.where(
        jnp.pad(key_mask.astype(jnp.int32), ((0, 0), (0, s_pad - s))) != 0,
        0.0, _NEG_INF).astype(jnp.float32)[:, None, :]

    o = _flash_attention_padded(q_t, k_t, v_t, kbias, causal, scale,
                                block_q, block_k)
    return _from_heads(o, jnp.bfloat16, q_t.dtype, num_heads)[:, :s, :]


def _flash_attention_fused_tp(q2, k2, v2, cos_table, sin_table, positions,
                              num_heads, key_mask, causal, scale,
                              block_q, block_k, mesh, num_kv_heads=None):
    """Fused prologue → flash → epilogue under tensor parallelism.

    The [B, S, H*hd] projection outputs are already GSPMD-sharded
    (data, ·, model) by the TP weight column sharding, and head-dim
    shards align to head boundaries when H %% model == 0 — so each shard
    runs the full fused pipeline on its ``H/model`` local heads with no
    collectives (out spec == in spec).  RoPE tables and positions are
    per-head-independent, so they pass through replicated / row-sharded."""
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    from opadpo_tpu.parallel.mesh import DATA_AXIS, MODEL_AXIS

    n_model = mesh.shape.get(MODEL_AXIS, 1)
    local_heads = num_heads // n_model
    local_kv = (num_kv_heads or num_heads) // n_model
    feat_spec = P(DATA_AXIS, None, MODEL_AXIS)
    row_spec = P(DATA_AXIS, None)
    fn = shard_map(
        lambda q_, k_, v_, cos_, sin_, pos_, m_: _flash_attention_fused_local(
            q_, k_, v_, cos_, sin_, pos_, local_heads, m_, causal, scale,
            block_q, block_k, local_kv),
        mesh=mesh,
        in_specs=(feat_spec, feat_spec, feat_spec, P(None, None),
                  P(None, None), row_spec, row_spec),
        out_specs=feat_spec,
        check_vma=False,
    )
    return fn(q2, k2, v2, cos_table, sin_table, positions, key_mask)


def flash_attention_fused_shared(
    qp2: jax.Array,          # [B, Sp, H*hd] prefix projections
    kp2: jax.Array,          # [B, Sp, Hkv*hd]
    vp2: jax.Array,
    qr2: jax.Array,          # [K*B, Sr, H*hd] response projections, B-MAJOR
    kr2: jax.Array,          #   (row b*K + t is response type t of example b)
    vr2: jax.Array,
    cos_table: jax.Array,
    sin_table: jax.Array,
    pos_p: jax.Array,        # [B, Sp] int32
    pos_r: jax.Array,        # [K*B, Sr] int32
    num_heads: int,
    mask_p: jax.Array,       # [B, Sp]
    mask_r: jax.Array,       # [K*B, Sr]
    scale: Optional[float] = None,
    block_q: int = DEFAULT_BLOCK_Q,
    block_k: int = DEFAULT_BLOCK_K,
    num_kv_heads: Optional[int] = None,
) -> tuple:
    """Shared-prefix attention from projection outputs (see
    ``flash_attention_fused`` for the fused prologue/epilogue design).

    One prefix stream of B rows and one response stream of K·B rows that
    all attend to their example's prefix KV: the prefix runs square causal
    flash ONCE per example, the responses run the rectangular
    offset-causal kernel over KV = [prefix ++ response].  Responses must
    be stacked B-major (row = b·K + t) so the per-row ``jnp.repeat`` of
    the prefix KV lines up — and so data-axis sharding under TP keeps each
    shard's prefix and response rows on the same device.

    Returns ``(op2 [B, Sp, H*hd], or2 [K*B, Sr, H*hd])``.
    """
    if num_kv_heads is None:
        num_kv_heads = num_heads
    if _TP_MESH is not None:
        return _flash_attention_fused_shared_tp(
            qp2, kp2, vp2, qr2, kr2, vr2, cos_table, sin_table, pos_p,
            pos_r, num_heads, mask_p, mask_r, scale, block_q, block_k,
            _TP_MESH, num_kv_heads)
    return _flash_attention_fused_shared_local(
        qp2, kp2, vp2, qr2, kr2, vr2, cos_table, sin_table, pos_p, pos_r,
        num_heads, mask_p, mask_r, scale, block_q, block_k, num_kv_heads)


def _flash_attention_fused_shared_local(qp2, kp2, vp2, qr2, kr2, vr2,
                                        cos_table, sin_table, pos_p, pos_r,
                                        num_heads, mask_p, mask_r, scale,
                                        block_q, block_k, num_kv_heads):
    b, sp, d = qp2.shape
    kb, sr, _ = qr2.shape
    kk = kb // b
    hd = d // num_heads
    rep = num_heads // num_kv_heads
    if scale is None:
        scale = hd ** -0.5
    # one block size serves both calls (the square prefix call and the
    # rectangular response call whose KV is sp_pad + sr_pad); clamp for
    # short test shapes so padding never exceeds one block
    blk = min(max(block_q, block_k), _round_up(min(sp, sr), 128))
    block_q = block_k = blk
    sp_pad = _round_up(sp, blk)
    sr_pad = _round_up(sr, blk)
    half = hd // 2

    def tables(pos, s, s_pad):
        cos_g = jnp.pad(cos_table[pos][..., :half],
                        ((0, 0), (0, s_pad - s), (0, 0))).astype(jnp.float32)
        sin_g = jnp.pad(sin_table[pos][..., :half],
                        ((0, 0), (0, s_pad - s), (0, 0))).astype(jnp.float32)
        return cos_g, sin_g

    def kbias(mask, s, s_pad):
        return jnp.where(
            jnp.pad(mask.astype(jnp.int32), ((0, 0), (0, s_pad - s))) != 0,
            0.0, _NEG_INF).astype(jnp.float32)[:, None, :]

    cos_p, sin_p = tables(pos_p, sp, sp_pad)
    cos_r, sin_r = tables(pos_r, sr, sr_pad)

    qp_t = _to_heads(qp2, cos_p, sin_p, num_heads, sp_pad, True, sp,
                     qp2.dtype)
    kp_t = _to_heads(kp2, cos_p, sin_p, num_heads, sp_pad, True, sp,
                     kp2.dtype, rep)
    vp_t = _to_heads(vp2, cos_p, sin_p, num_heads, sp_pad, False, sp,
                     vp2.dtype, rep)
    qr_t = _to_heads(qr2, cos_r, sin_r, num_heads, sr_pad, True, sr,
                     qr2.dtype)
    kr_t = _to_heads(kr2, cos_r, sin_r, num_heads, sr_pad, True, sr,
                     kr2.dtype, rep)
    vr_t = _to_heads(vr2, cos_r, sin_r, num_heads, sr_pad, False, sr,
                     vr2.dtype, rep)

    kbias_p = kbias(mask_p, sp, sp_pad)
    kbias_r = kbias(mask_r, sr, sr_pad)

    op_t = _flash_attention_padded(qp_t, kp_t, vp_t, kbias_p, True, scale,
                                   block_q, block_k)

    # responses attend to [prefix ++ self]: per-row repeat keeps B-major
    # alignment (and autodiff sums the K replicas' grads back into kp/vp)
    kcat = jnp.concatenate([jnp.repeat(kp_t, kk, axis=0), kr_t], axis=2)
    vcat = jnp.concatenate([jnp.repeat(vp_t, kk, axis=0), vr_t], axis=2)
    bcat = jnp.concatenate([jnp.repeat(kbias_p, kk, axis=0), kbias_r],
                           axis=2)
    or_t = _flash_attention_padded(qr_t, kcat, vcat, bcat, True, scale,
                                   block_q, block_k, sp_pad)

    op2 = _from_heads(op_t, jnp.bfloat16, qp_t.dtype, num_heads)[:, :sp, :]
    or2 = _from_heads(or_t, jnp.bfloat16, qr_t.dtype, num_heads)[:, :sr, :]
    return op2, or2


def _flash_attention_fused_shared_tp(qp2, kp2, vp2, qr2, kr2, vr2,
                                     cos_table, sin_table, pos_p, pos_r,
                                     num_heads, mask_p, mask_r, scale,
                                     block_q, block_k, mesh, num_kv_heads):
    """Shared-prefix fused pipeline under TP: same sharding story as
    ``_flash_attention_fused_tp`` — feature axes head-sharded along
    ``model``, batch axes along ``data`` (B-major response stacking keeps
    each shard's prefix/response rows aligned), body communication-free."""
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    from opadpo_tpu.parallel.mesh import DATA_AXIS, MODEL_AXIS

    n_model = mesh.shape.get(MODEL_AXIS, 1)
    local_heads = num_heads // n_model
    local_kv = num_kv_heads // n_model
    feat_spec = P(DATA_AXIS, None, MODEL_AXIS)
    row_spec = P(DATA_AXIS, None)
    fn = shard_map(
        lambda qp_, kp_, vp_, qr_, kr_, vr_, cos_, sin_, pp_, pr_, mp_, mr_:
        _flash_attention_fused_shared_local(
            qp_, kp_, vp_, qr_, kr_, vr_, cos_, sin_, pp_, pr_,
            local_heads, mp_, mr_, scale, block_q, block_k, local_kv),
        mesh=mesh,
        in_specs=(feat_spec, feat_spec, feat_spec, feat_spec, feat_spec,
                  feat_spec, P(None, None), P(None, None), row_spec,
                  row_spec, row_spec, row_spec),
        out_specs=(feat_spec, feat_spec),
        check_vma=False,
    )
    return fn(qp2, kp2, vp2, qr2, kr2, vr2, cos_table, sin_table, pos_p,
              pos_r, mask_p, mask_r)


def _flash_attention_tp(q, k, v, key_mask, causal, scale, mesh):
    """Flash kernel under tensor parallelism: shard_map over the mesh with
    heads split along the ``model`` axis and batch along ``data``.  Each
    shard's heads are independent, so the body is communication-free
    (out spec == in spec; no psum)."""
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    from opadpo_tpu.parallel.mesh import DATA_AXIS, MODEL_AXIS

    qkv_spec = P(DATA_AXIS, None, MODEL_AXIS, None)
    mask_spec = P(DATA_AXIS, None)
    fn = shard_map(
        lambda q_, k_, v_, m_: flash_attention(
            q_, k_, v_, key_mask=m_, causal=causal, scale=scale),
        mesh=mesh,
        in_specs=(qkv_spec, qkv_spec, qkv_spec, mask_spec),
        out_specs=qkv_spec,
        check_vma=False,
    )
    return fn(q, k, v, key_mask)


def multi_head_attention(
    q: jax.Array,            # [B, Sq, H, D]
    k: jax.Array,            # [B, Sk, H, D]
    v: jax.Array,
    key_mask: Optional[jax.Array] = None,
    causal: bool = True,
    scale: Optional[float] = None,
    impl: str = "auto",
) -> jax.Array:
    """Dispatching attention entry point.

    impl: "auto" (flash on TPU for self-attention shapes, else XLA),
    "flash", or "xla".
    """
    if impl == "auto" and _DEFAULT_IMPL != "auto":
        impl = _DEFAULT_IMPL
    if impl == "auto":
        use_flash = (
            jax.default_backend() == "tpu"
            and q.shape[1] == k.shape[1]
            and q.shape[1] <= MAX_FLASH_SEQ
        )
        impl = "flash" if use_flash else "xla"
    if impl == "flash":
        if q.shape[1] != k.shape[1]:
            raise ValueError("flash impl requires self-attention (Sq == Sk)")
        if _TP_MESH is not None:
            b, _, h, _ = q.shape
            n_data = _TP_MESH.shape.get("data", 1)
            n_model = _TP_MESH.shape.get("model", 1)
            if b % n_data == 0 and h % n_model == 0:
                if key_mask is None:
                    key_mask = jnp.ones(q.shape[:2], jnp.int32)
                return _flash_attention_tp(q, k, v, key_mask, causal,
                                           scale, _TP_MESH)
            # indivisible shapes (e.g. CLIP head counts on a wide model
            # axis) fall through to XLA, which partitions any shape
            return mha_reference(q, k, v, key_mask=key_mask, causal=causal,
                                 scale=scale)
        return flash_attention(q, k, v, key_mask=key_mask, causal=causal,
                               scale=scale)
    return mha_reference(q, k, v, key_mask=key_mask, causal=causal, scale=scale)
