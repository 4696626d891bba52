"""Fused decode attention over the int8 prompt-KV cache (Pallas, TPU).

Single-token decode attention is bandwidth-bound on the prompt-KV reads
(~1.5 GB/step at 7B B=4 bf16).  This kernel replaces the per-layer XLA
score/softmax/value chain (which lowered to VPU multiply-reduce fusions
plus concat/softmax fusions) with one fused pass over the quantized
prompt cache, cutting the decode step's XLA-fusion overhead ~8x
(1.5 ms → 0.25 ms/step of non-kernel time at 7B B=4).

Measured honestly: the int8 stream itself runs at ~500 GB/s — the VPU
s8→bf16 operand converts eat roughly what int8 saves in bytes, so the
win over the bf16 XLA path is the fusion/overhead removal, not raw
bandwidth.  An s8 × s8 int8-MXU variant was tried and measured SLOWER
end-to-end (9.11 vs 8.50 ms/step): int8 MXU tiling penalizes M=1 dots
more than the converts cost.

Design (flash-decode with one query token):
- grid (B, H/hblk, Sp_blocks); per step one [hblk, sblk, hd] int8 K block
  and V block stream HBM→VMEM; the query block [hblk, hd] and the output
  accumulators are grid-constant (index maps ignore the s index).
- per head: NT dot ``q[1,hd] · K[sblk,hd]ᵀ → scores [1,sblk]`` on the
  MXU, per-(h,s) dequant scale and the additive prompt-mask bias folded
  into the scores, online softmax, value dot ``p[1,sblk] · V[sblk,hd]``
  with the V scale folded into p.
- the running per-head max/sum live in SMEM (Mosaic cannot store scalars
  to VMEM); the [hblk, hd] output accumulator lives in VMEM with
  whole-row updates.
- returns the UNNORMALIZED output plus the softmax state (m, l) so the
  caller merges the (small, mutable, bf16) suffix-KV piece outside with a
  standard logsumexp merge — the decode loop's suffix carry layout stays
  untouched.

The prompt cache must be padded to a multiple of the s-block (128); pad
positions carry bias −1e30 (``models/llama.quantize_prompt_kv`` emits
this layout).  Reference equivalent: the HF attention inside ``generate``
(rl_models.py:146-191) — redesigned rather than translated.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG_INF = -1e30


def _kernel(q_ref, k_ref, ks_ref, v_ref, vs_ref, bias_ref,
            o_ref, m_ref, l_ref, acc_scr, m_scr, l_scr, *, hblk, nsb,
            sm_scale):
    kk = pl.program_id(2)

    @pl.when(kk == 0)
    def _():
        acc_scr[:] = jnp.zeros_like(acc_scr)
        for h in range(hblk):
            m_scr[h] = _NEG_INF
            l_scr[h] = 0.0

    qb = q_ref[0]                                   # [hblk, hd] bf16
    bias = bias_ref[0]                              # [1, sblk] f32
    for h in range(hblk):
        kb = k_ref[0, h]                            # [sblk, hd] int8
        vb = v_ref[0, h]
        # bf16 dots: s8 × s8 int8-MXU dots were tried and measured SLOWER
        # end-to-end at M=1 (9.11 vs 8.50 ms/step at 7B B=4) — the int8
        # tile shape penalizes single-row dots more than the VPU
        # s8→bf16 operand converts cost here
        qrow = qb[h][None, :].astype(jnp.bfloat16)  # [1, hd]
        s = jax.lax.dot_general(
            qrow, kb.astype(jnp.bfloat16), (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)     # [1, sblk]
        s = s * (ks_ref[0, h][None, :] * sm_scale) + bias
        m_old = m_scr[h]
        m_new = jnp.maximum(m_old, jnp.max(s))
        alpha = jnp.exp(m_old - m_new)
        p = jnp.exp(s - m_new)                      # [1, sblk]
        l_scr[h] = l_scr[h] * alpha + jnp.sum(p)
        pw = (p * vs_ref[0, h][None, :]).astype(jnp.bfloat16)
        pv = jax.lax.dot_general(
            pw, vb.astype(jnp.bfloat16), (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)     # [1, hd]
        acc_scr[h:h + 1, :] = acc_scr[h:h + 1, :] * alpha + pv
        m_scr[h] = m_new

    @pl.when(kk == nsb - 1)
    def _():
        o_ref[0] = acc_scr[:]
        for h in range(hblk):
            m_ref[0, h, 0] = m_scr[h]
            l_ref[0, h, 0] = l_scr[h]


def _kernel4(q_ref, k_ref, ks_ref, v_ref, vs_ref, bias_ref,
             o_ref, m_ref, l_ref, acc_scr, m_scr, l_scr, *, hblk, nsb,
             sm_scale):
    """int4 variant: the K/V blocks are GROUP-LOCAL HALF-SPLIT packed
    (``llama.quantize_prompt_kv_int4``): a [sblk/2, hd] int8 block holds
    each 256-position group's first 128 positions in the low nibbles and
    its second 128 in the high nibbles.  Unpack = two shifts per 128-row
    slab (the Mosaic-legal int32-lane form, same as quant._q4_matmul_
    kernel) → two adjacent key tiles, each folded into the online-softmax
    state independently (softmax is permutation-invariant over keys, so
    tile order never matters)."""
    kk = pl.program_id(2)

    @pl.when(kk == 0)
    def _():
        acc_scr[:] = jnp.zeros_like(acc_scr)
        for h in range(hblk):
            m_scr[h] = _NEG_INF
            l_scr[h] = 0.0

    qb = q_ref[0]                                   # [hblk, hd] bf16
    bias = bias_ref[0]                              # [1, sblk] f32
    sblk = bias.shape[1]
    for h in range(hblk):
        kp = k_ref[0, h]                            # [sblk/2, hd] packed
        vp = v_ref[0, h]
        qrow = qb[h][None, :].astype(jnp.bfloat16)  # [1, hd]
        for gi in range(sblk // 256):
            k32 = kp[gi * 128:(gi + 1) * 128, :].astype(jnp.int32)
            v32 = vp[gi * 128:(gi + 1) * 128, :].astype(jnp.int32)
            k_lo = (((k32 & 0xF) ^ 8) - 8).astype(jnp.bfloat16)
            k_hi = (k32 >> 4).astype(jnp.bfloat16)
            v_lo = (((v32 & 0xF) ^ 8) - 8).astype(jnp.bfloat16)
            v_hi = (v32 >> 4).astype(jnp.bfloat16)
            o_lo, o_hi = gi * 256, gi * 256 + 128

            s_lo = jax.lax.dot_general(
                qrow, k_lo, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)         # [1, 128]
            s_hi = jax.lax.dot_general(
                qrow, k_hi, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
            # slice scale rows at REF-read time: newaxis+slice on the
            # loaded 1D array rewrites to a 1D lax.gather, which Mosaic
            # cannot lower ("Only 2D gather is supported" — hit on the
            # chip; interpret mode accepted it)
            ks_lo = ks_ref[0, h, o_lo:o_lo + 128][None, :]
            ks_hi = ks_ref[0, h, o_hi:o_hi + 128][None, :]
            s_lo = s_lo * (ks_lo * sm_scale) + bias[:, o_lo:o_lo + 128]
            s_hi = s_hi * (ks_hi * sm_scale) + bias[:, o_hi:o_hi + 128]

            m_old = m_scr[h]
            m_new = jnp.maximum(m_old,
                                jnp.maximum(jnp.max(s_lo), jnp.max(s_hi)))
            alpha = jnp.exp(m_old - m_new)
            p_lo = jnp.exp(s_lo - m_new)
            p_hi = jnp.exp(s_hi - m_new)
            l_scr[h] = (l_scr[h] * alpha
                        + jnp.sum(p_lo) + jnp.sum(p_hi))
            vs_lo = vs_ref[0, h, o_lo:o_lo + 128][None, :]
            vs_hi = vs_ref[0, h, o_hi:o_hi + 128][None, :]
            pw_lo = (p_lo * vs_lo).astype(jnp.bfloat16)
            pw_hi = (p_hi * vs_hi).astype(jnp.bfloat16)
            pv = jax.lax.dot_general(
                pw_lo, v_lo, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            pv = pv + jax.lax.dot_general(
                pw_hi, v_hi, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            acc_scr[h:h + 1, :] = acc_scr[h:h + 1, :] * alpha + pv
            m_scr[h] = m_new

    @pl.when(kk == nsb - 1)
    def _():
        o_ref[0] = acc_scr[:]
        for h in range(hblk):
            m_ref[0, h, 0] = m_scr[h]
            l_ref[0, h, 0] = l_scr[h]


def _pick_hblk(h: int, block_h: int) -> int:
    """Largest divisor of ``h`` that fits the block cap AND is
    Mosaic-legal as a block dim: the head axis is second-to-last in the
    q/out/scale blocks, so the block size must be a multiple of 8 or
    equal to ``h`` itself.  This is a HARDWARE tiling rule that
    interpret-mode tests do not enforce — h=40 picked 10 on CPU and
    failed to lower on the chip (13B) — so the choice is unit-tested
    directly (tests/test_attention.py)."""
    for cand in range(min(block_h, h), 0, -1):
        if h % cand == 0 and (cand % 8 == 0 or cand == h):
            return cand
    return h          # block == array dim is always legal


def _pick_sblk(sp: int, block_s: int, align: int) -> int:
    """Largest divisor of ``sp`` that is an ``align``-multiple and fits
    the VMEM cap ``block_s``."""
    for nsb_c in range(1, sp // align + 1):
        if sp % nsb_c == 0 and sp // nsb_c <= block_s \
                and (sp // nsb_c) % align == 0:
            return sp // nsb_c
    return align


def _prompt_call(public_fn, kernel, pack: int, align: int,
                 q, pk_q, k_scale, pv_q, v_scale, bias, sm_scale,
                 block_h: int, block_s: int, s_used, _local: bool) -> tuple:
    """Shared wrapper for the int8 (pack=1, align=128) and packed-int4
    (pack=2, align=256) prompt-attention kernels: the TP shard_map path
    and the pallas_call scaffolding are identical up to the packed S-dim
    divisor and the length alignment — keep them single-sited so a
    hardware tiling fix lands in both kernels at once.  ``public_fn`` is
    re-entered with ``_local=True`` inside the shard_map (heads are local
    under model-axis sharding — no collectives in the body)."""
    b, h, sp = k_scale.shape
    assert pk_q.shape[2] * pack == sp, (pk_q.shape, pack, sp)
    if s_used is not None:
        assert 0 < s_used <= sp and s_used % align == 0, (s_used, sp, align)
        sp = s_used

    from opadpo_tpu.ops.attention import get_tp_mesh
    mesh = None if _local else get_tp_mesh()
    if mesh is not None:
        from jax import shard_map
        from jax.sharding import PartitionSpec as P

        from opadpo_tpu.parallel.mesh import DATA_AXIS, MODEL_AXIS

        n_data = mesh.shape.get(DATA_AXIS, 1)
        n_model = mesh.shape.get(MODEL_AXIS, 1)
        if b % n_data == 0 and h % n_model == 0 and n_model > 1:
            q_spec = P(DATA_AXIS, MODEL_AXIS, None)
            kv_spec_p = P(DATA_AXIS, MODEL_AXIS, None, None)
            sc_spec_p = P(DATA_AXIS, MODEL_AXIS, None)
            fn = shard_map(
                lambda q_, pk_, ks_, pv_, vs_, bi_: public_fn(
                    q_, pk_, ks_, pv_, vs_, bi_, sm_scale,
                    block_h=block_h, block_s=block_s, s_used=s_used,
                    _local=True),
                mesh=mesh,
                in_specs=(q_spec, kv_spec_p, sc_spec_p, kv_spec_p,
                          sc_spec_p, P(DATA_AXIS, None)),
                out_specs=(q_spec, P(DATA_AXIS, MODEL_AXIS),
                           P(DATA_AXIS, MODEL_AXIS)),
                check_vma=False,
            )
            return fn(q, pk_q, k_scale, pv_q, v_scale, bias)

    hd = pk_q.shape[3]
    hblk = _pick_hblk(h, block_h)
    # largest aligned divisor of sp that fits the VMEM cap: a fixed
    # candidate list degraded to 128-wide blocks on lengths like 896/1152
    # (chunked-decode growth steps), measured 15% slower
    sblk = _pick_sblk(sp, block_s, align)
    nsb = sp // sblk
    grid = (b, h // hblk, nsb)

    kv_spec = pl.BlockSpec((1, hblk, sblk // pack, hd),
                           lambda b_, hb, kk: (b_, hb, kk, 0),
                           memory_space=pltpu.VMEM)
    sc_spec = pl.BlockSpec((1, hblk, sblk),
                           lambda b_, hb, kk: (b_, hb, kk),
                           memory_space=pltpu.VMEM)
    # [B, H, 1] with block (1, hblk, 1): the only SMEM-legal tiling here
    # (last two block dims must divide 8/128 or equal the array dims)
    ml_spec = pl.BlockSpec((1, hblk, 1), lambda b_, hb, kk: (b_, hb, 0),
                           memory_space=pltpu.SMEM)
    out, m, l = pl.pallas_call(
        functools.partial(kernel, hblk=hblk, nsb=nsb, sm_scale=sm_scale),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, hblk, hd), lambda b_, hb, kk: (b_, hb, 0),
                         memory_space=pltpu.VMEM),
            kv_spec, sc_spec, kv_spec, sc_spec,
            pl.BlockSpec((1, 1, sblk), lambda b_, hb, kk: (b_, 0, kk),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, hblk, hd), lambda b_, hb, kk: (b_, hb, 0),
                         memory_space=pltpu.VMEM),
            ml_spec, ml_spec,
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, h, hd), jnp.float32),
            jax.ShapeDtypeStruct((b, h, 1), jnp.float32),
            jax.ShapeDtypeStruct((b, h, 1), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((hblk, hd), jnp.float32),
            pltpu.SMEM((hblk,), jnp.float32),
            pltpu.SMEM((hblk,), jnp.float32),
        ],
        interpret=jax.default_backend() != "tpu",
    )(q, pk_q, k_scale, pv_q, v_scale, bias[:, None, :])
    return out, m[:, :, 0], l[:, :, 0]


def decode_attention_prompt(
    q: jax.Array,          # [B, H, hd] (post-rope query for the new token)
    pk_q: jax.Array,       # [B, H, Sp_pad, hd] int8
    k_scale: jax.Array,    # [B, H, Sp_pad] f32
    pv_q: jax.Array,       # [B, H, Sp_pad, hd] int8
    v_scale: jax.Array,    # [B, H, Sp_pad] f32
    bias: jax.Array,       # [B, Sp_pad] f32 additive (0 valid / -1e30)
    sm_scale: float,
    block_h: int = 16,
    block_s: int = 1024,
    s_used: int | None = None,
    _local: bool = False,
) -> tuple:
    """→ (out_unnormalized [B, H, hd] f32, m [B, H] f32, l [B, H] f32).

    softmax(scores)·V over the prompt piece only, as flash state:
    ``out / l`` after merging with the suffix piece (see
    ``models/llama._decode_layer``).

    ``s_used`` (static, 128-multiple) limits the grid to the first
    ``s_used`` cache positions: chunked decode preallocates the cache at
    final length and grows a static fill watermark instead of
    reallocating — unfilled blocks are never read (their DMA would also
    be wasted bandwidth; positions past the mask are −1e30 anyway).

    Under tensor parallelism the kernel runs inside a shard_map (pallas
    does not partition under GSPMD — same design as attention._flash_
    attention_tp): heads are local under model-axis head sharding, so
    each shard runs the local kernel with no collectives."""
    return _prompt_call(decode_attention_prompt, _kernel, 1, 128,
                        q, pk_q, k_scale, pv_q, v_scale, bias, sm_scale,
                        block_h, block_s, s_used, _local)


def decode_attention_prompt4(
    q: jax.Array,          # [B, H, hd] (post-rope query for the new token)
    pk_q4: jax.Array,      # [B, H, Sp_pad/2, hd] int8 (half-split packed)
    k_scale: jax.Array,    # [B, H, Sp_pad] f32
    pv_q4: jax.Array,      # [B, H, Sp_pad/2, hd] int8
    v_scale: jax.Array,    # [B, H, Sp_pad] f32
    bias: jax.Array,       # [B, Sp_pad] f32 additive (0 valid / -1e30)
    sm_scale: float,
    block_h: int = 16,
    block_s: int = 1024,
    s_used: int | None = None,
    _local: bool = False,
) -> tuple:
    """int4-cache variant of ``decode_attention_prompt`` (same contract).
    Lengths and ``s_used`` must be 256-multiples (the packed group size);
    everything else — scales, mask bias, flash-state merge — is the int8
    layout unchanged."""
    return _prompt_call(decode_attention_prompt4, _kernel4, 2, 256,
                        q, pk_q4, k_scale, pv_q4, v_scale, bias, sm_scale,
                        block_h, block_s, s_used, _local)


# ---------------------------------------------------------------------
# Multi-query (speculative-verify) variant: G draft+carry tokens attend
# to the int8 prompt cache in ONE pass — the whole point of speculative
# decoding on this bandwidth-bound chip is that verifying G tokens reads
# the weights/KV once, so the kernel must not re-stream KV per token.
# Prompt positions are strictly before every query, so no causal logic
# is needed here (the G-internal causality lives in the suffix piece —
# models/llama._decode_layer_multi).

def _kernel_multi(q_ref, k_ref, ks_ref, v_ref, vs_ref, bias_ref,
                  o_ref, m_ref, l_ref, acc_scr, m_scr, l_scr, *, hblk,
                  nsb, gq, sm_scale):
    kk = pl.program_id(2)

    @pl.when(kk == 0)
    def _():
        acc_scr[:] = jnp.zeros_like(acc_scr)
        for r in range(hblk * gq):
            m_scr[r] = _NEG_INF
            l_scr[r] = 0.0

    bias = bias_ref[0]                              # [1, sblk] f32
    for h in range(hblk):
        kb = k_ref[0, h]                            # [sblk, hd] int8
        vb = v_ref[0, h]
        qg = q_ref[0, h * gq:(h + 1) * gq].astype(jnp.bfloat16)  # [G, hd]
        s_all = jax.lax.dot_general(
            qg, kb.astype(jnp.bfloat16), (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)     # [G, sblk]
        s_all = s_all * (ks_ref[0, h][None, :] * sm_scale) + bias
        vbf = vb.astype(jnp.bfloat16)
        for g in range(gq):
            r = h * gq + g
            s = s_all[g:g + 1, :]                   # [1, sblk]
            m_old = m_scr[r]
            m_new = jnp.maximum(m_old, jnp.max(s))
            alpha = jnp.exp(m_old - m_new)
            p = jnp.exp(s - m_new)
            l_scr[r] = l_scr[r] * alpha + jnp.sum(p)
            pw = (p * vs_ref[0, h][None, :]).astype(jnp.bfloat16)
            pv = jax.lax.dot_general(
                pw, vbf, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)  # [1, hd]
            acc_scr[r:r + 1, :] = acc_scr[r:r + 1, :] * alpha + pv
            m_scr[r] = m_new

    @pl.when(kk == nsb - 1)
    def _():
        o_ref[0] = acc_scr[:]
        for r in range(hblk * gq):
            m_ref[0, r, 0] = m_scr[r]
            l_ref[0, r, 0] = l_scr[r]


def decode_attention_prompt_multi(
    q: jax.Array,          # [B, H, G, hd] post-rope queries (G tokens)
    pk_q: jax.Array,       # [B, H, Sp_pad, hd] int8
    k_scale: jax.Array,    # [B, H, Sp_pad] f32
    pv_q: jax.Array,       # [B, H, Sp_pad, hd] int8
    v_scale: jax.Array,    # [B, H, Sp_pad] f32
    bias: jax.Array,       # [B, Sp_pad] f32 additive (0 valid / -1e30)
    sm_scale: float,
    block_h: int = 8,
    block_s: int = 1024,
    s_used: int | None = None,
    _local: bool = False,
) -> tuple:
    """→ (out_unnormalized [B, H, G, hd] f32, m [B, H, G], l [B, H, G]).

    Same flash-state contract as ``decode_attention_prompt`` with a
    G-query axis folded into the head rows: the q/out/m/l blocks carry
    ``hblk·G`` rows so the (second-to-last-axis) Mosaic tiling rule
    holds whenever ``hblk`` does (hblk is 8-aligned or the whole H, and
    rows are contiguous per head).  KV streams HBM→VMEM ONCE for all G
    queries.  Runs in a shard_map under TP like the G=1 kernel."""
    b, h, gq, hd = q.shape
    sp = k_scale.shape[2]
    if s_used is not None:
        assert 0 < s_used <= sp and s_used % 128 == 0, (s_used, sp)
        sp = s_used

    from opadpo_tpu.ops.attention import get_tp_mesh
    mesh = None if _local else get_tp_mesh()
    if mesh is not None:
        from jax import shard_map
        from jax.sharding import PartitionSpec as P

        from opadpo_tpu.parallel.mesh import DATA_AXIS, MODEL_AXIS

        n_data = mesh.shape.get(DATA_AXIS, 1)
        n_model = mesh.shape.get(MODEL_AXIS, 1)
        if b % n_data == 0 and h % n_model == 0 and n_model > 1:
            q_spec = P(DATA_AXIS, MODEL_AXIS, None, None)
            kv_spec_p = P(DATA_AXIS, MODEL_AXIS, None, None)
            sc_spec_p = P(DATA_AXIS, MODEL_AXIS, None)
            fn = shard_map(
                lambda q_, pk_, ks_, pv_, vs_, bi_:
                decode_attention_prompt_multi(
                    q_, pk_, ks_, pv_, vs_, bi_, sm_scale,
                    block_h=block_h, block_s=block_s, s_used=s_used,
                    _local=True),
                mesh=mesh,
                in_specs=(q_spec, kv_spec_p, sc_spec_p, kv_spec_p,
                          sc_spec_p, P(DATA_AXIS, None)),
                out_specs=(q_spec, P(DATA_AXIS, MODEL_AXIS, None),
                           P(DATA_AXIS, MODEL_AXIS, None)),
                check_vma=False,
            )
            return fn(q, pk_q, k_scale, pv_q, v_scale, bias)

    hblk = _pick_hblk(h, block_h)
    sblk = _pick_sblk(sp, block_s, 128)
    nsb = sp // sblk
    grid = (b, h // hblk, nsb)

    # queries flattened to [B, H*G, hd]: per-head G rows stay contiguous
    qf = q.reshape(b, h * gq, hd)
    rows = hblk * gq

    kv_spec = pl.BlockSpec((1, hblk, sblk, hd),
                           lambda b_, hb, kk: (b_, hb, kk, 0),
                           memory_space=pltpu.VMEM)
    sc_spec = pl.BlockSpec((1, hblk, sblk),
                           lambda b_, hb, kk: (b_, hb, kk),
                           memory_space=pltpu.VMEM)
    ml_spec = pl.BlockSpec((1, rows, 1), lambda b_, hb, kk: (b_, hb, 0),
                           memory_space=pltpu.SMEM)
    out, m, l = pl.pallas_call(
        functools.partial(_kernel_multi, hblk=hblk, nsb=nsb, gq=gq,
                          sm_scale=sm_scale),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, rows, hd), lambda b_, hb, kk: (b_, hb, 0),
                         memory_space=pltpu.VMEM),
            kv_spec, sc_spec, kv_spec, sc_spec,
            pl.BlockSpec((1, 1, sblk), lambda b_, hb, kk: (b_, 0, kk),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, rows, hd), lambda b_, hb, kk: (b_, hb, 0),
                         memory_space=pltpu.VMEM),
            ml_spec, ml_spec,
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, h * gq, hd), jnp.float32),
            jax.ShapeDtypeStruct((b, h * gq, 1), jnp.float32),
            jax.ShapeDtypeStruct((b, h * gq, 1), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((rows, hd), jnp.float32),
            pltpu.SMEM((rows,), jnp.float32),
            pltpu.SMEM((rows,), jnp.float32),
        ],
        interpret=jax.default_backend() != "tpu",
    )(qf, pk_q, k_scale, pv_q, v_scale, bias[:, None, :])
    return (out.reshape(b, h, gq, hd), m.reshape(b, h, gq),
            l.reshape(b, h, gq))
