"""LLaMA / Vicuna decoder in functional JAX (TPU-first).

Implements the language side of ``LlavaLlamaForCausalLM`` (the reference
clones haotian-liu/LLaVA for this — SURVEY §2.9).  Design:

- Params = nested dict pytree; all decoder layers are *stacked* along a
  leading layer axis and the forward is one ``lax.scan`` with
  ``jax.checkpoint`` on the layer body — single compilation of one layer,
  rematerialized activations (HBM-for-FLOPs, the TPU analogue of the
  reference's gradient checkpointing flag).
- Attention is the Pallas flash kernel for full-sequence passes and an XLA
  dot over the static KV cache for single-token decode (the cache mirrors
  the reference's static ``config.cache_shape`` allocation,
  ``rl_models.py:157-162``).
- RoPE positions come from ``cumsum(mask)-1`` like HF/LLaVA's
  ``prepare_inputs_for_generation`` so left-padded batches match GPU
  numerics.
- LoRA adapters attach to every linear (wq/wk/wv/wo/w_gate/w_up/w_down and
  optionally embed/lm_head) via ``lora_dense`` — reference recipe "all
  linear layers" (``qlora_model.py:24-41``).
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp

from opadpo_tpu.models.lora import lora_dense, tree_get, init_lora_entry, LoraConfig
from opadpo_tpu.ops.attention import multi_head_attention, mha_reference
from opadpo_tpu.ops.rope import rope_frequencies, apply_rope

_NEG_INF = -1e30


@dataclasses.dataclass(frozen=True)
class LlamaConfig:
    vocab_size: int = 32000
    hidden_size: int = 4096
    intermediate_size: int = 11008
    num_layers: int = 32
    num_heads: int = 32
    num_kv_heads: int = 32
    head_dim: int = 128
    max_position_embeddings: int = 4096
    rope_base: float = 10000.0
    rms_norm_eps: float = 1e-5
    dtype: Any = jnp.bfloat16

    @staticmethod
    def llava_7b() -> "LlamaConfig":
        return LlamaConfig()

    @staticmethod
    def llava_13b() -> "LlamaConfig":
        return LlamaConfig(hidden_size=5120, intermediate_size=13824,
                           num_layers=40, num_heads=40, num_kv_heads=40)

    @staticmethod
    def tiny(vocab_size: int = 512) -> "LlamaConfig":
        """Random-weights debug config — the TPU analogue of the reference's
        ``skip_loading_weights`` fake-model hook (SURVEY §4)."""
        return LlamaConfig(vocab_size=vocab_size, hidden_size=128,
                           intermediate_size=352, num_layers=2,
                           num_heads=2, num_kv_heads=2, head_dim=64,
                           max_position_embeddings=2048)


def init_params(key: jax.Array, cfg: LlamaConfig) -> dict:
    """Random init (debug/testing; real weights come from the loader)."""
    k = jax.random.split(key, 12)
    d, i, l = cfg.hidden_size, cfg.intermediate_size, cfg.num_layers
    hd, nh, nkv = cfg.head_dim, cfg.num_heads, cfg.num_kv_heads
    s = 0.02

    def nrm(kk, shape):
        return (jax.random.normal(kk, shape, jnp.float32) * s).astype(cfg.dtype)

    return {
        "embed": nrm(k[0], (cfg.vocab_size, d)),
        "layers": {
            "attn_norm": jnp.ones((l, d), jnp.float32),
            "mlp_norm": jnp.ones((l, d), jnp.float32),
            "wq": nrm(k[1], (l, d, nh * hd)),
            "wk": nrm(k[2], (l, d, nkv * hd)),
            "wv": nrm(k[3], (l, d, nkv * hd)),
            "wo": nrm(k[4], (l, nh * hd, d)),
            "w_gate": nrm(k[5], (l, d, i)),
            "w_up": nrm(k[6], (l, d, i)),
            "w_down": nrm(k[7], (l, i, d)),
        },
        "final_norm": jnp.ones((d,), jnp.float32),
        "lm_head": nrm(k[8], (d, cfg.vocab_size)),
    }


def init_lora(key: jax.Array, cfg: LlamaConfig, lora_cfg: LoraConfig) -> dict:
    """Adapters over all decoder linears (reference find_all_linear_names)."""
    d, i, l = cfg.hidden_size, cfg.intermediate_size, cfg.num_layers
    hd, nh, nkv = cfg.head_dim, cfg.num_heads, cfg.num_kv_heads
    ks = jax.random.split(key, 7)
    return {
        "layers": {
            "wq": init_lora_entry(ks[0], d, nh * hd, lora_cfg, stacked=l),
            "wk": init_lora_entry(ks[1], d, nkv * hd, lora_cfg, stacked=l),
            "wv": init_lora_entry(ks[2], d, nkv * hd, lora_cfg, stacked=l),
            "wo": init_lora_entry(ks[3], nh * hd, d, lora_cfg, stacked=l),
            "w_gate": init_lora_entry(ks[4], d, i, lora_cfg, stacked=l),
            "w_up": init_lora_entry(ks[5], d, i, lora_cfg, stacked=l),
            "w_down": init_lora_entry(ks[6], i, d, lora_cfg, stacked=l),
        },
    }


def _base_dense(x, w):
    """Base (lora-less) dense for plain or int8-quantized weights."""
    from opadpo_tpu.models.lora import lora_dense
    return lora_dense(x, w, None, 1.0)


def _lora_delta(x, entry, scaling):
    if entry is None:
        return 0.0
    xa = jnp.einsum("...i,ir->...r", x, entry["a"],
                    preferred_element_type=jnp.float32)
    return (jnp.einsum("...r,ro->...o", xa.astype(entry["b"].dtype),
                       entry["b"], preferred_element_type=jnp.float32)
            * scaling)


def _qkv_proj(x, lp, ll, cfg, lora_scaling):
    """q/k/v projections — one fused matmul when the params carry
    ``w_qkv`` (see fuse_for_inference), else three.  LoRA deltas stay
    per-projection (their A factors differ)."""
    nh, nkv, hd = cfg.num_heads, cfg.num_kv_heads, cfg.head_dim
    if "w_qkv" in lp:
        qkv = _base_dense(x, lp["w_qkv"]).astype(jnp.float32)
        q = qkv[..., :nh * hd]
        k = qkv[..., nh * hd:(nh + nkv) * hd]
        v = qkv[..., (nh + nkv) * hd:]
    else:
        q = _base_dense(x, lp["wq"]).astype(jnp.float32)
        k = _base_dense(x, lp["wk"]).astype(jnp.float32)
        v = _base_dense(x, lp["wv"]).astype(jnp.float32)
    if ll is not None:
        q = q + _lora_delta(x, tree_get(ll, "wq"), lora_scaling)
        k = k + _lora_delta(x, tree_get(ll, "wk"), lora_scaling)
        v = v + _lora_delta(x, tree_get(ll, "wv"), lora_scaling)
    return q.astype(x.dtype), k.astype(x.dtype), v.astype(x.dtype)


def _gate_up_proj(x, lp, ll, cfg, lora_scaling):
    if "w_gate_up" in lp:
        i = cfg.intermediate_size
        gu = _base_dense(x, lp["w_gate_up"]).astype(jnp.float32)
        gate, up = gu[..., :i], gu[..., i:]
    else:
        gate = _base_dense(x, lp["w_gate"]).astype(jnp.float32)
        up = _base_dense(x, lp["w_up"]).astype(jnp.float32)
    if ll is not None:
        gate = gate + _lora_delta(x, tree_get(ll, "w_gate"), lora_scaling)
        up = up + _lora_delta(x, tree_get(ll, "w_up"), lora_scaling)
    return gate.astype(x.dtype), up.astype(x.dtype)


def _concat_weights(ws):
    """Concat plain or quantized (int8/int4) weights along the output dim."""
    if isinstance(ws[0], dict):
        qk = "q4" if "q4" in ws[0] else "q"
        return {qk: jnp.concatenate([w[qk] for w in ws], axis=-1),
                "scale": jnp.concatenate([w["scale"] for w in ws], axis=-1)}
    return jnp.concatenate(ws, axis=-1)


def fuse_for_inference(params: dict) -> dict:
    """Fuse wq/wk/wv → w_qkv and w_gate/w_up → w_gate_up (fewer, larger
    matmuls — bandwidth-bound decode pays per-kernel overhead 7x per
    layer otherwise).  Works on plain and int8-quantized layouts; the
    original per-projection entries are dropped (no memory duplication).
    All forward paths accept either layout."""
    layers = dict(params["layers"])
    layers["w_qkv"] = _concat_weights([layers.pop("wq"), layers.pop("wk"),
                                       layers.pop("wv")])
    layers["w_gate_up"] = _concat_weights([layers.pop("w_gate"),
                                           layers.pop("w_up")])
    return {**params, "layers": layers}


def rms_norm(x: jax.Array, weight: jax.Array, eps: float) -> jax.Array:
    x32 = x.astype(jnp.float32)
    var = jnp.mean(x32 * x32, axis=-1, keepdims=True)
    out = x32 * jax.lax.rsqrt(var + eps) * weight.astype(jnp.float32)
    return out.astype(x.dtype)


def init_kv_cache(cfg: LlamaConfig, batch: int, max_len: int) -> dict:
    """Static KV cache (reference ``config.cache_shape``)."""
    shape = (cfg.num_layers, batch, max_len, cfg.num_kv_heads, cfg.head_dim)
    return {
        "k": jnp.zeros(shape, cfg.dtype),
        "v": jnp.zeros(shape, cfg.dtype),
        "length": jnp.zeros((), jnp.int32),
    }


def _use_fused_flash(attn_impl: str, s: int, b: int, nh: int, nkv: int,
                     hd: int) -> bool:
    """Fused Pallas prologue/epilogue path (rope + head-split + pad +
    transpose in one pass per tensor — ops/attention.py): full-sequence
    self-attention, 128-aligned heads, flash eligible.  GQA (nh % nkv
    == 0) folds the KV-head repeat into the prologue expansion.  Under TP
    the fused pipeline runs inside a shard_map on each shard's local
    heads, so batch/heads (and kv heads) must divide the mesh axes."""
    from opadpo_tpu.ops.attention import (
        MAX_FLASH_SEQ, get_default_impl, get_fused_attention, get_tp_mesh,
    )
    if attn_impl == "auto":
        attn_impl = get_default_impl()
    if attn_impl == "xla" or not get_fused_attention():
        return False
    mesh = get_tp_mesh()
    if mesh is not None and (b % mesh.shape.get("data", 1) != 0
                             or nh % mesh.shape.get("model", 1) != 0
                             or nkv % mesh.shape.get("model", 1) != 0):
        return False
    return (jax.default_backend() == "tpu"
            and nh % nkv == 0
            and hd % 128 == 0
            and s <= MAX_FLASH_SEQ)


def _attention_block(x, lp, ll, cfg, lora_scaling, key_mask, positions,
                     cos, sin, cache_kv=None, cache_index=None,
                     attn_impl="auto"):
    """One layer's attention. x: [B, S, D].

    cache_kv: None (full-seq, no cache) or (k_cache, v_cache) [B, Smax, H, hd]
    to read/write at cache_index (prefill writes [0..S), decode writes one).
    Returns (out, new_cache_kv).
    """
    b, s, d = x.shape
    nh, nkv, hd = cfg.num_heads, cfg.num_kv_heads, cfg.head_dim

    q, k, v = _qkv_proj(x, lp, ll, cfg, lora_scaling)

    if cache_kv is None and _use_fused_flash(attn_impl, s, b, nh, nkv, hd):
        from opadpo_tpu.ops.attention import flash_attention_fused
        attn2 = flash_attention_fused(q, k, v, cos, sin, positions, nh,
                                      key_mask=key_mask, causal=True,
                                      num_kv_heads=nkv)
        out = lora_dense(attn2, lp["wo"], tree_get(ll, "wo"), lora_scaling)
        return out, None

    q = q.reshape(b, s, nh, hd)
    k = k.reshape(b, s, nkv, hd)
    v = v.reshape(b, s, nkv, hd)
    q, k = apply_rope(q, k, cos, sin, positions)

    new_cache = None
    if cache_kv is None:
        if nkv != nh:
            rep = nh // nkv
            k = jnp.repeat(k, rep, axis=2)
            v = jnp.repeat(v, rep, axis=2)
        attn = multi_head_attention(q, k, v, key_mask=key_mask, causal=True,
                                    impl=attn_impl)
    else:
        k_cache, v_cache = cache_kv
        if s == 1:
            # decode: one-hot select instead of dynamic_update_slice — a
            # scatter at a loop-carried index inside while_loop×scan blows
            # up the TPU compile service (measured: 10-min compiles /
            # helper crashes); the select lowers to cheap vector ops
            slen = k_cache.shape[1]
            onehot = (jax.lax.broadcasted_iota(jnp.int32, (slen,), 0)
                      == cache_index)[None, :, None, None]
            k_cache = jnp.where(onehot, k.astype(k_cache.dtype), k_cache)
            v_cache = jnp.where(onehot, v.astype(v_cache.dtype), v_cache)
        else:
            k_cache = jax.lax.dynamic_update_slice(
                k_cache, k.astype(k_cache.dtype), (0, cache_index, 0, 0))
            v_cache = jax.lax.dynamic_update_slice(
                v_cache, v.astype(v_cache.dtype), (0, cache_index, 0, 0))
        new_cache = (k_cache, v_cache)
        kk, vv = k_cache, v_cache
        if nkv != nh:
            rep = nh // nkv
            kk = jnp.repeat(kk, rep, axis=2)
            vv = jnp.repeat(vv, rep, axis=2)
        if s == 1:
            # decode: plain XLA dot over the cache; key_mask covers validity
            attn = mha_reference(q, kk, vv, key_mask=key_mask, causal=False)
        else:
            # prefill: cache beyond current length is invalid; mask covers it
            attn = multi_head_attention(q, k, v, key_mask=key_mask[:, :s],
                                        causal=True, impl=attn_impl)

    attn = attn.reshape(b, s, nh * hd)
    out = lora_dense(attn, lp["wo"], tree_get(ll, "wo"), lora_scaling)
    return out, new_cache


def _mlp_block(x, lp, ll, lora_scaling, cfg):
    gate, up = _gate_up_proj(x, lp, ll, cfg, lora_scaling)
    h = jax.nn.silu(gate.astype(jnp.float32)).astype(x.dtype) * up
    return lora_dense(h, lp["w_down"], tree_get(ll, "w_down"), lora_scaling)


def forward(
    params: dict,
    cfg: LlamaConfig,
    input_embeds: jax.Array,          # [B, S, D]
    key_mask: jax.Array,              # [B, S] (or [B, Smax] when cached)
    positions: jax.Array,             # [B, S] int32
    lora: Optional[dict] = None,
    lora_scaling: float = 1.0,
    cache: Optional[dict] = None,
    remat: bool = True,
    attn_impl: str = "auto",
    return_hidden: bool = False,
    last_logit_only: bool = False,
) -> Tuple[jax.Array, Optional[dict]]:
    """Decoder forward. Returns (logits [B,S,V] f32, new_cache|None);
    with ``return_hidden`` the first element is the final-norm hidden
    [B,S,D] instead (callers run a chunked lm_head readout on it)."""
    x = input_embeds
    b, s, d = x.shape
    max_rope = int(cfg.max_position_embeddings)
    cos, sin = rope_frequencies(cfg.head_dim, max_rope, cfg.rope_base,
                                dtype=jnp.float32)

    layers = params["layers"]
    lora_layers = tree_get(lora, "layers")
    cache_index = cache["length"] if cache is not None else None

    def layer_core(x, lp, ll, ck):
        h = rms_norm(x, lp["attn_norm"], cfg.rms_norm_eps)
        attn_out, new_ck = _attention_block(
            h, lp, ll, cfg, lora_scaling, key_mask, positions, cos, sin,
            cache_kv=ck, cache_index=cache_index, attn_impl=attn_impl)
        x = x + attn_out
        h = rms_norm(x, lp["mlp_norm"], cfg.rms_norm_eps)
        x = x + _mlp_block(h, lp, ll, lora_scaling, cfg)
        return x, new_ck

    has_lora = lora_layers is not None
    has_cache = cache is not None
    if has_cache:
        xs = ((layers, lora_layers, cache["k"], cache["v"]) if has_lora
              else (layers, cache["k"], cache["v"]))

        def body(x, scanned):
            if has_lora:
                lp, ll, k_c, v_c = scanned
            else:
                (lp, k_c, v_c), ll = scanned, None
            return layer_core(x, lp, ll, (k_c, v_c))
    else:
        xs = (layers, lora_layers) if has_lora else layers

        def body(x, scanned):
            if has_lora:
                lp, ll = scanned
            else:
                lp, ll = scanned, None
            return layer_core(x, lp, ll, None)

    body_fn = jax.checkpoint(body) if (remat and cache is None) else body
    x, new_kv = jax.lax.scan(body_fn, x, xs)

    x = rms_norm(x, params["final_norm"], cfg.rms_norm_eps)

    new_cache = None
    if cache is not None:
        new_cache = {
            "k": new_kv[0], "v": new_kv[1],
            "length": cache["length"] + s,
        }

    if return_hidden:
        return x, new_cache

    if last_logit_only:
        # prefill only needs the final position's logits — skip the
        # [B, S, V] f32 buffer (1.4 GB at B=16, S=700, V=32000)
        x = x[:, -1:, :]

    logits = jnp.einsum("bsd,dv->bsv", x, params["lm_head"],
                        preferred_element_type=jnp.float32)
    head_lora = tree_get(lora, "lm_head")
    if head_lora is not None:
        xa = jnp.einsum("bsd,dr->bsr", x, head_lora["a"],
                        preferred_element_type=jnp.float32)
        logits = logits + jnp.einsum(
            "bsr,rv->bsv", xa.astype(head_lora["b"].dtype), head_lora["b"],
            preferred_element_type=jnp.float32) * lora_scaling
    return logits, new_cache


def forward_shared_prefix(
    params: dict,
    cfg: LlamaConfig,
    prefix_embeds: jax.Array,      # [B, Sp, D]
    prefix_mask: jax.Array,        # [B, Sp]
    prefix_positions: jax.Array,   # [B, Sp] int32
    resp_embeds: jax.Array,        # [K*B, Sr, D] — B-MAJOR (row b*K + t)
    resp_mask: jax.Array,          # [K*B, Sr]
    resp_positions: jax.Array,     # [K*B, Sr] int32
    lora: Optional[dict] = None,
    lora_scaling: float = 1.0,
    remat: bool = True,
    attn_impl: str = "auto",
) -> Tuple[jax.Array, jax.Array]:
    """Decoder forward over a shared prefix and K responses per example.

    DPO scoring runs K response types against one (query + image) prefix
    per example; the stacked layout (``score_responses``) recomputes that
    prefix K times.  Here the prefix stream [B, Sp] runs ONCE and the
    response stream [K·B, Sr] attends to [prefix ++ self] with the
    rectangular offset-causal flash kernel — numerically identical to the
    stacked forward (responses never attend to each other), ~29% fewer
    matmul positions at the production shapes (Sp=703, Sr=896, K=3).

    Responses must be stacked B-major (row = b·K + t) so the per-row
    prefix repeat aligns — including per-shard under data parallelism.
    Returns final-norm hidden states ``(hp [B, Sp, D], hr [K*B, Sr, D])``;
    callers assemble the readout from hp's last position + hr[:, :-1].
    """
    b, sp, d = prefix_embeds.shape
    kb, sr, _ = resp_embeds.shape
    kk = kb // b
    nh, nkv, hd = cfg.num_heads, cfg.num_kv_heads, cfg.head_dim
    max_rope = int(cfg.max_position_embeddings)
    cos, sin = rope_frequencies(cfg.head_dim, max_rope, cfg.rope_base,
                                dtype=jnp.float32)

    layers = params["layers"]
    lora_layers = tree_get(lora, "layers")
    has_lora = lora_layers is not None

    use_fused = (_use_fused_flash(attn_impl, sp + sr, b, nh, nkv, hd)
                 and _use_fused_flash(attn_impl, sp + sr, kb, nh, nkv, hd))

    def attention_pair(hp, hr, lp, ll):
        qp, kp, vp = _qkv_proj(hp, lp, ll, cfg, lora_scaling)
        qr, kr, vr = _qkv_proj(hr, lp, ll, cfg, lora_scaling)

        if use_fused:
            from opadpo_tpu.ops.attention import flash_attention_fused_shared
            return flash_attention_fused_shared(
                qp, kp, vp, qr, kr, vr, cos, sin, prefix_positions,
                resp_positions, nh, prefix_mask, resp_mask,
                num_kv_heads=nkv)

        qp = qp.reshape(b, sp, nh, hd)
        kp = kp.reshape(b, sp, nkv, hd)
        vp = vp.reshape(b, sp, nkv, hd)
        qr = qr.reshape(kb, sr, nh, hd)
        kr = kr.reshape(kb, sr, nkv, hd)
        vr = vr.reshape(kb, sr, nkv, hd)
        qp, kp = apply_rope(qp, kp, cos, sin, prefix_positions)
        qr, kr = apply_rope(qr, kr, cos, sin, resp_positions)
        if nkv != nh:
            rep = nh // nkv
            kp = jnp.repeat(kp, rep, axis=2)
            vp = jnp.repeat(vp, rep, axis=2)
            kr = jnp.repeat(kr, rep, axis=2)
            vr = jnp.repeat(vr, rep, axis=2)

        op = multi_head_attention(qp, kp, vp, key_mask=prefix_mask,
                                  causal=True, impl=attn_impl)
        kcat = jnp.concatenate([jnp.repeat(kp, kk, axis=0), kr], axis=1)
        vcat = jnp.concatenate([jnp.repeat(vp, kk, axis=0), vr], axis=1)
        mcat = jnp.concatenate(
            [jnp.repeat(prefix_mask.astype(jnp.int32), kk, axis=0),
             resp_mask.astype(jnp.int32)], axis=1)

        from opadpo_tpu.ops.attention import (
            MAX_FLASH_SEQ, flash_attention_prefix, get_default_impl,
            get_tp_mesh,
        )
        impl = get_default_impl() if attn_impl == "auto" else attn_impl
        use_flash_rect = (
            impl != "xla"
            and jax.default_backend() == "tpu"
            and get_tp_mesh() is None
            and kcat.shape[1] <= MAX_FLASH_SEQ)
        if use_flash_rect:
            orr = flash_attention_prefix(qr, kcat, vcat, key_mask=mcat)
        else:
            # mha_reference's causal offset (Skv - Sq == Sp) is exactly
            # the shared-prefix visibility rule, and GSPMD partitions it
            orr = mha_reference(qr, kcat, vcat, key_mask=mcat, causal=True)
        return op.reshape(b, sp, nh * hd), orr.reshape(kb, sr, nh * hd)

    def layer_core(xp, xr, lp, ll):
        hp = rms_norm(xp, lp["attn_norm"], cfg.rms_norm_eps)
        hr = rms_norm(xr, lp["attn_norm"], cfg.rms_norm_eps)
        op2, or2 = attention_pair(hp, hr, lp, ll)
        wo_l = tree_get(ll, "wo")
        xp = xp + lora_dense(op2, lp["wo"], wo_l, lora_scaling)
        xr = xr + lora_dense(or2, lp["wo"], wo_l, lora_scaling)
        hp = rms_norm(xp, lp["mlp_norm"], cfg.rms_norm_eps)
        hr = rms_norm(xr, lp["mlp_norm"], cfg.rms_norm_eps)
        xp = xp + _mlp_block(hp, lp, ll, lora_scaling, cfg)
        xr = xr + _mlp_block(hr, lp, ll, lora_scaling, cfg)
        return xp, xr

    xs = (layers, lora_layers) if has_lora else layers

    def body(carry, scanned):
        if has_lora:
            lp, ll = scanned
        else:
            lp, ll = scanned, None
        xp, xr = layer_core(carry[0], carry[1], lp, ll)
        return (xp, xr), None

    body_fn = jax.checkpoint(body) if remat else body
    (xp, xr), _ = jax.lax.scan(body_fn, (prefix_embeds, resp_embeds), xs)

    hp = rms_norm(xp, params["final_norm"], cfg.rms_norm_eps)
    hr = rms_norm(xr, params["final_norm"], cfg.rms_norm_eps)
    return hp, hr


def embed_tokens(params: dict, input_ids: jax.Array) -> jax.Array:
    """Token embedding lookup; ids < 0 (IMAGE_TOKEN_INDEX/pads) map to 0."""
    safe = jnp.where(input_ids < 0, 0, input_ids)
    return params["embed"][safe]


def unstack_layers(params: dict) -> dict:
    """Stacked [L, ...] layer params → per-layer list (decode layout).

    The training/scoring forward scans over stacked layers, which is ideal
    there (one compiled body, slices amortize over the whole sequence).
    In single-token decode the scan's per-layer dynamic-slices COPY every
    layer's weights each step — profiled at 8.8 ms/step of the 17.9 ms
    total at 7B int8 B=4 (the whole int8 base re-copied per token).  The
    unrolled decode path indexes this per-layer list instead, making each
    weight a loop constant with zero per-step copies.
    """
    layers = params["layers"]
    n = None
    for leaf in jax.tree_util.tree_leaves(layers):
        n = leaf.shape[0]
        break
    layer_list = [jax.tree_util.tree_map(lambda x, i=i: x[i], layers)
                  for i in range(n)]
    out = {k: v for k, v in params.items() if k != "layers"}
    out["layer_list"] = layer_list
    return out


# ---------------------------------------------------------------------------
# Split-KV decode: immutable prompt cache + small mutable suffix buffer
# ---------------------------------------------------------------------------
#
# A single [cache_len] KV cache carried through the decode while_loop makes
# the whole 1.6 GB cache a mutated loop carry — the TPU compile service
# takes 10+ minutes (or dies) on the scatter-inside-scan-inside-while
# program, and HBM must hold two copies.  Splitting the cache into the
# prompt part (written once by prefill, then a LOOP CONSTANT) and a
# [max_new_tokens] suffix buffer (the only mutable carry, ~2% the size)
# compiles in seconds and halves cache memory pressure.

def init_suffix_cache(cfg: LlamaConfig, batch: int, max_new: int) -> dict:
    shape = (cfg.num_layers, batch, max_new, cfg.num_kv_heads, cfg.head_dim)
    return {"k": jnp.zeros(shape, cfg.dtype), "v": jnp.zeros(shape, cfg.dtype)}


def quantize_prompt_kv(kv: jax.Array, total_len: Optional[int] = None
                       ) -> dict:
    """Per-(batch, position, head) symmetric int8 quantization of a prompt
    KV tensor [B, Sp, H, hd] → ``{"q": int8 [B, H, Sp, hd], "scale": f32
    [B, H, Sp]}`` — note the HEAD-MAJOR transpose.

    Decode is bandwidth-bound on the prompt-KV reads (~1.5 GB/step at 7B
    B=4 bf16); int8 halves them.  Two layout decisions, both profiled:
    head-major [B, H, Sp, hd] makes the score/value einsums true (b, h)
    batch MXU dots — the sequence-major layout lowered to VPU
    multiply-reduce fusions running at ~half bandwidth, which ate the
    entire int8 saving.  Scales live in the score layout [B, H, Sp] so
    ``_decode_layer`` folds them into the scores (k) and the softmax
    probabilities (v); the dequantized tensor is never materialized (the
    int8→bf16 convert fuses into the dot)."""
    amax = jnp.max(jnp.abs(kv.astype(jnp.float32)), axis=-1)   # [B, Sp, H]
    scale = jnp.maximum(amax, 1e-8) / 127.0
    q = jnp.round(kv.astype(jnp.float32) / scale[..., None]).astype(jnp.int8)
    q = q.transpose(0, 2, 1, 3)
    scale = scale.transpose(0, 2, 1)
    # pad Sp to the decode-attention kernel's block multiple — or all the
    # way to ``total_len`` (chunked decode preallocates the cache at its
    # final length so later folds are same-shape in-place updates); pad
    # scales are 0 so padded K scores the kernel's additive bias alone
    # (−1e30) and padded V rows contribute nothing
    sp = q.shape[2]
    sp_pad = total_len if total_len is not None else -(-sp // 128) * 128
    assert sp_pad >= sp and sp_pad % 128 == 0, (sp, sp_pad)
    if sp_pad != sp:
        q = jnp.pad(q, ((0, 0), (0, 0), (0, sp_pad - sp), (0, 0)))
        scale = jnp.pad(scale, ((0, 0), (0, 0), (0, sp_pad - sp)))
    return {"q": q, "scale": scale}


def quantize_prompt_kv_int4(kv: jax.Array, total_len: Optional[int] = None
                            ) -> dict:
    """int4 variant of ``quantize_prompt_kv``: [B, Sp, H, hd] →
    ``{"q4": int8 [B, H, Sp_pad/2, hd], "scale": f32 [B, H, Sp_pad]}``.

    Packing is GROUP-LOCAL HALF-SPLIT along the sequence axis (the same
    shape trick as ``ops/quant.quantize_weight_int4``): within each
    256-position group, byte ``g*128 + r`` holds position ``g*256 + r``
    in its low nibble and ``g*256 + 128 + r`` in its high nibble.  The
    decode kernel then unpacks a 128-row slab with two shifts into two
    adjacent 128-position key tiles — no per-element interleave (which
    Mosaic lowers poorly), the minor dim stays hd=128 lanes, and because
    softmax is permutation-invariant over keys the kernel just folds each
    tile into the online-softmax state independently.

    Scale/mask/bias layouts are IDENTICAL to the int8 cache, so
    everything except the packed values (and the 256- instead of
    128-alignment of lengths/offsets) is shared with the kv8 path."""
    amax = jnp.max(jnp.abs(kv.astype(jnp.float32)), axis=-1)   # [B, Sp, H]
    scale = jnp.maximum(amax, 1e-8) / 7.0
    q = jnp.clip(jnp.round(kv.astype(jnp.float32) / scale[..., None]),
                 -8, 7).astype(jnp.int32)
    q = q.transpose(0, 2, 1, 3)                                # [B,H,Sp,hd]
    scale = scale.transpose(0, 2, 1)
    b, h, sp, hd = q.shape
    sp_pad = total_len if total_len is not None else -(-sp // 256) * 256
    assert sp_pad >= sp and sp_pad % 256 == 0, (sp, sp_pad)
    if sp_pad != sp:
        q = jnp.pad(q, ((0, 0), (0, 0), (0, sp_pad - sp), (0, 0)))
        scale = jnp.pad(scale, ((0, 0), (0, 0), (0, sp_pad - sp)))
    qg = q.reshape(b, h, sp_pad // 256, 256, hd)
    lo = qg[:, :, :, :128, :]
    hi = qg[:, :, :, 128:, :]
    packed = (hi * 16 + (lo & 0xF)).astype(jnp.int8)
    return {"q4": packed.reshape(b, h, sp_pad // 2, hd), "scale": scale}


def quantize_prompt_kv_int4_values(kv: jax.Array) -> dict:
    """int4 quantization WITHOUT packing: [B, Sp, H, hd] →
    ``{"qv": int32 [B, H, Sp, hd] in [-8, 7], "scale": f32 [B, H, Sp]}``
    (head-major, unpadded).  Used by gather-based folds that must write
    values at arbitrary per-row offsets — they rebuild packed bytes from
    (old nibble | gathered new value) elementwise, so they need the raw
    values, not a packed layout (engine/continuous.fold int4 path)."""
    amax = jnp.max(jnp.abs(kv.astype(jnp.float32)), axis=-1)   # [B, Sp, H]
    scale = jnp.maximum(amax, 1e-8) / 7.0
    q = jnp.clip(jnp.round(kv.astype(jnp.float32) / scale[..., None]),
                 -8, 7).astype(jnp.int32)
    return {"qv": q.transpose(0, 2, 1, 3), "scale": scale.transpose(0, 2, 1)}


def dequantize_prompt_kv_int4(pkq: dict) -> jax.Array:
    """Inverse of ``quantize_prompt_kv_int4`` (reference/test path) →
    head-major dequantized [B, H, Sp_pad, hd] f32."""
    packed, scale = pkq["q4"], pkq["scale"]
    b, h, sp2, hd = packed.shape
    p32 = packed.reshape(b, h, sp2 // 128, 128, hd).astype(jnp.int32)
    lo = ((p32 & 0xF) ^ 8) - 8
    hi = p32 >> 4
    q = jnp.concatenate([lo, hi], axis=3).reshape(b, h, 2 * sp2, hd)
    return q.astype(jnp.float32) * scale[..., None]


def quantize_prompt_kv_list(kv_list: list,
                            total_len: Optional[int] = None,
                            kv_bits: int = 8) -> list:
    """[(pk, pv), ...] → [(pk_q, pv_q), ...] for decode_forward_unrolled."""
    fn = quantize_prompt_kv if kv_bits == 8 else quantize_prompt_kv_int4
    assert kv_bits in (8, 4), kv_bits
    return [(fn(pk, total_len), fn(pv, total_len))
            for pk, pv in kv_list]


def append_suffix_to_prompt_kv(kv_list: list, suffix_list: list,
                               prompt_mask: jax.Array,
                               filled: jax.Array) -> tuple:
    """Fold a decode suffix buffer into the quantized prompt cache.

    The bf16 suffix carry grows linearly during generation and its
    attention cost with it (measured: 896-step rollouts average
    17.5 ms/step at B=8 vs 11.1 over the first 128 steps).  Chunked
    decode re-quantizes the suffix every ``chunk`` steps and appends it
    to the int8 head-major prompt cache, so the mutable carry stays
    small and the fused decode-attention kernel covers all older
    context.

    ``filled`` (scalar int) = number of suffix slots actually written;
    later slots are masked out via the returned mask.  The suffix length
    must be a multiple of 128 so the quantizer adds no internal padding.
    Returns ``(new_kv_list, new_prompt_mask)`` with the mask in CACHE
    layout (length == padded cache length)."""
    c = suffix_list[0][0].shape[1]
    new_kv = []
    for (pk, pv), (sk, sv) in zip(kv_list, suffix_list):
        qk = quantize_prompt_kv(sk)
        qv = quantize_prompt_kv(sv)
        assert qk["q"].shape[2] == c, (qk["q"].shape, c)
        new_kv.append((
            {"q": jnp.concatenate([pk["q"], qk["q"]], axis=2),
             "scale": jnp.concatenate([pk["scale"], qk["scale"]], axis=2)},
            {"q": jnp.concatenate([pv["q"], qv["q"]], axis=2),
             "scale": jnp.concatenate([pv["scale"], qv["scale"]], axis=2)},
        ))
    b = prompt_mask.shape[0]
    chunk_mask = (jax.lax.broadcasted_iota(jnp.int32, (1, c), 1)
                  < filled).astype(prompt_mask.dtype)
    new_mask = jnp.concatenate(
        [prompt_mask, jnp.broadcast_to(chunk_mask, (b, c))], axis=1)
    return new_kv, new_mask


def fold_suffix_into_prompt_kv(kv_list: list, suffix_list: list,
                               prompt_mask: jax.Array,
                               filled: jax.Array,
                               offset: jax.Array) -> tuple:
    """In-place variant of ``append_suffix_to_prompt_kv`` for a cache
    PREALLOCATED at final length (``quantize_prompt_kv_list(total_len=)``).

    The concat version reallocates the cache every fold and its jit can
    never alias input to output (shapes differ), so the fold transiently
    holds TWO full caches — that peak was the decode batch-size ceiling
    (B=12 at 7B OOM'd a 16 GB chip).  Here the suffix is written at
    ``offset`` with ``dynamic_update_slice``: same-shape outputs, so
    ``donate_argnums=(0,)`` makes the fold truly in-place, and because
    ``offset``/``filled`` are traced scalars every fold shares ONE
    compiled program.  The decode step keeps its cost proportional to
    the FILLED length via the kernel's static ``s_used`` watermark
    (ops/decode_attention.decode_attention_prompt)."""
    c = suffix_list[0][0].shape[1]
    int4 = "q4" in kv_list[0][0]
    new_kv = []
    for (pk, pv), (sk, sv) in zip(kv_list, suffix_list):
        if int4:
            # packed cache: values land at offset//2 on the packed axis
            # (offsets are 256-aligned by construction — prompt pad and
            # chunk are 256-multiples when kv_bits=4), scales at offset
            qk = quantize_prompt_kv_int4(sk)
            qv = quantize_prompt_kv_int4(sv)
            assert qk["q4"].shape[2] == c // 2, (qk["q4"].shape, c)
            new_kv.append(tuple(
                {"q4": jax.lax.dynamic_update_slice(
                    pc["q4"], qc["q4"], (0, 0, offset // 2, 0)),
                 "scale": jax.lax.dynamic_update_slice(
                     pc["scale"], qc["scale"], (0, 0, offset))}
                for pc, qc in ((pk, qk), (pv, qv))))
            continue
        qk = quantize_prompt_kv(sk)
        qv = quantize_prompt_kv(sv)
        assert qk["q"].shape[2] == c, (qk["q"].shape, c)
        new_kv.append((
            {"q": jax.lax.dynamic_update_slice(
                pk["q"], qk["q"], (0, 0, offset, 0)),
             "scale": jax.lax.dynamic_update_slice(
                 pk["scale"], qk["scale"], (0, 0, offset))},
            {"q": jax.lax.dynamic_update_slice(
                pv["q"], qv["q"], (0, 0, offset, 0)),
             "scale": jax.lax.dynamic_update_slice(
                 pv["scale"], qv["scale"], (0, 0, offset))},
        ))
    pos = jax.lax.broadcasted_iota(jnp.int32, prompt_mask.shape, 1)
    in_chunk = jnp.logical_and(pos >= offset, pos < offset + filled)
    new_mask = jnp.where(in_chunk, jnp.ones_like(prompt_mask), prompt_mask)
    return new_kv, new_mask


def _decode_layer(x, lp, ll, pk, pv, sk, sv, *, cfg, lora_scaling,
                  positions, step, suf_valid, pm, cos, sin, pbias=None,
                  sp_used=None):
    """One decoder layer's single-token step over (prompt, suffix) KV.

    ``pk``/``pv`` are either bf16 arrays [B, Sp, H, hd] or int8 dicts from
    ``quantize_prompt_kv`` (halved read bandwidth; scales folded into the
    scores/probs so no dequantized copy exists)."""
    b = x.shape[0]
    nh, nkv, hd = cfg.num_heads, cfg.num_kv_heads, cfg.head_dim
    scale = hd ** -0.5

    h = rms_norm(x, lp["attn_norm"], cfg.rms_norm_eps)
    q, k, v = _qkv_proj(h, lp, ll, cfg, lora_scaling)
    q = q.reshape(b, 1, nh, hd)
    k = k.reshape(b, 1, nkv, hd)
    v = v.reshape(b, 1, nkv, hd)
    q, k = apply_rope(q, k, cos, sin, positions[:, None])

    # write into the small suffix buffer at `step`
    sk = jax.lax.dynamic_update_slice(sk, k.astype(sk.dtype),
                                      (0, step, 0, 0))
    sv = jax.lax.dynamic_update_slice(sv, v.astype(sv.dtype),
                                      (0, step, 0, 0))

    qh = q[:, 0]                                         # [B, H, hd]
    ss_scores = jnp.einsum("bhd,bshd->bhs", qh, sk,
                           preferred_element_type=jnp.float32) * scale
    ss_scores = jnp.where(suf_valid, ss_scores, _NEG_INF)
    if isinstance(pk, dict):
        # int8/int4 prompt cache → fused Pallas kernel over the (big,
        # constant) prompt piece, flash-state merge with the (small,
        # mutable) bf16 suffix piece outside
        if "q4" in pk:
            from opadpo_tpu.ops.decode_attention import (
                decode_attention_prompt4,
            )
            out_p, m_p, l_p = decode_attention_prompt4(
                qh.astype(x.dtype), pk["q4"], pk["scale"], pv["q4"],
                pv["scale"], pbias, scale, s_used=sp_used)
        else:
            from opadpo_tpu.ops.decode_attention import (
                decode_attention_prompt,
            )
            out_p, m_p, l_p = decode_attention_prompt(
                qh.astype(x.dtype), pk["q"], pk["scale"], pv["q"],
                pv["scale"], pbias, scale, s_used=sp_used)
        m_s = jnp.max(ss_scores, axis=-1)                # [B, H]
        m = jnp.maximum(m_p, m_s)
        alpha_p = jnp.exp(m_p - m)
        p_s = jnp.exp(ss_scores - m[..., None])
        l = l_p * alpha_p + jnp.sum(p_s, axis=-1)
        out_s = jnp.einsum("bhs,bshd->bhd", p_s.astype(sv.dtype), sv,
                           preferred_element_type=jnp.float32)
        out = (out_p * alpha_p[..., None] + out_s) / l[..., None]
    else:
        sp_scores = jnp.einsum("bhd,bshd->bhs", qh, pk,
                               preferred_element_type=jnp.float32) * scale
        sp_scores = jnp.where(pm, sp_scores, _NEG_INF)
        sp_n = pk.shape[1]
        scores = jnp.concatenate([sp_scores, ss_scores], axis=-1)
        probs = jax.nn.softmax(scores, axis=-1)
        out = (jnp.einsum("bhs,bshd->bhd",
                          probs[..., :sp_n].astype(pv.dtype), pv,
                          preferred_element_type=jnp.float32)
               + jnp.einsum("bhs,bshd->bhd",
                            probs[..., sp_n:].astype(sv.dtype), sv,
                            preferred_element_type=jnp.float32))
    attn = out.reshape(b, 1, nh * hd).astype(x.dtype)
    x = x + lora_dense(attn, lp["wo"], tree_get(ll, "wo"), lora_scaling)
    h = rms_norm(x, lp["mlp_norm"], cfg.rms_norm_eps)
    x = x + _mlp_block(h, lp, ll, lora_scaling, cfg)
    return x, sk, sv


def _decode_layer_multi(x, lp, ll, pk, pv, sk, sv, *, cfg, lora_scaling,
                        positions, step, pm, cos, sin, pbias=None,
                        sp_used=None):
    """One decoder layer over G tokens at once (speculative verify).

    Identical contract to ``_decode_layer`` with a G axis: the G new
    tokens write KV rows ``[step, step+G)`` and attend causally within
    the group (query g sees suffix rows ≤ step+g) plus the whole prompt
    cache — which streams HBM→VMEM ONCE for all G queries
    (``decode_attention_prompt_multi``); that single read is the entire
    bandwidth argument for speculative decoding on this chip."""
    b, g = x.shape[0], x.shape[1]
    nh, nkv, hd = cfg.num_heads, cfg.num_kv_heads, cfg.head_dim
    assert nh == nkv, "speculative verify requires MHA (7B/13B are)"
    n_max = sk.shape[1]
    scale = hd ** -0.5

    h = rms_norm(x, lp["attn_norm"], cfg.rms_norm_eps)
    q, k, v = _qkv_proj(h, lp, ll, cfg, lora_scaling)
    q = q.reshape(b, g, nh, hd)
    k = k.reshape(b, g, nkv, hd)
    v = v.reshape(b, g, nkv, hd)
    pos_g = positions[:, None] + jnp.arange(g, dtype=positions.dtype)
    q, k = apply_rope(q, k, cos, sin, pos_g)

    sk = jax.lax.dynamic_update_slice(sk, k.astype(sk.dtype),
                                      (0, step, 0, 0))
    sv = jax.lax.dynamic_update_slice(sv, v.astype(sv.dtype),
                                      (0, step, 0, 0))

    qh = jnp.swapaxes(q, 1, 2)                       # [B, H, G, hd]
    ss_scores = jnp.einsum("bhgd,bshd->bhgs", qh, sk,
                           preferred_element_type=jnp.float32) * scale
    # suffix causality: query g sees rows <= step + g
    row = jax.lax.broadcasted_iota(jnp.int32, (g, n_max), 1)
    qi = jax.lax.broadcasted_iota(jnp.int32, (g, n_max), 0)
    suf_valid = (row <= step + qi)[None, None]       # [1, 1, G, n_max]
    ss_scores = jnp.where(suf_valid, ss_scores, _NEG_INF)
    if isinstance(pk, dict):
        from opadpo_tpu.ops.decode_attention import (
            decode_attention_prompt_multi,
        )
        assert "q4" not in pk, "speculative verify supports kv8/kv16"
        out_p, m_p, l_p = decode_attention_prompt_multi(
            qh.astype(x.dtype), pk["q"], pk["scale"], pv["q"],
            pv["scale"], pbias, scale, s_used=sp_used)
        m_s = jnp.max(ss_scores, axis=-1)            # [B, H, G]
        m = jnp.maximum(m_p, m_s)
        alpha_p = jnp.exp(m_p - m)
        p_s = jnp.exp(ss_scores - m[..., None])
        l = l_p * alpha_p + jnp.sum(p_s, axis=-1)
        out_s = jnp.einsum("bhgs,bshd->bhgd", p_s.astype(sv.dtype), sv,
                           preferred_element_type=jnp.float32)
        out = (out_p * alpha_p[..., None] + out_s) / l[..., None]
    else:
        sp_scores = jnp.einsum("bhgd,bshd->bhgs", qh, pk,
                               preferred_element_type=jnp.float32) * scale
        sp_scores = jnp.where(pm[:, :, None, :], sp_scores, _NEG_INF)
        sp_n = pk.shape[1]
        scores = jnp.concatenate([sp_scores, ss_scores], axis=-1)
        probs = jax.nn.softmax(scores, axis=-1)
        out = (jnp.einsum("bhgs,bshd->bhgd",
                          probs[..., :sp_n].astype(pv.dtype), pv,
                          preferred_element_type=jnp.float32)
               + jnp.einsum("bhgs,bshd->bhgd",
                            probs[..., sp_n:].astype(sv.dtype), sv,
                            preferred_element_type=jnp.float32))
    attn = jnp.swapaxes(out, 1, 2).reshape(b, g, nh * hd).astype(x.dtype)
    x = x + lora_dense(attn, lp["wo"], tree_get(ll, "wo"), lora_scaling)
    h = rms_norm(x, lp["mlp_norm"], cfg.rms_norm_eps)
    x = x + _mlp_block(h, lp, ll, lora_scaling, cfg)
    return x, sk, sv


def _decode_layer_multi_pr(x, lp, ll, pk, pv, rk, rv, ck, cv, *, cfg,
                           lora_scaling, positions, slot, raw_ok, w,
                           pm, cos, sin, pbias=None, sp_used=None):
    """Per-row speculative verify layer (see ``decode_forward_multi_pr``).

    Two suffix regions replace the single batch-uniform buffer:

    - ``rk/rv`` (raw): group-slot layout — every group writes its G rows
      at the SHARED offset ``slot`` (plain dynamic_update_slice, no
      per-row scatter); ``raw_ok [B, Craw]`` marks rows earlier groups
      accepted PER ROW, and the current group adds its own rows with
      in-group causality.  Rows a row rejected are simply never valid
      for that row — per-row acceptance becomes a mask problem instead
      of a layout problem, which is the TPU-friendly trade (measured
      rule: per-row-index gathers/scatters on [B,·,H,hd] tensors
      scalarize; masks and one-hot dots do not).
    - ``ck/cv`` (settled): compacted KV, row t = generated token t,
      valid below the per-row watermark ``w [B]``; written only by the
      periodic one-hot compaction (engine/speculative.py).
    """
    b, g = x.shape[0], x.shape[1]
    nh, nkv, hd = cfg.num_heads, cfg.num_kv_heads, cfg.head_dim
    assert nh == nkv, "speculative verify requires MHA (7B/13B are)"
    craw, ntot = rk.shape[1], ck.shape[1]
    scale = hd ** -0.5

    h = rms_norm(x, lp["attn_norm"], cfg.rms_norm_eps)
    q, k, v = _qkv_proj(h, lp, ll, cfg, lora_scaling)
    q = q.reshape(b, g, nh, hd)
    k = k.reshape(b, g, nkv, hd)
    v = v.reshape(b, g, nkv, hd)
    pos_g = positions[:, None] + jnp.arange(g, dtype=positions.dtype)
    q, k = apply_rope(q, k, cos, sin, pos_g)

    rk = jax.lax.dynamic_update_slice(rk, k.astype(rk.dtype),
                                      (0, slot, 0, 0))
    rv = jax.lax.dynamic_update_slice(rv, v.astype(rv.dtype),
                                      (0, slot, 0, 0))

    qh = jnp.swapaxes(q, 1, 2)                       # [B, H, G, hd]
    # raw region: prior accepted rows + this group's rows causally
    rs = jnp.einsum("bhgd,bshd->bhgs", qh, rk,
                    preferred_element_type=jnp.float32) * scale
    col = jax.lax.broadcasted_iota(jnp.int32, (g, craw), 1)
    qi = jax.lax.broadcasted_iota(jnp.int32, (g, craw), 0)
    ingroup = (col >= slot) & (col <= slot + qi)     # [G, Craw]
    r_valid = raw_ok[:, None, None, :] | ingroup[None, None]
    rs = jnp.where(r_valid, rs, _NEG_INF)
    # settled region: rows below the per-row watermark
    cs = jnp.einsum("bhgd,bshd->bhgs", qh, ck,
                    preferred_element_type=jnp.float32) * scale
    trow = jax.lax.broadcasted_iota(jnp.int32, (b, ntot), 1)
    c_valid = (trow < w[:, None])[:, None, None, :]  # [B, 1, 1, Ntot]
    cs = jnp.where(c_valid, cs, _NEG_INF)

    if isinstance(pk, dict):
        from opadpo_tpu.ops.decode_attention import (
            decode_attention_prompt_multi,
        )
        assert "q4" not in pk, "speculative verify supports kv8/kv16"
        out_p, m_p, l_p = decode_attention_prompt_multi(
            qh.astype(x.dtype), pk["q"], pk["scale"], pv["q"],
            pv["scale"], pbias, scale, s_used=sp_used)
        # three-way flash merge: prompt (kernel state) + raw + settled —
        # two einsums instead of a concat, which would copy the settled
        # buffer every group
        m_r = jnp.max(rs, axis=-1)
        m_c = jnp.max(cs, axis=-1)
        m = jnp.maximum(m_p, jnp.maximum(m_r, m_c))
        alpha_p = jnp.exp(m_p - m)
        p_r = jnp.exp(rs - m[..., None])
        p_c = jnp.exp(cs - m[..., None])
        l = (l_p * alpha_p + jnp.sum(p_r, axis=-1)
             + jnp.sum(p_c, axis=-1))
        out_rc = (jnp.einsum("bhgs,bshd->bhgd", p_r.astype(rv.dtype), rv,
                             preferred_element_type=jnp.float32)
                  + jnp.einsum("bhgs,bshd->bhgd", p_c.astype(cv.dtype),
                               cv, preferred_element_type=jnp.float32))
        out = (out_p * alpha_p[..., None] + out_rc) / l[..., None]
    else:
        sp_scores = jnp.einsum("bhgd,bshd->bhgs", qh, pk,
                               preferred_element_type=jnp.float32) * scale
        sp_scores = jnp.where(pm[:, :, None, :], sp_scores, _NEG_INF)
        sp_n = pk.shape[1]
        scores = jnp.concatenate([sp_scores, rs, cs], axis=-1)
        probs = jax.nn.softmax(scores, axis=-1)
        out = (jnp.einsum("bhgs,bshd->bhgd",
                          probs[..., :sp_n].astype(pv.dtype), pv,
                          preferred_element_type=jnp.float32)
               + jnp.einsum("bhgs,bshd->bhgd",
                            probs[..., sp_n:sp_n + craw].astype(rv.dtype),
                            rv, preferred_element_type=jnp.float32)
               + jnp.einsum("bhgs,bshd->bhgd",
                            probs[..., sp_n + craw:].astype(cv.dtype),
                            cv, preferred_element_type=jnp.float32))
    attn = jnp.swapaxes(out, 1, 2).reshape(b, g, nh * hd).astype(x.dtype)
    x = x + lora_dense(attn, lp["wo"], tree_get(ll, "wo"), lora_scaling)
    h = rms_norm(x, lp["mlp_norm"], cfg.rms_norm_eps)
    x = x + _mlp_block(h, lp, ll, lora_scaling, cfg)
    return x, rk, rv


def decode_forward_multi_pr(
    params: dict,                 # {"layer_list": [...]} (unstacked)
    cfg: LlamaConfig,
    embeds: jax.Array,            # [B, G, D] — carry token + G−1 drafts
    prompt_kv: list,              # L × (pk, pv) bf16 or int8 dicts
    prompt_mask: jax.Array,       # [B, Sp]
    raw_kv: list,                 # L × (rk [B, Craw, H, hd], rv)
    settled_kv: list,             # L × (ck [B, Ntot, H, hd], cv)
    slot: jax.Array,              # scalar: this group's raw write slot
    raw_ok: jax.Array,            # [B, Craw] — prior accepted raw rows
    w: jax.Array,                 # [B] settled watermark (valid rows)
    positions: jax.Array,         # [B] RoPE position of embeds[:, 0]
    lora: Optional[dict] = None,
    lora_scaling: float = 1.0,
    sp_used: Optional[int] = None,
) -> Tuple[jax.Array, list]:
    """G-token verify forward with PER-ROW acceptance support →
    (logits [B, G, V], raw_kv).  Unlike ``decode_forward_multi`` (shared
    min-over-batch advance), per-row acceptance state lives in masks
    (``raw_ok``, ``w``) over a group-slot raw buffer plus a compacted
    settled buffer — see ``engine/speculative.decode_loop_spec`` with
    ``advance="per_row"``."""
    cos, sin = rope_frequencies(cfg.head_dim,
                                int(cfg.max_position_embeddings),
                                cfg.rope_base, dtype=jnp.float32)
    pm = (prompt_mask != 0)[:, None, :]
    pbias = None
    if isinstance(prompt_kv[0][0], dict):
        sp_pad = prompt_kv[0][0]["scale"].shape[2]
        sp = prompt_mask.shape[1]
        pbias = jnp.pad(
            jnp.where(prompt_mask != 0, 0.0, _NEG_INF).astype(jnp.float32),
            ((0, 0), (0, sp_pad - sp)), constant_values=_NEG_INF)
    kw = dict(cfg=cfg, lora_scaling=lora_scaling, positions=positions,
              slot=slot, raw_ok=raw_ok, w=w, pm=pm, cos=cos, sin=sin,
              pbias=pbias, sp_used=sp_used)

    lora_list = tree_get(lora, "layer_list")
    x = embeds
    new_raw = []
    for i, lp in enumerate(params["layer_list"]):
        ll = lora_list[i] if lora_list is not None else None
        pk, pv = prompt_kv[i]
        rk, rv = raw_kv[i]
        ck, cv = settled_kv[i]
        x, rk, rv = _decode_layer_multi_pr(x, lp, ll, pk, pv, rk, rv,
                                           ck, cv, **kw)
        new_raw.append((rk, rv))
    logits = _decode_head_multi(x, params, lora, cfg, lora_scaling)
    return logits, new_raw


def quantize_head_for_decode(params: dict, bits: int) -> dict:
    """Quantize ``lm_head`` in a DECODE-ONLY param layout.  The reference
    (and ``quant.quantize_params``) always skips lm_head — training and
    scoring keep that; but the decode loop re-reads the 262 MB bf16 head
    every token (~350 us/step at B=4, profiled), so samplers may opt in
    via ``head_bits``."""
    from opadpo_tpu.ops import quant
    if bits == 16 or isinstance(params.get("lm_head"), dict):
        return params
    new = dict(params)
    if bits == 8:
        new["lm_head"] = quant.quantize_weight(params["lm_head"])
    elif bits == 4:
        new["lm_head"] = quant.quantize_weight_int4(params["lm_head"])
    else:
        raise ValueError(f"head_bits={bits}")
    return new


def _decode_head(x, params, lora, cfg, lora_scaling):
    x = rms_norm(x, params["final_norm"], cfg.rms_norm_eps)
    head = params["lm_head"]
    if isinstance(head, dict):
        from opadpo_tpu.ops import quant
        x2 = x.reshape(-1, x.shape[-1])
        if "q4" in head:
            l2 = quant.quant_matmul4(x2, head, out_dtype=jnp.float32)
        else:
            l2 = quant.quant_matmul(x2, head, out_dtype=jnp.float32)
        logits = l2.reshape(*x.shape[:-1], -1)[:, 0]
    else:
        logits = jnp.einsum("bsd,dv->bsv", x, head,
                            preferred_element_type=jnp.float32)[:, 0]
    head_lora = tree_get(lora, "lm_head")
    if head_lora is not None:
        xa = jnp.einsum("bsd,dr->bsr", x, head_lora["a"],
                        preferred_element_type=jnp.float32)
        logits = logits + jnp.einsum(
            "bsr,rv->bsv", xa.astype(head_lora["b"].dtype), head_lora["b"],
            preferred_element_type=jnp.float32)[:, 0] * lora_scaling
    return logits


def _decode_head_multi(x, params, lora, cfg, lora_scaling):
    """``_decode_head`` over all G positions → logits [B, G, V]."""
    x = rms_norm(x, params["final_norm"], cfg.rms_norm_eps)
    head = params["lm_head"]
    if isinstance(head, dict):
        from opadpo_tpu.ops import quant
        x2 = x.reshape(-1, x.shape[-1])
        if "q4" in head:
            l2 = quant.quant_matmul4(x2, head, out_dtype=jnp.float32)
        else:
            l2 = quant.quant_matmul(x2, head, out_dtype=jnp.float32)
        logits = l2.reshape(*x.shape[:-1], -1)
    else:
        logits = jnp.einsum("bsd,dv->bsv", x, head,
                            preferred_element_type=jnp.float32)
    head_lora = tree_get(lora, "lm_head")
    if head_lora is not None:
        xa = jnp.einsum("bsd,dr->bsr", x, head_lora["a"],
                        preferred_element_type=jnp.float32)
        logits = logits + jnp.einsum(
            "bsr,rv->bsv", xa.astype(head_lora["b"].dtype), head_lora["b"],
            preferred_element_type=jnp.float32) * lora_scaling
    return logits


def decode_forward_split(
    params: dict,
    cfg: LlamaConfig,
    embeds: jax.Array,            # [B, 1, D]
    prompt_kv: dict,              # {"k","v"} [L, B, Sp, H, hd] (read-only)
    prompt_mask: jax.Array,       # [B, Sp]
    suffix_kv: dict,              # {"k","v"} [L, B, Nmax, H, hd] (carry)
    step: jax.Array,              # scalar: index into the suffix buffer
    positions: jax.Array,         # [B] RoPE position of the new token
    lora: Optional[dict] = None,
    lora_scaling: float = 1.0,
) -> Tuple[jax.Array, dict]:
    """One-token decode over the split cache → (logits [B, V], suffix_kv)."""
    n_max = suffix_kv["k"].shape[2]
    cos, sin = rope_frequencies(cfg.head_dim,
                                int(cfg.max_position_embeddings),
                                cfg.rope_base, dtype=jnp.float32)
    # suffix validity: slots 0..step inclusive (the new token attends to
    # itself)
    suf_valid = (jax.lax.broadcasted_iota(jnp.int32, (n_max,), 0)
                 <= step)[None, None, :]                     # [1, 1, Nmax]
    pm = (prompt_mask != 0)[:, None, :]                      # [B, 1, Sp]
    kw = dict(cfg=cfg, lora_scaling=lora_scaling, positions=positions,
              step=step, suf_valid=suf_valid, pm=pm, cos=cos, sin=sin)

    lora_layers = tree_get(lora, "layers")
    has_lora = lora_layers is not None
    layers = params["layers"]

    if has_lora:
        xs = (layers, lora_layers, prompt_kv["k"], prompt_kv["v"],
              suffix_kv["k"], suffix_kv["v"])

        def body(x, sc):
            lp, ll, pk, pv, sk, sv = sc
            x, sk, sv = _decode_layer(x, lp, ll, pk, pv, sk, sv, **kw)
            return x, (sk, sv)
    else:
        xs = (layers, prompt_kv["k"], prompt_kv["v"],
              suffix_kv["k"], suffix_kv["v"])

        def body(x, sc):
            lp, pk, pv, sk, sv = sc
            x, sk, sv = _decode_layer(x, lp, None, pk, pv, sk, sv, **kw)
            return x, (sk, sv)

    x, new_suffix = jax.lax.scan(body, embeds, xs)
    logits = _decode_head(x, params, lora, cfg, lora_scaling)
    return logits, {"k": new_suffix[0], "v": new_suffix[1]}


def forward_prefill_unrolled(
    params: dict,                 # from unstack_layers
    cfg: LlamaConfig,
    input_embeds: jax.Array,      # [B, S, D]
    key_mask: jax.Array,          # [B, S]
    positions: jax.Array,         # [B, S]
    lora: Optional[dict] = None,  # unstacked too
    lora_scaling: float = 1.0,
    attn_impl: str = "auto",
) -> Tuple[jax.Array, list]:
    """Prompt pass over per-layer params → (last-position logits [B, V],
    per-layer [(k, v), ...] prompt KV).  Companion to
    ``decode_forward_unrolled``: together they keep exactly ONE copy of
    the weights on device (the per-layer layout), instead of a stacked
    copy for the scan prefill plus an unstacked one for decode."""
    b, s, d = input_embeds.shape
    nh, nkv, hd = cfg.num_heads, cfg.num_kv_heads, cfg.head_dim
    cos, sin = rope_frequencies(cfg.head_dim,
                                int(cfg.max_position_embeddings),
                                cfg.rope_base, dtype=jnp.float32)
    lora_list = tree_get(lora, "layer_list")

    x = input_embeds
    kv_list = []
    for i, lp in enumerate(params["layer_list"]):
        ll = lora_list[i] if lora_list is not None else None
        h = rms_norm(x, lp["attn_norm"], cfg.rms_norm_eps)
        q, k, v = _qkv_proj(h, lp, ll, cfg, lora_scaling)
        q = q.reshape(b, s, nh, hd)
        k = k.reshape(b, s, nkv, hd)
        v = v.reshape(b, s, nkv, hd)
        q, k = apply_rope(q, k, cos, sin, positions)
        kv_list.append((k, v))
        kk, vv = k, v
        if nkv != nh:
            rep = nh // nkv
            kk = jnp.repeat(kk, rep, axis=2)
            vv = jnp.repeat(vv, rep, axis=2)
        attn = multi_head_attention(q, kk, vv, key_mask=key_mask,
                                    causal=True, impl=attn_impl)
        attn = attn.reshape(b, s, nh * hd)
        x = x + lora_dense(attn, lp["wo"], tree_get(ll, "wo"), lora_scaling)
        h = rms_norm(x, lp["mlp_norm"], cfg.rms_norm_eps)
        x = x + _mlp_block(h, lp, ll, lora_scaling, cfg)

    logits = _decode_head(x[:, -1:, :], params, lora, cfg, lora_scaling)
    return logits, kv_list


def decode_forward_unrolled(
    params: dict,                 # from unstack_layers: {"layer_list": [...]}
    cfg: LlamaConfig,
    embeds: jax.Array,            # [B, 1, D]
    prompt_kv: list,              # L × (pk [B, Sp, H, hd], pv)
    prompt_mask: jax.Array,       # [B, Sp]
    suffix_kv: list,              # L × (sk [B, Nmax, H, hd], sv)  (carry)
    step: jax.Array,
    positions: jax.Array,         # [B]
    lora: Optional[dict] = None,  # from unstack_layers too, if present
    lora_scaling: float = 1.0,
    sp_used: Optional[int] = None,   # static fill watermark (chunked)
) -> Tuple[jax.Array, list]:
    """One-token decode with a PYTHON loop over per-layer params.

    Weights (and the prompt KV) are distinct loop constants instead of
    scanned stacked arrays — no per-step dynamic-slice copies of the whole
    base (profiled: the scan version re-copied the full int8 7B every
    decode step, 8.8 of 17.9 ms at B=4).
    """
    n_max = suffix_kv[0][0].shape[1]
    cos, sin = rope_frequencies(cfg.head_dim,
                                int(cfg.max_position_embeddings),
                                cfg.rope_base, dtype=jnp.float32)
    suf_valid = (jax.lax.broadcasted_iota(jnp.int32, (n_max,), 0)
                 <= step)[None, None, :]
    pm = (prompt_mask != 0)[:, None, :]
    pbias = None
    if isinstance(prompt_kv[0][0], dict):
        # additive prompt bias for the fused decode-attention kernel,
        # in the cache's padded length (pads invalid); the scale array
        # carries the UNPACKED length for both the int8 and int4 caches
        sp_pad = prompt_kv[0][0]["scale"].shape[2]
        sp = prompt_mask.shape[1]
        pbias = jnp.pad(
            jnp.where(prompt_mask != 0, 0.0, _NEG_INF).astype(jnp.float32),
            ((0, 0), (0, sp_pad - sp)), constant_values=_NEG_INF)
    kw = dict(cfg=cfg, lora_scaling=lora_scaling, positions=positions,
              step=step, suf_valid=suf_valid, pm=pm, cos=cos, sin=sin,
              pbias=pbias, sp_used=sp_used)

    lora_list = tree_get(lora, "layer_list")
    x = embeds
    new_suffix = []
    for i, lp in enumerate(params["layer_list"]):
        ll = lora_list[i] if lora_list is not None else None
        pk, pv = prompt_kv[i]
        sk, sv = suffix_kv[i]
        x, sk, sv = _decode_layer(x, lp, ll, pk, pv, sk, sv, **kw)
        new_suffix.append((sk, sv))
    logits = _decode_head(x, params, lora, cfg, lora_scaling)
    return logits, new_suffix


def decode_forward_multi(
    params: dict,                 # {"layer_list": [...]} (unstacked)
    cfg: LlamaConfig,
    embeds: jax.Array,            # [B, G, D] — carry token + G−1 drafts
    prompt_kv: list,              # L × (pk, pv) bf16 or int8 dicts
    prompt_mask: jax.Array,       # [B, Sp]
    suffix_kv: list,              # L × (sk [B, Nmax, H, hd], sv)
    step: jax.Array,              # scalar: first suffix slot this group
    positions: jax.Array,         # [B] RoPE position of embeds[:, 0]
    lora: Optional[dict] = None,
    lora_scaling: float = 1.0,
    sp_used: Optional[int] = None,
) -> Tuple[jax.Array, list]:
    """G-token decode forward (speculative verify) → (logits [B, G, V],
    suffix).  Weights and the prompt cache stream ONCE for all G
    positions — on this bandwidth-bound chip that makes verifying G
    drafts cost ≈ one normal decode step (engine/speculative.py).
    Group KV lands at suffix rows ``[step, step+G)``; the caller
    advances ``step`` by the number of ACCEPTED+1 tokens so rejected
    rows are overwritten by the next group (batch-synchronized layout,
    no per-row scatter)."""
    cos, sin = rope_frequencies(cfg.head_dim,
                                int(cfg.max_position_embeddings),
                                cfg.rope_base, dtype=jnp.float32)
    pm = (prompt_mask != 0)[:, None, :]
    pbias = None
    if isinstance(prompt_kv[0][0], dict):
        sp_pad = prompt_kv[0][0]["scale"].shape[2]
        sp = prompt_mask.shape[1]
        pbias = jnp.pad(
            jnp.where(prompt_mask != 0, 0.0, _NEG_INF).astype(jnp.float32),
            ((0, 0), (0, sp_pad - sp)), constant_values=_NEG_INF)
    kw = dict(cfg=cfg, lora_scaling=lora_scaling, positions=positions,
              step=step, pm=pm, cos=cos, sin=sin, pbias=pbias,
              sp_used=sp_used)

    lora_list = tree_get(lora, "layer_list")
    x = embeds
    new_suffix = []
    for i, lp in enumerate(params["layer_list"]):
        ll = lora_list[i] if lora_list is not None else None
        pk, pv = prompt_kv[i]
        sk, sv = suffix_kv[i]
        x, sk, sv = _decode_layer_multi(x, lp, ll, pk, pv, sk, sv, **kw)
        new_suffix.append((sk, sv))
    logits = _decode_head_multi(x, params, lora, cfg, lora_scaling)
    return logits, new_suffix


