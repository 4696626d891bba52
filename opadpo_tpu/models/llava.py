"""LLaVA-1.5 assembly: CLIP tower → mm_projector → LLaMA decoder with
image-token splicing.

The reference's ``LlavaLlamaForCausalLM`` splices 576 projected patch
embeddings at the position of ``IMAGE_TOKEN_INDEX`` (-200) inside
``prepare_inputs_for_generation`` / ``llava_arch.py`` (SURVEY §2.9).  Under
jit, variable-position insertion must keep static shapes, so the splice is
a per-row *gather*: for output position p with splice point q,

    p < q          → text token p
    q ≤ p < q+576  → image patch p-q
    p ≥ q+576      → text token p-575

computed with broadcasted iota + ``take_along_axis`` — no dynamic shapes,
fully vectorized (SURVEY §7 "hard parts": image-token splicing under jit).

The CoPO "attention" masking method (reference ``dpo_trainer.py:307-323``)
feeds a per-patch validity mask; it is spliced into the sequence key mask
the same way, and position ids are ``cumsum(mask)-1`` of the spliced mask,
matching the patched HF model's behavior with masked patches.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp

from opadpo_tpu.constants import IGNORE_INDEX, IMAGE_TOKEN_INDEX
from opadpo_tpu.models import clip as clip_model
from opadpo_tpu.models import llama as llama_model
from opadpo_tpu.models import projector as projector_model
from opadpo_tpu.models.lora import LoraConfig, tree_get


@dataclasses.dataclass(frozen=True)
class LlavaConfig:
    llama: llama_model.LlamaConfig
    vision: clip_model.ClipVisionConfig
    projector: projector_model.ProjectorConfig
    # Training-free visual-token pruning (inference accelerator): keep
    # only the top-K projected patch tokens by feature norm, shrinking
    # every downstream sequence (prompt cache, scoring length) by
    # 576-K.  None/576 = off (reference numerics).  Motivated by the
    # freePruner / attention-aware token-filtering line of work
    # (arxiv 2411.15446, 2506.01519); norm-based selection is the
    # attention-free proxy available without materializing CLIP
    # attention probabilities (the flash path never forms them).
    visual_tokens: Optional[int] = None

    @staticmethod
    def llava_7b() -> "LlavaConfig":
        lm = llama_model.LlamaConfig.llava_7b()
        vis = clip_model.ClipVisionConfig()
        return LlavaConfig(lm, vis, projector_model.ProjectorConfig(
            in_dim=vis.hidden_size, out_dim=lm.hidden_size))

    @staticmethod
    def llava_13b() -> "LlavaConfig":
        lm = llama_model.LlamaConfig.llava_13b()
        vis = clip_model.ClipVisionConfig()
        return LlavaConfig(lm, vis, projector_model.ProjectorConfig(
            in_dim=vis.hidden_size, out_dim=lm.hidden_size))

    @staticmethod
    def tiny(vocab_size: int = 512) -> "LlavaConfig":
        """Random-weights debug model (reference ``skip_loading_weights``)."""
        lm = llama_model.LlamaConfig.tiny(vocab_size)
        vis = clip_model.ClipVisionConfig.tiny()
        return LlavaConfig(lm, vis, projector_model.ProjectorConfig(
            in_dim=vis.hidden_size, out_dim=lm.hidden_size))

    @property
    def num_patches(self) -> int:
        """Patch tokens actually spliced into the sequence — everything
        downstream (splice, cache sizes, samplers, engines) keys off
        this, so ``visual_tokens`` shrinks the whole pipeline."""
        if self.visual_tokens:
            return min(self.visual_tokens, self.vision.num_patches)
        return self.vision.num_patches


def init_params(key: jax.Array, cfg: LlavaConfig) -> dict:
    k1, k2, k3 = jax.random.split(key, 3)
    return {
        "llama": llama_model.init_params(k1, cfg.llama),
        "vision": clip_model.init_params(k2, cfg.vision),
        "projector": projector_model.init_params(k3, cfg.projector),
    }


def init_params_quantized(key: jax.Array, cfg: LlavaConfig,
                          bits: int = 8) -> dict:
    """Random-init params directly in quantized form, one jit program per
    leaf subtree.

    A single fused init->quantize program peaks at bf16 + int8 HBM
    simultaneously (measured: OOMs a 16 GB chip at 7B); per piece, XLA
    dead-code-eliminates every other tensor's init (each has its own
    split key), so the peak is one bf16 layer stack (~2.9 GB at 7B) plus
    its quantized form.  Used by ``skip_loading_weights`` full-scale runs
    (the reference's debug hook, ``checkpoint_utils.py:64-66``) and the
    quality benchmark."""
    from opadpo_tpu.ops import quant

    shapes = jax.eval_shape(
        lambda: quant.quantize_params(init_params(key, cfg), bits=bits))

    def piece(path):
        def f():
            q = quant.quantize_params(init_params(key, cfg), bits=bits)
            for k in path:
                q = q[k]
            return q
        return jax.jit(f)()

    def is_quant_leaf(d):
        return isinstance(d, dict) and set(d) <= {"q", "q4", "scale"}

    def build(node, path):
        if isinstance(node, dict) and not is_quant_leaf(node):
            return {k: build(v, path + [k]) for k, v in node.items()}
        return piece(path)

    return {top: build(sub, [top]) for top, sub in shapes.items()}


def init_lora(key: jax.Array, cfg: LlavaConfig, lora_cfg: LoraConfig,
              include_vision: bool = False) -> dict:
    """Named adapter pytree.  ``include_vision`` mirrors the OPA recipe's
    TUNE_VISION_TOWER=True (run/train_opa.sh:50); the DPO stage tunes the
    language side only."""
    k1, k2 = jax.random.split(key)
    lora = {"llama": llama_model.init_lora(k1, cfg.llama, lora_cfg)}
    if include_vision:
        from opadpo_tpu.models.lora import init_lora_entry
        la = cfg.vision.num_active_layers
        d, i = cfg.vision.hidden_size, cfg.vision.intermediate_size
        ks = jax.random.split(k2, 8)
        lora["vision"] = {"layers": {
            "wq": init_lora_entry(ks[0], d, d, lora_cfg, stacked=la),
            "wk": init_lora_entry(ks[1], d, d, lora_cfg, stacked=la),
            "wv": init_lora_entry(ks[2], d, d, lora_cfg, stacked=la),
            "wo": init_lora_entry(ks[3], d, d, lora_cfg, stacked=la),
            "fc1": init_lora_entry(ks[4], d, i, lora_cfg, stacked=la),
            "fc2": init_lora_entry(ks[5], i, d, lora_cfg, stacked=la),
        }}
        lora["projector"] = {
            "fc1": init_lora_entry(ks[6], cfg.projector.in_dim,
                                   cfg.projector.out_dim, lora_cfg),
            "fc2": init_lora_entry(ks[7], cfg.projector.out_dim,
                                   cfg.projector.out_dim, lora_cfg),
        }
    return lora


def encode_images(params: dict, cfg: LlavaConfig, images: jax.Array,
                  lora: Optional[dict] = None, lora_scaling: float = 1.0,
                  image_key_mask: Optional[jax.Array] = None,
                  attn_impl: str = "auto") -> jax.Array:
    """[B, H, W, 3] → projected patch features [B, num_patches, hidden].

    With ``cfg.visual_tokens`` set, keeps only the top-K patches by
    projected-feature L2 norm (sorted back to spatial order) — see the
    LlavaConfig field comment.  Incompatible with CoPO's per-patch
    ``image_key_mask`` (mask indices refer to the full patch grid)."""
    k = cfg.num_patches
    if k < cfg.vision.num_patches and image_key_mask is not None:
        # must be checked BEFORE clip.forward consumes the mask: a CoPO
        # mask is sized [B, cfg.num_patches] = [B, K] and would fail with
        # an opaque shape error against the full patch grid inside CLIP
        raise ValueError(
            "visual_tokens pruning does not compose with image_key_mask "
            "(CoPO attention masking indexes the full patch grid)")
    feats = clip_model.forward(
        params["vision"], cfg.vision, images,
        lora=tree_get(lora, "vision"), lora_scaling=lora_scaling,
        image_key_mask=image_key_mask, attn_impl=attn_impl)
    proj = projector_model.forward(
        params["projector"], feats,
        lora=tree_get(lora, "projector"), lora_scaling=lora_scaling)
    if k < proj.shape[1]:
        score = jnp.sum(jnp.square(proj.astype(jnp.float32)), axis=-1)
        _, idx = jax.lax.top_k(score, k)                  # [B, K]
        idx = jnp.sort(idx, axis=1)                       # spatial order
        proj = jnp.take_along_axis(proj, idx[:, :, None], axis=1)
    return proj


def splice_positions(input_ids: jax.Array) -> jax.Array:
    """Index of the image token per row, [B]."""
    return jnp.argmax(input_ids == IMAGE_TOKEN_INDEX, axis=1)


def _gather_indices(splice_pos: jax.Array, text_len: int, num_patches: int
                    ) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """(is_image [B,S], text_idx [B,S], image_idx [B,S]) for the splice."""
    s_out = text_len - 1 + num_patches
    p = jax.lax.broadcasted_iota(jnp.int32, (splice_pos.shape[0], s_out), 1)
    q = splice_pos[:, None]
    is_image = jnp.logical_and(p >= q, p < q + num_patches)
    text_idx = jnp.clip(jnp.where(p < q, p, p - (num_patches - 1)),
                        0, text_len - 1)
    image_idx = jnp.clip(p - q, 0, num_patches - 1)
    return is_image, text_idx, image_idx


def splice_sequence(
    text_embeds: jax.Array,     # [B, L, D]
    image_feats: jax.Array,     # [B, P, D]
    text_mask: jax.Array,       # [B, L]
    splice_pos: jax.Array,      # [B]
    image_mask: Optional[jax.Array] = None,   # [B, P] (CoPO attention)
    text_labels: Optional[jax.Array] = None,  # [B, L] (SFT)
) -> Tuple[jax.Array, jax.Array, Optional[jax.Array]]:
    """Returns (embeds [B,S,D], key_mask [B,S], labels [B,S]|None)."""
    b, l, d = text_embeds.shape
    p = image_feats.shape[1]
    is_image, text_idx, image_idx = _gather_indices(splice_pos, l, p)

    gath_text = jnp.take_along_axis(text_embeds, text_idx[..., None], axis=1)
    gath_img = jnp.take_along_axis(image_feats, image_idx[..., None], axis=1)
    embeds = jnp.where(is_image[..., None], gath_img, gath_text)

    tmask = jnp.take_along_axis(text_mask.astype(jnp.int32), text_idx, axis=1)
    if image_mask is None:
        imask = jnp.ones_like(tmask)
    else:
        imask = jnp.take_along_axis(image_mask.astype(jnp.int32), image_idx,
                                    axis=1)
    key_mask = jnp.where(is_image, imask, tmask)

    labels = None
    if text_labels is not None:
        tlab = jnp.take_along_axis(text_labels, text_idx, axis=1)
        labels = jnp.where(is_image, IGNORE_INDEX, tlab)
    return embeds, key_mask, labels


def forward(
    params: dict,
    cfg: LlavaConfig,
    input_ids: jax.Array,       # [B, L] with one IMAGE_TOKEN_INDEX per row
    text_mask: jax.Array,       # [B, L]
    images: jax.Array,          # [B, H, W, 3]
    lora: Optional[dict] = None,
    lora_scaling: float = 1.0,
    image_key_mask: Optional[jax.Array] = None,
    labels: Optional[jax.Array] = None,
    remat: bool = True,
    attn_impl: str = "auto",
    return_hidden: bool = False,
) -> dict:
    """Full-sequence forward (training / scoring).

    Returns dict(logits [B,S,V] f32, key_mask [B,S], labels [B,S]|None)
    over the spliced sequence of length L-1+num_patches; with
    ``return_hidden`` the dict carries 'hidden' [B,S,D] instead of
    'logits' (for the chunked lm_head readout, ops/logprobs.py).
    """
    image_feats = encode_images(params, cfg, images, lora, lora_scaling,
                                attn_impl=attn_impl)
    text_embeds = llama_model.embed_tokens(params["llama"], input_ids)
    pos = splice_positions(input_ids)
    embeds, key_mask, spliced_labels = splice_sequence(
        text_embeds, image_feats.astype(text_embeds.dtype), text_mask, pos,
        image_mask=image_key_mask, text_labels=labels)
    positions = jnp.maximum(jnp.cumsum(key_mask, axis=1) - 1, 0).astype(jnp.int32)
    out, _ = llama_model.forward(
        params["llama"], cfg.llama, embeds, key_mask, positions,
        lora=tree_get(lora, "llama"), lora_scaling=lora_scaling,
        remat=remat, attn_impl=attn_impl, return_hidden=return_hidden)
    key = "hidden" if return_hidden else "logits"
    return {key: out, "key_mask": key_mask, "labels": spliced_labels}


def prefill(
    params: dict,
    cfg: LlavaConfig,
    input_ids: jax.Array,       # [B, L] prompt (queries only)
    text_mask: jax.Array,
    images: jax.Array,
    cache_len: int,
    lora: Optional[dict] = None,
    lora_scaling: float = 1.0,
    attn_impl: str = "auto",
) -> dict:
    """Prompt pass for sampling. Returns dict(cache, last_logits [B,V],
    key_mask [B, cache_len], positions_next [B])."""
    b, l = input_ids.shape
    image_feats = encode_images(params, cfg, images, lora, lora_scaling,
                                attn_impl=attn_impl)
    text_embeds = llama_model.embed_tokens(params["llama"], input_ids)
    pos = splice_positions(input_ids)
    embeds, key_mask, _ = splice_sequence(
        text_embeds, image_feats.astype(text_embeds.dtype), text_mask, pos)
    s_prompt = embeds.shape[1]
    positions = jnp.maximum(jnp.cumsum(key_mask, axis=1) - 1, 0).astype(jnp.int32)

    cache = llama_model.init_kv_cache(cfg.llama, b, cache_len)
    full_mask = jnp.zeros((b, cache_len), jnp.int32)
    full_mask = full_mask.at[:, :s_prompt].set(key_mask)

    logits, cache = llama_model.forward(
        params["llama"], cfg.llama, embeds, full_mask[:, :s_prompt], positions,
        lora=tree_get(lora, "llama"), lora_scaling=lora_scaling,
        cache=cache, remat=False, attn_impl=attn_impl, last_logit_only=True)
    return {
        "cache": cache,
        "last_logits": logits[:, -1, :],
        "key_mask": full_mask,
        "next_position": positions[:, -1] + 1,
    }


def decode_step(
    params: dict,
    cfg: LlavaConfig,
    token_ids: jax.Array,       # [B] or [B,1]
    cache: dict,
    key_mask: jax.Array,        # [B, cache_len] validity incl. new slot
    positions: jax.Array,       # [B] RoPE position for this token
    lora: Optional[dict] = None,
    lora_scaling: float = 1.0,
) -> Tuple[jax.Array, dict]:
    """One sampled-token forward over the static cache → (logits [B,V], cache)."""
    if token_ids.ndim == 1:
        token_ids = token_ids[:, None]
    embeds = llama_model.embed_tokens(params["llama"], token_ids)
    logits, cache = llama_model.forward(
        params["llama"], cfg.llama, embeds, key_mask, positions[:, None],
        lora=tree_get(lora, "llama"), lora_scaling=lora_scaling,
        cache=cache, remat=False)
    return logits[:, 0, :], cache


def unstack_for_decode(params: dict, lora: Optional[dict] = None
                       ) -> Tuple[dict, Optional[dict]]:
    """Per-layer (unrolled) weight layout for the decode hot loop — see
    llama.unstack_layers.  Returns new (params, lora) pytrees; callers
    should drop their stacked references so the duplicates free."""
    new_params = dict(params)
    new_params["llama"] = llama_model.unstack_layers(params["llama"])
    new_lora = None
    if lora is not None:
        new_lora = dict(lora)
        if "llama" in lora:
            new_lora["llama"] = llama_model.unstack_layers(lora["llama"])
    return new_params, new_lora


def prefill_unrolled(
    params: dict,               # from unstack_for_decode
    cfg: LlavaConfig,
    input_ids: jax.Array,
    text_mask: jax.Array,
    images: jax.Array,
    lora: Optional[dict] = None,
    lora_scaling: float = 1.0,
    attn_impl: str = "auto",
    quantize_kv: bool = False,
    kv_total_len: Optional[int] = None,
    kv_bits: int = 8,
) -> dict:
    """Prompt pass over per-layer weights → dict(kv_list, last_logits,
    key_mask [B, Sp], next_position).

    ``quantize_kv`` runs llama.quantize_prompt_kv_list INSIDE the traced
    program, so the bf16 prompt cache is a per-layer intermediate XLA can
    free rather than a program output — the full bf16 cache (6.4 GB at 7B
    B=8, Sp≈800) never sits in HBM next to the int8 one.  This is what
    sets the decode batch-size ceiling on a 16 GB chip.  ``kv_total_len``
    preallocates the quantized cache at its final (chunked-decode)
    length so later folds are same-shape in-place updates
    (llama.fold_suffix_into_prompt_kv)."""
    image_feats = encode_images(params, cfg, images, lora, lora_scaling,
                                attn_impl=attn_impl)
    text_embeds = llama_model.embed_tokens(params["llama"], input_ids)
    pos = splice_positions(input_ids)
    embeds, key_mask, _ = splice_sequence(
        text_embeds, image_feats.astype(text_embeds.dtype), text_mask, pos)
    positions = jnp.maximum(jnp.cumsum(key_mask, axis=1) - 1, 0
                            ).astype(jnp.int32)
    logits, kv_list = llama_model.forward_prefill_unrolled(
        params["llama"], cfg.llama, embeds, key_mask, positions,
        lora=tree_get(lora, "llama"), lora_scaling=lora_scaling,
        attn_impl=attn_impl)
    if quantize_kv:
        kv_list = llama_model.quantize_prompt_kv_list(list(kv_list),
                                                      kv_total_len,
                                                      kv_bits=kv_bits)
    return {
        "kv_list": kv_list,
        "last_logits": logits[:, 0, :] if logits.ndim == 3 else logits,
        "key_mask": key_mask,
        "next_position": positions[:, -1] + 1,
    }


def decode_step_unrolled(
    params: dict,
    cfg: LlavaConfig,
    token_ids: jax.Array,       # [B]
    prompt_kv_list: list,
    prompt_mask: jax.Array,
    suffix_list: list,
    step: jax.Array,
    positions: jax.Array,
    lora: Optional[dict] = None,
    lora_scaling: float = 1.0,
    sp_used: Optional[int] = None,
) -> Tuple[jax.Array, list]:
    embeds = llama_model.embed_tokens(params["llama"], token_ids[:, None])
    return llama_model.decode_forward_unrolled(
        params["llama"], cfg.llama, embeds, prompt_kv_list, prompt_mask,
        suffix_list, step, positions, lora=tree_get(lora, "llama"),
        lora_scaling=lora_scaling, sp_used=sp_used)


def decode_step_multi(
    params: dict,
    cfg: LlavaConfig,
    token_ids: jax.Array,       # [B, G] — carry token + G−1 draft tokens
    prompt_kv_list: list,
    prompt_mask: jax.Array,
    suffix_list: list,
    step: jax.Array,
    positions: jax.Array,
    lora: Optional[dict] = None,
    lora_scaling: float = 1.0,
    sp_used: Optional[int] = None,
) -> Tuple[jax.Array, list]:
    """Speculative-verify step → (logits [B, G, V], suffix)."""
    embeds = llama_model.embed_tokens(params["llama"], token_ids)
    return llama_model.decode_forward_multi(
        params["llama"], cfg.llama, embeds, prompt_kv_list, prompt_mask,
        suffix_list, step, positions, lora=tree_get(lora, "llama"),
        lora_scaling=lora_scaling, sp_used=sp_used)


def decode_step_multi_pr(
    params: dict,
    cfg: LlavaConfig,
    token_ids: jax.Array,       # [B, G] — carry token + G−1 draft tokens
    prompt_kv_list: list,
    prompt_mask: jax.Array,
    raw_list: list,
    settled_list: list,
    slot: jax.Array,
    raw_ok: jax.Array,
    w: jax.Array,
    positions: jax.Array,
    lora: Optional[dict] = None,
    lora_scaling: float = 1.0,
    sp_used: Optional[int] = None,
) -> Tuple[jax.Array, list]:
    """Per-row speculative-verify step → (logits [B, G, V], raw_list)."""
    embeds = llama_model.embed_tokens(params["llama"], token_ids)
    return llama_model.decode_forward_multi_pr(
        params["llama"], cfg.llama, embeds, prompt_kv_list, prompt_mask,
        raw_list, settled_list, slot, raw_ok, w, positions,
        lora=tree_get(lora, "llama"), lora_scaling=lora_scaling,
        sp_used=sp_used)


def decode_step_split(
    params: dict,
    cfg: LlavaConfig,
    token_ids: jax.Array,       # [B]
    prompt_kv: dict,
    prompt_mask: jax.Array,     # [B, Sp]
    suffix_kv: dict,
    step: jax.Array,
    positions: jax.Array,       # [B]
    lora: Optional[dict] = None,
    lora_scaling: float = 1.0,
) -> Tuple[jax.Array, dict]:
    """Split-cache one-token decode (see llama.decode_forward_split)."""
    embeds = llama_model.embed_tokens(params["llama"], token_ids[:, None])
    return llama_model.decode_forward_split(
        params["llama"], cfg.llama, embeds, prompt_kv, prompt_mask,
        suffix_kv, step, positions, lora=tree_get(lora, "llama"),
        lora_scaling=lora_scaling)


class LlavaModel:
    """Thin OO wrapper bundling config + functional API (keeps call sites
    close to the reference's model object without hiding the pytrees)."""

    def __init__(self, cfg: LlavaConfig):
        self.cfg = cfg

    init_params = staticmethod(init_params)
    init_lora = staticmethod(init_lora)

    def __call__(self, params, input_ids, text_mask, images, **kw):
        return forward(params, self.cfg, input_ids, text_mask, images, **kw)
