"""CLIP ViT-L/14-336 vision tower (functional JAX).

The reference loads ``openai/clip-vit-large-patch14-336`` through LLaVA's
``CLIPVisionTower`` (``run/prepare_basemodels.sh:1-2``) and takes hidden
states from layer -2 (``mm_vision_select_layer: -2``, ``run/train_opa.sh:86``)
with "patch" feature select (drop CLS) → 576 tokens of width 1024.

Numerics match HF ``CLIPVisionModel``:
- patch embed = 14x14 stride-14 conv (no bias) == unfold+matmul here (MXU
  friendly), class embedding prepended, learned position embeddings (577),
  ``pre_layrnorm`` before the encoder;
- pre-LN transformer blocks, quick_gelu MLP, bidirectional attention
  (runs on the same Pallas flash kernel with ``causal=False``).

Selecting layer -2 means only the first 23 of 24 blocks execute — the
24th block's weights are never loaded (saves HBM + FLOPs); the stacked-
layer scan simply has 23 entries.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Tuple

import jax
import jax.numpy as jnp

from opadpo_tpu.models.lora import lora_dense, tree_get
from opadpo_tpu.ops.attention import multi_head_attention


@dataclasses.dataclass(frozen=True)
class ClipVisionConfig:
    image_size: int = 336
    patch_size: int = 14
    hidden_size: int = 1024
    intermediate_size: int = 4096
    num_heads: int = 16
    num_layers: int = 24          # full model depth
    select_layer: int = -2        # hidden_states[-2] → run depth+select+1 blocks
    layer_norm_eps: float = 1e-5
    dtype: Any = jnp.bfloat16

    @property
    def num_patches(self) -> int:
        return (self.image_size // self.patch_size) ** 2

    @property
    def head_dim(self) -> int:
        return self.hidden_size // self.num_heads

    @property
    def num_active_layers(self) -> int:
        # hidden_states has num_layers+1 entries (embeddings + each block);
        # hidden_states[select_layer] ⇒ run num_layers + select_layer + 1.
        return self.num_layers + self.select_layer + 1

    @staticmethod
    def tiny() -> "ClipVisionConfig":
        return ClipVisionConfig(image_size=28, patch_size=14, hidden_size=64,
                                intermediate_size=128, num_heads=2,
                                num_layers=3)


def init_params(key: jax.Array, cfg: ClipVisionConfig) -> dict:
    k = jax.random.split(key, 10)
    d, i, la = cfg.hidden_size, cfg.intermediate_size, cfg.num_active_layers
    patch_dim = 3 * cfg.patch_size * cfg.patch_size
    s = 0.02

    def nrm(kk, shape):
        return (jax.random.normal(kk, shape, jnp.float32) * s).astype(cfg.dtype)

    return {
        "patch_embed": nrm(k[0], (patch_dim, d)),     # unfold-conv kernel
        "class_embed": nrm(k[1], (d,)),
        "pos_embed": nrm(k[2], (cfg.num_patches + 1, d)),
        "pre_norm": {"scale": jnp.ones((d,), jnp.float32),
                     "bias": jnp.zeros((d,), jnp.float32)},
        "layers": {
            "ln1_scale": jnp.ones((la, d), jnp.float32),
            "ln1_bias": jnp.zeros((la, d), jnp.float32),
            "ln2_scale": jnp.ones((la, d), jnp.float32),
            "ln2_bias": jnp.zeros((la, d), jnp.float32),
            "wq": nrm(k[3], (la, d, d)),
            "bq": jnp.zeros((la, d), cfg.dtype),
            "wk": nrm(k[4], (la, d, d)),
            "bk": jnp.zeros((la, d), cfg.dtype),
            "wv": nrm(k[5], (la, d, d)),
            "bv": jnp.zeros((la, d), cfg.dtype),
            "wo": nrm(k[6], (la, d, d)),
            "bo": jnp.zeros((la, d), cfg.dtype),
            "fc1": nrm(k[7], (la, d, i)),
            "b_fc1": jnp.zeros((la, i), cfg.dtype),
            "fc2": nrm(k[8], (la, i, d)),
            "b_fc2": jnp.zeros((la, d), cfg.dtype),
        },
    }


def layer_norm(x, scale, bias, eps):
    x32 = x.astype(jnp.float32)
    mean = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.var(x32, axis=-1, keepdims=True)
    out = (x32 - mean) * jax.lax.rsqrt(var + eps)
    return (out * scale.astype(jnp.float32) + bias.astype(jnp.float32)).astype(x.dtype)


def quick_gelu(x):
    x32 = x.astype(jnp.float32)
    return (x32 * jax.nn.sigmoid(1.702 * x32)).astype(x.dtype)


def patchify(images: jax.Array, patch: int) -> jax.Array:
    """[B, H, W, 3] → [B, (H/p)*(W/p), 3*p*p]; channel-last NHWC layout,
    unfolded so the patch conv becomes a single MXU matmul.

    Flattening order matches HF's Conv2d+flatten: for each patch the conv
    kernel is [out, 3, p, p] — we emit (c, ph, pw) order to line up with the
    transposed conv weight from the loader.
    """
    b, hgt, wid, c = images.shape
    gh, gw = hgt // patch, wid // patch
    x = images.reshape(b, gh, patch, gw, patch, c)
    x = x.transpose(0, 1, 3, 5, 2, 4)          # [B, gh, gw, c, p, p]
    return x.reshape(b, gh * gw, c * patch * patch)


def forward(
    params: dict,
    cfg: ClipVisionConfig,
    images: jax.Array,                 # [B, H, W, 3] normalized, model dtype
    lora: Any = None,
    lora_scaling: float = 1.0,
    image_key_mask: jax.Array | None = None,   # [B, num_patches] (CoPO attn)
    attn_impl: str = "auto",
) -> jax.Array:
    """Returns patch features [B, num_patches, hidden] (CLS dropped)."""
    b = images.shape[0]
    patches = patchify(images.astype(cfg.dtype), cfg.patch_size)
    x = lora_dense(patches, params["patch_embed"],
                   tree_get(lora, "patch_embed"), lora_scaling)
    cls = jnp.broadcast_to(params["class_embed"][None, None, :],
                           (b, 1, cfg.hidden_size)).astype(x.dtype)
    x = jnp.concatenate([cls, x], axis=1)      # [B, 577, D]
    x = x + params["pos_embed"][None].astype(x.dtype)
    x = layer_norm(x, params["pre_norm"]["scale"], params["pre_norm"]["bias"],
                   cfg.layer_norm_eps)

    key_mask = None
    if image_key_mask is not None:
        cls_mask = jnp.ones((b, 1), image_key_mask.dtype)
        key_mask = jnp.concatenate([cls_mask, image_key_mask], axis=1)

    lora_layers = tree_get(lora, "layers")
    has_lora = lora_layers is not None
    nh, hd = cfg.num_heads, cfg.head_dim
    seq = cfg.num_patches + 1

    def layer_core(x, lp, ll):
        h = layer_norm(x, lp["ln1_scale"], lp["ln1_bias"], cfg.layer_norm_eps)
        q = lora_dense(h, lp["wq"], tree_get(ll, "wq"), lora_scaling) + lp["bq"]
        k = lora_dense(h, lp["wk"], tree_get(ll, "wk"), lora_scaling) + lp["bk"]
        v = lora_dense(h, lp["wv"], tree_get(ll, "wv"), lora_scaling) + lp["bv"]
        q = q.reshape(b, seq, nh, hd)
        k = k.reshape(b, seq, nh, hd)
        v = v.reshape(b, seq, nh, hd)
        attn = multi_head_attention(q, k, v, key_mask=key_mask, causal=False,
                                    impl=attn_impl)
        attn = attn.reshape(b, seq, nh * hd)
        o = lora_dense(attn, lp["wo"], tree_get(ll, "wo"), lora_scaling) + lp["bo"]
        x = x + o
        h = layer_norm(x, lp["ln2_scale"], lp["ln2_bias"], cfg.layer_norm_eps)
        h = quick_gelu(
            lora_dense(h, lp["fc1"], tree_get(ll, "fc1"), lora_scaling)
            + lp["b_fc1"])
        h = lora_dense(h, lp["fc2"], tree_get(ll, "fc2"), lora_scaling) + lp["b_fc2"]
        return x + h, None

    if has_lora:
        xs = (params["layers"], lora_layers)

        def body(x, sc):
            return layer_core(x, sc[0], sc[1])
    else:
        xs = params["layers"]

        def body(x, sc):
            return layer_core(x, sc, None)

    x, _ = jax.lax.scan(jax.checkpoint(body), x, xs)
    return x[:, 1:, :]                         # drop CLS — "patch" select
