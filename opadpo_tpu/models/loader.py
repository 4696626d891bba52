"""Checkpoint interop: HF/PyTorch LLaVA weights ⇄ JAX pytrees.

Replaces the reference's ``from_pretrained`` + vision-tower surgery
(``opadpo_train.py:539-557`` loads projector/vision weights out of the
base checkpoint's ``pytorch_model.bin.index.json``) and PEFT adapter
(de)serialization (``save_adapters``, dpo_trainer.py:1047-1095).  A user
can point this loader at checkpoints produced by the GPU reference —
LLaVA base dirs, standalone CLIP dirs, and PEFT ``adapter_model.bin``
directories — and export adapters the reference tooling can read back.

All torch usage is CPU-side deserialization only; tensors convert to
numpy before entering JAX.
"""

from __future__ import annotations

import json
import os
import re
from typing import Any, Dict, Optional

import numpy as np

from opadpo_tpu.models.llava import LlavaConfig


def _to_numpy(t) -> np.ndarray:
    import torch
    if isinstance(t, torch.Tensor):
        return t.detach().to(torch.float32).cpu().numpy()
    return np.asarray(t, np.float32)


def load_state_dict(checkpoint_dir: str) -> Dict[str, np.ndarray]:
    """Read every weight shard (safetensors or torch .bin) in a HF dir."""
    import torch
    state: Dict[str, np.ndarray] = {}
    entries = sorted(os.listdir(checkpoint_dir))
    st_files = [f for f in entries if f.endswith(".safetensors")]
    bin_files = [f for f in entries
                 if f.endswith(".bin") and "arguments" not in f]
    if st_files:
        from safetensors.numpy import load_file
        for f in st_files:
            state.update(load_file(os.path.join(checkpoint_dir, f)))
        state = {k: np.asarray(v) for k, v in state.items()}
    else:
        for f in bin_files:
            sd = torch.load(os.path.join(checkpoint_dir, f),
                            map_location="cpu", weights_only=True)
            state.update({k: _to_numpy(v) for k, v in sd.items()})
    return state


def _stack(rows):
    return np.stack(rows, axis=0)


def _tp(w):
    """torch Linear [out, in] → our [in, out]."""
    return np.ascontiguousarray(np.transpose(w))


def _cast(tree: Any, dtype, norm_f32: bool = True) -> Any:
    """bf16 weights, fp32 norms (reference qlora_model.py:283-292)."""
    import jax.numpy as jnp

    def leaf(path, x):
        name = path[-1] if path else ""
        if norm_f32 and ("norm" in str(name) or str(name).startswith("ln")):
            return jnp.asarray(x, jnp.float32)
        return jnp.asarray(x, dtype)

    def walk(node, path):
        if isinstance(node, dict):
            return {k: walk(v, path + [k]) for k, v in node.items()}
        return leaf(path, node)

    return walk(tree, [])


def llama_params_from_state(state: Dict[str, np.ndarray], cfg,
                            prefix: str = "model.") -> dict:
    n = cfg.num_layers
    g = lambda k: state[prefix + k]      # noqa: E731
    layers = {
        "attn_norm": _stack([g(f"layers.{i}.input_layernorm.weight")
                             for i in range(n)]),
        "mlp_norm": _stack([g(f"layers.{i}.post_attention_layernorm.weight")
                            for i in range(n)]),
        "wq": _stack([_tp(g(f"layers.{i}.self_attn.q_proj.weight"))
                      for i in range(n)]),
        "wk": _stack([_tp(g(f"layers.{i}.self_attn.k_proj.weight"))
                      for i in range(n)]),
        "wv": _stack([_tp(g(f"layers.{i}.self_attn.v_proj.weight"))
                      for i in range(n)]),
        "wo": _stack([_tp(g(f"layers.{i}.self_attn.o_proj.weight"))
                      for i in range(n)]),
        "w_gate": _stack([_tp(g(f"layers.{i}.mlp.gate_proj.weight"))
                          for i in range(n)]),
        "w_up": _stack([_tp(g(f"layers.{i}.mlp.up_proj.weight"))
                        for i in range(n)]),
        "w_down": _stack([_tp(g(f"layers.{i}.mlp.down_proj.weight"))
                          for i in range(n)]),
    }
    lm_head_key = "lm_head.weight"
    return {
        "embed": g("embed_tokens.weight"),
        "layers": layers,
        "final_norm": g("norm.weight"),
        "lm_head": _tp(state[lm_head_key]),
    }


def clip_params_from_state(state: Dict[str, np.ndarray], cfg,
                           prefix: str = "vision_model.") -> dict:
    la = cfg.num_active_layers
    g = lambda k: state[prefix + k]      # noqa: E731
    conv = g("embeddings.patch_embedding.weight")     # [D, 3, p, p]
    d = conv.shape[0]
    patch_embed = _tp(conv.reshape(d, -1))            # [(3*p*p), D], (c,ph,pw)

    def lw(i, name):
        return g(f"encoder.layers.{i}.{name}")

    layers = {
        "ln1_scale": _stack([lw(i, "layer_norm1.weight") for i in range(la)]),
        "ln1_bias": _stack([lw(i, "layer_norm1.bias") for i in range(la)]),
        "ln2_scale": _stack([lw(i, "layer_norm2.weight") for i in range(la)]),
        "ln2_bias": _stack([lw(i, "layer_norm2.bias") for i in range(la)]),
        "wq": _stack([_tp(lw(i, "self_attn.q_proj.weight")) for i in range(la)]),
        "bq": _stack([lw(i, "self_attn.q_proj.bias") for i in range(la)]),
        "wk": _stack([_tp(lw(i, "self_attn.k_proj.weight")) for i in range(la)]),
        "bk": _stack([lw(i, "self_attn.k_proj.bias") for i in range(la)]),
        "wv": _stack([_tp(lw(i, "self_attn.v_proj.weight")) for i in range(la)]),
        "bv": _stack([lw(i, "self_attn.v_proj.bias") for i in range(la)]),
        "wo": _stack([_tp(lw(i, "self_attn.out_proj.weight")) for i in range(la)]),
        "bo": _stack([lw(i, "self_attn.out_proj.bias") for i in range(la)]),
        "fc1": _stack([_tp(lw(i, "mlp.fc1.weight")) for i in range(la)]),
        "b_fc1": _stack([lw(i, "mlp.fc1.bias") for i in range(la)]),
        "fc2": _stack([_tp(lw(i, "mlp.fc2.weight")) for i in range(la)]),
        "b_fc2": _stack([lw(i, "mlp.fc2.bias") for i in range(la)]),
    }
    return {
        "patch_embed": patch_embed,
        "class_embed": g("embeddings.class_embedding"),
        "pos_embed": g("embeddings.position_embedding.weight"),
        "pre_norm": {"scale": g("pre_layrnorm.weight"),
                     "bias": g("pre_layrnorm.bias")},
        "layers": layers,
    }


def projector_params_from_state(state: Dict[str, np.ndarray],
                                prefix: str = "model.mm_projector.") -> dict:
    return {
        "fc1": _tp(state[prefix + "0.weight"]),
        "b1": state[prefix + "0.bias"],
        "fc2": _tp(state[prefix + "2.weight"]),
        "b2": state[prefix + "2.bias"],
    }


def llava_params_from_hf_state(state: Dict[str, np.ndarray],
                               cfg: LlavaConfig) -> dict:
    """HF ``LlavaForConditionalGeneration`` naming → our pytree.

    Covers both llava-hf layouts: transformers ≥4.52
    (``model.language_model.* / model.vision_tower.* /
    model.multi_modal_projector.*`` + top-level ``lm_head.weight``) and the
    legacy one (``language_model.model.*`` etc.), so ``llava-hf/llava-1.5-*``
    checkpoints load directly alongside the original-LLaVA layout."""
    if any(k.startswith("language_model.model.") for k in state):
        def remap(k: str) -> str:
            if k == "language_model.lm_head.weight":
                return "lm_head.weight"
            if k.startswith("language_model.model."):
                return "model.language_model." + k[len("language_model.model."):]
            if k.startswith(("vision_tower.", "multi_modal_projector.")):
                return "model." + k
            return k
        state = {remap(k): v for k, v in state.items()}

    pp = "model.multi_modal_projector."
    return {
        "llama": llama_params_from_state(state, cfg.llama,
                                         prefix="model.language_model."),
        "projector": {
            "fc1": _tp(state[pp + "linear_1.weight"]),
            "b1": state[pp + "linear_1.bias"],
            "fc2": _tp(state[pp + "linear_2.weight"]),
            "b2": state[pp + "linear_2.bias"],
        },
        "vision": clip_params_from_state(
            state, cfg.vision, prefix="model.vision_tower.vision_model."),
    }


def resize_token_embeddings_with_mean(params: dict, new_vocab: int) -> dict:
    """Grow embed/lm_head to ``new_vocab``, initializing new rows with the
    mean of existing embeddings — the reference's patched
    ``resize_token_embeddings_with_mean`` (import at opadpo_train.py:46)."""
    import jax.numpy as jnp
    embed = params["llama"]["embed"]
    old_vocab = embed.shape[0]
    if new_vocab <= old_vocab:
        return params
    n_new = new_vocab - old_vocab
    mean_emb = jnp.mean(embed.astype(jnp.float32), axis=0, keepdims=True)
    new_embed = jnp.concatenate(
        [embed, jnp.broadcast_to(mean_emb, (n_new, embed.shape[1])
                                 ).astype(embed.dtype)], axis=0)
    head = params["llama"]["lm_head"]                 # [D, V]
    mean_head = jnp.mean(head.astype(jnp.float32), axis=1, keepdims=True)
    new_head = jnp.concatenate(
        [head, jnp.broadcast_to(mean_head, (head.shape[0], n_new)
                                ).astype(head.dtype)], axis=1)
    out = dict(params)
    out["llama"] = {**params["llama"], "embed": new_embed,
                    "lm_head": new_head}
    return out


def load_llava_checkpoint(
    model_dir: str,
    cfg: LlavaConfig,
    vision_dir: Optional[str] = None,
    dtype=None,
) -> dict:
    """Load a full LLaVA checkpoint directory.

    ``vision_dir``: standalone CLIP checkpoint (the reference's
    ``image_checkpoint`` config group); if None, vision weights are
    expected inside the model dir under ``model.vision_tower.vision_tower.``.
    """
    import jax.numpy as jnp
    dtype = dtype or jnp.bfloat16
    state = load_state_dict(model_dir)

    if any(k.startswith(("model.language_model.", "language_model.model."))
           for k in state):
        return _cast(llava_params_from_hf_state(state, cfg), dtype)

    params = {"llama": llama_params_from_state(state, cfg.llama)}
    if any(k.startswith("model.mm_projector.") for k in state):
        params["projector"] = projector_params_from_state(state)
    else:
        raise KeyError("mm_projector weights not found in checkpoint")

    vt_prefix = "model.vision_tower.vision_tower.vision_model."
    if any(k.startswith(vt_prefix) for k in state):
        params["vision"] = clip_params_from_state(state, cfg.vision,
                                                  prefix=vt_prefix)
    elif vision_dir is not None:
        vstate = load_state_dict(vision_dir)
        params["vision"] = clip_params_from_state(vstate, cfg.vision)
    else:
        raise KeyError("vision tower weights not found and no vision_dir")

    return _cast(params, dtype)


# ---------------------------------------------------------------------------
# PEFT adapter interop (reference adapter_model dirs)
# ---------------------------------------------------------------------------

_PEFT_NAME_MAP = {
    "q_proj": "wq", "k_proj": "wk", "v_proj": "wv", "o_proj": "wo",
    "gate_proj": "w_gate", "up_proj": "w_up", "down_proj": "w_down",
}
_PEFT_INV_MAP = {v: k for k, v in _PEFT_NAME_MAP.items()}

_PEFT_LAYER_RE = re.compile(
    r"model\.layers\.(\d+)\.(?:self_attn|mlp)\.(\w+)\.lora_(A|B)\.weight")


def lora_from_peft_state(state: Dict[str, np.ndarray], llama_cfg,
                         dtype=None) -> dict:
    """PEFT ``adapter_model.bin`` → our stacked-adapter pytree.
    PEFT stores lora_A [r, in] and lora_B [out, r]; ours are [in, r] /
    [r, out]."""
    import jax.numpy as jnp
    dtype = dtype or jnp.bfloat16
    n = llama_cfg.num_layers
    per_layer: Dict[str, Dict[int, Dict[str, np.ndarray]]] = {}
    for key, val in state.items():
        m = _PEFT_LAYER_RE.search(key)
        if not m:
            continue
        li, proj, ab = int(m.group(1)), m.group(2), m.group(3)
        ours = _PEFT_NAME_MAP.get(proj)
        if ours is None:
            continue
        per_layer.setdefault(ours, {}).setdefault(li, {})[ab.lower()] = \
            _to_numpy(val)

    layers = {}
    for name, by_layer in per_layer.items():
        a = _stack([_tp(by_layer[i]["a"]) for i in range(n)])   # [L, in, r]
        b = _stack([_tp(by_layer[i]["b"]) for i in range(n)])   # [L, r, out]
        layers[name] = {"a": jnp.asarray(a, dtype),
                        "b": jnp.asarray(b, dtype)}
    return {"llama": {"layers": layers}}


def lora_to_peft_state(lora: dict, base_prefix: str =
                       "base_model.model.model.layers"
                       ) -> Dict[str, np.ndarray]:
    """Our adapter pytree → PEFT state-dict names (so the reference's eval
    scripts can load our trained adapters)."""
    out: Dict[str, np.ndarray] = {}
    layers = lora.get("llama", {}).get("layers", {})
    for name, ab in layers.items():
        proj = _PEFT_INV_MAP[name]
        group = "self_attn" if name in ("wq", "wk", "wv", "wo") else "mlp"
        a = np.asarray(ab["a"], np.float32)     # [L, in, r]
        b = np.asarray(ab["b"], np.float32)     # [L, r, out]
        for i in range(a.shape[0]):
            out[f"{base_prefix}.{i}.{group}.{proj}.lora_A.weight"] = _tp(a[i])
            out[f"{base_prefix}.{i}.{group}.{proj}.lora_B.weight"] = _tp(b[i])
    return out


def save_peft_adapter(lora: dict, out_dir: str, lora_cfg,
                      base_model_name: str = "llava-v1.5") -> None:
    """Write adapter_model.bin + adapter_config.json (PEFT dir contract)."""
    import torch
    os.makedirs(out_dir, exist_ok=True)
    state = {k: torch.from_numpy(np.ascontiguousarray(v))
             for k, v in lora_to_peft_state(lora).items()}
    torch.save(state, os.path.join(out_dir, "adapter_model.bin"))
    config = {
        "base_model_name_or_path": base_model_name,
        "peft_type": "LORA",
        "r": lora_cfg.rank,
        "lora_alpha": lora_cfg.alpha,
        "lora_dropout": 0.0,
        "target_modules": sorted(_PEFT_INV_MAP.values()),
        "task_type": "CAUSAL_LM",
    }
    with open(os.path.join(out_dir, "adapter_config.json"), "w") as f:
        json.dump(config, f, indent=2)


def load_peft_adapter(adapter_dir: str, llama_cfg, dtype=None) -> dict:
    state = load_state_dict(adapter_dir)
    return lora_from_peft_state(state, llama_cfg, dtype)
