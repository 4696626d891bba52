"""Shared pipeline runtime: model/config/tokenizer loading + mesh setup.

Replaces the reference's per-entry-point model assembly
(``opadpo_train.py:559-797`` / ``opa_train.py:287-563`` boilerplate).
"""

from __future__ import annotations

import dataclasses
import json
import os
from typing import Optional, Tuple

import jax
import numpy as np

from opadpo_tpu.models import clip as clip_model
from opadpo_tpu.models import llama as llama_model
from opadpo_tpu.models import projector as projector_model
from opadpo_tpu.models.llava import LlavaConfig
from opadpo_tpu.parallel import MeshConfig, make_mesh


def maybe_init_multihost() -> None:
    """Multi-host SPMD init (the reference's rank→node torchrun derivation,
    opadpo_train.py:725-727, becomes jax.distributed): activated when the
    standard coordinator env vars are present."""
    if os.environ.get("JAX_COORDINATOR_ADDRESS"):
        jax.distributed.initialize(
            coordinator_address=os.environ["JAX_COORDINATOR_ADDRESS"],
            num_processes=int(os.environ.get("JAX_NUM_PROCESSES", "1")),
            process_id=int(os.environ.get("JAX_PROCESS_ID", "0")))


def enable_compilation_cache() -> None:
    """Persistent XLA compile cache (the 7B programs take minutes cold)."""
    repo_root = os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    try:
        jax.config.update("jax_compilation_cache_dir",
                          os.path.join(repo_root, ".jax_cache"))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    except Exception:
        pass


def llava_config_from_hf(model_dir: str) -> LlavaConfig:
    """Build LlavaConfig from a HF checkpoint's config.json."""
    with open(os.path.join(model_dir, "config.json")) as f:
        hf = json.load(f)
    lm = llama_model.LlamaConfig(
        vocab_size=hf.get("vocab_size", 32000),
        hidden_size=hf.get("hidden_size", 4096),
        intermediate_size=hf.get("intermediate_size", 11008),
        num_layers=hf.get("num_hidden_layers", 32),
        num_heads=hf.get("num_attention_heads", 32),
        num_kv_heads=hf.get("num_key_value_heads",
                            hf.get("num_attention_heads", 32)),
        head_dim=hf.get("hidden_size", 4096)
        // hf.get("num_attention_heads", 32),
        max_position_embeddings=hf.get("max_position_embeddings", 4096),
        rope_base=hf.get("rope_theta", 10000.0),
        rms_norm_eps=hf.get("rms_norm_eps", 1e-5),
    )
    select_layer = hf.get("mm_vision_select_layer", -2)
    vis = clip_model.ClipVisionConfig(select_layer=select_layer)
    proj = projector_model.ProjectorConfig(in_dim=vis.hidden_size,
                                           out_dim=lm.hidden_size)
    return LlavaConfig(lm, vis, proj)


def load_tokenizer(model_dir: str, model_max_length: int = 2048):
    """Vicuna/LLaMA tokenizer with the reference's pad handling
    (pad → unk id 0)."""
    from transformers import AutoTokenizer
    tok = AutoTokenizer.from_pretrained(model_dir, use_fast=False,
                                        model_max_length=model_max_length)
    if tok.pad_token is None:
        tok.pad_token = tok.unk_token
    return tok


def setup_model(
    model_dir: Optional[str],
    vision_dir: Optional[str] = None,
    mesh_config: Optional[MeshConfig] = None,
    skip_loading_weights: bool = False,
    tiny: bool = False,
    seed: int = 42,
    bits: int = 16,
    act_bits: int = 16,
    act_outlier_cols: int = 0,
    act_bwd_int8: bool = False,
    fused_attention: bool = True,
    visual_tokens: Optional[int] = None,
) -> Tuple[LlavaConfig, dict, "jax.sharding.Mesh"]:
    """(cfg, params, mesh).  ``skip_loading_weights`` builds a random-init
    model from config only — the reference's debug hook
    (``checkpoint_utils.py:64-66``, configs comment 'to speed up
    debugging').  ``tiny`` shrinks the architecture too."""
    from opadpo_tpu.models import llava as llava_model_mod
    from opadpo_tpu.models.loader import load_llava_checkpoint
    from opadpo_tpu.parallel import param_partition_specs, shard_pytree

    maybe_init_multihost()
    enable_compilation_cache()
    if not fused_attention:
        from opadpo_tpu.ops.attention import set_fused_attention
        set_fused_attention(False)
    mesh = make_mesh(mesh_config)
    if mesh.shape.get("model", 1) > 1:
        # tensor parallelism: run the flash kernel inside a shard_map over
        # this mesh (heads are local under head-sharding, no comm needed)
        from opadpo_tpu.ops.attention import set_tp_mesh
        set_tp_mesh(mesh)
    if tiny:
        cfg = LlavaConfig.tiny()
        params = llava_model_mod.init_params(jax.random.PRNGKey(seed), cfg)
    elif skip_loading_weights or model_dir is None:
        cfg = (llava_config_from_hf(model_dir) if model_dir
               else LlavaConfig.llava_7b())
        if bits in (4, 8):
            # full-scale random init straight into quantized form: a
            # fused init->quantize holds bf16 + int8 simultaneously and
            # runtime-OOMs a 16 GB chip at 7B (E2E rehearsal, 2026-08-19)
            params = llava_model_mod.init_params_quantized(
                jax.random.PRNGKey(seed), cfg, bits=bits)
        else:
            params = llava_model_mod.init_params(jax.random.PRNGKey(seed),
                                                 cfg)
    else:
        cfg = llava_config_from_hf(model_dir)
        params = load_llava_checkpoint(model_dir, cfg, vision_dir=vision_dir)
    if visual_tokens:
        # training-free visual-token pruning (inference accelerator):
        # params are unchanged — only cfg.num_patches shrinks
        if int(visual_tokens) < 1:
            raise ValueError(f"visual_tokens must be >= 1, "
                             f"got {visual_tokens}")
        cfg = dataclasses.replace(cfg, visual_tokens=int(visual_tokens))

    if bits in (4, 8):
        # QLoRA configuration: frozen int8/int4 base + bf16 adapters
        # (reference bits=4/8 paths, qlora_model.py:151-160).  The
        # skip_loading_weights full-scale branch above already built the
        # quantized tree piecewise — detect and don't re-quantize.
        def _has_quant_leaf(node):
            # require an actual quantized payload (q/q4 + scale), not just a
            # key-subset match: an empty dict or a scale-only subtree must NOT
            # suppress quantization (a bf16 7B base runtime-OOMs the chip)
            if isinstance(node, dict):
                if ("q" in node or "q4" in node) and "scale" in node:
                    return True
                return any(_has_quant_leaf(v) for v in node.values())
            return False
        if not _has_quant_leaf(params):
            from opadpo_tpu.ops.quant import quantize_params
            params = quantize_params(params, bits=bits)
    elif bits != 16:
        raise ValueError(f"bits={bits} unsupported (16, 8 or 4)")
    if act_bits == 8:
        if bits != 8:
            raise ValueError("act_bits=8 requires bits=8")
        # w8a8: int8 MXU matmuls with per-token activation quantization
        # (opt-in; small documented quality trade — ops/quant.py).
        # act_outlier_cols > 0 adds static-k LLM.int8 outlier decomposition
        # (top-k amplitude columns stay bf16).
        from opadpo_tpu.ops.quant import set_act_quant
        set_act_quant(True, outlier_cols=act_outlier_cols,
                      bwd_int8=act_bwd_int8)
    elif act_bits != 16:
        raise ValueError(f"act_bits={act_bits} unsupported (16 or 8)")

    specs = param_partition_specs(params, mesh)
    params = shard_pytree(params, specs, mesh)
    return cfg, params, mesh


def device_put_batch(batch: dict, mesh) -> dict:
    """Host numpy batch → device arrays, batch axis sharded over data."""
    from opadpo_tpu.parallel.mesh import batch_sharding
    sh = batch_sharding(mesh)
    out = {}
    for k, v in batch.items():
        if isinstance(v, np.ndarray):
            out[k] = jax.device_put(v, sh)
        else:
            out[k] = v
    return out


@dataclasses.dataclass
class StepTimer:
    """Per-step wall-clock + tokens/sec tracking (the tracing/profiling
    subsystem the reference lacks — SURVEY §5)."""

    history: list = dataclasses.field(default_factory=list)

    def record(self, name: str, seconds: float, **counters):
        entry = {"name": name, "seconds": seconds, **counters}
        self.history.append(entry)
        return entry

    def summary(self) -> dict:
        import collections
        agg = collections.defaultdict(list)
        for e in self.history:
            agg[e["name"]].append(e["seconds"])
        return {k: {"mean_s": float(np.mean(v)), "count": len(v)}
                for k, v in agg.items()}


def maybe_start_profiler(output_dir: str, step: int, start_step: int = 5,
                         num_steps: int = 3) -> bool:
    """jax.profiler trace hook: captures steps [start, start+num) to
    output_dir/profile."""
    if step == start_step:
        jax.profiler.start_trace(os.path.join(output_dir, "profile"))
        return True
    if step == start_step + num_steps:
        jax.profiler.stop_trace()
    return False
