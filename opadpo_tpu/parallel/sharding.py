"""Parameter / optimizer-state partition specs.

Replaces the reference's two distribution engines:

- DeepSpeed ZeRO-1 (reference ``opadpo/deepspeed_stage_1_config.json``) —
  here just a sharding rule over optimizer-state leaves: each moment tensor
  is sharded along its largest ``data``-divisible axis, so optimizer memory
  and the update compute are split across the data axis for free. XLA
  inserts the reduce-scatter/all-gather.
- Megatron-style tensor parallelism (absent in the reference; SURVEY §2.8
  marks it as the TPU-native extension for 13B on small slices): attention
  QKV/output and MLP in/out projections shard over the ``model`` axis.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from opadpo_tpu.parallel.mesh import DATA_AXIS, MODEL_AXIS

# Path-suffix → PartitionSpec rules for model-axis tensor parallelism.
# Weight convention throughout the codebase: dense kernels are [in, out].
_TP_RULES = (
    ("wq", P(None, MODEL_AXIS)),
    ("wk", P(None, MODEL_AXIS)),
    ("wv", P(None, MODEL_AXIS)),
    ("wo", P(MODEL_AXIS, None)),
    ("w_gate", P(None, MODEL_AXIS)),
    ("w_up", P(None, MODEL_AXIS)),
    ("w_down", P(MODEL_AXIS, None)),
    ("embed", P(None, None)),
    ("lm_head", P(None, MODEL_AXIS)),
)


def _leaf_path_str(path) -> str:
    parts = []
    for p in path:
        if hasattr(p, "key"):
            parts.append(str(p.key))
        elif hasattr(p, "idx"):
            parts.append(str(p.idx))
        else:
            parts.append(str(p))
    return "/".join(parts)


def _pad_spec(spec: P, leaf) -> P:
    """Left-pad a 2-D weight spec with None for stacked-layer leading axes."""
    nd = getattr(leaf, "ndim", len(spec))
    pad = nd - len(spec)
    if pad > 0:
        return P(*([None] * pad + list(spec)))
    return spec


def _spec_for_param(path_str: str, leaf, use_model_axis: bool) -> P:
    if not use_model_axis:
        return P()
    parts = path_str.split("/")
    name = parts[-1]
    # Quantized-base leaves (ops/quant.py layouts) inherit the TP layout of
    # the weight they quantize — the parent path component names the weight:
    #   int8: q [.., K, N] same spec as the bf16 weight;
    #         scale [.., 1, N] shards N iff the weight column-shards.
    #   int4: q4 [.., K/2, N] and group scale [.., K/g, N] both keep the
    #         weight spec (row shards divide K/2 and K/g for these shapes).
    # This is what makes QLoRA × tensor-parallel memory-scale: without it
    # the frozen 13B int8 base replicates onto every model shard.
    if name in ("q", "q4", "scale") and len(parts) >= 2:
        parent = parts[-2]
        for rule_name, spec in _TP_RULES:
            if parent == rule_name:
                if name == "scale" and getattr(leaf, "shape", (1, 1))[-2] == 1:
                    # per-channel int8 scale: only the N axis is real
                    out_axis = spec[-1] if len(spec) > 0 else None
                    nd = getattr(leaf, "ndim", 2)
                    return P(*([None] * (nd - 1) + [out_axis]))
                return _pad_spec(spec, leaf)
        return P()
    # LoRA factors keep the TP layout of the base weight on their outer dim:
    # a: [in, r] stays replicated, b: [r, out] shards out if base out-shards.
    base_name = name
    for rule_name, spec in _TP_RULES:
        if base_name == rule_name or path_str.endswith(rule_name + "/b") \
                or path_str.endswith(rule_name + "/a"):
            if path_str.endswith("/a"):
                # [.., in, r] — replicate (r is small)
                return P()
            if path_str.endswith("/b"):
                # [.., r, out] — shard out only if base shards dim -1
                out_axis = spec[-1] if len(spec) > 0 else None
                nd = getattr(leaf, "ndim", 2)
                return P(*([None] * (nd - 1) + [out_axis]))
            # Stacked-layer params have a leading layer axis; pad spec.
            return _pad_spec(spec, leaf)
    return P()


def param_partition_specs(params: Any, mesh: Mesh) -> Any:
    """PartitionSpec pytree for model params (replicated unless TP on)."""
    use_model = mesh.shape[MODEL_AXIS] > 1
    return jax.tree_util.tree_map_with_path(
        lambda path, leaf: _spec_for_param(_leaf_path_str(path), leaf, use_model),
        params,
    )


def zero1_opt_state_specs(opt_state: Any, mesh: Mesh, params_specs: Any = None) -> Any:
    """ZeRO-1-equivalent sharding for optimizer state.

    Each floating leaf with a dimension divisible by the ``data`` axis size
    gets that dimension sharded over ``data``; scalars/counters replicate.
    """
    n_data = mesh.shape[DATA_AXIS]

    def spec_for(leaf):
        shape = getattr(leaf, "shape", ())
        if not shape or n_data == 1:
            return P()
        # shard the largest divisible axis
        best = None
        for i, d in enumerate(shape):
            if d % n_data == 0 and (best is None or d > shape[best]):
                best = i
        if best is None:
            return P()
        spec = [None] * len(shape)
        spec[best] = DATA_AXIS
        return P(*spec)

    return jax.tree_util.tree_map(spec_for, opt_state)


def shard_pytree(tree: Any, specs: Any, mesh: Mesh) -> Any:
    """Device-put a pytree according to spec pytree."""
    return jax.tree_util.tree_map(
        lambda leaf, spec: jax.device_put(leaf, NamedSharding(mesh, spec)),
        tree,
        specs,
    )


def shard_train_state_zero1(state: Any, mesh: Mesh) -> Any:
    """ZeRO-1 placement for a TrainState: params/step replicated, optimizer
    moments sharded over the ``data`` axis (the reference ships DeepSpeed
    stage-1 for the OPA stage, ``opadpo/deepspeed_stage_1_config.json``).
    XLA inserts the reduce-scatter/all-gather around the update."""
    import dataclasses

    rep = NamedSharding(mesh, P())
    return dataclasses.replace(
        state,
        params=jax.device_put(state.params, rep),
        opt_state=shard_pytree(state.opt_state,
                               zero1_opt_state_specs(state.opt_state, mesh),
                               mesh),
        step=jax.device_put(state.step, rep))
