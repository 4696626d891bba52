"""LoRA as a functional transform over parameter pytrees.

The reference manages adapters through PEFT's stateful ``set_adapter`` calls
on a shared base model (``rl_models.py:84-86``, ``qlora_model.py:66-124``,
``REGISTERED_BASE_MODELS``).  TPU-native version: an adapter is just a
pytree of ``{"a": [.., in, r], "b": [.., r, out]}`` factors mirroring the
base params' structure.  "Switching adapters" = calling the same compiled
forward with a different adapter pytree; the frozen DPO reference policy is
the OPA adapter passed with ``stop_gradient`` semantics (it is simply never
a differentiated argument).  One base model in HBM, any number of adapters.

``y = x @ W + (x @ A) @ B * (alpha / r)`` — PEFT numerics, zero-init B so a
fresh adapter is the identity.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional

import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class LoraConfig:
    """Reference defaults: OPA r=256 α=512 (run/train_opa.sh:31-33); DPO
    inherits the OPA adapter shapes."""

    rank: int = 64
    alpha: float = 128.0
    # dtype for the adapter factors
    dtype: Any = jnp.bfloat16

    @property
    def scaling(self) -> float:
        return self.alpha / self.rank


def lora_dense(
    x: jax.Array,
    w,
    lora: Optional[dict] = None,
    scaling: float = 1.0,
) -> jax.Array:
    """Dense layer [.., in] @ [in, out] with optional LoRA delta.

    ``w`` may be a plain array or an int8-quantized ``{"q", "scale"}`` dict
    (ops/quant.py) — the QLoRA configuration: frozen int8 base + bf16
    adapters."""
    if isinstance(w, dict) and "q" in w:
        from opadpo_tpu.ops.quant import q8_dense
        y = q8_dense(x, w).astype(jnp.float32)
    elif isinstance(w, dict) and "q4" in w:
        from opadpo_tpu.ops.quant import q4_dense
        y = q4_dense(x, w).astype(jnp.float32)
    else:
        y = jnp.einsum("...i,io->...o", x, w,
                       preferred_element_type=jnp.float32)
    if lora is not None:
        xa = jnp.einsum("...i,ir->...r", x, lora["a"],
                        preferred_element_type=jnp.float32)
        y = y + jnp.einsum("...r,ro->...o", xa.astype(lora["b"].dtype),
                           lora["b"],
                           preferred_element_type=jnp.float32) * scaling
    return y.astype(x.dtype)


def init_lora_entry(key, in_dim: int, out_dim: int, cfg: LoraConfig,
                    stacked: int | None = None) -> dict:
    """Kaiming-uniform A, zero B (PEFT init)."""
    shape_a = (in_dim, cfg.rank) if stacked is None else (stacked, in_dim, cfg.rank)
    shape_b = (cfg.rank, out_dim) if stacked is None else (stacked, cfg.rank, out_dim)
    bound = (1.0 / in_dim) ** 0.5 * 3.0 ** 0.5
    a = jax.random.uniform(key, shape_a, cfg.dtype, -bound, bound)
    b = jnp.zeros(shape_b, cfg.dtype)
    return {"a": a, "b": b}


def tree_get(tree: Optional[dict], *path: str) -> Optional[dict]:
    """Walk a (possibly-None) adapter pytree; None if any key missing."""
    node = tree
    for p in path:
        if node is None or p not in node:
            return None
        node = node[p]
    return node


def merge_lora(params: Any, lora: Any, scaling: float) -> Any:
    """Fold LoRA deltas into base weights (for export / serving)."""

    def merge_node(p_node, l_node):
        if isinstance(p_node, dict):
            return {
                k: merge_node(v, l_node.get(k) if isinstance(l_node, dict) else None)
                for k, v in p_node.items()
            }
        if isinstance(l_node, dict) and "a" in l_node and "b" in l_node:
            delta = jnp.einsum("...ir,...ro->...io",
                               l_node["a"].astype(jnp.float32),
                               l_node["b"].astype(jnp.float32)) * scaling
            return (p_node.astype(jnp.float32) + delta).astype(p_node.dtype)
        return p_node

    return merge_node(params, lora if lora is not None else {})
