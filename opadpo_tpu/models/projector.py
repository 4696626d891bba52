"""mm_projector: ``mlp2x_gelu`` (reference configs/llava/llava_dpo.yaml
model block) — Linear(1024→D) → GELU → Linear(D→D), with bias (HF LLaVA)."""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp

from opadpo_tpu.models.lora import lora_dense, tree_get


@dataclasses.dataclass(frozen=True)
class ProjectorConfig:
    in_dim: int = 1024
    out_dim: int = 4096
    dtype: Any = jnp.bfloat16


def init_params(key: jax.Array, cfg: ProjectorConfig) -> dict:
    k1, k2 = jax.random.split(key)
    s = 0.02
    return {
        "fc1": (jax.random.normal(k1, (cfg.in_dim, cfg.out_dim)) * s).astype(cfg.dtype),
        "b1": jnp.zeros((cfg.out_dim,), cfg.dtype),
        "fc2": (jax.random.normal(k2, (cfg.out_dim, cfg.out_dim)) * s).astype(cfg.dtype),
        "b2": jnp.zeros((cfg.out_dim,), cfg.dtype),
    }


def forward(params: dict, x: jax.Array, lora=None, lora_scaling: float = 1.0
            ) -> jax.Array:
    h = lora_dense(x, params["fc1"], tree_get(lora, "fc1"), lora_scaling)
    h = h + params["b1"]
    h = jax.nn.gelu(h.astype(jnp.float32), approximate=False).astype(x.dtype)
    h = lora_dense(h, params["fc2"], tree_get(lora, "fc2"), lora_scaling)
    return h + params["b2"]
