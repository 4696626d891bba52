"""Train state + optimizer factory.

Replaces the reference's optimizer stack — bitsandbytes paged AdamW 32-bit
+ HF ``get_scheduler`` + accelerate/DeepSpeed wrapping
(``utils/trainer_utils.py:9-49``) — with optax.  "Paging" is a CUDA-host
artifact with no TPU analogue; ZeRO-1 is a sharding spec
(``parallel/sharding.py``) rather than an engine.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional

import jax
import jax.numpy as jnp
import optax


@dataclasses.dataclass(frozen=True)
class OptimizerConfig:
    learning_rate: float = 1e-6
    lr_scheduler_type: str = "cosine"    # "cosine" | "constant" | "linear"
    warmup_steps: int = 5
    total_steps: int = 500
    weight_decay: float = 0.0
    max_grad_norm: Optional[float] = 1.0
    b1: float = 0.9
    b2: float = 0.999
    eps: float = 1e-8
    grad_accum_steps: int = 1


def make_schedule(cfg: OptimizerConfig) -> optax.Schedule:
    warmup = optax.linear_schedule(0.0, cfg.learning_rate,
                                   max(cfg.warmup_steps, 1))
    decay_steps = max(cfg.total_steps - cfg.warmup_steps, 1)
    if cfg.lr_scheduler_type == "cosine":
        decay = optax.cosine_decay_schedule(cfg.learning_rate, decay_steps)
    elif cfg.lr_scheduler_type == "linear":
        decay = optax.linear_schedule(cfg.learning_rate, 0.0, decay_steps)
    else:
        decay = optax.constant_schedule(cfg.learning_rate)
    return optax.join_schedules([warmup, decay], [cfg.warmup_steps])


_NO_DECAY_MARKERS = ("norm", "bias", "ln1", "ln2", "ln_")


def decay_mask(params: Any) -> Any:
    """True where weight decay applies.  Mirrors the reference's
    AdamW param grouping (``utils/trainer_utils.py:9-49``): LayerNorm
    scales/biases and all bias vectors are excluded from decay.  Here
    that is any leaf whose path mentions a norm/bias marker, or any
    rank<2 leaf (1-D params are biases / norm scales in every model
    tree in this repo)."""
    def _mask_leaf(path, leaf):
        names = "/".join(
            str(getattr(k, "key", getattr(k, "idx", k))) for k in path
        ).lower()
        if any(m in names for m in _NO_DECAY_MARKERS):
            return False
        return getattr(leaf, "ndim", 0) >= 2
    return jax.tree_util.tree_map_with_path(_mask_leaf, params)


def make_optimizer(cfg: OptimizerConfig) -> optax.GradientTransformation:
    chain = []
    if cfg.max_grad_norm is not None:
        chain.append(optax.clip_by_global_norm(cfg.max_grad_norm))
    # adamw's mask routes decay away from norm/bias leaves; at the shipped
    # weight_decay=0.0 this is a no-op but keeps nonzero decay correct
    chain.append(optax.adamw(
        make_schedule(cfg), b1=cfg.b1, b2=cfg.b2, eps=cfg.eps,
        weight_decay=cfg.weight_decay,
        mask=decay_mask if cfg.weight_decay else None))
    tx = optax.chain(*chain)
    if cfg.grad_accum_steps > 1:
        tx = optax.MultiSteps(tx, every_k_schedule=cfg.grad_accum_steps)
    return tx


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class TrainState:
    """Trainable pytree (LoRA or full params) + optimizer state."""

    params: Any
    opt_state: Any
    step: jax.Array

    @staticmethod
    def create(params: Any, tx: optax.GradientTransformation) -> "TrainState":
        return TrainState(params=params, opt_state=tx.init(params),
                          step=jnp.zeros((), jnp.int32))

    def apply_gradients(self, tx: optax.GradientTransformation,
                        grads: Any) -> "TrainState":
        updates, new_opt = tx.update(grads, self.opt_state, self.params)
        new_params = optax.apply_updates(self.params, updates)
        return TrainState(params=new_params, opt_state=new_opt,
                          step=self.step + 1)


def global_norm(tree: Any) -> jax.Array:
    return optax.global_norm(tree)
