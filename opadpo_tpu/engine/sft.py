"""OPA (LoRA-SFT) engine.

Replaces the reference's HF-Trainer-based stage-3 (``opadpo/opa_models/
opa_trainer.py`` + ``opa_train.py``): cross-entropy on IGNORE_INDEX-masked
labels over the spliced sequence, with the optional entropy-maximization
loss on image-masked inputs (``opa_trainer.py:58-125`` — disabled in the
shipped recipe, ``run/train_opa.sh:36``, but supported for parity).

ZeRO-1 is not a separate engine here: optimizer state is sharded over the
``data`` mesh axis by ``parallel.zero1_opt_state_specs``.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from opadpo_tpu.constants import IGNORE_INDEX
from opadpo_tpu.engine.train_state import TrainState, global_norm
from opadpo_tpu.models import llava as llava_model
from opadpo_tpu.models.llava import LlavaConfig
from opadpo_tpu.models.lora import tree_get
from opadpo_tpu.ops import image_ops
from opadpo_tpu.ops.logprobs import chunked_logprobs


@dataclasses.dataclass(frozen=True)
class SftConfig:
    """OPA recipe (run/train_opa.sh:31-50, llava_training_base.yaml)."""

    entropy_loss: bool = False
    entropy_mask_method: str = "random"   # random | blockwise | attention
    entropy_mask_ratio: float = 0.3
    entropy_loss_coef: float = 0.0
    lora_scaling: float = 2.0             # alpha 512 / r 256


def sft_loss(
    lora: dict,
    base_params: dict,
    cfg: LlavaConfig,
    sft: SftConfig,
    batch: Dict[str, jax.Array],
    rng: Optional[jax.Array] = None,
) -> Tuple[jax.Array, Dict[str, jax.Array]]:
    """batch: input_ids [B,L] (full templated conversation incl. one image
    token), labels [B,L] (IGNORE_INDEX outside assistant spans),
    attention_mask [B,L], images [B,H,W,3]."""
    ids = batch["input_ids"]
    labels = batch["labels"]
    mask = batch["attention_mask"]
    images = batch["images"]
    lm_head = base_params["llama"]["lm_head"]
    head_lora = tree_get(tree_get(lora, "llama"), "lm_head")

    def readout(hidden, sp_labels, with_entropy):
        """One chunked lm_head pass computing BOTH the shifted CE logprobs
        and (optionally) per-position entropies: position t is paired with
        label t+1 (causal shift), last position gets IGNORE."""
        shifted = jnp.concatenate(
            [sp_labels[:, 1:],
             jnp.full((sp_labels.shape[0], 1), IGNORE_INDEX,
                      sp_labels.dtype)], axis=1)
        lp, ent = chunked_logprobs(
            hidden, lm_head, shifted, IGNORE_INDEX,
            with_entropy=with_entropy, head_lora=head_lora,
            lora_scaling=sft.lora_scaling)
        return lp[:, :-1], ent, shifted[:, :-1]

    out = llava_model.forward(
        base_params, cfg, ids, mask, images, lora=lora,
        lora_scaling=sft.lora_scaling, labels=labels, return_hidden=True)
    sp_labels = out["labels"]
    lp, entropies, shift_labels = readout(out["hidden"], sp_labels,
                                          sft.entropy_loss)
    valid = (shift_labels != IGNORE_INDEX).astype(jnp.float32)
    ce_loss = -jnp.sum(lp * valid) / jnp.maximum(jnp.sum(valid), 1e-9)

    stats = {"loss/base_sft": ce_loss}
    loss = ce_loss

    if sft.entropy_loss:
        if sft.entropy_mask_method == "attention":
            img_key_mask = image_ops.mask_patches_per_row(
                rng, ids.shape[0], cfg.num_patches, sft.entropy_mask_ratio)
            new_out = llava_model.forward(
                base_params, cfg, ids, mask, images, lora=lora,
                lora_scaling=sft.lora_scaling, labels=labels,
                image_key_mask=img_key_mask, return_hidden=True)
        else:
            if sft.entropy_mask_method == "random":
                masked = image_ops.mask_images_random(
                    rng, images, sft.entropy_mask_ratio)
            else:
                masked = image_ops.mask_images_blockwise(
                    rng, images, sft.entropy_mask_ratio)
            new_out = llava_model.forward(
                base_params, cfg, ids, mask, masked, lora=lora,
                lora_scaling=sft.lora_scaling, labels=labels,
                return_hidden=True)
        mlp, new_entropies, _ = readout(new_out["hidden"], sp_labels, True)
        emask = (sp_labels != IGNORE_INDEX).astype(jnp.float32)
        ent_loss = -jnp.sum((new_entropies - entropies) * emask, axis=-1) \
            / jnp.maximum(jnp.sum(emask, axis=-1), 1e-9)
        ent_loss = jnp.mean(ent_loss)
        loss = loss + ent_loss * sft.entropy_loss_coef
        # mask-branch CE for logging (reference mask_sft_loss)
        stats["loss/mask_sft"] = -jnp.sum(mlp * valid) / jnp.maximum(
            jnp.sum(valid), 1e-9)
        stats["loss/entropy"] = ent_loss

    stats["loss/total"] = loss
    return loss, stats


def sft_train_step(
    state: TrainState,
    base_params: dict,
    batch: Dict[str, jax.Array],
    tx,
    cfg: LlavaConfig,
    sft: SftConfig,
    rng: Optional[jax.Array] = None,
) -> Tuple[TrainState, Dict[str, jax.Array]]:
    (loss, stats), grads = jax.value_and_grad(sft_loss, has_aux=True)(
        state.params, base_params, cfg, sft, batch, rng)
    stats = dict(stats)
    stats["loss/grad_norm"] = global_norm(grads)
    new_state = state.apply_gradients(tx, grads)
    return new_state, stats
