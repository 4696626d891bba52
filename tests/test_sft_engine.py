"""OPA SFT engine tests on the tiny model."""

import numpy as np
import jax
import jax.numpy as jnp

from opadpo_tpu.constants import IGNORE_INDEX, IMAGE_TOKEN_INDEX
from opadpo_tpu.engine.sft import SftConfig, sft_loss, sft_train_step
from opadpo_tpu.engine.train_state import OptimizerConfig, TrainState, make_optimizer
from opadpo_tpu.models import llava as llava_model
from opadpo_tpu.models.llava import LlavaConfig
from opadpo_tpu.models.lora import LoraConfig

CFG = LlavaConfig.tiny()
PARAMS = llava_model.init_params(jax.random.PRNGKey(0), CFG)
LORA_CFG = LoraConfig(rank=4, alpha=8.0)
SFT = SftConfig(lora_scaling=LORA_CFG.scaling)


def _batch(b=2, l=14, seed=5):
    ks = jax.random.split(jax.random.PRNGKey(seed), 3)
    ids = jax.random.randint(ks[0], (b, l), 5, CFG.llama.vocab_size)
    ids = ids.at[:, 2].set(IMAGE_TOKEN_INDEX)
    mask = jnp.ones((b, l), jnp.int32)
    labels = jnp.where(
        jax.lax.broadcasted_iota(jnp.int32, (b, l), 1) >= l // 2,
        ids, IGNORE_INDEX)
    sz = CFG.vision.image_size
    images = jax.random.normal(ks[1], (b, sz, sz, 3))
    return {"input_ids": ids, "labels": labels, "attention_mask": mask,
            "images": images}


def test_sft_loss_finite_and_positive():
    lora = llava_model.init_lora(jax.random.PRNGKey(1), CFG, LORA_CFG)
    loss, stats = sft_loss(lora, PARAMS, CFG, SFT, _batch())
    assert np.isfinite(float(loss)) and float(loss) > 0
    assert float(stats["loss/base_sft"]) == float(loss)


def test_sft_overfits_tiny_batch():
    lora = llava_model.init_lora(jax.random.PRNGKey(1), CFG, LORA_CFG)
    tx = make_optimizer(OptimizerConfig(learning_rate=5e-2, warmup_steps=0,
                                        total_steps=100,
                                        lr_scheduler_type="constant"))
    state = TrainState.create(lora, tx)
    batch = _batch()
    losses = []
    step = jax.jit(
        lambda s, b: sft_train_step(s, PARAMS, b, tx, CFG, SFT),
        static_argnames=())
    for _ in range(8):
        state, stats = sft_train_step(state, PARAMS, batch, tx, CFG, SFT)
        losses.append(float(stats["loss/base_sft"]))
    assert losses[-1] < losses[0]


def test_entropy_loss_branch():
    sft = SftConfig(entropy_loss=True, entropy_mask_method="random",
                    entropy_mask_ratio=0.3, entropy_loss_coef=0.1,
                    lora_scaling=LORA_CFG.scaling)
    lora = llava_model.init_lora(jax.random.PRNGKey(1), CFG, LORA_CFG)
    loss, stats = sft_loss(lora, PARAMS, CFG, sft, _batch(),
                           rng=jax.random.PRNGKey(2))
    assert np.isfinite(float(loss))
    assert "loss/entropy" in stats and "loss/mask_sft" in stats
