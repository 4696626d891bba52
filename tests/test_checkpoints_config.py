"""Checkpoint contract + config compose unit tests."""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np

from opadpo_tpu.engine.train_state import (
    OptimizerConfig, TrainState, make_optimizer,
)
from opadpo_tpu.models import llava as llava_model
from opadpo_tpu.models.llava import LlavaConfig
from opadpo_tpu.models.lora import LoraConfig
from opadpo_tpu.pipeline import checkpoints as ck
from opadpo_tpu.pipeline.config import apply_overrides, load_config

CFG = LlavaConfig.tiny()
LORA_CFG = LoraConfig(rank=4, alpha=8.0)


def test_checkpoint_discovery(tmp_path):
    out = str(tmp_path)
    assert ck.get_last_checkpoint(out) == (None, False)
    os.makedirs(os.path.join(out, "checkpoint-10"))
    os.makedirs(os.path.join(out, "checkpoint-250"))
    os.makedirs(os.path.join(out, "checkpoint-30"))
    os.makedirs(os.path.join(out, "not-a-checkpoint"))
    best, completed = ck.get_last_checkpoint(out)
    assert os.path.basename(best) == "checkpoint-250"
    assert not completed
    ck.mark_completed(out)
    assert ck.get_last_checkpoint(out)[1]
    assert ck.parse_checkpoint_step(best) == 250


def test_find_max_step(tmp_path):
    d = str(tmp_path)
    assert ck.find_max_step(d) == 0
    for name in ("step1_rank0.json", "step3_rank1.json", "step2_rank0.json",
                 "other.json"):
        open(os.path.join(d, name), "w").write("[]")
    assert ck.find_max_step(d) == 3


def test_train_state_roundtrip_with_vision_adapter(tmp_path):
    """Full-pytree save/restore preserves vision/projector adapters that
    the PEFT export cannot represent."""
    lora = llava_model.init_lora(jax.random.PRNGKey(0), CFG, LORA_CFG,
                                 include_vision=True)
    lora = jax.tree_util.tree_map(
        lambda x: x + 0.01 * jnp.arange(x.size, dtype=x.dtype
                                        ).reshape(x.shape), lora)
    tx = make_optimizer(OptimizerConfig(learning_rate=1e-3, warmup_steps=0,
                                        total_steps=10))
    state = TrainState.create(lora, tx)
    state = TrainState(params=state.params, opt_state=state.opt_state,
                       step=jnp.asarray(7, jnp.int32))

    ckpt_dir = str(tmp_path / "checkpoint-7")
    ck.save_train_state(ckpt_dir, state, LORA_CFG)
    assert os.path.isdir(os.path.join(ckpt_dir, "adapter_model",
                                      "lora_policy"))
    assert os.path.isdir(os.path.join(ckpt_dir, "adapter_full.ckpt"))

    template = TrainState.create(
        llava_model.init_lora(jax.random.PRNGKey(9), CFG, LORA_CFG,
                              include_vision=True), tx)
    restored = ck.restore_train_state(ckpt_dir, template, CFG.llama)
    assert int(restored.step) == 7
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(np.asarray(a, np.float32),
                                                np.asarray(b, np.float32),
                                                atol=1e-6),
        restored.params, state.params)


def test_weight_decay_excludes_norm_and_bias():
    """Reference AdamW grouping (trainer_utils.py:9-49): LayerNorm and
    bias leaves take no weight decay.  With a pure-decay step (lr>0,
    wd>0, b1=b2=0 unused — check param deltas), masked leaves must be
    untouched by the decay term."""
    from opadpo_tpu.engine.train_state import decay_mask

    params = {
        "layers": {"wq": jnp.ones((4, 4)), "attn_norm": jnp.ones((4,)),
                   "ln1_bias": jnp.zeros((4,))},
        "proj": {"w": jnp.ones((4, 4)), "b": jnp.zeros((4,))},
    }
    mask = decay_mask(params)
    assert mask["layers"]["wq"] is True
    assert mask["layers"]["attn_norm"] is False   # name marker
    assert mask["layers"]["ln1_bias"] is False    # name marker
    assert mask["proj"]["w"] is True
    assert mask["proj"]["b"] is False             # rank-1 leaf

    # end-to-end: adamw with nonzero decay must shrink only masked-True
    # leaves when gradients are zero
    cfg = OptimizerConfig(learning_rate=1e-2, lr_scheduler_type="constant",
                          warmup_steps=0, total_steps=10, weight_decay=0.1,
                          max_grad_norm=None)
    tx = make_optimizer(cfg)
    state = TrainState.create(params, tx)
    zeros = jax.tree_util.tree_map(jnp.zeros_like, params)
    new = state.apply_gradients(tx, zeros)
    assert float(jnp.max(jnp.abs(new.params["layers"]["attn_norm"]
                                 - params["layers"]["attn_norm"]))) == 0.0
    assert float(jnp.max(jnp.abs(new.params["layers"]["wq"]
                                 - params["layers"]["wq"]))) > 0.0


def test_config_compose_and_overrides():
    cfg = load_config("configs/llava_dpo.yaml")
    # inherited from base + checkpoints group
    assert cfg.get_path("model.mm_vision_select_layer") == -2
    assert cfg.get_path("training.beta") == 0.1
    assert cfg.get_path("training.rollout_batch_size") == 64
    assert "image_checkpoint" in cfg
    cfg = apply_overrides(cfg, ["training.beta=0.2",
                                "training.CoPO=false",
                                "mesh.model=2"])
    assert cfg.get_path("training.beta") == 0.2
    assert cfg.get_path("training.CoPO") is False
    assert cfg.get_path("mesh.model") == 2


def test_13b_singlechip_int4_config():
    cfg = load_config("configs/llava_dpo_13b_singlechip.yaml")
    assert cfg.get_path("training.bits") == 4
    assert cfg.get_path("mesh.model") == 1
    assert "13b" in cfg.get_path("checkpoints.base_model")
    # inherits the full DPO recipe
    assert cfg.get_path("training.CoPO") is True
    assert cfg.get_path("training.beta") == 0.1
