"""Numerics parity vs HuggingFace reference models (random weights).

The strongest offline parity evidence available without model downloads:
instantiate tiny HF ``LlamaForCausalLM`` / ``CLIPVisionModel`` with random
init, convert their state dicts through the loader, and compare outputs
elementwise.
"""

import numpy as np
import jax
import jax.numpy as jnp
import torch

from opadpo_tpu.models import clip as clip_model
from opadpo_tpu.models import llama as llama_model
from opadpo_tpu.models.loader import (
    clip_params_from_state,
    llama_params_from_state,
    load_peft_adapter,
    lora_from_peft_state,
    lora_to_peft_state,
    save_peft_adapter,
)
from opadpo_tpu.models.lora import LoraConfig


def _torch_state_to_numpy(model):
    return {k: v.detach().float().numpy() for k, v in model.state_dict().items()}


def test_llama_matches_hf():
    from transformers import LlamaConfig as HfLlamaConfig
    from transformers import LlamaForCausalLM

    hf_cfg = HfLlamaConfig(
        vocab_size=512, hidden_size=128, intermediate_size=352,
        num_hidden_layers=2, num_attention_heads=2, num_key_value_heads=2,
        max_position_embeddings=2048, rms_norm_eps=1e-5, rope_theta=10000.0,
        attention_bias=False, tie_word_embeddings=False)
    torch.manual_seed(0)
    hf_model = LlamaForCausalLM(hf_cfg).eval()

    cfg = llama_model.LlamaConfig(
        vocab_size=512, hidden_size=128, intermediate_size=352,
        num_layers=2, num_heads=2, num_kv_heads=2, head_dim=64,
        rms_norm_eps=1e-5, dtype=jnp.float32)
    state = _torch_state_to_numpy(hf_model)
    params = llama_params_from_state(state, cfg)
    params = jax.tree_util.tree_map(lambda x: jnp.asarray(x, jnp.float32),
                                    params)

    b, s = 2, 16
    rng = np.random.default_rng(0)
    ids = rng.integers(4, 512, (b, s))
    mask = np.ones((b, s), np.int64)
    mask[0, :3] = 0                      # left padding
    positions = np.maximum(np.cumsum(mask, axis=1) - 1, 0)

    with torch.no_grad():
        hf_out = hf_model(
            input_ids=torch.tensor(ids),
            attention_mask=torch.tensor(mask),
            position_ids=torch.tensor(positions),
        ).logits.numpy()

    embeds = llama_model.embed_tokens(params, jnp.asarray(ids))
    logits, _ = llama_model.forward(
        params, cfg, embeds, jnp.asarray(mask), jnp.asarray(positions),
        remat=False, attn_impl="xla")
    logits = np.asarray(logits)

    valid = mask.astype(bool)
    np.testing.assert_allclose(logits[valid], hf_out[valid],
                               atol=2e-4, rtol=2e-4)


def test_clip_matches_hf():
    from transformers import CLIPVisionConfig as HfClipConfig
    from transformers import CLIPVisionModel

    hf_cfg = HfClipConfig(
        hidden_size=64, intermediate_size=128, num_hidden_layers=3,
        num_attention_heads=2, image_size=28, patch_size=14,
        hidden_act="quick_gelu", layer_norm_eps=1e-5)
    torch.manual_seed(0)
    hf_model = CLIPVisionModel(hf_cfg).eval()

    cfg = clip_model.ClipVisionConfig(
        image_size=28, patch_size=14, hidden_size=64, intermediate_size=128,
        num_heads=2, num_layers=3, select_layer=-2, dtype=jnp.float32)
    state = _torch_state_to_numpy(hf_model)
    params = clip_params_from_state(state, cfg,
                                    prefix="vision_model.")
    params = jax.tree_util.tree_map(lambda x: jnp.asarray(x, jnp.float32),
                                    params)

    rng = np.random.default_rng(1)
    imgs_hwc = rng.normal(size=(2, 28, 28, 3)).astype(np.float32)
    imgs_chw = np.transpose(imgs_hwc, (0, 3, 1, 2))

    with torch.no_grad():
        hf_out = hf_model(pixel_values=torch.tensor(imgs_chw),
                          output_hidden_states=True)
        # LLaVA: hidden_states[-2], drop CLS
        hf_feats = hf_out.hidden_states[-2][:, 1:, :].numpy()

    ours = np.asarray(clip_model.forward(params, cfg, jnp.asarray(imgs_hwc),
                                         attn_impl="xla"))
    np.testing.assert_allclose(ours, hf_feats, atol=2e-4, rtol=2e-4)


def test_peft_adapter_roundtrip(tmp_path):
    cfg = llama_model.LlamaConfig.tiny()
    lora_cfg = LoraConfig(rank=4, alpha=8.0, dtype=jnp.float32)
    lora = {"llama": llama_model.init_lora(jax.random.PRNGKey(0), cfg,
                                           lora_cfg)}
    # perturb B so it's nonzero
    lora = jax.tree_util.tree_map(
        lambda x: x + 0.01 * jnp.arange(x.size, dtype=x.dtype).reshape(x.shape),
        lora)

    out_dir = str(tmp_path / "adapter")
    save_peft_adapter(lora, out_dir, lora_cfg)
    import os
    assert os.path.exists(os.path.join(out_dir, "adapter_model.bin"))
    assert os.path.exists(os.path.join(out_dir, "adapter_config.json"))

    loaded = load_peft_adapter(out_dir, cfg, dtype=jnp.float32)
    for name, ab in lora["llama"]["layers"].items():
        np.testing.assert_allclose(
            np.asarray(loaded["llama"]["layers"][name]["a"]),
            np.asarray(ab["a"]), atol=1e-6)
        np.testing.assert_allclose(
            np.asarray(loaded["llama"]["layers"][name]["b"]),
            np.asarray(ab["b"]), atol=1e-6)
