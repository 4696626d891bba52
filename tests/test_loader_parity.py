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


def test_llama_gqa_matches_hf():
    """GQA (num_kv_heads < num_heads): the repeat/grouped-attention path
    must match HF exactly — this is the oracle the fused GQA kernel test
    compares against."""
    from transformers import LlamaConfig as HfLlamaConfig
    from transformers import LlamaForCausalLM

    hf_cfg = HfLlamaConfig(
        vocab_size=256, hidden_size=128, intermediate_size=224,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=2048, rms_norm_eps=1e-5, rope_theta=10000.0,
        attention_bias=False, tie_word_embeddings=False)
    torch.manual_seed(1)
    hf_model = LlamaForCausalLM(hf_cfg).eval()

    cfg = llama_model.LlamaConfig(
        vocab_size=256, hidden_size=128, intermediate_size=224,
        num_layers=2, num_heads=4, num_kv_heads=2, head_dim=32,
        rms_norm_eps=1e-5, dtype=jnp.float32)
    params = jax.tree_util.tree_map(
        lambda x: jnp.asarray(x, jnp.float32),
        llama_params_from_state(_torch_state_to_numpy(hf_model), cfg))

    rng = np.random.default_rng(3)
    ids = rng.integers(4, 256, (2, 12))
    mask = np.ones((2, 12), np.int64)
    mask[1, :2] = 0
    positions = np.maximum(np.cumsum(mask, axis=1) - 1, 0)
    with torch.no_grad():
        hf_out = hf_model(input_ids=torch.tensor(ids),
                          attention_mask=torch.tensor(mask),
                          position_ids=torch.tensor(positions),
                          ).logits.numpy()
    embeds = llama_model.embed_tokens(params, jnp.asarray(ids))
    logits, _ = llama_model.forward(
        params, cfg, embeds, jnp.asarray(mask), jnp.asarray(positions),
        remat=False, attn_impl="xla")
    valid = mask.astype(bool)
    np.testing.assert_allclose(np.asarray(logits)[valid], hf_out[valid],
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


def test_llava_full_model_matches_hf():
    """Whole-assembly parity vs HF ``LlavaForConditionalGeneration``
    (VERDICT r2 item 2): one image+text forward covering the splice
    position, select-layer −2 feature tap, projector numerics, and
    left-padded rows — the strongest real-weight-parity proxy available
    offline.  HF expands the image token to num_patches copies; ours
    splices at a single IMAGE_TOKEN_INDEX marker — both must produce
    elementwise-equal logits over the spliced sequence."""
    from transformers import CLIPVisionConfig as HfClipConfig
    from transformers import LlamaConfig as HfLlamaConfig
    from transformers import LlavaConfig as HfLlavaConfig
    from transformers import LlavaForConditionalGeneration

    from opadpo_tpu.constants import IMAGE_TOKEN_INDEX
    from opadpo_tpu.models import llava as llava_model
    from opadpo_tpu.models import projector as projector_model
    from opadpo_tpu.models.loader import llava_params_from_hf_state

    vis_cfg = HfClipConfig(
        hidden_size=64, intermediate_size=128, num_hidden_layers=3,
        num_attention_heads=2, image_size=28, patch_size=14,
        hidden_act="quick_gelu", layer_norm_eps=1e-5)
    txt_cfg = HfLlamaConfig(
        vocab_size=512, hidden_size=128, intermediate_size=352,
        num_hidden_layers=2, num_attention_heads=2, num_key_value_heads=2,
        max_position_embeddings=2048, rms_norm_eps=1e-5, rope_theta=10000.0,
        attention_bias=False, tie_word_embeddings=False)
    image_token = 500
    hf_cfg = HfLlavaConfig(
        vision_config=vis_cfg, text_config=txt_cfg,
        image_token_index=image_token, projector_hidden_act="gelu",
        vision_feature_select_strategy="default", vision_feature_layer=-2)
    torch.manual_seed(0)
    hf_model = LlavaForConditionalGeneration(hf_cfg).eval()

    lm = llama_model.LlamaConfig(
        vocab_size=512, hidden_size=128, intermediate_size=352,
        num_layers=2, num_heads=2, num_kv_heads=2, head_dim=64,
        rms_norm_eps=1e-5, dtype=jnp.float32)
    vis = clip_model.ClipVisionConfig(
        image_size=28, patch_size=14, hidden_size=64, intermediate_size=128,
        num_heads=2, num_layers=3, select_layer=-2, dtype=jnp.float32)
    cfg = llava_model.LlavaConfig(lm, vis, projector_model.ProjectorConfig(
        in_dim=64, out_dim=128, dtype=jnp.float32))
    num_patches = cfg.num_patches
    assert num_patches == 4

    params = llava_params_from_hf_state(
        _torch_state_to_numpy(hf_model), cfg)
    params = jax.tree_util.tree_map(lambda x: jnp.asarray(x, jnp.float32),
                                    params)

    # ragged left-padded batch; marker position varies per row
    rng = np.random.default_rng(2)
    b, l = 3, 16
    pads = [0, 3, 5]
    markers = [1, 4, 7]
    ids_ours = rng.integers(4, 500, (b, l))
    mask_ours = np.ones((b, l), np.int64)
    for i in range(b):
        ids_ours[i, :pads[i]] = 0
        mask_ours[i, :pads[i]] = 0
        ids_ours[i, markers[i]] = IMAGE_TOKEN_INDEX
        assert markers[i] >= pads[i]

    # HF-expanded equivalents: image token repeated num_patches times
    s = l - 1 + num_patches
    ids_hf = np.zeros((b, s), np.int64)
    mask_hf = np.zeros((b, s), np.int64)
    for i in range(b):
        q = markers[i]
        ids_hf[i] = np.concatenate([
            ids_ours[i, :q], [image_token] * num_patches,
            ids_ours[i, q + 1:]])
        mask_hf[i] = np.concatenate([
            mask_ours[i, :q], [1] * num_patches, mask_ours[i, q + 1:]])
    positions = np.maximum(np.cumsum(mask_hf, axis=1) - 1, 0)

    imgs_hwc = rng.normal(size=(b, 28, 28, 3)).astype(np.float32)
    imgs_chw = np.transpose(imgs_hwc, (0, 3, 1, 2))

    with torch.no_grad():
        hf_out = hf_model(
            input_ids=torch.tensor(ids_hf),
            attention_mask=torch.tensor(mask_hf),
            position_ids=torch.tensor(positions),
            pixel_values=torch.tensor(imgs_chw),
        ).logits.numpy()

    out = llava_model.forward(
        params, cfg, jnp.asarray(ids_ours), jnp.asarray(mask_ours),
        jnp.asarray(imgs_hwc), remat=False, attn_impl="xla")
    np.testing.assert_array_equal(np.asarray(out["key_mask"]), mask_hf)
    logits = np.asarray(out["logits"])

    valid = mask_hf.astype(bool)
    np.testing.assert_allclose(logits[valid], hf_out[valid],
                               atol=1e-4, rtol=1e-4)


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
