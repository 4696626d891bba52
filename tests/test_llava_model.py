"""LLaVA model stack tests on the tiny debug config (random weights —
the reference's ``skip_loading_weights`` analogue, SURVEY §4)."""

import jax
import jax.numpy as jnp
import numpy as np

from opadpo_tpu.constants import IGNORE_INDEX, IMAGE_TOKEN_INDEX
from opadpo_tpu.models import llava as llava_model
from opadpo_tpu.models import llama as llama_model
from opadpo_tpu.models.llava import LlavaConfig
from opadpo_tpu.models.lora import LoraConfig

CFG = LlavaConfig.tiny()
KEY = jax.random.PRNGKey(0)
PARAMS = llava_model.init_params(KEY, CFG)


def _make_inputs(batch=2, text_len=16, seed=1):
    k1, k2 = jax.random.split(jax.random.PRNGKey(seed))
    ids = jax.random.randint(k1, (batch, text_len), 5, CFG.llama.vocab_size)
    # image token at different positions per row
    ids = ids.at[0, 3].set(IMAGE_TOKEN_INDEX)
    ids = ids.at[1, 7].set(IMAGE_TOKEN_INDEX)
    mask = jnp.ones((batch, text_len), jnp.int32)
    mask = mask.at[0, :2].set(0)   # left padding
    img_size = CFG.vision.image_size
    images = jax.random.normal(k2, (batch, img_size, img_size, 3))
    return ids, mask, images


def test_splice_matches_python_loop():
    ids, mask, _ = _make_inputs()
    b, l = ids.shape
    d = 8
    p = CFG.num_patches
    text_embeds = jnp.arange(b * l * d, dtype=jnp.float32).reshape(b, l, d)
    image_feats = -jnp.arange(b * p * d, dtype=jnp.float32).reshape(b, p, d)
    labels = jnp.where(mask == 1, ids, IGNORE_INDEX)
    pos = llava_model.splice_positions(ids)

    embeds, key_mask, sp_labels = llava_model.splice_sequence(
        text_embeds, image_feats, mask, pos, text_labels=labels)

    for bi in range(b):
        q = int(pos[bi])
        exp_embeds = np.concatenate([
            np.asarray(text_embeds[bi, :q]),
            np.asarray(image_feats[bi]),
            np.asarray(text_embeds[bi, q + 1:]),
        ])
        np.testing.assert_array_equal(np.asarray(embeds[bi]), exp_embeds)
        exp_mask = np.concatenate([
            np.asarray(mask[bi, :q]), np.ones(p, np.int32),
            np.asarray(mask[bi, q + 1:]),
        ])
        np.testing.assert_array_equal(np.asarray(key_mask[bi]), exp_mask)
        exp_labels = np.concatenate([
            np.asarray(labels[bi, :q]), np.full(p, IGNORE_INDEX),
            np.asarray(labels[bi, q + 1:]),
        ])
        np.testing.assert_array_equal(np.asarray(sp_labels[bi]), exp_labels)


def test_forward_shapes_and_finite():
    ids, mask, images = _make_inputs()
    out = llava_model.forward(PARAMS, CFG, ids, mask, images)
    b, l = ids.shape
    s_out = l - 1 + CFG.num_patches
    assert out["logits"].shape == (b, s_out, CFG.llama.vocab_size)
    assert bool(jnp.all(jnp.isfinite(out["logits"])))


def test_lora_zero_init_is_identity():
    ids, mask, images = _make_inputs()
    lora_cfg = LoraConfig(rank=4, alpha=8.0)
    lora = llava_model.init_lora(jax.random.PRNGKey(3), CFG, lora_cfg,
                                 include_vision=True)
    base = llava_model.forward(PARAMS, CFG, ids, mask, images)
    with_lora = llava_model.forward(PARAMS, CFG, ids, mask, images,
                                    lora=lora, lora_scaling=lora_cfg.scaling)
    np.testing.assert_allclose(base["logits"], with_lora["logits"],
                               atol=1e-5, rtol=1e-5)


def test_prefill_decode_matches_full_forward():
    ids, mask, images = _make_inputs(text_len=12)
    b, l = ids.shape
    n_new = 4
    new_tokens = jax.random.randint(jax.random.PRNGKey(9), (b, n_new), 5,
                                    CFG.llama.vocab_size)

    # Full forward over prompt+response
    full_ids = jnp.concatenate([ids, new_tokens], axis=1)
    full_mask = jnp.concatenate([mask, jnp.ones((b, n_new), jnp.int32)], axis=1)
    full_out = llava_model.forward(PARAMS, CFG, full_ids, full_mask, images,
                                   remat=False)
    s_prompt = l - 1 + CFG.num_patches

    # Prefill + decode
    cache_len = s_prompt + n_new
    pf = llava_model.prefill(PARAMS, CFG, ids, mask, images, cache_len)
    key_mask = pf["key_mask"]
    cache = pf["cache"]
    positions = pf["next_position"]
    step_logits = [pf["last_logits"]]
    for t in range(n_new - 1):
        key_mask = key_mask.at[:, s_prompt + t].set(1)
        logits, cache = llava_model.decode_step(
            PARAMS, CFG, new_tokens[:, t], cache, key_mask, positions)
        positions = positions + 1
        step_logits.append(logits)

    # full_out logits at position s_prompt-1+t predict token t of response
    for t in range(n_new):
        np.testing.assert_allclose(
            np.asarray(full_out["logits"][:, s_prompt - 1 + t, :]),
            np.asarray(step_logits[t]),
            atol=2e-2, rtol=2e-2,
        )
