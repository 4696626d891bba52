"""Training-free visual-token pruning (cfg.visual_tokens): selection
math, end-to-end shape propagation, and prefill/decode consistency."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from opadpo_tpu.constants import IMAGE_TOKEN_INDEX
from opadpo_tpu.engine.sampler import Sampler
from opadpo_tpu.engine.sampling import SamplingConfig
from opadpo_tpu.models import llava as llava_model
from opadpo_tpu.models.llava import LlavaConfig

CFG = LlavaConfig.tiny()          # 4 patches
PARAMS = llava_model.init_params(jax.random.PRNGKey(0), CFG)
PRUNED = dataclasses.replace(CFG, visual_tokens=2)


def _inputs(b=2, l=10):
    k1, k2 = jax.random.split(jax.random.PRNGKey(4))
    ids = jax.random.randint(k1, (b, l), 5, CFG.llama.vocab_size)
    ids = ids.at[:, 2].set(IMAGE_TOKEN_INDEX)
    mask = jnp.ones((b, l), jnp.int32)
    sz = CFG.vision.image_size
    images = jax.random.normal(k2, (b, sz, sz, 3))
    return ids, mask, images


def test_selection_keeps_top_norm_patches_in_spatial_order():
    _, _, images = _inputs()
    full = llava_model.encode_images(PARAMS, CFG, images)
    pruned = llava_model.encode_images(PARAMS, PRUNED, images)
    assert pruned.shape == (full.shape[0], 2, full.shape[2])
    score = np.asarray(jnp.sum(jnp.square(full.astype(jnp.float32)),
                               axis=-1))
    for i in range(full.shape[0]):
        keep = np.sort(np.argsort(score[i])[-2:])      # spatial order
        np.testing.assert_array_equal(np.asarray(pruned[i]),
                                      np.asarray(full[i])[keep])


def test_num_patches_drives_downstream_shapes():
    assert PRUNED.num_patches == 2
    ids, mask, images = _inputs()
    out = llava_model.forward(PARAMS, PRUNED, ids, mask, images,
                              remat=False)
    # spliced length: L - 1 (image token) + K patches
    assert out["logits"].shape[1] == ids.shape[1] - 1 + 2
    # visual_tokens >= available patches is a no-op
    same = dataclasses.replace(CFG, visual_tokens=4)
    out_same = llava_model.forward(PARAMS, same, ids, mask, images,
                                   remat=False)
    ref = llava_model.forward(PARAMS, CFG, ids, mask, images, remat=False)
    np.testing.assert_array_equal(np.asarray(out_same["logits"]),
                                  np.asarray(ref["logits"]))


def test_pruning_rejects_image_key_mask():
    """CoPO's per-patch mask indexes the full grid — pruning must refuse
    it with a clear error, before CLIP sees a mismatched mask."""
    import pytest
    _, _, images = _inputs()
    mask = jnp.ones((images.shape[0], PRUNED.num_patches), jnp.int32)
    with pytest.raises(ValueError, match="does not compose"):
        llava_model.encode_images(PARAMS, PRUNED, images,
                                  image_key_mask=mask)


def test_pruned_sampler_matches_pruned_full_forward():
    """Prefill/decode under the pruned cfg stays internally consistent:
    greedy Sampler tokens equal the naive rerun-the-forward loop."""
    cfg32 = LlavaConfig(
        dataclasses.replace(CFG.llama, dtype=jnp.float32),
        dataclasses.replace(CFG.vision, dtype=jnp.float32),
        dataclasses.replace(CFG.projector, dtype=jnp.float32),
        visual_tokens=2)
    params32 = llava_model.init_params(jax.random.PRNGKey(0), cfg32)
    ids, mask, images = _inputs()
    n_new = 4
    sampling = SamplingConfig(greedy=True, max_new_tokens=n_new,
                              eos_token_id=-1)
    out = np.asarray(Sampler(cfg32, sampling).generate(
        params32, ids, mask, images, jax.random.PRNGKey(0)))

    cur_ids, cur_mask = ids, mask
    naive = []
    for _ in range(n_new):
        o = llava_model.forward(params32, cfg32, cur_ids, cur_mask, images,
                                remat=False)
        nxt = jnp.argmax(o["logits"][:, -1, :], axis=-1).astype(jnp.int32)
        naive.append(np.asarray(nxt))
        cur_ids = jnp.concatenate([cur_ids, nxt[:, None]], axis=1)
        cur_mask = jnp.concatenate(
            [cur_mask, jnp.ones((ids.shape[0], 1), jnp.int32)], axis=1)
    np.testing.assert_array_equal(out, np.stack(naive, axis=1))
