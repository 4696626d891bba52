"""Int8 quantization + dequantizing matmul tests."""

import jax
import jax.numpy as jnp
import numpy as np

from opadpo_tpu.constants import IMAGE_TOKEN_INDEX
from opadpo_tpu.models import llava as llava_model
from opadpo_tpu.models.llava import LlavaConfig
from opadpo_tpu.ops.quant import (
    dequantize_weight, q8_dense, quant_matmul, quantize_params,
    quantize_weight, is_quantized,
)

CFG = LlavaConfig.tiny()


def test_quantize_roundtrip_error():
    rng = jax.random.PRNGKey(0)
    w = jax.random.normal(rng, (64, 96), jnp.float32) * 0.05
    wq = quantize_weight(w)
    assert wq["q"].dtype == jnp.int8
    deq = dequantize_weight(wq, jnp.float32)
    # per-channel int8: error bounded by scale/2 per element
    max_scale = float(jnp.max(wq["scale"]))
    assert float(jnp.max(jnp.abs(deq - w))) <= max_scale * 0.5 + 1e-7


def test_quant_matmul_matches_dequantized():
    rng = jax.random.PRNGKey(1)
    k1, k2 = jax.random.split(rng)
    x = jax.random.normal(k1, (40, 200), jnp.float32)
    w = jax.random.normal(k2, (200, 300), jnp.float32) * 0.1
    wq = quantize_weight(w)
    ref = x @ dequantize_weight(wq, jnp.float32)
    out = quant_matmul(x, wq)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=5e-3, rtol=5e-3)


def test_q8_dense_leading_dims():
    rng = jax.random.PRNGKey(2)
    x = jax.random.normal(rng, (2, 5, 64), jnp.float32)
    w = jax.random.normal(rng, (64, 32), jnp.float32) * 0.1
    wq = quantize_weight(w)
    out = q8_dense(x, wq)
    ref = jnp.einsum("bsi,io->bso", x, dequantize_weight(wq, jnp.float32))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=5e-3, rtol=5e-3)


def test_quantize_params_skip_list():
    params = llava_model.init_params(jax.random.PRNGKey(0), CFG)
    qparams = quantize_params(params)
    # decoder linears quantized
    assert is_quantized(qparams["llama"]["layers"]["wq"])
    assert is_quantized(qparams["llama"]["layers"]["w_down"])
    # skip list honored (reference llm_int8_skip_modules + norms/embeds)
    assert not is_quantized(qparams["llama"]["embed"])
    assert not is_quantized(qparams["llama"]["lm_head"])
    assert not is_quantized(qparams["llama"]["layers"]["attn_norm"])
    assert not is_quantized(qparams["projector"]["fc1"])
    assert not is_quantized(qparams["vision"]["patch_embed"])
    assert is_quantized(qparams["vision"]["layers"]["fc1"])


def test_quantized_llava_forward_close_to_bf16():
    params = llava_model.init_params(jax.random.PRNGKey(0), CFG)
    qparams = quantize_params(params)
    k1, k2 = jax.random.split(jax.random.PRNGKey(3))
    b, l = 2, 10
    ids = jax.random.randint(k1, (b, l), 5, CFG.llama.vocab_size)
    ids = ids.at[:, 2].set(IMAGE_TOKEN_INDEX)
    mask = jnp.ones((b, l), jnp.int32)
    sz = CFG.vision.image_size
    images = jax.random.normal(k2, (b, sz, sz, 3))

    ref = llava_model.forward(params, CFG, ids, mask, images, remat=False)
    out = llava_model.forward(qparams, CFG, ids, mask, images, remat=False)
    ref_lp = jax.nn.log_softmax(ref["logits"], axis=-1)
    out_lp = jax.nn.log_softmax(out["logits"], axis=-1)
    # int8 base: logprob drift stays small
    assert float(jnp.mean(jnp.abs(ref_lp - out_lp))) < 0.1
