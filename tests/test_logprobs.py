"""Chunked lm_head readout parity: values + gradients vs the naive
full-logits path, across temperatures, padding vocabs, entropy, and an
lm_head LoRA."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from opadpo_tpu.ops.logprobs import (
    chunked_logprobs, per_token_entropy, per_token_logprobs,
)


def _naive(hidden, w, labels, ignore_index, temperature=1.0,
           head_lora=None, lora_scaling=1.0):
    logits = jnp.einsum("nsd,dv->nsv", hidden, w,
                        preferred_element_type=jnp.float32)
    if head_lora is not None:
        ha = jnp.einsum("nsd,dr->nsr", hidden, head_lora["a"],
                        preferred_element_type=jnp.float32
                        ).astype(head_lora["b"].dtype)
        logits = logits + jnp.einsum(
            "nsr,rv->nsv", ha, head_lora["b"],
            preferred_element_type=jnp.float32) * lora_scaling
    logits = logits / temperature
    return (per_token_logprobs(logits, labels, ignore_index),
            per_token_entropy(logits))


def _setup(v=96, n=2, s=5, d=16, seed=0):
    rng = np.random.default_rng(seed)
    hidden = jnp.asarray(rng.normal(size=(n, s, d)), jnp.float32)
    w = jnp.asarray(rng.normal(size=(d, v)) * 0.3, jnp.float32)
    labels = jnp.asarray(rng.integers(0, v, (n, s)), jnp.int32)
    labels = labels.at[0, 0].set(-100).at[1, -1].set(0)
    return hidden, w, labels


@pytest.mark.parametrize("chunk,temp", [(32, 1.0), (40, 0.7), (96, 1.3),
                                        (7, 1.0), (128, 1.0)])
def test_values_match_naive(chunk, temp):
    hidden, w, labels = _setup()
    lp_ref, ent_ref = _naive(hidden, w, labels, -100, temp)
    lp, ent = chunked_logprobs(hidden, w, labels, -100, temperature=temp,
                               with_entropy=True, chunk_size=chunk)
    np.testing.assert_allclose(lp, lp_ref, rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(ent, ent_ref, rtol=1e-5, atol=1e-5)
    # pad-token (ignore_index) positions are exactly zero
    assert float(lp[0, 0]) == 0.0


def test_ignore_index_zero_pad_semantics():
    hidden, w, labels = _setup()
    lp, _ = chunked_logprobs(hidden, w, labels, 0, chunk_size=32)
    assert float(lp[1, -1]) == 0.0


def test_gradients_match_naive():
    hidden, w, labels = _setup()

    def loss_chunked(h):
        lp, _ = chunked_logprobs(h, w, labels, -100, temperature=0.8,
                                 chunk_size=32)
        return jnp.sum(lp * jnp.asarray([[1., 2., 3., 4., 5.]] * 2))

    def loss_naive(h):
        lp, _ = _naive(h, w, labels, -100, temperature=0.8)
        return jnp.sum(lp * jnp.asarray([[1., 2., 3., 4., 5.]] * 2))

    g1 = jax.grad(loss_chunked)(hidden)
    g2 = jax.grad(loss_naive)(hidden)
    np.testing.assert_allclose(g1, g2, rtol=1e-4, atol=1e-5)


def test_entropy_gradient_matches_naive():
    hidden, w, labels = _setup()

    def h_chunked(h):
        _, ent = chunked_logprobs(h, w, labels, -100, with_entropy=True,
                                  chunk_size=40)
        return jnp.sum(ent)

    def h_naive(h):
        _, ent = _naive(h, w, labels, -100)
        return jnp.sum(ent)

    np.testing.assert_allclose(jax.grad(h_chunked)(hidden),
                               jax.grad(h_naive)(hidden),
                               rtol=1e-4, atol=1e-5)


def test_head_lora_values_and_grads():
    hidden, w, labels = _setup()
    rng = np.random.default_rng(3)
    lora = {"a": jnp.asarray(rng.normal(size=(16, 4)) * 0.2, jnp.float32),
            "b": jnp.asarray(rng.normal(size=(4, 96)) * 0.2, jnp.float32)}

    lp_ref, _ = _naive(hidden, w, labels, -100, head_lora=lora,
                       lora_scaling=2.0)
    lp, _ = chunked_logprobs(hidden, w, labels, -100, head_lora=lora,
                             lora_scaling=2.0, chunk_size=32)
    np.testing.assert_allclose(lp, lp_ref, rtol=1e-5, atol=1e-5)

    def loss_c(lr):
        out, _ = chunked_logprobs(hidden, w, labels, -100, head_lora=lr,
                                  lora_scaling=2.0, chunk_size=32)
        return jnp.sum(out)

    def loss_n(lr):
        out, _ = _naive(hidden, w, labels, -100, head_lora=lr,
                        lora_scaling=2.0)
        return jnp.sum(out)

    g1 = jax.grad(loss_c)(lora)
    g2 = jax.grad(loss_n)(lora)
    for k in ("a", "b"):
        np.testing.assert_allclose(g1[k], g2[k], rtol=1e-4, atol=1e-5)


def test_bf16_inputs_jit():
    hidden, w, labels = _setup(v=64)
    labels = jnp.abs(labels) % 64        # ignore_index=0 contract: labels >= 0
    f = jax.jit(lambda h, w: chunked_logprobs(
        h, w, labels, 0, with_entropy=True, chunk_size=16))
    lp, ent = f(hidden.astype(jnp.bfloat16), w.astype(jnp.bfloat16))
    lp_ref, ent_ref = _naive(hidden.astype(jnp.bfloat16),
                             w.astype(jnp.bfloat16), labels, 0)
    np.testing.assert_allclose(lp, lp_ref, rtol=2e-3, atol=2e-3)
    np.testing.assert_allclose(ent, ent_ref, rtol=2e-3, atol=2e-3)
