"""Flash-attention kernel vs XLA reference (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from opadpo_tpu.ops.attention import flash_attention, mha_reference


def _rand(shape, key, dtype=jnp.float32):
    return jax.random.normal(key, shape, dtype=dtype)


@pytest.mark.parametrize("causal", [True, False])
@pytest.mark.parametrize("seq,heads,dim", [(256, 2, 64), (384, 4, 128)])
def test_flash_fwd_matches_reference(causal, seq, heads, dim):
    key = jax.random.PRNGKey(0)
    kq, kk, kv, km = jax.random.split(key, 4)
    b = 2
    q = _rand((b, seq, heads, dim), kq)
    k = _rand((b, seq, heads, dim), kk)
    v = _rand((b, seq, heads, dim), kv)
    key_mask = jax.random.bernoulli(km, 0.8, (b, seq))
    key_mask = key_mask.at[:, :4].set(True)  # avoid fully-masked causal rows

    out_flash = flash_attention(q, k, v, key_mask=key_mask, causal=causal)
    out_ref = mha_reference(q, k, v, key_mask=key_mask, causal=causal)
    np.testing.assert_allclose(out_flash, out_ref, atol=2e-5, rtol=2e-5)


@pytest.mark.parametrize("causal", [True, False])
def test_flash_bwd_matches_reference(causal):
    key = jax.random.PRNGKey(1)
    kq, kk, kv = jax.random.split(key, 3)
    b, seq, heads, dim = 1, 256, 2, 64
    q = _rand((b, seq, heads, dim), kq)
    k = _rand((b, seq, heads, dim), kk)
    v = _rand((b, seq, heads, dim), kv)
    key_mask = jnp.ones((b, seq), dtype=bool).at[:, -32:].set(False)

    def loss_flash(q, k, v):
        return jnp.sum(
            flash_attention(q, k, v, key_mask=key_mask, causal=causal) ** 2
        )

    def loss_ref(q, k, v):
        return jnp.sum(
            mha_reference(q, k, v, key_mask=key_mask, causal=causal) ** 2
        )

    gf = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b_ in zip(gf, gr):
        np.testing.assert_allclose(a, b_, atol=5e-4, rtol=5e-4)


def test_fully_masked_rows_no_nan():
    b, seq, heads, dim = 1, 128, 1, 64
    q = jnp.ones((b, seq, heads, dim))
    k = jnp.ones((b, seq, heads, dim))
    v = jnp.ones((b, seq, heads, dim))
    key_mask = jnp.zeros((b, seq), dtype=bool)
    out = flash_attention(q, k, v, key_mask=key_mask, causal=True)
    assert not bool(jnp.any(jnp.isnan(out)))


def test_unaligned_seq_and_dim():
    key = jax.random.PRNGKey(2)
    b, seq, heads, dim = 2, 200, 3, 80   # deliberately unaligned
    kq, kk, kv = jax.random.split(key, 3)
    q = _rand((b, seq, heads, dim), kq)
    k = _rand((b, seq, heads, dim), kk)
    v = _rand((b, seq, heads, dim), kv)
    out_flash = flash_attention(q, k, v, causal=True)
    out_ref = mha_reference(q, k, v, causal=True)
    np.testing.assert_allclose(out_flash, out_ref, atol=2e-5, rtol=2e-5)
