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


def test_flash_attention_fused_matches_unfused():
    """flash_attention_fused (pallas rope+head-split+pad prologue /
    gather epilogue) == apply_rope + flash_attention + reshape, values
    and input gradients."""
    from opadpo_tpu.ops.attention import flash_attention, flash_attention_fused
    from opadpo_tpu.ops.rope import apply_rope, rope_frequencies

    b, s, h, hd = 2, 50, 2, 128
    d = h * hd
    cos, sin = rope_frequencies(hd, 128, 10000.0)
    rng = jax.random.PRNGKey(0)
    k1, k2, k3 = jax.random.split(rng, 3)
    q2 = jax.random.normal(k1, (b, s, d), jnp.float32) * 0.3
    kk2 = jax.random.normal(k2, (b, s, d), jnp.float32) * 0.3
    v2 = jax.random.normal(k3, (b, s, d), jnp.float32) * 0.3
    positions = jnp.tile(jnp.arange(s, dtype=jnp.int32)[None], (b, 1))
    km = jnp.ones((b, s), jnp.int32).at[:, -5:].set(0)

    def ref(q2, kk2, v2):
        q = q2.reshape(b, s, h, hd)
        k = kk2.reshape(b, s, h, hd)
        v = v2.reshape(b, s, h, hd)
        q, k = apply_rope(q, k, cos, sin, positions)
        o = flash_attention(q, k, v, key_mask=km, causal=True)
        return o.reshape(b, s, d).astype(jnp.float32)

    def fused(q2, kk2, v2):
        return flash_attention_fused(
            q2, kk2, v2, cos, sin, positions, h, key_mask=km,
            causal=True).astype(jnp.float32)

    o_ref = ref(q2, kk2, v2)
    o_fus = fused(q2, kk2, v2)
    np.testing.assert_allclose(np.asarray(o_fus), np.asarray(o_ref),
                               atol=2e-2, rtol=2e-2)

    w = jax.random.normal(rng, (b, s, d), jnp.float32)
    g_ref = jax.grad(lambda *a: jnp.sum(ref(*a) * w), argnums=(0, 1, 2))(
        q2, kk2, v2)
    g_fus = jax.grad(lambda *a: jnp.sum(fused(*a) * w), argnums=(0, 1, 2))(
        q2, kk2, v2)
    for gr, gf in zip(g_ref, g_fus):
        np.testing.assert_allclose(np.asarray(gf), np.asarray(gr),
                                   atol=5e-2, rtol=5e-2)


def test_use_fused_flash_dispatch(monkeypatch):
    """The fused-prologue dispatch guards: TPU-only, MHA-only, 128-aligned
    heads, mesh-divisible shapes under TP, honors impl overrides and the
    kill switch."""
    from opadpo_tpu.models.llama import _use_fused_flash
    from opadpo_tpu.ops import attention as att

    # CPU backend → never fused
    assert not _use_fused_flash("auto", 1599, 4, 32, 32, 128)

    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    assert _use_fused_flash("auto", 1599, 4, 32, 32, 128)
    assert _use_fused_flash("flash", 1599, 4, 32, 32, 128)
    assert not _use_fused_flash("xla", 1599, 4, 32, 32, 128)
    assert _use_fused_flash("auto", 1599, 4, 32, 8, 128)        # GQA fused
    assert not _use_fused_flash("auto", 1599, 4, 32, 12, 128)   # nh % nkv
    assert not _use_fused_flash("auto", 1599, 4, 32, 32, 64)    # hd unaligned
    assert not _use_fused_flash("auto", 8192, 4, 32, 32, 128)   # too long

    att.set_fused_attention(False)
    try:
        assert not _use_fused_flash("auto", 1599, 4, 32, 32, 128)
    finally:
        att.set_fused_attention(True)

    class FakeMesh:
        shape = {"data": 2, "model": 2}
    att.set_tp_mesh(FakeMesh())
    try:
        # divisible batch/heads → fused runs inside the TP shard_map
        assert _use_fused_flash("auto", 1599, 4, 32, 32, 128)
        # heads not divisible by the model axis → unfused fallback
        assert not _use_fused_flash("auto", 1599, 4, 31, 31, 128)
        # batch not divisible by the data axis → unfused fallback
        assert not _use_fused_flash("auto", 1599, 3, 32, 32, 128)
        # GQA: kv heads must also divide the model axis
        assert _use_fused_flash("auto", 1599, 4, 32, 8, 128)
        assert not _use_fused_flash("auto", 1599, 4, 32, 1, 128)
    finally:
        att.set_tp_mesh(None)


def test_flash_attention_fused_gqa_matches_repeat():
    """GQA fused path: the prologue expands kv heads in-kernel (no
    jnp.repeat) — values and ALL input grads (incl. the accumulated
    kv-head grads through the VJP gather) must match the materialized
    repeat + fused-MHA reference."""
    from opadpo_tpu.ops.attention import flash_attention_fused
    from opadpo_tpu.ops.rope import apply_rope, rope_frequencies
    from opadpo_tpu.ops.attention import flash_attention

    b, s, h, nkv, hd = 2, 50, 4, 2, 128
    rep = h // nkv
    cos, sin = rope_frequencies(hd, 128, 10000.0)
    rng = jax.random.PRNGKey(1)
    k1, k2, k3 = jax.random.split(rng, 3)
    q2 = jax.random.normal(k1, (b, s, h * hd), jnp.float32) * 0.3
    kk2 = jax.random.normal(k2, (b, s, nkv * hd), jnp.float32) * 0.3
    v2 = jax.random.normal(k3, (b, s, nkv * hd), jnp.float32) * 0.3
    positions = jnp.tile(jnp.arange(s, dtype=jnp.int32)[None], (b, 1))
    km = jnp.ones((b, s), jnp.int32).at[:, -5:].set(0)

    def ref(q2, kk2, v2):
        q = q2.reshape(b, s, h, hd)
        k = kk2.reshape(b, s, nkv, hd)
        v = v2.reshape(b, s, nkv, hd)
        q, k = apply_rope(q, k, cos, sin, positions)
        k = jnp.repeat(k, rep, axis=2)
        v = jnp.repeat(v, rep, axis=2)
        o = flash_attention(q, k, v, key_mask=km, causal=True)
        return o.reshape(b, s, h * hd).astype(jnp.float32)

    def fused(q2, kk2, v2):
        return flash_attention_fused(
            q2, kk2, v2, cos, sin, positions, h, key_mask=km,
            causal=True, num_kv_heads=nkv).astype(jnp.float32)

    o_ref = ref(q2, kk2, v2)
    o_fus = fused(q2, kk2, v2)
    np.testing.assert_allclose(np.asarray(o_fus), np.asarray(o_ref),
                               atol=2e-2, rtol=2e-2)

    w = jax.random.normal(rng, (b, s, h * hd), jnp.float32)
    g_ref = jax.grad(lambda *a: jnp.sum(ref(*a) * w), argnums=(0, 1, 2))(
        q2, kk2, v2)
    g_fus = jax.grad(lambda *a: jnp.sum(fused(*a) * w), argnums=(0, 1, 2))(
        q2, kk2, v2)
    for gr, gf in zip(g_ref, g_fus):
        assert gr.shape == gf.shape
        np.testing.assert_allclose(np.asarray(gf), np.asarray(gr),
                                   atol=5e-2, rtol=5e-2)


def test_flash_attention_fused_tp_matches_local():
    """flash_attention_fused under a registered TP mesh (shard_map over
    the 8-device CPU mesh, head-sharded feature axis) == the no-mesh
    path.  Exercises _flash_attention_fused_tp including the bwd."""
    from opadpo_tpu.ops import attention as att
    from opadpo_tpu.ops.attention import flash_attention_fused
    from opadpo_tpu.ops.rope import rope_frequencies
    from opadpo_tpu.parallel import MeshConfig, make_mesh

    b, s, h, hd = 4, 50, 4, 128
    d = h * hd
    cos, sin = rope_frequencies(hd, 128, 10000.0)
    rng = jax.random.PRNGKey(3)
    k1, k2, k3 = jax.random.split(rng, 3)
    q2 = jax.random.normal(k1, (b, s, d), jnp.float32) * 0.3
    kk2 = jax.random.normal(k2, (b, s, d), jnp.float32) * 0.3
    v2 = jax.random.normal(k3, (b, s, d), jnp.float32) * 0.3
    positions = jnp.tile(jnp.arange(s, dtype=jnp.int32)[None], (b, 1))
    km = jnp.ones((b, s), jnp.int32).at[:, -5:].set(0)

    def f(q2, kk2, v2):
        o = flash_attention_fused(q2, kk2, v2, cos, sin, positions, h,
                                  key_mask=km, causal=True)
        return o.astype(jnp.float32)

    o_local = f(q2, kk2, v2)
    g_local = jax.grad(lambda *a: jnp.sum(f(*a) ** 2), argnums=(0, 1, 2))(
        q2, kk2, v2)

    mesh = make_mesh(MeshConfig(data=4, model=2))
    att.set_tp_mesh(mesh)
    try:
        o_tp = jax.jit(f)(q2, kk2, v2)
        g_tp = jax.jit(jax.grad(lambda *a: jnp.sum(f(*a) ** 2),
                                argnums=(0, 1, 2)))(q2, kk2, v2)
    finally:
        att.set_tp_mesh(None)

    np.testing.assert_allclose(np.asarray(o_tp), np.asarray(o_local),
                               atol=2e-2, rtol=2e-2)
    for gl, gt in zip(g_local, g_tp):
        np.testing.assert_allclose(np.asarray(gt), np.asarray(gl),
                                   atol=5e-2, rtol=5e-2)


def test_decode_attention_prompt_kernel_matches_reference():
    """decode_attention_prompt (interpret mode): unnormalized out/m/l over
    a padded, masked int8 prompt cache match a dense softmax reference,
    including the multi-s-block online-softmax path."""
    from opadpo_tpu.ops.decode_attention import decode_attention_prompt

    rng = np.random.default_rng(0)
    b, h, hd = 2, 4, 128
    for sp, sp_real, block_s in ((256, 200, 1024), (512, 470, 256)):
        q = jnp.asarray(rng.standard_normal((b, h, hd)) * 0.4, jnp.float32)
        pk = jnp.asarray(rng.integers(-127, 128, (b, h, sp, hd)), jnp.int8)
        pv = jnp.asarray(rng.integers(-127, 128, (b, h, sp, hd)), jnp.int8)
        ks = jnp.asarray(
            np.abs(rng.standard_normal((b, h, sp))) * 0.01 + 1e-4,
            jnp.float32)
        vs = jnp.asarray(
            np.abs(rng.standard_normal((b, h, sp))) * 0.01 + 1e-4,
            jnp.float32)
        bias_np = np.zeros((b, sp), np.float32)
        bias_np[:, sp_real:] = -1e30
        bias_np[0, 3] = -1e30          # a masked in-range position
        bias = jnp.asarray(bias_np)
        sm = hd ** -0.5

        s = jnp.einsum("bhd,bhsd->bhs", q, pk.astype(jnp.float32)
                       ) * ks * sm + bias[:, None, :]
        m_ref = jnp.max(s, axis=-1)
        p = jnp.exp(s - m_ref[..., None])
        l_ref = jnp.sum(p, axis=-1)
        o_ref = jnp.einsum("bhs,bhsd->bhd", p * vs, pv.astype(jnp.float32))

        o, m, l = decode_attention_prompt(q, pk, ks, pv, vs, bias, sm,
                                          block_s=block_s)
        # merged output o/l must match the normalized reference closely
        np.testing.assert_allclose(
            np.asarray(o / l[..., None]),
            np.asarray(o_ref / l_ref[..., None]), atol=2e-2, rtol=2e-2)
        # the flash state must agree after normalization by exp(m)
        np.testing.assert_allclose(
            np.asarray(jnp.log(l) + m), np.asarray(jnp.log(l_ref) + m_ref),
            atol=1e-3, rtol=1e-3)


def test_quantize_prompt_kv_int4_roundtrip_and_layout():
    """Group-local half-split packing: dequantize(quantize_int4(kv))
    recovers kv within the per-(pos,head) step size amax/7/2, padding is
    256-aligned, and the scale layout matches the int8 cache's."""
    from opadpo_tpu.models import llama as llama_model

    rng = np.random.default_rng(2)
    b, sp, h, hd = 2, 300, 4, 128
    kv = jnp.asarray(rng.standard_normal((b, sp, h, hd)), jnp.float32)
    q4 = llama_model.quantize_prompt_kv_int4(kv)
    assert q4["q4"].shape == (b, h, 256, hd)          # 512-pad packed /2
    assert q4["scale"].shape == (b, h, 512)
    deq = llama_model.dequantize_prompt_kv_int4(q4)   # [B, H, 512, hd]
    step = np.asarray(q4["scale"])[..., :sp, None]
    err = np.abs(np.asarray(deq)[:, :, :sp]
                 - np.asarray(kv.transpose(0, 2, 1, 3)))
    assert np.all(err <= step / 2 + 1e-6), float((err - step / 2).max())
    # padded positions carry scale 0 → dequantized zeros
    assert np.all(np.asarray(deq)[:, :, sp:] == 0)

    # preallocation at a chunked-decode total length
    q4b = llama_model.quantize_prompt_kv_int4(kv, total_len=1024)
    assert q4b["q4"].shape == (b, h, 512, hd)
    np.testing.assert_array_equal(np.asarray(q4b["q4"][:, :, :128]),
                                  np.asarray(q4["q4"][:, :, :128]))


def test_decode_attention_prompt4_matches_reference():
    """decode_attention_prompt4 (interpret mode) over the half-split
    packed int4 cache matches a dense softmax reference built from the
    dequantized cache — including multi-s-block and s_used paths."""
    from opadpo_tpu.models import llama as llama_model
    from opadpo_tpu.ops.decode_attention import decode_attention_prompt4

    rng = np.random.default_rng(3)
    b, h, hd = 2, 4, 128
    for sp_pad, sp_real, block_s, s_used in ((512, 400, 1024, None),
                                             (1024, 700, 256, None),
                                             (1024, 700, 1024, 768)):
        q = jnp.asarray(rng.standard_normal((b, h, hd)) * 0.4, jnp.float32)
        kv_k = jnp.asarray(rng.standard_normal((b, sp_pad, h, hd)),
                           jnp.float32)
        kv_v = jnp.asarray(rng.standard_normal((b, sp_pad, h, hd)),
                           jnp.float32)
        pk = llama_model.quantize_prompt_kv_int4(kv_k)
        pv = llama_model.quantize_prompt_kv_int4(kv_v)
        bias_np = np.zeros((b, sp_pad), np.float32)
        bias_np[:, sp_real:] = -1e30
        bias_np[0, 5] = -1e30
        bias = jnp.asarray(bias_np)
        sm = hd ** -0.5

        lim = s_used if s_used is not None else sp_pad
        kd = llama_model.dequantize_prompt_kv_int4(pk)[:, :, :lim]
        vd = llama_model.dequantize_prompt_kv_int4(pv)[:, :, :lim]
        s = jnp.einsum("bhd,bhsd->bhs", q, kd) * sm + bias[:, None, :lim]
        m_ref = jnp.max(s, axis=-1)
        p = jnp.exp(s - m_ref[..., None])
        l_ref = jnp.sum(p, axis=-1)
        o_ref = jnp.einsum("bhs,bhsd->bhd", p, vd)

        o, m, l = decode_attention_prompt4(
            q, pk["q4"], pk["scale"], pv["q4"], pv["scale"], bias, sm,
            block_s=block_s, s_used=s_used)
        np.testing.assert_allclose(
            np.asarray(o / l[..., None]),
            np.asarray(o_ref / l_ref[..., None]), atol=2e-2, rtol=2e-2)
        np.testing.assert_allclose(
            np.asarray(jnp.log(l) + m), np.asarray(jnp.log(l_ref) + m_ref),
            atol=1e-3, rtol=1e-3)


def test_fold_suffix_into_int4_prompt_kv():
    """The in-place fold on the packed int4 cache equals re-quantizing
    the concatenated sequence directly (256-aligned offsets)."""
    from opadpo_tpu.models import llama as llama_model

    rng = np.random.default_rng(4)
    b, h, hd, c = 2, 3, 128, 256
    sp0, total = 512, 1024
    kv_prompt = jnp.asarray(rng.standard_normal((b, sp0, h, hd)),
                            jnp.float32)
    suffix = jnp.asarray(rng.standard_normal((b, c, h, hd)), jnp.float32)
    pk = llama_model.quantize_prompt_kv_int4(kv_prompt, total_len=total)
    kv_list = [(pk, jax.tree_util.tree_map(jnp.copy, pk))]
    sfx = [(suffix, suffix)]
    pm = (jax.lax.broadcasted_iota(jnp.int32, (b, total), 1)
          < sp0).astype(jnp.int32)
    filled = 200                                     # partial fill
    new_kv, new_pm = llama_model.fold_suffix_into_prompt_kv(
        kv_list, sfx, pm, jnp.asarray(filled), jnp.int32(sp0))

    direct = llama_model.quantize_prompt_kv_int4(
        jnp.concatenate([kv_prompt, suffix], axis=1), total_len=total)
    got = new_kv[0][0]
    np.testing.assert_array_equal(
        np.asarray(got["q4"][:, :, :(sp0 + c) // 2]),
        np.asarray(direct["q4"][:, :, :(sp0 + c) // 2]))
    np.testing.assert_allclose(
        np.asarray(got["scale"][:, :, :sp0 + c]),
        np.asarray(direct["scale"][:, :, :sp0 + c]), rtol=1e-6)
    # mask: true through sp0+filled, false beyond
    exp_pm = (np.arange(total)[None] < sp0 + filled).astype(np.int32)
    np.testing.assert_array_equal(np.asarray(new_pm),
                                  np.broadcast_to(exp_pm, (b, total)))


def test_decode_attention_prompt_head_count_not_divisible_by_16():
    """13B has 40 KV heads: hblk must fall back to a divisor of h (8), not
    assert out on min(16, 40).  Regression for the r2 advisor finding."""
    from opadpo_tpu.ops.decode_attention import decode_attention_prompt

    rng = np.random.default_rng(1)
    b, h, sp, hd = 1, 40, 256, 128
    q = jnp.asarray(rng.standard_normal((b, h, hd)) * 0.4, jnp.float32)
    pk = jnp.asarray(rng.integers(-127, 128, (b, h, sp, hd)), jnp.int8)
    pv = jnp.asarray(rng.integers(-127, 128, (b, h, sp, hd)), jnp.int8)
    ks = jnp.asarray(np.abs(rng.standard_normal((b, h, sp))) * 0.01 + 1e-4,
                     jnp.float32)
    vs = jnp.asarray(np.abs(rng.standard_normal((b, h, sp))) * 0.01 + 1e-4,
                     jnp.float32)
    bias_np = np.zeros((b, sp), np.float32)
    bias_np[:, 200:] = -1e30
    bias = jnp.asarray(bias_np)
    sm = hd ** -0.5

    s = jnp.einsum("bhd,bhsd->bhs", q, pk.astype(jnp.float32)
                   ) * ks * sm + bias[:, None, :]
    m_ref = jnp.max(s, axis=-1)
    p = jnp.exp(s - m_ref[..., None])
    l_ref = jnp.sum(p, axis=-1)
    o_ref = jnp.einsum("bhs,bhsd->bhd", p * vs, pv.astype(jnp.float32))

    o, m, l = decode_attention_prompt(q, pk, ks, pv, vs, bias, sm)
    np.testing.assert_allclose(
        np.asarray(o / l[..., None]),
        np.asarray(o_ref / l_ref[..., None]), atol=2e-2, rtol=2e-2)


def test_decode_attention_hblk_mosaic_legal():
    """The head axis is second-to-last in the kernel's q/out/scale blocks,
    so hblk must divide h AND be a multiple of 8 (or equal h) — Mosaic
    rejects e.g. (1, 10, 128) on hardware even though 10 divides 40, and
    interpret-mode tests don't enforce the tiling rule (that exact case
    shipped and failed to lower on the chip)."""
    from opadpo_tpu.ops.decode_attention import _pick_hblk

    for h in (1, 2, 4, 6, 8, 12, 16, 20, 24, 32, 40, 48, 64, 80):
        hblk = _pick_hblk(h, 16)
        assert h % hblk == 0, (h, hblk)
        assert hblk % 8 == 0 or hblk == h, (h, hblk)
    assert _pick_hblk(40, 16) == 8          # 13B: not 10
    assert _pick_hblk(32, 16) == 16
    assert _pick_hblk(4, 16) == 4           # tiny test config: whole dim
    assert _pick_hblk(20, 16) == 20         # no 8-aligned divisor ≤ 16


# ---------------------------------------------------------------------------
# Shared-prefix (rectangular offset-causal) attention
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("sq,skv", [(200, 456), (128, 384), (192, 192)])
def test_flash_prefix_matches_reference(sq, skv):
    """flash_attention_prefix (query rows aligned to the end of a longer
    KV, causal offset = Skv - Sq) == mha_reference at Sq <= Skv, fwd and
    grads — the kernel layout DPO shared-prefix scoring uses."""
    from opadpo_tpu.ops.attention import flash_attention_prefix

    key = jax.random.PRNGKey(11)
    kq, kk, kv, km = jax.random.split(key, 4)
    b, h, d = 2, 2, 64
    q = _rand((b, sq, h, d), kq)
    k = _rand((b, skv, h, d), kk)
    v = _rand((b, skv, h, d), kv)
    mask = jax.random.bernoulli(km, 0.85, (b, skv)).at[:, :4].set(True)

    out = flash_attention_prefix(q, k, v, key_mask=mask)
    ref = mha_reference(q, k, v, key_mask=mask, causal=True)
    np.testing.assert_allclose(out, ref, atol=2e-5, rtol=2e-5)

    gf = jax.grad(lambda *a: jnp.sum(
        flash_attention_prefix(*a, key_mask=mask) ** 2),
        argnums=(0, 1, 2))(q, k, v)
    gr = jax.grad(lambda *a: jnp.sum(
        mha_reference(*a, key_mask=mask, causal=True) ** 2),
        argnums=(0, 1, 2))(q, k, v)
    for a, b_ in zip(gf, gr):
        np.testing.assert_allclose(a, b_, atol=5e-4, rtol=5e-4)


def _fused_shared_inputs(b, kk_, sp, sr, h, hd, nkv=None, seed=21):
    from opadpo_tpu.ops.rope import rope_frequencies

    nkv = nkv or h
    d, dkv = h * hd, nkv * hd
    ks = jax.random.split(jax.random.PRNGKey(seed), 8)
    qp2 = _rand((b, sp, d), ks[0]) * 0.3
    kp2 = _rand((b, sp, dkv), ks[1]) * 0.3
    vp2 = _rand((b, sp, dkv), ks[2]) * 0.3
    qr2 = _rand((b * kk_, sr, d), ks[3]) * 0.3
    kr2 = _rand((b * kk_, sr, dkv), ks[4]) * 0.3
    vr2 = _rand((b * kk_, sr, dkv), ks[5]) * 0.3
    mask_p = jax.random.bernoulli(
        ks[6], 0.9, (b, sp)).at[:, :4].set(True).astype(jnp.int32)
    mask_r = jax.random.bernoulli(
        ks[7], 0.9, (b * kk_, sr)).astype(jnp.int32)
    pos_p = jnp.maximum(jnp.cumsum(mask_p, axis=1) - 1, 0)
    pos_r = (jnp.sum(mask_p, 1).repeat(kk_)[:, None]
             + jnp.maximum(jnp.cumsum(mask_r, 1) - 1, 0))
    cos, sin = rope_frequencies(hd, 2048)
    return qp2, kp2, vp2, qr2, kr2, vr2, cos, sin, pos_p, pos_r, mask_p, mask_r


def _stacked_rowwise_reference(args, b, kk_, sp, sr, h, hd, nkv):
    """Per-(example, response) full-sequence attention via mha_reference —
    the stacked layout the shared path must reproduce."""
    from opadpo_tpu.ops.rope import apply_rope

    (qp2, kp2, vp2, qr2, kr2, vr2, cos, sin,
     pos_p, pos_r, mask_p, mask_r) = args
    rep = h // nkv
    outs_p, outs_r = [], []
    for bb in range(b):
        row_p = None
        for t in range(kk_):
            rr = bb * kk_ + t
            q = jnp.concatenate([qp2[bb], qr2[rr]], 0).reshape(
                1, sp + sr, h, hd)
            k = jnp.concatenate([kp2[bb], kr2[rr]], 0).reshape(
                1, sp + sr, nkv, hd)
            v = jnp.concatenate([vp2[bb], vr2[rr]], 0).reshape(
                1, sp + sr, nkv, hd)
            pos = jnp.concatenate([pos_p[bb], pos_r[rr]])[None]
            q, k = apply_rope(q, k, cos, sin, pos)
            if rep > 1:
                k = jnp.repeat(k, rep, axis=2)
                v = jnp.repeat(v, rep, axis=2)
            m = jnp.concatenate([mask_p[bb], mask_r[rr]])[None]
            o = mha_reference(q, k, v, key_mask=m, causal=True)[0]
            o = o.reshape(sp + sr, h * hd)
            row_p = o[:sp] if row_p is None else row_p
            outs_r.append(o[sp:])
        outs_p.append(row_p)
    return jnp.stack(outs_p), jnp.stack(outs_r)


@pytest.mark.parametrize("nkv", [2, 1])
def test_flash_attention_fused_shared_matches_stacked(nkv):
    """flash_attention_fused_shared (prefix once + rectangular response
    kernel, B-major rows) == per-row stacked full-sequence attention,
    including GQA (nkv < h) and grads through all six projections."""
    from opadpo_tpu.ops.attention import flash_attention_fused_shared

    b, kk_, sp, sr, h, hd = 2, 3, 160, 192, 2, 128
    args = _fused_shared_inputs(b, kk_, sp, sr, h, hd, nkv=nkv)
    (qp2, kp2, vp2, qr2, kr2, vr2, cos, sin,
     pos_p, pos_r, mask_p, mask_r) = args

    def f(qp2, kp2, vp2, qr2, kr2, vr2):
        op2, or2 = flash_attention_fused_shared(
            qp2, kp2, vp2, qr2, kr2, vr2, cos, sin, pos_p, pos_r, h,
            mask_p, mask_r, num_kv_heads=nkv)
        return op2.astype(jnp.float32), or2.astype(jnp.float32)

    op2, or2 = f(qp2, kp2, vp2, qr2, kr2, vr2)
    ref_p, ref_r = _stacked_rowwise_reference(args, b, kk_, sp, sr, h, hd,
                                              nkv)
    np.testing.assert_allclose(np.asarray(op2), np.asarray(ref_p),
                               atol=2e-2, rtol=2e-2)
    np.testing.assert_allclose(np.asarray(or2), np.asarray(ref_r),
                               atol=2e-2, rtol=2e-2)

    # grads: shared vs stacked reference (prefix grads accumulate over
    # the kk_ responses that attend to them)
    def loss_shared(*a):
        op, orr = f(*a)
        return jnp.sum(op ** 2) + jnp.sum(orr ** 2)

    def loss_ref(*a):
        rp, rr_ = _stacked_rowwise_reference(
            (*a, cos, sin, pos_p, pos_r, mask_p, mask_r),
            b, kk_, sp, sr, h, hd, nkv)
        return jnp.sum(rp ** 2) + jnp.sum(rr_ ** 2)

    gs = jax.grad(loss_shared, argnums=tuple(range(6)))(
        qp2, kp2, vp2, qr2, kr2, vr2)
    gr = jax.grad(loss_ref, argnums=tuple(range(6)))(
        qp2, kp2, vp2, qr2, kr2, vr2)
    for a, b_ in zip(gs, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   atol=5e-2, rtol=5e-2)


def test_flash_attention_fused_shared_tp_matches_local():
    """The shared-prefix fused pipeline under a registered TP mesh
    (B-major response rows data-sharded alongside their prefix rows)
    == the no-mesh path, fwd + grads."""
    from opadpo_tpu.ops import attention as att
    from opadpo_tpu.ops.attention import flash_attention_fused_shared
    from opadpo_tpu.parallel import MeshConfig, make_mesh

    b, kk_, sp, sr, h, hd = 4, 3, 96, 128, 4, 128
    args = _fused_shared_inputs(b, kk_, sp, sr, h, hd, seed=31)
    (qp2, kp2, vp2, qr2, kr2, vr2, cos, sin,
     pos_p, pos_r, mask_p, mask_r) = args

    def f(qp2, kp2, vp2, qr2, kr2, vr2):
        op2, or2 = flash_attention_fused_shared(
            qp2, kp2, vp2, qr2, kr2, vr2, cos, sin, pos_p, pos_r, h,
            mask_p, mask_r)
        return op2.astype(jnp.float32), or2.astype(jnp.float32)

    def loss(*a):
        op, orr = f(*a)
        return jnp.sum(op ** 2) + jnp.sum(orr ** 2)

    o_local = f(qp2, kp2, vp2, qr2, kr2, vr2)
    g_local = jax.grad(loss, argnums=tuple(range(6)))(
        qp2, kp2, vp2, qr2, kr2, vr2)

    mesh = make_mesh(MeshConfig(data=4, model=2))
    att.set_tp_mesh(mesh)
    try:
        o_tp = jax.jit(f)(qp2, kp2, vp2, qr2, kr2, vr2)
        g_tp = jax.jit(jax.grad(loss, argnums=tuple(range(6))))(
            qp2, kp2, vp2, qr2, kr2, vr2)
    finally:
        att.set_tp_mesh(None)

    for a, b_ in zip(o_tp, o_local):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   atol=2e-2, rtol=2e-2)
    for a, b_ in zip(g_tp, g_local):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   atol=5e-2, rtol=5e-2)


def test_decode_attention_prompt_multi_matches_single():
    """Multi-query (speculative-verify) kernel: G queries in one pass
    must equal G independent single-query kernel calls (same flash-state
    contract), including under a block_h that splits the head axis and
    an s_used watermark."""
    from opadpo_tpu.ops.decode_attention import (
        decode_attention_prompt, decode_attention_prompt_multi,
    )

    rng = np.random.default_rng(1)
    b, h, gq, hd, sp = 2, 16, 5, 128, 512
    q = jnp.asarray(rng.standard_normal((b, h, gq, hd)) * 0.4, jnp.float32)
    pk = jnp.asarray(rng.integers(-127, 128, (b, h, sp, hd)), jnp.int8)
    pv = jnp.asarray(rng.integers(-127, 128, (b, h, sp, hd)), jnp.int8)
    ks = jnp.asarray(np.abs(rng.standard_normal((b, h, sp))) * 0.01 + 1e-4,
                     jnp.float32)
    vs = jnp.asarray(np.abs(rng.standard_normal((b, h, sp))) * 0.01 + 1e-4,
                     jnp.float32)
    bias_np = np.zeros((b, sp), np.float32)
    bias_np[:, 400:] = -1e30
    bias = jnp.asarray(bias_np)
    sm = hd ** -0.5

    for kwargs in ({"block_h": 8}, {"block_h": 8, "block_s": 256},
                   {"block_h": 16, "s_used": 256}):
        o, m, l = decode_attention_prompt_multi(q, pk, ks, pv, vs, bias,
                                                sm, **kwargs)
        assert o.shape == (b, h, gq, hd) and m.shape == (b, h, gq)
        for g in range(gq):
            o1, m1, l1 = decode_attention_prompt(
                q[:, :, g], pk, ks, pv, vs, bias, sm,
                block_h=kwargs.get("block_h", 16),
                block_s=kwargs.get("block_s", 1024),
                s_used=kwargs.get("s_used"))
            np.testing.assert_allclose(np.asarray(o[:, :, g]),
                                       np.asarray(o1), atol=1e-4,
                                       rtol=1e-4)
            np.testing.assert_allclose(np.asarray(m[:, :, g]),
                                       np.asarray(m1), atol=1e-5,
                                       rtol=1e-5)
            np.testing.assert_allclose(np.asarray(l[:, :, g]),
                                       np.asarray(l1), atol=1e-4,
                                       rtol=1e-4)
