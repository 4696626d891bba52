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


def test_q8_dense_gradient_flows_through():
    rng = jax.random.PRNGKey(4)
    k1, k2 = jax.random.split(rng)
    x = jax.random.normal(k1, (8, 64), jnp.float32)
    w = jax.random.normal(k2, (64, 32), jnp.float32) * 0.1
    wq = quantize_weight(w)
    w_deq = dequantize_weight(wq, jnp.float32)

    def loss_q(x):
        return jnp.sum(q8_dense(x, wq) ** 2)

    def loss_ref(x):
        return jnp.sum((x @ w_deq) ** 2)

    gq = jax.grad(loss_q)(x)
    gr = jax.grad(loss_ref)(x)
    np.testing.assert_allclose(np.asarray(gq), np.asarray(gr),
                               atol=1e-2, rtol=1e-2)


def test_qlora_dpo_train_step_on_int8_base():
    """QLoRA configuration end-to-end: frozen int8 base + bf16 LoRA
    through the DPO train step."""
    from opadpo_tpu.engine.dpo import DpoConfig, dpo_train_step, rollout_score
    from opadpo_tpu.engine.train_state import (
        OptimizerConfig, TrainState, make_optimizer,
    )
    from opadpo_tpu.models.lora import LoraConfig
    from tests.test_dpo_engine import _make_batch

    lora_cfg = LoraConfig(rank=4, alpha=8.0)
    dpo = DpoConfig(response_len=8, query_len=6,
                    lora_scaling=lora_cfg.scaling, CoPO=False, AncPO=False,
                    detailed_report=False, response_score=False,
                    response_image_relation=False)
    params = llava_model.init_params(jax.random.PRNGKey(0), CFG)
    qparams = quantize_params(params)
    batch = _make_batch()
    ref_lora = llava_model.init_lora(jax.random.PRNGKey(1), CFG, lora_cfg)
    rollouts = rollout_score(qparams, CFG, dpo, ref_lora, batch,
                             jax.random.PRNGKey(2))
    full_batch = {**batch, **rollouts}
    lora0 = llava_model.init_lora(jax.random.PRNGKey(3), CFG, lora_cfg)
    tx = make_optimizer(OptimizerConfig(learning_rate=1e-3, warmup_steps=0,
                                        total_steps=4))
    state = TrainState.create(lora0, tx)
    new_state, stats = dpo_train_step(state, qparams, full_batch, tx, CFG,
                                      dpo)
    assert np.isfinite(float(stats["loss/total"]))
    assert float(stats["loss/grad_norm"]) > 0


def test_fused_layout_matches_unfused():
    from opadpo_tpu.models.llama import fuse_for_inference
    params = llava_model.init_params(jax.random.PRNGKey(0), CFG)
    fused = {**params, "llama": fuse_for_inference(params["llama"])}
    assert "w_qkv" in fused["llama"]["layers"]
    assert "wq" not in fused["llama"]["layers"]

    k1, k2 = jax.random.split(jax.random.PRNGKey(5))
    b, l = 2, 10
    ids = jax.random.randint(k1, (b, l), 5, CFG.llama.vocab_size)
    ids = ids.at[:, 2].set(IMAGE_TOKEN_INDEX)
    mask = jnp.ones((b, l), jnp.int32)
    sz = CFG.vision.image_size
    images = jax.random.normal(k2, (b, sz, sz, 3))

    ref = llava_model.forward(params, CFG, ids, mask, images, remat=False)
    out = llava_model.forward(fused, CFG, ids, mask, images, remat=False)
    np.testing.assert_allclose(np.asarray(out["logits"]),
                               np.asarray(ref["logits"]),
                               atol=2e-2, rtol=2e-2)

    # fused + quantized layout
    qfused = {**quantize_params(params),
              "llama": fuse_for_inference(quantize_params(params)["llama"])}
    out_q = llava_model.forward(qfused, CFG, ids, mask, images, remat=False)
    assert np.isfinite(np.asarray(out_q["logits"])).all()


def test_w8a8_matches_dequant_path():
    """w8a8 (per-row activation int8) tracks the dequantized matmul within
    int8 quantization error on gaussian activations."""
    import numpy as np
    from opadpo_tpu.ops.quant import (
        _w8a8_nd, dequantize_weight, quantize_weight,
    )

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(64, 256)), jnp.float32)
    w = jnp.asarray(rng.normal(size=(256, 128)) * 0.05, jnp.float32)
    wq = quantize_weight(w)
    ref = x @ dequantize_weight(wq, dtype=jnp.float32)
    out = _w8a8_nd(x, wq["q"], wq["scale"])
    # leading-dims path matches the 2D path
    out3 = _w8a8_nd(x.reshape(4, 16, 256), wq["q"], wq["scale"])
    np.testing.assert_allclose(np.asarray(out3.reshape(64, 128)),
                               np.asarray(out), rtol=1e-6, atol=1e-6)
    err = np.abs(np.asarray(out) - np.asarray(ref))
    scale = np.abs(np.asarray(ref)).mean()
    assert err.mean() / scale < 0.02, (err.mean(), scale)
    assert err.max() / scale < 0.2


def test_act_quant_flag_switches_large_m_path(monkeypatch):
    """With the flag on, q8_dense's large-M forward uses the int8 MXU path
    (and the backward stays the dequantized STE path)."""
    import numpy as np
    from opadpo_tpu.ops import quant

    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(quant._STREAMING_MAX_M + 8, 64)),
                    jnp.float32)
    w = jnp.asarray(rng.normal(size=(64, 32)) * 0.1, jnp.float32)
    wq = quant.quantize_weight(w)

    quant.set_act_quant(True)
    try:
        y = quant.q8_dense(x, wq)
        # gradient flows through (STE): finite, same shape as x
        g = jax.grad(lambda xx: jnp.sum(quant.q8_dense(xx, wq) ** 2))(x)
    finally:
        quant.set_act_quant(False)
    ref = x @ quant.dequantize_weight(wq, dtype=jnp.float32)
    err = np.abs(np.asarray(y) - np.asarray(ref)).mean()
    assert err / np.abs(np.asarray(ref)).mean() < 0.02
    assert np.all(np.isfinite(np.asarray(g)))



def test_bwd_int8_dx_close_to_dequant_backward():
    """act_bwd_int8: the int8-MXU dx (weight scale folded into g before
    per-token quantization) stays close to the dequantized-bf16 backward
    — the w8a8 training accelerator's correctness anchor."""
    import numpy as np
    from opadpo_tpu.ops import quant

    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.normal(size=(quant._STREAMING_MAX_M + 8, 64)),
                    jnp.float32)
    w = jnp.asarray(rng.normal(size=(64, 32)) * 0.1, jnp.float32)
    wq = quant.quantize_weight(w)
    loss = lambda xx: jnp.sum(quant.q8_dense(xx, wq) ** 2)  # noqa: E731

    quant.set_act_quant(True, bwd_int8=False)
    try:
        g_ref = np.asarray(jax.grad(loss)(x))
        quant.set_act_quant(True, bwd_int8=True)
        g_int8 = np.asarray(jax.grad(loss)(x))
    finally:
        quant.set_act_quant(False, bwd_int8=False)

    denom = np.abs(g_ref).mean()
    assert np.abs(g_int8 - g_ref).mean() / denom < 0.02
    cos = (g_ref.ravel() @ g_int8.ravel()
           / (np.linalg.norm(g_ref) * np.linalg.norm(g_int8)))
    assert cos > 0.999, cos


def test_w8a8_outlier_decomposition_restores_accuracy():
    """Static-k outlier decomposition (LLM.int8): with a few huge
    emergent-feature columns, plain per-token int8 loses most of the
    signal resolution; carrying the top-k columns in bf16 restores it."""
    import numpy as np
    from opadpo_tpu.ops import quant

    rng = np.random.default_rng(2)
    x = rng.normal(size=(64, 256)).astype(np.float32)
    x[:, [3, 100, 200]] *= 80.0          # emergent outlier columns
    x = jnp.asarray(x)
    w = jnp.asarray(rng.normal(size=(256, 128)) * 0.05, jnp.float32)
    wq = quant.quantize_weight(w)
    ref = np.asarray(x @ quant.dequantize_weight(wq, dtype=jnp.float32))
    scale = np.abs(ref).mean()

    plain = np.asarray(quant._w8a8_nd(x, wq["q"], wq["scale"]))
    quant.set_act_quant(False, outlier_cols=8)
    try:
        decomp = np.asarray(quant._w8a8_nd(x, wq["q"], wq["scale"]))
    finally:
        quant.set_act_quant(False, outlier_cols=0)

    err_plain = np.abs(plain - ref).mean() / scale
    err_decomp = np.abs(decomp - ref).mean() / scale
    assert err_decomp < 0.02, err_decomp
    assert err_decomp < err_plain / 3, (err_plain, err_decomp)

    # leading-dims path agrees with 2D
    quant.set_act_quant(False, outlier_cols=8)
    try:
        d3 = np.asarray(quant._w8a8_nd(x.reshape(4, 16, 256),
                                       wq["q"], wq["scale"]))
    finally:
        quant.set_act_quant(False, outlier_cols=0)
    np.testing.assert_allclose(d3.reshape(64, 128), decomp,
                               rtol=1e-5, atol=1e-5)


# ---------------------------------------------------------------------------
# int4 (bits=4, reference bnb 4-bit path)
# ---------------------------------------------------------------------------

def test_int4_pack_roundtrip_error():
    from opadpo_tpu.ops.quant import dequantize_weight4, quantize_weight_int4
    rng = jax.random.PRNGKey(10)
    w = jax.random.normal(rng, (256, 96), jnp.float32) * 0.05
    wq = quantize_weight_int4(w, group=128)
    assert wq["q4"].shape == (128, 96) and wq["q4"].dtype == jnp.int8
    assert wq["scale"].shape == (2, 96)
    deq = dequantize_weight4(wq, jnp.float32)
    # group-wise int4: error bounded by scale/2 per element
    max_scale = float(jnp.max(wq["scale"]))
    assert float(jnp.max(jnp.abs(deq - w))) <= max_scale * 0.5 + 1e-7


def test_int4_pack_roundtrip_exact_codes():
    """Packing stores exact int4 codes: requantizing the dequantized
    weight is lossless."""
    from opadpo_tpu.ops.quant import dequantize_weight4, quantize_weight_int4
    rng = jax.random.PRNGKey(11)
    w = jax.random.normal(rng, (2, 256, 64), jnp.float32)  # stacked layout
    wq = quantize_weight_int4(w)
    deq = dequantize_weight4(wq, jnp.float32)
    wq2 = quantize_weight_int4(deq)
    np.testing.assert_array_equal(np.asarray(wq["q4"]), np.asarray(wq2["q4"]))


def test_quant_matmul4_matches_dequantized():
    from opadpo_tpu.ops.quant import (
        dequantize_weight4, quant_matmul4, quantize_weight_int4,
    )
    rng = jax.random.PRNGKey(12)
    k1, k2 = jax.random.split(rng)
    x = jax.random.normal(k1, (40, 2048), jnp.float32)
    w = jax.random.normal(k2, (2048, 300), jnp.float32) * 0.1
    wq = quantize_weight_int4(w)
    ref = x @ dequantize_weight4(wq, jnp.float32)
    out = quant_matmul4(x, wq)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-2, rtol=2e-2)
    # multiple K-blocks — 8 groups per block (the Mosaic-legal minimum;
    # a 1-group block lowers in interpret mode but not on hardware)
    out2 = quant_matmul4(x, wq, block_k=1024)
    np.testing.assert_allclose(np.asarray(out2), np.asarray(ref),
                               atol=2e-2, rtol=2e-2)


def test_quant_matmul4_13b_down_proj_block_k_mosaic_legal():
    """K=13824 (13B MLP down-proj): the bk-cap heuristic lands on 6912 →
    a 54-group scale block, which 8-aligned Mosaic tiling rejects ON
    HARDWARE (interpret mode lowered it fine and the chip refused).  108
    groups have no 8-aligned divisor, so selection must fall back to the
    whole-K block — the in-function asserts enforce the rule; this pins
    it with the real shape."""
    from opadpo_tpu.ops.quant import (
        dequantize_weight4, quant_matmul4, quantize_weight_int4,
    )
    rng = jax.random.PRNGKey(5)
    k1, k2 = jax.random.split(rng)
    x = jax.random.normal(k1, (4, 13824), jnp.float32)
    w = jax.random.normal(k2, (13824, 256), jnp.float32) * 0.02
    wq = quantize_weight_int4(w)
    ref = x @ dequantize_weight4(wq, jnp.float32)
    out = quant_matmul4(x, wq)   # would assert if block_k picks 54 groups
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-2, rtol=2e-2)


def test_q4_dense_leading_dims_and_grad():
    from opadpo_tpu.ops.quant import (
        dequantize_weight4, q4_dense, quantize_weight_int4,
    )
    rng = jax.random.PRNGKey(13)
    x = jax.random.normal(rng, (2, 5, 128), jnp.float32)
    w = jax.random.normal(rng, (128, 32), jnp.float32) * 0.1
    wq = quantize_weight_int4(w)
    w_deq = dequantize_weight4(wq, jnp.float32)
    out = q4_dense(x, wq)
    ref = jnp.einsum("bsi,io->bso", x, w_deq)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=5e-3, rtol=5e-3)
    gq = jax.grad(lambda xx: jnp.sum(q4_dense(xx, wq) ** 2))(x)
    gr = jax.grad(lambda xx: jnp.sum(jnp.einsum("bsi,io->bso", xx, w_deq) ** 2))(x)
    np.testing.assert_allclose(np.asarray(gq), np.asarray(gr),
                               atol=1e-2, rtol=1e-2)


def test_quantize_params_bits4_with_int8_fallback():
    from opadpo_tpu.ops.quant import is_quantized4
    params = llava_model.init_params(jax.random.PRNGKey(0), CFG)
    qparams = quantize_params(params, bits=4)
    # tiny config: wq in-dim 128 → int4; w_down in-dim 352 (not a multiple
    # of the group) → int8 fallback
    assert is_quantized4(qparams["llama"]["layers"]["wq"])
    assert is_quantized(qparams["llama"]["layers"]["w_down"])
    assert not is_quantized4(qparams["llama"]["embed"])
    assert not is_quantized4(qparams["llama"]["lm_head"])


def test_int4_llava_forward_finite_and_close():
    params = llava_model.init_params(jax.random.PRNGKey(0), CFG)
    qparams = quantize_params(params, bits=4)
    k1, k2 = jax.random.split(jax.random.PRNGKey(14))
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
    assert np.isfinite(np.asarray(out_lp)).all()
    # int4 base: lossier than int8 but still close on the tiny model
    assert float(jnp.mean(jnp.abs(ref_lp - out_lp))) < 0.3


def test_int4_fused_layout_and_dpo_step():
    """bits=4 through QKV fusion and the DPO train step (QLoRA on int4)."""
    from opadpo_tpu.engine.dpo import DpoConfig, dpo_train_step, rollout_score
    from opadpo_tpu.engine.train_state import (
        OptimizerConfig, TrainState, make_optimizer,
    )
    from opadpo_tpu.models.llama import fuse_for_inference
    from opadpo_tpu.models.lora import LoraConfig
    from tests.test_dpo_engine import _make_batch

    params = llava_model.init_params(jax.random.PRNGKey(0), CFG)
    qparams = quantize_params(params, bits=4)
    fused = {**qparams, "llama": fuse_for_inference(qparams["llama"])}
    assert "q4" in fused["llama"]["layers"]["w_qkv"]

    lora_cfg = LoraConfig(rank=4, alpha=8.0)
    dpo = DpoConfig(response_len=8, query_len=6,
                    lora_scaling=lora_cfg.scaling, CoPO=False, AncPO=False,
                    detailed_report=False, response_score=False,
                    response_image_relation=False)
    batch = _make_batch()
    ref_lora = llava_model.init_lora(jax.random.PRNGKey(1), CFG, lora_cfg)
    rollouts = rollout_score(qparams, CFG, dpo, ref_lora, batch,
                             jax.random.PRNGKey(2))
    full_batch = {**batch, **rollouts}
    lora0 = llava_model.init_lora(jax.random.PRNGKey(3), CFG, lora_cfg)
    tx = make_optimizer(OptimizerConfig(learning_rate=1e-3, warmup_steps=0,
                                        total_steps=4))
    state = TrainState.create(lora0, tx)
    new_state, stats = dpo_train_step(state, qparams, full_batch, tx, CFG,
                                      dpo)
    assert np.isfinite(float(stats["loss/total"]))
    assert float(stats["loss/grad_norm"]) > 0


def test_init_params_quantized_matches_fused_quantize():
    """Piecewise init->quantize (one program per subtree, the OOM-safe
    path for full-scale skip_loading_weights) must agree with the fused
    quantize: identical structure/dtypes, bit-equal unquantized leaves,
    and dequantized weights within one quantization step (the per-piece
    programs fuse the scale max-reduction differently -> +/-1 ulp scale
    -> +/-1 int8 step; semantically the same weights)."""
    from opadpo_tpu.ops.quant import quantize_params

    fused = quantize_params(
        llava_model.init_params(jax.random.PRNGKey(0), CFG), bits=8)
    piecewise = llava_model.init_params_quantized(
        jax.random.PRNGKey(0), CFG, bits=8)

    fa = jax.tree_util.tree_leaves_with_path(fused)
    pa = jax.tree_util.tree_leaves_with_path(piecewise)
    assert [jax.tree_util.keystr(k) for k, _ in fa] == \
           [jax.tree_util.keystr(k) for k, _ in pa]
    for (kpath, a), (_, b) in zip(fa, pa):
        a, b = np.asarray(a), np.asarray(b)
        assert a.shape == b.shape and a.dtype == b.dtype, \
            jax.tree_util.keystr(kpath)
        if a.dtype == np.int8:
            assert np.abs(a.astype(np.int32) - b.astype(np.int32)).max() \
                <= 1, jax.tree_util.keystr(kpath)
        else:
            # scales and bf16 leaves: eager-vs-jit fusion differences
            # round the last ulp differently
            np.testing.assert_allclose(
                np.asarray(a, np.float32), np.asarray(b, np.float32),
                rtol=1e-2, atol=1e-4, err_msg=jax.tree_util.keystr(kpath))


def test_setup_model_skip_loading_does_not_double_quantize():
    """setup_model's skip_loading_weights branch builds quantized params
    piecewise; the generic bits-in-(4,8) quantize below it must detect
    the already-quantized tree and leave it alone (tiny keeps the fused
    path, exercising the detection on a REAL quantized tree)."""
    from opadpo_tpu.pipeline.runtime import setup_model

    cfg, params, _ = setup_model(None, tiny=True, bits=8)
    leaf = params["llama"]["layers"]["wq"]
    assert set(leaf) == {"q", "scale"} and leaf["q"].dtype == jnp.int8
    # a second quantize would have produced {"q": {"q": ...}} nesting
    assert not isinstance(leaf["q"], dict)
