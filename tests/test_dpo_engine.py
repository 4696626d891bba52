"""DPO engine numerics + end-to-end train step on the tiny model."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from opadpo_tpu.constants import IMAGE_TOKEN_INDEX
from opadpo_tpu.engine import dpo as dpo_engine
from opadpo_tpu.engine.dpo import DpoConfig, dpo_loss, dpo_train_step, rollout_score
from opadpo_tpu.engine.train_state import OptimizerConfig, TrainState, make_optimizer
from opadpo_tpu.models import llava as llava_model
from opadpo_tpu.models.llava import LlavaConfig
from opadpo_tpu.models.lora import LoraConfig

CFG = LlavaConfig.tiny()
PARAMS = llava_model.init_params(jax.random.PRNGKey(0), CFG)
LORA_CFG = LoraConfig(rank=4, alpha=8.0)
DPO = DpoConfig(response_len=8, query_len=6, lora_scaling=LORA_CFG.scaling)


def _sigmoid_np(x):
    return 1.0 / (1.0 + np.exp(-x))


def test_dpo_loss_matches_reference_formula():
    rng = np.random.default_rng(0)
    shape = (3, 5)
    pc, pr, rc, rr = (rng.normal(size=shape).astype(np.float32)
                      for _ in range(4))
    cs = rng.uniform(1.0, 2.5, size=shape).astype(np.float32)
    rs = rng.uniform(1.0, 2.5, size=shape).astype(np.float32)

    losses, cr, rr_out = dpo_loss(
        jnp.array(pc), jnp.array(pr), jnp.array(rc), jnp.array(rr), DPO,
        chosen_scores=jnp.array(cs), rejected_scores=jnp.array(rs))

    # reference math (dpo_trainer.py:444-467), numpy
    chosen_lr = pc - rc
    rejected_lr = pr - rr
    logits = cs * chosen_lr - rs * rejected_lr
    exp_losses = -np.log(_sigmoid_np(DPO.beta * logits))
    np.testing.assert_allclose(losses, exp_losses, atol=1e-5, rtol=1e-5)
    np.testing.assert_allclose(cr, DPO.beta * chosen_lr, atol=1e-6)
    np.testing.assert_allclose(rr_out, DPO.beta * rejected_lr, atol=1e-6)


def test_dpo_loss_label_smoothing_and_js():
    d = DpoConfig(label_smoothing=0.1, f_divergence_type="js_divergence")
    pc = jnp.array([[0.5]]); pr = jnp.array([[-0.2]])
    rc = jnp.array([[0.1]]); rr = jnp.array([[0.0]])
    losses, _, _ = dpo_loss(pc, pr, rc, rr, d)
    clr, rlr = 0.4, -0.2
    logits = clr - rlr - (np.log1p(np.exp(clr)) - np.log1p(np.exp(rlr)))
    exp = (-np.log(_sigmoid_np(0.1 * logits)) * 0.9
           - np.log(_sigmoid_np(-0.1 * logits)) * 0.1)
    np.testing.assert_allclose(float(losses[0, 0]), exp, atol=1e-5)


def _make_batch(b=2, lq=6, r=8, seed=7):
    ks = jax.random.split(jax.random.PRNGKey(seed), 8)
    v = CFG.llama.vocab_size
    queries = jax.random.randint(ks[0], (b, lq), 5, v)
    queries = queries.at[:, 1].set(IMAGE_TOKEN_INDEX)
    q_mask = jnp.ones((b, lq), jnp.int32).at[0, 0].set(0)
    sz = CFG.vision.image_size
    images = jax.random.normal(ks[1], (b, sz, sz, 3))

    def resp(k):
        ids = jax.random.randint(k, (b, r), 5, v)
        ids = ids.at[:, -2:].set(0)          # pad tail
        mask = (ids != 0).astype(jnp.int32)
        return ids, mask

    std, std_m = resp(ks[2])
    orig, orig_m = resp(ks[3])
    ai, ai_m = resp(ks[4])
    scores = jax.random.uniform(ks[5], (b, r), minval=1.0, maxval=2.5) * ai_m
    return {
        "queries": queries, "queries_attention_mask": q_mask,
        "images": images,
        "standard_response": std, "standard_response_attention_mask": std_m,
        "original_generate_response": orig,
        "original_generate_response_attention_mask": orig_m,
        "AI_pseudo_response": ai, "AI_pseudo_response_attention_mask": ai_m,
        "AI_pseudo_response_scores": scores,
        "original_generate_response_scores": scores,
        "AI_pseudo_response_image_relations": scores,
    }


def test_rollout_then_train_step():
    batch = _make_batch()
    ref_lora = llava_model.init_lora(jax.random.PRNGKey(1), CFG, LORA_CFG)
    rollouts = rollout_score(PARAMS, CFG, DPO, ref_lora, batch,
                             jax.random.PRNGKey(2))
    assert "ref_base_standard_response_logprobs" in rollouts
    assert "masked_images" in rollouts           # CoPO random method
    assert rollouts["ref_base_AI_pseudo_response_logprobs"].shape == (2, 8)
    # pad positions → exactly zero logprob
    lp = np.asarray(rollouts["ref_base_standard_response_logprobs"])
    assert (lp[:, -2:] == 0).all()

    full_batch = {**batch, **rollouts}
    lora0 = llava_model.init_lora(jax.random.PRNGKey(3), CFG, LORA_CFG)
    tx = make_optimizer(OptimizerConfig(learning_rate=1e-3, warmup_steps=0,
                                        total_steps=10))
    state = TrainState.create(lora0, tx)
    new_state, stats = dpo_train_step(state, PARAMS, full_batch, tx, CFG, DPO)

    assert np.isfinite(float(stats["loss/total"]))
    assert np.isfinite(float(stats["loss/grad_norm"]))
    assert float(stats["loss/grad_norm"]) > 0
    # adapter actually moved
    delta = jax.tree_util.tree_reduce(
        lambda acc, x: acc + float(jnp.sum(jnp.abs(x))),
        jax.tree_util.tree_map(lambda a, b: a - b, new_state.params,
                               state.params), 0.0)
    assert delta > 0


def test_train_step_no_copo_no_ancpo():
    d = DpoConfig(CoPO=False, AncPO=False, response_len=8, query_len=6,
                  detailed_report=False, response_score=False,
                  response_image_relation=False,
                  lora_scaling=LORA_CFG.scaling)
    batch = _make_batch()
    ref_lora = llava_model.init_lora(jax.random.PRNGKey(1), CFG, LORA_CFG)
    rollouts = rollout_score(PARAMS, CFG, d, ref_lora, batch,
                             jax.random.PRNGKey(2))
    assert "masked_images" not in rollouts
    full_batch = {**batch, **rollouts}
    lora0 = llava_model.init_lora(jax.random.PRNGKey(3), CFG, LORA_CFG)
    tx = make_optimizer(OptimizerConfig())
    state = TrainState.create(lora0, tx)
    _, stats = dpo_train_step(state, PARAMS, full_batch, tx, CFG, d)
    assert float(stats["loss/stand_mask"]) == 0.0
    assert float(stats["loss/AncPO"]) == 0.0


def test_copo_attention_method():
    d = DpoConfig(CoPO_method="attention", response_len=8, query_len=6,
                  lora_scaling=LORA_CFG.scaling)
    batch = _make_batch()
    ref_lora = llava_model.init_lora(jax.random.PRNGKey(1), CFG, LORA_CFG)
    rollouts = rollout_score(PARAMS, CFG, d, ref_lora, batch,
                             jax.random.PRNGKey(2))
    assert "masked_image_key_mask" in rollouts
    km = np.asarray(rollouts["masked_image_key_mask"])
    expected_zeros = int(CFG.num_patches * d.CoPO_mask_ratio)
    assert ((km == 0).sum(axis=1) == expected_zeros).all()
    full_batch = {**batch, **rollouts}
    lora0 = llava_model.init_lora(jax.random.PRNGKey(3), CFG, LORA_CFG)
    tx = make_optimizer(OptimizerConfig())
    state = TrainState.create(lora0, tx)
    _, stats = dpo_train_step(state, PARAMS, full_batch, tx, CFG, d)
    assert np.isfinite(float(stats["loss/total"]))


def test_score_responses_shared_prefix_matches_stacked():
    """The shared-prefix scoring forward (prefix once + rectangular
    response attention, B-major stacking) must reproduce the stacked
    layout bit-for-bit up to f32 reassociation: rollout logprobs /
    entropies / CoPO outputs, the DPO loss, and the LoRA grads."""
    import dataclasses

    cfg = dataclasses.replace(
        CFG,
        llama=dataclasses.replace(CFG.llama, dtype=jnp.float32),
        vision=dataclasses.replace(CFG.vision, dtype=jnp.float32),
        projector=dataclasses.replace(CFG.projector, dtype=jnp.float32))
    params = llava_model.init_params(jax.random.PRNGKey(0), cfg)
    lora = llava_model.init_lora(jax.random.PRNGKey(1), cfg, LORA_CFG)
    # nonzero B factors so outputs actually depend on the adapter
    lora = jax.tree_util.tree_map(lambda x: x + 0.01, lora)

    batch = _make_batch()
    d_shared = dataclasses.replace(DPO, shared_prefix=True)
    d_stacked = dataclasses.replace(DPO, shared_prefix=False)

    rng = jax.random.PRNGKey(9)
    out_s = rollout_score(params, cfg, d_shared, lora, batch, rng)
    out_t = rollout_score(params, cfg, d_stacked, lora, batch, rng)
    assert set(out_s) == set(out_t)
    for k in out_s:
        np.testing.assert_allclose(np.asarray(out_s[k]),
                                   np.asarray(out_t[k]),
                                   atol=3e-4, rtol=1e-4, err_msg=k)

    full = {**batch, **out_t}
    (l_s, _), g_s = jax.value_and_grad(
        dpo_engine.dpo_loss_and_stats, has_aux=True)(
            lora, params, cfg, d_shared, full)
    (l_t, _), g_t = jax.value_and_grad(
        dpo_engine.dpo_loss_and_stats, has_aux=True)(
            lora, params, cfg, d_stacked, full)
    np.testing.assert_allclose(float(l_s), float(l_t), atol=1e-5)
    for a, b_ in zip(jax.tree_util.tree_leaves(g_s),
                     jax.tree_util.tree_leaves(g_t)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   atol=5e-4, rtol=5e-3)
