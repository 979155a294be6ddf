"""GRPO train/logprob steps on the virtual 8-device mesh (SURVEY.md §2.9 DP/TP/FSDP)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from socioreasoner_tpu.models.qwen2_5_vl.config import Qwen25VLConfig
from socioreasoner_tpu.models.qwen2_5_vl import model as qmodel
from socioreasoner_tpu.models.qwen2_5_vl import rope as qrope
from socioreasoner_tpu.parallel.sharding import param_shardings, batch_shardings
from socioreasoner_tpu.distributed.trainer import (
    TrainState, make_optimizer, make_train_step, make_logprob_step, make_sft_step)
from socioreasoner_tpu.pipeline.losses import PPOLossConfig, ppo_policy_loss, value_loss


def make_batch(config, B=8, L=16, seed=0):
    rng = np.random.default_rng(seed)
    ids = rng.integers(2, 200, size=(B, L))
    attn = np.ones((B, L), np.int64)
    pos, _ = qrope.get_rope_index(config, ids, None, attn)
    resp = np.zeros((B, L), np.int32)
    resp[:, L // 2:] = 1
    return {
        "input_ids": ids, "attention_mask": attn, "position_ids": pos,
        "response_mask": resp,
        "advantages": rng.normal(size=(B, L - 1)).astype(np.float32),
        "old_log_probs": (-np.abs(rng.normal(size=(B, L - 1)))).astype(np.float32),
        "ref_log_probs": (-np.abs(rng.normal(size=(B, L - 1)))).astype(np.float32),
    }


def test_train_step_sharded(mesh8):
    config = Qwen25VLConfig.tiny()
    params = qmodel.init_params(config, jax.random.key(0), with_vision=False)
    params = jax.device_put(params, param_shardings(params, mesh8))
    optimizer = make_optimizer(lr=1e-3)
    state = TrainState.create(params, optimizer)
    step = make_train_step(config, PPOLossConfig(), optimizer)

    batch = make_batch(config)
    bs = batch_shardings(mesh8, batch)
    batch = {k: jax.device_put(np.asarray(v), bs[k]) for k, v in batch.items()}

    with jax.sharding.set_mesh(mesh8):
        jitted = jax.jit(step)
        state1, m1 = jitted(state, batch)
        state2, m2 = jitted(state1, batch)
    assert np.isfinite(float(m1["actor_train/total_loss"]))
    assert int(state2.step) == 2
    # params actually changed
    d = jax.tree.map(lambda a, b: float(jnp.abs(a - b).max()), state.params, state2.params)
    assert max(jax.tree.leaves(d)) > 0
    # second step reduces or changes loss (sanity, not strict descent)
    assert float(m2["actor_train/total_loss"]) != float(m1["actor_train/total_loss"])


def test_logprob_step(mesh8):
    config = Qwen25VLConfig.tiny()
    params = qmodel.init_params(config, jax.random.key(1), with_vision=False)
    step = make_logprob_step(config)
    batch = make_batch(config, B=4)
    out = jax.jit(step)(params, {k: jnp.asarray(v) for k, v in batch.items()})
    assert out["log_probs"].shape == (4, 15)
    lp = np.array(out["log_probs"])
    resp = batch["response_mask"][:, 1:]
    assert np.all(lp[resp == 0] == 0)
    assert np.all(lp[resp == 1] <= 0)
    assert np.all(np.array(out["entropy"])[resp == 1] >= 0)


def test_sft_step():
    config = Qwen25VLConfig.tiny()
    params = qmodel.init_params(config, jax.random.key(2), with_vision=False)
    optimizer = make_optimizer(lr=1e-3)
    state = TrainState.create(params, optimizer)
    step = jax.jit(make_sft_step(config, optimizer))
    batch = make_batch(config, B=4)
    batch["loss_mask"] = batch["response_mask"]
    batch = {k: jnp.asarray(v) for k, v in batch.items()}
    losses = []
    for _ in range(3):
        state, m = step(state, batch)
        losses.append(float(m["sft/loss"]))
    assert losses[-1] < losses[0]  # CE on fixed batch must go down


def test_ppo_loss_dual_clip_and_agg():
    rng = np.random.default_rng(0)
    B, T = 4, 8
    lp = -np.abs(rng.normal(size=(B, T))).astype(np.float32)
    old = lp + rng.normal(size=(B, T)).astype(np.float32) * 0.5
    ref = lp - 0.1
    adv = rng.normal(size=(B, T)).astype(np.float32)
    mask = np.ones((B, T), np.float32)
    ent = np.abs(rng.normal(size=(B, T))).astype(np.float32)
    for dual in (False, True):
        cfg = PPOLossConfig(dual_clip_loss=dual, entropy_loss_coef=0.01)
        loss, metrics = ppo_policy_loss(jnp.array(lp), jnp.array(ent), jnp.array(old),
                                        jnp.array(ref), jnp.array(adv), jnp.array(mask), cfg)
        assert np.isfinite(float(loss))
        assert 0 <= float(metrics["actor_train/ppo_ratio_clipfrac"]) <= 1
    # dual-clip bounds the loss where advantages are very negative
    adv_neg = np.full((B, T), -5.0, np.float32)
    big_ratio = lp  # log ratio up to ~2
    l_plain, _ = ppo_policy_loss(jnp.array(lp), jnp.array(ent), jnp.array(old),
                                 None, jnp.array(adv_neg), jnp.array(mask),
                                 PPOLossConfig(dual_clip_loss=False, use_kl_loss=False))
    l_dual, _ = ppo_policy_loss(jnp.array(lp), jnp.array(ent), jnp.array(old),
                                None, jnp.array(adv_neg), jnp.array(mask),
                                PPOLossConfig(dual_clip_loss=True, use_kl_loss=False))
    assert float(l_dual) <= float(l_plain) + 1e-6


def test_clipfrac_metrics_masked():
    """Padding tokens (garbage ratios) must not count toward clipfrac
    (VERDICT r3 Weak #3; ref masked stats base_worker.py:304-320)."""
    B, T = 2, 8
    lp = np.full((B, T), -1.0, np.float32)
    old = lp.copy()                       # real-token ratios identically 1
    # garbage on padding: huge log-ratio → ratio far outside the clip band
    mask = np.zeros((B, T), np.float32)
    mask[:, :3] = 1.0
    old[mask == 0] = -9.0
    _, metrics = ppo_policy_loss(jnp.array(lp), jnp.array(np.zeros((B, T), np.float32)),
                                 jnp.array(old), None,
                                 jnp.array(np.ones((B, T), np.float32)),
                                 jnp.array(mask),
                                 PPOLossConfig(use_kl_loss=False))
    assert float(metrics["actor_train/ppo_ratio_clipfrac"]) == 0.0
    assert float(metrics["actor_train/ppo_ratio_low_clipfrac"]) == 0.0
    assert float(metrics["actor_train/ppo_ratio_high_clipfrac"]) == 0.0
    # sanity: a genuinely clipped real token IS counted
    old2 = lp.copy()
    old2[0, 0] = -2.0                     # ratio e^1 > 1.2 on a real token
    _, m2 = ppo_policy_loss(jnp.array(lp), jnp.array(np.zeros((B, T), np.float32)),
                            jnp.array(old2), None,
                            jnp.array(np.ones((B, T), np.float32)),
                            jnp.array(mask), PPOLossConfig(use_kl_loss=False))
    assert float(m2["actor_train/ppo_ratio_high_clipfrac"]) > 0.0


def test_value_loss():
    rng = np.random.default_rng(1)
    B, T = 3, 6
    v = rng.normal(size=(B, T)).astype(np.float32)
    ov = v + rng.normal(size=(B, T)).astype(np.float32) * 0.5
    ret = rng.normal(size=(B, T)).astype(np.float32)
    mask = np.ones((B, T), np.float32)
    loss, m = value_loss(jnp.array(v), jnp.array(ov), jnp.array(ret), jnp.array(mask))
    assert np.isfinite(float(loss)) and float(loss) >= 0


def test_graft_entry_dryrun():
    from __graft_entry__ import dryrun_multichip
    dryrun_multichip(8)


def test_topr_loss_variant():
    rng = np.random.default_rng(7)
    B, T = 3, 6
    lp = -np.abs(rng.normal(size=(B, T))).astype(np.float32)
    old = lp + rng.normal(size=(B, T)).astype(np.float32) * 0.3
    adv = rng.normal(size=(B, T)).astype(np.float32)
    mask = np.ones((B, T), np.float32)
    ent = np.zeros((B, T), np.float32)
    cfg = PPOLossConfig(loss_type="topr", use_kl_loss=False)
    loss, metrics = ppo_policy_loss(jnp.array(lp), jnp.array(ent), jnp.array(old),
                                    None, jnp.array(adv), jnp.array(mask), cfg)
    assert np.isfinite(float(loss))
    # differs from standard PPO on the same inputs
    loss_ppo, _ = ppo_policy_loss(jnp.array(lp), jnp.array(ent), jnp.array(old),
                                  None, jnp.array(adv), jnp.array(mask),
                                  PPOLossConfig(use_kl_loss=False))
    assert abs(float(loss) - float(loss_ppo)) > 1e-6


def test_chunked_head_matches_full_logits():
    """chunked_logp_entropy (fused head, no (B,L,V) logits) must match the
    full-logits path in values AND grads, including non-divisible L."""
    import os
    from socioreasoner_tpu.distributed import trainer as T

    cfg = Qwen25VLConfig.tiny(512)
    params = qmodel.init_params(cfg, jax.random.key(0), jnp.float32,
                                with_vision=False)
    rng = np.random.default_rng(0)
    B, L = 2, 37                       # L % chunk != 0 exercises the pad path
    batch = {"input_ids": jnp.asarray(rng.integers(5, 290, size=(B, L))),
             "position_ids": jnp.tile(jnp.arange(L)[None, None], (B, 3, 1)),
             "attention_mask": jnp.ones((B, L), jnp.int32)}

    def run(chunk):
        os.environ["SOCIO_HEAD_CHUNK"] = chunk
        try:
            return T._model_log_probs(cfg, params, batch, remat=False)
        finally:
            os.environ.pop("SOCIO_HEAD_CHUNK", None)

    lp0, e0 = run("0")
    lp1, e1 = run("8")
    np.testing.assert_allclose(np.asarray(lp0), np.asarray(lp1), atol=1e-5)
    np.testing.assert_allclose(np.asarray(e0), np.asarray(e1), atol=1e-5)

    def loss(p, chunk):
        os.environ["SOCIO_HEAD_CHUNK"] = chunk
        try:
            lp, ent = T._model_log_probs(cfg, p, batch, remat=False)
            return lp.mean() + 0.1 * ent.mean()
        finally:
            os.environ.pop("SOCIO_HEAD_CHUNK", None)

    g0 = jax.grad(lambda p: loss(p, "0"))(params)
    g1 = jax.grad(lambda p: loss(p, "8"))(params)
    errs = jax.tree.map(lambda a, b: float(jnp.abs(a - b).max()), g0, g1)
    assert max(jax.tree.leaves(errs)) < 1e-6
