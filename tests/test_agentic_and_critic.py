"""Agentic env pipeline, critic value step, vocab-parallel ops."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from socioreasoner_tpu.models.qwen2_5_vl.config import Qwen25VLConfig
from socioreasoner_tpu.models.qwen2_5_vl import model as qmodel


def test_env_registry_and_rollout():
    from socioreasoner_tpu.pipeline.agentic.environment_worker import (
        EnvironmentWorker, make_env)
    from socioreasoner_tpu.configs.worker_config import WorkerConfig
    env = make_env("guess_number", low=0, high=7, max_turns=20)
    obs = env.reset(seed=0)
    assert "Guess" in obs
    # binary-search agent solves it
    lo, hi = 0, 7
    done = False
    for _ in range(10):
        guess = (lo + hi) // 2
        obs, r, done, info = env.step(str(guess))
        if done:
            break
        if "higher" in obs:
            lo = guess + 1
        else:
            hi = guess - 1
    assert info.get("solved")

    w = EnvironmentWorker(worker_config=WorkerConfig())
    state = {"n": 0}

    def policy(prompt):
        state["n"] += 1
        return str(state["n"] % 8)

    w.initialize(env_name="guess_number", env_kwargs={"low": 0, "high": 7},
                 generate_fn=policy, max_turns=12)
    trajs = w.run_rollout_loop(3, seed=1)
    assert len(trajs) == 3
    assert all(len(t.actions) >= 1 for t in trajs)


def test_agentic_pipeline_one_step(tmp_path):
    from socioreasoner_tpu.configs.rlvr_config import RLVRConfig
    from socioreasoner_tpu.datasets.processor import SocioProcessor
    from socioreasoner_tpu.pipeline.agentic.agentic_pipeline import AgenticPipeline
    from tests.test_infer_pipeline_e2e import TinyTokenizer

    model_config = Qwen25VLConfig.tiny(512)
    params = qmodel.init_params(model_config, jax.random.key(0), jnp.float32,
                                with_vision=False)
    ref = qmodel.init_params(model_config, jax.random.key(0), jnp.float32,
                             with_vision=False)
    processor = SocioProcessor(TinyTokenizer(),
                               image_token_id=model_config.image_token_id)
    cfg = RLVRConfig(output_dir=str(tmp_path), rollout_batch_size=2,
                     prompt_length=64, response_length=8, max_steps=1,
                     save_steps=-1, entropy_loss_coef=0.01)
    cfg.actor_infer.generating_args.max_new_tokens = 4
    pipe = AgenticPipeline(cfg, model_config=model_config, policy_params=params,
                           reference_params=ref, processor=processor,
                           env_name="guess_number",
                           env_kwargs={"low": 0, "high": 9, "max_turns": 3},
                           engine_kwargs={"max_slots": 2, "max_len": 96,
                                          "decode_chunk": 4,
                                          "prefill_buckets": (64,),
                                          "cache_dtype": jnp.float32})
    metrics = pipe.run(episodes_per_step=2)
    assert "agentic/return_mean" in metrics


def test_critic_value_step():
    from socioreasoner_tpu.distributed.trainer import (
        TrainState, add_value_head, make_optimizer, make_value_step)
    from socioreasoner_tpu.models.qwen2_5_vl import rope as qrope

    config = Qwen25VLConfig.tiny(512)
    params = qmodel.init_params(config, jax.random.key(0), jnp.float32,
                                with_vision=False)
    params = add_value_head(params, jax.random.key(1), config.text.hidden_size)
    opt = make_optimizer(lr=1e-3)
    state = TrainState.create(params, opt)
    step, value_forward = make_value_step(config, opt)
    step = jax.jit(step)

    rng = np.random.default_rng(0)
    B, L = 2, 12
    ids = rng.integers(2, 200, size=(B, L))
    attn = np.ones((B, L), np.int64)
    pos, _ = qrope.get_rope_index(config, ids, None, attn)
    resp = np.zeros((B, L), np.int32)
    resp[:, 6:] = 1
    batch = {
        "input_ids": jnp.asarray(ids), "attention_mask": jnp.asarray(attn),
        "position_ids": jnp.asarray(pos), "response_mask": jnp.asarray(resp),
        "old_values": jnp.zeros((B, L - 1)),
        "returns": jnp.asarray(rng.normal(size=(B, L - 1)).astype(np.float32)),
    }
    losses = []
    for _ in range(3):
        state, m = step(state, batch)
        losses.append(float(m["critic_train/value_loss"]))
    assert losses[-1] < losses[0]   # value regression converges on fixed batch


def test_vocab_parallel_ops(mesh8):
    from socioreasoner_tpu.ops.vocab_parallel import (vocab_parallel_entropy,
                                                      vocab_parallel_log_probs)
    from socioreasoner_tpu.utils.functionals import (entropy_from_logits,
                                                     log_probs_from_logits)
    rng = np.random.default_rng(0)
    B, L, V = 4, 6, 64   # V sharded over tp; B over (dp, fsdp)
    logits = jnp.asarray(rng.normal(size=(B, L, V)).astype(np.float32))
    labels = jnp.asarray(rng.integers(0, V, size=(B, L)))
    want_lp = log_probs_from_logits(logits, labels)
    want_ent = entropy_from_logits(logits)
    sharded = jax.device_put(logits, NamedSharding(mesh8, P(None, None, "tp")))
    got_lp = vocab_parallel_log_probs(sharded, labels, mesh8)
    got_ent = vocab_parallel_entropy(sharded, mesh8)
    np.testing.assert_allclose(np.array(got_lp), np.array(want_lp), atol=2e-5)
    np.testing.assert_allclose(np.array(got_ent), np.array(want_ent), atol=2e-5)
