"""Ring attention (CP) + MoE (EP) on the virtual 8-device mesh."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from socioreasoner_tpu.ops.attention import dense_attention
from socioreasoner_tpu.parallel.mesh import make_mesh
from socioreasoner_tpu.parallel.ring_attention import ring_attention_sharded


@pytest.fixture(scope="module")
def sp_mesh():
    return make_mesh(dp=1, fsdp=1, tp=1, sp=8)


@pytest.mark.parametrize("causal", [True, False])
def test_ring_attention_matches_dense(sp_mesh, causal):
    rng = np.random.default_rng(0)
    B, L, H, D = 2, 128, 4, 32
    q = jnp.array(rng.normal(size=(B, L, H, D)).astype(np.float32))
    k = jnp.array(rng.normal(size=(B, L, H, D)).astype(np.float32))
    v = jnp.array(rng.normal(size=(B, L, H, D)).astype(np.float32))
    want = dense_attention(q, k, v, causal=causal)
    spec = NamedSharding(sp_mesh, P(None, "sp", None, None))
    qd, kd, vd = (jax.device_put(x, spec) for x in (q, k, v))
    got = ring_attention_sharded(qd, kd, vd, sp_mesh, causal=causal)
    np.testing.assert_allclose(np.array(got), np.array(want), atol=2e-5, rtol=1e-4)


def test_moe_routing_and_aux_loss():
    from socioreasoner_tpu.ops.moe import init_moe_params, moe_mlp
    rng = jax.random.key(0)
    params = init_moe_params(rng, hidden=32, intermediate=64, n_experts=4)
    x = jax.random.normal(jax.random.key(1), (16, 32))
    out, aux = jax.jit(lambda x, p: moe_mlp(x, p, top_k=2))(x, params)
    assert out.shape == (16, 32)
    assert float(aux) >= 1.0 - 1e-3   # perfectly balanced → E * (1/E) * ... >= 1
    # top-k weighting: output is a convex combination → grows with expert scale
    params2 = jax.tree.map(lambda a: a * 2, params)
    out2, _ = moe_mlp(x, params2, top_k=2)
    assert float(jnp.abs(out2).mean()) > float(jnp.abs(out).mean())


def test_moe_model_sharded_train_step(mesh8):
    """Full Qwen3-MoE-style model: EP-sharded params, forward + grad on mesh."""
    from socioreasoner_tpu.models.qwen2_5_vl.config import (
        Qwen25VLConfig, TextConfig, VisionConfig)
    from socioreasoner_tpu.models.qwen2_5_vl import model as qmodel
    from socioreasoner_tpu.parallel.sharding import shard_params

    config = Qwen25VLConfig(
        vision=VisionConfig(depth=1, hidden_size=16, intermediate_size=32,
                            num_heads=2, out_hidden_size=32),
        text=TextConfig(vocab_size=128, hidden_size=32, intermediate_size=16,
                        num_hidden_layers=2, num_attention_heads=4,
                        num_key_value_heads=2, head_dim=8,
                        mrope_section=(2, 1, 1), tie_word_embeddings=False,
                        use_qk_norm=True, n_experts=4, n_experts_per_tok=2),
        bos_token_id=0, eos_token_id=1, pad_token_id=0)
    params = qmodel.init_params(config, jax.random.key(0), with_vision=False)
    params = shard_params(params, mesh8)
    ids = jnp.asarray(np.random.default_rng(0).integers(2, 100, (4, 8)))
    pos = jnp.broadcast_to(jnp.arange(8)[None, None], (4, 3, 8)).astype(jnp.int64)

    def loss_fn(p):
        logits, aux = qmodel.forward(config, p, ids, pos, None)
        lp = jax.nn.log_softmax(logits[:, :-1].astype(jnp.float32), axis=-1)
        nll = -jnp.take_along_axis(lp, ids[:, 1:, None], axis=-1).mean()
        return nll + 0.01 * aux["moe_aux"]

    with jax.sharding.set_mesh(mesh8):
        loss, grads = jax.jit(jax.value_and_grad(loss_fn))(params)
    assert np.isfinite(float(loss))
    gnorm = jax.tree.reduce(
        lambda a, b: a + float(jnp.sum(jnp.abs(b))), grads, 0.0)
    assert gnorm > 0
    # every expert stack keeps its EP sharding contract
    assert params["layers"]["gate_w"].shape == (2, 4, 32, 16)


def test_moe_sharded_over_tp(mesh8):
    from socioreasoner_tpu.ops.moe import (init_moe_params, moe_mlp,
                                           moe_param_specs)
    params = init_moe_params(jax.random.key(0), 32, 64, n_experts=4)
    specs = moe_param_specs()
    shardings = {k: NamedSharding(mesh8, s) for k, s in specs.items()}
    params = {k: jax.device_put(v, shardings[k]) for k, v in params.items()}
    x = jax.random.normal(jax.random.key(1), (16, 32))
    out, aux = jax.jit(lambda x, p: moe_mlp(x, p, top_k=2))(x, params)
    assert np.isfinite(np.array(out)).all()


# ------------------------------------------------------------------ context parallel

def test_zigzag_matches_reference_ranges():
    """zigzag_indices must reproduce the reference's per-rank 2-chunk ranges
    (mcore_adapter/models/qwen2_5_vl/modeling_qwen2_5_vl.py:464-480)."""
    from socioreasoner_tpu.parallel.context_parallel import (
        inverse_zigzag_indices, zigzag_indices)
    L = 48
    for cp in (2, 3, 4):
        perm = zigzag_indices(L, cp)
        shard = L // cp
        for r in range(cp):
            local = perm[r * shard:(r + 1) * shard]
            # reference formula: [C*r, C*(r+1)) then [L-C*(r+1), L-C*r)
            C = L // cp // 2
            left = np.arange(C * r, C * (r + 1))
            right = np.arange(L - C * (r + 1), L - C * r)
            np.testing.assert_array_equal(local, np.concatenate([left, right]))
        inv = inverse_zigzag_indices(L, cp)
        np.testing.assert_array_equal(perm[inv], np.arange(L))
    with pytest.raises(ValueError):
        zigzag_indices(10, 4)


def test_ring_attention_zigzag_exact(mesh8):
    """Position-aware ring attention in zigzag layout == dense causal
    attention with padding mask (GQA heads included), at valid positions."""
    from socioreasoner_tpu.parallel.context_parallel import zigzag_indices
    from socioreasoner_tpu.parallel.ring_attention import ring_attention_zigzag
    mesh = make_mesh(dp=1, fsdp=2, tp=2, sp=2)
    B, L, H, Hkv, D = 2, 16, 4, 2, 8
    rng = np.random.default_rng(0)
    q = rng.normal(size=(B, L, H, D)).astype(np.float32)
    k = rng.normal(size=(B, L, Hkv, D)).astype(np.float32)
    v = rng.normal(size=(B, L, Hkv, D)).astype(np.float32)
    mask = np.ones((B, L), np.int32)
    mask[0, :3] = 0

    kf = np.repeat(k, H // Hkv, axis=2)
    vf = np.repeat(v, H // Hkv, axis=2)
    logits = np.einsum("bqhd,bkhd->bhqk", q, kf) * D ** -0.5
    keep = ((np.arange(L)[None, :] <= np.arange(L)[:, None])[None, None]
            & (mask[:, None, None, :] != 0))
    logits = np.where(keep, logits, -1e30)
    p = np.exp(logits - logits.max(-1, keepdims=True))
    p = p / p.sum(-1, keepdims=True)
    ref = np.einsum("bhqk,bkhd->bqhd", p, vf)

    perm = zigzag_indices(L, 2)
    pos = np.broadcast_to(perm[None], (B, L)).astype(np.int32)
    with jax.sharding.set_mesh(mesh):
        out = np.asarray(jax.jit(
            lambda *a: ring_attention_zigzag(*a, mesh=mesh, k_chunk=4))(
            jnp.asarray(q[:, perm]), jnp.asarray(k[:, perm]),
            jnp.asarray(v[:, perm]), jnp.asarray(pos),
            jnp.asarray(mask[:, perm])))
    valid = mask[:, perm] == 1        # pad-query outputs are unread garbage
    np.testing.assert_allclose(out[valid], ref[:, perm][valid],
                               rtol=1e-5, atol=1e-5)


def test_cp_train_and_logprob_match_dense(mesh8):
    """context_parallel_size=2 train step == cp-less step: same loss, same
    updated params (bitwise-tolerance); logprob step identical in canonical
    order (VERDICT r2 item 4)."""
    from socioreasoner_tpu.distributed.trainer import (
        TrainState, make_logprob_step, make_optimizer, make_train_step)
    from socioreasoner_tpu.models.qwen2_5_vl.config import Qwen25VLConfig
    from socioreasoner_tpu.models.qwen2_5_vl import model as qmodel
    from socioreasoner_tpu.models.qwen2_5_vl import rope as qrope
    from socioreasoner_tpu.parallel.context_parallel import CPConfig
    from socioreasoner_tpu.parallel.sharding import (batch_shardings,
                                                     param_shardings)
    from socioreasoner_tpu.pipeline.losses import PPOLossConfig

    mesh = make_mesh(dp=1, fsdp=2, tp=2, sp=2)
    cp = CPConfig(mesh=mesh, size=2)
    config = Qwen25VLConfig.tiny()
    params = qmodel.init_params(config, jax.random.key(0), with_vision=False)
    params = jax.device_put(params, param_shardings(params, mesh))
    optimizer = make_optimizer(lr=1e-3)

    B, L = 4, 16
    rng = np.random.default_rng(0)
    ids = rng.integers(2, 200, size=(B, L))
    attn = np.ones((B, L), np.int64)
    attn[0, :2] = 0                     # ragged left padding
    pos, _ = qrope.get_rope_index(config, ids, None, attn)
    resp = np.zeros((B, L), np.int32)
    resp[:, L // 2:] = 1
    batch = {
        "input_ids": ids, "attention_mask": attn, "position_ids": pos,
        "response_mask": resp,
        "advantages": rng.normal(size=(B, L - 1)).astype(np.float32),
        "old_log_probs": (-np.abs(rng.normal(size=(B, L - 1)))).astype(np.float32),
        "ref_log_probs": (-np.abs(rng.normal(size=(B, L - 1)))).astype(np.float32),
    }
    bs = batch_shardings(mesh, batch)
    batch = {k: jax.device_put(np.asarray(v), bs[k]) for k, v in batch.items()}

    with jax.sharding.set_mesh(mesh):
        state0 = TrainState.create(params, optimizer)
        dense_step = jax.jit(make_train_step(config, PPOLossConfig(), optimizer))
        cp_step = jax.jit(make_train_step(config, PPOLossConfig(), optimizer,
                                          cp=cp))
        s_d, m_d = dense_step(state0, batch)
        s_c, m_c = cp_step(state0, batch)

        lp_d = jax.jit(make_logprob_step(config))(params, batch)
        lp_c = jax.jit(make_logprob_step(config, cp=cp))(params, batch)

    assert np.isclose(float(m_d["actor_train/total_loss"]),
                      float(m_c["actor_train/total_loss"]), rtol=1e-5, atol=1e-6)
    diffs = jax.tree.map(lambda a, b: float(jnp.abs(a - b).max()),
                         s_d.params, s_c.params)
    assert max(jax.tree.leaves(diffs)) < 5e-5, diffs
    np.testing.assert_allclose(np.asarray(lp_d["log_probs"]),
                               np.asarray(lp_c["log_probs"]),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(lp_d["entropy"]),
                               np.asarray(lp_c["entropy"]),
                               rtol=1e-5, atol=1e-5)


def test_strategy_honors_context_parallel_knob(mesh8):
    """strategy_args.strategy_config.context_parallel_size wires CP into the
    jitted train/logprob steps (ref training_args.py:35 knob)."""
    from socioreasoner_tpu.configs.worker_config import (StrategyArguments,
                                                         WorkerConfig)
    from socioreasoner_tpu.distributed.jax_strategies import JaxTrainStrategy
    from socioreasoner_tpu.models.qwen2_5_vl.config import Qwen25VLConfig
    from socioreasoner_tpu.models.qwen2_5_vl import model as qmodel
    from socioreasoner_tpu.models.qwen2_5_vl import rope as qrope
    from socioreasoner_tpu.parallel.sharding import shard_params
    from socioreasoner_tpu.protocol import BatchProto

    mesh = make_mesh(dp=1, fsdp=2, tp=2, sp=2)
    config = Qwen25VLConfig.tiny()
    params = shard_params(
        qmodel.init_params(config, jax.random.key(0), with_vision=False), mesh)
    wc = WorkerConfig(strategy_args=StrategyArguments(
        strategy_name="jax_train",
        strategy_config={"context_parallel_size": 2}))
    strat = JaxTrainStrategy(worker_config=wc)
    strat.initialize(config, params, mesh=mesh)

    B, L = 4, 16
    rng = np.random.default_rng(0)
    ids = rng.integers(2, 200, size=(B, L))
    attn = np.ones((B, L), np.int64)
    pos, _ = qrope.get_rope_index(config, ids, None, attn)
    resp = np.zeros((B, L), np.int32)
    resp[:, L // 2:] = 1
    batch = BatchProto.from_dict(tensors={
        "input_ids": ids, "attention_mask": attn, "position_ids": pos,
        "response_mask": resp,
        "advantages": rng.normal(size=(B, L - 1)).astype(np.float32),
        "old_log_probs": (-np.abs(rng.normal(size=(B, L - 1)))).astype(np.float32),
        "ref_log_probs": (-np.abs(rng.normal(size=(B, L - 1)))).astype(np.float32),
    })
    with jax.sharding.set_mesh(mesh):
        metrics = strat.train_step(batch)
        lp = strat.compute_log_probs(batch)
    assert np.isfinite(metrics["actor_train/total_loss"])
    assert lp["log_probs"].shape == (B, L - 1)


def test_strategy_vocab_parallel_logprobs(mesh8):
    """strategy_config.vocab_parallel_logprobs routes token ops through the
    explicit shard_map vocab-parallel path; results match the dense path
    (ref megatron_strategy.py:216-237 role)."""
    from socioreasoner_tpu.configs.worker_config import (StrategyArguments,
                                                         WorkerConfig)
    from socioreasoner_tpu.distributed.jax_strategies import JaxInferStrategy
    from socioreasoner_tpu.models.qwen2_5_vl.config import Qwen25VLConfig
    from socioreasoner_tpu.models.qwen2_5_vl import model as qmodel
    from socioreasoner_tpu.models.qwen2_5_vl import rope as qrope
    from socioreasoner_tpu.parallel.sharding import shard_params
    from socioreasoner_tpu.protocol import BatchProto

    config = Qwen25VLConfig.tiny()
    params = shard_params(
        qmodel.init_params(config, jax.random.key(0), with_vision=False), mesh8)
    B, L = 4, 12
    rng = np.random.default_rng(1)
    ids = rng.integers(2, 200, size=(B, L))
    attn = np.ones((B, L), np.int64)
    pos, _ = qrope.get_rope_index(config, ids, None, attn)
    resp = np.zeros((B, L), np.int32)
    resp[:, L // 2:] = 1
    batch = BatchProto.from_dict(tensors={
        "input_ids": ids, "attention_mask": attn, "position_ids": pos,
        "response_mask": resp})

    def run(strategy_config):
        wc = WorkerConfig(strategy_args=StrategyArguments(
            strategy_name="jax_infer", strategy_config=strategy_config))
        strat = JaxInferStrategy(worker_config=wc)
        strat.initialize(config, params, mesh=mesh8)
        with jax.sharding.set_mesh(mesh8):
            return strat.compute_log_probs(batch)

    dense = run({})
    vp = run({"vocab_parallel_logprobs": True})
    np.testing.assert_allclose(vp["log_probs"], dense["log_probs"],
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(vp["entropy"], dense["entropy"],
                               rtol=1e-5, atol=1e-5)
