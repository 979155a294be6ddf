"""GPipe pipeline parallelism vs sequential execution."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from socioreasoner_tpu.parallel.mesh import make_mesh
from socioreasoner_tpu.parallel.pipeline_parallel import pipeline_forward


def layer_fn(p, x):
    return jnp.tanh(x @ p["w"] + p["b"])


def test_pipeline_matches_sequential():
    mesh = make_mesh(dp=1, fsdp=1, tp=1, sp=4)    # sp axis plays pp
    rng = np.random.default_rng(0)
    L, H = 8, 16                                   # 8 layers over 4 stages
    params = {"w": jnp.array(rng.normal(size=(L, H, H)).astype(np.float32) * 0.3),
              "b": jnp.array(rng.normal(size=(L, H)).astype(np.float32) * 0.1)}
    n_micro, mb = 6, 4
    x = jnp.array(rng.normal(size=(n_micro, mb, H)).astype(np.float32))

    # sequential reference
    def seq(x1):
        def body(h, p):
            return layer_fn(p, h), None
        out, _ = jax.lax.scan(body, x1, params)
        return out
    want = jax.vmap(seq)(x)

    got = pipeline_forward(layer_fn, params, x, mesh, axis="sp")
    np.testing.assert_allclose(np.array(got), np.array(want), atol=1e-5, rtol=1e-5)


def test_pipeline_grad_flows():
    mesh = make_mesh(dp=1, fsdp=1, tp=1, sp=2)
    rng = np.random.default_rng(1)
    L, H = 4, 8
    params = {"w": jnp.array(rng.normal(size=(L, H, H)).astype(np.float32) * 0.3),
              "b": jnp.zeros((L, H), jnp.float32)}
    x = jnp.array(rng.normal(size=(2, 3, H)).astype(np.float32))

    def loss(p):
        return jnp.sum(pipeline_forward(layer_fn, p, x, mesh, axis="sp") ** 2)

    g = jax.grad(loss)(params)
    def seq_loss(p):
        def seq(x1):
            def body(h, pp):
                return layer_fn(pp, h), None
            out, _ = jax.lax.scan(body, x1, p)
            return out
        return jnp.sum(jax.vmap(seq)(x) ** 2)
    g_want = jax.grad(seq_loss)(params)
    np.testing.assert_allclose(np.array(g["w"]), np.array(g_want["w"]),
                               atol=1e-4, rtol=1e-4)


def test_interleaved_schedule_is_valid():
    """Every (microbatch, virtual stage) item placed exactly once, dependency
    and one-item-per-device-per-tick constraints hold, bubble < GPipe's."""
    from socioreasoner_tpu.parallel.pipeline_parallel import (
        _interleaved_schedule)
    for (S, vpp, n) in [(2, 2, 4), (4, 2, 8), (2, 3, 6), (3, 2, 3)]:
        ek, em, ev, rk, rm, rv = _interleaved_schedule(S, vpp, n)
        T = ek.shape[0]
        finish = {}
        for t in range(T):
            for s in range(S):
                if not ev[t, s]:
                    continue
                v = int(ek[t, s]) * S + s
                m = int(em[t, s])
                assert (m, v) not in finish, "duplicate item"
                if v > 0:
                    assert finish[(m, v - 1)] < t, "dependency violated"
                finish[(m, v)] = t
        assert len(finish) == n * S * vpp, "missing items"
        # interleaving beats one-chunk GPipe's total tick count for these
        # shapes: GPipe with vpp sequential rounds takes vpp*(n + S - 1)
        assert T < vpp * (n + S - 1) or S == 1


@pytest.mark.parametrize("vpp,n_micro", [(2, 4), (3, 6)])
def test_interleaved_vpp_matches_sequential(vpp, n_micro):
    from socioreasoner_tpu.parallel.pipeline_parallel import (
        pipeline_forward_interleaved)
    S = 2
    mesh = make_mesh(dp=1, fsdp=1, tp=1, sp=S)
    rng = np.random.default_rng(2)
    L, H, mb = S * vpp * 2, 16, 3                # 2 layers per virtual stage
    params = {"w": jnp.array(rng.normal(size=(L, H, H)).astype(np.float32) * 0.3),
              "b": jnp.array(rng.normal(size=(L, H)).astype(np.float32) * 0.1)}
    x = jnp.array(rng.normal(size=(n_micro, mb, H)).astype(np.float32))

    def seq(x1):
        def body(h, p):
            return layer_fn(p, h), None
        out, _ = jax.lax.scan(body, x1, params)
        return out
    want = jax.vmap(seq)(x)
    got = pipeline_forward_interleaved(layer_fn, params, x, mesh, vpp=vpp,
                                       axis="sp")
    np.testing.assert_allclose(np.array(got), np.array(want), atol=1e-5,
                               rtol=1e-5)


def test_interleaved_vpp_grad_flows():
    from socioreasoner_tpu.parallel.pipeline_parallel import (
        pipeline_forward_interleaved)
    mesh = make_mesh(dp=1, fsdp=1, tp=1, sp=2)
    rng = np.random.default_rng(3)
    L, H = 8, 8                                    # vpp=2 → 2 layers per chunk
    params = {"w": jnp.array(rng.normal(size=(L, H, H)).astype(np.float32) * 0.3),
              "b": jnp.zeros((L, H), jnp.float32)}
    x = jnp.array(rng.normal(size=(4, 3, H)).astype(np.float32))

    def loss(p):
        return jnp.sum(pipeline_forward_interleaved(
            layer_fn, p, x, mesh, vpp=2, axis="sp") ** 2)

    def seq_loss(p):
        def seq(x1):
            def body(h, pp):
                return layer_fn(pp, h), None
            out, _ = jax.lax.scan(body, x1, p)
            return out
        return jnp.sum(jax.vmap(seq)(x) ** 2)

    g = jax.grad(loss)(params)
    g_want = jax.grad(seq_loss)(params)
    np.testing.assert_allclose(np.array(g["w"]), np.array(g_want["w"]),
                               atol=1e-4, rtol=1e-4)


def test_pp_train_step_matches_pp1():
    """pipeline_model_parallel_size=2 train + logprob steps through the
    strategy knob == the plain single-program step (VERDICT r2 item 8)."""
    import jax
    import jax.numpy as jnp
    from socioreasoner_tpu.configs.worker_config import (StrategyArguments,
                                                         WorkerConfig)
    from socioreasoner_tpu.distributed.jax_strategies import JaxTrainStrategy
    from socioreasoner_tpu.distributed.trainer import (
        TrainState, make_optimizer, make_train_step)
    from socioreasoner_tpu.models.qwen2_5_vl.config import Qwen25VLConfig
    from socioreasoner_tpu.models.qwen2_5_vl import model as qmodel
    from socioreasoner_tpu.models.qwen2_5_vl import rope as qrope
    from socioreasoner_tpu.parallel.mesh import make_mesh
    from socioreasoner_tpu.pipeline.losses import PPOLossConfig
    from socioreasoner_tpu.protocol import BatchProto

    mesh = make_mesh(dp=2, fsdp=2, pp=2)
    config = Qwen25VLConfig.tiny()
    params = qmodel.init_params(config, jax.random.key(0), with_vision=False)

    B, L = 4, 16
    rng = np.random.default_rng(0)
    ids = rng.integers(2, 200, size=(B, L))
    attn = np.ones((B, L), np.int64)
    attn[0, :2] = 0
    pos, _ = qrope.get_rope_index(config, ids, None, attn)
    resp = np.zeros((B, L), np.int32)
    resp[:, L // 2:] = 1
    tensors = {
        "input_ids": ids, "attention_mask": attn, "position_ids": pos,
        "response_mask": resp,
        "advantages": rng.normal(size=(B, L - 1)).astype(np.float32),
        "old_log_probs": (-np.abs(rng.normal(size=(B, L - 1)))).astype(np.float32),
        "ref_log_probs": (-np.abs(rng.normal(size=(B, L - 1)))).astype(np.float32),
    }

    # reference: plain single-program step
    optimizer = make_optimizer(lr=1e-3)
    state0 = TrainState.create(params, optimizer)
    dense_step = jax.jit(make_train_step(config, PPOLossConfig(), optimizer))
    s_ref, m_ref = dense_step(state0, {k: jnp.asarray(v)
                                       for k, v in tensors.items()})

    wc = WorkerConfig(strategy_args=StrategyArguments(
        strategy_name="jax_train",
        strategy_config={"pipeline_model_parallel_size": 2}))
    wc.training_args.learning_rate = 1e-3
    strat = JaxTrainStrategy(worker_config=wc)
    strat.initialize(config, params, training_args=wc.training_args, mesh=mesh)
    with jax.sharding.set_mesh(mesh):
        m_pp = strat.train_step(BatchProto.from_dict(tensors=dict(tensors)))
        lp_pp = strat.compute_log_probs(BatchProto.from_dict(tensors=dict(tensors)))

    assert np.isclose(float(m_ref["actor_train/total_loss"]),
                      m_pp["actor_train/total_loss"], rtol=1e-5, atol=1e-6)
    diffs = jax.tree.map(lambda a, b: float(jnp.abs(a - b).max()),
                         s_ref.params, strat.state.params)
    assert max(jax.tree.leaves(diffs)) < 5e-5, diffs

    # interleaved VPP through the strategy knob (ref training_args.py:31):
    # needs layers % (pp*vpp) == 0 → a 4-layer tiny model
    import dataclasses as _dc
    config4 = _dc.replace(config, text=_dc.replace(config.text,
                                                   num_hidden_layers=4))
    params4 = qmodel.init_params(config4, jax.random.key(7),
                                 dtype=jnp.float32, with_vision=False)
    state4 = TrainState.create(params4, optimizer)
    dense4 = jax.jit(make_train_step(config4, PPOLossConfig(), optimizer))
    s4_ref, m4_ref = dense4(state4, {k: jnp.asarray(v)
                                     for k, v in tensors.items()})
    wc2 = WorkerConfig(strategy_args=StrategyArguments(
        strategy_name="jax_train",
        strategy_config={"pipeline_model_parallel_size": 2,
                         "virtual_pipeline_model_parallel_size": 2,
                         "pp_micro_batches": 2}))
    wc2.training_args.learning_rate = 1e-3
    strat2 = JaxTrainStrategy(worker_config=wc2)
    strat2.initialize(config4, params4, training_args=wc2.training_args,
                      mesh=mesh)
    with jax.sharding.set_mesh(mesh):
        m_vpp = strat2.train_step(BatchProto.from_dict(tensors=dict(tensors)))
    assert np.isclose(float(m4_ref["actor_train/total_loss"]),
                      m_vpp["actor_train/total_loss"], rtol=1e-5, atol=1e-6)
    diffs2 = jax.tree.map(lambda a, b: float(jnp.abs(a - b).max()),
                          s4_ref.params, strat2.state.params)
    assert max(jax.tree.leaves(diffs2)) < 5e-5, diffs2
