"""Ulysses sequence parallelism (head-axis all-to-all over sp) — exact parity
vs dense attention, forward and gradients, incl. GQA and padding masks."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from socioreasoner_tpu.ops.attention import dense_attention
from socioreasoner_tpu.parallel.mesh import make_mesh
from socioreasoner_tpu.parallel.ulysses import ulysses_attention_sharded


def _mesh_sp4():
    return make_mesh(dp=1, fsdp=1, tp=1, sp=4)


@pytest.mark.parametrize("Hkv", [8, 4, 2])
def test_ulysses_matches_dense(Hkv):
    B, L, H, D = 2, 64, 8, 16
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.standard_normal((B, L, H, D)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((B, L, Hkv, D)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((B, L, Hkv, D)), jnp.float32)
    mask = np.ones((B, L), np.int32)
    mask[0, 50:] = 0
    mask = jnp.asarray(mask)
    mesh = _mesh_sp4()
    ref = dense_attention(q, k, v, causal=True, attention_mask=mask)
    out = ulysses_attention_sharded(q, k, v, mesh, attention_mask=mask,
                                    causal=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_ulysses_grads_match_dense():
    B, L, H, D = 1, 32, 4, 8
    rng = np.random.default_rng(1)
    q = jnp.asarray(rng.standard_normal((B, L, H, D)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((B, L, H, D)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((B, L, H, D)), jnp.float32)
    mesh = _mesh_sp4()

    def loss_ref(q, k, v):
        return dense_attention(q, k, v, causal=True).astype(jnp.float32).sum()

    def loss_uly(q, k, v):
        return ulysses_attention_sharded(q, k, v, mesh,
                                         causal=True).astype(jnp.float32).sum()

    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    g_uly = jax.grad(loss_uly, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g_uly, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-5, atol=2e-5)


def test_strategy_honors_ulysses_impl_knob():
    """strategy_config.context_parallel_impl: ulysses routes CP attention
    through the head-axis all-to-all; logprobs match the dense single-device
    path exactly (CP layout stays natural order)."""
    from socioreasoner_tpu.configs.worker_config import (StrategyArguments,
                                                         WorkerConfig)
    from socioreasoner_tpu.distributed.jax_strategies import JaxInferStrategy
    from socioreasoner_tpu.distributed.strategy import ParamStore
    from socioreasoner_tpu.models.qwen2_5_vl.config import Qwen25VLConfig
    from socioreasoner_tpu.models.qwen2_5_vl import model as qmodel
    from socioreasoner_tpu.models.qwen2_5_vl import rope as qrope
    from socioreasoner_tpu.protocol import BatchProto

    config = Qwen25VLConfig.tiny()
    params = qmodel.init_params(config, jax.random.key(0), with_vision=False)
    B, L = 4, 16
    rng = np.random.default_rng(0)
    ids = rng.integers(2, 200, size=(B, L))
    attn = np.ones((B, L), np.int64)
    pos, _ = qrope.get_rope_index(config, ids, None, attn)
    resp = np.zeros((B, L), np.int32)
    resp[:, L // 2:] = 1
    batch = BatchProto.from_dict(tensors={
        "input_ids": ids, "attention_mask": attn, "position_ids": pos,
        "response_mask": resp})

    plain = JaxInferStrategy(param_store=ParamStore())
    plain.initialize(config, params)
    ref = plain.compute_log_probs(batch)["log_probs"]

    mesh = make_mesh(dp=1, fsdp=2, tp=1, sp=4)
    wc = WorkerConfig(strategy_args=StrategyArguments(
        strategy_name="jax_infer",
        strategy_config={"context_parallel_size": 4,
                         "context_parallel_impl": "ulysses"}))
    strat = JaxInferStrategy(worker_config=wc, param_store=ParamStore())
    strat.initialize(config, params, mesh=mesh)
    with jax.sharding.set_mesh(mesh):
        lp = strat.compute_log_probs(batch)["log_probs"]
    np.testing.assert_allclose(lp, ref, rtol=1e-4, atol=1e-4)


def test_ulysses_rejects_indivisible_heads():
    B, L, H, D = 1, 32, 6, 8
    q = jnp.zeros((B, L, H, D))
    mesh = _mesh_sp4()
    with pytest.raises(Exception, match="not divisible|divisible"):
        ulysses_attention_sharded(q, q, q, mesh, causal=True)
