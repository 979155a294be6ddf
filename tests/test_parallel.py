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
