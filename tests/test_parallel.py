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
