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
