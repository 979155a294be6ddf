"""Flash attention custom VJP vs dense autodiff (interpret mode)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from socioreasoner_tpu.ops.attention import dense_attention
from socioreasoner_tpu.ops.flash_attention_bwd import flash_attention_trainable


@pytest.mark.parametrize("causal,Hkv", [(True, 2), (False, 4), (True, 4)])
def test_flash_vjp_matches_dense(causal, Hkv):
    rng = np.random.default_rng(0)
    B, L, H, D = 2, 128, 4, 64
    q = jnp.array(rng.normal(size=(B, L, H, D)).astype(np.float32))
    k = jnp.array(rng.normal(size=(B, L, Hkv, D)).astype(np.float32))
    v = jnp.array(rng.normal(size=(B, L, Hkv, D)).astype(np.float32))
    lens = jnp.array([L, L // 2], jnp.float32)
    mask = (np.arange(L)[None, :] < np.array(lens)[:, None]).astype(np.int32)
    g = jnp.array(rng.normal(size=(B, L, H, D)).astype(np.float32))

    def f_flash(q, k, v):
        out = flash_attention_trainable(q, k, v, lens, causal, 64, 64, True)
        return jnp.sum(out * g)

    def f_dense(q, k, v):
        out = dense_attention(q, k, v, causal=causal,
                              attention_mask=jnp.asarray(mask))
        return jnp.sum(out * g)

    # padded-row outputs differ (flash yields 0, dense yields garbage rows that
    # get multiplied by g) — compare loss restricted to valid rows by zeroing g
    # on invalid rows
    gm = g * jnp.asarray(mask)[:, :, None, None]

    def f_flash_m(q, k, v):
        out = flash_attention_trainable(q, k, v, lens, causal, 64, 64, True)
        return jnp.sum(out * gm)

    def f_dense_m(q, k, v):
        out = dense_attention(q, k, v, causal=causal,
                              attention_mask=jnp.asarray(mask))
        return jnp.sum(out * gm)

    val_f, grads_f = jax.value_and_grad(f_flash_m, argnums=(0, 1, 2))(q, k, v)
    val_d, grads_d = jax.value_and_grad(f_dense_m, argnums=(0, 1, 2))(q, k, v)
    assert np.isclose(float(val_f), float(val_d), atol=1e-3)
    for gf, gd, name in zip(grads_f, grads_d, "qkv"):
        np.testing.assert_allclose(np.array(gf), np.array(gd), atol=3e-4,
                                   rtol=1e-3, err_msg=f"d{name}")
