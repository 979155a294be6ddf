"""Paged decode attention vs dense reference (interpret mode)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from socioreasoner_tpu.ops.attention import dense_attention
from socioreasoner_tpu.ops.decode_attention import paged_decode_attention


def test_paged_decode_matches_dense():
    rng = np.random.default_rng(0)
    S, Lmax, H, Hkv, D = 4, 512, 16, 2, 64
    q = jnp.array(rng.normal(size=(S, H, D)).astype(np.float32))
    k = jnp.array(rng.normal(size=(S, Lmax, Hkv, D)).astype(np.float32))
    v = jnp.array(rng.normal(size=(S, Lmax, Hkv, D)).astype(np.float32))
    lengths = jnp.array([100, 256, 1, 512], jnp.int32)

    kv_valid = (np.arange(Lmax)[None, :] < np.array(lengths)[:, None]).astype(np.int32)
    want = dense_attention(q[:, None], k, v, causal=False,
                           attention_mask=jnp.asarray(kv_valid))[:, 0]
    got = paged_decode_attention(q, k, v, lengths, block_k=128, interpret=True)
    np.testing.assert_allclose(np.array(got), np.array(want), atol=2e-5, rtol=1e-4)


def test_paged_decode_zero_length():
    rng = np.random.default_rng(1)
    S, Lmax, H, Hkv, D = 2, 256, 4, 2, 64
    q = jnp.array(rng.normal(size=(S, H, D)).astype(np.float32))
    k = jnp.array(rng.normal(size=(S, Lmax, Hkv, D)).astype(np.float32))
    v = jnp.array(rng.normal(size=(S, Lmax, Hkv, D)).astype(np.float32))
    lengths = jnp.array([0, 64], jnp.int32)
    got = paged_decode_attention(q, k, v, lengths, block_k=64, interpret=True)
    assert np.all(np.array(got)[0] == 0)   # empty slot → zero output
    assert np.isfinite(np.array(got)).all()
