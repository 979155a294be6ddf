"""Pallas flash attention vs the XLA dense reference (interpret mode on CPU)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from socioreasoner_tpu.ops.attention import dense_attention
from socioreasoner_tpu.ops.flash_attention import (flash_attention,
                                                   flash_attention_segmented)


def rand_qkv(rng, B, Lq, Lk, H, Hkv, D):
    q = rng.normal(size=(B, Lq, H, D)).astype(np.float32)
    k = rng.normal(size=(B, Lk, Hkv, D)).astype(np.float32)
    v = rng.normal(size=(B, Lk, Hkv, D)).astype(np.float32)
    return jnp.array(q), jnp.array(k), jnp.array(v)


@pytest.mark.parametrize("Lq,Lk,H,Hkv,D", [
    (256, 256, 4, 2, 64),     # GQA, aligned
    (200, 200, 2, 2, 64),     # unaligned → padding path
])
def test_flash_causal_matches_dense(Lq, Lk, H, Hkv, D):
    rng = np.random.default_rng(0)
    B = 2
    q, k, v = rand_qkv(rng, B, Lq, Lk, H, Hkv, D)
    mask = np.ones((B, Lk), np.int32)
    mask[1, Lk // 2:] = 0   # ragged batch
    want = dense_attention(q, k, v, causal=True, attention_mask=jnp.array(mask))
    got = flash_attention(q, k, v, jnp.array(mask), causal=True,
                          block_q=128, block_k=128, interpret=True)
    np.testing.assert_allclose(np.array(got), np.array(want), atol=2e-5, rtol=1e-4)


def test_flash_noncausal_no_mask():
    rng = np.random.default_rng(1)
    q, k, v = rand_qkv(rng, 1, 128, 128, 2, 2, 64)
    want = dense_attention(q, k, v, causal=False)
    got = flash_attention(q, k, v, None, causal=False, interpret=True)
    np.testing.assert_allclose(np.array(got), np.array(want), atol=2e-5, rtol=1e-4)


def test_flash_segmented_matches_dense():
    rng = np.random.default_rng(2)
    S, H, D = 256, 2, 64
    q = jnp.array(rng.normal(size=(S, H, D)).astype(np.float32))
    k = jnp.array(rng.normal(size=(S, H, D)).astype(np.float32))
    v = jnp.array(rng.normal(size=(S, H, D)).astype(np.float32))
    seg = np.repeat(np.arange(4), 64).astype(np.int32)   # 4 windows of 64
    want = dense_attention(q[None], k[None], v[None],
                           segment_ids_q=jnp.array(seg)[None],
                           segment_ids_kv=jnp.array(seg)[None])[0]
    got = flash_attention_segmented(q, k, v, jnp.array(seg),
                                    block_q=64, block_k=64, interpret=True)
    np.testing.assert_allclose(np.array(got), np.array(want), atol=2e-5, rtol=1e-4)


def test_flash_segmented_ragged_windows():
    rng = np.random.default_rng(3)
    S, H, D = 200, 2, 64
    q = jnp.array(rng.normal(size=(S, H, D)).astype(np.float32))
    k = jnp.array(rng.normal(size=(S, H, D)).astype(np.float32))
    v = jnp.array(rng.normal(size=(S, H, D)).astype(np.float32))
    seg = np.concatenate([np.zeros(50), np.ones(70), np.full(80, 2)]).astype(np.int32)
    want = dense_attention(q[None], k[None], v[None],
                           segment_ids_q=jnp.array(seg)[None],
                           segment_ids_kv=jnp.array(seg)[None])[0]
    got = flash_attention_segmented(q, k, v, jnp.array(seg),
                                    block_q=64, block_k=64, interpret=True)
    np.testing.assert_allclose(np.array(got), np.array(want), atol=2e-5, rtol=1e-4)


def test_flash_segmented_block_sparse_bounds():
    """max_span_blocks (block-sparse k-bounds via scalar prefetch) must match
    the dense-fallback path exactly on nondecreasing contiguous segments —
    including ragged edge windows and a q block straddling segment borders."""
    from socioreasoner_tpu.ops.flash_attention import seg_max_span_blocks
    rng = np.random.default_rng(4)
    sizes = [64, 48, 64, 200, 30, 64, 150, 64]
    seg = np.concatenate([np.full(s, i) for i, s in enumerate(sizes)]).astype(np.int32)
    S, H, D = len(seg), 2, 64
    q = jnp.array(rng.normal(size=(S, H, D)).astype(np.float32))
    k = jnp.array(rng.normal(size=(S, H, D)).astype(np.float32))
    v = jnp.array(rng.normal(size=(S, H, D)).astype(np.float32))
    want = dense_attention(q[None], k[None], v[None],
                           segment_ids_q=jnp.array(seg)[None],
                           segment_ids_kv=jnp.array(seg)[None])[0]
    maxk = seg_max_span_blocks(seg, block_q=64, block_k=64)
    got = flash_attention_segmented(q, k, v, jnp.array(seg), block_q=64,
                                    block_k=64, max_span_blocks=maxk,
                                    interpret=True)
    np.testing.assert_allclose(np.array(got), np.array(want), atol=2e-5, rtol=1e-4)
    # an over-wide span bound must also stay correct (clamped index map)
    got2 = flash_attention_segmented(q, k, v, jnp.array(seg), block_q=64,
                                     block_k=64, max_span_blocks=maxk + 3,
                                     interpret=True)
    np.testing.assert_allclose(np.array(got2), np.array(want), atol=2e-5, rtol=1e-4)
