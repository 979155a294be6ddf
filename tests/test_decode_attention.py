"""Paged decode attention vs dense reference (interpret mode)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from socioreasoner_tpu.ops.attention import dense_attention
from socioreasoner_tpu.ops.decode_attention import (
    dequantize_kv, paged_decode_attention, quantize_kv)


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


def test_paged_decode_grouped_and_padded():
    """Odd slot count + small slot_group: padding and per-slot masks inside a
    group (group runs to its max length) stay exact."""
    rng = np.random.default_rng(5)
    S, Lmax, H, Hkv, D = 5, 256, 8, 2, 64
    q = jnp.array(rng.normal(size=(S, H, D)).astype(np.float32))
    k = jnp.array(rng.normal(size=(S, Lmax, Hkv, D)).astype(np.float32))
    v = jnp.array(rng.normal(size=(S, Lmax, Hkv, D)).astype(np.float32))
    lengths = jnp.array([3, 256, 0, 97, 64], jnp.int32)
    kv_valid = (np.arange(Lmax)[None, :] < np.array(lengths)[:, None]).astype(np.int32)
    want = np.array(dense_attention(q[:, None], k, v, causal=False,
                                    attention_mask=jnp.asarray(kv_valid))[:, 0])
    want[2] = 0.0   # empty slot → zeros
    got = paged_decode_attention(q, k, v, lengths, block_k=64, slot_group=2,
                                 interpret=True)
    np.testing.assert_allclose(np.array(got), want, atol=2e-5, rtol=1e-4)


def test_paged_decode_int8_matches_dequantized_dense():
    rng = np.random.default_rng(2)
    S, Lmax, H, Hkv, D = 4, 512, 16, 2, 64
    q = jnp.array(rng.normal(size=(S, H, D)).astype(np.float32))
    k = jnp.array(rng.normal(size=(S, Lmax, Hkv, D)).astype(np.float32))
    v = jnp.array(rng.normal(size=(S, Lmax, Hkv, D)).astype(np.float32))
    lengths = jnp.array([100, 256, 1, 512], jnp.int32)

    kq, ks = quantize_kv(k)      # ks (S, Lmax, Hkv)
    vq, vs = quantize_kv(v)
    ks_t = jnp.swapaxes(ks, 1, 2)   # stored layout (S, Hkv, Lmax)
    vs_t = jnp.swapaxes(vs, 1, 2)

    kd = dequantize_kv(kq, ks_t)
    vd = dequantize_kv(vq, vs_t)
    np.testing.assert_allclose(np.array(kd), np.array(k), atol=0.04)

    kv_valid = (np.arange(Lmax)[None, :] < np.array(lengths)[:, None]).astype(np.int32)
    want = dense_attention(q[:, None], kd, vd, causal=False,
                           attention_mask=jnp.asarray(kv_valid))[:, 0]
    got = paged_decode_attention(q, kq, vq, lengths, ks_t, vs_t,
                                 block_k=128, interpret=True)
    np.testing.assert_allclose(np.array(got), np.array(want), atol=2e-5, rtol=1e-4)


def test_int8_cache_decode_step_close_to_fp():
    """Full model decode step with int8 cache ≈ fp cache (CPU dense fallback)."""
    from socioreasoner_tpu.models.qwen2_5_vl.config import Qwen25VLConfig
    from socioreasoner_tpu.models.qwen2_5_vl import model as qmodel

    config = Qwen25VLConfig.tiny()
    t = config.text
    params = qmodel.init_params(config, jax.random.key(3), with_vision=False)
    rng = np.random.default_rng(3)
    B, P, Lmax = 2, 12, 32
    ids = jnp.asarray(rng.integers(2, 200, size=(B, P)))
    pos = jnp.broadcast_to(jnp.arange(P)[None, None], (B, 3, P)).astype(jnp.int64)
    cpos = jnp.broadcast_to(jnp.arange(P)[None], (B, P))
    kv_valid = (jnp.arange(Lmax)[None] < P).astype(jnp.int32) * jnp.ones((B, 1), jnp.int32)
    Lyr, Hkv, D = t.num_hidden_layers, t.num_key_value_heads, t.head_dim

    def run(quant):
        cache = {"k": jnp.zeros((Lyr, B, Lmax, Hkv, D),
                                jnp.int8 if quant else jnp.float32),
                 "v": jnp.zeros((Lyr, B, Lmax, Hkv, D),
                                jnp.int8 if quant else jnp.float32),
                 "kv_valid": kv_valid}
        if quant:
            cache["k_scale"] = jnp.zeros((Lyr, B, Hkv, Lmax), jnp.float32)
            cache["v_scale"] = jnp.zeros((Lyr, B, Hkv, Lmax), jnp.float32)
        logits, cache = qmodel.forward(config, params, ids, pos, None,
                                       cache=cache, cache_positions=cpos)
        # one decode step
        tok = jnp.argmax(logits[:, P - 1], axis=-1)[:, None]
        dpos = jnp.full((B, 3, 1), P, jnp.int64)
        cache["kv_valid"] = (jnp.arange(Lmax)[None] < P + 1).astype(jnp.int32) \
            * jnp.ones((B, 1), jnp.int32)
        step_logits, _ = qmodel.forward(config, params, tok, dpos, None,
                                        cache=cache,
                                        cache_positions=jnp.full((B, 1), P))
        return np.array(logits[:, P - 1]), np.array(step_logits[:, 0])

    fp_prefill, fp_step = run(False)
    q_prefill, q_step = run(True)
    # int8 KV error is ~1/127 per element; logits stay close
    assert np.max(np.abs(q_prefill - fp_prefill)) < 0.15 * np.std(fp_prefill) + 0.05
    assert np.max(np.abs(q_step - fp_step)) < 0.15 * np.std(fp_step) + 0.05


def test_engine_int8_kv_smoke():
    from socioreasoner_tpu.models.qwen2_5_vl.config import Qwen25VLConfig
    from socioreasoner_tpu.models.qwen2_5_vl import model as qmodel
    from socioreasoner_tpu.generation.engine import DecodeEngine, Request
    from socioreasoner_tpu.generation.sampling import SamplingParams

    config = Qwen25VLConfig.tiny()
    params = qmodel.init_params(config, jax.random.key(7), with_vision=False)
    engine = DecodeEngine(config, params, max_slots=2, max_len=64, decode_chunk=4,
                          prefill_buckets=(16,), kv_quant="int8")
    rng = np.random.default_rng(0)
    prompts = [rng.integers(2, 200, size=n).tolist() for n in (5, 9)]
    sp = SamplingParams(temperature=0.0, do_sample=False, max_new_tokens=6)
    outs = engine.generate([Request(request_id=i, prompt_ids=p, sampling=sp)
                            for i, p in enumerate(prompts)])
    assert len(outs) == 2
    for o in outs:
        assert len(o.output_ids) >= 1
        assert all(0 <= t < config.text.vocab_size for t in o.output_ids)


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
