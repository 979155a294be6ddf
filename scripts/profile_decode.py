"""Profile the 24-slot decode loop on the real TPU.

Breaks a decode step into parts and times each with its own jitted loop:
  full       — the engine's real chunked decode loop (per-token cost)
  matmuls    — the layer matmuls only (no attention kernel, no cache scatter)
  attn       — the paged attention kernel alone, 36 layers
  scatter    — the per-layer KV cache scatter alone
  lm_head    — final norm + lm_head matmul alone
  sampler    — top-k/top-p sampler alone over (S, V) logits

Prints per-token ms for each part so the gap to the 7.6 ms weight-read bound
(6.2 GB bf16 / 819 GB/s on v5e) is attributable. Run on the real chip:
    python scripts/profile_decode.py
"""

import time

import numpy as np
import jax
import jax.numpy as jnp

from socioreasoner_tpu.models.qwen2_5_vl.config import Qwen25VLConfig
from socioreasoner_tpu.models.qwen2_5_vl import model as qmodel
from socioreasoner_tpu.generation.engine import DecodeEngine, Request
from socioreasoner_tpu.generation.sampling import SamplingParams, sample_tokens

S, PROMPT, NEW, CHUNK = 24, 400, 128, 64


def timed(fn, *args, iters=3, **kw):
    out = fn(*args, **kw)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args, **kw)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters, out


def main():
    config = Qwen25VLConfig()
    t = config.text
    params = qmodel.init_params(config, jax.random.key(0), dtype=jnp.bfloat16,
                                with_vision=False)
    rng = np.random.default_rng(0)

    # ---------------- full engine loop
    engine = DecodeEngine(config, params, max_slots=S, max_len=1536,
                          decode_chunk=CHUNK, prefill_buckets=(512,))
    sp = SamplingParams(temperature=1.0, top_p=0.9, top_k=50, max_new_tokens=NEW)
    reqs = [Request(request_id=i,
                    prompt_ids=rng.integers(10, 100000, size=PROMPT).tolist(),
                    sampling=sp) for i in range(S)]
    engine.generate([Request(request_id="warm", prompt_ids=reqs[0].prompt_ids,
                             sampling=SamplingParams(max_new_tokens=2 * CHUNK + 1))])
    t0 = time.perf_counter()
    outs = engine.generate(reqs)
    dt = time.perf_counter() - t0
    toks = sum(len(o.output_ids) for o in outs)
    step_ms = dt / (toks / S) * 1000
    print(f"full engine: {toks/dt:.0f} tok/s  -> {step_ms:.2f} ms/step "
          f"(roofline ~7.6+kv)")

    caches = engine.caches
    lengths = jnp.asarray(np.full(S, PROMPT + NEW // 2, np.int32))
    kv_valid = (jnp.arange(engine.Lalloc)[None, :] < lengths[:, None]).astype(jnp.int32)
    x = jnp.asarray(rng.normal(size=(S, 1, t.hidden_size)), jnp.bfloat16)

    # ---------------- matmuls only (per full step: 36 layers + lm_head excluded)
    @jax.jit
    def matmuls_only(params, x):
        def body(i, x):
            p = {k: v[i] for k, v in params["layers"].items()}
            h = x @ p["q_w"] @ p["o_w"]
            h = h + (x @ p["k_w"]) @ p["k_w"].T @ p["o_w"]
            h = h + (x @ p["v_w"]) @ p["v_w"].T @ p["o_w"]
            g = x @ p["gate_w"]
            u = x @ p["up_w"]
            return x + ((jax.nn.silu(g) * u) @ p["down_w"]) + h
        return jax.lax.fori_loop(0, t.num_hidden_layers, body, x)

    ms, _ = timed(matmuls_only, params, x, iters=10)
    print(f"layer matmuls only: {ms*1000:.2f} ms/step")

    # ---------------- paged attention kernel alone, 36 layers
    from socioreasoner_tpu.ops.decode_attention import paged_decode_attention
    q1 = jnp.asarray(rng.normal(size=(S, t.num_attention_heads, t.head_dim)),
                     jnp.bfloat16)

    @jax.jit
    def attn_only(q, k_all, v_all, lengths):
        def body(i, acc):
            o = paged_decode_attention(q, k_all, v_all, lengths, layer=i)
            return acc + o.astype(jnp.float32)
        return jax.lax.fori_loop(0, t.num_hidden_layers, body,
                                 jnp.zeros(q.shape, jnp.float32))

    ms, _ = timed(attn_only, q1, caches["k"], caches["v"], lengths, iters=10)
    print(f"paged attn x36: {ms*1000:.2f} ms/step")

    # ---------------- cache scatter alone, 36 layers
    knew = jnp.asarray(rng.normal(size=(S, 1, t.num_key_value_heads, t.head_dim)),
                       jnp.bfloat16)

    @jax.jit
    def scatter_only(k_all, knew, positions):
        bidx = jnp.arange(S)[:, None]
        def body(i, k_all):
            return k_all.at[i, bidx, positions].set(knew)
        return jax.lax.fori_loop(0, t.num_hidden_layers, body, k_all)

    ms, _ = timed(scatter_only, caches["k"], knew, lengths[:, None], iters=10)
    print(f"kv scatter x36 (k only; v doubles it): {ms*1000:.2f} ms/step")

    # ---------------- lm_head + final norm
    @jax.jit
    def head_only(params, x):
        from socioreasoner_tpu.ops.norms import rms_norm
        h = rms_norm(x, params["final_ln"], t.rms_norm_eps)
        head = params.get("lm_head")
        if head is None:
            head = params["embed"].T
        return h @ head

    ms, logits = timed(head_only, params, x, iters=10)
    print(f"final norm + lm_head: {ms*1000:.2f} ms/step")

    # ---------------- sampler alone
    logits2 = logits[:, 0]
    key = jax.random.key(0)
    temps = jnp.full((S,), 1.0)
    top_ps = jnp.full((S,), 0.9)
    top_ks = jnp.full((S,), 50, jnp.int32)

    @jax.jit
    def sampler_only(logits, key):
        return sample_tokens(logits, key, temps, top_ps, top_ks)

    ms, _ = timed(sampler_only, logits2, key, iters=10)
    print(f"sampler (top256 over 152k vocab): {ms*1000:.2f} ms/step")

    # ---------------- embed gather + rope trig
    from socioreasoner_tpu.models.qwen2_5_vl.rope import (make_inv_freq,
                                                          mrope_channel_axis,
                                                          mrope_cos_sin)

    @jax.jit
    def embed_rope(params, tok, next_pos):
        e = params["embed"][tok[:, None]]
        pos = jnp.broadcast_to(next_pos[:, None, None], (S, 3, 1)).astype(jnp.int64)
        inv_freq = jnp.asarray(make_inv_freq(t.head_dim, t.rope_theta))
        chan = mrope_channel_axis(t.head_dim, t.mrope_section)
        cos, sin = mrope_cos_sin(pos, inv_freq, chan)
        return e, cos, sin

    tok = jnp.zeros((S,), jnp.int32)
    ms, _ = timed(embed_rope, params, tok, lengths, iters=10)
    print(f"embed gather + mrope trig: {ms*1000:.2f} ms/step")


if __name__ == "__main__":
    main()
