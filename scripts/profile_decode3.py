"""Trustworthy decode-component timings: every variant runs N dependent
iterations INSIDE one jit (async dispatch + the axon relay make per-call
block_until_ready timing unreliable — see memory/single-cpu-core.md).

Components at the engine's 24-slot decode shapes (3B dims, Lalloc=1536):
  qkvo+mlp matmuls ×36 (bf16 / int8 weights)
  paged attention kernel ×36
  kv cache scatter ×36 (k+v)
  lm_head (bf16 / int8)
  sampler top_k vs approx_max_k
  embed gather + mrope
"""

import time
import numpy as np
import jax
import jax.numpy as jnp

S, L = 24, 36
HID, INT, Hq, Hkv, D = 2048, 11008, 16, 2, 128
V, LALLOC = 151936, 1536
N = 32


def timed_injit(make_fn, *args, n=N):
    fn = jax.jit(make_fn)
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    out = fn(*args)
    jax.block_until_ready(out)
    # force a host readback of a scalar to defeat any lazy sync
    _ = float(jax.tree.leaves(out)[0].reshape(-1)[0])
    dt = time.perf_counter() - t0
    return dt / n * 1000


def main():
    rng = np.random.default_rng(0)
    keys = iter(jax.random.split(jax.random.key(0), 16))
    def dn(shape, scale=0.02):          # on-device init (host has 1 core)
        return (jax.random.normal(next(keys), shape, jnp.bfloat16) * scale)
    x = dn((S, HID), 1.0)

    layers = {
        "q_w": dn((L, HID, Hq * D)),
        "k_w": dn((L, HID, Hkv * D)),
        "v_w": dn((L, HID, Hkv * D)),
        "o_w": dn((L, Hq * D, HID)),
        "gate_w": dn((L, HID, INT)),
        "up_w": dn((L, HID, INT)),
        "down_w": dn((L, INT, HID)),
    }

    def one_layer(p, x):
        q = x @ p["q_w"]
        k = x @ p["k_w"]
        v = x @ p["v_w"]
        o = q @ p["o_w"]
        x = x + o + jnp.pad(k + v, ((0, 0), (0, HID - Hkv * D)))
        g = x @ p["gate_w"]
        u = x @ p["up_w"]
        return x + (jax.nn.silu(g) * u) @ p["down_w"]

    def matmuls(layers, x):
        def step(i, x):
            def body(xc, p):
                return one_layer(p, xc), None
            xo, _ = jax.lax.scan(body, x, layers)
            return xo * 0.001 + x * 0.5
        return jax.lax.fori_loop(0, N, step, x)

    print(f"layer matmuls bf16 x{L}: {timed_injit(matmuls, layers, x):.2f} ms/step",
          flush=True)

    # int8 weight-only: same shapes, int8 leaves + per-out-channel f32 scales
    layers_q = {}
    for k_, w in layers.items():
        amax = jnp.max(jnp.abs(w.astype(jnp.float32)), axis=1, keepdims=True)
        s = jnp.maximum(amax, 1e-8) / 127.0           # (L, 1, out)
        layers_q[k_] = (jnp.clip(jnp.round(w.astype(jnp.float32) / s),
                                 -127, 127).astype(jnp.int8),
                        s[:, 0].astype(jnp.float32))  # (L, out)

    def qdot(x, wq, s):
        y = jax.lax.dot_general(x, wq.astype(jnp.bfloat16),
                                (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
        return (y * s[None, :]).astype(jnp.bfloat16)

    def one_layer_q(p, x):
        q = qdot(x, *p["q_w"])
        k = qdot(x, *p["k_w"])
        v = qdot(x, *p["v_w"])
        o = qdot(q, *p["o_w"])
        x = x + o + jnp.pad(k + v, ((0, 0), (0, HID - Hkv * D)))
        g = qdot(x, *p["gate_w"])
        u = qdot(x, *p["up_w"])
        return x + qdot(jax.nn.silu(g) * u, *p["down_w"])

    def matmuls_q(layers_q, x):
        def step(i, x):
            def body(xc, p):
                return one_layer_q(p, xc), None
            xo, _ = jax.lax.scan(body, x, layers_q)
            return xo * 0.001 + x * 0.5
        return jax.lax.fori_loop(0, N, step, x)

    print(f"layer matmuls int8 x{L}: {timed_injit(matmuls_q, layers_q, x):.2f} ms/step",
          flush=True)

    # paged attention x36
    from socioreasoner_tpu.ops.decode_attention import paged_decode_attention
    k_all = dn((L, S, LALLOC, Hkv, D), 1.0)
    v_all = dn((L, S, LALLOC, Hkv, D), 1.0)
    lengths = jnp.asarray(np.full(S, 520, np.int32))
    q1 = dn((S, Hq, D), 1.0)

    def attn(q, k_all, v_all, lengths):
        def step(i, q):
            def body(j, acc):
                o = paged_decode_attention(q, k_all, v_all, lengths, layer=j)
                return acc + o * 0.001
            return jax.lax.fori_loop(0, L, body, q * 0.5)
        return jax.lax.fori_loop(0, N, step, q)

    print(f"paged attn x{L}: {timed_injit(attn, q1, k_all, v_all, lengths):.2f} ms/step",
          flush=True)

    # kv scatter x36, k and v
    knew = dn((S, 1, Hkv, D), 1.0)

    def scatter(k_all, v_all, knew, positions):
        bidx = jnp.arange(S)[:, None]
        def step(i, carry):
            k_all, v_all = carry
            def body(j, c):
                ka, va = c
                ka = ka.at[j, bidx, positions].set(knew)
                va = va.at[j, bidx, positions].set(knew)
                return ka, va
            return jax.lax.fori_loop(0, L, body, (k_all, v_all))
        return jax.lax.fori_loop(0, N, step, (k_all, v_all))

    print(f"kv scatter x{L} (k+v): {timed_injit(scatter, k_all, v_all, knew, lengths[:, None]):.2f} ms/step",
          flush=True)

    # lm_head bf16 / int8 + samplers
    head = dn((HID, V))

    def lm_head(head, x):
        def step(i, c):
            x, acc = c
            logits = jax.lax.dot_general(x, head, (((1,), (0,)), ((), ())),
                                         preferred_element_type=jnp.float32)
            return x, acc + logits[:, :8] * 0.001
        return jax.lax.fori_loop(0, N, step, (x, jnp.zeros((S, 8), jnp.float32)))

    print(f"lm_head bf16: {timed_injit(lm_head, head, x):.2f} ms/step", flush=True)

    amax = jnp.max(jnp.abs(head.astype(jnp.float32)), axis=0)
    hs = jnp.maximum(amax, 1e-8) / 127.0
    head_q = jnp.clip(jnp.round(head.astype(jnp.float32) / hs[None, :]),
                      -127, 127).astype(jnp.int8)

    def lm_head_q(head_q, hs, x):
        def step(i, c):
            x, acc = c
            y = jax.lax.dot_general(x, head_q.astype(jnp.bfloat16),
                                    (((1,), (0,)), ((), ())),
                                    preferred_element_type=jnp.float32)
            return x, acc + (y[:, :8] * hs[None, :8]) * 0.001
        return jax.lax.fori_loop(0, N, step, (x, jnp.zeros((S, 8), jnp.float32)))

    print(f"lm_head int8: {timed_injit(lm_head_q, head_q, hs, x):.2f} ms/step",
          flush=True)

    logits = jax.random.normal(next(keys), (S, V), jnp.float32) * 3

    def topk(logits):
        def step(i, acc):
            vals, idx = jax.lax.top_k(logits + acc[:, None], 256)
            return acc + vals[:, 0] * 1e-6
        return jax.lax.fori_loop(0, N, step, jnp.zeros((S,), jnp.float32))

    print(f"top_k(256): {timed_injit(topk, logits):.2f} ms/step", flush=True)

    def approxk(logits):
        def step(i, acc):
            vals, idx = jax.lax.approx_max_k(logits + acc[:, None], 256,
                                             recall_target=0.95)
            return acc + vals[:, 0] * 1e-6
        return jax.lax.fori_loop(0, N, step, jnp.zeros((S,), jnp.float32))

    print(f"approx_max_k(256): {timed_injit(approxk, logits):.2f} ms/step",
          flush=True)

    # embed gather
    embed = dn((V, HID))
    tok = jnp.asarray(rng.integers(0, V, S), jnp.int32)

    def gather(embed, tok):
        def step(i, c):
            tok, acc = c
            e = embed[tok]
            tok = (tok + 1) % V
            return tok, acc + e[:, :8] * 0.001
        return jax.lax.fori_loop(0, N, step,
                                 (tok, jnp.zeros((S, 8), jnp.bfloat16)))

    print(f"embed gather: {timed_injit(gather, embed, tok):.2f} ms/step",
          flush=True)


if __name__ == "__main__":
    main()
