"""Minimal timing sanity check on the axon TPU: per-call wall times for a
36-layer decode-shape matmul loop (bf16), N inside jit, printed per call."""

import time
import jax
import jax.numpy as jnp

S, L, HID, INT, Hq, Hkv, D = 24, 36, 2048, 11008, 16, 2, 128
N = 8

keys = iter(jax.random.split(jax.random.key(0), 16))
def dn(shape, scale=0.02):
    return jax.random.normal(next(keys), shape, jnp.bfloat16) * scale

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
jax.block_until_ready(layers)


def one_layer(p, x):
    q = x @ p["q_w"]
    k = x @ p["k_w"]
    v = x @ p["v_w"]
    o = q @ p["o_w"]
    x = x + o + jnp.pad(k + v, ((0, 0), (0, HID - Hkv * D)))
    g = x @ p["gate_w"]
    u = x @ p["up_w"]
    return x + (jax.nn.silu(g) * u) @ p["down_w"]


@jax.jit
def matmuls(layers, x):
    def step(i, x):
        def body(xc, p):
            return one_layer(p, xc), None
        xo, _ = jax.lax.scan(body, x, layers)
        return xo * 0.001 + x * 0.5
    return jax.lax.fori_loop(0, N, step, x)


for it in range(4):
    t0 = time.perf_counter()
    out = matmuls(layers, x)
    jax.block_until_ready(out)
    v = float(out.reshape(-1)[0])
    print(f"call {it}: {(time.perf_counter()-t0)*1000:.1f} ms total, "
          f"{(time.perf_counter()-t0)/N*1000:.2f} ms/step, v={v:.4f}",
          flush=True)

# N=1 variant to separate per-call overhead
@jax.jit
def matmuls1(layers, x):
    def body(xc, p):
        return one_layer(p, xc), None
    xo, _ = jax.lax.scan(body, x, layers)
    return xo

for it in range(4):
    t0 = time.perf_counter()
    out = matmuls1(layers, x)
    jax.block_until_ready(out)
    v = float(out.reshape(-1)[0])
    print(f"single-step call {it}: {(time.perf_counter()-t0)*1000:.2f} ms, v={v:.4f}",
          flush=True)
