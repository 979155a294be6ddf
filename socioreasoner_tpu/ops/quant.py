"""Weight-only int8 quantization for the decode path.

Decode at serving batch sizes is weight-HBM-bound (measured ~9.6 ms of a
12.9 ms step at 24 slots is layer-matmul weight reads on v5e). Per-output-
channel symmetric int8 halves that traffic; XLA fuses the int8→bf16 convert
into the dot's operand load, so no bf16 copy is materialized. The TPU
counterpart of vLLM's weight-only w8a16 path (SURVEY §2.10 item 3;
ref third_party vllm quantization role).

Applies to the stacked decoder matmul weights and the LM head; embeddings,
norms, biases and the router stay bf16 (their reads are negligible and
embedding-gather precision is kept exact).
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp

# stacked decoder matmul weights eligible for weight-only int8: (L, in, out)
# or (L, E, in, out) for MoE expert stacks — contraction dim is always -2
QUANT_KEYS = ("q_w", "k_w", "v_w", "o_w", "gate_w", "up_w", "down_w",
              "s_gate_w", "s_up_w", "s_down_w")


import functools


@functools.partial(jax.jit, static_argnames=("axis",))
def quantize_weight(w: jnp.ndarray, axis: int = -2) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Symmetric per-output-channel int8: w ≈ q * scale (scale broadcast over
    `axis`, the contraction dim). Returns (int8 q, f32 scale with `axis`
    removed). Jitted PER TENSOR — one fused graph over a whole 3B pytree
    takes the remote XLA compiler >10 min in this environment."""
    wf = w.astype(jnp.float32)
    amax = jnp.max(jnp.abs(wf), axis=axis, keepdims=True)
    scale = jnp.maximum(amax, 1e-8) / 127.0
    q = jnp.clip(jnp.round(wf / scale), -127, 127).astype(jnp.int8)
    return q, jnp.squeeze(scale, axis=axis)


def matmul_q(h: jnp.ndarray, p: Dict, name: str) -> jnp.ndarray:
    """h @ p[name], transparently dequantizing int8 weights with their
    per-output-channel scale (p[f"{name}_scale"])."""
    w = p[name]
    if w.dtype == jnp.int8:
        y = h @ w.astype(h.dtype)
        return (y * p[name + "_scale"]).astype(h.dtype)
    return h @ w


def quantize_decode_params(params: Dict) -> Dict:
    """Return a params pytree with decoder matmul stacks + LM head in int8.

    The LM head: an untied `lm_head` (H, V) is quantized in place; a tied
    model gets a derived `lm_head_q`/`lm_head_scale` from the embedding rows
    (embed itself stays bf16 so the token-embedding gather is exact)."""
    out = dict(params)
    layers = dict(params["layers"])
    for name in QUANT_KEYS:
        if name in layers:
            q, s = quantize_weight(layers[name], axis=-2)
            layers[name] = q
            layers[name + "_scale"] = s
    out["layers"] = layers
    if "lm_head" in params:                      # (H, V): out channel = vocab
        q, s = quantize_weight(params["lm_head"], axis=-2)
        out["lm_head"] = q
        out["lm_head_scale"] = s
    else:                                        # tied: head = embed.T
        q, s = quantize_weight(params["embed"], axis=-1)   # per vocab row
        # store PRE-TRANSPOSED (H, V): contracting the minor dim of an int8
        # array (a transposed dot) must not appear in the graph
        out["lm_head_q"] = q.T                   # (H, V) int8
        out["lm_head_scale"] = s                 # (V,)
    return out


def head_logits(params: Dict, hidden: jnp.ndarray) -> jnp.ndarray:
    """LM head projection aware of every quantization layout."""
    head = params.get("lm_head")
    if head is not None:
        if head.dtype == jnp.int8:
            return (hidden @ head.astype(hidden.dtype)) * params["lm_head_scale"]
        return hidden @ head
    head_q = params.get("lm_head_q")
    if head_q is not None:                       # tied + quantized, (H, V)
        return (hidden @ head_q.astype(hidden.dtype)) * params["lm_head_scale"]
    return hidden @ params["embed"].T
