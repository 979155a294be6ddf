"""Weight-only int8 / int4 quantization for the decode path.

Decode at serving batch sizes is weight-HBM-bound (measured ~9.6 ms of a
12.9 ms step at 24 slots is layer-matmul weight reads on v5e). Per-output-
channel symmetric int8 halves that traffic; XLA fuses the int8→bf16 convert
into the dot's operand load, so no bf16 copy is materialized. The TPU
counterpart of vLLM's weight-only w8a16 path (SURVEY §2.10 item 3;
ref third_party vllm quantization role).

int4 (w4a16) quarters the weight traffic: weights are nibble-packed into
uint8 here (2 values/byte; `jnp.int4` storage is avoided — see
quantize_weight_int4). Per-channel scaling is too coarse at 4 bits, so int4
uses GROUP-wise symmetric scales (GPTQ/AWQ convention: one f32 scale per
`INT4_GROUP`-sized slice of the contraction dim per output channel); the
dequant (convert + broadcast-mul) fuses into the dot operand like int8's
convert does.

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


# int4 group size along the contraction dim (GPTQ/AWQ convention). Every
# quantized contraction dim in Qwen2.5 (hidden 2048, mlp 11008) divides it.
INT4_GROUP = 128


@functools.partial(jax.jit, static_argnames=("axis", "group"))
def quantize_weight_int4(w: jnp.ndarray, axis: int = -2,
                         group: int = INT4_GROUP
                         ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Symmetric group-wise int4: w ≈ q * scale, one f32 scale per `group`
    contraction elements per output channel. `axis` must be -2 (the
    contraction dim of every consumer).

    Returns (uint8 q with the contraction dim HALVED — two nibbles per byte,
    element 2i in the low nibble, 2i+1 in the high — and f32 scale with the
    contraction dim reduced to n_groups). The packing is done HERE rather
    than relying on jnp.int4 storage: an S4 array passed as a jit argument
    dies in an infinite device_put relayout recursion on the TPU backend
    (observed on v5e/axon, jax 0.8: "RecursionError: Recursively calling
    jit" from _array_shard_arg), so no S4 array may ever cross a jit
    boundary."""
    if axis != -2:
        raise ValueError("int4 quantization expects contraction axis -2")
    K = w.shape[-2]
    group = min(group, K)                        # tiny test models: K < 128
    if K % group:
        raise ValueError(f"contraction dim {K} not divisible by group {group}")
    if K % 2:
        raise ValueError(f"contraction dim {K} must be even for int4 packing")
    wf = w.astype(jnp.float32)
    wg = wf.reshape(*w.shape[:-2], K // group, group, w.shape[-1])
    amax = jnp.max(jnp.abs(wg), axis=-2, keepdims=True)
    scale = jnp.maximum(amax, 1e-8) / 7.0
    q = jnp.clip(jnp.round(wg / scale), -8, 7).astype(jnp.int32)
    return pack_int4(q.reshape(w.shape)), jnp.squeeze(scale, -2)


def pack_int4(q: jnp.ndarray) -> jnp.ndarray:
    """(..., K, N) int values in [-8, 7] → (..., K//2, N) uint8, element 2i
    in the low nibble and 2i+1 in the high (unpack_int4's inverse)."""
    K, N = q.shape[-2], q.shape[-1]
    qq = q.astype(jnp.int32).reshape(*q.shape[:-2], K // 2, 2, N) & 0xF
    return (qq[..., 0, :] | (qq[..., 1, :] << 4)).astype(jnp.uint8)


def unpack_int4(p: jnp.ndarray) -> jnp.ndarray:
    """(..., K//2, N) uint8 nibble-packed → (..., K, N) int8 in [-8, 7]."""
    lo = (p & jnp.uint8(0x0F)).astype(jnp.int8)
    hi = (p >> 4).astype(jnp.int8)
    lo = (lo ^ jnp.int8(8)) - jnp.int8(8)        # sign-extend the nibble
    hi = (hi ^ jnp.int8(8)) - jnp.int8(8)
    w = jnp.stack([lo, hi], axis=-2)             # (..., K//2, 2, N)
    return w.reshape(*p.shape[:-2], 2 * p.shape[-2], p.shape[-1])


def _matmul_int4(h: jnp.ndarray, q: jnp.ndarray, scale: jnp.ndarray
                 ) -> jnp.ndarray:
    """h @ dequant(unpack(q), scale) with group-wise scales (group inferred
    from the scale shape; q is nibble-packed uint8 with the contraction dim
    halved). Written as one plain dot over a dequantized operand so XLA
    fuses unpack+convert+mul into the MXU operand load (same fusion the int8
    path relies on) instead of a G-batched matmul."""
    K, N = 2 * q.shape[-2], q.shape[-1]
    G = scale.shape[-2]
    wdq = (unpack_int4(q).astype(jnp.float32)
           .reshape(*q.shape[:-2], G, K // G, N)
           * scale[..., :, None, :]
           ).reshape(*q.shape[:-2], K, N).astype(h.dtype)
    return h @ wdq


def quantize_act(h: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Dynamic symmetric per-row (per-token) int8 activation quantization:
    h ≈ q * scale with one f32 scale per row over the last (contraction)
    dim. The w8a8 activation side (SmoothQuant-style dynamic quant, no
    calibration)."""
    hf = h.astype(jnp.float32)
    amax = jnp.max(jnp.abs(hf), axis=-1, keepdims=True)
    scale = jnp.maximum(amax, 1e-8) / 127.0
    q = jnp.clip(jnp.round(hf / scale), -127, 127).astype(jnp.int8)
    return q, scale


def matmul_w8a8(h: jnp.ndarray, w_q: jnp.ndarray, w_scale: jnp.ndarray
                ) -> jnp.ndarray:
    """int8×int8 matmul on the MXU: h (…, K) bf16 × w_q (K, N) int8 →
    (…, N) h.dtype. v5e's int8 MXU peak is 2× bf16 (394 vs 197 TOPS) —
    this is the compute-bound-prefill counterpart of the bandwidth-bound
    decode's w8a16 path. Accumulates in int32 (exact), then applies
    act-row × weight-channel scales in f32."""
    ha, a_scale = quantize_act(h)
    acc = jax.lax.dot_general(
        ha, w_q, (((ha.ndim - 1,), (w_q.ndim - 2,)), ((), ())),
        preferred_element_type=jnp.int32)
    return (acc.astype(jnp.float32) * a_scale * w_scale).astype(h.dtype)


def matmul_q(h: jnp.ndarray, p: Dict, name: str, a8: bool = False) -> jnp.ndarray:
    """h @ p[name], transparently dequantizing int8 (per-output-channel
    scale) or int4 (group-wise scale) weights via p[f"{name}_scale"].

    a8=True (int8 weights only): quantize the activations per row and run
    the dot as int8×int8 → int32 on the MXU (w8a8) instead of dequantizing
    the weights into a bf16 dot (w8a16). Use for COMPUTE-bound passes
    (prefill); decode stays w8a16 (weight-HBM-bound — a8 saves MXU time it
    doesn't need and adds a per-step quantize)."""
    w = p[name]
    if w.dtype == jnp.int8:
        if a8:
            return matmul_w8a8(h, w, p[name + "_scale"])
        y = h @ w.astype(h.dtype)
        return (y * p[name + "_scale"]).astype(h.dtype)
    if w.dtype == jnp.uint8:                     # nibble-packed int4
        return _matmul_int4(h, w, p[name + "_scale"])
    return h @ w


def quantize_decode_params(params: Dict, mode: str = "int8",
                           inplace: bool = False) -> Dict:
    """Return a params pytree with decoder matmul stacks + LM head quantized
    (`mode`: "int8" per-output-channel, "int4" group-wise).

    The LM head: an untied `lm_head` (H, V) is quantized in place; a tied
    model gets a derived `lm_head_q`/`lm_head_scale` from the embedding rows
    (embed itself stays bf16 so the token-embedding gather is exact).

    inplace=True MUTATES the passed dicts, replacing each bf16 stack the
    moment its quantized copy exists — if the caller holds the only reference
    to the tree, each bf16 device buffer is freed by refcount as it is
    replaced, so peak HBM is the bf16 tree + ONE quantized leaf rather than
    both full trees. This is the single-copy deployment path: quantize before
    engine construction and pass the pre-quantized tree (the engine detects
    it via params_prequantized and uses it for BOTH prefill and decode)."""
    if mode not in ("int8", "int4"):
        raise ValueError(f"quantize_decode_params: unknown mode {mode!r}")
    quant = quantize_weight if mode == "int8" else quantize_weight_int4
    out = params if inplace else dict(params)
    layers = params["layers"] if inplace else dict(params["layers"])
    for name in QUANT_KEYS:
        if name in layers:
            q, s = quant(layers[name], axis=-2)
            q.block_until_ready()      # bound transient HBM to one leaf pair
            layers[name] = q
            layers[name + "_scale"] = s
    out["layers"] = layers
    if "lm_head" in params:                      # (H, V): out channel = vocab
        q, s = quant(params["lm_head"], axis=-2)
        out["lm_head"] = q
        out["lm_head_scale"] = s
    elif mode == "int8":                         # tied: head = embed.T
        q, s = quantize_weight(params["embed"], axis=-1)   # per vocab row
        # store PRE-TRANSPOSED (H, V): contracting the minor dim of an int8
        # array (a transposed dot) must not appear in the graph
        out["lm_head_q"] = q.T                   # (H, V) int8
        out["lm_head_scale"] = s                 # (V,)
    else:                                        # tied int4: group along H
        q, s = quantize_weight_int4(params["embed"].T)     # (H, V), (G, V)
        out["lm_head_q"] = q
        out["lm_head_scale"] = s
    return out


# vision-tower matmul weights eligible for int8 (stacked (depth, in, out)
# block weights + the unstacked merger MLP); patch_embed stays bf16 (the
# first projection sets the feature scale — keep it exact)
VISION_QUANT_KEYS = ("qkv_w", "proj_w", "fc1_w", "fc2_w",
                     "gate_w", "up_w", "down_w")
VISION_MERGER_KEYS = ("merger_fc1_w", "merger_fc2_w")


def quantize_vision_params(vision: Dict, inplace: bool = False) -> Dict:
    """int8 per-output-channel quantization of the ViT tower's matmul
    weights (w8a8 ViT: the tower is pure multi-token compute, so the int8
    MXU applies everywhere). Norms, biases, rope tables, patch_embed stay
    bf16. Same single-copy inplace semantics as quantize_decode_params."""
    out = vision if inplace else dict(vision)
    blocks = vision["blocks"] if inplace else dict(vision["blocks"])
    for name in VISION_QUANT_KEYS:
        if name in blocks and blocks[name].dtype != jnp.int8:
            q, s = quantize_weight(blocks[name], axis=-2)
            q.block_until_ready()
            blocks[name] = q
            blocks[name + "_scale"] = s
    out["blocks"] = blocks
    for name in VISION_MERGER_KEYS:
        if name in vision and vision[name].dtype != jnp.int8:
            q, s = quantize_weight(vision[name], axis=-2)
            out[name] = q
            out[name + "_scale"] = s
    return out


def vision_prequantized(vision: Dict) -> bool:
    blocks = vision.get("blocks", {})
    return any(name + "_scale" in blocks for name in VISION_QUANT_KEYS)


def params_prequantized(params: Dict) -> bool:
    """True if `params` already carries quantized decoder stacks (produced by
    quantize_decode_params): the single-copy serving path, where prefill and
    decode share one quantized tree instead of bf16 + quantized copies."""
    layers = params.get("layers", {})
    return any(name + "_scale" in layers for name in QUANT_KEYS)


def head_logits(params: Dict, hidden: jnp.ndarray) -> jnp.ndarray:
    """LM head projection aware of every quantization layout."""
    head = params.get("lm_head")
    if head is not None:
        if head.dtype == jnp.int8:
            return (hidden @ head.astype(hidden.dtype)) * params["lm_head_scale"]
        if head.dtype == jnp.uint8:              # nibble-packed int4
            return _matmul_int4(hidden, head, params["lm_head_scale"])
        return hidden @ head
    head_q = params.get("lm_head_q")
    if head_q is not None:                       # tied + quantized, (H, V)
        if head_q.dtype == jnp.uint8:            # nibble-packed int4
            return _matmul_int4(hidden, head_q, params["lm_head_scale"])
        return (hidden @ head_q.astype(hidden.dtype)) * params["lm_head_scale"]
    return hidden @ params["embed"].T
