"""Qwen2.5-VL text decoder (Qwen2 architecture + M-RoPE) — functional JAX.

Replaces the reference's Megatron GPTModel + TE attention
(`mcore_adapter/models/qwen2_5_vl/modeling_qwen2_5_vl.py:77-122`). Layers run under
`lax.scan` over stacked params; GQA KV heads are broadcast inside the attention op.
Sharding is applied externally via NamedSharding on the stacked param pytree
(parallel/sharding.py) — GSPMD partitions the scan body once.

Supports an optional KV cache for autoregressive decode: pass `cache` (dict with
"k"/"v" of shape (layers, B, Lmax, Hkv, D) and "length" (B,)); new tokens are
written at position `cache_positions` and attention runs over the full cache with
position-based masking.
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from ...ops.attention import dense_attention
from ...ops.norms import rms_norm, swiglu
from .config import TextConfig
from .rope import apply_rotary


def attention_layer(cfg: TextConfig, p: Dict, x: jnp.ndarray,
                    cos: jnp.ndarray, sin: jnp.ndarray,
                    attention_mask: Optional[jnp.ndarray],
                    q_positions: jnp.ndarray,
                    cache_kv: Optional[Tuple[jnp.ndarray, jnp.ndarray]] = None,
                    cache_positions: Optional[jnp.ndarray] = None,
                    kv_valid: Optional[jnp.ndarray] = None,
                    cache_scales: Optional[Tuple[jnp.ndarray, jnp.ndarray]] = None,
                    use_flash: bool = False, cp=None):
    """Self-attention with M-RoPE. x: (B, L, hidden).

    With cp (a parallel.context_parallel.CPConfig): the sequence dim is
    sharded over the mesh's cp axis and attention runs as ring attention over
    ICI with causality decided by the GLOBAL `q_positions` (zigzag layout
    safe). Cache mode (decode) never uses cp.

    Without cache: causal over the input sequence.
    With cache: (k_cache, v_cache) (B, Lmax, Hkv, D); new k/v scattered at
    cache_positions (B, L); attention over cache with kv_valid mask + causal by
    absolute positions. Returns (out, new_k_cache, new_v_cache).

    With cache_scales (k_scale, v_scale) (B, Hkv, Lmax): the cache is int8 —
    new tokens are quantized per-token-per-head on write and dequantized on
    read (in-kernel for the paged path). Prefill attention still uses the raw
    bf16 k/v of the current tokens.
    """
    B, L, _ = x.shape
    H, Hkv, D = cfg.num_attention_heads, cfg.num_key_value_heads, cfg.head_dim
    q = (x @ p["q_w"] + p["q_b"]).reshape(B, L, H, D)
    k = (x @ p["k_w"] + p["k_b"]).reshape(B, L, Hkv, D)
    v = (x @ p["v_w"] + p["v_b"]).reshape(B, L, Hkv, D)
    if cfg.use_qk_norm:    # qwen3: per-head RMS norm before rotary
        q = rms_norm(q, p["q_norm"], cfg.rms_norm_eps)
        k = rms_norm(k, p["k_norm"], cfg.rms_norm_eps)
    q, k = apply_rotary(q, k, cos, sin)

    if cache_kv is None:
        if cp is not None and getattr(cp, "impl", "ring") == "ulysses":
            # head-axis all-to-all: full-sequence attention per head slice,
            # natural sequence order (CPConfig.perm is identity)
            from ...parallel.ulysses import ulysses_attention_sharded
            out = ulysses_attention_sharded(q, k, v, cp.mesh, seq_axis=cp.axis,
                                            attention_mask=attention_mask,
                                            causal=True)
        elif cp is not None:
            from ...parallel.ring_attention import ring_attention_zigzag
            out = ring_attention_zigzag(q, k, v, q_positions, attention_mask,
                                        mesh=cp.mesh, seq_axis=cp.axis,
                                        causal=True)
        elif use_flash:
            # differentiable flash kernel (custom VJP) — serves train + infer
            from ...ops.flash_attention_bwd import flash_attention_trainable
            lens = None if attention_mask is None else \
                attention_mask.sum(axis=-1).astype(jnp.float32)
            out = flash_attention_trainable(q, k, v, lens, True)
        else:
            out = dense_attention(q, k, v, causal=True, attention_mask=attention_mask,
                                  q_positions=q_positions)
        new_cache = (None, None)
    else:
        k_cache, v_cache = cache_kv
        bidx = jnp.arange(B)[:, None]
        if cache_scales is not None:
            from ...ops.decode_attention import dequantize_kv, quantize_kv
            k_scale, v_scale = cache_scales
            kq, ksc = quantize_kv(k)
            vq, vsc = quantize_kv(v)
            k_cache = k_cache.at[bidx, cache_positions].set(kq)
            v_cache = v_cache.at[bidx, cache_positions].set(vq)
            # scales stored (B, Hkv, Lmax): advanced indices around the slice
            # put the (B, L) dims first → value shape (B, L, Hkv)
            k_scale = k_scale.at[bidx, :, cache_positions].set(ksc)
            v_scale = v_scale.at[bidx, :, cache_positions].set(vsc)
        else:
            k_cache = k_cache.at[bidx, cache_positions].set(k.astype(k_cache.dtype))
            v_cache = v_cache.at[bidx, cache_positions].set(v.astype(v_cache.dtype))
        if use_flash and L > 1:
            # prefill into a fresh cache: attention over the local sequence only
            from ...ops.flash_attention import flash_attention
            out = flash_attention(q, k, v, kv_valid[:, :L], causal=True)
        elif use_flash and L == 1 and cfg.head_dim % 128 == 0:
            # decode: paged kernel reads only each slot's valid cache prefix
            # (Mosaic HBM slicing needs the last dim 128-aligned)
            from ...ops.decode_attention import paged_decode_attention
            lengths = jnp.sum(kv_valid, axis=-1).astype(jnp.int32)
            if cache_scales is not None:
                out = paged_decode_attention(q[:, 0], k_cache, v_cache, lengths,
                                             k_scale, v_scale)[:, None]
            else:
                out = paged_decode_attention(q[:, 0], k_cache, v_cache,
                                             lengths)[:, None]
        else:
            Lmax = k_cache.shape[1]
            kv_pos = jnp.broadcast_to(jnp.arange(Lmax)[None, :], (B, Lmax))
            if cache_scales is not None:
                kd = dequantize_kv(k_cache, k_scale, q.dtype)
                vd = dequantize_kv(v_cache, v_scale, q.dtype)
            else:
                kd, vd = k_cache.astype(q.dtype), v_cache.astype(q.dtype)
            out = dense_attention(q, kd, vd,
                                  causal=True, attention_mask=kv_valid,
                                  q_positions=cache_positions, kv_positions=kv_pos)
        if cache_scales is not None:
            new_cache = (k_cache, v_cache, k_scale, v_scale)
        else:
            new_cache = (k_cache, v_cache)
    return out.reshape(B, L, H * D) @ p["o_w"], new_cache


def decoder_layer(cfg: TextConfig, p: Dict, x, cos, sin, attention_mask, q_positions,
                  cache_kv=None, cache_positions=None, kv_valid=None,
                  cache_scales=None, use_flash=False, cp=None):
    attn_keys = ["q_w", "q_b", "k_w", "k_b", "v_w", "v_b", "o_w"]
    if cfg.use_qk_norm:
        attn_keys += ["q_norm", "k_norm"]
    h, new_cache = attention_layer(
        cfg, {k: p[k] for k in attn_keys},
        rms_norm(x, p["input_ln"], cfg.rms_norm_eps),
        cos, sin, attention_mask, q_positions, cache_kv, cache_positions, kv_valid,
        cache_scales=cache_scales, use_flash=use_flash, cp=cp)
    x = x + h
    h2 = rms_norm(x, p["post_ln"], cfg.rms_norm_eps)
    if cfg.n_experts:      # MoE family (qwen2/3_moe, mixtral): routed experts
        from ...ops.moe import moe_mlp
        B, L, Hd = x.shape
        moe_out, aux = moe_mlp(
            h2.reshape(B * L, Hd),
            {k: p[k] for k in ("router_w", "gate_w", "up_w", "down_w")},
            cfg.n_experts_per_tok, cfg.norm_topk_prob)
        moe_out = moe_out.reshape(B, L, Hd).astype(x.dtype)
        if cfg.shared_expert_intermediate:   # qwen2_moe: sigmoid-gated shared MLP
            shared = swiglu(h2, p["s_gate_w"], p["s_up_w"], p["s_down_w"])
            moe_out = moe_out + jax.nn.sigmoid(h2 @ p["sgate_w"]) * shared
        x = x + moe_out
    else:
        x = x + swiglu(h2, p["gate_w"], p["up_w"], p["down_w"])
        aux = jnp.zeros((), jnp.float32)
    return x, new_cache, aux


def _decoder_cached_unrolled(cfg: TextConfig, params: Dict, x, cos, sin,
                             cache: Dict, cache_positions, use_flash: bool,
                             tp=None, act_quant: bool = False):
    """Cache-mode decoder WITHOUT lax.scan over layers.

    scan xs→ys buffers cannot alias, so scanning the stacked KV cache copies
    the whole cache every decode step (~17% of the step at 1.5k Lalloc,
    growing linearly with context). Here layers unroll in python and each
    layer scatters its one-token K/V directly into the stacked (layers, B,
    Lmax, …) buffers — XLA keeps the donated buffers in place — and the paged
    kernel reads the stacked cache at a layer index (no slice copies).
    """
    B, L, _ = x.shape
    H, Hkv, D = cfg.num_attention_heads, cfg.num_key_value_heads, cfg.head_dim
    k_all, v_all = cache["k"], cache["v"]
    quant = "k_scale" in cache
    ks_all, vs_all = cache.get("k_scale"), cache.get("v_scale")
    kv_valid = cache["kv_valid"]
    lengths = jnp.sum(kv_valid, axis=-1).astype(jnp.int32)
    bidx = jnp.arange(B)[:, None]
    Lmax = k_all.shape[2]
    kv_pos = jnp.broadcast_to(jnp.arange(Lmax)[None, :], (B, Lmax))
    if quant:
        from ...ops.decode_attention import dequantize_kv, quantize_kv
    if use_flash and L > 1:
        if tp is not None:
            import functools as _ft
            from ...ops.flash_attention import flash_attention_tp
            flash_attention = _ft.partial(flash_attention_tp, mesh=tp[0],
                                          axis=tp[1])
        else:
            from ...ops.flash_attention import flash_attention
    if use_flash and L == 1 and cfg.head_dim % 128 == 0:
        if tp is not None:
            import functools as _ft
            from ...ops.decode_attention import paged_decode_attention_tp
            paged_decode_attention = _ft.partial(
                paged_decode_attention_tp, mesh=tp[0], axis=tp[1])
        else:
            from ...ops.decode_attention import paged_decode_attention

    from ...ops.quant import matmul_q

    # w8a8 only pays off on the compute-bound multi-token pass (prefill);
    # single-token decode is weight-HBM-bound and stays w8a16
    a8 = bool(act_quant) and L > 1

    for i in range(cfg.num_hidden_layers):
        p = {key: arr[i] for key, arr in params["layers"].items()}
        h = rms_norm(x, p["input_ln"], cfg.rms_norm_eps)
        q = (matmul_q(h, p, "q_w", a8=a8) + p["q_b"]).reshape(B, L, H, D)
        k = (matmul_q(h, p, "k_w", a8=a8) + p["k_b"]).reshape(B, L, Hkv, D)
        v = (matmul_q(h, p, "v_w", a8=a8) + p["v_b"]).reshape(B, L, Hkv, D)
        if cfg.use_qk_norm:
            q = rms_norm(q, p["q_norm"], cfg.rms_norm_eps)
            k = rms_norm(k, p["k_norm"], cfg.rms_norm_eps)
        q, k = apply_rotary(q, k, cos, sin)

        if quant:
            kq, ksc = quantize_kv(k)
            vq, vsc = quantize_kv(v)
            k_all = k_all.at[i, bidx, cache_positions].set(kq)
            v_all = v_all.at[i, bidx, cache_positions].set(vq)
            ks_all = ks_all.at[i, bidx, :, cache_positions].set(ksc)
            vs_all = vs_all.at[i, bidx, :, cache_positions].set(vsc)
        else:
            k_all = k_all.at[i, bidx, cache_positions].set(k.astype(k_all.dtype))
            v_all = v_all.at[i, bidx, cache_positions].set(v.astype(v_all.dtype))

        if use_flash and L > 1:
            # prefill into a fresh cache: attention over the local sequence only
            out = flash_attention(q, k, v, kv_valid[:, :L], causal=True)
        elif use_flash and L == 1 and cfg.head_dim % 128 == 0:
            if quant:
                out = paged_decode_attention(q[:, 0], k_all, v_all, lengths,
                                             ks_all, vs_all, layer=i)[:, None]
            else:
                out = paged_decode_attention(q[:, 0], k_all, v_all, lengths,
                                             layer=i)[:, None]
        else:
            if quant:
                kd = dequantize_kv(k_all[i], ks_all[i], q.dtype)
                vd = dequantize_kv(v_all[i], vs_all[i], q.dtype)
            else:
                kd, vd = k_all[i].astype(q.dtype), v_all[i].astype(q.dtype)
            out = dense_attention(q, kd, vd, causal=True,
                                  attention_mask=kv_valid,
                                  q_positions=cache_positions,
                                  kv_positions=kv_pos)
        x = x + matmul_q(out.reshape(B, L, H * D), p, "o_w", a8=a8)

        h2 = rms_norm(x, p["post_ln"], cfg.rms_norm_eps)
        if cfg.n_experts:
            from ...ops.moe import moe_mlp
            moe_out, _ = moe_mlp(
                h2.reshape(B * L, -1),
                {key: p[key] for key in ("router_w", "gate_w", "up_w", "down_w")},
                cfg.n_experts_per_tok, cfg.norm_topk_prob)
            moe_out = moe_out.reshape(B, L, -1).astype(x.dtype)
            if cfg.shared_expert_intermediate:
                shared = swiglu(h2, p["s_gate_w"], p["s_up_w"], p["s_down_w"])
                moe_out = moe_out + jax.nn.sigmoid(h2 @ p["sgate_w"]) * shared
            x = x + moe_out
        elif p["gate_w"].dtype in (jnp.int8, jnp.uint8):  # weight-only quant
            # (uint8 = nibble-packed int4; S4 arrays never cross jit — quant.py)
            act = (jax.nn.silu(matmul_q(h2, p, "gate_w", a8=a8)
                               .astype(jnp.float32))
                   * matmul_q(h2, p, "up_w", a8=a8).astype(jnp.float32))
            x = x + matmul_q(act.astype(h2.dtype), p, "down_w", a8=a8)
        else:
            x = x + swiglu(h2, p["gate_w"], p["up_w"], p["down_w"])

    new_cache = {"k": k_all, "v": v_all, "kv_valid": kv_valid}
    if quant:
        new_cache["k_scale"] = ks_all
        new_cache["v_scale"] = vs_all
    return x, new_cache


def text_decoder(
    cfg: TextConfig,
    params: Dict,                      # {"layers": stacked pytree, "final_ln": ...}
    inputs_embeds: jnp.ndarray,        # (B, L, hidden)
    cos: jnp.ndarray,                  # (B, L, head_dim)
    sin: jnp.ndarray,
    attention_mask: Optional[jnp.ndarray] = None,  # (B, L)
    q_positions: Optional[jnp.ndarray] = None,     # (B, L) absolute (for causal)
    cache: Optional[Dict] = None,      # {"k","v": (layers,B,Lmax,Hkv,D), "kv_valid": (B,Lmax)}
    cache_positions: Optional[jnp.ndarray] = None,
    remat: bool = False,
    use_flash: bool = False,
    cp=None,
    pp=None,
    tp=None,    # (mesh, axis): head-shard the cache-path pallas kernels
    act_quant: bool = False,   # w8a8 on the cached multi-token pass (prefill)
) -> Tuple[jnp.ndarray, Optional[Dict]]:
    """Returns (B, L, hidden) final hidden states (post final norm) + updated cache."""
    B, L, _ = inputs_embeds.shape
    if q_positions is None:
        q_positions = jnp.broadcast_to(jnp.arange(L)[None, :], (B, L))

    import functools as _ft
    # use_flash bound by closure (static) — jax.checkpoint would trace kwargs
    layer_fn = _ft.partial(decoder_layer, use_flash=use_flash, cp=cp)
    if remat:
        layer_fn = jax.checkpoint(layer_fn, static_argnums=(0,))

    if cache is None:
        if pp is not None:
            # GPipe microbatch schedule over the pp mesh axis (ref Megatron
            # get_forward_backward_func role, megatron_strategy.py:140-148)
            from ...parallel.pipeline_parallel import pipeline_decoder
            assert cp is None, "PP and CP cannot combine (pick one seq plan)"
            x = pipeline_decoder(cfg, params, inputs_embeds, cos, sin,
                                 attention_mask, q_positions, pp, remat=remat)
            new_cache = None
            return rms_norm(x, params["final_ln"], cfg.rms_norm_eps), new_cache
        def body(h, p):
            h, _, aux = layer_fn(cfg, p, h, cos, sin, attention_mask, q_positions)
            return h, aux
        x, aux = jax.lax.scan(body, inputs_embeds, params["layers"])
        # MoE load-balance aux loss summed over layers (ref megatron_strategy
        # :398-407); empty dict for dense models keeps the cache API unchanged
        new_cache = {"moe_aux": jnp.sum(aux)} if cfg.n_experts else None
    else:
        # unrolled (no scan): keeps the stacked KV cache update in place —
        # see _decoder_cached_unrolled
        x, new_cache = _decoder_cached_unrolled(
            cfg, params, inputs_embeds, cos, sin, cache, cache_positions,
            use_flash, tp=tp, act_quant=act_quant)

    return rms_norm(x, params["final_ln"], cfg.rms_norm_eps), new_cache
