"""Attention ops — XLA reference implementations.

These are the numerically-exact baselines; `ops/flash_attention.py` provides the
Pallas TPU kernels with the same signatures (selected via `use_pallas`). Replaces
the reference's flash-attn / TE DotProductAttention dependency (SURVEY.md §2.10).

Layout convention: (B, L, H, D) — batch, seq, heads, head_dim. GQA via explicit
kv-head broadcast (XLA fuses the broadcast into the matmul).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

NEG_INF = -1e30


def repeat_kv(x: jnp.ndarray, n_rep: int) -> jnp.ndarray:
    """(B, L, Hkv, D) → (B, L, Hkv*n_rep, D)."""
    if n_rep == 1:
        return x
    B, L, H, D = x.shape
    return jnp.broadcast_to(x[:, :, :, None, :], (B, L, H, n_rep, D)).reshape(B, L, H * n_rep, D)


def dense_attention(
    q: jnp.ndarray,                      # (B, Lq, H, D)
    k: jnp.ndarray,                      # (B, Lk, Hkv, D)
    v: jnp.ndarray,                      # (B, Lk, Hkv, D)
    *,
    causal: bool = False,
    attention_mask: Optional[jnp.ndarray] = None,   # (B, Lk) 1=valid
    segment_ids_q: Optional[jnp.ndarray] = None,    # (B, Lq) attend iff equal
    segment_ids_kv: Optional[jnp.ndarray] = None,   # (B, Lk)
    q_positions: Optional[jnp.ndarray] = None,      # (B, Lq) absolute positions for causal w/ cache
    kv_positions: Optional[jnp.ndarray] = None,     # (B, Lk)
    scale: Optional[float] = None,
) -> jnp.ndarray:
    """Masked softmax attention in float32 accumulation."""
    B, Lq, H, D = q.shape
    Hkv = k.shape[2]
    if Hkv != H:
        k = repeat_kv(k, H // Hkv)
        v = repeat_kv(v, H // Hkv)
    scale = scale if scale is not None else D ** -0.5

    logits = jnp.einsum("bqhd,bkhd->bhqk", q, k, preferred_element_type=jnp.float32) * scale

    mask = jnp.ones((B, 1, Lq, k.shape[1]), dtype=bool)
    if causal:
        if q_positions is None:
            q_positions = jnp.broadcast_to(jnp.arange(Lq)[None, :], (B, Lq))
        if kv_positions is None:
            kv_positions = jnp.broadcast_to(jnp.arange(k.shape[1])[None, :], (B, k.shape[1]))
        mask = mask & (kv_positions[:, None, None, :] <= q_positions[:, None, :, None])
    if attention_mask is not None:
        mask = mask & (attention_mask[:, None, None, :] > 0)
    if segment_ids_q is not None:
        mask = mask & (segment_ids_q[:, None, :, None] == segment_ids_kv[:, None, None, :])

    logits = jnp.where(mask, logits, NEG_INF)
    probs = jax.nn.softmax(logits, axis=-1).astype(q.dtype)
    return jnp.einsum("bhqk,bkhd->bqhd", probs, v)
