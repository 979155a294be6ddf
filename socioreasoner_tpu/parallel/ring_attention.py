"""Ring attention — context parallelism over the `sp` mesh axis.

The reference plumbs Megatron CP end-to-end but leaves it off (SURVEY.md §5:
zigzag splits in `get_batch_on_this_cp_rank`, TE ring/P2P attention; cp=1 in
both yamls). TPU-native CP *is* ring attention over ICI: the sequence is
sharded over `sp`; each step every device computes partial attention of its
local queries against the resident K/V block, accumulates with an online
softmax, then rotates K/V around the ring with `jax.lax.ppermute`. XLA overlaps
the permute with the local compute.

Exposed as a shard_map-able function; `ring_attention_sharded` wraps it over a
mesh for (B, L, H, D) global arrays with L sharded on `sp`.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

NEG_INF = -1e30


def _block_attend(q, k, v, scale, q_offset, k_offset, causal):
    """Partial attention of local q vs one K/V block; returns (scores-stats)."""
    B, Lq, H, D = q.shape
    Lk = k.shape[1]
    logits = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                        preferred_element_type=jnp.float32) * scale
    if causal:
        q_pos = q_offset + jnp.arange(Lq)
        k_pos = k_offset + jnp.arange(Lk)
        mask = k_pos[None, :] <= q_pos[:, None]
        logits = jnp.where(mask[None, None], logits, NEG_INF)
    m = logits.max(axis=-1)                                    # (B, H, Lq)
    p = jnp.exp(logits - m[..., None])
    l = p.sum(axis=-1)
    o = jnp.einsum("bhqk,bkhd->bqhd", p.astype(v.dtype), v)
    return m, l, o


def ring_attention_local(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                         axis_name: str, causal: bool = True) -> jnp.ndarray:
    """Body for shard_map: local shards (B, Lloc, H, D); seq sharded on axis_name."""
    B, Lq, H, D = q.shape
    scale = D ** -0.5
    n = jax.lax.psum(1, axis_name)
    my_idx = jax.lax.axis_index(axis_name)
    perm = [(i, (i + 1) % n) for i in range(n)]

    q_offset = my_idx * Lq

    def step(carry, i):
        k_blk, v_blk, m_run, l_run, o_run = carry
        src_idx = (my_idx - i) % n          # which shard's K/V we hold this step
        k_offset = src_idx * Lq
        m_blk, l_blk, o_blk = _block_attend(q, k_blk, v_blk, scale,
                                            q_offset, k_offset, causal)
        m_new = jnp.maximum(m_run, m_blk)
        c_run = jnp.exp(m_run - m_new)
        c_blk = jnp.exp(m_blk - m_new)
        l_new = l_run * c_run + l_blk * c_blk
        # o accumulators are (B, Lq, H, D); correction factors are (B, H, Lq)
        o_new = (o_run * c_run.transpose(0, 2, 1)[..., None].astype(o_run.dtype)
                 + o_blk * c_blk.transpose(0, 2, 1)[..., None].astype(o_blk.dtype))
        k_next = jax.lax.ppermute(k_blk, axis_name, perm)
        v_next = jax.lax.ppermute(v_blk, axis_name, perm)
        return (k_next, v_next, m_new, l_new, o_new), None

    m0 = jnp.full((B, H, Lq), NEG_INF, jnp.float32)
    l0 = jnp.zeros((B, H, Lq), jnp.float32)
    o0 = jnp.zeros((B, Lq, H, D), jnp.float32)
    (k_f, v_f, m, l, o), _ = jax.lax.scan(
        step, (k, v, m0, l0, o0), jnp.arange(n))
    l = jnp.where(l == 0, 1.0, l)
    out = o / l.transpose(0, 2, 1)[..., None]
    return out.astype(q.dtype)


def ring_attention_sharded(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                           mesh: Mesh, seq_axis: str = "sp",
                           causal: bool = True) -> jnp.ndarray:
    """(B, L, H, D) global arrays, L sharded over `seq_axis`."""
    from jax.experimental.shard_map import shard_map
    spec = P(None, seq_axis, None, None)
    fn = functools.partial(ring_attention_local, axis_name=seq_axis, causal=causal)
    return shard_map(fn, mesh=mesh, in_specs=(spec, spec, spec),
                     out_specs=spec, check_rep=False)(q, k, v)


# --------------------------------------------------------------------- zigzag
# Position-aware variant: causality is decided by GLOBAL token positions that
# travel around the ring with K/V, so any sequence permutation — in particular
# the reference's zigzag 2-chunk layout (modeling_qwen2_5_vl.py:452-480),
# which balances causal work across ranks — is handled exactly. The local
# block attend is BLOCKWISE over K sub-chunks (flash pattern in XLA): logits
# materialize only (B, H, Lq, k_chunk) at a time, so the CP plane scales to
# the long-context lengths it exists for.

def _pick_chunk(Lk: int, k_chunk: int) -> int:
    kc = min(k_chunk, Lk)
    while Lk % kc:
        kc -= 1
    return kc


def ring_attention_pos_local(q, k, v, q_pos, kv_pos, kv_mask, *,
                             axis_name: str, causal: bool = True,
                             k_chunk: int = 512) -> jnp.ndarray:
    """shard_map body. Local shards:
      q, k, v   (B, Lloc, H, D)   — same head count (GQA pre-broadcast)
      q_pos     (B, Lloc) int     — global positions of local queries
      kv_pos    (B, Lloc) int     — global positions of local keys
      kv_mask   (B, Lloc) 1=valid — padding mask, rotates with K/V
    """
    B, Lq, H, D = q.shape
    scale = D ** -0.5
    n = jax.lax.psum(1, axis_name)
    perm = [(i, (i + 1) % n) for i in range(n)]
    qf = q.astype(jnp.float32) * scale

    kc = _pick_chunk(k.shape[1], k_chunk)
    nc = k.shape[1] // kc

    def attend_chunk(carry, blk):
        m_run, l_run, o_run = carry
        k_c, v_c, pos_c, mask_c = blk        # (B, kc, H, D) / (B, kc)
        logits = jnp.einsum("bqhd,bkhd->bhqk", qf, k_c.astype(jnp.float32))
        keep = mask_c[:, None, None, :] != 0
        if causal:
            keep &= (pos_c[:, None, None, :] <= q_pos[:, None, :, None])
        logits = jnp.where(keep, logits, NEG_INF)
        m_blk = logits.max(axis=-1)                       # (B, H, Lq)
        m_new = jnp.maximum(m_run, m_blk)
        # fully-masked block: keep exp at 0, not exp(NEG_INF-NEG_INF)=1
        p = jnp.where(logits > NEG_INF / 2,
                      jnp.exp(logits - m_new[..., None]), 0.0)
        c_run = jnp.exp(m_run - m_new)
        l_new = l_run * c_run + p.sum(axis=-1)
        o_blk = jnp.einsum("bhqk,bkhd->bqhd", p, v_c.astype(jnp.float32))
        o_new = o_run * c_run.transpose(0, 2, 1)[..., None] + o_blk
        return (m_new, l_new, o_new), None

    def step(carry, _):
        k_blk, v_blk, pos_blk, mask_blk, m_run, l_run, o_run = carry
        chunks = (k_blk.reshape(B, nc, kc, H, D).swapaxes(0, 1),
                  v_blk.reshape(B, nc, kc, H, D).swapaxes(0, 1),
                  pos_blk.reshape(B, nc, kc).swapaxes(0, 1),
                  mask_blk.reshape(B, nc, kc).swapaxes(0, 1))
        (m_run, l_run, o_run), _ = jax.lax.scan(
            attend_chunk, (m_run, l_run, o_run), chunks)
        k_next = jax.lax.ppermute(k_blk, axis_name, perm)
        v_next = jax.lax.ppermute(v_blk, axis_name, perm)
        pos_next = jax.lax.ppermute(pos_blk, axis_name, perm)
        mask_next = jax.lax.ppermute(mask_blk, axis_name, perm)
        return (k_next, v_next, pos_next, mask_next, m_run, l_run, o_run), None

    m0 = jnp.full((B, H, Lq), NEG_INF, jnp.float32)
    l0 = jnp.zeros((B, H, Lq), jnp.float32)
    o0 = jnp.zeros((B, Lq, H, D), jnp.float32)
    (kf, vf, pf, mf, m, l, o), _ = jax.lax.scan(
        step, (k, v, kv_pos, kv_mask, m0, l0, o0), None, length=n)
    l = jnp.where(l == 0, 1.0, l)
    out = o / l.transpose(0, 2, 1)[..., None]
    return out.astype(q.dtype)


def ring_attention_zigzag(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                          positions: jnp.ndarray,
                          attention_mask: Optional[jnp.ndarray],
                          mesh: Mesh, seq_axis: str = "sp",
                          causal: bool = True, k_chunk: int = 512
                          ) -> jnp.ndarray:
    """Global (B, L, H, D) arrays in an arbitrary (e.g. zigzag) sequence
    layout, L sharded over `seq_axis`; `positions` (B, L) carries the global
    position of every token for exact causal masking. GQA K/V are broadcast
    to the query head count here."""
    from jax.experimental.shard_map import shard_map
    B, L, H, D = q.shape
    if k.shape[2] != H:                       # GQA: repeat KV heads
        rep = H // k.shape[2]
        k = jnp.repeat(k, rep, axis=2)
        v = jnp.repeat(v, rep, axis=2)
    if attention_mask is None:
        attention_mask = jnp.ones((B, L), jnp.int32)
    positions = jnp.broadcast_to(positions, (B, L)).astype(jnp.int32)
    s4 = P(None, seq_axis, None, None)
    s2 = P(None, seq_axis)
    fn = functools.partial(ring_attention_pos_local, axis_name=seq_axis,
                           causal=causal, k_chunk=k_chunk)
    return shard_map(
        fn, mesh=mesh,
        in_specs=(s4, s4, s4, s2, s2, s2), out_specs=s4,
        check_rep=False,
    )(q, k, v, positions, positions, attention_mask.astype(jnp.int32))
