"""Ulysses sequence parallelism — head-axis all-to-all over the `sp` mesh axis.

The DeepSpeed-Ulysses alternative to ring attention (SURVEY.md §2.9 "Ulysses /
DeepSpeed-SP: absent — optional"): instead of rotating K/V blocks around the
ring, ONE all-to-all swaps the sharded dimension from sequence to heads, every
device runs FULL-sequence attention over its head slice, and a second
all-to-all swaps back. Communication is 2 all-to-alls of the activations
(O(L·H·D/n) per device) regardless of sequence length — cheaper than a ring
when heads ≥ devices and the sequence is long; the ring wins when the head
count can't cover the mesh or K/V rotation overlaps better with compute.

Exact vs dense attention (no online-softmax accumulation at all — each device
sees the full sequence), so it composes with any masking the dense op supports.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..ops.attention import dense_attention


def ulysses_attention_local(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                            axis_name: str,
                            attention_mask: Optional[jnp.ndarray] = None,
                            causal: bool = True) -> jnp.ndarray:
    """shard_map body: local shards (B, L/n, H, D) with seq sharded on
    `axis_name`; attention_mask is the local (B, L/n) slice (all-gathered
    internally — masks are cheap)."""
    n = jax.lax.psum(1, axis_name)
    B, Lloc, H, D = q.shape
    Hkv = k.shape[2]
    if H % n:
        raise ValueError(f"ulysses: {H} heads not divisible by sp={n}")
    if Hkv % n:
        # GQA with fewer KV heads than the mesh: broadcast K/V up to H first
        # (costs memory, keeps the all-to-all layout uniform)
        rep = H // Hkv
        k = jnp.repeat(k, rep, axis=2)
        v = jnp.repeat(v, rep, axis=2)
    # (B, L/n, H, D) → (B, L, H/n, D): split heads, concat sequence
    a2a = functools.partial(jax.lax.all_to_all, axis_name=axis_name,
                            split_axis=2, concat_axis=1, tiled=True)
    qf, kf, vf = a2a(q), a2a(k), a2a(v)
    mask = None
    if attention_mask is not None:
        mask = jax.lax.all_gather(attention_mask, axis_name, axis=1,
                                  tiled=True)                  # (B, L)
    out = dense_attention(qf, kf, vf, causal=causal, attention_mask=mask)
    # (B, L, H/n, D) → (B, L/n, H, D)
    return jax.lax.all_to_all(out, axis_name, split_axis=1, concat_axis=2,
                              tiled=True)


def ulysses_attention_sharded(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                              mesh: Mesh, seq_axis: str = "sp",
                              attention_mask: Optional[jnp.ndarray] = None,
                              causal: bool = True) -> jnp.ndarray:
    """Global (B, L, H, D) arrays with L sharded over `seq_axis`."""
    from jax.experimental.shard_map import shard_map

    spec = P(None, seq_axis, None, None)
    mask_in = attention_mask is not None
    in_specs = [spec, spec, spec] + ([P(None, seq_axis)] if mask_in else [])

    def local(q, k, v, *rest):
        return ulysses_attention_local(
            q, k, v, seq_axis,
            attention_mask=rest[0] if rest else None, causal=causal)

    args = (q, k, v) + ((attention_mask,) if mask_in else ())
    return shard_map(local, mesh=mesh, in_specs=tuple(in_specs),
                     out_specs=spec, check_rep=False)(*args)
