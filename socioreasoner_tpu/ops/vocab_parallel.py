"""Vocab-parallel log-probs / entropy over the `tp` mesh axis.

Explicit-collective equivalents of the reference's TP-sharded token ops
(`mcore_adapter/parallel_functions/vocab_parallel.py` vocab_parallel_logprobs,
`roll/third_party/megatron/tensor_parallel.py:6` _VocabParallelEntropy;
consumed via `megatron_strategy.py:216-237`). Under pure GSPMD these are
unnecessary — jnp softmax over a vocab-sharded logits array lowers to the same
collectives — but the explicit shard_map forms avoid materializing the full
(B, L, V) logits on any one device and serve as the op-parity surface.

Each device holds a vocab shard of logits (B, L, V/tp):
  logsumexp: local max → psum-max → local sum(exp) → psum        (1 scalar pair)
  label pick: local one-hot gather masked to the shard's range → psum
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def _local_logprobs(logits, labels, axis_name: str):
    """logits: (B, L, Vloc) local shard; labels: (B, L) global ids."""
    Vloc = logits.shape[-1]
    idx = jax.lax.axis_index(axis_name)
    lo = idx * Vloc
    logits = logits.astype(jnp.float32)

    m_local = logits.max(axis=-1)
    m = jax.lax.pmax(m_local, axis_name)
    sumexp = jnp.sum(jnp.exp(logits - m[..., None]), axis=-1)
    logz = m + jnp.log(jax.lax.psum(sumexp, axis_name))

    local_labels = labels - lo
    in_range = (local_labels >= 0) & (local_labels < Vloc)
    picked_local = jnp.take_along_axis(
        logits, jnp.clip(local_labels, 0, Vloc - 1)[..., None], axis=-1)[..., 0]
    picked = jax.lax.psum(jnp.where(in_range, picked_local, 0.0), axis_name)
    return picked - logz


def _local_entropy(logits, axis_name: str):
    logits = logits.astype(jnp.float32)
    m = jax.lax.pmax(logits.max(axis=-1), axis_name)
    ex = jnp.exp(logits - m[..., None])
    sumexp = jax.lax.psum(jnp.sum(ex, axis=-1), axis_name)
    logz = m + jnp.log(sumexp)
    # H = logz − E[z] ; E[z] = Σ p·z with p = ex / sumexp
    pz = jax.lax.psum(jnp.sum(ex * logits, axis=-1), axis_name) / sumexp
    return logz - pz


def _batch_spec(mesh: Mesh, batch_axes) -> tuple:
    present = tuple(a for a in batch_axes if a in mesh.axis_names)
    return present if present else None


def vocab_parallel_log_probs(logits: jnp.ndarray, labels: jnp.ndarray,
                             mesh: Mesh, vocab_axis: str = "tp",
                             batch_axes=("dp", "fsdp")) -> jnp.ndarray:
    """logits: (B, L, V) global, V sharded over `vocab_axis`, B over
    `batch_axes` → (B, L) logp."""
    from jax.experimental.shard_map import shard_map
    b = _batch_spec(mesh, batch_axes)
    fn = functools.partial(_local_logprobs, axis_name=vocab_axis)
    return shard_map(
        fn, mesh=mesh,
        in_specs=(P(b, None, vocab_axis), P(b, None)),
        out_specs=P(b, None), check_rep=False)(logits, labels)


def vocab_parallel_entropy(logits: jnp.ndarray, mesh: Mesh,
                           vocab_axis: str = "tp",
                           batch_axes=("dp", "fsdp")) -> jnp.ndarray:
    from jax.experimental.shard_map import shard_map
    b = _batch_spec(mesh, batch_axes)
    fn = functools.partial(_local_entropy, axis_name=vocab_axis)
    return shard_map(
        fn, mesh=mesh, in_specs=(P(b, None, vocab_axis),),
        out_specs=P(b, None), check_rep=False)(logits)
