"""Collective helpers over mesh axes.

Plays `roll/utils/collective/collective.py:13-92` (GroupManager + named NCCL
groups over ray.util.collective): on TPU named process groups don't exist —
collectives are mesh-axis ops inside jit. These helpers give the same verbs
for host-level code (allreduce/broadcast/barrier over a mesh axis via one-off
shard_map programs) plus multihost host-data exchange via
`jax.experimental.multihost_utils`.
"""

from __future__ import annotations

import functools
from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def allreduce(x, mesh: Mesh, axis: str, op: str = "sum"):
    """All-reduce a replicated array over one mesh axis."""
    from jax.experimental.shard_map import shard_map

    def body(v):
        if op == "sum":
            return jax.lax.psum(v, axis)
        if op == "max":
            return jax.lax.pmax(v, axis)
        if op == "min":
            return jax.lax.pmin(v, axis)
        if op == "mean":
            return jax.lax.pmean(v, axis)
        raise ValueError(op)

    spec = P(*([None] * jnp.asarray(x).ndim))
    return shard_map(body, mesh=mesh, in_specs=(spec,), out_specs=spec,
                     check_rep=False)(jnp.asarray(x))


def broadcast(x, mesh: Mesh, axis: str, src: int = 0):
    """Broadcast device `src`'s copy along one mesh axis (others discarded)."""
    from jax.experimental.shard_map import shard_map

    def body(v):
        idx = jax.lax.axis_index(axis)
        n = jax.lax.psum(1, axis)
        masked = jnp.where(idx == src, v, jnp.zeros_like(v))
        return jax.lax.psum(masked, axis)

    spec = P(*([None] * jnp.asarray(x).ndim))
    return shard_map(body, mesh=mesh, in_specs=(spec,), out_specs=spec,
                     check_rep=False)(jnp.asarray(x))


def barrier(name: str = "barrier"):
    """Cross-host sync point (multi-process runs)."""
    if jax.process_count() > 1:
        from jax.experimental import multihost_utils
        multihost_utils.sync_global_devices(name)


def broadcast_host_data(data: Any, src: int = 0) -> Any:
    """Host-side object broadcast across processes (ref broadcast_object_list
    role in get_data_input, megatron_strategy.py:98-125).

    Arbitrary picklable objects: non-src processes need not know the structure
    (two-phase length-then-bytes broadcast, like torch broadcast_object_list)."""
    if jax.process_count() <= 1:
        return data
    import pickle
    from jax.experimental import multihost_utils
    is_src = jax.process_index() == src
    buf = pickle.dumps(data) if is_src else b""
    n = int(multihost_utils.broadcast_one_to_all(np.int64(len(buf)),
                                                 is_source=is_src))
    arr = np.frombuffer(buf, np.uint8) if is_src else np.zeros(n, np.uint8)
    out = multihost_utils.broadcast_one_to_all(arr, is_source=is_src)
    return data if is_src else pickle.loads(out.tobytes())
