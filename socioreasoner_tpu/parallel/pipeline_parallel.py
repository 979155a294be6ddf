"""Pipeline parallelism: GPipe-style microbatch schedule over a mesh axis.

The reference's PP/VPP comes from Megatron's `get_forward_backward_func`
(SURVEY.md §2.9: 1F1B schedule, per-pp-rank weight sync, pp-stage-aware
collect; training_args.py:20,31). TPU-native PP: layers are stacked (L, ...)
and sharded over the `pp` mesh axis, so each stage's shard_map body holds its
contiguous layer chunk; activations stream between stages with
`jax.lax.ppermute` while microbatches fill the pipeline (GPipe schedule:
n_micro + n_stages − 1 ticks). XLA overlaps the permute with the next tick's
compute.

At SocioReasoner's 3B scale PP is optional (the reference runs pp=1); this
provides the working interface for larger models and multi-slice topologies.
Forward-only here; the backward pass composes via jax.grad through ppermute
(GPipe re-materialization = wrap layer_fn in jax.checkpoint).
"""

from __future__ import annotations

import functools
from typing import Any, Callable

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def pipeline_forward(
    layer_fn: Callable[[Any, jnp.ndarray], jnp.ndarray],
    stacked_params: Any,           # (L, ...) pytree, L sharded over `axis`
    x: jnp.ndarray,                # (n_micro, mb, ...) microbatched input
    mesh: Mesh,
    axis: str = "pp",
) -> jnp.ndarray:
    """Run x through all L layers with a GPipe schedule. Returns (n_micro, mb, ...)."""
    from jax.experimental.shard_map import shard_map

    n_micro = x.shape[0]

    def stage_body(local_params, x_local):
        # local_params: (L/pp, ...); x_local: full (n_micro, mb, ...) (replicated)
        stage = jax.lax.axis_index(axis)
        S = mesh.shape[axis]                       # static stage count
        perm = [(i, i + 1) for i in range(S - 1)]  # forward ring (no wraparound)

        def run_chunk(h):
            def body(carry, p):
                return layer_fn(p, carry), None
            out, _ = jax.lax.scan(body, h, local_params)
            return out

        mb_shape = x_local.shape[1:]
        T = n_micro + S - 1

        def tick(t, carry):
            recv, outputs = carry
            mb_idx = t - stage                          # microbatch at this stage
            valid = (mb_idx >= 0) & (mb_idx < n_micro)
            src = jnp.where(stage == 0,
                            x_local[jnp.clip(mb_idx, 0, n_micro - 1)], recv)
            h = run_chunk(src)
            # last stage writes its result
            is_last = stage == S - 1
            write_idx = jnp.clip(mb_idx, 0, n_micro - 1)
            outputs = jax.lax.cond(
                valid & is_last,
                lambda o: o.at[write_idx].set(h),
                lambda o: o, outputs)
            # pass activation to next stage
            recv_next = jax.lax.ppermute(h, axis, perm)
            return recv_next, outputs

        recv0 = jnp.zeros(mb_shape, x_local.dtype)
        outputs0 = jnp.zeros_like(x_local)
        _, outputs = jax.lax.fori_loop(0, T, tick, (recv0, outputs0))
        # replicate the last stage's outputs to every stage (out_specs P())
        mask = (stage == S - 1).astype(outputs.dtype)
        return jax.lax.psum(outputs * mask, axis)

    param_specs = jax.tree.map(
        lambda _: P(axis), stacked_params)
    return shard_map(
        stage_body, mesh=mesh,
        in_specs=(param_specs, P()),
        out_specs=P(), check_rep=False)(stacked_params, x)
