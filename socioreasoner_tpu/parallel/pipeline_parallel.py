"""Pipeline parallelism: GPipe-style microbatch schedule over a mesh axis.

The reference's PP/VPP comes from Megatron's `get_forward_backward_func`
(SURVEY.md §2.9: 1F1B schedule, per-pp-rank weight sync, pp-stage-aware
collect; training_args.py:20,31; megatron_strategy.py:140-148). TPU-native PP:
layers are stacked (L, ...) and sharded over the `pp` mesh axis, so each
stage's shard_map body holds its contiguous layer chunk; activations stream
between stages with `jax.lax.ppermute` while microbatches fill the pipeline
(GPipe schedule: n_micro + n_stages − 1 ticks). XLA overlaps the permute with
the next tick's compute. The backward pass composes via jax.grad through
ppermute (GPipe re-materialization = wrap layer_fn in jax.checkpoint).

At SocioReasoner's 3B scale PP is optional (the reference runs pp=1); the
trainer honors `pipeline_model_parallel_size` from strategy_args for larger
models and multi-slice topologies (distributed/trainer.py).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


@dataclasses.dataclass(frozen=True)
class PPConfig:
    """Pipeline-parallel plan threaded through the train/logprob steps."""
    mesh: Mesh
    size: int
    axis: str = "pp"
    n_micro: int = 0          # 0 → one microbatch per stage

    def __post_init__(self):
        ax = dict(zip(self.mesh.axis_names, self.mesh.devices.shape))
        if ax.get(self.axis, 1) != self.size:
            raise ValueError(
                f"pipeline_model_parallel_size={self.size} but mesh axis "
                f"{self.axis!r} has size {ax.get(self.axis, 1)}")

    @property
    def micro(self) -> int:
        return self.n_micro or self.size


def make_pp_config(mesh: Optional[Mesh], pipeline_model_parallel_size: int,
                   n_micro: int = 0, axis: str = "pp") -> Optional[PPConfig]:
    if pipeline_model_parallel_size <= 1:
        return None
    if mesh is None:
        raise ValueError("pipeline_model_parallel_size > 1 requires an "
                         "explicit mesh with a 'pp' axis")
    return PPConfig(mesh=mesh, size=pipeline_model_parallel_size,
                    axis=axis, n_micro=n_micro)


def pipeline_forward(
    layer_fn: Callable[[Any, Any], Any],
    stacked_params: Any,           # (L, ...) pytree, L sharded over `axis`
    x: Any,                        # pytree of (n_micro, mb, ...) microbatched
    mesh: Mesh,
    axis: str = "pp",
) -> Any:
    """Run x through all L layers with a GPipe schedule.

    `x` may be a single array or a PYTREE of (n_micro, mb, ...) arrays (e.g.
    hidden states plus per-microbatch rotary tables/masks that every layer
    needs); `layer_fn(per_layer_params, carry) -> carry` must preserve the
    structure. Returns the same structure, (n_micro, mb, ...).
    """
    from jax.experimental.shard_map import shard_map

    n_micro = jax.tree.leaves(x)[0].shape[0]

    def stage_body(local_params, x_local):
        # local_params: (L/pp, ...); x_local: full pytree (replicated)
        stage = jax.lax.axis_index(axis)
        S = mesh.shape[axis]                       # static stage count
        perm = [(i, i + 1) for i in range(S - 1)]  # forward chain (no wrap)

        def run_chunk(h):
            def body(carry, p):
                return layer_fn(p, carry), None
            out, _ = jax.lax.scan(body, h, local_params)
            return out

        T = n_micro + S - 1

        def tick(t, carry):
            recv, outputs = carry
            mb_idx = t - stage                     # microbatch at this stage
            valid = (mb_idx >= 0) & (mb_idx < n_micro)
            idx = jnp.clip(mb_idx, 0, n_micro - 1)
            src = jax.tree.map(
                lambda xl, r: jnp.where(stage == 0, xl[idx], r), x_local, recv)
            h = run_chunk(src)
            # last stage writes its result
            write = valid & (stage == S - 1)
            outputs = jax.lax.cond(
                write,
                lambda o: jax.tree.map(lambda oo, hh: oo.at[idx].set(hh), o, h),
                lambda o: o, outputs)
            # pass activation to next stage
            recv_next = jax.tree.map(
                lambda a: jax.lax.ppermute(a, axis, perm), h)
            return recv_next, outputs

        recv0 = jax.tree.map(lambda xl: jnp.zeros(xl.shape[1:], xl.dtype),
                             x_local)
        outputs0 = jax.tree.map(jnp.zeros_like, x_local)
        _, outputs = jax.lax.fori_loop(0, T, tick, (recv0, outputs0))
        # replicate the last stage's outputs to every stage (out_specs P())
        mask = (stage == S - 1)
        return jax.tree.map(
            lambda o: jax.lax.psum(o * mask.astype(o.dtype), axis), outputs)

    param_specs = jax.tree.map(lambda _: P(axis), stacked_params)
    x_specs = jax.tree.map(lambda _: P(), x)
    return shard_map(
        stage_body, mesh=mesh,
        in_specs=(param_specs, x_specs),
        out_specs=jax.tree.map(lambda _: P(), x), check_rep=False)(
            stacked_params, x)


def pipeline_decoder(cfg, params: dict, inputs_embeds, cos, sin,
                     attention_mask, q_positions, pp: PPConfig,
                     remat: bool = False):
    """Run the text decoder's layer stack through the GPipe schedule.

    Microbatches the batch dim (B % pp.micro == 0), carries the rotary tables
    and masks alongside the hidden states (every stage needs its microbatch's
    slice), returns (B, L, hidden) pre-final-norm hidden states. Dense layers
    only (MoE aux-loss tracking needs the single-program scan path)."""
    from ..models.qwen2_5_vl.text import decoder_layer

    if cfg.n_experts:
        raise NotImplementedError("PP + MoE layer stacks not supported")
    B, L, Hd = inputs_embeds.shape
    n_micro = pp.micro
    if B % n_micro:
        raise ValueError(f"batch {B} not divisible by {n_micro} microbatches")
    mb = B // n_micro

    if q_positions is None:
        q_positions = jnp.broadcast_to(jnp.arange(L)[None, :], (B, L))
    if attention_mask is None:
        attention_mask = jnp.ones((B, L), jnp.int32)

    def split(a):
        return a.reshape((n_micro, mb) + a.shape[1:])

    layer = decoder_layer
    if remat:
        layer = jax.checkpoint(decoder_layer, static_argnums=(0,))

    def layer_fn(p, carry):
        h, cos_mb, sin_mb, mask_mb, qpos_mb = carry
        h, _, _ = layer(cfg, p, h, cos_mb, sin_mb, mask_mb, qpos_mb)
        return (h, cos_mb, sin_mb, mask_mb, qpos_mb)

    carry = (split(inputs_embeds), split(cos), split(sin),
             split(attention_mask), split(q_positions))
    out = pipeline_forward(layer_fn, params["layers"], carry,
                           mesh=pp.mesh, axis=pp.axis)
    return out[0].reshape(B, L, Hd)
