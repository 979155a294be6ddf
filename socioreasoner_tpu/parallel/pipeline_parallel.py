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
    vpp: int = 1              # virtual pipeline chunks per stage (ref
    #                           training_args.py:31 virtual_pipeline_model_
    #                           parallel_size): each device holds vpp
    #                           non-contiguous layer chunks; the interleaved
    #                           schedule shrinks the bubble by ~1/vpp

    def __post_init__(self):
        ax = dict(zip(self.mesh.axis_names, self.mesh.devices.shape))
        if ax.get(self.axis, 1) != self.size:
            raise ValueError(
                f"pipeline_model_parallel_size={self.size} but mesh axis "
                f"{self.axis!r} has size {ax.get(self.axis, 1)}")
        if self.vpp < 1:
            raise ValueError(f"vpp must be >= 1, got {self.vpp}")

    @property
    def micro(self) -> int:
        return self.n_micro or self.size


def make_pp_config(mesh: Optional[Mesh], pipeline_model_parallel_size: int,
                   n_micro: int = 0, axis: str = "pp",
                   vpp: int = 1) -> Optional[PPConfig]:
    if pipeline_model_parallel_size <= 1:
        return None
    if mesh is None:
        raise ValueError("pipeline_model_parallel_size > 1 requires an "
                         "explicit mesh with a 'pp' axis")
    return PPConfig(mesh=mesh, size=pipeline_model_parallel_size,
                    axis=axis, n_micro=n_micro, vpp=max(int(vpp), 1))


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


# ------------------------------------------------------------ interleaved VPP

def _interleaved_schedule(S: int, vpp: int, n_micro: int):
    """Static list-schedule for the interleaved virtual-pipeline forward.

    Virtual stage v ∈ [0, S*vpp) lives on device v % S as its chunk v // S.
    Work item (m, v) takes one tick; its output transfers to device
    (v%S + 1) % S during the same tick and is usable the next tick. Each
    device runs at most one item per tick, picking the ready item that comes
    first in Megatron's interleaved order (microbatch groups of S: group-major,
    then chunk, then microbatch — get_forward_backward_func interleaving).

    Returns numpy tables of shape (T, S):
      exec_k, exec_m, exec_valid — what each device computes at tick t
      recv_k, recv_m, recv_valid — where each device stores what it receives
                                   (from device s-1) at the end of tick t
    """
    import numpy as np

    if n_micro % S:
        # Megatron asserts this for interleaving (microbatch groups of S);
        # without it the greedy schedule degrades to GPipe-round latency
        raise ValueError(f"interleaved vpp needs n_micro % pp == 0 "
                         f"(got {n_micro} % {S})")
    V = S * vpp
    finish = {}
    items = {s: [] for s in range(S)}
    for s in range(S):
        per_dev = [(m, k * S + s) for m in range(n_micro) for k in range(vpp)]
        # Megatron interleaved order: microbatch group (m // S), then chunk,
        # then microbatch within the group
        per_dev.sort(key=lambda it: (it[0] // S, it[1] // S, it[0] % S))
        items[s] = per_dev

    done = {s: set() for s in range(S)}
    exec_k, exec_m, exec_valid = [], [], []
    total = n_micro * V
    scheduled = 0
    t = 0
    max_ticks = total * (S + vpp) + S + 5   # safety bound
    while scheduled < total and t < max_ticks:
        row_k = np.zeros(S, np.int32)
        row_m = np.zeros(S, np.int32)
        row_v = np.zeros(S, bool)
        for s in range(S):
            for (m, v) in items[s]:
                if (m, v) in done[s]:
                    continue
                ready = v == 0 or finish.get((m, v - 1), 1 << 30) < t
                if ready:
                    row_k[s] = v // S
                    row_m[s] = m
                    row_v[s] = True
                    finish[(m, v)] = t
                    done[s].add((m, v))
                    scheduled += 1
                    break
        exec_k.append(row_k)
        exec_m.append(row_m)
        exec_valid.append(row_v)
        t += 1
    assert scheduled == total, "interleaved schedule failed to place all items"
    T = len(exec_k)
    exec_k = np.stack(exec_k)
    exec_m = np.stack(exec_m)
    exec_valid = np.stack(exec_valid)

    recv_k = np.zeros((T, S), np.int32)
    recv_m = np.zeros((T, S), np.int32)
    recv_valid = np.zeros((T, S), bool)
    for t in range(T):
        for s in range(S):
            if not exec_valid[t, s]:
                continue
            v = exec_k[t, s] * S + s
            if v + 1 >= V:
                continue                      # final virtual stage: no send
            dst = (s + 1) % S
            recv_k[t, dst] = (v + 1) // S
            recv_m[t, dst] = exec_m[t, s]
            recv_valid[t, dst] = True
    return exec_k, exec_m, exec_valid, recv_k, recv_m, recv_valid


def pipeline_forward_interleaved(
    layer_fn: Callable[[Any, Any], Any],
    stacked_params: Any,           # (L, ...) pytree in ORIGINAL layer order
    x: Any,                        # pytree of (n_micro, mb, ...) microbatched
    mesh: Mesh,
    vpp: int,
    axis: str = "pp",
) -> Any:
    """Interleaved virtual-pipeline (VPP) forward: device s holds the vpp
    layer chunks of virtual stages {k*S + s}, microbatches stream through all
    S*vpp chunks ring-wise (ref Megatron interleaved
    get_forward_backward_func, training_args.py:31). The bubble shrinks from
    (S-1)/(n+S-1) to ~(S-1)/(vpp·n + S-1) at the cost of buffering in-flight
    activations per chunk. Static schedule tables drive every tick, so the
    whole thing jits to one fori_loop and differentiates through ppermute."""
    import numpy as np
    from jax.experimental.shard_map import shard_map

    S = mesh.shape[axis]
    n_micro = jax.tree.leaves(x)[0].shape[0]
    L = jax.tree.leaves(stacked_params)[0].shape[0]
    V = S * vpp
    if L % V:
        raise ValueError(f"{L} layers not divisible by pp×vpp={V}")
    per = L // V

    # reorder layers so the P(axis) shard of device s is its vpp chunks
    # (virtual stages k*S+s), k-major — locally reshaped to (vpp, per, ...)
    idx = np.concatenate([np.arange((k * S + s) * per, (k * S + s + 1) * per)
                          for s in range(S) for k in range(vpp)])
    reordered = jax.tree.map(lambda p: p[idx], stacked_params)

    ek, em, ev, rk, rm, rv = _interleaved_schedule(S, vpp, n_micro)
    T = ek.shape[0]
    tables = tuple(jnp.asarray(a) for a in (ek, em, ev, rk, rm, rv))

    def stage_body(local_params, x_local, ek, em, ev, rk, rm, rv):
        stage = jax.lax.axis_index(axis)
        chunks = jax.tree.map(
            lambda p: p.reshape((vpp, per) + p.shape[1:]), local_params)
        perm = [(i, (i + 1) % S) for i in range(S)]   # ring (chunk wrap S-1→0)

        def run_chunk(k, h):
            p_k = jax.tree.map(
                lambda c: jax.lax.dynamic_index_in_dim(c, k, keepdims=False),
                chunks)
            def body(carry, p):
                return layer_fn(p, carry), None
            out, _ = jax.lax.scan(body, h, p_k)
            return out

        def tick(t, carry):
            buffer, outputs, = carry
            k, m, valid = ek[t, stage], em[t, stage], ev[t, stage]
            first = (k == 0) & (stage == 0)
            x_in = jax.tree.map(
                lambda xl, b: jnp.where(first, xl[m], b[k, m]), x_local, buffer)
            h = run_chunk(k, x_in)
            last = valid & (k == vpp - 1) & (stage == S - 1)
            outputs = jax.tree.map(
                lambda o, hh: o.at[m].set(jnp.where(last, hh, o[m])),
                outputs, h)
            sent = jax.tree.map(lambda a: jax.lax.ppermute(a, axis, perm), h)
            kr, mr, vr = rk[t, stage], rm[t, stage], rv[t, stage]
            buffer = jax.tree.map(
                lambda b, ss: b.at[kr, mr].set(jnp.where(vr, ss, b[kr, mr])),
                buffer, sent)
            return (buffer, outputs)

        buffer0 = jax.tree.map(
            lambda xl: jnp.zeros((vpp,) + xl.shape, xl.dtype), x_local)
        outputs0 = jax.tree.map(jnp.zeros_like, x_local)
        _, outputs = jax.lax.fori_loop(0, T, tick, (buffer0, outputs0))
        mask = (stage == S - 1)
        return jax.tree.map(
            lambda o: jax.lax.psum(o * mask.astype(o.dtype), axis), outputs)

    param_specs = jax.tree.map(lambda _: P(axis), reordered)
    x_specs = jax.tree.map(lambda _: P(), x)
    t_spec = P()
    return shard_map(
        stage_body, mesh=mesh,
        in_specs=(param_specs, x_specs) + (t_spec,) * 6,
        out_specs=jax.tree.map(lambda _: P(), x), check_rep=False)(
            reordered, x, *tables)


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
    if pp.vpp > 1:
        out = pipeline_forward_interleaved(layer_fn, params["layers"], carry,
                                           mesh=pp.mesh, vpp=pp.vpp,
                                           axis=pp.axis)
    else:
        out = pipeline_forward(layer_fn, params["layers"], carry,
                               mesh=pp.mesh, axis=pp.axis)
    return out[0].reshape(B, L, Hd)
