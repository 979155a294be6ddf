"""Pallas decode attention over the slot KV cache.

The vLLM-paged-attention role (SURVEY.md §2.10 item 3) for the DecodeEngine's
chunked loop: one query token per slot attends over that slot's cache prefix.
The XLA fallback reads the FULL (Lalloc) cache of every slot each step; this
kernel DMAs only `ceil(len/block)` K/V blocks from HBM per slot (double-
buffered), so decode HBM traffic scales with actual context length — the
dominant cost at SocioSeg's 4k prompt + 2k response lengths.

Layout: q (S, H, D); k/v cache (S, Lmax, Hkv, D) stay in HBM (`pltpu.ANY`);
per-slot lengths via scalar prefetch. GQA handled in-kernel: logits computed
per KV-head group with the MXU.

Slots are processed `group` at a time per grid step (TPU grid steps run
sequentially on a core — per-slot grids serialize the whole batch, so DMAs of
a group are issued together and the QK/PV matmuls batch over the group).

Optional int8 quantized cache: values flattened to (S, Lmax, Hkv*D) (int8
sublane packing forbids slicing the Hkv dim) with per-token-per-head f32
scales stored (S, Hkv, Lmax) so scale DMA blocks stay lane-aligned.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30


def _decode_kernel(len_ref, *rest, block_k: int,
                   scale: float, n_heads: int, n_kv: int, head_dim: int,
                   group: int, quantized: bool, stacked: bool):
    if stacked:
        # caches carry a leading layer dim; the layer index rides the second
        # scalar-prefetch arg so one compiled kernel serves every layer
        layer_ref, rest = rest[0], rest[1:]
    q_ref, k_hbm, v_hbm, *rest = rest
    if quantized:
        ks_hbm, vs_hbm, o_ref = rest
    else:
        (o_ref,) = rest
    # static cache capacity (token dim is axis -2 dense / -2 packed-quantized)
    Lmax = k_hbm.shape[2 if stacked else 1]
    if stacked:
        lyr = layer_ref[0]
        k_hbm = k_hbm.at[lyr]
        v_hbm = v_hbm.at[lyr]
        if quantized:
            ks_hbm = ks_hbm.at[lyr]
            vs_hbm = vs_hbm.at[lyr]
    base = pl.program_id(0) * group
    lens = [len_ref[base + i] for i in range(group)]
    kv_len = lens[0]
    for l in lens[1:]:
        kv_len = jnp.maximum(kv_len, l)          # group runs to its max length
    # an all-zero-length group would give nblocks=0: the unconditional
    # start(0, 0) below would leave un-waited DMAs at kernel exit. Clamp to 1 —
    # the col<len mask zeroes every column, so the output is 0 either way.
    # Upper clamp to the static cache capacity: the block loop drives async
    # HBM DMAs, so a corrupt length scalar must bound-fault here, never issue
    # an out-of-range copy (a kernel fault kills the whole TPU worker).
    nblocks = jnp.clip(pl.cdiv(kv_len, block_k), 1, Lmax // block_k)
    rep = n_heads // n_kv
    q = q_ref[:].astype(jnp.float32) * scale     # (G, H, D)

    def run(k_scratch, v_scratch, sem, ks_scratch=None, vs_scratch=None,
            ssem=None):
        def copies(j, s):
            # per-slot copies: a single grouped DMA with a strided slot dim
            # (`.at[pl.ds(base, group), pl.ds(...)]`) DEADLOCKS the axon v5e
            # backend (hung device, needs ~3 min recovery) — do not regroup
            out = []
            for i in range(group):
                out.append(pltpu.make_async_copy(
                    k_hbm.at[base + i].at[pl.ds(j * block_k, block_k)],
                    k_scratch.at[s, i], sem.at[s, i, 0]))
                out.append(pltpu.make_async_copy(
                    v_hbm.at[base + i].at[pl.ds(j * block_k, block_k)],
                    v_scratch.at[s, i], sem.at[s, i, 1]))
                if quantized:
                    # scales (S, Hkv, Lmax): lane dim = 128-aligned block slice
                    out.append(pltpu.make_async_copy(
                        ks_hbm.at[base + i].at[:, pl.ds(j * block_k, block_k)],
                        ks_scratch.at[s, i], ssem.at[s, i, 0]))
                    out.append(pltpu.make_async_copy(
                        vs_hbm.at[base + i].at[:, pl.ds(j * block_k, block_k)],
                        vs_scratch.at[s, i], ssem.at[s, i, 1]))
            return out

        def start(j, s):
            for c in copies(j, s):
                c.start()

        def wait(j, s):
            for c in copies(j, s):
                c.wait()

        start(0, 0)

        def slot_update(j, s, i, m_prev, l_prev, acc_prev):
            """One slot's online-softmax block update (2-D ops only —
            Mosaic-friendly; the group win is the batched DMA issue)."""
            if quantized:
                k2 = k_scratch[s, i]                   # (bk, Hkv*D) int8
                v2 = v_scratch[s, i]
                ks = ks_scratch[s, i]                  # (Hkv, bk) f32
                vs = vs_scratch[s, i]

                def kv_group(g):
                    sl = slice(g * head_dim, (g + 1) * head_dim)
                    kg = k2[:, sl].astype(jnp.float32) * ks[g][:, None]
                    vg = v2[:, sl].astype(jnp.float32) * vs[g][:, None]
                    return kg, vg
            else:
                k = k_scratch[s, i].astype(jnp.float32)   # (bk, Hkv, D)
                v = v_scratch[s, i].astype(jnp.float32)

                def kv_group(g):
                    return k[:, g, :], v[:, g, :]

            groups = [kv_group(g) for g in range(n_kv)]
            logits_list = []
            for g in range(n_kv):
                qg = q[i, g * rep:(g + 1) * rep]       # (rep, D) static slice
                logits_list.append(jax.lax.dot_general(
                    qg, groups[g][0], (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32))   # (rep, bk)
            s_mat = jnp.concatenate(logits_list, axis=0)   # (H, bk)
            col = j * block_k + jax.lax.broadcasted_iota(
                jnp.int32, (n_heads, block_k), 1)
            s_mat = jnp.where(col < lens[i], s_mat, NEG_INF)

            m_new = jnp.maximum(m_prev, s_mat.max(axis=-1, keepdims=True))
            # a fully-masked block (slot shorter than the group max) keeps
            # m_new == NEG_INF; exp(NEG_INF - NEG_INF) would be 1, not 0
            p = jnp.where(s_mat > NEG_INF / 2, jnp.exp(s_mat - m_new), 0.0)
            corr = jnp.exp(m_prev - m_new)
            l_new = l_prev * corr + p.sum(axis=-1, keepdims=True)
            pv_list = []
            for g in range(n_kv):
                pg = p[g * rep:(g + 1) * rep]
                pv_list.append(jax.lax.dot_general(
                    pg, groups[g][1], (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32))   # (rep, D)
            pv = jnp.concatenate(pv_list, axis=0)          # (H, D)
            return m_new, l_new, acc_prev * corr + pv

        def body(j, carry):
            s = j % 2
            nxt = (j + 1) % 2

            @pl.when(j + 1 < nblocks)
            def _():
                start(j + 1, nxt)

            wait(j, s)
            return tuple(slot_update(j, s, i, *carry[i]) for i in range(group))

        init = tuple((jnp.full((n_heads, 1), NEG_INF, jnp.float32),
                      jnp.zeros((n_heads, 1), jnp.float32),
                      jnp.zeros((n_heads, head_dim), jnp.float32))
                     for _ in range(group))
        final = jax.lax.fori_loop(0, nblocks, body, init)
        for i in range(group):
            _, l, acc = final[i]
            o_ref[i] = (acc / jnp.where(l == 0, 1.0, l)).astype(o_ref.dtype)

    kv_block = (2, group, block_k, n_kv * head_dim) if quantized else \
        (2, group, block_k, n_kv, head_dim)
    scoped = dict(
        k_scratch=pltpu.VMEM(kv_block, k_hbm.dtype),
        v_scratch=pltpu.VMEM(kv_block, v_hbm.dtype),
        sem=pltpu.SemaphoreType.DMA((2, group, 2)),
    )
    if quantized:
        scoped.update(
            ks_scratch=pltpu.VMEM((2, group, n_kv, block_k), jnp.float32),
            vs_scratch=pltpu.VMEM((2, group, n_kv, block_k), jnp.float32),
            ssem=pltpu.SemaphoreType.DMA((2, group, 2)),
        )
    pl.run_scoped(run, **scoped)


@functools.partial(jax.jit,
                   static_argnames=("block_k", "slot_group", "interpret"))
def paged_decode_attention(
    q: jnp.ndarray,          # (S, H, D) one query token per slot
    k_cache: jnp.ndarray,    # (S, Lmax, Hkv, D) — bf16/f32, or int8 with scales;
    #                          or ([layers,] S, Lmax, Hkv, D) with `layer` given
    v_cache: jnp.ndarray,
    lengths: jnp.ndarray,    # (S,) valid KV length per slot (incl. current tok)
    k_scale: jnp.ndarray = None,   # (S, Hkv, Lmax) f32 per-token dequant scales
    v_scale: jnp.ndarray = None,
    *,
    layer: jnp.ndarray = None,     # scalar layer index into a STACKED cache —
    #   lets the decode loop keep one (layers, S, …) buffer and avoid per-layer
    #   slice copies; one compiled kernel serves every layer
    block_k: int = 256,
    slot_group: int = 8,     # slots per grid step (grid steps serialize)
    interpret: bool = False,
) -> jnp.ndarray:
    S, H, D = q.shape
    stacked = layer is not None
    Lmax, Hkv = k_cache.shape[-3], k_cache.shape[-2]
    if Lmax % block_k:
        # the last DMA block would read past the cache (and the int8 scale
        # memref needs a 128-aligned lane dim) — allocate Lmax in block_k units
        raise ValueError(f"cache length {Lmax} must be a multiple of "
                         f"block_k={block_k}")
    quantized = k_scale is not None
    if quantized:
        k_cache = k_cache.reshape(k_cache.shape[:-2] + (Hkv * D,))
        v_cache = v_cache.reshape(v_cache.shape[:-2] + (Hkv * D,))
    if stacked:
        # never pad a stacked cache (that would copy it) — shrink the group
        # to a divisor of S instead
        G = max(g for g in range(1, min(slot_group, S) + 1) if S % g == 0)
        pad = 0
    else:
        G = min(slot_group, S)
        pad = (-S) % G
    if pad:                  # pad to a whole number of groups (length 0 → zeros)
        q = jnp.pad(q, ((0, pad), (0, 0), (0, 0)))
        k_cache = jnp.pad(k_cache, ((0, pad),) + ((0, 0),) * (k_cache.ndim - 1))
        v_cache = jnp.pad(v_cache, ((0, pad),) + ((0, 0),) * (v_cache.ndim - 1))
        lengths = jnp.pad(lengths, (0, pad))
        if quantized:
            k_scale = jnp.pad(k_scale, ((0, pad), (0, 0), (0, 0)))
            v_scale = jnp.pad(v_scale, ((0, pad), (0, 0), (0, 0)))
    Sp = S + pad
    scale = D ** -0.5
    kernel = functools.partial(
        _decode_kernel, block_k=block_k, scale=scale, n_heads=H, n_kv=Hkv,
        head_dim=D, group=G, quantized=quantized, stacked=stacked)
    in_specs = [
        pl.BlockSpec((G, H, D), lambda g, *_: (g, 0, 0)),
        pl.BlockSpec(memory_space=pltpu.ANY),   # k cache stays in HBM
        pl.BlockSpec(memory_space=pltpu.ANY),
    ]
    args = [lengths.astype(jnp.int32)]
    if stacked:
        args.append(jnp.asarray(layer, jnp.int32).reshape(1))
    args += [q, k_cache, v_cache]
    if quantized:
        in_specs += [pl.BlockSpec(memory_space=pltpu.ANY),
                     pl.BlockSpec(memory_space=pltpu.ANY)]
        args += [k_scale.astype(jnp.float32), v_scale.astype(jnp.float32)]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2 if stacked else 1,
        grid=(Sp // G,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((G, H, D), lambda g, *_: (g, 0, 0)),
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((Sp, H, D), q.dtype),
        interpret=interpret,
    )(*args)
    return out[:S] if pad else out


def quantize_kv(x: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Symmetric per-token-per-head int8 quantization of K/V.

    x: (B, L, Hkv, D) → (int8 values (B, L, Hkv, D), scales (B, L, Hkv) f32)
    such that x ≈ values * scales[..., None]. Int8 KV halves decode HBM
    traffic (the decode-attention bottleneck) and doubles cache capacity —
    the TPU counterpart of vLLM's quantized KV cache (SURVEY §2.10 item 3).
    """
    amax = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=-1)      # (B, L, Hkv)
    scales = jnp.maximum(amax, 1e-8) / 127.0
    vals = jnp.round(x.astype(jnp.float32) / scales[..., None])
    return jnp.clip(vals, -127, 127).astype(jnp.int8), scales


def dequantize_kv(vals: jnp.ndarray, scales_t: jnp.ndarray,
                  dtype=jnp.float32) -> jnp.ndarray:
    """Inverse of quantize_kv for the XLA fallback path.

    vals: (B, L, Hkv, D) int8; scales_t: (B, Hkv, L) — the cache stores scales
    transposed so the pallas kernel's DMA blocks are lane-aligned."""
    scales = jnp.swapaxes(scales_t, -1, -2)                      # (B, L, Hkv)
    return (vals.astype(jnp.float32) * scales[..., None]).astype(dtype)


def paged_decode_attention_tp(q, k_cache, v_cache, lengths,
                              k_scale=None, v_scale=None, *, mesh,
                              axis: str = "tp", layer=None, **kw):
    """Tensor-parallel paged decode attention over the mesh's `axis`.

    SURVEY §2.10 item 3's "ICI-sharded paged KV cache": q heads and KV heads
    split over the tp axis in matching contiguous GQA blocks (q-head group g
    attends kv head g — Megatron column-parallel ordering), so every shard
    runs the unmodified kernel on its LOCAL head slice of the cache and no
    attention collective is needed; o_proj's row-parallel psum is the only
    cross-chip sum per layer. A bare pallas_call under GSPMD would instead be
    replicated (all-gathered caches), defeating the sharding.
    """
    from jax.sharding import PartitionSpec as P
    from jax.experimental.shard_map import shard_map

    T = mesh.shape[axis]
    H, Hkv = q.shape[1], k_cache.shape[-2]
    if H % T or Hkv % T:
        raise ValueError(f"tp={T} must divide heads ({H}) and kv heads ({Hkv})")
    qspec = P(None, axis, None)
    cspec = P(*([None] * (k_cache.ndim - 2)), axis, None)
    in_specs = [qspec, cspec, cspec, P()]
    args = [q, k_cache, v_cache, lengths]
    if k_scale is not None:
        sspec = P(*([None] * (k_scale.ndim - 2)), axis, None)
        in_specs += [sspec, sspec]
        args += [k_scale, v_scale]
    if layer is not None:
        in_specs.append(P())
        args.append(jnp.asarray(layer, jnp.int32))

    def local(q, k, v, lens, *rest):
        rest = list(rest)
        lyr = rest.pop() if layer is not None else None
        ks, vs = (rest[0], rest[1]) if rest else (None, None)
        return paged_decode_attention(q, k, v, lens, ks, vs, layer=lyr, **kw)

    return shard_map(local, mesh=mesh, in_specs=tuple(in_specs),
                     out_specs=qspec, check_rep=False)(*args)
