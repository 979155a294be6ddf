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
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30


def _decode_kernel(len_ref, q_ref, k_hbm, v_hbm, *rest, block_k: int,
                   scale: float, n_heads: int, n_kv: int, head_dim: int,
                   lmax: int, quantized: bool):
    if quantized:
        ks_hbm, vs_hbm, o_ref = rest
    else:
        (o_ref,) = rest
    slot = pl.program_id(0)
    kv_len = len_ref[slot]
    k_row = k_hbm.at[slot]
    v_row = v_hbm.at[slot]
    nblocks = pl.cdiv(kv_len, block_k)
    rep = n_heads // n_kv
    q = q_ref[:].astype(jnp.float32) * scale          # (H, D)

    def run(k_scratch, v_scratch, sem, ks_scratch=None, vs_scratch=None,
            ssem=None):
        def get_copy(buf, hbm, j, s):
            return pltpu.make_async_copy(
                hbm.at[pl.ds(j * block_k, block_k)], buf.at[s], sem.at[s])

        def get_scale_copy(buf, hbm, j, s):
            # scales live as (Hkv, Lalloc) per slot — the block's lane dim is
            # the 128-aligned block_k slice, keeping Mosaic DMA tiling legal
            return pltpu.make_async_copy(
                hbm.at[slot].at[:, pl.ds(j * block_k, block_k)],
                buf.at[s], ssem.at[s])

        def start(j, s):
            get_copy(k_scratch, k_row, j, s).start()
            get_copy(v_scratch, v_row, j, s).start()
            if quantized:
                get_scale_copy(ks_scratch, ks_hbm, j, s).start()
                get_scale_copy(vs_scratch, vs_hbm, j, s).start()

        def wait(j, s):
            get_copy(k_scratch, k_row, j, s).wait()
            get_copy(v_scratch, v_row, j, s).wait()
            if quantized:
                get_scale_copy(ks_scratch, ks_hbm, j, s).wait()
                get_scale_copy(vs_scratch, vs_hbm, j, s).wait()

        # warm-up: first block
        start(0, 0)

        def body(j, carry):
            m_prev, l_prev, acc_prev = carry
            s = j % 2
            nxt = (j + 1) % 2

            @pl.when(j + 1 < nblocks)
            def _():
                start(j + 1, nxt)

            wait(j, s)
            if quantized:
                # int8 cache is stored flattened (bk, Hkv*D): int8 sublane
                # packing (4) forbids slicing a (Hkv=2, D) dim; per-group
                # dequant uses 128-aligned static lane slices instead
                k2 = k_scratch[s]                      # (bk, Hkv*D) int8
                v2 = v_scratch[s]
                ks = ks_scratch[s]                     # (Hkv, bk) f32
                vs = vs_scratch[s]

                def kv_group(g):
                    kg = k2[:, g * head_dim:(g + 1) * head_dim].astype(
                        jnp.float32) * ks[g][:, None]
                    vg = v2[:, g * head_dim:(g + 1) * head_dim].astype(
                        jnp.float32) * vs[g][:, None]
                    return kg, vg
            else:
                k = k_scratch[s].astype(jnp.float32)   # (bk, Hkv, D)
                v = v_scratch[s].astype(jnp.float32)

                def kv_group(g):
                    return k[:, g, :], v[:, g, :]

            # logits per kv group: (rep, D) @ (D, bk) for each kv head
            groups = [kv_group(g) for g in range(n_kv)]
            logits_list = []
            for g in range(n_kv):
                qg = q[g * rep:(g + 1) * rep]          # static slice (Mosaic-safe)
                kg = groups[g][0]                      # (bk, D)
                logits_list.append(jax.lax.dot_general(
                    qg, kg, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32))  # (rep, bk)
            s_mat = jnp.concatenate(logits_list, axis=0)   # (H, bk)
            col = j * block_k + jax.lax.broadcasted_iota(
                jnp.int32, (n_heads, block_k), 1)
            s_mat = jnp.where(col < kv_len, s_mat, NEG_INF)

            m_new = jnp.maximum(m_prev, s_mat.max(axis=-1, keepdims=True))
            p = jnp.exp(s_mat - m_new)
            corr = jnp.exp(m_prev - m_new)
            l_new = l_prev * corr + p.sum(axis=-1, keepdims=True)
            pv_list = []
            for g in range(n_kv):
                pg = p[g * rep:(g + 1) * rep]
                pv_list.append(jax.lax.dot_general(
                    pg, groups[g][1], (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32))   # (rep, D)
            pv = jnp.concatenate(pv_list, axis=0)
            acc_new = acc_prev * corr + pv
            return m_new, l_new, acc_new

        m0 = jnp.full((n_heads, 1), NEG_INF, jnp.float32)
        l0 = jnp.zeros((n_heads, 1), jnp.float32)
        acc0 = jnp.zeros((n_heads, head_dim), jnp.float32)
        m, l, acc = jax.lax.fori_loop(0, nblocks, body, (m0, l0, acc0))
        o_ref[:] = (acc / jnp.where(l == 0, 1.0, l)).astype(o_ref.dtype)

    kv_block = (2, block_k, n_kv * head_dim) if quantized else \
        (2, block_k, n_kv, head_dim)
    scoped = dict(
        k_scratch=pltpu.VMEM(kv_block, k_hbm.dtype),
        v_scratch=pltpu.VMEM(kv_block, v_hbm.dtype),
        sem=pltpu.SemaphoreType.DMA((2,)),
    )
    if quantized:
        scoped.update(
            ks_scratch=pltpu.VMEM((2, n_kv, block_k), jnp.float32),
            vs_scratch=pltpu.VMEM((2, n_kv, block_k), jnp.float32),
            ssem=pltpu.SemaphoreType.DMA((2,)),
        )
    pl.run_scoped(run, **scoped)


@functools.partial(jax.jit, static_argnames=("block_k", "interpret"))
def paged_decode_attention(
    q: jnp.ndarray,          # (S, H, D) one query token per slot
    k_cache: jnp.ndarray,    # (S, Lmax, Hkv, D) — bf16/f32, or int8 with scales
    v_cache: jnp.ndarray,
    lengths: jnp.ndarray,    # (S,) valid KV length per slot (incl. current tok)
    k_scale: jnp.ndarray = None,   # (S, Hkv, Lmax) f32 per-token dequant scales
    v_scale: jnp.ndarray = None,
    *,
    block_k: int = 256,
    interpret: bool = False,
) -> jnp.ndarray:
    S, H, D = q.shape
    Lmax, Hkv = k_cache.shape[1], k_cache.shape[2]
    quantized = k_scale is not None
    if quantized:
        # flatten (Hkv, D) → (Hkv*D,): int8 sublane packing forbids slicing
        # the Hkv dim in-kernel; trailing-dim merge is layout-free in XLA
        k_cache = k_cache.reshape(S, Lmax, Hkv * D)
        v_cache = v_cache.reshape(S, Lmax, Hkv * D)
    scale = D ** -0.5
    kernel = functools.partial(
        _decode_kernel, block_k=block_k, scale=scale, n_heads=H, n_kv=Hkv,
        head_dim=D, lmax=Lmax, quantized=quantized)
    in_specs = [
        pl.BlockSpec((None, H, D), lambda s, *_: (s, 0, 0)),
        pl.BlockSpec(memory_space=pltpu.ANY),   # k cache stays in HBM
        pl.BlockSpec(memory_space=pltpu.ANY),
    ]
    args = [lengths.astype(jnp.int32), q, k_cache, v_cache]
    if quantized:
        in_specs += [pl.BlockSpec(memory_space=pltpu.ANY),
                     pl.BlockSpec(memory_space=pltpu.ANY)]
        args += [k_scale.astype(jnp.float32), v_scale.astype(jnp.float32)]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(S,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((None, H, D), lambda s, *_: (s, 0, 0)),
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((S, H, D), q.dtype),
        interpret=interpret,
    )(*args)


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
