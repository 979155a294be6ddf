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


def _decode_kernel(len_ref, q_ref, k_hbm, v_hbm, o_ref, *, block_k: int,
                   scale: float, n_heads: int, n_kv: int, head_dim: int,
                   lmax: int):
    slot = pl.program_id(0)
    kv_len = len_ref[slot]
    k_row = k_hbm.at[slot]
    v_row = v_hbm.at[slot]
    nblocks = pl.cdiv(kv_len, block_k)
    rep = n_heads // n_kv
    q = q_ref[:].astype(jnp.float32) * scale          # (H, D)

    def run(k_scratch, v_scratch, sem):
        def get_copy(buf, hbm, j, s):
            return pltpu.make_async_copy(
                hbm.at[pl.ds(j * block_k, block_k)], buf.at[s], sem.at[s])

        # warm-up: first block
        get_copy(k_scratch, k_row, 0, 0).start()
        get_copy(v_scratch, v_row, 0, 0).start()

        def body(j, carry):
            m_prev, l_prev, acc_prev = carry
            s = j % 2
            nxt = (j + 1) % 2

            @pl.when(j + 1 < nblocks)
            def _():
                get_copy(k_scratch, k_row, j + 1, nxt).start()
                get_copy(v_scratch, v_row, j + 1, nxt).start()

            get_copy(k_scratch, k_row, j, s).wait()
            get_copy(v_scratch, v_row, j, s).wait()
            k = k_scratch[s].astype(jnp.float32)       # (bk, Hkv, D)
            v = v_scratch[s].astype(jnp.float32)

            # logits per kv group: (rep, D) @ (D, bk) for each kv head
            logits_list = []
            for g in range(n_kv):
                qg = q[g * rep:(g + 1) * rep]          # static slice (Mosaic-safe)
                kg = k[:, g, :]                        # (bk, D)
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
                    pg, v[:, g, :], (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32))   # (rep, D)
            pv = jnp.concatenate(pv_list, axis=0)
            acc_new = acc_prev * corr + pv
            return m_new, l_new, acc_new

        m0 = jnp.full((n_heads, 1), NEG_INF, jnp.float32)
        l0 = jnp.zeros((n_heads, 1), jnp.float32)
        acc0 = jnp.zeros((n_heads, head_dim), jnp.float32)
        m, l, acc = jax.lax.fori_loop(0, nblocks, body, (m0, l0, acc0))
        o_ref[:] = (acc / jnp.where(l == 0, 1.0, l)).astype(o_ref.dtype)

    pl.run_scoped(
        run,
        k_scratch=pltpu.VMEM((2, block_k, n_kv, head_dim), k_hbm.dtype),
        v_scratch=pltpu.VMEM((2, block_k, n_kv, head_dim), v_hbm.dtype),
        sem=pltpu.SemaphoreType.DMA((2,)),
    )


@functools.partial(jax.jit, static_argnames=("block_k", "interpret"))
def paged_decode_attention(
    q: jnp.ndarray,          # (S, H, D) one query token per slot
    k_cache: jnp.ndarray,    # (S, Lmax, Hkv, D)
    v_cache: jnp.ndarray,
    lengths: jnp.ndarray,    # (S,) valid KV length per slot (incl. current tok)
    *,
    block_k: int = 256,
    interpret: bool = False,
) -> jnp.ndarray:
    S, H, D = q.shape
    Lmax, Hkv = k_cache.shape[1], k_cache.shape[2]
    scale = D ** -0.5
    kernel = functools.partial(
        _decode_kernel, block_k=block_k, scale=scale, n_heads=H, n_kv=Hkv,
        head_dim=D, lmax=Lmax)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(S,),
        in_specs=[
            pl.BlockSpec((None, H, D), lambda s, *_: (s, 0, 0)),
            pl.BlockSpec(memory_space=pltpu.ANY),   # k cache stays in HBM
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=pl.BlockSpec((None, H, D), lambda s, *_: (s, 0, 0)),
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((S, H, D), q.dtype),
        interpret=interpret,
    )(lengths.astype(jnp.int32), q, k_cache, v_cache)
