"""Flash attention backward kernels + custom VJP wrapper.

Gives the training path the same Pallas kernel as inference (the reference
trains through flash-attn's fused backward; SURVEY.md §2.10 items 1-2).

Standard flash backward split:
  forward extra output: per-row logsumexp (lse)
  host-level: delta = rowsum(dO ⊙ O)
  dq kernel : loops KV blocks — p = exp(qk − lse); ds = p ⊙ (dO·Vᵀ − delta);
              dq += ds·K
  dkv kernel: grid over KV blocks, loops q blocks — dv += pᵀ·dO; dk += dsᵀ·q

Same contiguous-prefix mask contract as the forward (per-row kv lengths via
scalar prefetch).
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .flash_attention import NEG_INF, _pad_to, flash_attention

# ------------------------------------------------------------- forward w/ lse


def _fwd_kernel(kvlen_ref, q_ref, k_ref, v_ref, o_ref, lse_ref, *,
                scale: float, causal: bool, block_k: int, seq_k: int):
    bq, D = q_ref.shape
    bh = pl.program_id(0)
    iq = pl.program_id(1)
    # bf16 matmul inputs + f32 accumulators (preferred_element_type):
    # the pre-r5 f32 upcast ran the MXU at the quarter-rate f32 path
    q = q_ref[:]
    kv_len = kvlen_ref[bh]
    hi = pl.cdiv(kv_len, block_k)
    if causal:
        hi = jnp.minimum(hi, pl.cdiv((iq + 1) * bq, block_k))
    row_ids = iq * bq + jax.lax.broadcasted_iota(jnp.int32, (bq, block_k), 0)

    def body(j, carry):
        m_prev, l_prev, acc_prev = carry
        k = k_ref[pl.ds(j * block_k, block_k), :]
        v = v_ref[pl.ds(j * block_k, block_k), :]
        s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32) * scale
        col_ids = j * block_k + jax.lax.broadcasted_iota(jnp.int32, (bq, block_k), 1)
        mask = col_ids < kv_len
        if causal:
            mask = mask & (col_ids <= row_ids)
        s = jnp.where(mask, s, NEG_INF)
        m_new = jnp.maximum(m_prev, s.max(axis=-1, keepdims=True))
        p = jnp.exp(s - m_new)
        corr = jnp.exp(m_prev - m_new)
        l_new = l_prev * corr + p.sum(axis=-1, keepdims=True)
        acc_new = acc_prev * corr + jax.lax.dot_general(
            p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        return m_new, l_new, acc_new

    m0 = jnp.full((bq, 1), NEG_INF, jnp.float32)
    l0 = jnp.zeros((bq, 1), jnp.float32)
    acc0 = jnp.zeros((bq, D), jnp.float32)
    m, l, acc = jax.lax.fori_loop(0, hi, body, (m0, l0, acc0))
    lsafe = jnp.where(l == 0, 1.0, l)
    o_ref[:] = (acc / lsafe).astype(o_ref.dtype)
    lse_ref[:] = (m + jnp.log(lsafe)).astype(jnp.float32)


def _dq_kernel(kvlen_ref, q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref,
               dq_ref, *, scale: float, causal: bool, block_k: int, seq_k: int):
    bq, D = q_ref.shape
    bh = pl.program_id(0)
    iq = pl.program_id(1)
    q = q_ref[:]
    do = do_ref[:]
    lse = lse_ref[:]                                   # (bq, 1)
    delta = delta_ref[:]                               # (bq, 1)
    kv_len = kvlen_ref[bh]
    hi = pl.cdiv(kv_len, block_k)
    if causal:
        hi = jnp.minimum(hi, pl.cdiv((iq + 1) * bq, block_k))
    row_ids = iq * bq + jax.lax.broadcasted_iota(jnp.int32, (bq, block_k), 0)

    def body(j, dq):
        k = k_ref[pl.ds(j * block_k, block_k), :]
        v = v_ref[pl.ds(j * block_k, block_k), :]
        s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32) * scale
        col_ids = j * block_k + jax.lax.broadcasted_iota(jnp.int32, (bq, block_k), 1)
        mask = col_ids < kv_len
        if causal:
            mask = mask & (col_ids <= row_ids)
        p = jnp.where(mask, jnp.exp(s - lse), 0.0)
        dp = jax.lax.dot_general(do, v, (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        ds = p * (dp - delta) * scale
        return dq + jax.lax.dot_general(
            ds.astype(k.dtype), k, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

    dq = jax.lax.fori_loop(0, hi, body, jnp.zeros((bq, D), jnp.float32))
    dq_ref[:] = dq.astype(dq_ref.dtype)


def _dkv_kernel(kvlen_ref, q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref,
                dk_ref, dv_ref, *, scale: float, causal: bool, block_q: int,
                seq_q: int):
    bk, D = k_ref.shape
    bh = pl.program_id(0)
    jk = pl.program_id(1)
    k = k_ref[:]
    v = v_ref[:]
    kv_len = kvlen_ref[bh]
    col_ids = jk * bk + jax.lax.broadcasted_iota(jnp.int32, (block_q, bk), 1)
    nq = seq_q // block_q
    # causal: only q blocks at/after this kv block contribute
    lo = (jk * bk) // block_q if causal else 0
    # full-row refs for the q-side loop
    q_ref_full = q_ref
    do_full = do_ref
    lse_full = lse_ref
    delta_full = delta_ref

    def body(i, carry):
        dk, dv = carry
        q = q_ref_full[pl.ds(i * block_q, block_q), :]
        do = do_full[pl.ds(i * block_q, block_q), :]
        lse = lse_full[pl.ds(i * block_q, block_q), :]
        delta = delta_full[pl.ds(i * block_q, block_q), :]
        s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32) * scale
        row_ids = i * block_q + jax.lax.broadcasted_iota(
            jnp.int32, (block_q, bk), 0)
        mask = col_ids < kv_len
        if causal:
            mask = mask & (col_ids <= row_ids)
        p = jnp.where(mask, jnp.exp(s - lse), 0.0)      # (bq, bk)
        dv = dv + jax.lax.dot_general(
            p.astype(do.dtype), do, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        dp = jax.lax.dot_general(do, v, (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        ds = p * (dp - delta) * scale
        dk = dk + jax.lax.dot_general(
            ds.astype(q.dtype), q, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        return dk, dv

    dk0 = jnp.zeros((bk, D), jnp.float32)
    dv0 = jnp.zeros((bk, D), jnp.float32)
    dk, dv = jax.lax.fori_loop(lo, nq, body, (dk0, dv0))
    dk_ref[:] = dk.astype(dk_ref.dtype)
    dv_ref[:] = dv.astype(dv_ref.dtype)


# ------------------------------------------------------------------ wrapper


def _prep(q, k, v, kv_lens_b, block_q, block_k):
    B, Lq, H, D = q.shape
    Hkv = k.shape[2]
    if Hkv != H:
        rep = H // Hkv
        k = jnp.repeat(k, rep, axis=2)
        v = jnp.repeat(v, rep, axis=2)
    qh = q.transpose(0, 2, 1, 3).reshape(B * H, Lq, D)
    kh = k.transpose(0, 2, 1, 3).reshape(B * H, -1, D)
    vh = v.transpose(0, 2, 1, 3).reshape(B * H, -1, D)
    qh, Lq0 = _pad_to(qh, 1, block_q)
    kh, Lk0 = _pad_to(kh, 1, block_k)
    vh, _ = _pad_to(vh, 1, block_k)
    if kv_lens_b is None:
        kv_lens = jnp.full((B,), Lk0, jnp.int32)
    else:
        kv_lens = kv_lens_b.astype(jnp.int32)
    kv_lens = jnp.repeat(kv_lens, H)
    return qh, kh, vh, kv_lens, (B, Lq, H, D, Hkv, Lq0, Lk0)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7))
def flash_attention_trainable(q, k, v, kv_lens_f, causal=True, block_q=128,
                              block_k=128, interpret=False):
    """Differentiable flash attention. kv_lens_f: (B,) float32 valid-KV lengths
    (contiguous-prefix masks; gradient is zero). Returns (B, Lq, H, D)."""
    out, _ = _fwd(q, k, v, kv_lens_f, causal, block_q, block_k, interpret)
    return out


def _fwd(q, k, v, kv_lens_f, causal, block_q, block_k, interpret):
    qh, kh, vh, kv_lens, meta = _prep(q, k, v, kv_lens_f, block_q, block_k)
    B, Lq, H, D, Hkv, Lq0, Lk0 = meta
    BH, Lqp, _ = qh.shape
    Lkp = kh.shape[1]
    scale = D ** -0.5
    kernel = functools.partial(_fwd_kernel, scale=scale, causal=causal,
                               block_k=block_k, seq_k=Lkp)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1, grid=(BH, Lqp // block_q),
        in_specs=[
            pl.BlockSpec((None, block_q, D), lambda b, i, *_: (b, i, 0)),
            pl.BlockSpec((None, Lkp, D), lambda b, i, *_: (b, 0, 0)),
            pl.BlockSpec((None, Lkp, D), lambda b, i, *_: (b, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((None, block_q, D), lambda b, i, *_: (b, i, 0)),
            pl.BlockSpec((None, block_q, 1), lambda b, i, *_: (b, i, 0)),
        ])
    out, lse = pl.pallas_call(
        kernel, grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((BH, Lqp, D), q.dtype),
                   jax.ShapeDtypeStruct((BH, Lqp, 1), jnp.float32)],
        interpret=interpret,
    )(kv_lens, qh, kh, vh)
    out4 = out[:, :Lq0].reshape(B, H, Lq0, D).transpose(0, 2, 1, 3)
    return out4, (qh, kh, vh, kv_lens, out, lse, meta)


def _flash_fwd_rule(q, k, v, kv_lens_f, causal, block_q, block_k, interpret):
    out, res = _fwd(q, k, v, kv_lens_f, causal, block_q, block_k, interpret)
    return out, (res, kv_lens_f)


def _flash_bwd_rule(causal, block_q, block_k, interpret, res_all, g):
    res, kv_lens_f = res_all
    qh, kh, vh, kv_lens, out_p, lse, meta = res
    B, Lq, H, D, Hkv, Lq0, Lk0 = meta
    BH, Lqp, _ = qh.shape
    Lkp = kh.shape[1]
    scale = D ** -0.5

    gh = g.transpose(0, 2, 1, 3).reshape(BH, Lq0, D)
    gh, _ = _pad_to(gh, 1, block_q)
    delta = jnp.sum(gh.astype(jnp.float32) * out_p.astype(jnp.float32),
                    axis=-1, keepdims=True)            # (BH, Lqp, 1)

    dq_kernel = functools.partial(_dq_kernel, scale=scale, causal=causal,
                                  block_k=block_k, seq_k=Lkp)
    grid_spec_q = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1, grid=(BH, Lqp // block_q),
        in_specs=[
            pl.BlockSpec((None, block_q, D), lambda b, i, *_: (b, i, 0)),
            pl.BlockSpec((None, Lkp, D), lambda b, i, *_: (b, 0, 0)),
            pl.BlockSpec((None, Lkp, D), lambda b, i, *_: (b, 0, 0)),
            pl.BlockSpec((None, block_q, D), lambda b, i, *_: (b, i, 0)),
            pl.BlockSpec((None, block_q, 1), lambda b, i, *_: (b, i, 0)),
            pl.BlockSpec((None, block_q, 1), lambda b, i, *_: (b, i, 0)),
        ],
        out_specs=pl.BlockSpec((None, block_q, D), lambda b, i, *_: (b, i, 0)))
    dq = pl.pallas_call(
        dq_kernel, grid_spec=grid_spec_q,
        out_shape=jax.ShapeDtypeStruct((BH, Lqp, D), qh.dtype),
        interpret=interpret,
    )(kv_lens, qh, kh, vh, gh, lse, delta)

    dkv_kernel = functools.partial(_dkv_kernel, scale=scale, causal=causal,
                                   block_q=block_q, seq_q=Lqp)
    grid_spec_kv = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1, grid=(BH, Lkp // block_k),
        in_specs=[
            pl.BlockSpec((None, Lqp, D), lambda b, j, *_: (b, 0, 0)),
            pl.BlockSpec((None, block_k, D), lambda b, j, *_: (b, j, 0)),
            pl.BlockSpec((None, block_k, D), lambda b, j, *_: (b, j, 0)),
            pl.BlockSpec((None, Lqp, D), lambda b, j, *_: (b, 0, 0)),
            pl.BlockSpec((None, Lqp, 1), lambda b, j, *_: (b, 0, 0)),
            pl.BlockSpec((None, Lqp, 1), lambda b, j, *_: (b, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((None, block_k, D), lambda b, j, *_: (b, j, 0)),
            pl.BlockSpec((None, block_k, D), lambda b, j, *_: (b, j, 0)),
        ])
    dk, dv = pl.pallas_call(
        dkv_kernel, grid_spec=grid_spec_kv,
        out_shape=[jax.ShapeDtypeStruct((BH, Lkp, D), kh.dtype),
                   jax.ShapeDtypeStruct((BH, Lkp, D), vh.dtype)],
        interpret=interpret,
    )(kv_lens, qh, kh, vh, gh, lse, delta)

    dq4 = dq[:, :Lq0].reshape(B, H, Lq0, D).transpose(0, 2, 1, 3)
    dk4 = dk[:, :Lk0].reshape(B, H, Lk0, D).transpose(0, 2, 1, 3)
    dv4 = dv[:, :Lk0].reshape(B, H, Lk0, D).transpose(0, 2, 1, 3)
    if Hkv != H:
        rep = H // Hkv
        dk4 = dk4.reshape(B, Lk0, Hkv, rep, D).sum(axis=3)
        dv4 = dv4.reshape(B, Lk0, Hkv, rep, D).sum(axis=3)
    d_lens = None if kv_lens_f is None else jnp.zeros_like(kv_lens_f)
    return dq4, dk4, dv4, d_lens


flash_attention_trainable.defvjp(_flash_fwd_rule, _flash_bwd_rule)
