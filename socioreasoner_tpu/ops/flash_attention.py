"""Pallas TPU flash attention.

Replaces the reference's flash-attn / TE fused attention dependency (SURVEY.md
§2.10 items 1-2). Two kernels cover the SocioSeg compute paths:

  flash_attention          — causal or full, per-row valid-KV-length masking
                             via scalar prefetch (LM prefill / training forward;
                             requires contiguous-prefix masks = right-padded
                             batches, which is the framework's layout contract)
  flash_attention_segmented — segment-id equality mask, non-causal
                             (ViT window attention: window-contiguous segments
                             → block-diagonal; blocks fully outside a segment
                             boundary are still computed but masked — the
                             permuted layout keeps segments contiguous so the
                             wasted fraction is small)

Design: online-softmax over KV blocks (fori_loop), f32 accumulators in VMEM
scratch, q blocks on the grid, K/V rows of the (batch, head) resident in VMEM.
Causal variant early-exits KV blocks beyond the diagonal via a masked loop
bound. Falls back to the XLA dense path automatically off-TPU (interpret mode
in tests).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30


def _attn_kernel(kvlen_ref, q_ref, k_ref, v_ref, o_ref, *,
                 scale: float, causal: bool, block_k: int, seq_k: int):
    """One (batch*kv-head, q-head-in-group, q-block) program. q_ref: (bq, D);
    k/v: (Lk, D); kvlen_ref: (B*Hkv,) int32 scalar-prefetch — valid KV length
    per row (masks are contiguous-prefix: right-padded batches).

    GQA FOLD: grid dim 1 iterates the q heads sharing this program's KV head,
    so the K/V BlockSpec index (b, 0, 0) repeats across (rep × nq) grid steps
    and Mosaic elides the re-DMA — K/V crosses HBM once per KV head, not once
    per q head (8× less KV traffic at Qwen2.5's 16q/2kv)."""
    bq, D = q_ref.shape
    bh = pl.program_id(0)
    iq = pl.program_id(2)
    # keep matmul INPUTS in the stored dtype (bf16 MXU passes run at 4x the
    # f32 rate; f32 happens in the accumulator via preferred_element_type) —
    # the pre-r5 f32 upcast capped the kernel at ~11 TFLOP/s on v5e. The
    # softmax scale is applied to the f32 logits, not the bf16 q.
    q = q_ref[:]
    kv_len = kvlen_ref[bh]

    nk = seq_k // block_k
    hi = pl.cdiv(kv_len, block_k)
    if causal:
        # only blocks intersecting the causal triangle
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
    # fully-masked rows (l==0) produce 0 output
    out = acc / jnp.where(l == 0, 1.0, l)
    o_ref[:] = out.astype(o_ref.dtype)


def _seg_kernel(kstart_ref, kend_ref, q_ref, k_ref, v_ref, segq_ref, segk_ref,
                o_ref, m_sc, l_sc, acc_sc, *, scale: float):
    """Segment-id equality attention (ViT windows / packed full-att blocks).

    KV is a GRID dimension (innermost), so VMEM holds one (block_k, D) K/V
    tile at a time — O(block) regardless of the packed sequence length (a
    full-KV-resident variant scoped-vmem-OOMed at S=46720 on v5e: 45.75M vs
    the 16M limit). Online-softmax state (m, l, acc) carries across KV steps
    in VMEM scratch.

    BLOCK-SPARSE: segments are contiguous in the packed layout, so q block i
    only needs k blocks kstart[i]..kend[i] (scalar prefetch). The K/V index
    map clamps out-of-range grid steps to kend[i] — Pallas elides the copy
    when the mapped index repeats, so HBM K/V traffic is O(needed blocks),
    not O(nq·nk). Without this, a 16-image packed ViT dispatch (S≈46k) read
    ~87 GB of K/V per layer and the socioseg bench regressed 0.417→0.138
    tiles/s (driver BENCH r3 pre-fix run). The compute guard additionally
    skips masked pairs inside the range (partial edge blocks)."""
    i = pl.program_id(1)
    j = pl.program_id(2)
    nk = pl.num_programs(2)

    @pl.when(j == 0)
    def _init():
        m_sc[:] = jnp.full_like(m_sc[:], NEG_INF)
        l_sc[:] = jnp.zeros_like(l_sc[:])
        acc_sc[:] = jnp.zeros_like(acc_sc[:])

    seg_q = segq_ref[0]                                       # (bq,)
    seg_k = segk_ref[0]                                       # (bk,)
    in_range = kstart_ref[i] + j <= kend_ref[i]
    overlap = (in_range
               & (jnp.max(seg_q) >= jnp.min(seg_k))
               & (jnp.min(seg_q) <= jnp.max(seg_k)))

    @pl.when(overlap)
    def _compute():
        # bf16 matmul inputs, f32 accumulation (see _attn_kernel)
        q = q_ref[:]
        k = k_ref[:]
        v = v_ref[:]
        s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32) * scale
        mask = seg_q[:, None] == seg_k[None, :]
        s = jnp.where(mask, s, NEG_INF)
        m_prev = m_sc[:]
        m_new = jnp.maximum(m_prev, s.max(axis=-1, keepdims=True))
        p = jnp.exp(s - m_new)
        corr = jnp.exp(m_prev - m_new)
        l_sc[:] = l_sc[:] * corr + p.sum(axis=-1, keepdims=True)
        acc_sc[:] = acc_sc[:] * corr + jax.lax.dot_general(
            p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        m_sc[:] = m_new

    @pl.when(j == nk - 1)
    def _out():
        l = l_sc[:]
        o_ref[:] = (acc_sc[:] / jnp.where(l == 0, 1.0, l)).astype(o_ref.dtype)


def _pad_to(x, axis, multiple, value=0.0):
    size = x.shape[axis]
    pad = (-size) % multiple
    if pad == 0:
        return x, size
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths, constant_values=value), size


@functools.partial(jax.jit, static_argnames=("causal", "block_q", "block_k",
                                             "interpret"))
def flash_attention(
    q: jnp.ndarray,                      # (B, Lq, H, D)
    k: jnp.ndarray,                      # (B, Lk, Hkv, D)
    v: jnp.ndarray,
    attention_mask: Optional[jnp.ndarray] = None,   # (B, Lk) 1=valid
    *,
    causal: bool = True,
    block_q: int = None,
    block_k: int = None,
    interpret: bool = False,
) -> jnp.ndarray:
    """Flash attention; GQA KV heads folded into the grid (no K/V repeat).
    Returns (B, Lq, H, D)."""
    B, Lq, H, D = q.shape
    Hkv = k.shape[2]
    assert H % Hkv == 0, (H, Hkv)
    rep = H // Hkv
    scale = D ** -0.5
    # default blocks: 256x512 won the post-bf16-fix on-chip sweep at the
    # socioseg prefill buckets (wave 14: 25.0 TFLOP/s @ L=2048, 33.7 @ 2560,
    # vs 24.6/32.2 for 512x512 and 12.8/15.1 for the pre-r5 128x128;
    # docs/BENCH_MATRIX_r5.md), shrunk to a lane-aligned fit for short
    # sequences so padding never dominates
    if block_q is None:
        block_q = min(256, -(-Lq // 128) * 128)
    if block_k is None:
        block_k = min(512, -(-k.shape[1] // 128) * 128)

    # q: (B, H, Lq, D) → (B*Hkv, rep, Lq, D); q head h = hkv*rep + r shares
    # KV head hkv = h // rep, matching HF GQA broadcast order.
    qh = q.transpose(0, 2, 1, 3).reshape(B * Hkv, rep, Lq, D)
    kh = k.transpose(0, 2, 1, 3).reshape(B * Hkv, -1, D)
    vh = v.transpose(0, 2, 1, 3).reshape(B * Hkv, -1, D)
    qh, Lq0 = _pad_to(qh, 2, block_q)
    kh, Lk0 = _pad_to(kh, 1, block_k)
    vh, _ = _pad_to(vh, 1, block_k)
    Lqp, Lkp = qh.shape[2], kh.shape[1]

    if attention_mask is None:
        kv_lens = jnp.full((B,), Lk0, jnp.int32)
    else:
        kv_lens = attention_mask.astype(jnp.int32).sum(axis=-1)
    kv_lens = jnp.repeat(kv_lens, Hkv)                  # (B*Hkv,)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B * Hkv, rep, Lqp // block_q),
        in_specs=[
            pl.BlockSpec((None, None, block_q, D),
                         lambda b, r, i, *_: (b, r, i, 0)),
            pl.BlockSpec((None, Lkp, D), lambda b, r, i, *_: (b, 0, 0)),
            pl.BlockSpec((None, Lkp, D), lambda b, r, i, *_: (b, 0, 0)),
        ],
        out_specs=pl.BlockSpec((None, None, block_q, D),
                               lambda b, r, i, *_: (b, r, i, 0)),
    )
    kernel = functools.partial(_attn_kernel, scale=scale, causal=causal,
                               block_k=block_k, seq_k=Lkp)
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B * Hkv, rep, Lqp, D), q.dtype),
        interpret=interpret,
    )(kv_lens, qh, kh, vh)
    out = (out[:, :, :Lq0].reshape(B, H, Lq0, D).transpose(0, 2, 1, 3))
    return out


# default segmented-attention block shape (tuned on-chip r3: 512x256)
SEG_BLOCK_Q = 512
SEG_BLOCK_K = 256


def seg_block_sizes(S: int) -> "tuple[int, int]":
    """Sublane/lane-aligned Pallas block sizes for a packed length S.

    Returns the default (SEG_BLOCK_Q, SEG_BLOCK_K), shrunk to the next
    multiple of 128 ≥ S for short sequences — a raw min(BLOCK, S) produced
    ragged non-aligned shapes (e.g. S=292 → block_q=292) that Mosaic may
    reject or tile badly (ADVICE r3 medium)."""
    fit = max(128, -(-S // 128) * 128)
    return min(SEG_BLOCK_Q, fit), min(SEG_BLOCK_K, fit)


def _seg_kv_bounds(seg, S0: int, nq: int, block_q: int, block_k: int, xp):
    """Per-q-block k-block bounds for NONDECREASING contiguous segment ids.

    Single source of the starts/ends/kmin/kmax formula, parameterized on the
    array module (np on the host for the static span, jnp inside the traced
    kernel wrapper) so the two can never diverge (ADVICE r3 low)."""
    starts = xp.minimum(xp.arange(nq) * block_q, S0 - 1)
    ends = xp.minimum((xp.arange(nq) + 1) * block_q - 1, S0 - 1)
    kmin = xp.searchsorted(seg, seg[starts], side="left")
    kmax = xp.searchsorted(seg, seg[ends], side="right") - 1
    return kmin // block_k, kmax // block_k


def seg_max_span_blocks(segment_ids, block_q: int = 128,
                        block_k: int = 128) -> int:
    """Host helper: max k-block span any q block needs, for NONDECREASING
    contiguous segment ids (the ViT window-permuted layout). Pass the max
    over all per-layer segment arrays as `max_span_blocks` to
    flash_attention_segmented to shrink its KV grid from nk to this."""
    import numpy as np
    s = np.asarray(segment_ids)
    S0 = s.shape[0]
    if S0 == 0:
        return 1
    nq = -(-S0 // block_q)
    kstart, kend = _seg_kv_bounds(s, S0, nq, block_q, block_k, np)
    return int(np.max(kend - kstart + 1))


def flash_attention_segmented(
    q: jnp.ndarray,                      # (S, H, D) — packed ViT sequence
    k: jnp.ndarray,
    v: jnp.ndarray,
    segment_ids: jnp.ndarray,            # (S,) int32
    *,
    block_q: int = 128,
    block_k: int = 128,
    max_span_blocks: Optional[int] = None,
    interpret: bool = False,
) -> jnp.ndarray:
    """Segment-masked attention over a packed sequence.

    `max_span_blocks` (static, from seg_max_span_blocks on the host) REQUIRES
    nondecreasing segment_ids: it both shrinks the KV grid dimension and
    activates per-q-block k-bounds, making HBM traffic and grid iteration
    O(block-diagonal) instead of O(S²). Without it the kernel is dense-safe
    for arbitrary segment ids (every pair visited, masked pairs skipped)."""
    if max_span_blocks is not None and not isinstance(segment_ids,
                                                      jax.core.Tracer):
        # an underestimated span silently truncates attention (ADVICE r3 low)
        # — validate against the host recompute whenever ids are concrete
        import numpy as np
        actual = seg_max_span_blocks(np.asarray(segment_ids), block_q, block_k)
        if actual > max_span_blocks:
            raise ValueError(
                f"max_span_blocks={max_span_blocks} underestimates the real "
                f"k-block span {actual} for block_q={block_q} "
                f"block_k={block_k}; attention would be silently truncated")
    return _flash_attention_segmented(
        q, k, v, segment_ids, block_q=block_q, block_k=block_k,
        max_span_blocks=max_span_blocks, interpret=interpret)


@functools.partial(jax.jit, static_argnames=("block_q", "block_k",
                                             "max_span_blocks", "interpret"))
def _flash_attention_segmented(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    segment_ids: jnp.ndarray,
    *,
    block_q: int = 128,
    block_k: int = 128,
    max_span_blocks: Optional[int] = None,
    interpret: bool = False,
) -> jnp.ndarray:
    S, H, D = q.shape
    scale = D ** -0.5
    qh = q.transpose(1, 0, 2)            # (H, S, D)
    kh = k.transpose(1, 0, 2)
    vh = v.transpose(1, 0, 2)
    qh, S0 = _pad_to(qh, 1, block_q)
    kh, _ = _pad_to(kh, 1, block_k)
    vh, _ = _pad_to(vh, 1, block_k)
    Sp = qh.shape[1]
    # pad segments with a sentinel no one matches
    seg = segment_ids.astype(jnp.int32)
    seg_q = jnp.pad(seg, (0, Sp - S0), constant_values=-1)[None]          # (1, Sp)
    seg_k = jnp.pad(seg, (0, kh.shape[1] - S0), constant_values=-2)[None]

    nq = Sp // block_q
    nk = kh.shape[1] // block_k
    if max_span_blocks is not None and max_span_blocks < nk:
        # per-q-block k bounds (nondecreasing segs: block i's k range covers
        # the first occurrence of its first row's seg through the last
        # occurrence of its last valid row's seg) — same formula as the host
        # span computation, via the shared helper
        kstart, kend = _seg_kv_bounds(seg[:S0], S0, nq, block_q, block_k, jnp)
        kstart = kstart.astype(jnp.int32)
        kend = kend.astype(jnp.int32)
        G = max_span_blocks
    else:
        kstart = jnp.zeros((nq,), jnp.int32)
        kend = jnp.full((nq,), nk - 1, jnp.int32)
        G = nk

    def kv_map(h, i, j, kstart, kend):
        # out-of-range steps re-map to kend[i]; Pallas elides the copy when
        # the mapped index repeats, so they cost no HBM traffic
        return (h, jnp.clip(jnp.minimum(kstart[i] + j, kend[i]), 0, nk - 1), 0)

    def seg_k_map(h, i, j, kstart, kend):
        return (0, jnp.clip(jnp.minimum(kstart[i] + j, kend[i]), 0, nk - 1))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(H, nq, G),
        in_specs=[
            pl.BlockSpec((None, block_q, D), lambda h, i, j, *_: (h, i, 0)),
            pl.BlockSpec((None, block_k, D), kv_map),
            pl.BlockSpec((None, block_k, D), kv_map),
            pl.BlockSpec((1, block_q), lambda h, i, j, *_: (0, i)),
            pl.BlockSpec((1, block_k), seg_k_map),
        ],
        out_specs=pl.BlockSpec((None, block_q, D), lambda h, i, j, *_: (h, i, 0)),
        scratch_shapes=[
            pltpu.VMEM((block_q, 1), jnp.float32),
            pltpu.VMEM((block_q, 1), jnp.float32),
            pltpu.VMEM((block_q, D), jnp.float32),
        ],
    )
    kernel = functools.partial(_seg_kernel, scale=scale)
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((H, Sp, D), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary")),
        interpret=interpret,
    )(kstart, kend, qh, kh, vh, seg_q, seg_k)
    return out[:, :S0].transpose(1, 0, 2)


def flash_attention_tp(q, k, v, attention_mask=None, *, mesh,
                       axis: str = "tp", **kw):
    """Head-sharded flash attention over the mesh's `axis` (decode-engine
    prefill under tensor parallelism). Heads are embarrassingly parallel:
    each shard runs the unmodified kernel on its contiguous GQA block of
    q/kv heads — the same grouping paged_decode_attention_tp uses, so the
    prefill-written cache shards line up with the decode reads."""
    from jax.sharding import PartitionSpec as P
    from jax.experimental.shard_map import shard_map

    T = mesh.shape[axis]
    H, Hkv = q.shape[2], k.shape[2]
    if H % T or Hkv % T:
        raise ValueError(f"tp={T} must divide heads ({H}) and kv heads ({Hkv})")
    hspec = P(None, None, axis, None)
    mask_in = attention_mask is not None
    in_specs = [hspec, hspec, hspec] + ([P()] if mask_in else [])

    def local(q, k, v, *rest):
        return flash_attention(q, k, v, rest[0] if rest else None, **kw)

    args = (q, k, v) + ((attention_mask,) if mask_in else ())
    return shard_map(local, mesh=mesh, in_specs=tuple(in_specs),
                     out_specs=hspec, check_rep=False)(*args)
