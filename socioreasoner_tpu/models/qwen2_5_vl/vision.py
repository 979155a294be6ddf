"""Qwen2.5-VL vision tower (ViT with window attention) — functional JAX.

TPU-first design decisions vs the reference GPU stack
(`mcore_adapter/models/qwen2_5_vl/modeling_qwen2_5_vl.py:186-202` wraps the HF ViT
with flash-attention-2 varlen):
  * Conv3d patch embed == one matmul: the conv kernel equals its stride, so each
    patch row (C*tps*ps*ps) hits the MXU as a single (S, in) @ (in, hidden) GEMM.
  * Window attention == segment-masked batched attention: instead of splitting the
    sequence per cu_seqlens (dynamic shapes), patches are host-permuted into
    window-contiguous order and every block attends under a per-patch segment-id
    equality mask — static shapes, one big attention per layer.
  * All `depth` blocks run under one `lax.scan` over stacked params (fast compile);
    full-attention layers (fullatt_block_indexes) just swap the segment-id array.

Host-side bookkeeping (permutation, rope tables, segment ids) lives in rope.py:
`vision_window_index` / `vision_rope_cos_sin`.
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import functools

import numpy as np

from ...ops.attention import dense_attention
from ...ops.norms import layer_norm, quick_gelu, rms_norm, swiglu
from .config import VisionConfig
from . import rope as rope_mod

# ViT segmented-attention Pallas block sizes. Large q blocks cut HBM K/V
# traffic: the block-sparse span of a q block is ~the images it straddles
# (rows, not blocks), so traffic ~ nq * image_pair_rows - quartering nq
# quarters the reads. 512x256 fits VMEM at D=80 (q/acc 164 KB f32).
# seg_block_sizes shrinks them (128-aligned) for short sequences.
from ...ops.flash_attention import (SEG_BLOCK_Q, SEG_BLOCK_K,  # noqa: F401
                                    seg_block_sizes)


def _norm(cfg: VisionConfig, x, p, key):
    if cfg.variant == "qwen2":     # LayerNorm with bias
        return layer_norm(x, p[key], p[key + "_b"], cfg.rms_norm_eps)
    return rms_norm(x, p[key], cfg.rms_norm_eps)


def vision_block(cfg: VisionConfig, p: Dict, x: jnp.ndarray, cos: jnp.ndarray,
                 sin: jnp.ndarray, seg: jnp.ndarray,
                 use_flash: bool = False,
                 max_span_blocks: int = None) -> jnp.ndarray:
    """One ViT block. x: (S, hidden); seg: (S,) attention segment ids."""
    S = x.shape[0]
    H, D = cfg.num_heads, cfg.head_dim
    # int8 tower weights (ops/quant.py quantize_vision_params) run w8a8:
    # the ViT is pure multi-token compute, so the int8 MXU always applies
    from ...ops.quant import matmul_q
    a8 = p["qkv_w"].dtype == jnp.int8
    h = _norm(cfg, x, p, "norm1")
    qkv = matmul_q(h, p, "qkv_w", a8=a8) + p["qkv_b"]    # (S, 3*hidden)
    q, k, v = jnp.split(qkv.reshape(S, 3, H, D), 3, axis=1)
    q, k, v = q[:, 0], k[:, 0], v[:, 0]                  # (S, H, D)
    # rotary (cos/sin are (S, D)); float32 rotation like HF
    q32, k32 = q.astype(jnp.float32), k.astype(jnp.float32)
    c, s = cos[:, None, :], sin[:, None, :]
    q = (q32 * c + rope_mod.rotate_half(q32) * s).astype(x.dtype)
    k = (k32 * c + rope_mod.rotate_half(k32) * s).astype(x.dtype)
    if use_flash:
        from ...ops.flash_attention import flash_attention_segmented
        bq, bk = seg_block_sizes(S)
        attn = flash_attention_segmented(q, k, v, seg, block_q=bq, block_k=bk,
                                         max_span_blocks=max_span_blocks)
    else:
        attn = dense_attention(q[None], k[None], v[None],
                               segment_ids_q=seg[None], segment_ids_kv=seg[None])[0]
    x = x + (matmul_q(attn.reshape(S, H * D), p, "proj_w", a8=a8)
             + p["proj_b"])
    h2 = _norm(cfg, x, p, "norm2")
    if cfg.variant == "qwen2":     # fc1 → quick-GELU → fc2
        x = x + (matmul_q(quick_gelu(matmul_q(h2, p, "fc1_w", a8=a8)
                                     + p["fc1_b"]), p, "fc2_w", a8=a8)
                 + p["fc2_b"])
    elif a8:
        act = (jax.nn.silu((matmul_q(h2, p, "gate_w", a8=True)
                            + p["gate_b"]).astype(jnp.float32))
               * (matmul_q(h2, p, "up_w", a8=True)
                  + p["up_b"]).astype(jnp.float32))
        x = x + (matmul_q(act.astype(h2.dtype), p, "down_w", a8=True)
                 + p["down_b"])
    else:
        x = x + swiglu(h2, p["gate_w"], p["up_w"], p["down_w"],
                       p["gate_b"], p["up_b"], p["down_b"])
    return x


def vision_tower(
    cfg: VisionConfig,
    params: Dict,
    patches: jnp.ndarray,      # (S, patch_input_dim) — already window-permuted
    cos: jnp.ndarray,          # (S, head_dim) — window-permuted rope table
    sin: jnp.ndarray,
    window_seg: jnp.ndarray,   # (S,) window segment ids
    full_seg: jnp.ndarray,     # (S,) per-image segment ids
    is_full_layer: jnp.ndarray,  # (depth,) bool — use full_seg in this layer
    use_flash: bool = False,
    max_span_blocks: int = None,   # static: max k-block span over BOTH seg
    #                                arrays (ops/flash_attention.py
    #                                seg_max_span_blocks) — makes the packed
    #                                attention block-diagonal-cost
) -> jnp.ndarray:
    """Returns (S // spatial_merge_unit, out_hidden) merged embeddings, still in
    window order (caller applies the inverse permutation)."""
    x = (patches @ params["patch_embed_w"]).astype(patches.dtype)

    def body(h, layer):
        p, is_full = layer
        seg = jnp.where(is_full, full_seg, window_seg)
        return vision_block(cfg, p, h, cos, sin, seg, use_flash=use_flash,
                            max_span_blocks=max_span_blocks), None

    x, _ = jax.lax.scan(body, x, (params["blocks"], is_full_layer))

    # merger: norm then merge spatial_merge_unit patches → MLP
    if cfg.variant == "qwen2":
        h = layer_norm(x, params["merger_ln_q"], params["merger_ln_q_b"],
                       cfg.rms_norm_eps)
    else:
        h = rms_norm(x, params["merger_ln_q"], cfg.rms_norm_eps)
    from ...ops.quant import matmul_q
    a8 = params["merger_fc1_w"].dtype == jnp.int8
    h = h.reshape(-1, cfg.spatial_merge_unit * cfg.hidden_size)
    h = matmul_q(h, params, "merger_fc1_w", a8=a8) + params["merger_fc1_b"]
    h = jax.nn.gelu(h, approximate=False)
    return (matmul_q(h, params, "merger_fc2_w", a8=a8)
            + params["merger_fc2_b"])


def vision_host_inputs(cfg: VisionConfig, pixel_patches: np.ndarray, grid_thw: np.ndarray):
    """Host precompute: permute patches window-wise, build rope tables + segments.

    Returns dict of device-ready arrays + inv_perm to restore merged order.
    """
    unit = cfg.spatial_merge_unit
    window_index, window_seg, full_seg = rope_mod.vision_window_index(grid_thw, cfg)
    cos, sin = rope_mod.vision_rope_cos_sin(grid_thw, cfg)
    S = pixel_patches.shape[0]
    # permute at merge-unit granularity
    perm_units = window_index
    patch_perm = (perm_units[:, None] * unit + np.arange(unit)[None, :]).reshape(-1)
    return {
        "patches": pixel_patches[patch_perm],
        "cos": cos[patch_perm],
        "sin": sin[patch_perm],
        "window_seg": window_seg,
        "full_seg": full_seg,
        "is_full_layer": np.array([i in cfg.fullatt_block_indexes for i in range(cfg.depth)]),
        "inv_perm": np.argsort(window_index),
    }


@functools.partial(jax.jit, static_argnames=("ps", "ms", "tps"))
def patchify_device(img_u8: jnp.ndarray,         # (H, W, 3) uint8, resized
                    mean: jnp.ndarray, std: jnp.ndarray,
                    ps: int, ms: int, tps: int) -> jnp.ndarray:
    """Device-side CLIP-normalize + Qwen merge-block patchify (the exact math
    of datasets/processor.py patchify_image, parity-tested). Uploading uint8
    pixels instead of pre-patchified f32 is 8× fewer host→device bytes (no
    temporal duplication, 1 byte/px) — host→device transfer dominated the
    VLM infer pipeline (measured through the axon relay)."""
    x = img_u8.astype(jnp.float32) / 255.0
    x = (x - mean) / std
    x = x.transpose(2, 0, 1)                           # (C, H, W)
    C, H, W = x.shape
    gh, gw = H // ps, W // ps
    frames = jnp.broadcast_to(x[None], (tps, C, H, W))  # temporal repeat
    p = frames.reshape(1, tps, C, gh // ms, ms, ps, gw // ms, ms, ps)
    p = p.transpose(0, 3, 6, 4, 7, 2, 1, 5, 8)
    return p.reshape(gh * gw, C * tps * ps * ps)


@functools.partial(jax.jit, static_argnames=("cfg", "use_flash", "n_img",
                                             "ps", "ms", "tps",
                                             "max_span_blocks"))
def _vision_core_u8(cfg: VisionConfig, params: Dict, images_u8, mean, std,
                    cos, sin, window_seg, full_seg, is_full, perm, inv_perm,
                    *, use_flash: bool, n_img: int, ps: int, ms: int,
                    tps: int, max_span_blocks: int = None) -> jnp.ndarray:
    dtype = params["patch_embed_w"].dtype
    parts = []
    for a in images_u8:
        x = a.astype(jnp.float32) / 255.0
        x = ((x - mean) / std).transpose(2, 0, 1)
        C, H, W = x.shape
        gh, gw = H // ps, W // ps
        frames = jnp.broadcast_to(x[None], (tps, C, H, W))
        p = frames.reshape(1, tps, C, gh // ms, ms, ps, gw // ms, ms, ps)
        p = p.transpose(0, 3, 6, 4, 7, 2, 1, 5, 8)
        parts.append(p.reshape(gh * gw, C * tps * ps * ps).astype(dtype))
    patches = parts[0] if n_img == 1 else jnp.concatenate(parts, axis=0)
    out = vision_tower(cfg, params, patches[perm], cos, sin, window_seg,
                       full_seg, is_full, use_flash=use_flash,
                       max_span_blocks=max_span_blocks)
    return out[inv_perm]


def run_vision_u8(cfg: VisionConfig, params: Dict, images_u8,
                  grid_thw: np.ndarray, image_config, dtype=None) -> jnp.ndarray:
    """Like run_vision, but takes per-image resized uint8 arrays (the
    defer_patchify carrier): uint8 upload (8× fewer bytes than bf16 patches
    with temporal duplication), then normalize+patchify+window-permute+tower
    in ONE jitted call — the eager tower dispatched hundreds of ops per
    image, each a host↔device round trip (measured dominant through the
    axon relay)."""
    ic = image_config
    from ...ops.flags import use_flash_attention
    unit = cfg.spatial_merge_unit
    window_index, window_seg, full_seg = rope_mod.vision_window_index(grid_thw, cfg)
    cos, sin = rope_mod.vision_rope_cos_sin(grid_thw, cfg)
    patch_perm = (window_index[:, None] * unit + np.arange(unit)[None, :]).reshape(-1)
    is_full = np.array([i in cfg.fullatt_block_indexes for i in range(cfg.depth)])
    from ...ops.flash_attention import seg_max_span_blocks
    use_flash = use_flash_attention()
    maxk = None
    if use_flash:
        # only the flash path consumes maxk — computing it anyway would key
        # the jit cache on an unused value and recompile the dense path per
        # input shape (ADVICE r3 low)
        S_pk = len(window_seg)
        bq, bk = seg_block_sizes(S_pk)
        maxk = max(seg_max_span_blocks(window_seg, bq, bk),
                   seg_max_span_blocks(full_seg, bq, bk))
    out = _vision_core_u8(
        cfg, params, tuple(jnp.asarray(np.ascontiguousarray(a))
                           for a in images_u8),
        jnp.asarray(ic.image_mean, jnp.float32),
        jnp.asarray(ic.image_std, jnp.float32),
        jnp.asarray(cos[patch_perm]), jnp.asarray(sin[patch_perm]),
        jnp.asarray(window_seg), jnp.asarray(full_seg), jnp.asarray(is_full),
        jnp.asarray(patch_perm), jnp.asarray(np.argsort(window_index)),
        use_flash=use_flash, n_img=len(images_u8),
        ps=ic.patch_size, ms=ic.merge_size, tps=ic.temporal_patch_size,
        max_span_blocks=maxk)
    if dtype is not None:
        out = out.astype(dtype)
    return out


@functools.partial(jax.jit, static_argnames=("cfg", "use_flash",
                                             "max_span_blocks"))
def _vision_core(cfg: VisionConfig, params: Dict, patches, cos, sin,
                 window_seg, full_seg, is_full, inv_perm, *,
                 use_flash: bool, max_span_blocks: int = None) -> jnp.ndarray:
    out = vision_tower(cfg, params, patches, cos, sin, window_seg, full_seg,
                       is_full, use_flash=use_flash,
                       max_span_blocks=max_span_blocks)
    return out[inv_perm]


def run_vision(cfg: VisionConfig, params: Dict, pixel_patches: np.ndarray,
               grid_thw: np.ndarray, dtype=None) -> jnp.ndarray:
    """Convenience host→device wrapper returning merged embeddings in model
    order. The tower runs as ONE jitted call — dispatched eagerly it issues
    hundreds of ops, each a host↔device round trip."""
    if dtype is None:
        dtype = params["patch_embed_w"].dtype
    from ...ops.flags import use_flash_attention
    from ...ops.flash_attention import seg_max_span_blocks
    prep = vision_host_inputs(cfg, pixel_patches, grid_thw)
    use_flash = use_flash_attention()
    maxk = None
    if use_flash:
        S_pk = len(prep["window_seg"])
        bq, bk = seg_block_sizes(S_pk)
        maxk = max(seg_max_span_blocks(prep["window_seg"], bq, bk),
                   seg_max_span_blocks(prep["full_seg"], bq, bk))
    return _vision_core(
        cfg, params,
        jnp.asarray(prep["patches"], dtype), jnp.asarray(prep["cos"]),
        jnp.asarray(prep["sin"]), jnp.asarray(prep["window_seg"]),
        jnp.asarray(prep["full_seg"]), jnp.asarray(prep["is_full_layer"]),
        jnp.asarray(prep["inv_perm"]), use_flash=use_flash,
        max_span_blocks=maxk)
