"""SAM2 prompt encoder + two-way-attention mask decoder, functional JAX.

Replaces the torch SAM2 predictor decode path (ref seg_strategy.py:26-72;
SURVEY.md §2.10 item 4). Semantics mirror HF `Sam2PromptEncoder` /
`Sam2TwoWayTransformer` / `Sam2MaskDecoder`, with SocioSeg-shaped batching:
all K objects of a tile decode as one point-batch (the reference loops
`model.predict` per object — here one device call covers the tile).
"""

from __future__ import annotations

import math
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .config import MaskDecoderConfig, PromptEncoderConfig, Sam2Config
from .encoder import conv2d, layer_norm


# ------------------------------------------------------------- prompt encoder

def fourier_point_embed(coords: jnp.ndarray, pe_matrix: jnp.ndarray) -> jnp.ndarray:
    """coords in [0,1], shape (..., 2) → (..., hidden) (ref Sam2PositionalEmbedding)."""
    c = 2.0 * coords - 1.0
    proj = (2.0 * math.pi) * (c @ pe_matrix)
    return jnp.concatenate([jnp.sin(proj), jnp.cos(proj)], axis=-1)


def embed_points(cfg: PromptEncoderConfig, p: Dict, points: jnp.ndarray,
                 labels: jnp.ndarray) -> jnp.ndarray:
    """points: (B, K, N, 2) pixel coords; labels: (B, K, N) in {-10,-1,0,1,2,3}.
    Returns (B, K, N, hidden). Caller appends the pad point when no boxes."""
    pts = (points + 0.5) / cfg.image_size
    emb = fourier_point_embed(pts, p["pe_matrix"])
    emb = jnp.where(labels[..., None] == -1, p["not_a_point"][None, None, None], emb)
    emb = jnp.where(labels[..., None] == -10, jnp.zeros_like(emb), emb)
    point_w = p["point_embed"][jnp.clip(labels, 0, None)]
    emb = emb + point_w * (labels >= 0)[..., None]
    return emb


def embed_boxes(cfg: PromptEncoderConfig, p: Dict, boxes: jnp.ndarray) -> jnp.ndarray:
    """boxes: (B, K, 4) → (B, K, 3, hidden): two corner embeds + pad point."""
    corners = (boxes + 0.5).reshape(*boxes.shape[:2], 2, 2) / cfg.image_size
    emb = fourier_point_embed(corners, p["pe_matrix"])       # (B, K, 2, H)
    emb = emb + jnp.stack([p["point_embed"][2], p["point_embed"][3]])
    pad = jnp.broadcast_to(p["not_a_point"], (*emb.shape[:2], 1, emb.shape[-1]))
    return jnp.concatenate([emb, pad], axis=2)


def embed_masks(cfg: PromptEncoderConfig, p: Dict, masks: jnp.ndarray
                ) -> jnp.ndarray:
    """Mask prompt → dense embedding (ref Sam2MaskEmbedding): masks
    (B, Hm, Wm, 1) at mask_input_size (4× the embedding grid) through
    conv2×2/s2 → LN(channels) → GELU → conv2×2/s2 → LN → GELU → conv1×1.
    NHWC layout: the channels-first LayerNorm becomes a last-axis norm."""
    x = conv2d(masks, p["mask_conv1_w"], p["mask_conv1_b"], stride=(2, 2))
    x = layer_norm(x, p["mask_ln1_w"], p["mask_ln1_b"], cfg.layer_norm_eps)
    x = jax.nn.gelu(x, approximate=False)
    x = conv2d(x, p["mask_conv2_w"], p["mask_conv2_b"], stride=(2, 2))
    x = layer_norm(x, p["mask_ln2_w"], p["mask_ln2_b"], cfg.layer_norm_eps)
    x = jax.nn.gelu(x, approximate=False)
    return conv2d(x, p["mask_conv3_w"], p["mask_conv3_b"])


def encode_prompts(cfg: PromptEncoderConfig, p: Dict,
                   points: Optional[jnp.ndarray], labels: Optional[jnp.ndarray],
                   boxes: Optional[jnp.ndarray], batch_size: int,
                   image_embedding_size: Tuple[int, int],
                   input_masks: Optional[jnp.ndarray] = None
                   ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Returns sparse (B, K, T, hidden) and dense (B, h, w, hidden) embeddings.

    Ref Sam2PromptEncoder.forward: points padded with one (0,0)/-1 point when no
    boxes; boxes appended after points; dense = mask embedding when a mask
    prompt (B, Hm, Wm, 1) is given, else the learned no-mask embedding.
    """
    sparse = None
    if points is not None:
        if boxes is None:   # pad point
            zeros = jnp.zeros((*points.shape[:2], 1, 2), points.dtype)
            points = jnp.concatenate([points, zeros], axis=2)
            labels = jnp.concatenate(
                [labels, -jnp.ones((*labels.shape[:2], 1), labels.dtype)], axis=2)
        sparse = embed_points(cfg, p, points, labels)
    if boxes is not None:
        box_emb = embed_boxes(cfg, p, boxes)
        sparse = box_emb if sparse is None else jnp.concatenate([sparse, box_emb], axis=2)
    h, w = image_embedding_size
    if input_masks is not None:
        dense = embed_masks(cfg, p, input_masks)
    else:
        dense = jnp.broadcast_to(p["no_mask"][None, None, None, :],
                                 (batch_size, h, w, p["no_mask"].shape[0]))
    return sparse, dense


def image_wide_positional_embedding(cfg: PromptEncoderConfig, p: Dict) -> np.ndarray:
    """(1, h, w, hidden) dense PE over the low-res grid (ref
    Sam2Model.get_image_wide_positional_embeddings)."""
    h, w = cfg.image_embedding_size
    ys = (np.arange(1, h + 1) - 0.5) / h
    xs = (np.arange(1, w + 1) - 0.5) / w
    grid = np.stack(np.meshgrid(xs, ys, indexing="xy"), axis=-1)  # (h, w, 2) x,y
    c = 2.0 * grid - 1.0
    pe = np.asarray(p["pe_matrix"])
    proj = (2.0 * math.pi) * (c @ pe)
    return np.concatenate([np.sin(proj), np.cos(proj)], axis=-1)[None].astype(pe.dtype)


# -------------------------------------------------------- two-way transformer

def _proj_attention(p: Dict, q, k, v, n_heads: int):
    """Sam2Attention: project q/k/v to internal dim, attend, project out.
    Shapes (B, K, L, hidden) with the point-batch folded into batch."""
    B, K, Lq, _ = q.shape
    Lk = k.shape[2]
    qf = (q @ p["q_w"] + p["q_b"]).reshape(B * K, Lq, -1)
    kf = (k @ p["k_w"] + p["k_b"]).reshape(B * K, Lk, -1)
    vf = (v @ p["v_w"] + p["v_b"]).reshape(B * K, Lk, -1)
    internal = qf.shape[-1]
    D = internal // n_heads
    qh = qf.reshape(B * K, Lq, n_heads, D)
    kh = kf.reshape(B * K, Lk, n_heads, D)
    vh = vf.reshape(B * K, Lk, n_heads, D)
    logits = jnp.einsum("bqhd,bkhd->bhqk", qh, kh,
                        preferred_element_type=jnp.float32) * (D ** -0.5)
    probs = jax.nn.softmax(logits, axis=-1).astype(q.dtype)
    out = jnp.einsum("bhqk,bkhd->bqhd", probs, vh).reshape(B * K, Lq, internal)
    return (out @ p["o_w"] + p["o_b"]).reshape(B, K, Lq, -1)


def _ffn(p: Dict, x, act=jax.nn.relu):
    """Sam2FeedForward num_layers=2, relu (decoder MLPs use relu)."""
    return act(x @ p["fc1_w"] + p["fc1_b"]) @ p["fc2_w"] + p["fc2_b"]


def _ln(x, p):
    return layer_norm(x, p["w"], p["b"], 1e-5)   # torch nn.LayerNorm default eps


def two_way_block(cfg: MaskDecoderConfig, p: Dict, queries, keys, query_pe, key_pe,
                  skip_first_layer_pe: bool):
    H = cfg.num_attention_heads
    if skip_first_layer_pe:
        # first layer: attention output REPLACES the queries (ref TwoWayAttentionBlock)
        queries = _proj_attention(p["self_attn"], queries, queries, queries, H)
    else:
        q = queries + query_pe
        queries = queries + _proj_attention(p["self_attn"], q, q, queries, H)
    queries = _ln(queries, p["ln1"])

    q = queries + query_pe
    k = keys + key_pe
    queries = queries + _proj_attention(p["cross_t2i"], q, k, keys, H)
    queries = _ln(queries, p["ln2"])

    queries = queries + _ffn(p["mlp"], queries)
    queries = _ln(queries, p["ln3"])

    q = queries + query_pe
    k = keys + key_pe
    keys = keys + _proj_attention(p["cross_i2t"], k, q, queries, H)
    keys = _ln(keys, p["ln4"])
    return queries, keys


def two_way_transformer(cfg: MaskDecoderConfig, p: Dict, point_embeddings,
                        image_embeddings, image_pe):
    """point_embeddings: (B, K, T, H); image_embeddings/pe: (B, K, HW, H)."""
    queries, keys = point_embeddings, image_embeddings
    for i, layer in enumerate(p["layers"]):
        queries, keys = two_way_block(cfg, layer, queries, keys,
                                      point_embeddings, image_pe,
                                      skip_first_layer_pe=(i == 0))
    q = queries + point_embeddings
    k = keys + image_pe
    queries = queries + _proj_attention(p["final_attn"], q, k, keys,
                                        cfg.num_attention_heads)
    queries = _ln(queries, p["ln_final"])
    return queries, keys


# --------------------------------------------------------------- mask decoder

def _ffn_n(p: Dict, x, act=jax.nn.relu, sigmoid_output=False):
    """Sam2FeedForward with arbitrary depth: proj_in, hidden layers, proj_out."""
    h = act(x @ p["fc_in_w"] + p["fc_in_b"])
    for layer in p.get("hidden", []):
        h = act(h @ layer["w"] + layer["b"])
    out = h @ p["fc_out_w"] + p["fc_out_b"]
    return jax.nn.sigmoid(out) if sigmoid_output else out


def conv_transpose2x(x: jnp.ndarray, kernel: jnp.ndarray, bias) -> jnp.ndarray:
    """2x2 stride-2 transposed conv, NHWC. Kernel stored (kh, kw, out, in) —
    the forward-conv HWIO layout required by transpose_kernel=True (exact torch
    ConvTranspose2d parity, verified in tests)."""
    out = jax.lax.conv_transpose(
        x.astype(kernel.dtype), kernel, strides=(2, 2), padding="VALID",
        transpose_kernel=True, dimension_numbers=("NHWC", "HWIO", "NHWC"))
    return out + bias


def mask_decoder_forward(
    cfg: MaskDecoderConfig, p: Dict,
    image_embeddings: jnp.ndarray,        # (B, h, w, C) lowest-res FPN + dense prompt
    image_pe: jnp.ndarray,                # (1, h, w, C)
    sparse_prompts: jnp.ndarray,          # (B, K, T, C)
    high_res_feats: List[jnp.ndarray],    # [(B, 4h, 4w, C/8), (B, 2h, 2w, C/4)] (s0, s1)
    multimask_output: bool,
    training: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Returns (masks (B, K, M, 4h*?, ...), iou_pred (B, K, M), object_logits (B, K, 1))."""
    B, h, w, C = image_embeddings.shape
    K = sparse_prompts.shape[1]

    output_tokens = jnp.concatenate([p["obj_score_token"], p["iou_token"],
                                     p["mask_tokens"]], axis=0)     # (2+M, C)
    output_tokens = jnp.broadcast_to(output_tokens[None, None],
                                     (B, K, output_tokens.shape[0], C))
    tokens = jnp.concatenate([output_tokens, sparse_prompts], axis=2)

    img = image_embeddings.reshape(B, 1, h * w, C)
    img = jnp.broadcast_to(img, (B, K, h * w, C))
    pe = jnp.broadcast_to(image_pe.reshape(1, 1, h * w, C), (B, K, h * w, C))

    queries, keys = two_way_transformer(cfg, p["transformer"], tokens, img, pe)
    iou_token_out = queries[:, :, 1]
    mask_tokens_out = queries[:, :, 2:2 + cfg.num_mask_tokens]

    # upscale (per B*K image state)
    img_out = keys.reshape(B * K, h, w, C)
    s0, s1 = high_res_feats
    s0 = jnp.repeat(s0, K, axis=0)
    s1 = jnp.repeat(s1, K, axis=0)
    up = conv_transpose2x(img_out, p["upscale1_w"], p["upscale1_b"]) + s1
    up = jax.nn.gelu(layer_norm(up, p["upscale_ln_w"], p["upscale_ln_b"], 1e-6),
                     approximate=False)
    up = jax.nn.gelu(conv_transpose2x(up, p["upscale2_w"], p["upscale2_b"]) + s0,
                     approximate=False)
    H4, W4 = up.shape[1:3]
    up_flat = up.reshape(B, K, H4 * W4, -1)

    hyper = jnp.stack([_ffn_n(p["hyper_mlps"][i], mask_tokens_out[:, :, i])
                       for i in range(cfg.num_mask_tokens)], axis=2)  # (B,K,M,C/8)
    masks = jnp.einsum("bkmc,bkpc->bkmp", hyper, up_flat).reshape(
        B, K, cfg.num_mask_tokens, H4, W4)

    iou_pred = _ffn_n(p["iou_head"], iou_token_out, sigmoid_output=True)  # (B,K,M)
    object_logits = _ffn_n(p["obj_head"], queries[:, :, 0])               # (B,K,1)

    if multimask_output:
        masks = masks[:, :, 1:]
        iou_pred = iou_pred[:, :, 1:]
    elif cfg.dynamic_multimask_via_stability and not training:
        masks, iou_pred = _dynamic_multimask(cfg, masks, iou_pred)
    else:
        masks = masks[:, :, :1]
        iou_pred = iou_pred[:, :, :1]
    return masks, iou_pred, object_logits


def _stability_scores(cfg: MaskDecoderConfig, mask_logits: jnp.ndarray) -> jnp.ndarray:
    flat = mask_logits.reshape(*mask_logits.shape[:-2], -1)
    d = cfg.dynamic_multimask_stability_delta
    area_i = jnp.sum(flat > d, axis=-1).astype(jnp.float32)
    area_u = jnp.sum(flat > -d, axis=-1).astype(jnp.float32)
    return jnp.where(area_u > 0, area_i / area_u, 1.0)


def _dynamic_multimask(cfg: MaskDecoderConfig, masks, iou_pred):
    """Single-mask output falls back to the best multimask when unstable
    (ref Sam2MaskDecoder._dynamic_multimask_via_stability)."""
    multi = masks[:, :, 1:]
    multi_iou = iou_pred[:, :, 1:]
    best = jnp.argmax(multi_iou, axis=-1)                               # (B, K)
    best_mask = jnp.take_along_axis(multi, best[:, :, None, None, None], axis=2)
    best_iou = jnp.take_along_axis(multi_iou, best[:, :, None], axis=2)
    single = masks[:, :, :1]
    single_iou = iou_pred[:, :, :1]
    stable = _stability_scores(cfg, single) >= cfg.dynamic_multimask_stability_thresh
    out_mask = jnp.where(stable[..., None, None], single, best_mask)
    out_iou = jnp.where(stable, single_iou, best_iou)
    return out_mask, out_iou
