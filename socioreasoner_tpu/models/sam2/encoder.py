"""SAM2 image encoder: Hiera backbone + FPN neck, functional JAX (NHWC).

Replaces the reference's torch SAM2 image-encoder dependency
(`roll/distributed/strategy/seg_strategy.py:26-72` set_image path; SURVEY.md
§2.10 item 4). TPU-first choices:
  * NHWC + lax.conv (HWIO kernels) — TPU-native conv layout.
  * Window attention via pure reshape/transpose partition (static shapes; every
    stage's H,W are compile-time constants for a fixed image size).
  * Windowed absolute position embeddings precomputed on host (incl. the
    torch-style bicubic interpolation, matched exactly for checkpoint parity).
"""

from __future__ import annotations

import math
from typing import Dict, List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .config import HieraConfig, Sam2Config


# ----------------------------------------------------- host: torch-style bicubic

def _cubic_kernel(t: np.ndarray, a: float = -0.75) -> np.ndarray:
    at = np.abs(t)
    w = np.where(at <= 1, (a + 2) * at ** 3 - (a + 3) * at ** 2 + 1,
                 np.where(at < 2, a * at ** 3 - 5 * a * at ** 2 + 8 * a * at - 4 * a, 0.0))
    return w


def bicubic_resize_hw(arr: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    """Separable bicubic (torch F.interpolate mode='bicubic', align_corners=False,
    a=-0.75, border-replicate). arr: (H, W, C)."""

    def resize_axis(x: np.ndarray, out_len: int) -> np.ndarray:
        # resize axis 0
        in_len = x.shape[0]
        if in_len == out_len:
            return x
        scale = in_len / out_len
        coord = (np.arange(out_len) + 0.5) * scale - 0.5
        base = np.floor(coord).astype(int)
        frac = coord - base
        taps = np.stack([base - 1, base, base + 1, base + 2], axis=1)  # (out, 4)
        weights = _cubic_kernel(frac[:, None] - np.array([-1, 0, 1, 2])[None, :])
        taps = np.clip(taps, 0, in_len - 1)
        gathered = x[taps.reshape(-1)].reshape(out_len, 4, *x.shape[1:])
        w = weights.reshape(out_len, 4, *([1] * (x.ndim - 1)))
        return (gathered * w).sum(axis=1)

    out = resize_axis(arr, out_h)
    out = np.moveaxis(resize_axis(np.moveaxis(out, 1, 0), out_w), 0, 1)
    return out


def hiera_pos_embed(params: Dict, cfg: HieraConfig, h: int, w: int) -> np.ndarray:
    """(1, h, w, C) absolute pos embed: bicubic-resized background + tiled window
    embed (ref Sam2HieraDetModel._get_pos_embed)."""
    bg = np.asarray(params["pos_embed"])          # (1, C, bgH, bgW) torch layout
    win = np.asarray(params["pos_embed_window"])  # (1, C, ws, ws)
    bg_hwc = np.transpose(bg[0], (1, 2, 0))       # (bgH, bgW, C)
    resized = bicubic_resize_hw(bg_hwc.astype(np.float64), h, w)
    win_hwc = np.transpose(win[0], (1, 2, 0))
    ws_h, ws_w = win_hwc.shape[:2]
    tiled = np.tile(win_hwc, (h // ws_h, w // ws_w, 1))
    return (resized + tiled)[None].astype(bg.dtype)


# --------------------------------------------------------------- device: layers

def layer_norm(x: jnp.ndarray, w: jnp.ndarray, b: jnp.ndarray, eps: float = 1e-6):
    xf = x.astype(jnp.float32)
    mean = xf.mean(axis=-1, keepdims=True)
    var = ((xf - mean) ** 2).mean(axis=-1, keepdims=True)
    out = (xf - mean) * jax.lax.rsqrt(var + eps)
    return (out * w + b).astype(x.dtype)


def conv2d(x: jnp.ndarray, kernel: jnp.ndarray, bias=None, stride=(1, 1),
           padding=((0, 0), (0, 0))) -> jnp.ndarray:
    """NHWC conv; kernel HWIO."""
    out = jax.lax.conv_general_dilated(
        x, kernel, window_strides=stride, padding=padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    if bias is not None:
        out = out + bias
    return out


def gelu_exact(x):
    return jax.nn.gelu(x, approximate=False)


def mlp2(x, p, act=gelu_exact):
    """Sam2FeedForward with num_layers=2: proj_in → act → proj_out."""
    return act(x @ p["fc1_w"] + p["fc1_b"]) @ p["fc2_w"] + p["fc2_b"]


def _window_partition(x: jnp.ndarray, ws: int) -> Tuple[jnp.ndarray, Tuple[int, int]]:
    """(B, H, W, C) → (B*nW, ws, ws, C) with bottom/right zero pad."""
    B, H, W, C = x.shape
    pad_h = (-H) % ws
    pad_w = (-W) % ws
    if pad_h or pad_w:
        x = jnp.pad(x, ((0, 0), (0, pad_h), (0, pad_w), (0, 0)))
    Hp, Wp = H + pad_h, W + pad_w
    x = x.reshape(B, Hp // ws, ws, Wp // ws, ws, C)
    x = x.transpose(0, 1, 3, 2, 4, 5).reshape(-1, ws, ws, C)
    return x, (Hp, Wp)


def _window_unpartition(x: jnp.ndarray, ws: int, pad_hw: Tuple[int, int],
                        hw: Tuple[int, int]) -> jnp.ndarray:
    Hp, Wp = pad_hw
    H, W = hw
    B = x.shape[0] // (Hp * Wp // ws // ws)
    x = x.reshape(B, Hp // ws, Wp // ws, ws, ws, -1)
    x = x.transpose(0, 1, 3, 2, 4, 5).reshape(B, Hp, Wp, -1)
    return x[:, :H, :W]


def _max_pool2(x: jnp.ndarray, stride: Tuple[int, int]) -> jnp.ndarray:
    """(B, H, W, C) max-pool kernel==stride (Hiera q-pool)."""
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max,
        window_dimensions=(1, stride[0], stride[1], 1),
        window_strides=(1, stride[0], stride[1], 1), padding="VALID")


def _attention(q, k, v, n_heads: int, scale: float):
    """(B, Lq, C) x (B, Lk, C) multi-head attention, f32 softmax."""
    B, Lq, C = q.shape
    Lk = k.shape[1]
    D = C // n_heads
    q = q.reshape(B, Lq, n_heads, D)
    k = k.reshape(B, Lk, n_heads, D)
    v = v.reshape(B, Lk, n_heads, D)
    logits = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                        preferred_element_type=jnp.float32) * scale
    probs = jax.nn.softmax(logits, axis=-1).astype(q.dtype)
    out = jnp.einsum("bhqk,bkhd->bqhd", probs, v)
    return out.reshape(B, Lq, C)


def multiscale_block(cfg: HieraConfig, p: Dict, x: jnp.ndarray, *,
                     dim: int, dim_out: int, n_heads: int, window_size: int,
                     query_stride) -> jnp.ndarray:
    """One Hiera block (ref Sam2MultiScaleBlock). x: (B, H, W, dim)."""
    residual = x
    h = layer_norm(x, p["ln1_w"], p["ln1_b"], cfg.layer_norm_eps)
    if dim != dim_out:
        proj = h @ p["proj_w"] + p["proj_b"]
        residual = _max_pool2(proj, query_stride) if query_stride else proj

    B, H, W, _ = h.shape
    ws = window_size
    if ws > 0:
        h, pad_hw = _window_partition(h, ws)

    # attention with optional q-pool (ref Sam2MultiScaleAttention)
    bsz, hh, ww, _ = h.shape
    qkv = (h @ p["qkv_w"] + p["qkv_b"]).reshape(bsz, hh * ww, 3, dim_out)
    q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
    if query_stride:
        q = _max_pool2(q.reshape(bsz, hh, ww, dim_out), query_stride)
        hh, ww = q.shape[1:3]
        q = q.reshape(bsz, hh * ww, dim_out)
    scale = (dim_out // n_heads) ** -0.5
    attn = _attention(q, k, v, n_heads, scale)
    attn = attn.reshape(bsz, hh, ww, dim_out) @ p["o_w"] + p["o_b"]
    h = attn

    if query_stride:
        ws_eff = ws // query_stride[0] if ws > 0 else 0
        Hn, Wn = residual.shape[1:3]
        if ws > 0:
            pad_hw = (Hn + (-Hn) % ws_eff, Wn + (-Wn) % ws_eff)
            h = _window_unpartition(h, ws_eff, pad_hw, (Hn, Wn))
    elif ws > 0:
        h = _window_unpartition(h, ws, pad_hw, (H, W))

    x = residual + h
    h2 = layer_norm(x, p["ln2_w"], p["ln2_b"], cfg.layer_norm_eps)
    return x + mlp2(h2, p["mlp"])


def hiera_forward(cfg: HieraConfig, params: Dict, pixel_values: jnp.ndarray,
                  pos_embed: jnp.ndarray) -> List[jnp.ndarray]:
    """pixel_values: (B, H, W, 3) → list of per-stage features (B, h, w, c)."""
    x = conv2d(pixel_values, params["patch_w"], params["patch_b"],
               stride=cfg.patch_stride,
               padding=((cfg.patch_padding[0],) * 2, (cfg.patch_padding[1],) * 2))
    x = x + pos_embed.astype(x.dtype)

    outputs = []
    block_idx = 0
    for stage_idx, n_blocks in enumerate(cfg.blocks_per_stage):
        for bi in range(n_blocks):
            first = stage_idx > 0 and bi == 0
            dim = cfg.embed_dim_per_stage[stage_idx - 1] if first else cfg.embed_dim_per_stage[stage_idx]
            dim_out = cfg.embed_dim_per_stage[stage_idx]
            ws = cfg.window_size_per_stage[stage_idx - 1] if first else cfg.window_size_per_stage[stage_idx]
            if block_idx in cfg.global_attention_blocks:
                ws = 0
            qs = cfg.query_stride if (0 < stage_idx <= cfg.num_query_pool_stages and bi == 0) else None
            x = multiscale_block(cfg, params["blocks"][block_idx], x,
                                 dim=dim, dim_out=dim_out,
                                 n_heads=cfg.num_heads_per_stage[stage_idx],
                                 window_size=ws, query_stride=qs)
            block_idx += 1
        outputs.append(x)
    return outputs


# --------------------------------------------------------------------- FPN neck

def sine_position_encoding(h: int, w: int, num_pos_feats: int,
                           temperature: float = 10000.0) -> np.ndarray:
    """(1, h, w, 2*num_pos_feats) normalized sine PE (ref Sam2SinePositionEmbedding,
    normalize=True, scale=2π). Host-precomputable (no mask)."""
    scale = 2 * math.pi
    y = np.arange(1, h + 1, dtype=np.float64)[:, None] * np.ones((1, w))
    x = np.ones((h, 1)) * np.arange(1, w + 1, dtype=np.float64)[None, :]
    eps = 1e-6
    y = y / (h + eps) * scale
    x = x / (w + eps) * scale
    dim_t = np.arange(num_pos_feats, dtype=np.float64)
    dim_t = temperature ** (2 * (dim_t // 2) / num_pos_feats)
    pos_x = x[:, :, None] / dim_t
    pos_y = y[:, :, None] / dim_t
    pos_x = np.stack([np.sin(pos_x[:, :, 0::2]), np.cos(pos_x[:, :, 1::2])], axis=3
                     ).reshape(h, w, -1)
    pos_y = np.stack([np.sin(pos_y[:, :, 0::2]), np.cos(pos_y[:, :, 1::2])], axis=3
                     ).reshape(h, w, -1)
    return np.concatenate([pos_y, pos_x], axis=-1)[None]


def neck_forward(config: Sam2Config, params: Dict, stage_outputs: List[jnp.ndarray]
                 ) -> List[jnp.ndarray]:
    """FPN (ref Sam2VisionNeck): lateral 1x1 convs (index n-i for stage i),
    top-down nearest×2 additions for levels in fpn_top_down_levels. Returns
    features ordered low→high resolution reversed later by caller."""
    n = len(params["convs"]) - 1
    outs = []
    prev = None
    for i in range(n, -1, -1):
        lateral = conv2d(stage_outputs[i], params["convs"][n - i]["w"],
                         params["convs"][n - i]["b"])
        if i not in config.fpn_top_down_levels or i == n:
            prev = lateral
        else:
            up = jnp.repeat(jnp.repeat(prev, 2, axis=1), 2, axis=2)  # nearest ×2
            prev = lateral + up
        outs.append(prev)
    return outs  # index 0 = lowest resolution ... last = highest resolution


def image_encoder_forward(config: Sam2Config, params: Dict,
                          pixel_values: jnp.ndarray, pos_embed: jnp.ndarray
                          ) -> List[jnp.ndarray]:
    """Full encoder: returns `num_feature_levels` FPN maps ordered
    HIGH→LOW resolution (HF Sam2VisionModel ordering)."""
    stages = hiera_forward(config.hiera, params["hiera"], pixel_values, pos_embed)
    fpn = neck_forward(config, params["neck"], stages)
    return fpn[-config.num_feature_levels:][::-1]
