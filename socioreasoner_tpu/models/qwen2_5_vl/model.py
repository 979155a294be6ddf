"""Qwen2.5-VL full model: embeddings + vision scatter + decoder + logits.

Replaces the reference's Megatron `Qwen2_5_VLModel`
(`mcore_adapter/models/qwen2_5_vl/modeling_qwen2_5_vl.py:186-533`). The reference
computes per-TP/CP-rank ranges and scatter-merges ViT outputs into sharded token
streams (`construct_inputs_embeds` :213-315); under GSPMD we scatter into the
global (B, L, hidden) stream with a static-shape gather — the partitioner owns
distribution.

Params pytree layout:
  {"embed": (V, H), "layers": stacked dicts, "final_ln": (H,),
   "lm_head": (H, V) (absent if tied), "vision": {...}}
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .config import Qwen25VLConfig
from .rope import make_inv_freq, mrope_channel_axis, mrope_cos_sin
from .text import text_decoder
from .vision import vision_tower


def scatter_image_embeds(input_ids: jnp.ndarray, token_embeds: jnp.ndarray,
                         image_embeds: jnp.ndarray, image_token_id: int) -> jnp.ndarray:
    """Replace embeddings at image-token positions with ViT outputs.

    image_embeds: (S_img, hidden) rows in batch-major image-token order. Static
    shapes: the i-th image token (flattened batch-major) takes row i.
    """
    B, L = input_ids.shape
    flat_ids = input_ids.reshape(-1)
    mask = flat_ids == image_token_id
    row = jnp.cumsum(mask) - 1                       # index into image_embeds
    row = jnp.clip(row, 0, image_embeds.shape[0] - 1)
    gathered = image_embeds[row]
    flat = jnp.where(mask[:, None], gathered, token_embeds.reshape(B * L, -1))
    return flat.reshape(B, L, -1)


def forward(
    config: Qwen25VLConfig,
    params: Dict,
    input_ids: jnp.ndarray,            # (B, L)
    position_ids: jnp.ndarray,         # (B, 3, L) M-RoPE ids
    attention_mask: Optional[jnp.ndarray] = None,
    *,
    vision_inputs: Optional[Dict] = None,   # device arrays from vision_host_inputs
    image_embeds: Optional[jnp.ndarray] = None,  # precomputed (S_img, hidden)
    cache: Optional[Dict] = None,
    cache_positions: Optional[jnp.ndarray] = None,
    remat: bool = False,
    logits: bool = True,
    use_flash: bool = False,
    cp=None,
    pp=None,
    tp=None,   # (mesh, axis): head-shard the cache-path pallas kernels (decode engine TP)
    act_quant: bool = False,   # w8a8 matmuls on the cached multi-token pass
) -> Tuple[jnp.ndarray, Optional[Dict]]:
    """Returns (logits or hidden, new_cache).

    With cp (parallel.context_parallel.CPConfig): embeddings + image scatter
    happen in the ORIGINAL sequence order, then everything is permuted into
    the zigzag layout (ref modeling_qwen2_5_vl.py:452-480 — balances causal
    ring-attention work across cp ranks), the seq dim is sharded over the cp
    mesh axis, and the decoder runs ring attention. **Returned logits are in
    PERMUTED order** — align targets with cp.perm(L) and map results back
    with cp.inv_perm(L) (cheap (B, L) gathers; the (B, L, V) logits never
    move). The reference's loss-side counterpart is
    parallel_functions/context_parallel.py:6-35 (gather with backward)."""
    tcfg = config.text
    embeds = params["embed"][input_ids]

    if image_embeds is None and vision_inputs is not None:
        vi = vision_inputs
        image_embeds = vision_tower(
            config.vision, params["vision"], vi["patches"], vi["cos"], vi["sin"],
            vi["window_seg"], vi["full_seg"], vi["is_full_layer"])[vi["inv_perm"]]
    if image_embeds is not None:
        embeds = scatter_image_embeds(input_ids, embeds, image_embeds.astype(embeds.dtype),
                                      config.image_token_id)

    inv_freq = jnp.asarray(make_inv_freq(tcfg.head_dim, tcfg.rope_theta))
    chan_axis = mrope_channel_axis(tcfg.head_dim, tcfg.mrope_section)
    cos, sin = mrope_cos_sin(position_ids, inv_freq, chan_axis)

    # Causality follows SEQUENCE order (arange), not M-RoPE values: image tokens
    # share equal t-positions, so masking by position value would be bidirectional.
    q_positions = None
    if cp is not None and cache is None:
        from jax.sharding import NamedSharding, PartitionSpec as P
        B, L = input_ids.shape
        perm = jnp.asarray(cp.perm(L))
        q_positions = jnp.broadcast_to(perm[None], (B, L))
        shard3 = NamedSharding(cp.mesh, P(("dp", "fsdp"), None, None))
        # batch-shard the pre-permute embeds so the zigzag gather stays local
        # per batch shard (one gather, no involuntary full remat), then pin the
        # permuted layout with the seq dim over the cp axis
        embeds = jax.lax.with_sharding_constraint(embeds, shard3)
        embeds = embeds[:, perm]
        cos, sin = cos[:, perm], sin[:, perm]
        if attention_mask is not None:
            attention_mask = attention_mask[:, perm]
        embeds = jax.lax.with_sharding_constraint(
            embeds, NamedSharding(cp.mesh, P(("dp", "fsdp"), cp.axis, None)))

    hidden, new_cache = text_decoder(
        tcfg, params, embeds, cos, sin, attention_mask,
        q_positions=q_positions, cache=cache, cache_positions=cache_positions,
        remat=remat, use_flash=use_flash, cp=cp if cache is None else None,
        pp=pp if cache is None else None, tp=tp if cache is not None else None,
        act_quant=act_quant)
    if not logits:
        return hidden, new_cache
    from ...ops.quant import head_logits
    return head_logits(params, hidden), new_cache


# ------------------------------------------------------------------ random init

def init_params(config: Qwen25VLConfig, key: jax.Array, dtype=jnp.float32,
                with_vision: bool = True) -> Dict:
    """Random init with HF-compatible shapes (tests / from-scratch training)."""
    t, v = config.text, config.vision
    keys = iter(jax.random.split(key, 64))

    def dense(k, shape, scale=0.02):
        return (jax.random.normal(k, shape) * scale).astype(dtype)

    H, D, Hkv = t.num_attention_heads, t.head_dim, t.num_key_value_heads
    L = t.num_hidden_layers

    def stack(shape, scale=0.02):
        return dense(next(keys), (L,) + shape, scale)

    params = {
        "embed": dense(next(keys), (t.vocab_size, t.hidden_size)),
        "final_ln": jnp.ones((t.hidden_size,), dtype),
        "layers": {
            "input_ln": jnp.ones((L, t.hidden_size), dtype),
            "post_ln": jnp.ones((L, t.hidden_size), dtype),
            "q_w": stack((t.hidden_size, H * D)), "q_b": jnp.zeros((L, H * D), dtype),
            "k_w": stack((t.hidden_size, Hkv * D)), "k_b": jnp.zeros((L, Hkv * D), dtype),
            "v_w": stack((t.hidden_size, Hkv * D)), "v_b": jnp.zeros((L, Hkv * D), dtype),
            "o_w": stack((H * D, t.hidden_size)),
        },
    }
    if t.n_experts:   # MoE family: routed expert stacks (L, E, in, out)
        E = t.n_experts
        params["layers"].update({
            "router_w": stack((t.hidden_size, E)),
            "gate_w": stack((E, t.hidden_size, t.intermediate_size)),
            "up_w": stack((E, t.hidden_size, t.intermediate_size)),
            "down_w": stack((E, t.intermediate_size, t.hidden_size)),
        })
        if t.shared_expert_intermediate:   # qwen2_moe shared MLP + sigmoid gate
            Is = t.shared_expert_intermediate
            params["layers"].update({
                "s_gate_w": stack((t.hidden_size, Is)),
                "s_up_w": stack((t.hidden_size, Is)),
                "s_down_w": stack((Is, t.hidden_size)),
                "sgate_w": stack((t.hidden_size, 1)),
            })
    else:
        params["layers"].update({
            "gate_w": stack((t.hidden_size, t.intermediate_size)),
            "up_w": stack((t.hidden_size, t.intermediate_size)),
            "down_w": stack((t.intermediate_size, t.hidden_size)),
        })
    if t.use_qk_norm:
        params["layers"]["q_norm"] = jnp.ones((L, D), dtype)
        params["layers"]["k_norm"] = jnp.ones((L, D), dtype)
    if not t.tie_word_embeddings:
        params["lm_head"] = dense(next(keys), (t.hidden_size, t.vocab_size))
    if with_vision:
        vd = v.depth
        def vstack(shape, scale=0.02):
            return dense(next(keys), (vd,) + shape, scale)
        params["vision"] = {
            "patch_embed_w": dense(next(keys), (v.patch_input_dim, v.hidden_size)),
            "blocks": {
                "norm1": jnp.ones((vd, v.hidden_size), dtype),
                "norm2": jnp.ones((vd, v.hidden_size), dtype),
                "qkv_w": vstack((v.hidden_size, 3 * v.hidden_size)),
                "qkv_b": jnp.zeros((vd, 3 * v.hidden_size), dtype),
                "proj_w": vstack((v.hidden_size, v.hidden_size)),
                "proj_b": jnp.zeros((vd, v.hidden_size), dtype),
                "gate_w": vstack((v.hidden_size, v.intermediate_size)),
                "gate_b": jnp.zeros((vd, v.intermediate_size), dtype),
                "up_w": vstack((v.hidden_size, v.intermediate_size)),
                "up_b": jnp.zeros((vd, v.intermediate_size), dtype),
                "down_w": vstack((v.intermediate_size, v.hidden_size)),
                "down_b": jnp.zeros((vd, v.hidden_size), dtype),
            },
            "merger_ln_q": jnp.ones((v.hidden_size,), dtype),
            "merger_fc1_w": dense(next(keys), (v.spatial_merge_unit * v.hidden_size,
                                               v.spatial_merge_unit * v.hidden_size)),
            "merger_fc1_b": jnp.zeros((v.spatial_merge_unit * v.hidden_size,), dtype),
            "merger_fc2_w": dense(next(keys), (v.spatial_merge_unit * v.hidden_size,
                                               v.out_hidden_size)),
            "merger_fc2_b": jnp.zeros((v.out_hidden_size,), dtype),
        }
    return params
