"""Params pytree → HF-format safetensors export.

The inverse of loader.py — plays mcore_adapter's `save_pretrained` /
all-gather-to-HF path (`models/model_factory.py:124-146`,
`models/converter/model_converter.py:170-255`) and the `tools/convert.py`
mcore↔HF CLI: checkpoints written here load in HF transformers (and back into
this framework), keeping the ecosystem interchange the reference guarantees.
"""

from __future__ import annotations

import json
import os
from typing import Dict, Iterator, Tuple

import numpy as np

from .config import Qwen25VLConfig


def _np(x, transpose: bool = False) -> np.ndarray:
    arr = np.asarray(x, dtype=np.float32) if str(x.dtype) == "bfloat16" else np.asarray(x)
    if transpose:
        arr = arr.T
    return np.ascontiguousarray(arr)   # safetensors requires C-contiguous


def iter_hf_tensors(config: Qwen25VLConfig, params: Dict
                    ) -> Iterator[Tuple[str, np.ndarray]]:
    """Yield (hf_name, array) — transposes back to HF (out, in) layouts and
    unstacks the scan-stacked layer arrays."""
    t, v = config.text, config.vision
    yield "model.embed_tokens.weight", _np(params["embed"])
    yield "model.norm.weight", _np(params["final_ln"])
    if "lm_head" in params:
        yield "lm_head.weight", _np(params["lm_head"], transpose=True)

    L = t.num_hidden_layers
    layer_map = [
        ("input_ln", "input_layernorm.weight", False),
        ("post_ln", "post_attention_layernorm.weight", False),
        ("q_w", "self_attn.q_proj.weight", True),
        ("q_b", "self_attn.q_proj.bias", False),
        ("k_w", "self_attn.k_proj.weight", True),
        ("k_b", "self_attn.k_proj.bias", False),
        ("v_w", "self_attn.v_proj.weight", True),
        ("v_b", "self_attn.v_proj.bias", False),
        ("o_w", "self_attn.o_proj.weight", True),
        ("gate_w", "mlp.gate_proj.weight", True),
        ("up_w", "mlp.up_proj.weight", True),
        ("down_w", "mlp.down_proj.weight", True),
        ("q_norm", "self_attn.q_norm.weight", False),
        ("k_norm", "self_attn.k_norm.weight", False),
    ]
    moe_keys = ("gate_w", "up_w", "down_w")
    for i in range(L):
        for key, hf_name, transpose in layer_map:
            if key not in params["layers"]:
                continue
            if not t.attention_bias and key in ("q_b", "k_b", "v_b"):
                continue            # llama-family: no bias tensors in HF ckpt
            if t.n_experts and key in moe_keys:
                continue            # expert stacks exported below
            yield f"model.layers.{i}.{hf_name}", _np(params["layers"][key][i], transpose)
        if t.n_experts:   # qwen-moe naming (mixtral ckpts reload via loader's
            # block_sparse_moe aliases; exports normalize to the qwen layout)
            yield (f"model.layers.{i}.mlp.gate.weight",
                   _np(params["layers"]["router_w"][i], transpose=True))
            for e in range(t.n_experts):
                for key, nm in (("gate_w", "gate_proj"), ("up_w", "up_proj"),
                                ("down_w", "down_proj")):
                    yield (f"model.layers.{i}.mlp.experts.{e}.{nm}.weight",
                           _np(params["layers"][key][i, e], transpose=True))
            if t.shared_expert_intermediate:
                for key, nm in (("s_gate_w", "shared_expert.gate_proj"),
                                ("s_up_w", "shared_expert.up_proj"),
                                ("s_down_w", "shared_expert.down_proj"),
                                ("sgate_w", "shared_expert_gate")):
                    yield (f"model.layers.{i}.mlp.{nm}.weight",
                           _np(params["layers"][key][i], transpose=True))

    if "vision" in params:
        vis = params["vision"]
        pw = _np(vis["patch_embed_w"], transpose=True)   # (hidden, in_features)
        yield "visual.patch_embed.proj.weight", np.ascontiguousarray(pw.reshape(
            v.hidden_size, v.in_channels, v.temporal_patch_size,
            v.patch_size, v.patch_size))
        yield "visual.merger.ln_q.weight", _np(vis["merger_ln_q"])
        if "merger_ln_q_b" in vis:     # qwen2_vl LayerNorm merger
            yield "visual.merger.ln_q.bias", _np(vis["merger_ln_q_b"])
        yield "visual.merger.mlp.0.weight", _np(vis["merger_fc1_w"], True)
        yield "visual.merger.mlp.0.bias", _np(vis["merger_fc1_b"])
        yield "visual.merger.mlp.2.weight", _np(vis["merger_fc2_w"], True)
        yield "visual.merger.mlp.2.bias", _np(vis["merger_fc2_b"])
        vmap = [
            ("norm1", "norm1.weight", False), ("norm2", "norm2.weight", False),
            ("norm1_b", "norm1.bias", False), ("norm2_b", "norm2.bias", False),
            ("qkv_w", "attn.qkv.weight", True), ("qkv_b", "attn.qkv.bias", False),
            ("proj_w", "attn.proj.weight", True), ("proj_b", "attn.proj.bias", False),
            ("gate_w", "mlp.gate_proj.weight", True), ("gate_b", "mlp.gate_proj.bias", False),
            ("up_w", "mlp.up_proj.weight", True), ("up_b", "mlp.up_proj.bias", False),
            ("down_w", "mlp.down_proj.weight", True), ("down_b", "mlp.down_proj.bias", False),
            ("fc1_w", "mlp.fc1.weight", True), ("fc1_b", "mlp.fc1.bias", False),
            ("fc2_w", "mlp.fc2.weight", True), ("fc2_b", "mlp.fc2.bias", False),
        ]
        for i in range(v.depth):
            for key, hf_name, transpose in vmap:
                if key not in vis["blocks"]:   # variant-specific tensors
                    continue
                yield f"visual.blocks.{i}.{hf_name}", _np(vis["blocks"][key][i], transpose)


def config_to_hf_dict(config: Qwen25VLConfig) -> Dict:
    t, v = config.text, config.vision
    moe = {}
    if t.n_experts:
        moe = {"num_experts": t.n_experts,
               "num_experts_per_tok": t.n_experts_per_tok,
               "norm_topk_prob": t.norm_topk_prob,
               "moe_intermediate_size": t.intermediate_size}
    return {
        **moe,
        "architectures": ["Qwen2_5_VLForConditionalGeneration"],
        "model_type": "qwen2_5_vl",
        "vocab_size": t.vocab_size,
        "hidden_size": t.hidden_size,
        "intermediate_size": t.intermediate_size,
        "num_hidden_layers": t.num_hidden_layers,
        "num_attention_heads": t.num_attention_heads,
        "num_key_value_heads": t.num_key_value_heads,
        "head_dim": t.head_dim,
        "max_position_embeddings": t.max_position_embeddings,
        "rms_norm_eps": t.rms_norm_eps,
        "rope_theta": t.rope_theta,
        "rope_scaling": {"type": "mrope", "mrope_section": list(t.mrope_section)},
        "tie_word_embeddings": t.tie_word_embeddings,
        "image_token_id": config.image_token_id,
        "video_token_id": config.video_token_id,
        "vision_start_token_id": config.vision_start_token_id,
        "bos_token_id": config.bos_token_id,
        "eos_token_id": config.eos_token_id,
        "vision_config": {
            "depth": v.depth, "hidden_size": v.hidden_size,
            "intermediate_size": v.intermediate_size, "num_heads": v.num_heads,
            "in_channels": v.in_channels, "patch_size": v.patch_size,
            "temporal_patch_size": v.temporal_patch_size,
            "spatial_merge_size": v.spatial_merge_size,
            "out_hidden_size": v.out_hidden_size, "window_size": v.window_size,
            "fullatt_block_indexes": list(v.fullatt_block_indexes),
            "tokens_per_second": v.tokens_per_second,
        },
    }


def save_pretrained(config: Qwen25VLConfig, params: Dict, path: str,
                    max_shard_bytes: int = 4 * 1024 ** 3):
    """Write config.json + sharded model safetensors (HF layout)."""
    from safetensors.numpy import save_file
    os.makedirs(path, exist_ok=True)
    with open(os.path.join(path, "config.json"), "w") as f:
        json.dump(config_to_hf_dict(config), f, indent=2)

    shards: list = [{}]
    sizes = [0]
    weight_map: Dict[str, str] = {}
    for name, arr in iter_hf_tensors(config, params):
        nbytes = arr.nbytes
        if sizes[-1] + nbytes > max_shard_bytes and shards[-1]:
            shards.append({})
            sizes.append(0)
        shards[-1][name] = arr
        sizes[-1] += nbytes
    n = len(shards)
    for i, shard in enumerate(shards):
        fname = (f"model-{i + 1:05d}-of-{n:05d}.safetensors" if n > 1
                 else "model.safetensors")
        save_file(shard, os.path.join(path, fname))
        for name in shard:
            weight_map[name] = fname
    if n > 1:
        with open(os.path.join(path, "model.safetensors.index.json"), "w") as f:
            json.dump({"metadata": {"total_size": sum(sizes)},
                       "weight_map": weight_map}, f)
