"""HF checkpoint → JAX params loader for Qwen2.5-VL.

Plays the role of the reference's mcore_adapter converter stack (template.py name
mapping + dist_converter TP/PP splitting, SURVEY.md §2.5): HF safetensors stream
into the single global pytree; GSPMD handles distribution, so no per-rank shard
surgery is needed — `jax.device_put(params, shardings)` replaces DistModuleConverter.

Linear weights transpose HF (out, in) → (in, out) so forward is `x @ w`.
Handles both name layouts: legacy ("model.layers.*", "visual.*") and
transformers>=4.52 ("model.language_model.*", "model.visual.*").
"""

from __future__ import annotations

import json
import os
import re
from typing import Callable, Dict, Iterator, Tuple

import jax.numpy as jnp
import numpy as np

from .config import Qwen25VLConfig


def _normalize(name: str) -> str:
    name = re.sub(r"^model\.language_model\.", "model.", name)
    name = re.sub(r"^model\.visual\.", "visual.", name)
    return name


def iter_safetensors(path: str) -> Iterator[Tuple[str, np.ndarray]]:
    """Stream (name, array) from all *.safetensors files under `path`."""
    from safetensors import safe_open
    index = os.path.join(path, "model.safetensors.index.json")
    if os.path.exists(index):
        with open(index) as f:
            files = sorted(set(json.load(f)["weight_map"].values()))
    else:
        files = sorted(f for f in os.listdir(path) if f.endswith(".safetensors"))
    for fname in files:
        with safe_open(os.path.join(path, fname), framework="np") as f:
            for key in f.keys():
                yield key, f.get_tensor(key)


def load_params(config: Qwen25VLConfig, tensors: Iterator[Tuple[str, np.ndarray]],
                dtype=jnp.bfloat16, with_vision: bool = True) -> Dict:
    """Assemble the params pytree from an HF tensor stream.

    Layer tensors are collected per-layer then stacked along a leading `layers`
    axis (the scan axis in text.py/vision.py).
    """
    t, v = config.text, config.vision
    L, VD = t.num_hidden_layers, v.depth
    txt: Dict[str, list] = {}
    vis: Dict[str, list] = {}
    params: Dict = {"layers": {}, }
    vision: Dict = {"blocks": {}}

    txt_layer_map = {
        "input_layernorm.weight": ("input_ln", False),
        "post_attention_layernorm.weight": ("post_ln", False),
        "self_attn.q_proj.weight": ("q_w", True), "self_attn.q_proj.bias": ("q_b", False),
        "self_attn.k_proj.weight": ("k_w", True), "self_attn.k_proj.bias": ("k_b", False),
        "self_attn.v_proj.weight": ("v_w", True), "self_attn.v_proj.bias": ("v_b", False),
        "self_attn.o_proj.weight": ("o_w", True),
        "self_attn.q_norm.weight": ("q_norm", False),
        "self_attn.k_norm.weight": ("k_norm", False),
        "mlp.gate_proj.weight": ("gate_w", True),
        "mlp.up_proj.weight": ("up_w", True),
        "mlp.down_proj.weight": ("down_w", True),
        # qwen2_moe shared expert (sigmoid-gated dense MLP beside the experts)
        "mlp.shared_expert.gate_proj.weight": ("s_gate_w", True),
        "mlp.shared_expert.up_proj.weight": ("s_up_w", True),
        "mlp.shared_expert.down_proj.weight": ("s_down_w", True),
        "mlp.shared_expert_gate.weight": ("sgate_w", True),
    }
    vis_layer_map = {
        "norm1.weight": ("norm1", False), "norm2.weight": ("norm2", False),
        "attn.qkv.weight": ("qkv_w", True), "attn.qkv.bias": ("qkv_b", False),
        "attn.proj.weight": ("proj_w", True), "attn.proj.bias": ("proj_b", False),
        "mlp.gate_proj.weight": ("gate_w", True), "mlp.gate_proj.bias": ("gate_b", False),
        "mlp.up_proj.weight": ("up_w", True), "mlp.up_proj.bias": ("up_b", False),
        "mlp.down_proj.weight": ("down_w", True), "mlp.down_proj.bias": ("down_b", False),
        # qwen2_vl variant: LayerNorm biases + fc1/fc2 MLP
        "norm1.bias": ("norm1_b", False), "norm2.bias": ("norm2_b", False),
        "mlp.fc1.weight": ("fc1_w", True), "mlp.fc1.bias": ("fc1_b", False),
        "mlp.fc2.weight": ("fc2_w", True), "mlp.fc2.bias": ("fc2_b", False),
    }

    def put_layer(store, layer_idx, key, arr, transpose):
        a = arr.T if transpose else arr
        store.setdefault(key, [None] * (L if store is txt else VD))[layer_idx] = a

    # MoE (qwen3_moe / mixtral): per-(layer, expert) tensors stacked (L, E, …)
    E = t.n_experts
    moe: Dict[str, list] = {}
    moe_expert_map = {   # HF suffix → (our key, mixtral w-name)
        "gate_proj": ("gate_w", "w1"), "up_proj": ("up_w", "w3"),
        "down_proj": ("down_w", "w2")}
    mixtral_names = {w: key for key, w in moe_expert_map.values()}

    def put_expert(layer_idx, expert_idx, key, arr):
        moe.setdefault(key, [[None] * E for _ in range(L)])
        moe[key][layer_idx][expert_idx] = arr.T

    for name, arr in tensors:
        name = _normalize(name)
        arr = np.asarray(arr)
        if name == "model.embed_tokens.weight":
            params["embed"] = arr
        elif name == "model.norm.weight":
            params["final_ln"] = arr
        elif name == "lm_head.weight":
            if not t.tie_word_embeddings:
                params["lm_head"] = arr.T
        elif name.startswith("model.layers."):
            m = re.match(r"model\.layers\.(\d+)\.(.+)", name)
            i, rest = int(m.group(1)), m.group(2)
            if rest in txt_layer_map:
                key, tr = txt_layer_map[rest]
                put_layer(txt, i, key, arr, tr)
            elif E and rest in ("mlp.gate.weight", "block_sparse_moe.gate.weight"):
                put_layer(txt, i, "router_w", arr, True)
            elif E and (m2 := re.match(
                    r"mlp\.experts\.(\d+)\.(gate_proj|up_proj|down_proj)\.weight",
                    rest)):
                put_expert(i, int(m2.group(1)), moe_expert_map[m2.group(2)][0], arr)
            elif E and (m2 := re.match(
                    r"block_sparse_moe\.experts\.(\d+)\.(w1|w2|w3)\.weight", rest)):
                put_expert(i, int(m2.group(1)), mixtral_names[m2.group(2)], arr)
        elif with_vision and name.startswith("visual."):
            rest = name[len("visual."):]
            if rest == "patch_embed.proj.weight":
                vision["patch_embed_w"] = arr.reshape(arr.shape[0], -1).T
            elif rest == "merger.ln_q.weight":
                vision["merger_ln_q"] = arr
            elif rest == "merger.ln_q.bias":   # qwen2_vl LayerNorm merger
                vision["merger_ln_q_b"] = arr
            elif rest == "merger.mlp.0.weight":
                vision["merger_fc1_w"] = arr.T
            elif rest == "merger.mlp.0.bias":
                vision["merger_fc1_b"] = arr
            elif rest == "merger.mlp.2.weight":
                vision["merger_fc2_w"] = arr.T
            elif rest == "merger.mlp.2.bias":
                vision["merger_fc2_b"] = arr
            elif rest.startswith("blocks."):
                m = re.match(r"blocks\.(\d+)\.(.+)", rest)
                i, brest = int(m.group(1)), m.group(2)
                if brest in vis_layer_map:
                    key, tr = vis_layer_map[brest]
                    put_layer(vis, i, key, arr, tr)

    # llama-family checkpoints ship no qkv biases — fill zeros
    H, Hkv, D = t.num_attention_heads, t.num_key_value_heads, t.head_dim
    bias_shapes = {"q_b": H * D, "k_b": Hkv * D, "v_b": Hkv * D}
    for key, width in bias_shapes.items():
        if key not in txt:
            txt[key] = [np.zeros(width, np.float32)] * L
    for key, lst in txt.items():
        assert all(x is not None for x in lst), f"missing text layer tensors for {key}"
        params["layers"][key] = jnp.asarray(np.stack(lst), dtype)
    for key, layers in moe.items():
        assert all(x is not None for row in layers for x in row), \
            f"missing expert tensors for {key}"
        params["layers"][key] = jnp.asarray(
            np.stack([np.stack(row) for row in layers]), dtype)   # (L, E, in, out)
    for key, lst in vis.items():
        assert all(x is not None for x in lst), f"missing vision layer tensors for {key}"
        vision["blocks"][key] = jnp.asarray(np.stack(lst), dtype)
    for key in list(params.keys()):
        if key != "layers" and isinstance(params[key], np.ndarray):
            params[key] = jnp.asarray(params[key], dtype)
    if with_vision:
        for key in list(vision.keys()):
            if key != "blocks" and isinstance(vision[key], np.ndarray):
                vision[key] = jnp.asarray(vision[key], dtype)
        params["vision"] = vision
    return params


def load_pretrained(path: str, dtype=jnp.bfloat16, with_vision: bool = True
                    ) -> Tuple[Qwen25VLConfig, Dict]:
    config = Qwen25VLConfig.from_pretrained(path)
    params = load_params(config, iter_safetensors(path), dtype, with_vision)
    return config, params


def load_from_torch_state_dict(config: Qwen25VLConfig, state_dict, dtype=jnp.float32,
                               with_vision: bool = True) -> Dict:
    """For golden tests: load from an in-memory torch model state_dict."""
    def gen():
        for k, v in state_dict.items():
            yield k, v.detach().to("cpu").float().numpy()
    return load_params(config, gen(), dtype, with_vision)
