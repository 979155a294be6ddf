"""Sharding rules: PartitionSpecs for the Qwen2.5-VL param pytree and batches.

Replaces the reference's Megatron TP/PP/CP process-group machinery
(`mcore_adapter/models/converter/dist_converter.py` splits weights per rank;
`initialize.py:37-70` builds the groups). Here: one global pytree + NamedSharding;
GSPMD inserts the collectives.

Megatron-equivalent layout on the ("dp","fsdp","sp","tp") mesh:
  column-parallel (q/k/v, gate/up, vocab embed) → output dim over "tp"
  row-parallel (o_proj, down_proj)              → input dim over "tp"
  everything else sharded over "fsdp" on the largest remaining dim (ZeRO-3-style)
  batch axes over ("dp","fsdp")
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def _maybe(axis_size_ok: bool, spec: P) -> P:
    return spec if axis_size_ok else P()


def text_layer_specs() -> Dict[str, P]:
    """Specs for the stacked text layers (leading axis = layer)."""
    return {
        "input_ln": P(), "post_ln": P(),
        "q_w": P(None, "fsdp", "tp"), "q_b": P(None, "tp"),
        "k_w": P(None, "fsdp", "tp"), "k_b": P(None, "tp"),
        "v_w": P(None, "fsdp", "tp"), "v_b": P(None, "tp"),
        "o_w": P(None, "tp", "fsdp"),
        "gate_w": P(None, "fsdp", "tp"),
        "up_w": P(None, "fsdp", "tp"),
        "down_w": P(None, "tp", "fsdp"),
    }


def vision_block_specs() -> Dict[str, P]:
    return {
        "norm1": P(), "norm2": P(),
        "qkv_w": P(None, "fsdp", "tp"), "qkv_b": P(None, "tp"),
        "proj_w": P(None, "tp", "fsdp"), "proj_b": P(),
        "gate_w": P(None, "fsdp", "tp"), "gate_b": P(None, "tp"),
        "up_w": P(None, "fsdp", "tp"), "up_b": P(None, "tp"),
        "down_w": P(None, "tp", "fsdp"), "down_b": P(),
    }


def param_specs(params: Dict) -> Dict:
    """Build a spec pytree matching the model params structure."""
    base = text_layer_specs()
    # extras beyond the dense-layer table: qk norms (qwen3) replicate; MoE
    # expert stacks (L, E, in, out) shard experts over "tp" (EP == tp axis)
    moe_specs = {
        "router_w": P(),
        "gate_w": P(None, "tp", "fsdp", None),
        "up_w": P(None, "tp", "fsdp", None),
        "down_w": P(None, "tp", None, "fsdp"),
        # qwen2_moe shared expert: dense megatron column/row split
        "s_gate_w": P(None, "fsdp", "tp"),
        "s_up_w": P(None, "fsdp", "tp"),
        "s_down_w": P(None, "tp", "fsdp"),
        "sgate_w": P(),
    }
    layer_specs = {}
    for key, v in params["layers"].items():
        if hasattr(v, "ndim") and v.ndim == 4 and key in moe_specs:
            layer_specs[key] = moe_specs[key]
        else:
            layer_specs[key] = base.get(key, moe_specs.get(key, P()))
    specs: Dict[str, Any] = {
        "embed": P("tp", "fsdp"),       # vocab-parallel embedding
        "final_ln": P(),
        "layers": layer_specs,
    }
    if "lm_head" in params:
        h = params["lm_head"]
        specs["lm_head"] = (P() if getattr(h, "dtype", None) == np.uint8
                            else P("fsdp", "tp"))   # nibble-packed int4: replicate
    if "lm_head_q" in params:           # tied head, pre-quantized (H, V)
        q = params["lm_head_q"]
        specs["lm_head_q"] = (P("fsdp", "tp")
                              if getattr(q, "dtype", None) == np.int8
                              else P())     # uint8 nibble-packed int4: replicate
    if "vision" in params:
        vtop = {
            "patch_embed_w": P("fsdp", "tp"),
            "merger_ln_q": P(),
            "merger_fc1_w": P("fsdp", "tp"), "merger_fc1_b": P("tp"),
            "merger_fc2_w": P("tp", "fsdp"), "merger_fc2_b": P(),
        }
        vblock = vision_block_specs()
        specs["vision"] = {
            k: ({n: vblock.get(n, P()) for n in v}
                if k == "blocks" else vtop.get(k, P()))
            for k, v in params["vision"].items()
        }
    # pre-quantized trees (ops/quant.py) add *_scale leaves (per-output-
    # channel f32 vectors / int4 group tables) and replace weights with int8
    # same-shape (or uint8 nibble-packed) values: any key the tables above
    # don't know — scales, packed int4 — replicates. Scales are a few MB
    # total; GSPMD slices the replicated scale against the tp-sharded matmul
    # output, and nibble-packed int4 (halved contracting dim) is safer
    # replicated than divisibility-sharded.
    specs.update({k: P() for k in params if k not in specs})
    return specs


def shard_params(params: Dict, mesh: Mesh) -> Dict:
    """device_put the pytree with its NamedShardings (the mcore 'dist load' role)."""
    specs = param_specs(params)
    shardings = jax.tree.map(lambda s: NamedSharding(mesh, s), specs,
                             is_leaf=lambda x: isinstance(x, P))
    return jax.device_put(params, shardings)


def param_shardings(params: Dict, mesh: Mesh):
    specs = param_specs(params)
    return jax.tree.map(lambda s: NamedSharding(mesh, s), specs,
                        is_leaf=lambda x: isinstance(x, P))


def batch_shardings(mesh: Mesh, batch: Dict) -> Dict:
    """Batch arrays shard the leading dim over (dp, fsdp)."""
    def spec_for(v):
        return NamedSharding(mesh, P(("dp", "fsdp"), *([None] * (v.ndim - 1))))
    return {k: spec_for(v) for k, v in batch.items()}


def shard_batch(batch: Dict, mesh: Mesh) -> Dict:
    return {k: jax.device_put(v, s) for (k, v), s in
            zip(batch.items(), batch_shardings(mesh, batch).values())}
