"""Pipeline builders: SocioSegConfig + checkpoints → runnable pipelines.

The from-config constructor path the entry scripts use (plays the reference's
`SocioSegPipeline.__init__` cluster construction, rlvr_socioseg_vlm_pipeline.py
:452-613). Loads HF-format checkpoints (Qwen2.5-VL policy, SAM2) from local
paths named in the yaml; builds the processor from the tokenizer files next to
the policy checkpoint.
"""

from __future__ import annotations

import os
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp

from ...configs.rlvr_config import SocioSegConfig
from ...datasets.processor import (ImageProcessorConfig, SimpleTokenizer,
                                   SocioProcessor, load_hf_tokenizer)
from ...datasets.socioseg import encode_sample, load_socioseg_dir
from ...models.qwen2_5_vl.config import Qwen25VLConfig
from ...models.qwen2_5_vl import loader as qloader
from ...models.qwen2_5_vl import model as qmodel
from ...models.sam2.config import Sam2Config
from ...models.sam2 import loader as sloader
from ...models.sam2 import model as smodel


def build_processor(cfg: SocioSegConfig, model_config: Qwen25VLConfig
                    ) -> SocioProcessor:
    ma = cfg.actor_train.model_args
    img_cfg = ImageProcessorConfig(
        min_pixels=ma.pixels("min_pixels") or 56 * 56,
        max_pixels=ma.pixels("max_pixels") or 28 * 28 * 1280,
        # uint8 upload + on-device patchify (vision.patchify_device): 8×
        # fewer host→device bytes on the VLM hot path
        defer_patchify=True)
    pretrain = cfg.pretrain
    if pretrain and os.path.isdir(pretrain):
        tokenizer = load_hf_tokenizer(pretrain)
    else:
        tokenizer = SimpleTokenizer()
    return SocioProcessor(tokenizer, img_cfg,
                          image_token_id=model_config.image_token_id)


def load_policy(cfg: SocioSegConfig, dtype=jnp.bfloat16):
    pretrain = cfg.pretrain
    if pretrain and os.path.isdir(pretrain):
        return qloader.load_pretrained(pretrain, dtype=dtype)
    # no local checkpoint: random init at the flagship architecture
    model_config = Qwen25VLConfig()
    params = qmodel.init_params(model_config, jax.random.key(cfg.seed), dtype)
    return model_config, params


def load_sam(cfg: SocioSegConfig, dtype=jnp.bfloat16):
    path = cfg.seg_infer.model_args.model_name_or_path
    if path and os.path.isdir(path):
        return sloader.load_pretrained(path, dtype=dtype)
    sam_config = Sam2Config.large()
    params = smodel.init_params(sam_config, jax.random.key(0), dtype)
    return sam_config, params


def load_dataset(cfg: SocioSegConfig, split: str, processor: SocioProcessor
                 ) -> List[Dict]:
    data_dir = (cfg.actor_train.data_args.dataset_dir
                or cfg.actor_train.data_args.file_name)
    rows = load_socioseg_dir(data_dir, split) if data_dir else []
    return [encode_sample(r, processor.image_config) for r in rows]


def default_engine_kwargs(cfg: SocioSegConfig) -> Dict:
    kwargs = {
        "max_slots": cfg.actor_infer.infer_batch_size,
        "max_len": cfg.sequence_length,
        "decode_chunk": 64,
        "prefill_buckets": (512, 1024, 2048, cfg.prompt_length),
        # large total-row buckets let several VLM requests (~1.5k image rows
        # each) share one batched prefill; unused sizes never compile
        "image_buckets": (0, 512, 1024, 2048, 4096, 8192, 16384),
    }
    # actor_infer.strategy_args.strategy_config.kv_quant: "int8" enables the
    # quantized KV cache (half the decode HBM traffic, double the slots);
    # weight_quant: "int8" enables the hybrid int8 decode loop (engine.py)
    sc = cfg.actor_infer.strategy_args.strategy_config or {}
    if sc.get("kv_quant"):
        kwargs["kv_quant"] = sc["kv_quant"]
    if sc.get("weight_quant"):
        kwargs["weight_quant"] = sc["weight_quant"]
    if sc.get("act_quant"):
        # w8a8 prefill (int8×int8 MXU matmuls — 2× bf16 peak on v5e);
        # requires weight_quant: "int8"
        kwargs["act_quant"] = sc["act_quant"]
    if sc.get("single_copy_quant"):
        # quantize the rollout store in place: one shared int8 tree serves
        # prefill AND decode (JaxDecodeStrategy consumes this kwarg)
        kwargs["single_copy_quant"] = True
    if sc.get("vit_quant"):
        # w8a8 ViT tower (JaxDecodeStrategy quantizes the store's vision
        # subtree; batch_image_embeds consumes it)
        kwargs["vit_quant"] = sc["vit_quant"]
    if sc.get("sampler_exact"):
        # exact lax.top_k candidate selection for parity/eval runs
        kwargs["sampler_exact"] = True
    if sc.get("prefix_fork") is not None:
        # identical-prompt KV forking (GRPO n-sampling prefills once); on by
        # default — the knob exists to disable it for ablation/parity runs
        kwargs["prefix_fork"] = bool(sc["prefix_fork"])
    return kwargs


def build_infer_pipeline(cfg: SocioSegConfig, dtype=jnp.bfloat16):
    from .socioseg_infer_pipeline import SocioSegInferPipeline
    model_config, params = load_policy(cfg, dtype)
    sam_config, sam_params = load_sam(cfg, dtype)
    processor = build_processor(cfg, model_config)
    dataset = load_dataset(cfg, "test", processor)
    return SocioSegInferPipeline(
        cfg, model_config=model_config, policy_params=params,
        sam_config=sam_config, sam_params=sam_params, processor=processor,
        dataset=dataset, engine_kwargs=default_engine_kwargs(cfg))


def build_train_mesh(cfg: SocioSegConfig):
    """ResourceManager mesh for the train/logprob plane from the yaml's
    strategy_config tp/cp/pp/fsdp knobs (ref rlvr_megatron.yaml:90 tp=2 via
    megatron_strategy.py:69-96). None on a single chip with all knobs at 1."""
    from ...configs.validation import validate_config
    from ...runtime.resource_manager import ResourceManager
    validate_config(cfg)
    rm = ResourceManager()
    return rm, rm.allocate_mesh("actor_train", cfg.actor_train)


def build_train_pipeline(cfg: SocioSegConfig, dtype=jnp.bfloat16):
    from .socioseg_pipeline import SocioSegPipeline
    _, mesh = build_train_mesh(cfg)
    model_config, params = load_policy(cfg, dtype)
    _, ref_params = load_policy(cfg, dtype)   # frozen copy of the initial policy
    sam_config, sam_params = load_sam(cfg, dtype)
    processor = build_processor(cfg, model_config)
    dataset = load_dataset(cfg, "train", processor)
    return SocioSegPipeline(
        cfg, model_config=model_config, policy_params=params,
        reference_params=ref_params, sam_config=sam_config,
        sam_params=sam_params, processor=processor, dataset=dataset,
        engine_kwargs=default_engine_kwargs(cfg), mesh=mesh)
