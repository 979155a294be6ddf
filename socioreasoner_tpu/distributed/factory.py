"""Strategy factory (ref roll/distributed/strategy/factory.py:7-28): string →
lazily-imported strategy class. Reference names map to the TPU-native backends;
the GPU-only names alias to their equivalents for yaml compatibility."""

from __future__ import annotations

from typing import Dict


def create_strategy(strategy_name: str, worker=None, worker_config=None,
                    param_store=None):
    name = ALIASES.get(strategy_name, strategy_name)
    if name == "jax_train":
        from .jax_strategies import JaxTrainStrategy
        return JaxTrainStrategy(worker, worker_config, param_store)
    if name == "jax_infer":
        from .jax_strategies import JaxInferStrategy
        return JaxInferStrategy(worker, worker_config, param_store)
    if name == "jax_decode":
        from .jax_strategies import JaxDecodeStrategy
        return JaxDecodeStrategy(worker, worker_config, param_store)
    if name == "seg_infer":
        from .seg_strategy import SegStrategy
        return SegStrategy(worker, worker_config, param_store)
    raise ValueError(f"unknown strategy {strategy_name!r}")


# reference yaml names → TPU backends (SURVEY.md §2.2 table)
ALIASES: Dict[str, str] = {
    "megatron_train": "jax_train",
    "megatron_infer": "jax_infer",
    "deepspeed_train": "jax_train",
    "deepspeed_infer": "jax_infer",
    "hf_infer": "jax_infer",
    "vllm": "jax_decode",
    "sglang": "jax_decode",
}
