"""Strategy layer: the backend abstraction behind every worker.

API parity with the reference ABCs (`roll/distributed/strategy/strategy.py:16,141`)
— initialize / forward_step / generate / start_server / add_request /
save_checkpoint / load_checkpoint / load_states / offload_states /
model_update / op_compute_log_probs / op_compute_entropy / train_step —
re-grounded for the single-JAX-program runtime:

  * One `ParamStore` holds the live (train) and frozen (reference) weights,
    shared by every strategy. `model_update` = the decode strategy re-reads the
    live params — the reference's NCCL bucket broadcast plane
    (megatron_strategy.py:411-448 + ModelUpdateGroup) collapses to a pointer
    swap on-mesh (cross-mesh device_put when meshes differ).
  * load/offload_states are no-ops kept for API compat (no GPU time-sharing).
"""

from __future__ import annotations

import abc
import os
from typing import Any, Callable, Dict, Optional

import numpy as np

import jax
import jax.numpy as jnp

from ..configs.worker_config import WorkerConfig
from ..protocol import BatchProto
from ..utils.functionals import entropy_from_logits, log_probs_from_logits


class ParamStore:
    """Shared weight registry across strategies (one program, one copy)."""

    def __init__(self):
        self._store: Dict[str, Any] = {}
        self.version: Dict[str, int] = {}

    def put(self, name: str, params: Any):
        self._store[name] = params
        self.version[name] = self.version.get(name, 0) + 1

    def get(self, name: str) -> Any:
        return self._store[name]

    def __contains__(self, name: str) -> bool:
        return name in self._store


class BaseStrategy(abc.ABC):
    strategy_name = "base"

    def __init__(self, worker=None, worker_config: Optional[WorkerConfig] = None,
                 param_store: Optional[ParamStore] = None):
        self.worker = worker
        self.worker_config = worker_config or getattr(worker, "worker_config", None)
        self.param_store = param_store or ParamStore()
        self.model_config = None

    @abc.abstractmethod
    def initialize(self, *args, **kwargs):
        ...

    # ------------------------------------------------- reference API surface
    def load_states(self, *args, **kwargs):     # no GPU time-sharing on TPU
        pass

    def offload_states(self, *args, **kwargs):
        pass

    def model_update(self, *args, **kwargs):
        pass

    def setup_collective_group(self, *args, **kwargs):
        pass

    def broadcast_bucket(self, *args, **kwargs):
        pass

    def broadcast_parameter(self, *args, **kwargs):
        pass

    def update_parameter(self, *args, **kwargs):
        pass

    def update_parameter_in_bucket(self, *args, **kwargs):
        pass

    # ------------------------------------------------------------- token ops
    def op_compute_log_probs(self, logits: jnp.ndarray, input_ids: jnp.ndarray,
                             attention_mask: jnp.ndarray) -> jnp.ndarray:
        """Log-probs of labels over the response region (ref strategy.py:123)."""
        lp = log_probs_from_logits(logits[:, :-1], input_ids[:, 1:])
        return lp * attention_mask[:, 1:].astype(lp.dtype)

    def op_compute_entropy(self, logits: jnp.ndarray,
                           attention_mask: jnp.ndarray) -> jnp.ndarray:
        ent = entropy_from_logits(logits[:, :-1])
        return ent * attention_mask[:, 1:].astype(ent.dtype)


class InferenceStrategy(BaseStrategy):
    def forward_step(self, batch: BatchProto, forward_func: Callable):
        raise NotImplementedError

    def generate(self, batch: BatchProto, generation_config: Dict):
        raise NotImplementedError

    def start_server(self, data: Optional[BatchProto] = None):
        raise NotImplementedError

    def add_request(self, command, data):
        raise NotImplementedError

    def save_checkpoint(self, *args, **kwargs):
        pass

    def load_checkpoint(self, *args, **kwargs):
        pass


class TrainStrategy(InferenceStrategy):
    def train_step(self, batch: BatchProto, loss_func: Callable):
        raise NotImplementedError
