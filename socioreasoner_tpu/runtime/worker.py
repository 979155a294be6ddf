"""Base Worker: per-role execution unit (single-controller, no Ray actors).

Plays `roll/distributed/executor/worker.py:41`: holds a strategy, exposes the
generic strategy passthroughs (load/offload states, weight-sync hooks). On TPU
there is no GPU time-sharing, so load/offload are no-ops kept for API parity
(ref state_offload_manger, context_managers.py:99) and the weight-sync methods
delegate to the shared ParamStore (see distributed/param_store.py).
"""

from __future__ import annotations

import logging
from typing import Any, Dict, Optional

from ..configs.worker_config import WorkerConfig
from ..protocol import BatchProto
from .cluster import RankInfo
from .dispatch import Dispatch, register

logger = logging.getLogger(__name__)


class Worker:
    def __init__(self, worker_config: WorkerConfig,
                 rank_info: Optional[RankInfo] = None,
                 shared: Optional[dict] = None,
                 cluster_name: str = ""):
        self.worker_config = worker_config
        self.rank_info = rank_info or RankInfo()
        self.shared = shared if shared is not None else {}
        self.cluster_name = cluster_name
        self.worker_name = f"{cluster_name}-{self.rank_info.rank}"
        self.strategy = None
        self.pipeline_config = None

    # ------------------------------------------------------------ lifecycle
    @register(dispatch_mode=Dispatch.ONE_TO_ALL)
    def initialize(self, pipeline_config=None):
        self.pipeline_config = pipeline_config

    # ------------------------------------------- strategy passthroughs (parity)
    @register(dispatch_mode=Dispatch.ONE_TO_ALL)
    def load_states(self, *args, **kwargs):
        if self.strategy is not None and hasattr(self.strategy, "load_states"):
            return self.strategy.load_states(*args, **kwargs)

    @register(dispatch_mode=Dispatch.ONE_TO_ALL)
    def offload_states(self, *args, **kwargs):
        if self.strategy is not None and hasattr(self.strategy, "offload_states"):
            return self.strategy.offload_states(*args, **kwargs)

    @register(dispatch_mode=Dispatch.ONE_TO_ALL)
    def start_model_update(self, *args, **kwargs):
        if self.strategy is not None and hasattr(self.strategy, "model_update"):
            return self.strategy.model_update(*args, **kwargs)

    @register(dispatch_mode=Dispatch.ONE_TO_ALL)
    def update_parameter(self, *args, **kwargs):
        if self.strategy is not None and hasattr(self.strategy, "update_parameter"):
            return self.strategy.update_parameter(*args, **kwargs)
