"""BasePipeline: seeds, trackers, resume, checkpointing (ref
roll/pipeline/base_pipeline.py:21-92)."""

from __future__ import annotations

import os
import random
from typing import Dict, List, Optional

import numpy as np

from ..configs.rlvr_config import BaseConfig
from ..utils.metrics import MetricsManager
from ..utils.tracking import create_tracker
from ..utils.worker_state import WorkerState


class BasePipeline:
    def __init__(self, pipeline_config: BaseConfig):
        self.pipeline_config = pipeline_config
        random.seed(pipeline_config.seed)
        np.random.seed(pipeline_config.seed)
        self.tracker = create_tracker(pipeline_config.track_with,
                                      **(pipeline_config.tracker_kwargs or {}))
        self.metrics = MetricsManager()
        self.state = WorkerState()
        self.checkpoint_clusters: List = []
        self.model_update_pairs: List = []

        # resume (ref base_pipeline.py:41-52)
        pipeline_dir = os.path.join(pipeline_config.output_dir, "pipeline")
        if pipeline_config.resume_from_checkpoint:
            latest = WorkerState.latest_checkpoint(pipeline_dir)
            if latest:
                self.state = WorkerState.load(latest)
                for record in self.state.log_history:
                    step = record.get("step", 0)
                    self.tracker.log({k: v for k, v in record.items() if k != "step"},
                                     step)

    def set_model_update_pair(self, src_cluster, tgt_cluster, frequency: int = 1):
        self.model_update_pairs.append((src_cluster, tgt_cluster, frequency))

    def model_update(self, step: int):
        """Train→infer weight flow (ref :65; here a ParamStore pointer swap).

        Each distinct src publishes ONCE per step before any tgt consumes:
        re-running src.model_update between dp decode replicas would re-put
        the bf16 tree and defeat their params_prequantized guard — dp
        replicas would each re-quantize the full decoder tree every update."""
        due = [(src, tgt) for src, tgt, freq in self.model_update_pairs
               if step % freq == 0]
        seen = set()
        for src, _ in due:
            if id(src) not in seen:
                seen.add(id(src))
                src.model_update(step)
        for _, tgt in due:
            tgt.model_update(step)

    def do_checkpoint(self, global_step: int):
        """Every save_steps: role checkpoints + pipeline state (ref :71-91)."""
        if self.pipeline_config.save_steps <= 0:
            return
        if (global_step + 1) % self.pipeline_config.save_steps != 0:
            return
        for cluster in self.checkpoint_clusters:
            cluster.do_checkpoint(global_step)
        self.state.step = global_step + 1
        ckpt_dir = os.path.join(self.pipeline_config.output_dir, "pipeline",
                                f"checkpoint-{global_step + 1}")
        self.state.save(ckpt_dir)

    def log_metrics(self, metrics: Dict, step: int):
        self.tracker.log(metrics, step)
        self.state.log(metrics, step)
