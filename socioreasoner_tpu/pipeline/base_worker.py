"""Role workers: Actor / Reward / Seg (single-controller runtime).

API parity with the reference (`roll/pipeline/base_worker.py:31-603`): the
pipeline talks to Clusters of these via @register-ed methods. Strategies carry
the device logic; workers do host glue (decode text, parse prompts, shuffle
BatchProto columns). The offload manager wrapping every RPC in the reference
(context_managers.py:99) is unnecessary on TPU — roles share resident weights.
"""

from __future__ import annotations

import time
from typing import Any, Callable, Dict, List, Optional

import numpy as np

from ..configs.worker_config import WorkerConfig
from ..protocol import BatchProto
from ..runtime.dispatch import Dispatch, register
from ..runtime.worker import Worker
from ..utils.functionals import GenerateRequestType


class ActorWorker(Worker):
    """Hosts a jax_train / jax_infer / jax_decode strategy (ref ActorWorker :31)."""

    @register(dispatch_mode=Dispatch.ONE_TO_ALL)
    def initialize(self, pipeline_config=None, strategy=None):
        super().initialize(pipeline_config)
        self.strategy = strategy

    @register(dispatch_mode=Dispatch.DP_MP_COMPUTE)
    def train_step(self, data: BatchProto) -> BatchProto:
        """Mini-batch iteration + strategy.train_step (ref :63-105)."""
        metrics: Dict[str, List[float]] = {}
        bbs = self.worker_config.backward_batch_size
        ppo_epochs = getattr(self.pipeline_config, "ppo_epochs", 1) if self.pipeline_config else 1
        if bbs is None or bbs <= 0:
            bbs = len(data)
        for mini in data.make_iterator(bbs, epochs=ppo_epochs):
            m = self.strategy.train_step(mini)
            for k, v in m.items():
                metrics.setdefault(k, []).append(v)
        out = {k: float(np.mean(v)) for k, v in metrics.items()}
        return BatchProto(meta={"metrics": out})

    @register(dispatch_mode=Dispatch.DP_MP_COMPUTE)
    def compute_log_probs(self, data: BatchProto) -> BatchProto:
        """Forward-only log-probs + entropy (ref :206-246)."""
        out = self.strategy.compute_log_probs(data)
        return BatchProto.from_dict(tensors={"log_probs": out["log_probs"],
                                             "entropy": out["entropy"]})

    @register(dispatch_mode=Dispatch.DP_MP_COMPUTE)
    def generate(self, data: BatchProto, generating_args=None) -> BatchProto:
        """Batch rollout (ref :107-160). Returns full right-padded sequences."""
        gen_args = generating_args or self.worker_config.generating_args
        output = self.strategy.generate(data, gen_args)
        return BatchProto.from_dict(tensors={"output": output})

    # -------------------------------------------------- request-level serving
    @register(dispatch_mode=Dispatch.ONE_TO_ALL_ONE)
    def start_server(self, data: Optional[BatchProto] = None):
        self.strategy.start_server(data)

    @register(dispatch_mode=Dispatch.ONE_TO_ALL_ONE)
    def stop_server(self):
        self.strategy.stop_server()

    @register(dispatch_mode=Dispatch.ONE_TO_ALL_ONE, blocking=True)
    def add_request(self, command: GenerateRequestType, data: Optional[Dict] = None):
        return self.strategy.add_request(command, data)

    @register(dispatch_mode=Dispatch.ONE_TO_ALL)
    def model_update(self, step: int = 0):
        self.strategy.model_update()

    @register(dispatch_mode=Dispatch.ONE_TO_ALL)
    def do_checkpoint(self, global_step: int):
        if hasattr(self.strategy, "save_checkpoint"):
            self.strategy.save_checkpoint(global_step)


class SegWorker(Worker):
    """SAM2 mask decode worker (ref roll/pipeline/rlvr/seg_worker.py:512)."""

    @register(dispatch_mode=Dispatch.ONE_TO_ALL)
    def initialize(self, pipeline_config=None, strategy=None):
        super().initialize(pipeline_config)
        self.strategy = strategy

    def _segment(self, data: BatchProto, response_key: str, parser: Callable
                 ) -> BatchProto:
        texts = data.non_tensor[response_key]
        prompts_col = []
        for text in texts:
            parsed = parser(str(text))
            vp = []
            for obj in parsed:
                entry = {}
                if "box" in obj:
                    entry["box"] = obj["box"]
                if obj.get("points"):
                    entry["points"] = obj["points"]
                    entry["labels"] = obj.get("labels", [1] * len(obj["points"]))
                vp.append(entry)
            prompts_col.append(vp)
        seg_batch = BatchProto.from_dict(non_tensors={
            "seg_image": list(data.non_tensor["seg_image"]),
            "visual_prompt": prompts_col,
        })
        results = self.strategy.segment(seg_batch)
        return BatchProto.from_dict(non_tensors={
            "mask": [r["mask"] for r in results],
            "visual_prompt": prompts_col,
        })

    @register(dispatch_mode=Dispatch.DP_MP_COMPUTE)
    def segment_v4_map(self, data: BatchProto) -> BatchProto:
        """Stage-1: bbox prompts parsed from map responses (ref :772)."""
        from .rlvr.parsing import parse_visual_prompts_s1
        return self._segment(data, "map_response_text", parse_visual_prompts_s1)

    @register(dispatch_mode=Dispatch.DP_MP_COMPUTE)
    def segment_v4_sat(self, data: BatchProto) -> BatchProto:
        """Stage-2: bbox+point prompts parsed from sat responses (ref :856)."""
        from .rlvr.parsing import parse_visual_prompts_s2
        return self._segment(data, "response_text", parse_visual_prompts_s2)


class SocioSegRuleRewardWorker(Worker):
    """CPU rule-reward worker (ref socioseg_rule_reward_worker.py:258)."""

    @register(dispatch_mode=Dispatch.ONE_TO_ALL)
    def initialize(self, pipeline_config=None, tokenizer=None):
        super().initialize(pipeline_config)
        self.tokenizer = tokenizer

    @register(dispatch_mode=Dispatch.DP_MP_COMPUTE)
    def compute_rewards_split(self, data: BatchProto) -> BatchProto:
        from .rlvr.rewards.socioseg import compute_socioseg_rewards
        gt_masks = [np.asarray(m.convert("L")) if hasattr(m, "convert") else np.asarray(m)
                    for m in data.non_tensor["gt_mask"]]
        out = compute_socioseg_rewards(
            map_responses=[str(t) for t in data.non_tensor["map_response_text"]],
            sat_responses=[str(t) for t in data.non_tensor["sat_response_text"]],
            map_masks=list(data.non_tensor["map_mask"]),
            sat_masks=list(data.non_tensor["sat_mask"]),
            gt_masks=gt_masks,
            gt_bbox_texts=[str(t) for t in data.non_tensor["gt_bbox"]],
            stage1_bbox_texts=[str(t) for t in data.non_tensor["bboxs_text"]],
        )
        tensors = {k: v for k, v in out.items()
                   if isinstance(v, np.ndarray) and not k.startswith("components/")}
        return BatchProto.from_dict(tensors=tensors,
                                    meta={"metrics": out["metrics"]})
