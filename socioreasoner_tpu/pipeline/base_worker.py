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


class RuleRewardWorker(Worker):
    """Generic text rule-reward worker: `compute_rewards` over response_text +
    ground_truth columns. Subclasses bind a reward function — the worker_cls
    plug-point for the generic RLVR pipeline (ref math_rule_reward_worker.py
    etc., named per-domain in rlvr_megatron.yaml rewards:)."""

    reward_fn = None          # staticmethod(fn(texts, gts) -> dict of arrays)

    @register(dispatch_mode=Dispatch.ONE_TO_ALL)
    def initialize(self, pipeline_config=None, tokenizer=None):
        super().initialize(pipeline_config)
        self.tokenizer = tokenizer

    @register(dispatch_mode=Dispatch.DP_MP_COMPUTE)
    def compute_rewards(self, data: BatchProto) -> BatchProto:
        fn = type(self).reward_fn
        texts = [str(t) for t in data.non_tensor["response_text"]]
        gts = list(data.non_tensor["ground_truth"])
        out = fn(texts, gts)
        tensors = {k: np.asarray(v) for k, v in out.items()
                   if isinstance(v, (np.ndarray, list))}
        meta = {k: v for k, v in out.items() if k not in tensors}
        return BatchProto.from_dict(tensors=tensors, meta=meta)


class MathRuleRewardWorker(RuleRewardWorker):
    """ref math_rule_reward_worker.py (math-verify / latex equivalence)."""
    from .rlvr.rewards.math_rule import compute_math_rewards as _fn
    reward_fn = staticmethod(_fn)


class CodeSandboxRewardWorker(RuleRewardWorker):
    """ref code_sandbox_reward_worker.py (execute generated code vs tests).
    With `code_url` on the worker config, cases run on the remote sandbox
    service (ref `:505` / CodeTester); otherwise in a local rlimited
    subprocess."""
    from .rlvr.rewards.code_sandbox import compute_code_rewards as _fn
    reward_fn = staticmethod(_fn)

    @register(dispatch_mode=Dispatch.DP_MP_COMPUTE)
    def compute_rewards(self, data: BatchProto) -> BatchProto:
        url = getattr(self.worker_config, "code_url", None)
        if url:
            from .rlvr.rewards.code_sandbox import compute_code_rewards
            texts = [str(t) for t in data.non_tensor["response_text"]]
            gts = list(data.non_tensor["ground_truth"])
            out = compute_code_rewards(texts, gts, code_url=url)
            tensors = {k: np.asarray(v) for k, v in out.items()
                       if isinstance(v, (np.ndarray, list))}
            meta = {k: v for k, v in out.items() if k not in tensors}
            return BatchProto.from_dict(tensors=tensors, meta=meta)
        return RuleRewardWorker.compute_rewards(self, data)


class CrossThinkQARewardWorker(RuleRewardWorker):
    """ref crossthinkqa_rule_reward_worker.py."""
    from .rlvr.rewards.general_rules import compute_crossthink_rewards as _fn
    reward_fn = staticmethod(_fn)


class GeneralValRuleRewardWorker(RuleRewardWorker):
    """ref general_val_rule_reward_worker.py."""
    from .rlvr.rewards.general_rules import compute_general_val_scores as _fn
    reward_fn = staticmethod(_fn)


class RewardWorker(Worker):
    """Model-based reward worker (ref base_worker.py:537-603): a sequence-
    classification RM — scalar value head on the policy backbone via
    JaxRewardStrategy — scored at the last response token."""

    @register(dispatch_mode=Dispatch.ONE_TO_ALL)
    def initialize(self, pipeline_config=None, strategy=None, tokenizer=None):
        super().initialize(pipeline_config)
        self.strategy = strategy
        self.tokenizer = tokenizer

    @register(dispatch_mode=Dispatch.DP_MP_COMPUTE)
    def compute_rewards(self, data: BatchProto) -> BatchProto:
        """token_level_rewards (B, L-1) + response_level_rewards (B,): the
        value at the sequence's last non-pad position (ref :585-589 —
        argmax-of-pad minus one, wrapped modulo L-1 for full rows)."""
        token_level = np.asarray(self.strategy.compute_values(data))
        input_ids = np.asarray(data.batch["input_ids"])[:, 1:]
        pad_id = data.meta.get("pad_token_id", 0)
        is_pad = (input_ids == pad_id).astype(np.int64)
        seq_lengths = (np.argmax(is_pad, axis=-1) - 1) % input_ids.shape[-1]
        response_level = token_level[np.arange(len(token_level)), seq_lengths]
        return BatchProto.from_dict(tensors={
            "token_level_rewards": token_level,
            "response_level_rewards": response_level})


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
        # component arrays ride along so a multi-worker cluster's collect
        # (concat) lets the caller recompute exact means over the full batch
        tensors = {k: v for k, v in out.items() if isinstance(v, np.ndarray)}
        return BatchProto.from_dict(tensors=tensors,
                                    meta={"metrics": out["metrics"]})
