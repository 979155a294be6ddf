"""AgenticPipeline — multi-turn env-based RL (ref roll/pipeline/agentic/
agentic_pipeline.py:32, agentic_vlm_pipeline.py).

Episode rollouts from EnvironmentWorker, per-episode returns normalized over
episode groups (GRPO-style), final-turn action tokens trained with the PPO loss.
The single-stage, env-in-the-loop sibling of RLVRPipeline.
"""

from __future__ import annotations

import time
from typing import Dict, List, Optional

import numpy as np

import jax.numpy as jnp

from ...configs.rlvr_config import RLVRConfig
from ...distributed.jax_strategies import (JaxDecodeStrategy, JaxInferStrategy,
                                           JaxTrainStrategy)
from ...distributed.strategy import ParamStore
from ...generation.engine import Request
from ...generation.sampling import SamplingParams
from ...models.qwen2_5_vl.config import Qwen25VLConfig
from ...models.qwen2_5_vl.rope import get_rope_index
from ...pipeline.losses import PPOLossConfig
from ...protocol import BatchProto
from ...utils import functionals as fn
from ...utils.kl_controller import get_kl_controller
from ..base_pipeline import BasePipeline
from .environment_worker import EnvironmentWorker


class AgenticPipeline(BasePipeline):
    def __init__(self, pipeline_config: RLVRConfig, *,
                 model_config: Qwen25VLConfig, policy_params, reference_params,
                 processor, env_name: str = "guess_number",
                 env_kwargs: Optional[Dict] = None,
                 engine_kwargs: Optional[Dict] = None):
        super().__init__(pipeline_config)
        cfg = pipeline_config
        self.model_config = model_config
        self.processor = processor

        self.param_store = ParamStore()
        self.actor_train = JaxTrainStrategy(worker_config=cfg.actor_train,
                                            param_store=self.param_store)
        self.actor_train.initialize(
            model_config, policy_params,
            PPOLossConfig(pg_clip=cfg.pg_clip, use_kl_loss=cfg.use_kl_loss,
                          kl_loss_coef=cfg.kl_loss_coef,
                          entropy_loss_coef=cfg.entropy_loss_coef,
                          loss_agg_mode=cfg.loss_agg_mode),
            cfg.actor_train.training_args)
        self.reference = JaxInferStrategy(worker_config=cfg.reference,
                                          param_store=self.param_store)
        self.reference.initialize(model_config, reference_params)
        self.actor_train.model_update()
        self.actor_infer = JaxDecodeStrategy(worker_config=cfg.actor_infer,
                                             param_store=self.param_store)
        self.actor_infer.initialize(model_config, engine_kwargs=engine_kwargs)
        self.set_model_update_pair(
            self.actor_train, self.actor_infer,
            frequency=max(1, cfg.actor_infer.model_update_frequency))

        self.env_worker = EnvironmentWorker(worker_config=cfg.actor_infer)
        self.env_worker.initialize(cfg, env_name=env_name, env_kwargs=env_kwargs,
                                   generate_fn=self._act,
                                   max_turns=cfg.extra_fields.get("max_turns", 6))
        self.kl_ctrl = get_kl_controller(cfg.init_kl_coef, cfg.target_kl,
                                         cfg.kl_horizon)

    def _act(self, prompt: str) -> str:
        text = self.processor.apply_chat_template(prompt, 0)
        ids = self.processor.tokenizer.encode(text)[-self.pipeline_config.prompt_length:]
        sp = SamplingParams.from_generating_args(
            self.pipeline_config.actor_infer.generating_args)
        outs = self.actor_infer.engine.generate(
            [Request(request_id=0, prompt_ids=ids, sampling=sp)])
        return self.processor.decode(outs[0].output_ids, skip_special_tokens=True)

    def run(self, episodes_per_step: Optional[int] = None) -> Dict[str, float]:
        cfg = self.pipeline_config
        mm = self.metrics
        n_eps = episodes_per_step or cfg.rollout_batch_size
        step = self.state.step
        last: Dict[str, float] = {}
        while step < max(cfg.max_steps, 1):
            t0 = time.perf_counter()
            self.model_update(step)   # honors model_update_frequency
            with mm.timer("rollout"):
                trajs = self.env_worker.run_rollout_loop(n_eps, seed=cfg.seed + step)
            returns = np.array([t.total_reward for t in trajs], np.float32)
            mm.add_metric("agentic/return_mean", float(returns.mean()))
            mm.add_metric("agentic/solved_rate",
                          float(np.mean([t.info.get("solved", False) for t in trajs])))
            # build a train batch from each episode's final (prompt, action)
            batch = self._episodes_to_batch(trajs, returns)
            if batch is not None:
                with mm.timer("train"):
                    old_lp = self.actor_train.compute_log_probs(batch)["log_probs"]
                    ref_lp = self.reference.compute_log_probs(batch)["log_probs"]
                    r = jnp.asarray(np.asarray(batch.meta["returns"], np.float32))
                    r = fn.batch_reward_norm(r)
                    tok, cur_kl = fn.apply_kl_penalty(
                        r, jnp.asarray(batch.batch["attention_mask"]),
                        jnp.asarray(batch.batch["position_ids"]),
                        jnp.asarray(batch.batch["response_mask"][:, 1:]),
                        jnp.asarray(old_lp), jnp.asarray(ref_lp),
                        self.kl_ctrl.value, cfg.kl_penalty)
                    adv = fn.compute_advantage(
                        tok, jnp.asarray(batch.batch["response_mask"][:, 1:]),
                        adv_estimator="reinforce", gamma=cfg.gamma)
                    batch.batch["advantages"] = np.asarray(adv["advantages"])
                    batch.batch["old_log_probs"] = old_lp
                    batch.batch["ref_log_probs"] = ref_lp
                    metrics = self.actor_train.train_step(batch)
                    metrics["critic/kl"] = float(cur_kl)
            else:
                metrics = {}
            mm.add_time("step", time.perf_counter() - t0)
            last = {**mm.reduce(), **metrics}
            self.log_metrics(last, step)
            step += 1
            self.state.step = step
        return last

    def _episodes_to_batch(self, trajs, returns) -> Optional[BatchProto]:
        cfg = self.pipeline_config
        pad = self.model_config.pad_token_id
        L = cfg.prompt_length + cfg.response_length
        rows, resp_masks, rets = [], [], []
        for t, ret in zip(trajs, returns):
            if not t.actions:
                continue
            prompt_text = self.processor.apply_chat_template(t.observations[-1], 0)
            p_ids = self.processor.tokenizer.encode(prompt_text)[-cfg.prompt_length:]
            a_ids = self.processor.tokenizer.encode(t.actions[-1])[:cfg.response_length]
            seq = (p_ids + a_ids)[:L]
            row = np.full(L, pad, np.int64)
            row[:len(seq)] = seq
            m = np.zeros(L, np.int64)
            m[len(p_ids):len(seq)] = 1
            rows.append(row)
            resp_masks.append(m)
            rets.append(ret)
        if not rows:
            return None
        ids = np.stack(rows)
        attn = (ids != pad).astype(np.int64)
        pos, _ = get_rope_index(self.model_config, ids, None, attn)
        return BatchProto.from_dict(
            tensors={"input_ids": ids, "attention_mask": attn,
                     "position_ids": pos, "response_mask": np.stack(resp_masks)},
            meta={"returns": rets})
