"""Generic RLVR pipeline + math/code/llm-judge rewards."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from socioreasoner_tpu.pipeline.rlvr.rewards import math_rule, code_sandbox, llm_judge


class TestMathReward:
    def test_boxed(self):
        assert math_rule.math_accuracy_reward(
            r"thinking... \boxed{42}", "42") == 1.0
        assert math_rule.math_accuracy_reward(
            r"\boxed{41}", "42") == 0.0

    def test_fraction_equivalence(self):
        assert math_rule.answers_match(r"\frac{1}{2}", "0.5")
        assert math_rule.answers_match("1/2", r"\frac{2}{4}")
        assert math_rule.answers_match("50%", "0.5")
        assert not math_rule.answers_match("1/3", "0.5")

    def test_answer_tags(self):
        text = "<think>ok</think><answer>3.14</answer>"
        assert math_rule.extract_answer(text) == "3.14"
        assert math_rule.math_format_reward(text) == 1.0
        assert math_rule.math_format_reward("just text") == 0.0

    def test_batch(self):
        out = math_rule.compute_math_rewards(
            [r"\boxed{7}", r"\boxed{8}"], ["7", "7"])
        np.testing.assert_array_equal(out["scores"], [1, 0])
        assert out["metrics"]["math/accuracy"] == 0.5


class TestCodeReward:
    def test_stdin_case(self):
        code = "```python\nprint(int(input()) * 2)\n```"
        score = code_sandbox.score_response(
            code, [{"input": "3\n", "output": "6"},
                   {"input": "5\n", "output": "10"}])
        assert score == 1.0

    def test_assert_case(self):
        code = "```python\ndef add(a, b):\n    return a + b\n```"
        score = code_sandbox.score_response(
            code, [{"assert": "assert add(1, 2) == 3"},
                   {"assert": "assert add(1, 2) == 4"}])
        assert score == 0.5

    def test_broken_code(self):
        assert code_sandbox.score_response("```python\nsyntax error!!\n```",
                                           [{"input": "", "output": ""}]) == 0.0
        assert code_sandbox.score_response("no code here at all",
                                           [{"input": "", "output": ""}]) == 0.0

    def test_timeout(self):
        code = "```python\nwhile True: pass\n```"
        assert code_sandbox.score_response(
            code, [{"input": "", "output": ""}], timeout=1.0) == 0.0


class TestLLMJudge:
    def test_parse(self):
        assert llm_judge.parse_judge_score("SCORE: 1") == 1.0
        assert llm_judge.parse_judge_score("score: 0") == 0.0
        assert llm_judge.parse_judge_score("The answer is correct") == 1.0

    def test_batch(self):
        def fake_judge(prompts):
            return ["SCORE: 1" if "Paris" in p else "SCORE: 0" for p in prompts]
        out = llm_judge.compute_llm_judge_rewards(
            ["capital of France?", "capital of Spain?"],
            ["Paris", "Lyon"], ["Paris", "Madrid"], fake_judge)
        np.testing.assert_array_equal(out["scores"], [1, 0])


def test_rlvr_pipeline_one_step(tmp_path):
    from socioreasoner_tpu.configs.rlvr_config import RLVRConfig
    from socioreasoner_tpu.datasets.processor import SocioProcessor
    from socioreasoner_tpu.models.qwen2_5_vl.config import Qwen25VLConfig
    from socioreasoner_tpu.models.qwen2_5_vl import model as qmodel
    from socioreasoner_tpu.pipeline.rlvr.rlvr_pipeline import RLVRPipeline
    from tests.test_infer_pipeline_e2e import TinyTokenizer

    model_config = Qwen25VLConfig.tiny(512)
    params = qmodel.init_params(model_config, jax.random.key(0), jnp.float32,
                                with_vision=False)
    ref = qmodel.init_params(model_config, jax.random.key(0), jnp.float32,
                             with_vision=False)
    processor = SocioProcessor(TinyTokenizer(),
                               image_token_id=model_config.image_token_id)
    cfg = RLVRConfig(output_dir=str(tmp_path), rollout_batch_size=2,
                     prompt_length=64, response_length=8, max_steps=1,
                     num_return_sequences_in_group=2, save_steps=-1,
                     use_kl_loss=True, kl_loss_coef=1e-3,
                     entropy_loss_coef=0.01, reward_clip=10.0)
    cfg.actor_infer.generating_args.max_new_tokens = 6
    cfg.actor_infer.generating_args.num_return_sequences = 2
    dataset = [{"prompt": "1+1=?", "ground_truth": "2", "tag": "math"},
               {"prompt": "2+2=?", "ground_truth": "4", "tag": "math"}]
    pipe = RLVRPipeline(cfg, model_config=model_config, policy_params=params,
                        reference_params=ref, processor=processor, dataset=dataset,
                        engine_kwargs={"max_slots": 4, "max_len": 96,
                                       "decode_chunk": 4, "prefill_buckets": (64,),
                                       "cache_dtype": jnp.float32})
    metrics = pipe.run()
    assert np.isfinite(metrics["actor_train/total_loss"])
    assert "critic/reward_mean" in metrics


def test_rlvr_pipeline_dynamic_sampling(tmp_path):
    """Dynamic-sampling rollout: concurrent prompt streaming with flow control
    + per-group reward dispatch + group filtering, end-to-end through GRPO
    (ref rlvr_pipeline.py batch pulls via DynamicSamplingScheduler)."""
    from socioreasoner_tpu.configs.rlvr_config import RLVRConfig
    from socioreasoner_tpu.datasets.processor import SocioProcessor
    from socioreasoner_tpu.models.qwen2_5_vl.config import Qwen25VLConfig
    from socioreasoner_tpu.models.qwen2_5_vl import model as qmodel
    from socioreasoner_tpu.pipeline.rlvr.rlvr_pipeline import RLVRPipeline
    from tests.test_infer_pipeline_e2e import TinyTokenizer

    model_config = Qwen25VLConfig.tiny(512)
    params = qmodel.init_params(model_config, jax.random.key(0), jnp.float32,
                                with_vision=False)
    ref = qmodel.init_params(model_config, jax.random.key(0), jnp.float32,
                             with_vision=False)
    processor = SocioProcessor(TinyTokenizer(),
                               image_token_id=model_config.image_token_id)
    cfg = RLVRConfig(output_dir=str(tmp_path), rollout_batch_size=2,
                     prompt_length=64, response_length=8, max_steps=1,
                     num_return_sequences_in_group=2, save_steps=-1,
                     use_kl_loss=True, kl_loss_coef=1e-3, reward_clip=10.0,
                     is_use_additional_prompts=True,
                     max_running_requests=8,
                     max_additional_running_prompts=2)
    cfg.actor_infer.generating_args.max_new_tokens = 6
    cfg.actor_infer.generating_args.num_return_sequences = 2
    dataset = [{"prompt": f"{i}+1=?", "ground_truth": str(i + 1), "tag": "math"}
               for i in range(4)]
    rejected = []

    def query_filter(row, group_outputs):
        # reject the first group seen once (forces a replacement pull)
        if not rejected:
            rejected.append(row["prompt"])
            return False
        return True

    pipe = RLVRPipeline(cfg, model_config=model_config, policy_params=params,
                        reference_params=ref, processor=processor,
                        dataset=dataset, query_filter=query_filter,
                        engine_kwargs={"max_slots": 4, "max_len": 96,
                                       "decode_chunk": 4, "prefill_buckets": (64,),
                                       "cache_dtype": jnp.float32})
    assert pipe.sampler is not None
    metrics = pipe.run()
    assert np.isfinite(metrics["actor_train/total_loss"])
    assert len(rejected) == 1
    assert metrics.get("scheduler/query_filter_count", 0) >= 1
    assert metrics.get("scheduler/prompt_use_count", 0) >= 3
