"""End-to-end GRPO training pipeline smoke test: two full steps with tiny models
(SURVEY.md §3.1 — the reference main loop, BASELINE.json config 5)."""

import numpy as np
import pytest
from PIL import Image

import jax
import jax.numpy as jnp

from socioreasoner_tpu.configs.rlvr_config import SocioSegConfig
from socioreasoner_tpu.datasets.processor import ImageProcessorConfig, SocioProcessor
from socioreasoner_tpu.datasets.socioseg import encode_sample
from socioreasoner_tpu.models.qwen2_5_vl.config import Qwen25VLConfig
from socioreasoner_tpu.models.qwen2_5_vl import model as qmodel
from socioreasoner_tpu.models.sam2.config import Sam2Config
from socioreasoner_tpu.models.sam2 import model as smodel
from socioreasoner_tpu.pipeline.rlvr.socioseg_pipeline import SocioSegPipeline
from tests.test_infer_pipeline_e2e import TinyTokenizer, make_tiles

VOCAB = 512


def test_train_pipeline_two_steps(tmp_path):
    model_config = Qwen25VLConfig.tiny(VOCAB)
    policy_params = qmodel.init_params(model_config, jax.random.key(0), jnp.float32)
    ref_params = qmodel.init_params(model_config, jax.random.key(0), jnp.float32)
    sam_config = Sam2Config.tiny_test()
    sam_params = smodel.init_params(sam_config, jax.random.key(1))
    img_cfg = ImageProcessorConfig(min_pixels=56 * 56, max_pixels=56 * 56 * 4)
    processor = SocioProcessor(TinyTokenizer(), img_cfg,
                               image_token_id=model_config.image_token_id)

    cfg = SocioSegConfig(
        output_dir=str(tmp_path), rollout_batch_size=2, prompt_length=640,
        response_length=16, save_steps=-1, track_with="stdout", max_steps=2,
        num_return_sequences_in_group=2, adv_estimator="grpo",
        use_kl_loss=True, kl_loss_coef=5e-3, reward_clip=10.0,
        advantage_clip=10.0, entropy_loss_coef=0.01,
        # stage-1 rollout through the request-level server plane
        # (abort-on-complete fan-out, ref generate_opt_level)
        generate_opt_level=1)
    cfg.actor_infer.generating_args.max_new_tokens = 6
    cfg.actor_infer.generating_args.num_return_sequences = 2
    cfg.actor_train.training_args.learning_rate = 1e-4
    cfg.actor_train.backward_batch_size = 4

    dataset = [encode_sample(t, img_cfg) for t in make_tiles(2)]
    pipe = SocioSegPipeline(
        cfg, model_config=model_config, policy_params=policy_params,
        reference_params=ref_params, sam_config=sam_config, sam_params=sam_params,
        processor=processor, dataset=dataset,
        engine_kwargs={"max_slots": 4, "max_len": 700, "decode_chunk": 4,
                       "prefill_buckets": (640,), "image_buckets": (0, 16, 32),
                       "cache_dtype": jnp.float32})
    metrics = pipe.run()
    assert pipe.state.step == 2
    # training happened on both stages with finite losses
    assert np.isfinite(metrics["map/actor_train/total_loss"])
    assert np.isfinite(metrics["sat/actor_train/total_loss"])
    assert "map/critic/kl" in metrics
    # params actually moved vs the frozen reference
    diff = jax.tree.map(lambda a, b: float(jnp.abs(a - b).max()),
                        pipe.actor_train.params, ref_params)
    assert max(jax.tree.leaves(diff)) > 0


def test_train_pipeline_checkpoint_resume(tmp_path):
    """Resume skips completed steps (ref rlvr_socioseg_vlm_pipeline.py:631-633,
    base_pipeline.py:41-52): a fresh pipeline with resume_from_checkpoint picks
    up the saved WorkerState and runs only the remaining steps."""
    model_config = Qwen25VLConfig.tiny(VOCAB)
    sam_config = Sam2Config.tiny_test()
    sam_params = smodel.init_params(sam_config, jax.random.key(1))
    img_cfg = ImageProcessorConfig(min_pixels=56 * 56, max_pixels=56 * 56 * 4)
    processor = SocioProcessor(TinyTokenizer(), img_cfg,
                               image_token_id=model_config.image_token_id)
    dataset = [encode_sample(t, img_cfg) for t in make_tiles(2)]
    engine_kwargs = {"max_slots": 4, "max_len": 700, "decode_chunk": 4,
                     "prefill_buckets": (640,), "image_buckets": (0, 16, 32),
                     "cache_dtype": jnp.float32}

    def make_cfg(max_steps):
        cfg = SocioSegConfig(
            output_dir=str(tmp_path), rollout_batch_size=2, prompt_length=640,
            response_length=16, save_steps=1, track_with="stdout",
            max_steps=max_steps, num_return_sequences_in_group=2,
            adv_estimator="grpo", resume_from_checkpoint=True)
        cfg.actor_infer.generating_args.max_new_tokens = 4
        cfg.actor_infer.generating_args.num_return_sequences = 2
        cfg.actor_train.backward_batch_size = 4
        return cfg

    def make_pipe(cfg):
        return SocioSegPipeline(
            cfg, model_config=model_config,
            policy_params=qmodel.init_params(model_config, jax.random.key(0),
                                             jnp.float32),
            reference_params=qmodel.init_params(model_config, jax.random.key(0),
                                                jnp.float32),
            sam_config=sam_config, sam_params=sam_params,
            processor=processor, dataset=dataset, engine_kwargs=engine_kwargs)

    pipe1 = make_pipe(make_cfg(max_steps=1))
    assert pipe1.state.step == 0      # nothing to resume yet
    pipe1.run()
    assert pipe1.state.step == 1
    import os
    assert os.path.isdir(str(tmp_path / "pipeline" / "checkpoint-1"))

    pipe2 = make_pipe(make_cfg(max_steps=2))
    assert pipe2.state.step == 1      # resumed: step 0 skipped
    assert len(pipe2.state.log_history) >= 1   # metric history re-logged
    pipe2.run()
    assert pipe2.state.step == 2
