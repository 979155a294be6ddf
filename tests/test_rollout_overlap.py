"""Train-pipeline overlapped rollout parity: the request-streaming rollout
(_rollout_overlapped) must produce exactly the sequential rollout's sequences,
texts, masks and stage-2 tensors under greedy sampling (order-invariant)."""

import numpy as np
import pytest

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
from socioreasoner_tpu.utils.metrics import MetricsManager
from tests.test_infer_pipeline_e2e import TinyTokenizer, make_tiles

VOCAB = 512


def _make_pipe(tmp_path):
    model_config = Qwen25VLConfig.tiny(VOCAB)
    policy = qmodel.init_params(model_config, jax.random.key(0), jnp.float32)
    ref = qmodel.init_params(model_config, jax.random.key(0), jnp.float32)
    sam_config = Sam2Config.tiny_test()
    sam_params = smodel.init_params(sam_config, jax.random.key(1))
    img_cfg = ImageProcessorConfig(min_pixels=56 * 56, max_pixels=56 * 56 * 4)
    processor = SocioProcessor(TinyTokenizer(), img_cfg,
                               image_token_id=model_config.image_token_id)
    cfg = SocioSegConfig(
        output_dir=str(tmp_path), rollout_batch_size=2, prompt_length=640,
        response_length=16, save_steps=-1, track_with="stdout", max_steps=1,
        num_return_sequences_in_group=2, adv_estimator="grpo",
        use_kl_loss=True, kl_loss_coef=5e-3)
    cfg.actor_infer.generating_args.max_new_tokens = 6
    cfg.actor_infer.generating_args.num_return_sequences = 2
    cfg.actor_infer.generating_args.do_sample = False
    cfg.actor_infer.generating_args.temperature = 0.0
    dataset = [encode_sample(t, img_cfg) for t in make_tiles(2)]
    pipe = SocioSegPipeline(
        cfg, model_config=model_config, policy_params=policy,
        reference_params=ref, sam_config=sam_config, sam_params=sam_params,
        processor=processor, dataset=dataset,
        engine_kwargs={"max_slots": 4, "max_len": 700, "decode_chunk": 4,
                       "prefill_buckets": (640,), "image_buckets": (0, 16, 32),
                       "cache_dtype": jnp.float32})
    return pipe, dataset


def test_overlapped_rollout_matches_sequential(tmp_path):
    pipe, dataset = _make_pipe(tmp_path)
    batch = pipe.collator(dataset)
    rollout = pipe.param_store.get("rollout")
    mm = MetricsManager()

    seq = pipe._rollout_sequential(dataset, batch, rollout, mm)
    ovl = pipe._rollout_overlapped(dataset, batch, rollout)

    assert ovl["map_texts"] == seq["map_texts"]
    assert ovl["sat_texts"] == seq["sat_texts"]
    assert ovl["bbox_texts"] == seq["bbox_texts"]
    np.testing.assert_array_equal(ovl["seqs1"], seq["seqs1"])
    np.testing.assert_array_equal(ovl["seqs2"], seq["seqs2"])
    np.testing.assert_array_equal(ovl["s2_input_ids"], seq["s2_input_ids"])
    np.testing.assert_array_equal(ovl["s2_attention_mask"],
                                  seq["s2_attention_mask"])
    np.testing.assert_array_equal(ovl["s2_position_ids"],
                                  seq["s2_position_ids"])
    for a, b in zip(ovl["map_masks"], seq["map_masks"]):
        np.testing.assert_array_equal(a, b)
    for a, b in zip(ovl["sat_masks"], seq["sat_masks"]):
        np.testing.assert_array_equal(a, b)
    for a, b in zip(ovl["embeds2"], seq["embeds2"]):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-5)


def test_validate_runs_through_overlapped_rollout(tmp_path):
    """_validate (val_iou/* every eval_steps, ref val_multi :1165) rides the
    same streaming rollout plane with greedy n=1 sampling."""
    pipe, dataset = _make_pipe(tmp_path)
    pipe.val_dataset = dataset
    metrics = pipe._validate()
    assert "val_iou/mean" in metrics
    assert 0.0 <= metrics["val_iou/mean"] <= 1.0
