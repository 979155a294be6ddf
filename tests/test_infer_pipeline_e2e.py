"""End-to-end SocioSeg inference pipeline smoke test: tiny random Qwen2.5-VL +
tiny random SAM2 + synthetic tiles → two-stage loop → giou file outputs
(the `start_rlvr_socioseg_pipeline_infer` parity surface, SURVEY.md §3.2)."""

import json
import os

import numpy as np
import pytest
from PIL import Image

import jax
import jax.numpy as jnp

from socioreasoner_tpu.configs.rlvr_config import SocioSegConfig
from socioreasoner_tpu.datasets.processor import (ImageProcessorConfig,
                                                  SimpleTokenizer, SocioProcessor)
from socioreasoner_tpu.datasets.socioseg import encode_sample
from socioreasoner_tpu.models.qwen2_5_vl.config import Qwen25VLConfig
from socioreasoner_tpu.models.qwen2_5_vl import model as qmodel
from socioreasoner_tpu.models.sam2.config import Sam2Config
from socioreasoner_tpu.models.sam2 import model as smodel
from socioreasoner_tpu.pipeline.rlvr.socioseg_infer_pipeline import SocioSegInferPipeline

VOCAB = 512


class TinyTokenizer(SimpleTokenizer):
    """Byte tokenizer whose special ids match Qwen25VLConfig.tiny()."""

    def __init__(self):
        super().__init__(vocab_size=VOCAB)
        self.special = {
            "<|im_start|>": 300, "<|im_end|>": 1,
            "<|vision_start|>": VOCAB - 4, "<|vision_end|>": VOCAB - 1,
            "<|image_pad|>": VOCAB - 3, "<|video_pad|>": VOCAB - 2,
            "<|endoftext|>": 0,
        }
        self.id_to_special = {v: k for k, v in self.special.items()}
        self.pad_token_id = 0
        self.eos_token_id = 1


def make_tiles(n=2):
    rng = np.random.default_rng(0)
    tiles = []
    for i in range(n):
        mask = np.zeros((96, 96), np.uint8)
        mask[20:50, 20:50] = 255
        tiles.append({
            "id": f"tile{i}",
            "map": Image.fromarray(rng.integers(0, 255, (96, 96, 3), dtype=np.uint8)),
            "sat": Image.fromarray(rng.integers(0, 255, (96, 96, 3), dtype=np.uint8)),
            "mask": Image.fromarray(mask),
            "question": "residential area",
        })
    return tiles


@pytest.fixture(scope="module")
def pipeline(tmp_path_factory):
    out_dir = str(tmp_path_factory.mktemp("infer_out"))
    model_config = Qwen25VLConfig.tiny(VOCAB)
    policy_params = qmodel.init_params(model_config, jax.random.key(0),
                                       dtype=jnp.float32)
    sam_config = Sam2Config.tiny_test()
    sam_params = smodel.init_params(sam_config, jax.random.key(1))

    img_cfg = ImageProcessorConfig(min_pixels=56 * 56, max_pixels=56 * 56 * 4)
    processor = SocioProcessor(TinyTokenizer(), img_cfg,
                               image_token_id=model_config.image_token_id)

    cfg = SocioSegConfig(
        output_dir=out_dir, rollout_batch_size=2, prompt_length=640,
        response_length=24, save_steps=-1, track_with="stdout")
    cfg.actor_infer.generating_args.max_new_tokens = 8
    cfg.actor_infer.generating_args.temperature = 1.0
    cfg.actor_infer.generating_args.num_return_sequences = 1

    dataset = [encode_sample(t, img_cfg) for t in make_tiles(2)]
    return SocioSegInferPipeline(
        cfg, model_config=model_config, policy_params=policy_params,
        sam_config=sam_config, sam_params=sam_params, processor=processor,
        dataset=dataset,
        engine_kwargs={"max_slots": 2, "max_len": 700, "decode_chunk": 4,
                       "prefill_buckets": (640,), "image_buckets": (0, 16, 32),
                       "cache_dtype": jnp.float32})


def test_infer_pipeline_runs(pipeline):
    giou = pipeline.run()
    assert 0.0 <= giou <= 1.0
    result_dir = pipeline.result_dir
    assert os.path.exists(os.path.join(result_dir, "iou_acc.txt"))
    for sub in ("stage1", "stage2", "render1", "render2"):
        files = os.listdir(os.path.join(result_dir, sub))
        assert any(f.endswith(".png") for f in files), f"no masks in {sub}"
    # responses dumped
    assert os.path.exists(os.path.join(result_dir, "stage1", "tile0.txt"))
    # random model can't produce valid bboxes → masks empty, gt non-empty → giou 0
    with open(os.path.join(result_dir, "iou_acc.txt")) as f:
        val = float(f.read().strip())
    assert val == pytest.approx(giou)


def test_segment_with_crafted_response(pipeline):
    """Drive the SAM path with a synthetic valid stage-2 response."""
    from socioreasoner_tpu.protocol import BatchProto
    rng = np.random.default_rng(2)
    sat = Image.fromarray(rng.integers(0, 255, (96, 96, 3), dtype=np.uint8))
    batch = BatchProto.from_dict(non_tensors={"seg_image": [sat]})
    resp = ('<think>x</think><answer>[{"bbox_2d": [10, 10, 60, 60], '
            '"points": [[30, 30], [40, 40]]}]</answer>')
    masks = pipeline._segment(batch, [resp], stage=2)
    assert masks[0].shape == (768, 768)
    resp_bad = "no answer tags at all"
    masks2 = pipeline._segment(batch, [resp_bad], stage=2)
    assert masks2[0].sum() == 0


def test_overlapped_matches_sequential(pipeline):
    """The request-streaming overlapped restage must produce the same texts
    and masks as the strictly sequential path (greedy decode)."""
    ga = pipeline.pipeline_config.actor_infer.generating_args
    old_temp = ga.temperature
    ga.temperature = 0.0         # greedy → deterministic
    try:
        rows = pipeline.dataset
        pipeline.pipeline_config.overlap_restage = False
        seq = pipeline._two_stage(rows)
        pipeline.pipeline_config.overlap_restage = True
        ovl = pipeline._two_stage(rows)
    finally:
        ga.temperature = old_temp
        pipeline.pipeline_config.overlap_restage = True
    assert ovl["map_texts"] == seq["map_texts"]
    assert ovl["sat_texts"] == seq["sat_texts"]
    for a, b in zip(ovl["s1_masks"], seq["s1_masks"]):
        np.testing.assert_array_equal(a, b)
    for a, b in zip(ovl["s2_masks"], seq["s2_masks"]):
        np.testing.assert_array_equal(a, b)
    assert ovl["bbox_texts"] == seq["bbox_texts"]


def test_evaluate_batch_and_grouping(pipeline):
    from socioreasoner_tpu.pipeline.rlvr.evaluation import grouped_giou
    rows = pipeline.dataset
    gious = pipeline.evaluate_batch(rows)
    assert len(gious) == len(rows)
    assert all(0.0 <= g <= 1.0 for g in gious)
    out = grouped_giou(gious, ["cityA", "cityB"])
    assert "val_iou/mean" in out and "val_iou/cityA" in out
    assert out["val_iou/cityA/count"] == 1.0
