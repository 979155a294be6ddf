"""Golden parity: socioreasoner_tpu SAM2 vs HF torch Sam2Model (tiny random),
float64 exactness (the BASELINE.json config-2 'prompt→mask pixel-IoU parity' gate)."""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp


@pytest.fixture(scope="module", autouse=True)
def _enable_x64():
    """f64 exactness for golden tests, without leaking into other modules."""
    jax.config.update("jax_enable_x64", True)
    yield
    jax.config.update("jax_enable_x64", False)

from socioreasoner_tpu.models.sam2.config import Sam2Config
from socioreasoner_tpu.models.sam2 import model as smodel
from socioreasoner_tpu.models.sam2 import encoder as senc
from socioreasoner_tpu.models.sam2.loader import load_from_torch_state_dict


@pytest.fixture(scope="module")
def hf_sam2():
    from transformers.models.sam2.configuration_sam2 import (
        Sam2Config as HFSam2Config, Sam2HieraDetConfig, Sam2VisionConfig,
        Sam2MaskDecoderConfig, Sam2PromptEncoderConfig)
    from transformers.models.sam2.modeling_sam2 import Sam2Model
    torch.manual_seed(0)
    hiera = Sam2HieraDetConfig(
        hidden_size=16, blocks_per_stage=[1, 2, 2, 1],
        embed_dim_per_stage=[16, 32, 64, 128],
        num_attention_heads_per_stage=[1, 2, 2, 4],
        window_size_per_stage=[8, 4, 14, 7],
        global_attention_blocks=[4], image_size=[128, 128])
    vision = Sam2VisionConfig(
        backbone_config=hiera, backbone_channel_list=[128, 64, 32, 16],
        backbone_feature_sizes=[[32, 32], [16, 16], [8, 8]], fpn_hidden_size=32)
    cfg = HFSam2Config(
        vision_config=vision,
        prompt_encoder_config=Sam2PromptEncoderConfig(hidden_size=32, image_size=128),
        mask_decoder_config=Sam2MaskDecoderConfig(hidden_size=32, mlp_dim=64,
                                                  num_attention_heads=2,
                                                  iou_head_hidden_dim=32))
    model = Sam2Model(cfg).double()
    model.eval()
    return model


@pytest.fixture(scope="module")
def jax_sam2(hf_sam2):
    config = Sam2Config.tiny_test()
    params = load_from_torch_state_dict(config, hf_sam2.state_dict(), jnp.float64)
    return config, params


@pytest.fixture(scope="module")
def pixels():
    rng = np.random.default_rng(0)
    return rng.normal(size=(1, 3, 128, 128)).astype(np.float64)


def test_vision_encoder_parity(hf_sam2, jax_sam2, pixels):
    config, params = jax_sam2
    with torch.no_grad():
        out = hf_sam2.vision_encoder(torch.tensor(pixels))
    want_fpn = [f.numpy() for f in out.fpn_hidden_states]  # high→low, NCHW

    grid = (128 // 4, 128 // 4)
    pos = senc.hiera_pos_embed(params["encoder"]["hiera"], config.hiera, *grid)
    feats = senc.image_encoder_forward(
        config, params["encoder"], jnp.asarray(pixels.transpose(0, 2, 3, 1)),
        jnp.asarray(pos))
    assert len(feats) == 3
    for got, want in zip(feats, want_fpn):
        got_nchw = np.array(got).transpose(0, 3, 1, 2)
        np.testing.assert_allclose(got_nchw, want, atol=1e-6, rtol=1e-5)


def _full_outputs(hf_sam2, jax_sam2, pixels, *, boxes=None, points=None, labels=None,
                  mask=None):
    config, params = jax_sam2
    kwargs = {}
    if boxes is not None:
        kwargs["input_boxes"] = torch.tensor(boxes, dtype=torch.float64)
    if points is not None:
        kwargs["input_points"] = torch.tensor(points, dtype=torch.float64)
        kwargs["input_labels"] = torch.tensor(labels)
    if mask is not None:
        kwargs["input_masks"] = torch.tensor(mask, dtype=torch.float64)
    with torch.no_grad():
        out = hf_sam2(pixel_values=torch.tensor(pixels), multimask_output=True, **kwargs)
    grid = (128 // 4, 128 // 4)
    pos = senc.hiera_pos_embed(params["encoder"]["hiera"], config.hiera, *grid)
    embeddings = smodel.encode_image(config, params,
                                     jnp.asarray(pixels.transpose(0, 2, 3, 1)),
                                     jnp.asarray(pos))
    from socioreasoner_tpu.models.sam2.decoder import image_wide_positional_embedding
    image_pe = jnp.asarray(image_wide_positional_embedding(config.prompt, params["prompt"]))
    masks, iou = smodel.predict_masks(
        config, params, embeddings, image_pe,
        jnp.asarray(points) if points is not None else None,
        jnp.asarray(labels) if labels is not None else None,
        jnp.asarray(boxes) if boxes is not None else None,
        multimask_output=True,
        input_masks=(jnp.asarray(mask.transpose(0, 2, 3, 1))
                     if mask is not None else None))
    return out, np.array(masks), np.array(iou)


def test_box_prompt_parity(hf_sam2, jax_sam2, pixels):
    boxes = np.array([[[20.0, 30.0, 90.0, 100.0], [5.0, 5.0, 60.0, 64.0]]])  # (1, 2, 4)
    out, masks, iou = _full_outputs(hf_sam2, jax_sam2, pixels, boxes=boxes)
    want_masks = out.pred_masks.numpy()
    want_iou = out.iou_scores.numpy()
    np.testing.assert_allclose(masks, want_masks, atol=1e-7, rtol=1e-5)
    np.testing.assert_allclose(iou, want_iou, atol=1e-8, rtol=1e-6)


def test_point_prompt_parity(hf_sam2, jax_sam2, pixels):
    points = np.array([[[[40.0, 50.0], [70.0, 80.0]]]])   # (1, 1, 2, 2)
    labels = np.array([[[1, 1]]])
    out, masks, iou = _full_outputs(hf_sam2, jax_sam2, pixels,
                                    points=points, labels=labels)
    np.testing.assert_allclose(masks, out.pred_masks.numpy(), atol=1e-7, rtol=1e-5)
    np.testing.assert_allclose(iou, out.iou_scores.numpy(), atol=1e-8, rtol=1e-6)


def test_mask_prompt_parity(hf_sam2, jax_sam2, pixels):
    """input_masks prompt (Sam2MaskEmbedding downscaler) matches HF exactly."""
    rng = np.random.default_rng(7)
    hm = 4 * 128 // 16                                 # mask_input_size for S=128
    mask = rng.normal(size=(1, 1, hm, hm)).astype(np.float64)
    points = np.array([[[[40.0, 50.0]]]])
    labels = np.array([[[1]]])
    out, masks, iou = _full_outputs(hf_sam2, jax_sam2, pixels,
                                    points=points, labels=labels, mask=mask)
    np.testing.assert_allclose(masks, out.pred_masks.numpy(), atol=1e-7, rtol=1e-5)
    np.testing.assert_allclose(iou, out.iou_scores.numpy(), atol=1e-8, rtol=1e-6)


def test_predictor_objects_union(jax_sam2):
    """SocioSeg batched decode: union mask comes out at requested size."""
    config, params = jax_sam2
    pred = smodel.Sam2Predictor(config, params)
    rng = np.random.default_rng(1)
    img = rng.integers(0, 255, size=(96, 96, 3), dtype=np.uint8)
    pred.set_image(img)
    prompts = [{"box": [10, 10, 40, 40]},
               {"box": [50, 50, 90, 90], "points": [[60, 60]], "labels": [1]}]
    mask = pred.predict_objects_mask(prompts, out_size=(64, 64))
    assert mask.shape == (64, 64) and mask.dtype == np.uint8
    empty = pred.predict_objects_mask([], out_size=(64, 64))
    assert empty.sum() == 0


def test_bicubic_matches_torch():
    rng = np.random.default_rng(2)
    x = rng.normal(size=(7, 7, 3))
    want = torch.nn.functional.interpolate(
        torch.tensor(x.transpose(2, 0, 1)[None]), size=(32, 32), mode="bicubic"
    ).numpy()[0].transpose(1, 2, 0)
    got = senc.bicubic_resize_hw(x, 32, 32)
    np.testing.assert_allclose(got, want, atol=1e-10)


def test_batched_multi_tile_decode(jax_sam2):
    """Batched set_images + predict_objects_mask_batch vs per-tile path."""
    config, params = jax_sam2
    pred = smodel.Sam2Predictor(config, params)
    rng = np.random.default_rng(5)
    imgs = [rng.integers(0, 255, (96, 96, 3), dtype=np.uint8) for _ in range(3)]
    from PIL import Image as PILImage
    pil = [PILImage.fromarray(im) for im in imgs]
    prompts = [
        [{"box": [10, 10, 40, 40]}],
        [{"box": [5, 5, 30, 30]}, {"box": [50, 50, 90, 90],
                                   "points": [[60, 60]], "labels": [1]}],
        [{"box": [20, 20, 70, 70]}],
    ]
    # per-tile reference
    want = []
    for im, ps in zip(pil, prompts):
        pred.set_image(im)
        want.append(pred.predict_objects_mask(ps, (64, 64)))
    # batched
    pred.set_images(pil)
    got = pred.predict_objects_mask_batch(prompts, (64, 64))
    for g, w in zip(got, want):
        # batching pads point counts across tiles; SAM2's pad points carry zero
        # embeddings but still attend (HF processor semantics), so threshold-
        # boundary pixels may wiggle — require >=99% agreement
        assert (g == w).mean() > 0.99


def test_seg_strategy_batched(jax_sam2):
    from socioreasoner_tpu.distributed.seg_strategy import SegStrategy
    from socioreasoner_tpu.protocol import BatchProto
    from PIL import Image as PILImage
    config, params = jax_sam2
    strat = SegStrategy()
    strat.initialize(config, params)
    rng = np.random.default_rng(6)
    imgs = [PILImage.fromarray(rng.integers(0, 255, (96, 96, 3), dtype=np.uint8))
            for _ in range(3)]
    batch = BatchProto.from_dict(non_tensors={
        "seg_image": imgs,
        "visual_prompt": [[{"box": [10, 10, 40, 40]}], [],
                          [{"box": [20, 20, 60, 60]}]],
    })
    out = strat.segment(batch)
    assert len(out) == 3
    assert out[1]["mask"].sum() == 0           # empty prompts → empty mask
    assert all(o["mask"].shape == (768, 768) for o in out)


def test_seg_strategy_embed_cache(jax_sam2):
    """Second segment() of the SAME source images (the two-stage pipeline's
    stage-2 pass) must skip the encoder and produce identical masks."""
    from socioreasoner_tpu.distributed.seg_strategy import SegStrategy
    from socioreasoner_tpu.protocol import BatchProto
    from PIL import Image as PILImage
    config, params = jax_sam2
    strat = SegStrategy()
    strat.initialize(config, params)
    rng = np.random.default_rng(7)
    imgs = [PILImage.fromarray(rng.integers(0, 255, (96, 96, 3), dtype=np.uint8))
            for _ in range(2)]

    calls = []
    orig = strat.predictor.set_images

    def counting(images):
        calls.append(len(images))
        return orig(images)
    strat.predictor.set_images = counting

    batch = BatchProto.from_dict(non_tensors={
        "seg_image": imgs,
        "visual_prompt": [[{"box": [10, 10, 40, 40]}],
                          [{"box": [20, 20, 60, 60]}]],
    })
    out1 = strat.segment(batch)
    assert calls == [2]
    # stage-2 style pass: same sources, different prompts → no encode
    batch2 = BatchProto.from_dict(non_tensors={
        "seg_image": imgs,
        "visual_prompt": [[{"box": [10, 10, 40, 40],
                            "points": [[20, 20]], "labels": [1]}],
                          [{"box": [20, 20, 60, 60]}]],
    })
    strat.segment(batch2)
    assert calls == [2]
    # identical prompts → identical masks from the cached embeddings
    out1b = strat.segment(batch)
    assert calls == [2]
    for a, b in zip(out1, out1b):
        np.testing.assert_array_equal(a["mask"], b["mask"])
    # a NEW image object with the same pixels is a miss (keyed on identity)
    imgs2 = [im.copy() for im in imgs]
    batch3 = BatchProto.from_dict(non_tensors={
        "seg_image": imgs2,
        "visual_prompt": [[{"box": [10, 10, 40, 40]}],
                          [{"box": [20, 20, 60, 60]}]],
    })
    strat.segment(batch3)
    assert calls == [2, 2]
    # seg_embed_cache: 0 disables caching → every call re-encodes
    from socioreasoner_tpu.configs.worker_config import WorkerConfig
    wc = WorkerConfig()
    wc.strategy_args.strategy_config = {"seg_embed_cache": 0}
    strat.worker_config = wc
    strat.segment(batch)
    strat.segment(batch)
    assert calls == [2, 2, 2, 2]


def test_seg_strategy_cache_hit_subset_order(jax_sam2):
    """A cache-hit group that differs from the last encoded batch (subset, in
    reversed order) must decode from the CACHED per-image embeddings, not from
    the predictor's last set_images state (regression: predict_objects_mask_batch
    ignored its embeddings argument)."""
    from socioreasoner_tpu.distributed.seg_strategy import SegStrategy
    from socioreasoner_tpu.protocol import BatchProto
    from PIL import Image as PILImage
    config, params = jax_sam2
    rng = np.random.default_rng(11)
    imgs = [PILImage.fromarray(rng.integers(0, 255, (96, 96, 3), dtype=np.uint8))
            for _ in range(3)]
    prompts = [[{"box": [8 + 10 * i, 8, 48 + 10 * i, 48]}] for i in range(3)]

    strat = SegStrategy()
    strat.initialize(config, params)
    strat.segment(BatchProto.from_dict(non_tensors={
        "seg_image": imgs, "visual_prompt": prompts}))
    # hit the cache with a reversed 2-image subset; predictor._embeddings still
    # holds the batch-3 encode, so any leak of that state changes the masks
    out = strat.segment(BatchProto.from_dict(non_tensors={
        "seg_image": [imgs[2], imgs[0]],
        "visual_prompt": [prompts[2], prompts[0]]}))

    fresh = SegStrategy()
    fresh.initialize(config, params)
    ref = fresh.segment(BatchProto.from_dict(non_tensors={
        "seg_image": [imgs[2], imgs[0]],
        "visual_prompt": [prompts[2], prompts[0]]}))
    for a, b in zip(out, ref):
        np.testing.assert_array_equal(a["mask"], b["mask"])
