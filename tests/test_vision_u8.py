"""Deferred-patchify path: device-side normalize+patchify must match the host
Qwen2VL patchify exactly, and the u8 ViT entry must reproduce run_vision."""

import numpy as np
from PIL import Image

import jax
import jax.numpy as jnp

from socioreasoner_tpu.datasets.processor import (ImageProcessorConfig,
                                                  patchify_image,
                                                  process_images, resized_u8)
from socioreasoner_tpu.models.qwen2_5_vl.config import Qwen25VLConfig
from socioreasoner_tpu.models.qwen2_5_vl import model as qmodel
from socioreasoner_tpu.models.qwen2_5_vl.vision import (patchify_device,
                                                        run_vision,
                                                        run_vision_u8)


def _img(rng, h=96, w=124):
    return Image.fromarray(rng.integers(0, 255, (h, w, 3), dtype=np.uint8))


def test_patchify_device_matches_host():
    cfg = ImageProcessorConfig(min_pixels=56 * 56, max_pixels=56 * 56 * 16)
    rng = np.random.default_rng(0)
    img = _img(rng)
    flat_host, grid = patchify_image(img, cfg)
    u8 = resized_u8(img, cfg)
    flat_dev = np.asarray(patchify_device(
        jnp.asarray(u8), jnp.asarray(cfg.image_mean, jnp.float32),
        jnp.asarray(cfg.image_std, jnp.float32), ps=cfg.patch_size,
        ms=cfg.merge_size, tps=cfg.temporal_patch_size))
    assert flat_dev.shape == flat_host.shape
    assert grid == (1, u8.shape[0] // cfg.patch_size,
                    u8.shape[1] // cfg.patch_size)
    np.testing.assert_allclose(flat_dev, flat_host, atol=2e-6)


def test_process_images_defer_carrier():
    cfg = ImageProcessorConfig(min_pixels=56 * 56, max_pixels=56 * 56 * 16,
                               defer_patchify=True)
    rng = np.random.default_rng(1)
    out = process_images([_img(rng), _img(rng, 68, 68)], cfg)
    assert "pixel_values" not in out
    assert len(out["pixel_u8"]) == 2
    # grids must equal the non-deferred path's
    cfg2 = ImageProcessorConfig(min_pixels=56 * 56, max_pixels=56 * 56 * 16)
    rng = np.random.default_rng(1)
    ref = process_images([_img(rng), _img(rng, 68, 68)], cfg2)
    np.testing.assert_array_equal(out["image_grid_thw"], ref["image_grid_thw"])


def test_run_vision_u8_matches_run_vision():
    cfg = ImageProcessorConfig(min_pixels=56 * 56, max_pixels=56 * 56 * 16)
    model_config = Qwen25VLConfig.tiny()
    vcfg = model_config.vision
    params = qmodel.init_params(model_config, jax.random.key(3),
                                dtype=jnp.float32, with_vision=True)
    rng = np.random.default_rng(2)
    imgs = [_img(rng), _img(rng, 68, 96)]
    host = process_images(imgs, cfg)
    ref = np.asarray(run_vision(vcfg, params["vision"], host["pixel_values"],
                                host["image_grid_thw"]))
    u8s = [resized_u8(i, cfg) for i in imgs]
    got = np.asarray(run_vision_u8(vcfg, params["vision"], u8s,
                                   host["image_grid_thw"], cfg))
    np.testing.assert_allclose(got, ref, atol=1e-5, rtol=1e-5)


def test_batch_image_embeds_packed_matches_per_sample():
    """batch_image_embeds packs all samples into one tower dispatch; outputs
    must match per-sample run_vision_u8 calls (segmented attention isolates
    images, so packing is numerically the per-image computation)."""
    from socioreasoner_tpu.distributed.jax_strategies import batch_image_embeds
    from socioreasoner_tpu.protocol import BatchProto

    cfg = ImageProcessorConfig(min_pixels=56 * 56, max_pixels=56 * 56 * 16,
                               defer_patchify=True)
    model_config = Qwen25VLConfig.tiny()
    params = qmodel.init_params(model_config, jax.random.key(3),
                                dtype=jnp.float32, with_vision=True)
    rng = np.random.default_rng(5)
    # 3 samples: 2 images / none / 1 image (mixed sizes)
    sample_imgs = [[_img(rng), _img(rng, 68, 96)], None, [_img(rng, 68, 68)]]
    u8_col, grid_col = [], []
    for imgs in sample_imgs:
        if imgs is None:
            u8_col.append(None)
            grid_col.append(None)
        else:
            out = process_images(imgs, cfg)
            u8_col.append(out["pixel_u8"])
            grid_col.append(out["image_grid_thw"])
    batch = BatchProto.from_dict(
        tensors={"input_ids": np.zeros((3, 4), np.int64)},
        non_tensors={"pixel_u8": np.array(u8_col + [0], object)[:3],
                     "grid_thw": np.array(grid_col + [0], object)[:3]})
    got = batch_image_embeds(model_config, params, batch, image_config=cfg)
    assert got[1] is None
    for i in (0, 2):
        ref = np.asarray(run_vision_u8(model_config.vision, params["vision"],
                                       u8_col[i], grid_col[i], cfg))
        np.testing.assert_allclose(np.asarray(got[i]), ref,
                                   atol=2e-5, rtol=2e-5)
