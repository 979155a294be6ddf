"""Golden parity: the qwen2_vl (non-2.5) family — LayerNorm + quick-GELU ViT
with full attention every block (ref converter template.py:789) — vs HF torch
eager on a tiny random model in f64."""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp


@pytest.fixture(scope="module", autouse=True)
def _enable_x64():
    jax.config.update("jax_enable_x64", True)
    yield
    jax.config.update("jax_enable_x64", False)

from socioreasoner_tpu.models.qwen2_5_vl.config import Qwen25VLConfig
from socioreasoner_tpu.models.qwen2_5_vl import model as jmodel
from socioreasoner_tpu.models.qwen2_5_vl import rope as jrope
from socioreasoner_tpu.models.qwen2_5_vl.loader import load_from_torch_state_dict

VOCAB = 512


@pytest.fixture(scope="module")
def hf_model():
    from transformers import Qwen2VLConfig
    from transformers.models.qwen2_vl.modeling_qwen2_vl import (
        Qwen2VLForConditionalGeneration)
    torch.manual_seed(0)
    cfg = Qwen2VLConfig(
        vocab_size=VOCAB, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=1024, rope_theta=1000000.0, rms_norm_eps=1e-6,
        rope_scaling={"type": "mrope", "mrope_section": [2, 3, 3]},
        tie_word_embeddings=False,
        image_token_id=VOCAB - 3, video_token_id=VOCAB - 2,
        vision_start_token_id=VOCAB - 4, vision_end_token_id=VOCAB - 1,
        vision_config={"depth": 4, "embed_dim": 64, "mlp_ratio": 2,
                       "num_heads": 4, "patch_size": 14,
                       "temporal_patch_size": 2, "spatial_merge_size": 2,
                       "hidden_size": 64, "in_channels": 3})
    model = Qwen2VLForConditionalGeneration(cfg).double().eval()
    return model, cfg


@pytest.fixture(scope="module")
def jax_setup(hf_model):
    model, hf_cfg = hf_model
    cfg = Qwen25VLConfig.from_hf_dict(hf_cfg.to_dict())
    assert cfg.vision.variant == "qwen2"
    assert cfg.vision.fullatt_block_indexes == (0, 1, 2, 3)
    params = load_from_torch_state_dict(cfg, model.state_dict(), jnp.float64)
    return cfg, params


def test_text_only_logits_parity(hf_model, jax_setup):
    model, _ = hf_model
    cfg, params = jax_setup
    rng = np.random.default_rng(0)
    ids = rng.integers(2, 200, size=(2, 12))
    attn = np.ones_like(ids)
    with torch.no_grad():
        want = model(input_ids=torch.tensor(ids),
                     attention_mask=torch.tensor(attn)).logits.numpy()
    pos, _ = jrope.get_rope_index(cfg, ids, None, attn)
    got, _ = jmodel.forward(cfg, params, jnp.asarray(ids), jnp.asarray(pos),
                            jnp.asarray(attn))
    np.testing.assert_allclose(np.array(got), want, atol=1e-6, rtol=1e-6)


def test_vision_tower_parity(hf_model, jax_setup):
    model, _ = hf_model
    cfg, params = jax_setup
    rng = np.random.default_rng(2)
    grid = np.array([[1, 4, 4], [1, 6, 4]])
    S = int((grid[:, 0] * grid[:, 1] * grid[:, 2]).sum())
    patches = rng.normal(size=(S, cfg.vision.patch_input_dim)).astype(np.float64)
    with torch.no_grad():
        want = model.model.visual(torch.tensor(patches),
                                  torch.tensor(grid)).numpy()
    from socioreasoner_tpu.models.qwen2_5_vl.vision import run_vision
    got = np.array(run_vision(cfg.vision, params["vision"], patches, grid))
    np.testing.assert_allclose(got, want, atol=1e-6, rtol=1e-6)


def test_full_vlm_logits_parity(hf_model, jax_setup):
    model, _ = hf_model
    cfg, params = jax_setup
    rng = np.random.default_rng(3)
    grid = np.array([[1, 4, 4]])
    n_img_tokens = 4 * 4 // 4
    ids = np.array([[5, 6, VOCAB - 4] + [VOCAB - 3] * n_img_tokens + [8, 9]])
    attn = np.ones_like(ids)
    S = int(grid[:, 0] * grid[:, 1] * grid[:, 2])
    patches = rng.normal(size=(S, cfg.vision.patch_input_dim)).astype(np.float64)
    with torch.no_grad():
        want = model(input_ids=torch.tensor(ids),
                     attention_mask=torch.tensor(attn),
                     pixel_values=torch.tensor(patches),
                     image_grid_thw=torch.tensor(grid)).logits.numpy()
    from socioreasoner_tpu.models.qwen2_5_vl.vision import run_vision
    embeds = run_vision(cfg.vision, params["vision"], patches, grid)
    pos, _ = jrope.get_rope_index(cfg, ids, grid, attn)
    got, _ = jmodel.forward(cfg, params, jnp.asarray(ids), jnp.asarray(pos),
                            jnp.asarray(attn), image_embeds=embeds)
    np.testing.assert_allclose(np.array(got), want, atol=1e-6, rtol=1e-6)
