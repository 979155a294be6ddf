"""Golden parity: socioreasoner_tpu Qwen2.5-VL vs HF torch eager on a tiny random
model (SURVEY.md §7 phase 2 parity gate — ref loads this family via mcore_adapter)."""

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

from socioreasoner_tpu.models.qwen2_5_vl.config import Qwen25VLConfig
from socioreasoner_tpu.models.qwen2_5_vl import model as jmodel
from socioreasoner_tpu.models.qwen2_5_vl import rope as jrope
from socioreasoner_tpu.models.qwen2_5_vl.loader import load_from_torch_state_dict
from socioreasoner_tpu.models.qwen2_5_vl.vision import vision_host_inputs

VOCAB = 512


@pytest.fixture(scope="module")
def hf_model():
    from transformers.models.qwen2_5_vl.configuration_qwen2_5_vl import (
        Qwen2_5_VLConfig, Qwen2_5_VLTextConfig, Qwen2_5_VLVisionConfig)
    from transformers.models.qwen2_5_vl.modeling_qwen2_5_vl import (
        Qwen2_5_VLForConditionalGeneration)
    torch.manual_seed(0)
    vis = Qwen2_5_VLVisionConfig(
        depth=4, hidden_size=64, intermediate_size=128, num_heads=4,
        patch_size=14, temporal_patch_size=2, spatial_merge_size=2,
        out_hidden_size=64, window_size=28, fullatt_block_indexes=[1, 3],
        in_channels=3, tokens_per_second=2)
    txt = Qwen2_5_VLTextConfig(
        vocab_size=VOCAB, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=1024, rope_theta=1000000.0, rms_norm_eps=1e-6,
        rope_scaling={"type": "mrope", "mrope_section": [2, 3, 3]},
        tie_word_embeddings=False)
    cfg = Qwen2_5_VLConfig(
        text_config=txt.to_dict(), vision_config=vis.to_dict(),
        image_token_id=VOCAB - 3, video_token_id=VOCAB - 2,
        vision_start_token_id=VOCAB - 4, vision_end_token_id=VOCAB - 1)
    model = Qwen2_5_VLForConditionalGeneration(cfg).double()
    model.eval()
    return model


@pytest.fixture(scope="module")
def jax_setup(hf_model):
    cfg = Qwen25VLConfig.tiny(VOCAB)
    params = load_from_torch_state_dict(cfg, hf_model.state_dict(), jnp.float64)
    return cfg, params


def test_text_only_logits_parity(hf_model, jax_setup):
    cfg, params = jax_setup
    rng = np.random.default_rng(0)
    ids = rng.integers(2, 200, size=(2, 12))
    attn = np.ones_like(ids)
    with torch.no_grad():
        out = hf_model(input_ids=torch.tensor(ids), attention_mask=torch.tensor(attn))
    want = out.logits.numpy()

    pos, deltas = jrope.get_rope_index(cfg, ids, None, attn)
    got, _ = jmodel.forward(cfg, params, jnp.asarray(ids), jnp.asarray(pos),
                            jnp.asarray(attn))
    np.testing.assert_allclose(np.array(got), want, atol=1e-6, rtol=1e-6)


def test_rope_index_parity_with_image(hf_model, jax_setup):
    cfg, params = jax_setup
    rng = np.random.default_rng(1)
    # prompt: [text x3, vision_start, image x4, text x4] = 12 tokens
    ids = np.array([[5, 6, 7, VOCAB - 4] + [VOCAB - 3] * 4 + [8, 9, 10, 11]])
    attn = np.ones_like(ids)
    grid = np.array([[1, 4, 4]])
    pos_hf, delta_hf = hf_model.model.get_rope_index(
        torch.tensor(ids), torch.tensor(grid), None, None, torch.tensor(attn))
    pos_j, delta_j = jrope.get_rope_index(cfg, ids, grid, attn)
    np.testing.assert_array_equal(pos_j, pos_hf.numpy().transpose(1, 0, 2))
    np.testing.assert_array_equal(delta_j, delta_hf.numpy().reshape(-1))


def test_rope_index_parity_left_pad_two_images(hf_model, jax_setup):
    cfg, params = jax_setup
    ids = np.array([[0, 0, 5, VOCAB - 4] + [VOCAB - 3] * 4 + [8, VOCAB - 4] + [VOCAB - 3] * 4 + [9, 11]])
    attn = np.array([[0, 0] + [1] * 14])
    grid = np.array([[1, 4, 4], [1, 4, 4]])
    pos_hf, delta_hf = hf_model.model.get_rope_index(
        torch.tensor(ids), torch.tensor(grid), None, None, torch.tensor(attn))
    pos_j, delta_j = jrope.get_rope_index(cfg, ids, grid, attn)
    valid = attn[0] == 1
    np.testing.assert_array_equal(pos_j[0][:, valid], pos_hf.numpy()[:, 0, :][:, valid])
    np.testing.assert_array_equal(delta_j, delta_hf.numpy().reshape(-1))


def test_vision_tower_parity(hf_model, jax_setup):
    cfg, params = jax_setup
    rng = np.random.default_rng(2)
    grid = np.array([[1, 4, 4], [1, 6, 4]])  # two images, different sizes
    S = int((grid[:, 0] * grid[:, 1] * grid[:, 2]).sum())
    patches = rng.normal(size=(S, cfg.vision.patch_input_dim)).astype(np.float64)
    with torch.no_grad():
        want = hf_model.model.visual(torch.tensor(patches), torch.tensor(grid)).numpy()
    from socioreasoner_tpu.models.qwen2_5_vl.vision import run_vision
    got = np.array(run_vision(cfg.vision, params["vision"], patches, grid))
    np.testing.assert_allclose(got, want, atol=1e-6, rtol=1e-6)


def test_full_vlm_logits_parity(hf_model, jax_setup):
    cfg, params = jax_setup
    rng = np.random.default_rng(3)
    grid = np.array([[1, 4, 4]])
    S = 16
    patches = rng.normal(size=(S, cfg.vision.patch_input_dim)).astype(np.float64)
    ids = np.array([[5, 6, 7, VOCAB - 4] + [VOCAB - 3] * 4 + [8, 9, 10, 11]])
    attn = np.ones_like(ids)
    with torch.no_grad():
        out = hf_model(input_ids=torch.tensor(ids), attention_mask=torch.tensor(attn),
                       pixel_values=torch.tensor(patches), image_grid_thw=torch.tensor(grid))
    want = out.logits.numpy()

    pos, _ = jrope.get_rope_index(cfg, ids, grid, attn)
    vi = vision_host_inputs(cfg.vision, patches, grid)
    vi = {k: jnp.asarray(v) for k, v in vi.items()}
    got, _ = jmodel.forward(cfg, params, jnp.asarray(ids), jnp.asarray(pos),
                            jnp.asarray(attn), vision_inputs=vi)
    np.testing.assert_allclose(np.array(got), want, atol=1e-6, rtol=1e-6)


def test_kv_cache_decode_matches_full_forward(jax_setup):
    cfg, params = jax_setup
    t = cfg.text
    rng = np.random.default_rng(4)
    B, P, Lmax = 2, 6, 10
    ids = rng.integers(2, 200, size=(B, P))
    attn = np.ones((B, P), np.int64)
    pos, _ = jrope.get_rope_index(cfg, ids, None, attn)

    # full forward over P+1 tokens
    next_tok = rng.integers(2, 200, size=(B, 1))
    full_ids = np.concatenate([ids, next_tok], axis=1)
    full_attn = np.ones((B, P + 1), np.int64)
    full_pos, _ = jrope.get_rope_index(cfg, full_ids, None, full_attn)
    want, _ = jmodel.forward(cfg, params, jnp.asarray(full_ids), jnp.asarray(full_pos),
                             jnp.asarray(full_attn))
    want_last = np.array(want)[:, -1]

    # prefill with cache then decode 1 step
    Hkv, D, L = t.num_key_value_heads, t.head_dim, t.num_hidden_layers
    cache = {
        "k": jnp.zeros((L, B, Lmax, Hkv, D)), "v": jnp.zeros((L, B, Lmax, Hkv, D)),
        "kv_valid": jnp.asarray((np.arange(Lmax)[None, :] < P).astype(np.int32).repeat(B, 0)),
    }
    cache_positions = jnp.broadcast_to(jnp.arange(P)[None], (B, P))
    _, cache = jmodel.forward(cfg, params, jnp.asarray(ids), jnp.asarray(pos),
                              None, cache=cache, cache_positions=cache_positions)
    cache["kv_valid"] = jnp.asarray((np.arange(Lmax)[None, :] < P + 1).astype(np.int32).repeat(B, 0))
    dec_pos = jnp.full((B, 3, 1), P)
    got, _ = jmodel.forward(cfg, params, jnp.asarray(next_tok), dec_pos, None,
                            cache=cache, cache_positions=jnp.full((B, 1), P))
    np.testing.assert_allclose(np.array(got)[:, 0], want_last, atol=1e-6, rtol=1e-6)
