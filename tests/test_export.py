"""HF export roundtrip: params → safetensors → loader → identical params, and
HF transformers can load the exported checkpoint."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from socioreasoner_tpu.models.qwen2_5_vl.config import Qwen25VLConfig
from socioreasoner_tpu.models.qwen2_5_vl import model as qmodel
from socioreasoner_tpu.models.qwen2_5_vl.export import save_pretrained
from socioreasoner_tpu.models.qwen2_5_vl.loader import load_pretrained


def test_export_roundtrip(tmp_path):
    config = Qwen25VLConfig.tiny(256)
    params = qmodel.init_params(config, jax.random.key(0), jnp.float32)
    path = str(tmp_path / "ckpt")
    save_pretrained(config, params, path)

    config2, params2 = load_pretrained(path, dtype=jnp.float32)
    assert config2.text.hidden_size == config.text.hidden_size
    assert config2.vision.depth == config.vision.depth
    diffs = jax.tree.map(lambda a, b: float(jnp.abs(a - b).max()), params, params2)
    assert max(jax.tree.leaves(diffs)) < 1e-6


def test_export_loads_in_transformers(tmp_path):
    import torch
    from transformers.models.qwen2_5_vl.modeling_qwen2_5_vl import (
        Qwen2_5_VLForConditionalGeneration)
    config = Qwen25VLConfig.tiny(256)
    params = qmodel.init_params(config, jax.random.key(1), jnp.float32)
    path = str(tmp_path / "hf_ckpt")
    save_pretrained(config, params, path)
    model = Qwen2_5_VLForConditionalGeneration.from_pretrained(path)
    # weight actually carried over (not reinitialized)
    got = model.model.language_model.embed_tokens.weight.detach().numpy()
    np.testing.assert_allclose(got, np.asarray(params["embed"]), atol=1e-6)

    # and the loaded torch model agrees with our forward
    from socioreasoner_tpu.models.qwen2_5_vl import rope as qrope
    rng = np.random.default_rng(0)
    ids = rng.integers(2, 200, size=(1, 8))
    attn = np.ones_like(ids)
    with torch.no_grad():
        want = model(input_ids=torch.tensor(ids),
                     attention_mask=torch.tensor(attn)).logits.numpy()
    pos, _ = qrope.get_rope_index(config, ids, None, attn)
    got_logits, _ = qmodel.forward(config, params, jnp.asarray(ids),
                                   jnp.asarray(pos), jnp.asarray(attn))
    np.testing.assert_allclose(np.array(got_logits), want, atol=2e-4, rtol=1e-3)


def test_export_roundtrip_moe(tmp_path):
    """MoE expert stacks export (qwen3_moe naming) and reload identically."""
    from socioreasoner_tpu.models.qwen2_5_vl.config import TextConfig, VisionConfig
    from socioreasoner_tpu.models.qwen2_5_vl.loader import (iter_safetensors,
                                                            load_params)
    config = Qwen25VLConfig(
        vision=VisionConfig(depth=1, hidden_size=16, intermediate_size=32,
                            num_heads=2, out_hidden_size=32),
        text=TextConfig(vocab_size=128, hidden_size=32, intermediate_size=16,
                        num_hidden_layers=2, num_attention_heads=4,
                        num_key_value_heads=2, head_dim=8,
                        mrope_section=(2, 1, 1), tie_word_embeddings=False,
                        use_qk_norm=True, n_experts=4, n_experts_per_tok=2,
                        attention_bias=False),
        bos_token_id=0, eos_token_id=1, pad_token_id=0)
    params = qmodel.init_params(config, jax.random.key(2), jnp.float32,
                                with_vision=False)
    path = str(tmp_path / "moe_ckpt")
    save_pretrained(config, params, path)
    params2 = load_params(config, iter_safetensors(path), jnp.float32,
                          with_vision=False)
    diffs = jax.tree.map(lambda a, b: float(jnp.abs(a - b).max()), params, params2)
    assert max(jax.tree.leaves(diffs)) < 1e-6
