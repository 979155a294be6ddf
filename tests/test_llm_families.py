"""Parity: generic text decoder vs HF Llama and Qwen3 (tiny random, f64)."""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from socioreasoner_tpu.models.llm import config_from_hf_dict, text_position_ids
from socioreasoner_tpu.models.qwen2_5_vl import model as qmodel
from socioreasoner_tpu.models.qwen2_5_vl.loader import load_from_torch_state_dict


@pytest.fixture(scope="module", autouse=True)
def _x64():
    jax.config.update("jax_enable_x64", True)
    yield
    jax.config.update("jax_enable_x64", False)


def _compare(hf_model, hf_cfg_dict, seed=0):
    config = config_from_hf_dict(hf_cfg_dict)
    params = load_from_torch_state_dict(config, hf_model.state_dict(),
                                        jnp.float64, with_vision=False)
    rng = np.random.default_rng(seed)
    ids = rng.integers(2, 200, size=(2, 10))
    attn = np.ones_like(ids)
    with torch.no_grad():
        want = hf_model(input_ids=torch.tensor(ids),
                        attention_mask=torch.tensor(attn)).logits.numpy()
    pos = text_position_ids(ids, attn)
    got, _ = qmodel.forward(config, params, jnp.asarray(ids), jnp.asarray(pos),
                            jnp.asarray(attn))
    np.testing.assert_allclose(np.array(got), want, atol=1e-6, rtol=1e-6)


def test_llama_parity():
    from transformers import LlamaConfig, LlamaForCausalLM
    torch.manual_seed(0)
    cfg = LlamaConfig(vocab_size=256, hidden_size=64, intermediate_size=128,
                      num_hidden_layers=2, num_attention_heads=4,
                      num_key_value_heads=2, rms_norm_eps=1e-6,
                      tie_word_embeddings=False, rope_theta=10000.0)
    model = LlamaForCausalLM(cfg).double().eval()
    _compare(model, cfg.to_dict())


def test_qwen3_parity():
    from transformers import Qwen3Config, Qwen3ForCausalLM
    torch.manual_seed(1)
    cfg = Qwen3Config(vocab_size=256, hidden_size=64, intermediate_size=128,
                      num_hidden_layers=2, num_attention_heads=4,
                      num_key_value_heads=2, head_dim=16, rms_norm_eps=1e-6,
                      tie_word_embeddings=False, rope_theta=10000.0)
    model = Qwen3ForCausalLM(cfg).double().eval()
    _compare(model, cfg.to_dict(), seed=1)


def test_qwen3_moe_parity():
    from transformers import Qwen3MoeConfig, Qwen3MoeForCausalLM
    torch.manual_seed(3)
    cfg = Qwen3MoeConfig(vocab_size=256, hidden_size=64, intermediate_size=128,
                         moe_intermediate_size=32, num_experts=4,
                         num_experts_per_tok=2, norm_topk_prob=False,
                         num_hidden_layers=2, num_attention_heads=4,
                         num_key_value_heads=2, head_dim=16, rms_norm_eps=1e-6,
                         tie_word_embeddings=False, rope_theta=10000.0,
                         decoder_sparse_step=1, mlp_only_layers=[])
    model = Qwen3MoeForCausalLM(cfg).double().eval()
    _compare(model, cfg.to_dict(), seed=3)


def test_qwen2_moe_parity():
    from transformers import Qwen2MoeConfig, Qwen2MoeForCausalLM
    torch.manual_seed(5)
    cfg = Qwen2MoeConfig(vocab_size=256, hidden_size=64, intermediate_size=128,
                         moe_intermediate_size=32,
                         shared_expert_intermediate_size=48,
                         num_experts=4, num_experts_per_tok=2,
                         norm_topk_prob=False, num_hidden_layers=2,
                         num_attention_heads=4, num_key_value_heads=2,
                         rms_norm_eps=1e-6, tie_word_embeddings=False,
                         rope_theta=10000.0, decoder_sparse_step=1,
                         mlp_only_layers=[])
    model = Qwen2MoeForCausalLM(cfg).double().eval()
    _compare(model, cfg.to_dict(), seed=5)


def test_mixtral_parity():
    from transformers import MixtralConfig, MixtralForCausalLM
    torch.manual_seed(4)
    cfg = MixtralConfig(vocab_size=256, hidden_size=64, intermediate_size=32,
                        num_local_experts=4, num_experts_per_tok=2,
                        num_hidden_layers=2, num_attention_heads=4,
                        num_key_value_heads=2, rms_norm_eps=1e-6,
                        tie_word_embeddings=False, rope_theta=10000.0)
    model = MixtralForCausalLM(cfg).double().eval()
    _compare(model, cfg.to_dict(), seed=4)


def test_qwen2_parity():
    from transformers import Qwen2Config, Qwen2ForCausalLM
    torch.manual_seed(2)
    cfg = Qwen2Config(vocab_size=256, hidden_size=64, intermediate_size=128,
                      num_hidden_layers=2, num_attention_heads=4,
                      num_key_value_heads=2, rms_norm_eps=1e-6,
                      tie_word_embeddings=False, rope_theta=10000.0)
    model = Qwen2ForCausalLM(cfg).double().eval()
    _compare(model, cfg.to_dict(), seed=2)
