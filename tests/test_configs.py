"""Config system tests: yaml → dataclasses, including a port of the reference's
train yaml shape (examples/train/rlvr_megatron.yaml)."""

import textwrap

import pytest

from socioreasoner_tpu.configs.loader import from_dict, load_config, load_yaml
from socioreasoner_tpu.configs.rlvr_config import RLVRConfig, SocioSegConfig
from socioreasoner_tpu.configs.worker_config import WorkerConfig

YAML = """
exp_name: "qwen2_5_vl_3B_socioseg"
seed: 42
output_dir: ./output/train
pretrain: Qwen/Qwen2.5-VL-3B-Instruct
save_steps: 20
rollout_batch_size: 128
num_return_sequences_in_group: 8
is_num_return_sequences_expand: true
prompt_length: 4096
response_length: 2048
ppo_epochs: 1
reward_clip: 10
advantage_clip: 10.0
whiten_advantages: false
init_kl_coef: 0.0
adv_estimator: "grpo"
use_kl_loss: true
kl_loss_coef: 5.0e-3
actor_train:
  model_args:
    dtype: bf16
    max_pixels: 1344 * 1344
  training_args:
    learning_rate: 1.0e-6
    per_device_train_batch_size: 2
    gradient_accumulation_steps: 4
    num_train_epochs: 10
  strategy_args:
    strategy_name: jax_train
    strategy_config:
      tensor_model_parallel_size: 2
      sequence_parallel: true
  device_mapping: list(range(0,4))
  infer_batch_size: 8
actor_infer:
  generating_args:
    max_new_tokens: ${response_length}
    top_p: 0.99
    temperature: 0.99
    num_return_sequences: ${num_return_sequences_in_group}
  strategy_args:
    strategy_name: jax_decode
  device_mapping: list(range(0,4))
seg_infer:
  model_args:
    model_name_or_path: facebook/sam2-hiera-large
  strategy_args:
    strategy_name: seg_infer
  device_mapping: list(range(0,4))
reference:
  strategy_args:
    strategy_name: jax_infer
  device_mapping: list(range(0,4))
rewards:
  socioseg_rule:
    worker_cls: socioreasoner_tpu.pipeline.rlvr.rewards.socioseg_worker.SocioSegRuleRewardWorker
    world_size: 16
    infer_batch_size: 4
"""


def test_full_socioseg_yaml(tmp_path):
    p = tmp_path / "cfg.yaml"
    p.write_text(YAML)
    cfg = load_config(SocioSegConfig, str(p))
    assert cfg.rollout_batch_size == 128
    assert cfg.sequence_length == 4096 + 2048
    assert cfg.actor_train.training_args.learning_rate == 1e-6
    assert cfg.actor_train.model_args.pixels("max_pixels") == 1344 * 1344
    assert cfg.actor_train.resolved_device_mapping() == [0, 1, 2, 3]
    assert cfg.actor_train.strategy_args.config["tensor_model_parallel_size"] == 2
    # ${...} interpolation resolved
    assert cfg.actor_infer.generating_args.max_new_tokens == 2048
    assert cfg.actor_infer.generating_args.num_return_sequences == 8
    assert cfg.rewards["socioseg_rule"].world_size == 16
    assert cfg.kl_loss_coef == pytest.approx(5e-3)


def test_unknown_key_collected_or_rejected():
    # WorkerConfig has extra_fields → unknown keys collected there
    cfg = from_dict(WorkerConfig, {"model_args": {}, "not_a_field_xyz_qq": 1})
    assert cfg.extra_fields == {"not_a_field_xyz_qq": 1}
    # dataclasses without extra_fields reject unknown keys
    from socioreasoner_tpu.configs.worker_config import StrategyArguments
    with pytest.raises(ValueError, match="unknown config keys"):
        from_dict(StrategyArguments, {"strategy_name": "x", "bogus": 2})


def test_defaults_include(tmp_path):
    (tmp_path / "base.yaml").write_text("seed: 7\nexp_name: base\n")
    (tmp_path / "main.yaml").write_text(textwrap.dedent("""
        defaults:
          - base
        exp_name: main
    """))
    data = load_yaml(str(tmp_path / "main.yaml"))
    assert data["seed"] == 7
    assert data["exp_name"] == "main"


def test_set_max_steps():
    cfg = RLVRConfig(rollout_batch_size=4)
    cfg.actor_train.training_args.num_train_epochs = 2
    cfg.set_max_steps(dataset_len=40)
    assert cfg.max_steps == 20
    assert cfg.actor_train.training_args.max_steps == 20
