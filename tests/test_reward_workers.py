"""Config-driven reward plug-point + model-based RewardWorker (VERDICT r2
Missing #5/#6): a yaml `rewards:` worker_cls string resolves through the
Cluster and scores through compute_rewards_split / compute_rewards; the
sequence-classification RM reads its value head at the last non-pad token
(ref roll/pipeline/base_worker.py:537-603)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from socioreasoner_tpu.configs.loader import load_config
from socioreasoner_tpu.configs.rlvr_config import SocioSegConfig
from socioreasoner_tpu.models.qwen2_5_vl.config import Qwen25VLConfig
from socioreasoner_tpu.models.qwen2_5_vl import model as qmodel
from socioreasoner_tpu.protocol import BatchProto
from socioreasoner_tpu.runtime.cluster import Cluster

VOCAB = 512

YAML = """
exp_name: reward_plugpoint
rewards:
  socioseg_rule:
    worker_cls: socioreasoner_tpu.pipeline.base_worker.SocioSegRuleRewardWorker
    world_size: 3
    infer_batch_size: 4
"""


def _socioseg_reward_batch(n=5):
    """Columns compute_rewards_split consumes, with parseable responses."""
    resp = ('<think>ok</think><answer>[{"bbox_2d": [10, 10, 50, 50]}]'
            '</answer>')
    sat = ('<think>ok</think><answer>[{"bbox_2d": [10, 10, 50, 50], '
           '"points": [[20, 20], [30, 30]]}]</answer>')
    mask = np.zeros((768, 768), np.uint8)
    mask[10:50, 10:50] = 1
    gt = np.zeros((768, 768), np.uint8)
    gt[10:50, 10:50] = 255
    return BatchProto.from_dict(non_tensors={
        "map_response_text": [resp] * n,
        "sat_response_text": [sat] * n,
        "map_mask": [mask] * n, "sat_mask": [mask] * n,
        "gt_mask": [gt] * n,
        "gt_bbox": ['[{"bbox_2d": [10, 10, 50, 50]}]'] * n,
        "bboxs_text": ['[{"bbox_2d": [10, 10, 50, 50]}]'] * n,
    })


def test_worker_cls_from_yaml_through_cluster(tmp_path):
    """The VERDICT done-criterion: load the worker_cls string from a yaml,
    build the Cluster, run compute_rewards_split through it."""
    path = tmp_path / "cfg.yaml"
    path.write_text(YAML)
    cfg = load_config(SocioSegConfig, str(path))
    name, wc = next(iter(cfg.rewards.items()))
    assert wc.worker_cls.endswith("SocioSegRuleRewardWorker")
    cluster = Cluster(name, wc.worker_cls, wc)
    assert len(cluster.workers) == 3
    cluster.initialize(pipeline_config=cfg, tokenizer=None)
    out = cluster.compute_rewards_split(_socioseg_reward_batch(5))
    # 5 rows chunked over 3 workers, concatenated + unpadded back to 5
    assert out.batch["map_response_level_rewards"].shape == (5,)
    assert out.batch["seg_iou_rewards"].shape == (5,)
    # perfect bbox + mask match → positive rewards
    assert float(out.batch["seg_iou_rewards"].mean()) > 0.9


def test_socioseg_pipeline_uses_reward_cluster(tmp_path):
    """SocioSegPipeline builds the reward Cluster from cfg.rewards and its
    _compute_rewards path routes through it with exact full-batch metrics."""
    from socioreasoner_tpu.configs.worker_config import WorkerConfig
    from socioreasoner_tpu.pipeline.rlvr.socioseg_pipeline import SocioSegPipeline

    pipe = SocioSegPipeline.__new__(SocioSegPipeline)   # reward path only
    cfg = SocioSegConfig(output_dir=str(tmp_path))
    wc = WorkerConfig(
        worker_cls="socioreasoner_tpu.pipeline.base_worker."
                   "SocioSegRuleRewardWorker", world_size=2)
    pipe.reward_cluster = Cluster("socioseg_rule", wc.worker_cls, wc)
    pipe.reward_cluster.initialize(pipeline_config=cfg, tokenizer=None)

    batch = _socioseg_reward_batch(4)
    expanded = BatchProto.from_dict(non_tensors={
        "gt_mask": list(batch.non_tensor["gt_mask"]),
        "gt_bbox": list(batch.non_tensor["gt_bbox"])})
    out = pipe._compute_rewards(
        expanded, list(batch.non_tensor["map_response_text"]),
        list(batch.non_tensor["sat_response_text"]),
        list(batch.non_tensor["map_mask"]), list(batch.non_tensor["sat_mask"]),
        list(batch.non_tensor["bboxs_text"]))
    assert out["map_response_level_rewards"].shape == (4,)
    assert "seg_iou_reward_mean" in out["metrics"] or out["metrics"]

    # inline path produces the same numbers (plug-point is behavior-neutral)
    pipe2 = SocioSegPipeline.__new__(SocioSegPipeline)
    pipe2.reward_cluster = None
    ref = pipe2._compute_rewards(
        expanded, list(batch.non_tensor["map_response_text"]),
        list(batch.non_tensor["sat_response_text"]),
        list(batch.non_tensor["map_mask"]), list(batch.non_tensor["sat_mask"]),
        list(batch.non_tensor["bboxs_text"]))
    np.testing.assert_allclose(out["map_response_level_rewards"],
                               ref["map_response_level_rewards"])
    np.testing.assert_allclose(out["sat_response_level_rewards"],
                               ref["sat_response_level_rewards"])


def test_rule_reward_worker_cluster_math():
    """Generic domain worker (the rlvr rewards: plug-point): math rule reward
    through a 2-worker cluster."""
    from socioreasoner_tpu.configs.worker_config import WorkerConfig
    from socioreasoner_tpu.pipeline.rlvr.rlvr_pipeline import RLVRPipeline
    wc = WorkerConfig(
        worker_cls="socioreasoner_tpu.pipeline.base_worker.MathRuleRewardWorker",
        world_size=2)
    cluster = Cluster("math_rule", wc.worker_cls, wc)
    cluster.initialize(pipeline_config=None, tokenizer=None)
    fn = RLVRPipeline._cluster_reward_fn(cluster)
    out = fn(["<think>x</think><answer>42</answer>",
              "<think>x</think><answer>7</answer>"], ["42", "9"])
    r = np.asarray(out["response_level_rewards"], np.float32)
    assert r.shape == (2,)
    assert r[0] > r[1]          # correct answer scores higher


def test_model_based_reward_worker_scores_at_eos():
    """JaxRewardStrategy + RewardWorker: reward == value-head output at the
    last non-pad position (ref :585-589 indexing, incl. the no-pad wrap)."""
    from socioreasoner_tpu.distributed.jax_strategies import JaxRewardStrategy
    from socioreasoner_tpu.distributed.trainer import add_value_head
    from socioreasoner_tpu.models.qwen2_5_vl import rope as qrope
    from socioreasoner_tpu.pipeline.base_worker import RewardWorker

    model_config = Qwen25VLConfig.tiny(VOCAB)
    params = qmodel.init_params(model_config, jax.random.key(0), jnp.float32)
    params = add_value_head(params, jax.random.key(2),
                            model_config.text.hidden_size)
    strategy = JaxRewardStrategy()
    strategy.initialize(model_config, params)

    rng = np.random.default_rng(0)
    B, L = 3, 16
    pad = model_config.pad_token_id
    ids = rng.integers(2, VOCAB - 10, size=(B, L))
    # row 0: right-padded at 10; row 1: full (no pad); row 2: padded at 12
    ids[0, 10:] = pad
    ids[2, 12:] = pad
    attn = (ids != pad).astype(np.int64)
    pos, _ = qrope.get_rope_index(model_config, ids, None, attn)

    from socioreasoner_tpu.configs.worker_config import WorkerConfig
    worker = RewardWorker(worker_config=WorkerConfig())
    worker.initialize(pipeline_config=None, strategy=strategy)
    data = BatchProto.from_dict(
        tensors={"input_ids": ids, "attention_mask": attn,
                 "position_ids": pos},
        meta={"pad_token_id": pad})
    out = worker.compute_rewards(data)
    token_level = out.batch["token_level_rewards"]
    resp = out.batch["response_level_rewards"]
    assert token_level.shape == (B, L - 1)
    # manual: last non-pad index in the shifted frame
    expect_idx = [8, L - 2, 10]
    for b in range(B):
        np.testing.assert_allclose(resp[b], token_level[b, expect_idx[b]])

    # missing value head fails loudly
    bare = qmodel.init_params(model_config, jax.random.key(0), jnp.float32)
    with pytest.raises(ValueError, match="value head"):
        JaxRewardStrategy().initialize(model_config, bare)
