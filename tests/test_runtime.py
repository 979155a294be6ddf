"""Cluster runtime, dispatch modes, schedulers, samplers, trackers, state."""

import numpy as np
import pytest

from socioreasoner_tpu.configs.worker_config import WorkerConfig
from socioreasoner_tpu.protocol import BatchProto
from socioreasoner_tpu.runtime.cluster import Cluster
from socioreasoner_tpu.runtime.dispatch import Dispatch, register
from socioreasoner_tpu.runtime.worker import Worker


class ToyWorker(Worker):
    @register(dispatch_mode=Dispatch.DP_MP_COMPUTE)
    def double(self, data: BatchProto) -> BatchProto:
        return BatchProto.from_dict(tensors={"y": np.asarray(data.batch["x"]) * 2})

    @register(dispatch_mode=Dispatch.ONE_TO_ALL)
    def rank(self):
        return self.rank_info.rank

    @register(dispatch_mode=Dispatch.ONE_TO_ALL_ONE)
    def first_only(self, v):
        return (self.rank_info.rank, v)


def test_cluster_dp_compute_chunks_and_concats():
    cluster = Cluster("toy", ToyWorker, WorkerConfig(world_size=3))
    data = BatchProto.from_dict(tensors={"x": np.arange(7)})
    out = cluster.double(data)
    np.testing.assert_array_equal(out.batch["y"], np.arange(7) * 2)


def test_cluster_one_to_all_modes():
    cluster = Cluster("toy", ToyWorker, WorkerConfig(world_size=4))
    assert sorted(cluster.rank()) == [0, 1, 2, 3]
    assert cluster.first_only(9) == (0, 9)


def test_cluster_nonblocking():
    cluster = Cluster("toy", ToyWorker, WorkerConfig(world_size=2))
    data = BatchProto.from_dict(tensors={"x": np.arange(4)})
    handle = cluster.double(data, blocking=False)
    out = handle.get()
    np.testing.assert_array_equal(out.batch["y"], np.arange(4) * 2)


def test_worker_cls_string_resolution():
    cluster = Cluster("toy", "tests.test_runtime.ToyWorker", WorkerConfig(world_size=1))
    assert cluster.rank() == [0]


def test_generate_scheduler_level1():
    """Request-level streaming against real tiny engines (ref opt level 1)."""
    import jax
    import jax.numpy as jnp
    from socioreasoner_tpu.models.qwen2_5_vl.config import Qwen25VLConfig
    from socioreasoner_tpu.models.qwen2_5_vl import model as qmodel
    from socioreasoner_tpu.configs.worker_config import GeneratingArguments
    from socioreasoner_tpu.distributed.jax_strategies import JaxDecodeStrategy
    from socioreasoner_tpu.distributed.strategy import ParamStore
    from socioreasoner_tpu.pipeline.base_worker import ActorWorker
    from socioreasoner_tpu.runtime.generate_scheduler import GenerateScheduler

    config = Qwen25VLConfig.tiny()
    params = qmodel.init_params(config, jax.random.key(0), jnp.float32,
                                with_vision=False)
    store = ParamStore()
    store.put("rollout", params)
    cluster = Cluster("actor_infer", ActorWorker, WorkerConfig(world_size=2))
    for w in cluster.workers:
        strat = JaxDecodeStrategy(worker_config=w.worker_config, param_store=store)
        strat.initialize(config, engine_kwargs={
            "max_slots": 2, "max_len": 64, "decode_chunk": 4,
            "prefill_buckets": (16,), "cache_dtype": jnp.float32})
        w.initialize(strategy=strat)

    rng = np.random.default_rng(0)
    P = 8
    ids = np.zeros((3, P), np.int64)
    attn = np.zeros((3, P), np.int64)
    for i in range(3):
        L = 5 + i
        ids[i, P - L:] = rng.integers(2, 200, L)
        attn[i, P - L:] = 1
    pos = np.broadcast_to(np.clip(np.cumsum(attn, -1) - 1, 0, None)[:, None, :],
                          (3, 3, P))
    batch = BatchProto.from_dict(tensors={
        "input_ids": ids, "attention_mask": attn, "position_ids": np.ascontiguousarray(pos)})
    ga = GeneratingArguments(max_new_tokens=4, temperature=0.0, do_sample=False,
                             num_return_sequences=2)
    sched = GenerateScheduler(cluster)
    out = sched.generate_requests(batch, ga)
    seqs = out.batch["output"]
    assert seqs.shape[0] == 6
    # prompt part preserved per row
    for i in range(3):
        for j in range(2):
            np.testing.assert_array_equal(seqs[i * 2 + j, :P], ids[i])
    # greedy → both samples of a prompt identical
    np.testing.assert_array_equal(seqs[0], seqs[1])


def test_batch_stratified_sampler():
    from socioreasoner_tpu.datasets.sampler import BatchStratifiedSampler
    domains = ["a"] * 10 + ["b"] * 10
    s = BatchStratifiedSampler(domains, {"a": 0.5, "b": 0.5}, batch_size=4, seed=0)
    batches = list(s)
    assert all(len(b) == 4 for b in batches)
    for b in batches:
        kinds = [domains[i] for i in b]
        assert kinds.count("a") == 2 and kinds.count("b") == 2


def test_chat_templates():
    from socioreasoner_tpu.datasets.chat_template import get_chat_template
    msgs = [{"role": "user", "content": "hi"}]
    text = get_chat_template("qwen2-vl")(msgs)
    assert text.endswith("<|im_start|>assistant\n")
    assert "<|im_start|>user\nhi<|im_end|>" in text
    assert get_chat_template("longcot")(msgs).endswith("<think>\n")
    with pytest.raises(KeyError):
        get_chat_template("nope")


def test_worker_state_roundtrip(tmp_path):
    from socioreasoner_tpu.utils.worker_state import WorkerState
    s = WorkerState()
    s.log({"loss": 1.0}, 0)
    s.step = 5
    d = str(tmp_path / "ckpt")
    s.save(d)
    s2 = WorkerState.load(d)
    assert s2.step == 5 and s2.log_history[0]["loss"] == 1.0
    assert WorkerState.latest_checkpoint(str(tmp_path)) is None


def test_metrics_manager():
    from socioreasoner_tpu.utils.metrics import MetricsManager
    mm = MetricsManager()
    mm.add_metric("a", 1.0)
    mm.add_metric("a", 3.0)
    with mm.timer("x"):
        pass
    mm.add_token_throughput("p/", 100, 2.0, n_chips=2)
    out = mm.reduce()
    assert out["a/mean"] == 2.0 and out["a/max"] == 3.0
    assert "time/x" in out
    assert out["system/p/tps"] == 50.0 and out["system/p/tps_chip"] == 25.0


def test_exception_monitor():
    from socioreasoner_tpu.runtime.log_monitor import ExceptionMonitor
    mon = ExceptionMonitor(stop_threshold=2)
    mon.record("w0", ValueError("x"))
    with pytest.raises(RuntimeError, match="2 worker failure"):
        mon.record("w1", ValueError("y"))


def test_trackers(tmp_path):
    from socioreasoner_tpu.utils.tracking import create_tracker
    t = create_tracker("file", log_dir=str(tmp_path))
    t.log({"m": 1.5}, step=3)
    t.close()
    import json
    rec = json.loads(open(t.path).read().splitlines()[0])
    assert rec["m"] == 1.5 and rec["step"] == 3
    tb = create_tracker("tensorboard", log_dir=str(tmp_path / "tb"))
    tb.log({"m": 2.0}, step=1)
    tb.close()
