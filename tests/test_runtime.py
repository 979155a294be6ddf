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
    # reference registry names (ref chat_template.py:36-84)
    assert get_chat_template("native")(msgs) == get_chat_template("qwen2_5")(msgs)
    lc = get_chat_template("longCOT_qwen2.5")(msgs)
    assert "boxed" in lc and "<|begin_of_thought|>" in lc
    assert get_chat_template("longcot_V3")(msgs).endswith("<think>\n")
    b = get_chat_template("base")(msgs)
    assert "User: hi Assistant:" in b and "<think>" in b
    e = get_chat_template("empty")(msgs)
    assert e == "<|im_start|>user\nhi<|im_end|>\n<|im_start|>assistant\n"
    # default system injected only when absent (ref add_default_system)
    sysmsgs = [{"role": "system", "content": "S"},
               {"role": "user", "content": "hi"}]
    assert get_chat_template("chatml")(sysmsgs).startswith(
        "<|im_start|>system\nS<|im_end|>\n")


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


class _FailingWorker(Worker):
    @register(dispatch_mode=Dispatch.ONE_TO_ALL)
    def boom(self):
        raise ValueError(f"worker {self.rank_info.rank} exploded")


def test_worker_exception_propagates_to_driver(tmp_path):
    """The reference surfaces remote exceptions to the driver with traceback
    (decorator.py:263-277 re-raise + LogMonitor/ExceptionMonitor). Here the
    thread-pool futures must do the same: a raising worker method propagates
    through both the blocking call and the lazy handle, the ExceptionMonitor
    records it with the original traceback, and the per-worker logfile gets
    the error line."""
    import logging
    from socioreasoner_tpu.runtime.log_monitor import (ExceptionMonitor,
                                                       setup_worker_logger)

    cluster = Cluster("bad", _FailingWorker, WorkerConfig(world_size=2))
    with pytest.raises(ValueError, match="exploded"):
        cluster.boom()
    lazy = cluster.boom(blocking=False)
    with pytest.raises(ValueError, match="exploded"):
        lazy.get()

    # driver-side monitoring: record → traceback preserved → threshold abort
    mon = ExceptionMonitor(stop_threshold=1)
    logger = setup_worker_logger("bad_worker", log_dir=str(tmp_path))
    try:
        cluster.boom()
    except ValueError as e:
        logger.error("rpc failed: %r", e)
        with pytest.raises(RuntimeError, match="1 worker failure"):
            mon.record("bad_worker", e)
    summary = mon.error_summary()
    assert summary and "exploded" in summary[0]["error"]
    assert "in boom" in summary[0]["traceback"]      # original frame retained
    logging.shutdown()
    logged = (tmp_path / "bad_worker.log").read_text()
    assert "rpc failed" in logged and "exploded" in logged


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


class _FakeDecodeWorker:
    """Asynchronous fake worker for scheduler unit tests: completes each ADDed
    request on a background thread after `delay` seconds, echoing the prompt's
    first token `n_out` times."""

    def __init__(self, delay=0.02, n_out=3):
        import threading
        self.delay = delay
        self.n_out = n_out
        self.inflight = 0
        self.peak_inflight = 0
        self._lock = threading.Lock()
        self._timers = []
        self.started = False

    def start_server(self):
        self.started = True

    def stop_server(self):
        for t in self._timers:
            t.cancel()

    def add_request(self, command, data):
        import threading
        from socioreasoner_tpu.utils.functionals import GenerateRequestType
        from socioreasoner_tpu.generation.engine import EngineOutput
        if command == GenerateRequestType.ALIVE_CHECK:
            return {"alive": True}
        if command == GenerateRequestType.ABORT:
            return
        assert self.started
        with self._lock:
            self.inflight += 1
            self.peak_inflight = max(self.peak_inflight, self.inflight)

        def finish():
            with self._lock:
                self.inflight -= 1
            out = EngineOutput(data["request_id"], data["prompt_ids"],
                               [data["prompt_ids"][0]] * self.n_out, "stop")
            data["callback"](out)

        t = threading.Timer(self.delay, finish)
        self._timers.append(t)
        t.start()


def test_dynamic_sampling_scheduler_concurrent():
    """Prompts stream concurrently under flow control; rejected groups are
    replaced; per-domain rewards dispatched during generation
    (ref generate_scheduler.py:336-751)."""
    from socioreasoner_tpu.configs.worker_config import GeneratingArguments
    from socioreasoner_tpu.runtime.generate_scheduler import (
        DynamicSamplingScheduler, LocalGenerateGroup)

    workers = [_FakeDecodeWorker(), _FakeDecodeWorker()]
    group = LocalGenerateGroup(workers)
    P = 4
    n = 2

    def collate(rows):
        row = rows[0]
        ids = np.full((1, P), 0, np.int64)
        ids[0, -2:] = [row["tok"], row["tok"]]
        attn = np.zeros((1, P), np.int64)
        attn[0, -2:] = 1
        return BatchProto.from_dict(
            tensors={"input_ids": ids, "attention_mask": attn},
            non_tensors={"tag": [row["tag"]]},
            meta={"pad_token_id": 0})

    # reject every group whose token is odd — those prompts must be REPLACED
    def query_filter(row, group_outputs):
        assert len(group_outputs) == n
        return row["tok"] % 2 == 0

    rewards_seen = []

    def reward_fn(texts, rows):
        rewards_seen.append(rows[0]["tok"])
        return {"response_level_rewards": np.full(len(texts), rows[0]["tok"],
                                                  np.float32)}

    dataset = [{"tok": t, "tag": "math" if t % 3 else "code"}
               for t in range(10, 40)]
    sched = DynamicSamplingScheduler(
        group, collate, reward_fns={"math": reward_fn, "code": reward_fn},
        detokenize=lambda ids: str(ids[0]), query_filter=query_filter,
        is_use_additional_prompts=True,
        max_running_requests=4, max_additional_running_prompts=3)
    ga = GeneratingArguments(max_new_tokens=4, num_return_sequences=n,
                             temperature=0.0, do_sample=False)
    batch = sched.get_batch(iter(dataset), target_prompts=4, generating_args=ga)

    assert len(batch) == 4
    # only even-token (accepted) prompts survive, in completion order
    toks = np.asarray(batch.batch["input_ids"])[:, -1]
    assert all(t % 2 == 0 for t in toks)
    out = batch.meta["output"]
    assert out.shape == (8, P + 3)
    for i in range(4):
        assert (out[2 * i, P:] == toks[i]).all()
    # rewards were dispatched per group (incl. rejected groups' domains)
    assert batch.meta["response_level_rewards"].shape == (8,)
    assert set(batch.meta["response_level_rewards"][::2]) == set(toks)
    m = batch.meta["metrics"]
    assert m["scheduler/query_filter_count"] >= 1          # odd groups rejected
    assert m["scheduler/prompt_use_count"] > 4             # replacements pulled
    assert m["scheduler/max_inflight_prompts"] > 1         # true concurrency
    assert m["scheduler/max_inflight_prompts"] <= 4 + 3    # prompt-group cap
    # per-worker request cap respected
    assert max(w.peak_inflight for w in workers) <= 4
    assert any(f"scheduler/{d}/score/mean" in m for d in ("math", "code"))


def test_dynamic_sampling_flow_control_cap():
    """max_running_requests gates admission: with one worker and cap == n,
    only one prompt group may be in flight at a time."""
    from socioreasoner_tpu.configs.worker_config import GeneratingArguments
    from socioreasoner_tpu.runtime.generate_scheduler import (
        DynamicSamplingScheduler, LocalGenerateGroup)

    worker = _FakeDecodeWorker(delay=0.01)
    P, n = 4, 2

    def collate(rows):
        ids = np.full((1, P), 0, np.int64)
        ids[0, -1] = rows[0]["tok"]
        attn = np.zeros((1, P), np.int64)
        attn[0, -1] = 1
        return BatchProto.from_dict(
            tensors={"input_ids": ids, "attention_mask": attn},
            meta={"pad_token_id": 0})

    sched = DynamicSamplingScheduler(
        LocalGenerateGroup([worker]), collate,
        max_running_requests=n, max_additional_running_prompts=8)
    ga = GeneratingArguments(max_new_tokens=4, num_return_sequences=n,
                             temperature=0.0, do_sample=False)
    batch = sched.get_batch(iter([{"tok": t} for t in range(2, 12)]),
                            target_prompts=5, generating_args=ga)
    assert len(batch) == 5
    assert worker.peak_inflight <= n
