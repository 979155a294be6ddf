"""Prefix forking: identical prompts (GRPO n-sampling, ref generate_scheduler
per-prompt fan-out of n samples) prefill ONCE and siblings device-copy the
leader's KV rows, drawing their first token in the next decode step.

The fork is exact: the sibling's first decode step rewrites an identical KV
entry at P-1 (same token, same M-RoPE position, same causal context) and
samples from the same last-position logits the leader's first token came from.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from socioreasoner_tpu.generation.engine import DecodeEngine, Request
from socioreasoner_tpu.generation.sampling import SamplingParams
from socioreasoner_tpu.models.qwen2_5_vl import model as qmodel
from socioreasoner_tpu.models.qwen2_5_vl.config import Qwen25VLConfig


@pytest.fixture(scope="module")
def setup():
    config = Qwen25VLConfig.tiny()
    params = qmodel.init_params(config, jax.random.key(11), dtype=jnp.float32,
                                with_vision=False)
    return config, params


def _engine(config, params, fork=True, **kw):
    kw.setdefault("max_slots", 4)
    kw.setdefault("max_len", 64)
    kw.setdefault("decode_chunk", 4)
    kw.setdefault("prefill_buckets", (16,))
    kw.setdefault("cache_dtype", jnp.float32)
    return DecodeEngine(config, params, prefix_fork=fork, seed=5, **kw)


def _greedy(n):
    return SamplingParams(temperature=0.0, do_sample=False, max_new_tokens=n)


def _reqs(rng, n_unique, n_dup, max_new=8):
    """n_unique prompts, each submitted n_dup times (fresh list objects, the
    way the rollout submits siblings)."""
    prompts = [rng.integers(2, 200, size=7).tolist() for _ in range(n_unique)]
    reqs = []
    for i, p in enumerate(prompts):
        for j in range(n_dup):
            reqs.append(Request(request_id=(i, j), prompt_ids=list(p),
                                sampling=_greedy(max_new)))
    return reqs


@pytest.mark.parametrize("kv_quant", [None, "int8"])
def test_fork_greedy_matches_no_fork(setup, kv_quant):
    config, params = setup
    rng = np.random.default_rng(0)
    outs = {}
    counts = {}
    for fork in (False, True):
        eng = _engine(config, params, fork=fork, kv_quant=kv_quant)
        res = eng.generate(_reqs(np.random.default_rng(0), 2, 2))
        outs[fork] = {o.request_id: o.output_ids for o in res}
        counts[fork] = (eng.prefill_rows, eng.forked_requests)
    assert outs[True] == outs[False]
    assert counts[False] == (4, 0)
    assert counts[True] == (2, 2)          # one prefill per unique prompt


def test_fork_sampled_siblings_differ(setup):
    """Forked siblings draw independent samples (per-slot rng)."""
    config, params = setup
    eng = _engine(config, params, fork=True)
    rng = np.random.default_rng(1)
    prompt = rng.integers(2, 200, size=7).tolist()
    sp = SamplingParams(temperature=1.0, top_p=1.0, top_k=0, do_sample=True,
                        max_new_tokens=10)
    reqs = [Request(request_id=j, prompt_ids=list(prompt), sampling=sp)
            for j in range(4)]
    res = eng.generate(reqs)
    assert eng.prefill_rows == 1 and eng.forked_requests == 3
    seqs = {tuple(o.output_ids) for o in res}
    assert len(seqs) >= 2, "siblings produced identical samples"
    for o in res:
        assert all(0 <= t < config.text.vocab_size for t in o.output_ids)


def test_fork_from_running_leader(setup):
    """A sibling arriving AFTER the leader started decoding still forks —
    rows 0..P-1 are untouched by decode."""
    config, params = setup
    rng = np.random.default_rng(2)
    prompt = rng.integers(2, 200, size=7).tolist()
    eng = _engine(config, params, fork=True)
    eng.add_request("leader", list(prompt), _greedy(12))
    outs = eng.step()                     # leader prefill + first chunk
    assert eng.num_running() >= 1
    eng.add_request("sib", list(prompt), _greedy(12))
    while eng.has_work():
        outs += eng.step()
    assert eng.forked_requests == 1
    by_id = {o.request_id: o.output_ids for o in outs}
    assert by_id["leader"] == by_id["sib"]   # greedy: same prefix, same tokens


def test_fork_entry_invalidated_on_slot_reuse(setup):
    """A released leader's entry dies once its slot hosts a new prompt; the
    late duplicate falls back to prefill and still decodes correctly."""
    config, params = setup
    rng = np.random.default_rng(3)
    pA = rng.integers(2, 200, size=7).tolist()
    eng = _engine(config, params, fork=True, max_slots=2)
    ref = eng.generate([Request(request_id="a0", prompt_ids=list(pA),
                                sampling=_greedy(6))])[0]
    # reuse BOTH slots with fresh prompts → pA's entry epoch goes stale
    eng.generate([Request(request_id=f"b{i}",
                          prompt_ids=rng.integers(2, 200, size=7).tolist(),
                          sampling=_greedy(6)) for i in range(2)])
    assert eng.forked_requests == 0
    late = eng.generate([Request(request_id="a1", prompt_ids=list(pA),
                                 sampling=_greedy(6))])[0]
    assert eng.forked_requests == 0          # stale entry: prefilled again
    assert late.output_ids == ref.output_ids


def test_fork_vlm_shared_embeds(setup):
    """Siblings sharing ONE embeds object (how the rollout submits a GRPO
    group) fork; their image rows don't count against the prefill image
    budget, so the whole group admits at once even past the bucket cap."""
    config, params = setup
    H = config.text.hidden_size
    rng = np.random.default_rng(6)
    n_img = 5
    ids = rng.integers(2, 200, size=9).tolist()
    ids[1:1 + n_img] = [config.image_token_id] * n_img
    embeds = rng.normal(size=(n_img, H)).astype(np.float32)

    def make(n):
        return [Request(request_id=j, prompt_ids=list(ids),
                        sampling=_greedy(6), image_embeds=embeds)
                for j in range(n)]

    # image bucket fits ONE request's rows — without forking, 3 siblings need
    # 3 admission rounds; with forking they admit together
    eng = _engine(config, params, fork=True, image_buckets=(0, 8))
    outs = eng.generate(make(3))
    assert eng.prefill_rows == 1 and eng.forked_requests == 2
    ref = _engine(config, params, fork=False,
                  image_buckets=(0, 8)).generate(make(3))
    assert ([o.output_ids for o in outs] == [o.output_ids for o in ref])
    # different embeds object for the same prompt: no fork
    eng2 = _engine(config, params, fork=True, image_buckets=(0, 8))
    reqs = make(2)
    reqs[1].image_embeds = embeds.copy()
    eng2.generate(reqs)
    assert eng2.forked_requests == 0 and eng2.prefill_rows == 2


def test_set_params_clears_registry(setup):
    """A weight swap (train→infer sync) invalidates every cached prefix: the
    resident KV rows were computed under the OLD weights."""
    config, params = setup
    rng = np.random.default_rng(7)
    prompt = rng.integers(2, 200, size=7).tolist()
    eng = _engine(config, params, fork=True)
    eng.generate([Request(request_id="a", prompt_ids=list(prompt),
                          sampling=_greedy(4))])
    assert eng._prefix_registry
    eng.set_params(params)
    assert not eng._prefix_registry
    eng.generate([Request(request_id="b", prompt_ids=list(prompt),
                          sampling=_greedy(4))])
    assert eng.forked_requests == 0          # re-prefilled under new weights


def test_no_fork_on_position_mismatch(setup):
    """Same token ids but different M-RoPE positions must not share a prefix."""
    config, params = setup
    rng = np.random.default_rng(4)
    prompt = rng.integers(2, 200, size=7).tolist()
    pos_a = np.broadcast_to(np.arange(7)[None], (3, 7)).copy()
    pos_b = pos_a + 5
    eng = _engine(config, params, fork=True)
    eng.generate([
        Request(request_id="a", prompt_ids=list(prompt), sampling=_greedy(4),
                position_ids=pos_a),
        Request(request_id="b", prompt_ids=list(prompt), sampling=_greedy(4),
                position_ids=pos_b),
    ])
    assert eng.forked_requests == 0 and eng.prefill_rows == 2


def test_pipeline_rollout_fork_hits(tmp_path):
    """The GRPO train rollout (n=2 siblings per prompt, routed to one worker)
    must hit the prefix fork: each prompt prefills once, siblings fork."""
    from socioreasoner_tpu.utils.metrics import MetricsManager
    from tests.test_rollout_overlap import _make_pipe

    pipe, dataset = _make_pipe(tmp_path)
    batch = pipe.collator(dataset)
    rollout = pipe.param_store.get("rollout")
    pipe._rollout_overlapped(dataset, batch, rollout)
    eng = pipe.decode_replicas[0].engine
    # 2 prompts x n=2: stage-1 forks the sibling of each prompt; stage-2
    # prompts differ per sibling (rendered masks), so only stage 1 forks
    assert eng.forked_requests >= 2
    assert eng.prefill_rows < eng.forked_requests + eng.prefill_rows


def test_fork_source_slot_reassigned_same_pass(setup):
    """A fork whose SOURCE slot is handed to a prefill request in the same
    admission pass must still copy the leader's rows, not the new request's:
    leader X releases slot 0, then [A(=X's prompt), B] admit together — A
    forks from slot 0 while B prefills INTO slot 0."""
    config, params = setup
    rng = np.random.default_rng(9)
    p1 = rng.integers(2, 200, size=7).tolist()
    p2 = rng.integers(2, 200, size=9).tolist()

    ref_eng = _engine(config, params, fork=False)
    ref = ref_eng.generate([Request(request_id="a", prompt_ids=list(p1),
                                    sampling=_greedy(6))])[0]

    eng = _engine(config, params, fork=True, max_slots=2)
    eng.generate([Request(request_id="x", prompt_ids=list(p1),
                          sampling=_greedy(6))])
    # slot 0 (X's) is free but still holds the p1 prefix; free order [1, 0]
    assert eng.free_slots == [1, 0]
    outs = eng.generate([
        Request(request_id="A", prompt_ids=list(p1), sampling=_greedy(6)),
        Request(request_id="B", prompt_ids=list(p2), sampling=_greedy(6)),
    ])
    assert eng.forked_requests == 1
    a = next(o for o in outs if o.request_id == "A")
    assert a.output_ids == ref.output_ids, (a.output_ids, ref.output_ids)


def test_fork_entry_dies_with_freed_embeds(setup):
    """The registry holds embeds WEAKLY: once the pipeline drops the ViT
    output, the entry must stop forking (and must not pin the array)."""
    import gc

    config, params = setup
    rng = np.random.default_rng(12)
    prompt = rng.integers(2, 200, size=7).tolist()
    n_img = 4
    embeds = jnp.asarray(
        rng.standard_normal((n_img, config.text.hidden_size)), jnp.float32)
    ids = list(prompt[:3]) + [config.image_token_id] * n_img + list(prompt[3:])
    eng = _engine(config, params, fork=True, image_buckets=(0, 8))
    eng.generate([Request(request_id="a", prompt_ids=list(ids),
                          sampling=_greedy(3), image_embeds=embeds)])
    (entry,) = eng._prefix_registry.values()
    assert entry.embeds() is embeds
    del embeds
    gc.collect()
    assert entry.embeds() is None
    # same ids with a NEW embeds object: must prefill, not fork
    embeds2 = jnp.asarray(
        rng.standard_normal((n_img, config.text.hidden_size)), jnp.float32)
    eng.generate([Request(request_id="b", prompt_ids=list(ids),
                          sampling=_greedy(3), image_embeds=embeds2)])
    assert eng.forked_requests == 0 and eng.prefill_rows == 2


def test_scheduler_routes_siblings_to_one_worker(setup):
    """GenerateScheduler level 1 with 2 DP workers and n=2: each prompt's
    siblings land on ONE worker (fork per prompt), both workers get work."""
    from socioreasoner_tpu.distributed.jax_strategies import JaxDecodeStrategy
    from socioreasoner_tpu.runtime.generate_scheduler import GenerateScheduler
    from socioreasoner_tpu.protocol import BatchProto

    config, params = setup
    kw = dict(max_slots=4, max_len=64, decode_chunk=4, prefill_buckets=(16,),
              cache_dtype=jnp.float32)
    workers = []
    for _ in range(2):
        s = JaxDecodeStrategy()
        s.initialize(config, params, engine_kwargs=kw)
        workers.append(s)

    class G:
        num_return_sequences = 2
        max_new_tokens = 4
        do_sample = False
        temperature = 0.0
        top_p = 1.0
        top_k = 0

    class Cluster:
        def __init__(self, ws):
            self.workers = ws

        def start_server(self):
            for w in self.workers:
                w.start_server()

        def stop_server(self):
            for w in self.workers:
                w.stop_server()

    rng = np.random.default_rng(0)
    ids = rng.integers(2, 200, size=(4, 9)).astype(np.int64)
    batch = BatchProto.from_dict(tensors={
        "input_ids": ids, "attention_mask": np.ones((4, 9), np.int64)})
    out = GenerateScheduler(Cluster(workers)).generate(batch, G(), opt_level=1)
    assert np.asarray(out.batch["output"]).shape[0] == 8
    assert sum(w.engine.forked_requests for w in workers) == 4
    assert sum(w.engine.prefill_rows for w in workers) == 4
    assert all(w.engine.prefill_rows + w.engine.forked_requests
               for w in workers)          # both workers actually served
