"""DecodeEngine tests: greedy decode must equal a naive full-forward argmax loop
(self-consistency on the HF-parity-verified forward), plus continuous-batching
behavior (mixed lengths, abort, server contract)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from socioreasoner_tpu.models.qwen2_5_vl.config import Qwen25VLConfig
from socioreasoner_tpu.models.qwen2_5_vl import model as qmodel
from socioreasoner_tpu.models.qwen2_5_vl import rope as qrope
from socioreasoner_tpu.generation.engine import DecodeEngine, Request
from socioreasoner_tpu.generation.sampling import SamplingParams, sample_tokens
from socioreasoner_tpu.utils.functionals import GenerateRequestType


@pytest.fixture(scope="module")
def setup():
    config = Qwen25VLConfig.tiny()
    params = qmodel.init_params(config, jax.random.key(7), dtype=jnp.float32,
                                with_vision=False)
    return config, params


def naive_greedy(config, params, prompt_ids, max_new):
    """Full re-forward per token — the reference implementation."""
    ids = list(prompt_ids)
    for _ in range(max_new):
        arr = np.array([ids])
        attn = np.ones_like(arr)
        pos, _ = qrope.get_rope_index(config, arr, None, attn)
        logits, _ = qmodel.forward(config, params, jnp.asarray(arr),
                                   jnp.asarray(pos), jnp.asarray(attn))
        tok = int(np.argmax(np.array(logits[0, -1])))
        ids.append(tok)
        if tok == config.eos_token_id:
            break
    return ids[len(prompt_ids):]


def greedy_params(max_new=8):
    return SamplingParams(temperature=0.0, do_sample=False, max_new_tokens=max_new)


def test_engine_greedy_matches_naive(setup):
    config, params = setup
    engine = DecodeEngine(config, params, max_slots=2, max_len=64, decode_chunk=4,
                          prefill_buckets=(16, 32), cache_dtype=jnp.float32)
    rng = np.random.default_rng(0)
    prompts = [rng.integers(2, 200, size=n).tolist() for n in (5, 9)]
    reqs = [Request(request_id=i, prompt_ids=p, sampling=greedy_params(8))
            for i, p in enumerate(prompts)]
    outs = engine.generate(reqs)
    assert len(outs) == 2
    for i, out in enumerate(outs):
        want = naive_greedy(config, params, prompts[i], 8)
        assert out.output_ids[:len(want)] == want, f"req {i}: {out.output_ids} vs {want}"


def test_engine_more_requests_than_slots(setup):
    config, params = setup
    engine = DecodeEngine(config, params, max_slots=2, max_len=64, decode_chunk=4,
                          prefill_buckets=(16,), cache_dtype=jnp.float32)
    rng = np.random.default_rng(1)
    prompts = [rng.integers(2, 200, size=6).tolist() for _ in range(5)]
    reqs = [Request(request_id=i, prompt_ids=p, sampling=greedy_params(4))
            for i, p in enumerate(prompts)]
    outs = engine.generate(reqs)
    assert len(outs) == 5
    assert [o.request_id for o in outs] == list(range(5))
    for i, out in enumerate(outs):
        want = naive_greedy(config, params, prompts[i], 4)
        assert out.output_ids[:len(want)] == want


def test_engine_chunk_early_exit(setup):
    """A 64-token chunk must exit once every slot hit its budget/stop token —
    a 3-token request costs ~2 decode steps, not 64 (VERDICT r2 Weak #8)."""
    config, params = setup
    engine = DecodeEngine(config, params, max_slots=2, max_len=128,
                          decode_chunk=64, prefill_buckets=(16,),
                          cache_dtype=jnp.float32,
                          # the stop_req below reuses prompts[0]; a prefix
                          # fork would draw its token via one decode step and
                          # break the steps_executed accounting asserted here
                          prefix_fork=False)
    rng = np.random.default_rng(3)
    prompts = [rng.integers(2, 200, size=6).tolist() for _ in range(2)]
    reqs = [Request(request_id=i, prompt_ids=p, sampling=greedy_params(3))
            for i, p in enumerate(prompts)]
    outs = engine.generate(reqs)
    assert len(outs) == 2
    # prefill emits token 1; the chunk needed only 2 more steps for budget=3
    assert engine.steps_executed <= 4
    for i, out in enumerate(outs):
        want = naive_greedy(config, params, prompts[i], 3)
        assert out.output_ids[:len(want)] == want
    # stop-token early exit: make the model's own first emission a stop token
    first = outs[0].output_ids[0]
    engine.steps_executed = 0
    stop_req = Request(request_id="s", prompt_ids=prompts[0],
                       sampling=SamplingParams(temperature=0.0, do_sample=False,
                                               max_new_tokens=50,
                                               stop_token_ids=(first,)))
    out = engine.generate([stop_req])[0]
    assert out.finish_reason == "stop"
    assert out.output_ids == [first]
    assert engine.steps_executed == 0     # prefill's token already stopped it


def test_engine_abort(setup):
    config, params = setup
    engine = DecodeEngine(config, params, max_slots=2, max_len=64, decode_chunk=2,
                          prefill_buckets=(16,), cache_dtype=jnp.float32)
    engine.add_request(0, [5, 6, 7], greedy_params(1000))
    engine.add_request(1, [8, 9, 10], greedy_params(4))
    engine.step()
    assert engine.num_running() == 2
    assert engine.abort_request(0)
    assert engine.num_running() == 1
    outs = []
    while engine.has_work():
        outs.extend(engine.step())
    assert [o.request_id for o in outs] == [1]


def test_engine_sampling_reproducible(setup):
    config, params = setup
    sp = SamplingParams(temperature=0.8, top_p=0.9, top_k=20, max_new_tokens=6)
    outs = []
    for _ in range(2):
        engine = DecodeEngine(config, params, max_slots=1, max_len=64,
                              decode_chunk=3, prefill_buckets=(16,),
                              cache_dtype=jnp.float32, seed=42)
        o = engine.generate([Request(request_id=0, prompt_ids=[5, 6, 7, 8], sampling=sp)])
        outs.append(o[0].output_ids)
    assert outs[0] == outs[1]  # same seed → same trajectory


def test_sample_tokens_distribution():
    key = jax.random.key(0)
    logits = jnp.array([[0.0, 10.0, 0.0, 0.0], [5.0, 0.0, 0.0, 0.0]])
    # greedy rows
    toks = sample_tokens(logits, key, jnp.array([0.0, 0.0]),
                         jnp.array([1.0, 1.0]), jnp.array([0, 0]))
    np.testing.assert_array_equal(np.array(toks), [1, 0])
    # top_k=1 == greedy even with temperature
    toks2 = sample_tokens(logits, key, jnp.array([1.0, 1.0]),
                          jnp.array([1.0, 1.0]), jnp.array([1, 1]))
    np.testing.assert_array_equal(np.array(toks2), [1, 0])
    # top_p tiny == greedy
    toks3 = sample_tokens(logits, key, jnp.array([1.0, 1.0]),
                          jnp.array([1e-6, 1e-6]), jnp.array([0, 0]))
    np.testing.assert_array_equal(np.array(toks3), [1, 0])


def test_generate_server_contract(setup):
    config, params = setup
    from socioreasoner_tpu.generation.server import GenerateServer
    engine = DecodeEngine(config, params, max_slots=2, max_len=64, decode_chunk=2,
                          prefill_buckets=(16,), cache_dtype=jnp.float32)
    server = GenerateServer(engine)
    server.start()
    results = {}
    done = []

    def cb(out):
        results[out.request_id] = out.output_ids
        done.append(out.request_id)

    for i in range(3):
        server.add_request(GenerateRequestType.ADD, {
            "request_id": i, "prompt_ids": [5 + i, 6, 7],
            "sampling": greedy_params(3), "callback": cb})
    import time
    deadline = time.time() + 60
    while len(done) < 3 and time.time() < deadline:
        time.sleep(0.05)
    assert sorted(done) == [0, 1, 2]
    ping = server.add_request(GenerateRequestType.ALIVE_CHECK)
    assert ping["alive"]
    server.stop()
    assert not server.is_alive()


def test_list_eos_token_id_configs():
    """Llama-3-style list-valued eos_token_id must map to a stop SET, not a
    silent eos=2 fallback (ref model families contract, llm.py)."""
    from socioreasoner_tpu.models.llm import config_from_hf_dict
    cfg = config_from_hf_dict({
        "model_type": "llama", "vocab_size": 1024, "hidden_size": 64,
        "intermediate_size": 128, "num_hidden_layers": 2,
        "num_attention_heads": 4, "num_key_value_heads": 2,
        "eos_token_id": [128001, 128008, 128009], "bos_token_id": 128000,
    })
    assert cfg.eos_token_id == 128001
    assert cfg.stop_token_ids == (128008, 128009)
    assert cfg.stop_set == frozenset({128001, 128008, 128009})
    assert cfg.pad_token_id == 128001

    vl = Qwen25VLConfig.from_hf_dict({"eos_token_id": [7, 9]})
    assert vl.eos_token_id == 7 and vl.stop_token_ids == (9,)


def test_engine_stops_on_any_stop_token(setup):
    """Decode must stop on every member of the stop set (config-level extra
    stop ids and per-request SamplingParams.stop_token_ids)."""
    import dataclasses
    config, params = setup
    prompt = np.random.default_rng(3).integers(2, 200, size=5).tolist()

    # discover the first two greedy tokens, then declare them stop tokens
    base = DecodeEngine(config, params, max_slots=1, max_len=64, decode_chunk=2,
                        prefill_buckets=(16,), cache_dtype=jnp.float32)
    ref = base.generate([Request(request_id=0, prompt_ids=prompt,
                                 sampling=greedy_params(6))])[0].output_ids
    assert len(ref) >= 2

    # config-level stop set
    cfg2 = dataclasses.replace(config, stop_token_ids=(int(ref[1]),))
    eng2 = DecodeEngine(cfg2, params, max_slots=1, max_len=64, decode_chunk=2,
                        prefill_buckets=(16,), cache_dtype=jnp.float32)
    out = eng2.generate([Request(request_id=0, prompt_ids=prompt,
                                 sampling=greedy_params(6))])[0]
    assert out.output_ids == ref[:2] and out.finish_reason == "stop"

    # per-request stop set
    sp = SamplingParams(temperature=0.0, do_sample=False, max_new_tokens=6,
                        stop_token_ids=(int(ref[0]),))
    eng3 = DecodeEngine(config, params, max_slots=1, max_len=64, decode_chunk=2,
                        prefill_buckets=(16,), cache_dtype=jnp.float32)
    out3 = eng3.generate([Request(request_id=0, prompt_ids=prompt, sampling=sp)])[0]
    assert out3.output_ids == ref[:1] and out3.finish_reason == "stop"


def test_engine_admission_error_isolated(setup):
    """A prompt longer than the largest prefill bucket must finish with
    finish_reason='error' (callback fired) without killing the step loop or
    the other requests (ADVICE: server-thread resilience)."""
    config, params = setup
    engine = DecodeEngine(config, params, max_slots=2, max_len=64, decode_chunk=2,
                          prefill_buckets=(16,), cache_dtype=jnp.float32)
    rng = np.random.default_rng(5)
    good = rng.integers(2, 200, size=6).tolist()
    too_long = rng.integers(2, 200, size=40).tolist()   # > bucket 16
    fired = []
    reqs = [
        Request(request_id="bad", prompt_ids=too_long, sampling=greedy_params(4),
                callback=fired.append),
        Request(request_id="good", prompt_ids=good, sampling=greedy_params(4)),
    ]
    outs = engine.generate(reqs)
    by_id = {o.request_id: o for o in outs}
    assert by_id["bad"].finish_reason == "error"
    assert "error" in (by_id["bad"].meta or {})
    assert len(fired) == 1 and fired[0].finish_reason == "error"
    assert by_id["good"].finish_reason in ("stop", "length")
    assert by_id["good"].output_ids == naive_greedy(config, params, good, 4)
    assert not engine.has_work() and len(engine.free_slots) == engine.S


def test_engine_batched_prefill_matches_sequential(setup):
    """Batched admission (one prefill call for a group, incl. contiguously
    concatenated image embeds) must emit exactly what one-request-at-a-time
    admission emits (greedy)."""
    config, params = setup
    H = config.text.hidden_size
    img_tok = config.image_token_id

    def make_reqs():
        rng = np.random.default_rng(11)
        reqs = []
        for i, (n_txt, n_img) in enumerate([(6, 3), (4, 5), (9, 0)]):
            ids = rng.integers(2, 200, size=n_txt + n_img).tolist()
            ids[1:1 + n_img] = [img_tok] * n_img
            embeds = (rng.normal(size=(n_img, H)).astype(np.float32)
                      if n_img else None)
            reqs.append(Request(request_id=i, prompt_ids=ids,
                                sampling=greedy_params(6),
                                image_embeds=embeds))
        return reqs

    def run(batch_buckets):
        eng = DecodeEngine(config, params, max_slots=3, max_len=64,
                           decode_chunk=3, prefill_buckets=(16,),
                           image_buckets=(0, 8), cache_dtype=jnp.float32)
        eng._prefill_batch_buckets = batch_buckets
        return [o.output_ids for o in eng.generate(make_reqs())]

    seq = run((1,))
    bat = run((1, 2, 4))
    assert bat == seq


def test_engine_decode_inner_matches_monolithic_chunk(setup):
    """decode_inner chains short while_loop dispatches with one readback per
    chunk (the int8-KV fault workaround): token streams, mixed stop/budget
    behavior and steps accounting must match the monolithic chunk exactly."""
    config, params = setup
    rng = np.random.default_rng(3)
    prompts = [rng.integers(2, 200, size=n).tolist() for n in (5, 9, 7)]
    # mixed budgets so slots stop at different steps inside a chunk
    sps = [greedy_params(m) for m in (13, 4, 9)]

    def run(**kw):
        eng = DecodeEngine(config, params, max_slots=3, max_len=64,
                           decode_chunk=8, prefill_buckets=(16,),
                           cache_dtype=jnp.float32, **kw)
        outs = eng.generate([Request(request_id=i, prompt_ids=p, sampling=s)
                             for i, (p, s) in enumerate(zip(prompts, sps))])
        outs.sort(key=lambda o: o.request_id)
        return [o.output_ids for o in outs], eng.steps_executed

    mono, steps_mono = run()
    inner, steps_inner = run(decode_inner=2)
    assert mono == inner
    assert steps_mono == steps_inner

    with pytest.raises(ValueError):
        DecodeEngine(config, params, max_slots=1, max_len=64, decode_chunk=8,
                     prefill_buckets=(16,), decode_inner=3)
