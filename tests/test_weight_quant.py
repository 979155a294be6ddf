"""Weight-only int8 decode path (ops/quant.py): numeric closeness of the
quantized forward to full precision, and the engine knob end-to-end."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from socioreasoner_tpu.models.qwen2_5_vl.config import Qwen25VLConfig
from socioreasoner_tpu.models.qwen2_5_vl import model as qmodel
from socioreasoner_tpu.generation.engine import DecodeEngine, Request
from socioreasoner_tpu.generation.sampling import SamplingParams
from socioreasoner_tpu.ops.quant import (quantize_decode_params,
                                         quantize_weight,
                                         quantize_weight_int4)


@pytest.fixture(scope="module")
def setup():
    config = Qwen25VLConfig.tiny()
    params = qmodel.init_params(config, jax.random.key(7), dtype=jnp.float32,
                                with_vision=False)
    return config, params


def test_quantize_weight_roundtrip():
    rng = np.random.default_rng(0)
    w = jnp.asarray(rng.normal(size=(4, 32, 64)) * 0.02, jnp.float32)
    q, s = quantize_weight(w, axis=-2)
    assert q.dtype == jnp.int8 and s.shape == (4, 64)
    back = q.astype(jnp.float32) * s[:, None, :]
    # max error <= scale/2 per element (round-to-nearest)
    assert float(jnp.max(jnp.abs(back - w) / s[:, None, :])) <= 0.5 + 1e-6


def test_quantize_weight_int4_roundtrip():
    from socioreasoner_tpu.ops.quant import unpack_int4
    rng = np.random.default_rng(0)
    w = jnp.asarray(rng.normal(size=(2, 256, 48)) * 0.02, jnp.float32)
    q, s = quantize_weight_int4(w, axis=-2)
    # nibble-packed uint8, contraction dim halved (S4 never crosses jit —
    # it dies in a device_put relayout recursion on the TPU backend)
    assert q.dtype == jnp.uint8 and q.shape == (2, 128, 48)
    assert s.shape == (2, 2, 48)                 # 256 / group(128) = 2 groups
    vals = unpack_int4(q).astype(jnp.float32)    # (2, 256, 48) in [-8, 7]
    assert float(vals.min()) >= -8 and float(vals.max()) <= 7
    back = (vals.reshape(2, 2, 128, 48) * s[:, :, None, :]).reshape(w.shape)
    err = jnp.abs(back - w).reshape(2, 2, 128, 48) / s[:, :, None, :]
    assert float(jnp.max(err)) <= 0.5 + 1e-6     # round-to-nearest per group
    # tiny contraction dims collapse to one group
    q2, s2 = quantize_weight_int4(jnp.asarray(rng.normal(size=(16, 8)),
                                              jnp.float32))
    assert q2.shape == (8, 8) and s2.shape == (1, 8)


def test_pack_unpack_int4_roundtrip():
    from socioreasoner_tpu.ops.quant import pack_int4, unpack_int4
    rng = np.random.default_rng(5)
    vals = jnp.asarray(rng.integers(-8, 8, size=(3, 10, 7)), jnp.int32)
    packed = pack_int4(vals)
    assert packed.dtype == jnp.uint8 and packed.shape == (3, 5, 7)
    assert np.array_equal(np.asarray(unpack_int4(packed)), np.asarray(vals))


def _cached_logits(config, params, ids):
    """Forward through the decode (cached/unrolled) path — the one that
    consumes quantized weights."""
    B, L = ids.shape
    t = config.text
    cache = {
        "k": jnp.zeros((t.num_hidden_layers, B, L, t.num_key_value_heads,
                        t.head_dim), jnp.float32),
        "v": jnp.zeros((t.num_hidden_layers, B, L, t.num_key_value_heads,
                        t.head_dim), jnp.float32),
        "kv_valid": jnp.ones((B, L), jnp.int32),
    }
    pos = jnp.broadcast_to(jnp.arange(L)[None, None], (B, 3, L))
    cpos = jnp.broadcast_to(jnp.arange(L)[None], (B, L))
    logits, _ = qmodel.forward(config, params, ids, pos, None, cache=cache,
                               cache_positions=cpos)
    return np.asarray(logits)


# int4 bounds are loose: a tiny RANDOM model is quantization's worst case
# (hidden 64 = one quant group, gaussian weights have no outlier structure);
# real-model int4-g128 quality must be validated end-to-end (giou) on chip.
@pytest.mark.parametrize("mode,rel_tol,agree_tol",
                         [("int8", 0.25, 0.8), ("int4", 1.5, 0.6)])
def test_quantized_forward_close(setup, mode, rel_tol, agree_tol):
    config, params = setup
    rng = np.random.default_rng(1)
    ids = jnp.asarray(rng.integers(2, 200, size=(2, 12)), jnp.int32)
    full = _cached_logits(config, params, ids)
    qparams = quantize_decode_params(params, mode=mode)
    quant = _cached_logits(config, qparams, ids)
    rel = np.abs(quant - full).max() / (np.abs(full).std() + 1e-9)
    assert rel < rel_tol, f"{mode} quantized logits diverged: rel={rel:.3f}"
    # ranking mostly preserved: top-1 agreement on most positions
    agree = (full.argmax(-1) == quant.argmax(-1)).mean()
    assert agree > agree_tol, f"{mode} top-1 agreement {agree:.2f}"


@pytest.mark.parametrize("mode", ["int8", "int4"])
def test_engine_weight_quant_runs(setup, mode):
    config, params = setup
    engine = DecodeEngine(config, params, max_slots=2, max_len=64,
                          decode_chunk=4, prefill_buckets=(16,),
                          cache_dtype=jnp.float32, weight_quant=mode)
    rng = np.random.default_rng(3)
    reqs = [Request(request_id=i,
                    prompt_ids=rng.integers(2, 200, size=7).tolist(),
                    sampling=SamplingParams(temperature=0.0, do_sample=False,
                                            max_new_tokens=6))
            for i in range(2)]
    outs = engine.generate(reqs)
    assert len(outs) == 2
    for o in outs:
        assert len(o.output_ids) >= 1
        assert all(0 <= t < config.text.vocab_size for t in o.output_ids)

    # bad knob value rejected
    with pytest.raises(ValueError):
        DecodeEngine(config, params, weight_quant="fp4")


def test_single_copy_prequantized_engine(setup):
    """Single-copy serving: an engine given a PRE-quantized tree uses it for
    both prefill and decode (no bf16 copy, no re-derivation) and its greedy
    outputs match the quantized forward's argmax walk exactly."""
    from socioreasoner_tpu.ops.quant import params_prequantized
    config, params = setup
    assert not params_prequantized(params)
    qparams = quantize_decode_params(params, mode="int8")
    assert params_prequantized(qparams)
    engine = DecodeEngine(config, qparams, max_slots=2, max_len=64,
                          decode_chunk=4, prefill_buckets=(16,),
                          cache_dtype=jnp.float32, weight_quant="int8")
    assert engine.params_q is None            # single tree, no second copy
    assert engine.params is qparams
    rng = np.random.default_rng(3)
    prompts = [rng.integers(2, 200, size=7).tolist() for _ in range(2)]
    outs = engine.generate([
        Request(request_id=i, prompt_ids=p,
                sampling=SamplingParams(temperature=0.0, do_sample=False,
                                        max_new_tokens=5))
        for i, p in enumerate(prompts)])
    # reference: greedy argmax walk through the same quantized cached forward
    for o, prompt in zip(outs, prompts):
        ids = list(prompt)
        for got in o.output_ids:
            logits = _cached_logits(config, qparams,
                                    jnp.asarray([ids], jnp.int32))
            want = int(logits[0, -1].argmax())
            assert got == want
            ids.append(got)


def test_quantize_inplace_frees_and_matches(setup):
    """inplace=True mutates the caller's tree (same dict object), yields the
    same quantized values as the copying path, and leaves no bf16 stacks."""
    from socioreasoner_tpu.ops.quant import QUANT_KEYS, params_prequantized
    config, params = setup
    import copy
    mine = {k: (dict(v) if isinstance(v, dict) else v)
            for k, v in params.items()}
    ref = quantize_decode_params(params, mode="int8")
    out = quantize_decode_params(mine, mode="int8", inplace=True)
    assert out is mine and params_prequantized(mine)
    for name in QUANT_KEYS:
        if name in ref["layers"]:
            assert mine["layers"][name].dtype == jnp.int8
            assert np.array_equal(np.asarray(mine["layers"][name]),
                                  np.asarray(ref["layers"][name]))


def test_set_params_prequantized(setup):
    """set_params with a pre-quantized tree drops the derived copy (swap to
    single-copy mode mid-flight, e.g. a quantized train→infer sync)."""
    config, params = setup
    engine = DecodeEngine(config, params, max_slots=2, max_len=64,
                          decode_chunk=4, prefill_buckets=(16,),
                          cache_dtype=jnp.float32, weight_quant="int8")
    assert engine.params_q is not None        # hybrid: derived copy exists
    qparams = quantize_decode_params(params, mode="int8")
    engine.set_params(qparams)
    assert engine.params_q is None and engine.params is qparams


def test_decode_strategy_single_copy_quant(setup):
    """strategy knob single_copy_quant: the rollout store ends up holding the
    quantized tree (bf16 store ref dropped) and the engine runs single-copy;
    model_update with fresh bf16 weights re-quantizes into the store."""
    from socioreasoner_tpu.distributed.jax_strategies import JaxDecodeStrategy
    from socioreasoner_tpu.distributed.strategy import ParamStore
    from socioreasoner_tpu.ops.quant import params_prequantized
    config, params = setup
    store = ParamStore()
    store.put("rollout", params)
    strat = JaxDecodeStrategy(param_store=store)
    strat.initialize(config, engine_kwargs={
        "max_slots": 2, "max_len": 64, "decode_chunk": 4,
        "prefill_buckets": (16,), "cache_dtype": jnp.float32,
        "weight_quant": "int8", "single_copy_quant": True})
    assert params_prequantized(store.get("rollout"))
    assert strat.engine.params_q is None
    assert strat.engine.params is store.get("rollout")
    # fresh bf16 weights (a train step) → re-quantized on model_update
    params2 = qmodel.init_params(config, jax.random.key(8), dtype=jnp.float32,
                                 with_vision=False)
    store.put("rollout", params2)
    strat.model_update()
    assert params_prequantized(store.get("rollout"))
    assert strat.engine.params_q is None
    # knob without weight_quant is rejected
    with pytest.raises(ValueError):
        JaxDecodeStrategy(param_store=store).initialize(
            config, engine_kwargs={"max_slots": 2, "max_len": 64,
                                   "decode_chunk": 4, "prefill_buckets": (16,),
                                   "single_copy_quant": True})


def test_validation_single_copy_requires_weight_quant():
    from socioreasoner_tpu.configs.validation import validate_worker
    from socioreasoner_tpu.configs.worker_config import WorkerConfig
    wc = WorkerConfig(world_size=1)
    wc.strategy_args.strategy_name = "jax_decode"
    wc.strategy_args.strategy_config = {"single_copy_quant": True}
    with pytest.raises(ValueError, match="single_copy_quant"):
        validate_worker("actor_infer", wc, 1)
    wc.strategy_args.strategy_config = {"single_copy_quant": True,
                                        "weight_quant": "int8"}
    validate_worker("actor_infer", wc, 1)


@pytest.mark.parametrize("mode,qdtype", [("int8", jnp.int8),
                                         ("int4", jnp.uint8)])
def test_quantized_tied_head(setup, mode, qdtype):
    """Tied-embedding models get a derived quantized lm_head_q; embed stays
    full precision for the gather."""
    import dataclasses
    config, params = setup
    tcfg = dataclasses.replace(config.text, tie_word_embeddings=True)
    config_t = dataclasses.replace(config, text=tcfg)
    params_t = {k: v for k, v in params.items() if k != "lm_head"}
    rng = np.random.default_rng(2)
    ids = jnp.asarray(rng.integers(2, 200, size=(1, 8)), jnp.int32)
    full = _cached_logits(config_t, params_t, ids)
    qp = quantize_decode_params(params_t, mode=mode)
    assert qp["lm_head_q"].dtype == qdtype
    assert qp["embed"].dtype == params_t["embed"].dtype   # gather stays exact
    quant = _cached_logits(config_t, qp, ids)
    rel = np.abs(quant - full).max() / (np.abs(full).std() + 1e-9)
    tol = 0.25 if mode == "int8" else 1.5        # see int4 worst-case note
    assert rel < tol, f"tied {mode} quantized logits diverged: rel={rel:.3f}"


def test_matmul_w8a8_close():
    """int8×int8 (w8a8) matmul matches the f32 product within dynamic-quant
    tolerance, and exactly matches a manually dequantized int32 accumulate."""
    from socioreasoner_tpu.ops.quant import matmul_w8a8, quantize_act
    rng = np.random.default_rng(2)
    h = jnp.asarray(rng.normal(size=(3, 5, 32)) * 0.7, jnp.float32)
    w = jnp.asarray(rng.normal(size=(32, 16)) * 0.02, jnp.float32)
    q, s = quantize_weight(w, axis=-2)
    out = matmul_w8a8(h, q, s)
    ref = h @ w
    rel = float(jnp.abs(out - ref).max() / (jnp.abs(ref).std() + 1e-9))
    assert rel < 0.1, f"w8a8 diverged: rel={rel:.4f}"
    # exactness of the int32 accumulate vs numpy
    ha, a_scale = quantize_act(h)
    acc = np.asarray(ha, np.int64).reshape(-1, 32) @ np.asarray(q, np.int64)
    manual = (acc.reshape(3, 5, 16).astype(np.float32)
              * np.asarray(a_scale) * np.asarray(s))
    assert np.allclose(np.asarray(out), manual, rtol=1e-4, atol=1e-5)


def test_act_quant_forward_close(setup):
    """act_quant=True on the cached multi-token pass (w8a8 prefill) stays
    close to the w8a16 quantized forward; the L=1 decode step is unaffected
    (a8 only fires for L > 1)."""
    config, params = setup
    rng = np.random.default_rng(4)
    ids = jnp.asarray(rng.integers(2, 200, size=(2, 12)), jnp.int32)
    qparams = quantize_decode_params(params, mode="int8")

    def logits(act_quant):
        B, L = ids.shape
        t = config.text
        cache = {
            "k": jnp.zeros((t.num_hidden_layers, B, L, t.num_key_value_heads,
                            t.head_dim), jnp.float32),
            "v": jnp.zeros((t.num_hidden_layers, B, L, t.num_key_value_heads,
                            t.head_dim), jnp.float32),
            "kv_valid": jnp.ones((B, L), jnp.int32),
        }
        pos = jnp.broadcast_to(jnp.arange(L)[None, None], (B, 3, L))
        cpos = jnp.broadcast_to(jnp.arange(L)[None], (B, L))
        out, _ = qmodel.forward(config, qparams, ids, pos, None, cache=cache,
                                cache_positions=cpos, act_quant=act_quant)
        return np.asarray(out)

    w8a16 = logits(False)
    w8a8 = logits(True)
    rel = np.abs(w8a8 - w8a16).max() / (np.abs(w8a16).std() + 1e-9)
    assert rel < 0.35, f"w8a8 forward diverged from w8a16: rel={rel:.3f}"
    agree = (w8a16.argmax(-1) == w8a8.argmax(-1)).mean()
    assert agree > 0.7, f"w8a8 top-1 agreement {agree:.2f}"


def test_engine_act_quant_runs(setup):
    """Engine act_quant knob: w8a8 prefill end-to-end (hybrid mode routes
    prefill onto the int8 tree), decode unaffected; invalid combos rejected."""
    config, params = setup
    engine = DecodeEngine(config, params, max_slots=2, max_len=64,
                          decode_chunk=4, prefill_buckets=(16,),
                          cache_dtype=jnp.float32, weight_quant="int8",
                          act_quant="int8")
    assert engine.act_quant
    rng = np.random.default_rng(3)
    outs = engine.generate([
        Request(request_id=i,
                prompt_ids=rng.integers(2, 200, size=7).tolist(),
                sampling=SamplingParams(temperature=0.0, do_sample=False,
                                        max_new_tokens=6))
        for i in range(2)])
    assert len(outs) == 2 and all(len(o.output_ids) >= 1 for o in outs)
    with pytest.raises(ValueError):
        DecodeEngine(config, params, act_quant="int8")      # needs int8 w
    with pytest.raises(ValueError):
        DecodeEngine(config, params, weight_quant="int8", act_quant="int4")


def test_validation_act_quant():
    from socioreasoner_tpu.configs.validation import validate_worker
    from socioreasoner_tpu.configs.worker_config import WorkerConfig
    wc = WorkerConfig(world_size=1)
    wc.strategy_args.strategy_name = "jax_decode"
    wc.strategy_args.strategy_config = {"act_quant": "int8"}
    with pytest.raises(ValueError, match="act_quant"):
        validate_worker("actor_infer", wc, 1)
    wc.strategy_args.strategy_config = {"act_quant": "int8",
                                        "weight_quant": "int8"}
    validate_worker("actor_infer", wc, 1)


def test_vision_quant_close():
    """w8a8 ViT tower (quantize_vision_params) stays close to the f32 tower
    and the engine-facing run_vision path consumes the quantized tree."""
    from socioreasoner_tpu.models.qwen2_5_vl.config import VisionConfig
    from socioreasoner_tpu.models.qwen2_5_vl import model as qm
    from socioreasoner_tpu.models.qwen2_5_vl.vision import (vision_host_inputs,
                                                            vision_tower)
    from socioreasoner_tpu.ops.quant import (quantize_vision_params,
                                             vision_prequantized)
    cfg = Qwen25VLConfig.tiny().vision
    full = qm.init_params(Qwen25VLConfig.tiny(), jax.random.key(3),
                          dtype=jnp.float32, with_vision=True)["vision"]
    rng = np.random.default_rng(0)
    grid = np.array([[1, 4, 4]])
    patches = rng.normal(size=(16, cfg.patch_input_dim)).astype(np.float32)
    hi = vision_host_inputs(cfg, patches, grid)
    args = (jnp.asarray(hi["patches"]), jnp.asarray(hi["cos"]),
            jnp.asarray(hi["sin"]), jnp.asarray(hi["window_seg"]),
            jnp.asarray(hi["full_seg"]), jnp.asarray(hi["is_full_layer"]))
    ref = np.asarray(vision_tower(cfg, full, *args))
    qv = quantize_vision_params(full)
    assert vision_prequantized(qv) and not vision_prequantized(full)
    out = np.asarray(vision_tower(cfg, qv, *args))
    rel = np.abs(out - ref).max() / (np.abs(ref).std() + 1e-9)
    assert rel < 0.5, f"w8a8 ViT diverged: rel={rel:.3f}"
    # cosine similarity per row — feature direction preserved
    cos = (np.sum(out * ref, -1)
           / (np.linalg.norm(out, axis=-1) * np.linalg.norm(ref, axis=-1)
              + 1e-9))
    assert cos.min() > 0.98, f"w8a8 ViT feature cos {cos.min():.4f}"


def test_decode_strategy_vit_quant(setup):
    """vit_quant strategy knob: the rollout store's vision subtree ends up
    quantized (engine decode unaffected)."""
    from socioreasoner_tpu.distributed.jax_strategies import JaxDecodeStrategy
    from socioreasoner_tpu.distributed.strategy import ParamStore
    from socioreasoner_tpu.ops.quant import vision_prequantized
    config, _ = setup
    params = qmodel.init_params(config, jax.random.key(9), dtype=jnp.float32,
                                with_vision=True)
    store = ParamStore()
    store.put("rollout", params)
    strat = JaxDecodeStrategy(param_store=store)
    strat.initialize(config, engine_kwargs={
        "max_slots": 2, "max_len": 64, "decode_chunk": 4,
        "prefill_buckets": (16,), "cache_dtype": jnp.float32,
        "vit_quant": "int8"})
    assert vision_prequantized(store.get("rollout")["vision"])
