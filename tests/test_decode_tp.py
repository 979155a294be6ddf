"""Tensor-parallel decode plane (SURVEY §2.10 item 3: ICI-sharded paged KV
cache; VERDICT r2 Missing #4).

Three layers of coverage on the virtual 8-device CPU mesh:
  * the shard_map kernel wrappers (paged_decode_attention_tp /
    flash_attention_tp, interpret mode) match their single-device kernels;
  * a DecodeEngine built with a tp=2 mesh produces the same greedy tokens as
    an unsharded engine (dense fallback path — validates the GSPMD param +
    cache shardings end to end);
  * the pipeline builder honors actor_infer tensor_model_parallel_size.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from socioreasoner_tpu.models.qwen2_5_vl.config import Qwen25VLConfig
from socioreasoner_tpu.models.qwen2_5_vl import model as qmodel
from socioreasoner_tpu.generation.engine import DecodeEngine, Request
from socioreasoner_tpu.generation.sampling import SamplingParams
from socioreasoner_tpu.ops.decode_attention import (
    paged_decode_attention, paged_decode_attention_tp, quantize_kv)
from socioreasoner_tpu.ops.flash_attention import (
    flash_attention, flash_attention_tp)
from socioreasoner_tpu.parallel.mesh import make_mesh


def _mesh_tp2():
    return make_mesh(dp=1, fsdp=1, tp=2)


def test_paged_decode_tp_matches_single():
    S, H, Hkv, D, Lmax, Lyr = 4, 4, 2, 128, 256, 3
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.standard_normal((S, H, D)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((Lyr, S, Lmax, Hkv, D)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((Lyr, S, Lmax, Hkv, D)), jnp.float32)
    lengths = jnp.asarray([17, 200, 1, 256], jnp.int32)
    mesh = _mesh_tp2()
    for layer in (0, 2):
        ref = paged_decode_attention(q, k, v, lengths, layer=layer,
                                     interpret=True)
        out = paged_decode_attention_tp(q, k, v, lengths, mesh=mesh,
                                        layer=layer, interpret=True)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=1e-5, atol=1e-5)


def test_paged_decode_tp_int8_matches_single():
    S, H, Hkv, D, Lmax, Lyr = 4, 4, 2, 128, 256, 2
    rng = np.random.default_rng(1)
    kf = jnp.asarray(rng.standard_normal((Lyr, S, Lmax, Hkv, D)), jnp.float32)
    vf = jnp.asarray(rng.standard_normal((Lyr, S, Lmax, Hkv, D)), jnp.float32)
    kq, ks = quantize_kv(kf)
    vq, vs = quantize_kv(vf)
    ks_t = jnp.swapaxes(ks, -1, -2)          # cache stores (.., Hkv, Lmax)
    vs_t = jnp.swapaxes(vs, -1, -2)
    q = jnp.asarray(rng.standard_normal((S, H, D)), jnp.float32)
    lengths = jnp.asarray([5, 130, 256, 64], jnp.int32)
    mesh = _mesh_tp2()
    ref = paged_decode_attention(q, kq, vq, lengths, ks_t, vs_t, layer=1,
                                 interpret=True)
    out = paged_decode_attention_tp(q, kq, vq, lengths, ks_t, vs_t,
                                    mesh=mesh, layer=1, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_flash_tp_matches_single():
    B, L, H, Hkv, D = 2, 96, 4, 2, 64
    rng = np.random.default_rng(2)
    q = jnp.asarray(rng.standard_normal((B, L, H, D)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((B, L, Hkv, D)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((B, L, Hkv, D)), jnp.float32)
    mask = np.ones((B, L), np.int32)
    mask[0, 40:] = 0
    mask = jnp.asarray(mask)
    mesh = _mesh_tp2()
    ref = flash_attention(q, k, v, mask, causal=True, interpret=True)
    out = flash_attention_tp(q, k, v, mask, mesh=mesh, causal=True,
                             interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_tp_requires_divisible_heads():
    mesh = make_mesh(dp=1, fsdp=1, tp=2)
    q = jnp.zeros((2, 3, 128))              # H=3 not divisible by tp=2
    k = jnp.zeros((2, 256, 1, 128))
    with pytest.raises(ValueError, match="divide heads"):
        paged_decode_attention_tp(q, k, k, jnp.ones(2, jnp.int32), mesh=mesh)


@pytest.fixture(scope="module")
def setup():
    config = Qwen25VLConfig.tiny()
    params = qmodel.init_params(config, jax.random.key(7), dtype=jnp.float32,
                                with_vision=False)
    return config, params


def _greedy(max_new=8):
    return SamplingParams(temperature=0.0, do_sample=False,
                          max_new_tokens=max_new)


def test_engine_tp_matches_unsharded(setup):
    config, params = setup
    kw = dict(max_slots=2, max_len=64, decode_chunk=4,
              prefill_buckets=(16, 32), cache_dtype=jnp.float32)
    rng = np.random.default_rng(0)
    prompts = [rng.integers(2, 200, size=n).tolist() for n in (5, 9)]

    plain = DecodeEngine(config, params, **kw)
    ref = plain.generate([Request(request_id=i, prompt_ids=p,
                                  sampling=_greedy(8))
                          for i, p in enumerate(prompts)])

    mesh = _mesh_tp2()
    eng = DecodeEngine(config, params, mesh=mesh, **kw)
    assert eng.tp is not None
    # params and caches actually sharded over the tp axis
    qw_shard = eng.params["layers"]["q_w"].sharding.spec
    assert "tp" in str(qw_shard)
    assert eng.caches["k"].sharding.spec[3] == "tp"
    outs = eng.generate([Request(request_id=i, prompt_ids=p,
                                 sampling=_greedy(8))
                         for i, p in enumerate(prompts)])
    for o, r in zip(outs, ref):
        assert o.output_ids == r.output_ids, (o.output_ids, r.output_ids)


def test_engine_tp_rejects_device_combo(setup):
    config, params = setup
    with pytest.raises(ValueError, match="not both"):
        DecodeEngine(config, params, mesh=_mesh_tp2(),
                     device=jax.devices()[0])


def test_builder_honors_decode_tp(tmp_path):
    """actor_infer tensor_model_parallel_size=2 → ONE TP engine on a 2-device
    mesh (ref vllm tensor_parallel_size, examples/infer yaml)."""
    from tests.test_mesh_wiring import _tiny_setup, _cfg, ENGINE_KWARGS
    from socioreasoner_tpu.pipeline.rlvr.socioseg_infer_pipeline import (
        SocioSegInferPipeline)
    model_config, processor, sam_config, sam_params, dataset = _tiny_setup()
    cfg = _cfg(tmp_path)
    cfg.actor_infer.strategy_args.strategy_config = {
        "tensor_model_parallel_size": 2}
    cfg.actor_infer.generating_args.num_return_sequences = 1
    policy = qmodel.init_params(model_config, jax.random.key(0), jnp.float32)
    pipe = SocioSegInferPipeline(
        cfg, model_config=model_config, policy_params=policy,
        sam_config=sam_config, sam_params=sam_params,
        processor=processor, dataset=dataset, engine_kwargs=ENGINE_KWARGS)
    assert len(pipe.decode_replicas) == 1
    eng = pipe.decode_replicas[0].engine
    assert eng.tp is not None and eng.mesh.shape["tp"] == 2
    out = pipe._two_stage(dataset)
    assert len(out["s2_masks"]) == 2


def test_validate_config_decode_tp(tmp_path):
    from tests.test_mesh_wiring import _cfg
    from socioreasoner_tpu.configs.validation import validate_config
    cfg = _cfg(tmp_path)
    # TP×DP composes since r4 (ref vllm_strategy.py:98-106) — 2 replicas ×
    # tp=2 = 4 devices is valid on 8
    cfg.actor_infer.strategy_args.strategy_config = {
        "tensor_model_parallel_size": 2, "dp_size": 2}
    validate_config(cfg, n_devices=8)
    # ...but the composed plane must fit the device count
    cfg.actor_infer.strategy_args.strategy_config = {
        "tensor_model_parallel_size": 4, "dp_size": 3}
    with pytest.raises(ValueError, match="devices needed|needs"):
        validate_config(cfg, n_devices=8)
    cfg.actor_infer.strategy_args.strategy_config = {
        "tensor_model_parallel_size": 2}
    validate_config(cfg, n_devices=8)


def test_builder_composes_tp_dp(tmp_path):
    """dp_size=2 × tp=2 → two TP engines on DISJOINT 2-device sub-meshes,
    and the scheduler routes requests across both (VERDICT r3 Missing #1;
    ref vllm_strategy.py:98-106 tp-per-engine × dp-across-cluster)."""
    from tests.test_mesh_wiring import _tiny_setup, _cfg, ENGINE_KWARGS
    from socioreasoner_tpu.pipeline.rlvr.socioseg_infer_pipeline import (
        SocioSegInferPipeline)
    model_config, processor, sam_config, sam_params, dataset = _tiny_setup()
    cfg = _cfg(tmp_path)
    cfg.actor_infer.strategy_args.strategy_config = {
        "tensor_model_parallel_size": 2, "dp_size": 2}
    cfg.actor_infer.generating_args.num_return_sequences = 1
    policy = qmodel.init_params(model_config, jax.random.key(0), jnp.float32)
    pipe = SocioSegInferPipeline(
        cfg, model_config=model_config, policy_params=policy,
        sam_config=sam_config, sam_params=sam_params,
        processor=processor, dataset=dataset, engine_kwargs=ENGINE_KWARGS)
    assert len(pipe.decode_replicas) == 2
    dev_groups = []
    for rep in pipe.decode_replicas:
        eng = rep.engine
        assert eng.tp is not None and eng.mesh.shape["tp"] == 2
        dev_groups.append(frozenset(eng.mesh.devices.flat))
    assert dev_groups[0].isdisjoint(dev_groups[1])
    out = pipe._two_stage(dataset)
    assert len(out["s2_masks"]) == len(dataset)
    # both replicas must have actually served prefill work
    assert all(rep.engine.prefill_rows > 0 for rep in pipe.decode_replicas)


def test_engine_tp_prefix_fork(setup):
    """Identical prompts under tp=2: the sibling must FORK (KV row copy on
    the head-sharded cache, no collective) and match the unsharded engine."""
    config, params = setup
    kw = dict(max_slots=2, max_len=64, decode_chunk=4,
              prefill_buckets=(16, 32), cache_dtype=jnp.float32)
    rng = np.random.default_rng(2)
    prompt = rng.integers(2, 200, size=7).tolist()
    reqs = lambda: [Request(request_id=i, prompt_ids=list(prompt),
                            sampling=_greedy(6)) for i in range(2)]

    plain = DecodeEngine(config, params, prefix_fork=False, **kw)
    ref = plain.generate(reqs())

    eng = DecodeEngine(config, params, mesh=_mesh_tp2(), **kw)
    outs = eng.generate(reqs())
    assert eng.forked_requests == 1 and eng.prefill_rows == 1
    assert eng.caches["k"].sharding.spec[3] == "tp"
    for o, r in zip(outs, ref):
        assert o.output_ids == r.output_ids, (o.output_ids, r.output_ids)


def test_engine_rehomes_foreign_committed_embeds(setup):
    """ViT embeds committed to an 8-device mesh (the train mesh) fed to an
    engine pinned to ONE device must be re-homed at prefill, not error
    (the train->decode activation hand-off on a disaggregated deployment)."""
    from jax.sharding import NamedSharding, PartitionSpec as P
    from socioreasoner_tpu.parallel.mesh import make_mesh

    config, params = setup
    train_mesh = make_mesh(dp=2, fsdp=2, tp=2)
    n_img = 4
    rng = np.random.default_rng(3)
    embeds = jax.device_put(
        jnp.asarray(rng.standard_normal((n_img, config.text.hidden_size)),
                    jnp.float32),
        NamedSharding(train_mesh, P()))           # committed to all 8 devices
    prompt = rng.integers(2, 200, size=3).tolist()
    ids = prompt[:2] + [config.image_token_id] * n_img + prompt[2:]

    for dev in (jax.devices()[0], jax.devices()[1]):
        eng = DecodeEngine(config, params, max_slots=2, max_len=64,
                           decode_chunk=4, prefill_buckets=(16,),
                           cache_dtype=jnp.float32, device=dev,
                           image_buckets=(0, 8))
        out = eng.generate([Request(
            request_id="r", prompt_ids=list(ids),
            sampling=SamplingParams(temperature=0.0, do_sample=False,
                                    max_new_tokens=3),
            image_embeds=embeds)])[0]
        assert out.finish_reason != "error", out.meta
        assert len(out.output_ids) >= 1
