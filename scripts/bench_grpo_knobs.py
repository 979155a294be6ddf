"""On-chip quantification of the GRPO rollout knobs (VERDICT r3 item 9).

Two measurements, each in its own process (`python scripts/bench_grpo_knobs.py
fork|overlap`), committed to docs/BENCH_MATRIX_r4.md:

  fork    — 3B text-only DecodeEngine at GRPO fan-out shape (8 prompts ×
            n=8 siblings = 64 requests, 24 slots, 2048-token prompts,
            128 new tokens) with prefix_fork on vs off. The fork replaces
            7 of every 8 prefills with KV row copies — this is the
            `system/actor_infer/tps` lever the schedulers' sibling routing
            exists for (ref generate_scheduler.py:195-333 fan-out).

  overlap — one tiny-dims SocioSegPipeline GRPO train step with
            overlap_restage on vs off (socioseg_pipeline.py:282). Tiny dims:
            policy+reference+optimizer at 3B don't fit one v5e chip; the
            overlap win is host-restage-vs-device-decode concurrency, which
            exists at any model size (device work just shrinks).
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def log(msg):
    print(f"[{time.strftime('%H:%M:%S')}] {msg}", flush=True)


def run_fork():
    import jax
    import jax.numpy as jnp
    from socioreasoner_tpu.generation.engine import DecodeEngine, Request
    from socioreasoner_tpu.generation.sampling import SamplingParams
    from socioreasoner_tpu.models.qwen2_5_vl import model as qmodel
    from socioreasoner_tpu.models.qwen2_5_vl.config import Qwen25VLConfig

    config = Qwen25VLConfig()
    params = qmodel.init_params(config, jax.random.key(0), dtype=jnp.bfloat16,
                                with_vision=False)
    rng = np.random.default_rng(0)
    prompts = [rng.integers(10, 100000, size=2040).tolist() for _ in range(8)]
    sp = SamplingParams(temperature=1.0, top_p=0.8, top_k=0,
                        max_new_tokens=128)

    results = {}
    for fork in (False, True):
        eng = DecodeEngine(config, params, max_slots=24, max_len=2304,
                           decode_chunk=64, prefill_buckets=(2048,),
                           prefix_fork=fork, seed=3)
        # warmup compiles (prefill, decode, fork-copy)
        eng.generate([Request(request_id=("w", j), prompt_ids=list(prompts[0]),
                              sampling=SamplingParams(max_new_tokens=8))
                      for j in range(2)])
        reqs = [Request(request_id=(i, j), prompt_ids=list(p), sampling=sp)
                for i, p in enumerate(prompts) for j in range(8)]
        t0 = time.perf_counter()
        outs = eng.generate(reqs)
        dt = time.perf_counter() - t0
        toks = sum(len(o.output_ids) for o in outs)
        results[fork] = (toks / dt, dt, eng.prefill_rows, eng.forked_requests)
        log(f"prefix_fork={fork}: {toks} toks in {dt:.2f}s = {toks/dt:.0f} "
            f"tok/s (prefills={eng.prefill_rows} forks={eng.forked_requests})")
        log(f"  split: admit={eng.admit_time:.2f}s "
            f"(prefill_dev={eng.prefill_device_time:.2f}s) "
            f"decode={eng.decode_time:.2f}s steps={eng.steps_executed} "
            f"({1e3 * eng.decode_time / max(eng.steps_executed, 1):.1f} "
            f"ms/step)")
        del eng
    tps_off, tps_on = results[False][0], results[True][0]
    log(f"RESULT fork: actor_infer tps {tps_off:.0f} -> {tps_on:.0f} "
        f"({tps_on / tps_off:.2f}x) at 8 prompts x n=8, 2048-tok prompts")


def run_overlap():
    import jax
    import jax.numpy as jnp
    from socioreasoner_tpu.configs.rlvr_config import SocioSegConfig
    from socioreasoner_tpu.datasets.processor import (ImageProcessorConfig,
                                                      SocioProcessor)
    from socioreasoner_tpu.datasets.socioseg import encode_sample
    from socioreasoner_tpu.models.qwen2_5_vl.config import Qwen25VLConfig
    from socioreasoner_tpu.models.qwen2_5_vl import model as qmodel
    from socioreasoner_tpu.models.sam2.config import Sam2Config
    from socioreasoner_tpu.models.sam2 import model as smodel
    from socioreasoner_tpu.pipeline.rlvr.socioseg_pipeline import SocioSegPipeline
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tests"))
    from test_infer_pipeline_e2e import TinyTokenizer, make_tiles

    model_config = Qwen25VLConfig.tiny(512)
    sam_config = Sam2Config.tiny_test()
    img_cfg = ImageProcessorConfig(min_pixels=56 * 56, max_pixels=56 * 56 * 4)
    processor = SocioProcessor(TinyTokenizer(), img_cfg,
                               image_token_id=model_config.image_token_id)
    dataset = [encode_sample(t, img_cfg) for t in make_tiles(8)]

    for overlap in (False, True):
        import tempfile
        cfg = SocioSegConfig(
            output_dir=tempfile.mkdtemp(), rollout_batch_size=8,
            prompt_length=640, response_length=16, save_steps=-1,
            track_with="stdout", max_steps=2, num_return_sequences_in_group=2,
            adv_estimator="grpo", use_kl_loss=True, generate_opt_level=1)
        cfg.overlap_restage = overlap
        cfg.actor_infer.generating_args.max_new_tokens = 8
        cfg.actor_infer.generating_args.num_return_sequences = 2
        cfg.actor_train.backward_batch_size = 8
        pipe = SocioSegPipeline(
            cfg, model_config=model_config,
            policy_params=qmodel.init_params(model_config, jax.random.key(0),
                                             jnp.float32),
            reference_params=qmodel.init_params(model_config, jax.random.key(7),
                                                jnp.float32),
            sam_config=sam_config,
            sam_params=smodel.init_params(sam_config, jax.random.key(1)),
            processor=processor, dataset=dataset,
            engine_kwargs={"max_slots": 16, "max_len": 700, "decode_chunk": 4,
                           "prefill_buckets": (640,),
                           "image_buckets": (0, 16, 32, 64),
                           "cache_dtype": jnp.float32})
        # step 1 = compile warmup; step 2 timed via the pipeline's own metrics
        t0 = time.perf_counter()
        metrics = pipe.run()
        dt = time.perf_counter() - t0
        log(f"overlap_restage={overlap}: 2 steps in {dt:.1f}s, "
            f"actor_infer tps={metrics.get('system/actor_infer/tps', 0):.1f} "
            f"step2 rollout+restage time included")
        del pipe


if __name__ == "__main__":
    {"fork": run_fork, "overlap": run_overlap}[sys.argv[1]]()
