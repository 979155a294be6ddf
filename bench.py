"""Benchmark entry — prints ONE JSON line for the driver.

Headline metric (round 2+): **SocioSeg tiles/sec/chip** through the full
two-stage inference pipeline — stage-1 decode (map+sat → bboxes) → SAM2 masks
→ render/restage → stage-2 decode (point prompts) → SAM2 masks → giou — at
Qwen2.5-VL-3B/bf16 dims + SAM2-hiera-large dims on synthetic 768×768 tiles
(BASELINE.md north star; ref rlvr_socioseg_vlm_pipeline_infer.py:617-919).
Secondary: text prefill tokens/s (MXU ceiling) and engine decode tokens/s at
8/24 slots (HBM ceiling).

Weights are random (no egress in the bench harness); decode output TEXT is a
canned realistic response (the tokenizer's decode), so parsing/SAM/render see
the production workload shape while the device does full real decode work.

vs_baseline: measured tiles/s vs a **theoretical H20 model** (the reference
publishes no numbers — BASELINE.md): per-tile time on one H20 modeled as
bandwidth-bound decode (6.2 GB bf16 weights / 60% of 4.0 TB/s, shared over
the batch) + compute-bound prefill/vision/SAM at 0.4 MFU of 148 TFLOP/s.
Labeled `anchor: theoretical-h20-model` in detail.
"""

import json
import sys
import time

import numpy as np

STAGE_RESPONSE = (
    "<think>The map tile shows several residential blocks along the main "
    "road; matching structures are visible in the satellite image at the "
    "same coordinates.</think>\n<answer>" + json.dumps(
        [{"bbox_2d": [40 + 80 * i, 60 + 70 * i, 160 + 80 * i, 180 + 70 * i],
          "points": [[80 + 80 * i, 100 + 70 * i], [120 + 80 * i, 140 + 70 * i]]}
         for i in range(6)]) + "</answer>")


def _bench_tokenizer():
    """SimpleTokenizer whose decode() of a long id sequence returns a canned
    realistic two-stage response (bboxes+points), so the host parse/SAM/render
    path runs at production shape while decode does real device work."""
    from socioreasoner_tpu.datasets.processor import SimpleTokenizer

    class BenchTokenizer(SimpleTokenizer):
        def __init__(self):
            super().__init__(vocab_size=151936)
            self.pad_token_id = 151643
            self.eos_token_id = 151645

        def decode(self, ids, skip_special_tokens=False):
            # the infer pipeline only decodes RESPONSES — always hand back the
            # canned realistic text so parsing/SAM/render see production shape
            if len(ids) >= 1:
                return STAGE_RESPONSE
            return super().decode(ids, skip_special_tokens)

    return BenchTokenizer()


def bench_socioseg(n_tiles: int = None, max_new: int = 256, tiny: bool = False,
                   kv_quant: str = None, weight_quant: str = None):
    """Full two-stage pipeline on synthetic tiles; returns (tiles/s, detail).

    Defaults = the best chip-verified config from the r4 sweep
    (docs/BENCH_MATRIX_r4.md wave 5: 32 tiles / 32 slots, int8 weights
    single-copy, restage group 8, max_len 3328, buckets 2048/2560/3072,
    per-sample ViT embeds → 0.879 tiles/s). Every experimental config goes
    through env knobs (SOCIO_BENCH_TILES / _SLOTS / _KV_QUANT /
    _WEIGHT_QUANT=none|int8|int4 / _SINGLE_COPY / _ACT_QUANT / _MAXLEN /
    _BUCKETS / _PREFILL_BATCH, SOCIO_GROUP_SIZE, SOCIO_PACK_EMBEDS) and
    must complete a full on-chip run before becoming the default — round 2
    shipped an untested default and the driver bench crashed (VERDICT r2
    Weak #1).

    tiny=True (or env SOCIO_BENCH_TINY=1): scaled-down dims for a CPU plumbing
    check — NOT a performance number."""
    import os

    import jax
    import jax.numpy as jnp
    from PIL import Image
    from socioreasoner_tpu.configs.rlvr_config import SocioSegConfig
    from socioreasoner_tpu.datasets.processor import (ImageProcessorConfig,
                                                      SocioProcessor)
    from socioreasoner_tpu.datasets.socioseg import encode_sample
    from socioreasoner_tpu.models.qwen2_5_vl.config import (Qwen25VLConfig,
                                                            TextConfig,
                                                            VisionConfig)
    from socioreasoner_tpu.models.qwen2_5_vl import model as qmodel
    from socioreasoner_tpu.models.sam2.config import Sam2Config
    from socioreasoner_tpu.models.sam2 import model as smodel
    from socioreasoner_tpu.pipeline.rlvr.socioseg_infer_pipeline import (
        SocioSegInferPipeline)

    if n_tiles is None:
        n_tiles = 2 if tiny else int(os.environ.get("SOCIO_BENCH_TILES", "32"))
    kv_quant = kv_quant or os.environ.get("SOCIO_BENCH_KV_QUANT") or None
    weight_quant = (weight_quant
                    or os.environ.get("SOCIO_BENCH_WEIGHT_QUANT", "int8"))
    if tiny or weight_quant in ("none", "0", ""):   # env opt-out / CPU check
        weight_quant = None
    act_quant = os.environ.get("SOCIO_BENCH_ACT_QUANT", "int8")
    # w8a8 needs int8 weights specifically: int4's group-wise scales have no
    # a8 kernel (engine rejects the combination), so int4 runs w4a16
    if act_quant in ("none", "0", "") or weight_quant != "int8" or tiny:
        act_quant = None
    if tiny:
        model_config = Qwen25VLConfig(
            vision=VisionConfig(depth=2, hidden_size=64, intermediate_size=128,
                                num_heads=4, out_hidden_size=64, window_size=28,
                                fullatt_block_indexes=(1,)),
            text=TextConfig(hidden_size=64, intermediate_size=128,
                            num_hidden_layers=2, num_attention_heads=4,
                            num_key_value_heads=2, head_dim=16,
                            mrope_section=(2, 3, 3)))
        sam_config = Sam2Config.tiny_test()
        img_cfg = ImageProcessorConfig(min_pixels=56 * 56,
                                       max_pixels=56 * 56 * 4,
                                       defer_patchify=True)
        tile_px, prompt_len, max_new = 96, 1024, min(max_new, 8)
        buckets, max_len = (1024,), 1100
    else:
        model_config = Qwen25VLConfig()           # 3B dims incl. ViT
        sam_config = Sam2Config.large()           # sam2-hiera-large dims
        img_cfg = ImageProcessorConfig(defer_patchify=True)
        tile_px, prompt_len = 768, 4096
        # shape discipline for the streaming (overlapped-restage) engine:
        # few prompt buckets + one image bucket + a pinned admission batch
        # keep the prefill compile-combo space tiny, so the nondeterministic
        # arrival order of stage-2 requests can never hit a fresh compile in
        # the timed run (each remote prefill compile costs minutes)
        # measured prompt lengths at 768px tiles: s1 = 2016 tokens, s2 ≈ 2540
        # (map+sat ≈ 1458 image rows + text + stage-1 bbox JSON) — the 3072
        # bucket catches s2 prompts that previously padded to 4096 (38% of
        # the s2 prefill FLOPs were padding)
        # max_len 3328 = the 3072 bucket + 256 new tokens; s1 prompts are
        # 2016 tokens (2048 bucket), s2 ≈ 2540 (2560 bucket; 3072 is the
        # safety bucket for longer bbox JSON)
        max_len = int(os.environ.get("SOCIO_BENCH_MAXLEN", "3328"))
        if os.environ.get("SOCIO_BENCH_BUCKETS"):
            buckets = tuple(int(b) for b in
                            os.environ["SOCIO_BENCH_BUCKETS"].split(","))
        else:
            buckets = (tuple(b for b in (2048, 2560, 3072) if b <= max_len)
                       or (max_len,))
    params = qmodel.init_params(model_config, jax.random.key(0),
                                dtype=jnp.bfloat16, with_vision=True)
    single_copy = (os.environ.get("SOCIO_BENCH_SINGLE_COPY", "1") == "1"
                   and weight_quant and not tiny)
    if single_copy:
        # single-copy serving: quantize the decoder stacks IN PLACE before
        # any other reference exists, so the bf16 stacks are freed leaf by
        # leaf — prefill and decode then share the one quantized tree
        # (~3.4 GB at 3B instead of 9.3 GB hybrid), which is what unlocks
        # 16+ slots together with weight quantization on a 16 GB v5e
        from socioreasoner_tpu.ops.quant import quantize_decode_params
        quantize_decode_params(params, mode=weight_quant, inplace=True)
    vit_quant = os.environ.get("SOCIO_BENCH_VIT_QUANT") or None
    if vit_quant == "int8" and not tiny:
        # w8a8 ViT tower (env-gated until chip-verified end to end)
        from socioreasoner_tpu.ops.quant import quantize_vision_params
        quantize_vision_params(params["vision"], inplace=True)
    sam_params = smodel.init_params(sam_config, jax.random.key(1),
                                    dtype=jnp.bfloat16)

    processor = SocioProcessor(_bench_tokenizer(), img_cfg)

    rng = np.random.default_rng(0)
    tiles = []
    for i in range(n_tiles):
        mask = np.zeros((tile_px, tile_px), np.uint8)
        mask[tile_px // 4:tile_px // 2, tile_px // 5:tile_px // 2] = 255
        tiles.append({
            "id": f"tile{i}",
            "map": Image.fromarray(rng.integers(0, 255, (tile_px, tile_px, 3),
                                                dtype=np.uint8)),
            "sat": Image.fromarray(rng.integers(0, 255, (tile_px, tile_px, 3),
                                                dtype=np.uint8)),
            "mask": Image.fromarray(mask),
            "question": "residential area",
        })
    dataset = [encode_sample(t, img_cfg) for t in tiles]

    cfg = SocioSegConfig(rollout_batch_size=n_tiles, prompt_length=prompt_len,
                         response_length=max_new, track_with="stdout")
    cfg.actor_infer.generating_args.max_new_tokens = max_new
    cfg.actor_infer.generating_args.temperature = 1.0
    cfg.actor_infer.generating_args.top_p = 0.8      # ref infer yaml anchors
    pipe = SocioSegInferPipeline(
        cfg, model_config=model_config, policy_params=params,
        sam_config=sam_config, sam_params=sam_params, processor=processor,
        dataset=dataset,
        # slots decoupled from tiles: a queue DEEPER than the slot count keeps
        # decode occupancy high across the s1→restage→s2 boundary (the r4d
        # traces show identical configs swinging 702→1786 decode steps purely
        # on restage-arrival raggedness at tiles == slots)
        engine_kwargs={"max_slots": int(os.environ.get("SOCIO_BENCH_SLOTS",
                                                       "0")) or n_tiles,
                       "max_len": max_len,
                       "decode_chunk": int(os.environ.get(
                           "SOCIO_BENCH_DECODE_CHUNK", "64")),
                       # int8-KV workaround: short loop executables, one
                       # readback per chunk (engine.decode_inner docstring)
                       "decode_inner": int(os.environ.get(
                           "SOCIO_BENCH_DECODE_INNER", "0")),
                       "prefill_buckets": buckets,
                       **({} if tiny else
                          # 1458 image rows/prompt at 768px: the image bucket
                          # must hold a full admission batch or _next_group
                          # can never form one (1536 rows headroom per slot)
                          {"image_buckets":
                               (0, 1536 * int(os.environ.get(
                                   "SOCIO_BENCH_PREFILL_BATCH", "2"))),
                           "prefill_batch_sizes":
                               (int(os.environ.get("SOCIO_BENCH_PREFILL_BATCH",
                                                   "2")),)}),
                       # long-prompt prefill activations scale with the
                       # admission batch; cap it so many resident slots fit HBM
                       "max_prefill_batch": 8 if n_tiles > 8 else None,
                       # int8 KV halves cache HBM (1.9 GB vs 3.8 at 24×4k
                       # slots) — env-gated until verified on-chip end to end
                       "kv_quant": None if tiny else kv_quant,
                       "weight_quant": None if tiny else weight_quant,
                       # w8a8 prefill (int8×int8 MXU): chip-verified e2e in
                       # r4 wave 9 (0.879 → 0.921 tiles/s); opt out with
                       # SOCIO_BENCH_ACT_QUANT=none
                       "act_quant": act_quant,
                       "cache_dtype": jnp.bfloat16})

    t_w = time.perf_counter()
    pipe._two_stage(dataset)                      # warmup: all compiles
    print(f"[bench] socioseg warmup done in {time.perf_counter() - t_w:.0f}s",
          file=sys.stderr, flush=True)
    engines = [w.engine for w in pipe.decode_replicas
               if getattr(w, "engine", None) is not None]
    # median-of-N timed runs (VERDICT r4 weak #1: the headline swung ±25%
    # run-to-run on restage-arrival raggedness; report median + spread so a
    # single ragged run can't set the round's record)
    n_runs = 1 if tiny else int(os.environ.get("SOCIO_BENCH_RUNS", "3"))
    durations, steps_per_run = [], []
    for _ in range(n_runs):
        steps0 = sum(e.steps_executed for e in engines)
        t0 = time.perf_counter()
        out = pipe._two_stage(dataset)
        durations.append(time.perf_counter() - t0)
        steps_per_run.append(sum(e.steps_executed for e in engines) - steps0)
        # progress evidence: a timed-out run should still leave the per-run
        # numbers in the log (the 3-run socioseg phase can exceed an outer
        # timeout when a cold remote compile eats the budget)
        print(f"[bench] socioseg run {len(durations)}/{n_runs}: "
              f"{durations[-1]:.1f}s, {steps_per_run[-1]} steps "
              f"({n_tiles / durations[-1]:.3f} tiles/s)",
              file=sys.stderr, flush=True)
    mid = sorted(range(n_runs), key=lambda i: durations[i])[n_runs // 2]
    dt, steps = durations[mid], steps_per_run[mid]
    spread = ((max(durations) - min(durations)) / dt) if n_runs > 1 else 0.0
    # realism check: the canned responses must actually drive SAM
    n_mask_px = int(sum(m.sum() > 0 for m in out["s2_masks"]))
    assert n_mask_px == n_tiles, "SAM path not exercised"
    # decode occupancy diagnostic: tokens decoded / (steps × slots). Low
    # occupancy = slots idling across the s1→restage→s2 boundary — the
    # dominant run-to-run noise source at tiles == slots.
    slots = sum(e.S for e in engines)
    toks = 2 * n_tiles * max_new              # both stages decode max_new
    return n_tiles / dt, {
        "tiles": n_tiles, "batch_latency_s": round(dt, 2),
        "runs": [round(d, 2) for d in durations],
        "run_spread": round(spread, 3),
        "per_tile_latency_s": round(dt / n_tiles, 3),
        "max_new_tokens_per_stage": max_new,
        "objects_per_tile": 6, "tile_px": tile_px,
        "kv_quant": kv_quant, "weight_quant": weight_quant,
        "act_quant": act_quant, "vit_quant": vit_quant,
        "single_copy_quant": bool(single_copy),
        "decode_steps": steps, "slots": slots,
        "decode_occupancy": round(toks / max(steps * slots, 1), 3),
    }


def h20_theoretical_tiles_per_s(n_tiles: int, prompt_tokens: int,
                                decode_tokens: int) -> float:
    """Theoretical per-chip H20 model for the same workload (labeled anchor;
    the reference publishes no measurements — BASELINE.md). Decode modeled
    HBM-bound: weight reads amortized over the batch; prefill/vision/SAM
    modeled at 0.4 MFU of dense bf16 peak."""
    text_bytes = 6.2e9                      # 3.1B params bf16
    hbm = 0.6 * 4.0e12                      # H20 4.0 TB/s at 60% efficiency
    decode_s = decode_tokens * text_bytes / hbm            # per decode STEP
    flops_prefill = 2 * 3.1e9 * prompt_tokens * n_tiles * 2   # two stages
    flops_vision = 2 * 0.67e9 * 3000 * 2 * n_tiles * 2       # ViT ~0.67B
    flops_sam = 2 * 0.22e9 * 4900 * n_tiles * 2              # hiera-L tokens
    compute_s = (flops_prefill + flops_vision + flops_sam) / (0.4 * 148e12)
    return n_tiles / (decode_s + compute_s)


def bench_prefill():
    import jax
    import jax.numpy as jnp
    from socioreasoner_tpu.models.qwen2_5_vl.config import Qwen25VLConfig
    from socioreasoner_tpu.models.qwen2_5_vl import model as qmodel
    from socioreasoner_tpu.models.qwen2_5_vl import rope as qrope

    config = Qwen25VLConfig()
    params = qmodel.init_params(config, jax.random.key(0), dtype=jnp.bfloat16,
                                with_vision=False)
    B, L, iters = 1, 1024, 10
    rng = np.random.default_rng(0)
    ids_stack = rng.integers(10, 100000, size=(iters, B, L))
    attn = np.ones((B, L), np.int32)
    pos, _ = qrope.get_rope_index(config, ids_stack[0], None, attn)

    @jax.jit
    def fwd_loop(params, ids_stack, pos, attn):
        def body(i, c):
            ids_i = jax.lax.dynamic_index_in_dim(ids_stack, i, keepdims=False)
            hidden, _ = qmodel.forward(config, params, ids_i, pos, attn,
                                       logits=False, use_flash=True)
            return c + hidden.astype(jnp.float32).mean()
        return jax.lax.fori_loop(0, iters, body, jnp.float32(0.0))

    args = (params, jnp.asarray(ids_stack), jnp.asarray(pos), jnp.asarray(attn))
    float(fwd_loop(*args))                      # compile + warmup
    t0 = time.perf_counter()
    float(fwd_loop(*args))
    dt = (time.perf_counter() - t0) / iters
    tokens_per_s = B * L / dt
    mfu = tokens_per_s * 2 * 3.1e9 / 197e12
    return params, config, tokens_per_s, mfu, dt


def bench_decode(params, config, rng):
    """Engine throughput at serving concurrency.

    Reports (a) e2e tokens/s incl. batched-prefill admission (the number a
    serving user sees for short generations) and (b) steady-state decode-only
    tokens/s (the HBM-roofline number). Both exclude compile: the batch runs
    twice and the second run is measured."""
    from socioreasoner_tpu.generation.engine import DecodeEngine, Request
    from socioreasoner_tpu.generation.sampling import SamplingParams

    def decode_tps(slots, max_new):
        engine = DecodeEngine(config, params, max_slots=slots, max_len=1536,
                              decode_chunk=64, prefill_buckets=(512,))
        sp = SamplingParams(temperature=1.0, top_p=0.9, top_k=50,
                            max_new_tokens=max_new)

        def make_reqs(tag):
            return [Request(request_id=(tag, i),
                            prompt_ids=rng.integers(10, 100000,
                                                    size=400).tolist(),
                            sampling=sp) for i in range(slots)]

        engine.generate(make_reqs("warm"))          # compiles prefill + decode
        reqs = make_reqs("run")
        for r in reqs:
            engine.waiting.append(r)
        t0 = time.perf_counter()
        outs = engine.step()                        # batched prefill + chunk 1
        t1 = time.perf_counter()
        # steady-state steps must come from the engine's own counter: the
        # in-chunk early exit can run < decode_chunk steps per step() call,
        # and counting decode_chunk per call inflated BENCH_r03's int8 number
        # by 1.49x (VERDICT r3 Weak #2)
        steps0 = engine.steps_executed
        while engine.has_work():
            outs += engine.step()
        nsteps = engine.steps_executed - steps0
        t2 = time.perf_counter()
        toks = sum(len(o.output_ids) for o in outs)
        e2e = toks / (t2 - t0)
        steady = slots * nsteps / (t2 - t1)
        return e2e, steady

    e2e8, steady8 = decode_tps(8, 256)
    e2e24, steady24 = decode_tps(24, 128)
    return e2e8, steady8, e2e24, steady24


def bench_decode_int8(params, config, rng):
    """Steady-state decode with the hybrid weight-only int8 path
    (weight_quant='int8'). Runs by default; disable with SOCIO_BENCH_INT8=0.
    The int8 decode graph takes ~9 min through a COLD axon remote XLA
    compiler (server-side HLO cache makes reruns ~30 s; measured 7.0 ms/step
    = 3430 tok/s at 24 slots on v5e)."""
    from socioreasoner_tpu.generation.engine import DecodeEngine, Request
    from socioreasoner_tpu.generation.sampling import SamplingParams

    engine = DecodeEngine(config, params, max_slots=24, max_len=1536,
                          decode_chunk=64, prefill_buckets=(512,),
                          weight_quant="int8")
    sp = SamplingParams(temperature=1.0, top_p=0.9, top_k=50,
                        max_new_tokens=129)
    reqs = [Request(request_id=i,
                    prompt_ids=rng.integers(10, 100000, size=400).tolist(),
                    sampling=sp) for i in range(24)]
    engine.generate([Request(request_id="warm", prompt_ids=reqs[0].prompt_ids,
                             sampling=SamplingParams(max_new_tokens=65))])
    for r in reqs:
        engine.waiting.append(r)
    engine.step()
    t0 = time.perf_counter()
    steps0 = engine.steps_executed     # honest count under in-chunk early exit
    while engine.has_work():
        engine.step()
    nsteps = engine.steps_executed - steps0
    return 24 * nsteps / (time.perf_counter() - t0)


def bench_prefill_w8a8(params, config):
    """w8a8 prefill throughput (int8 weights x int8 activations on the MXU) at
    the socioseg production admit shape (B=2, L=2048). This is the path the
    DecodeEngine actually runs for admission when act_quant='int8' (chip-
    verified e2e in r4 wave 9), timed here in isolation through the same
    cached forward the engine prefill uses (text.py matmul_q applies weight
    scales; the uncached x @ w would multiply int8 codes without scales).
    VERDICT r4 item 5: the >=30k tok/s prefill target is only reachable on
    the int8 MXU rate (394 TOPS vs 197 bf16) — bf16 dense would need 0.94 MFU."""
    import gc

    import jax
    import jax.numpy as jnp
    from socioreasoner_tpu.models.qwen2_5_vl import model as qmodel
    from socioreasoner_tpu.models.qwen2_5_vl import rope as qrope
    from socioreasoner_tpu.ops.flags import use_flash_attention
    from socioreasoner_tpu.ops.quant import quantize_decode_params

    qparams = quantize_decode_params(params, mode="int8")
    gc.collect()
    B, L, iters = 2, 2048, 8
    rng = np.random.default_rng(0)
    ids_stack = rng.integers(10, 100000, size=(iters, B, L))
    attn = np.ones((B, L), np.int32)
    pos, _ = qrope.get_rope_index(config, ids_stack[0], None, attn)
    Lyr = config.text.num_hidden_layers
    Hkv, D = config.text.num_key_value_heads, config.text.head_dim

    @jax.jit
    def fwd_loop(qparams, ids_stack, pos, attn):
        cache_positions = jnp.broadcast_to(jnp.arange(L)[None], (B, L))

        def body(i, c):
            ids_i = jax.lax.dynamic_index_in_dim(ids_stack, i, keepdims=False)
            cache = {"k": jnp.zeros((Lyr, B, L, Hkv, D), jnp.bfloat16),
                     "v": jnp.zeros((Lyr, B, L, Hkv, D), jnp.bfloat16),
                     "kv_valid": attn}
            hidden, _ = qmodel.forward(config, qparams, ids_i, pos, None,
                                       cache=cache,
                                       cache_positions=cache_positions,
                                       use_flash=use_flash_attention(),
                                       logits=False, act_quant=True)
            return c + hidden.astype(jnp.float32).mean()
        return jax.lax.fori_loop(0, iters, body, jnp.float32(0.0))

    args = (qparams, jnp.asarray(ids_stack), jnp.asarray(pos),
            jnp.asarray(attn))
    float(fwd_loop(*args))                      # compile + warmup
    t0 = time.perf_counter()
    float(fwd_loop(*args))
    dt = (time.perf_counter() - t0) / iters
    tokens_per_s = B * L / dt
    del qparams
    gc.collect()
    return tokens_per_s


def bench_train_step(params, config):
    """One-chip 3B GRPO train-step + logprob throughput (VERDICT r4 item 4;
    ref metrics system/actor_train/tps, rlvr_socioseg_vlm_pipeline.py:1093-1108).

    Shape: B×2304 tokens (the socioseg 2048-prompt bucket + 256 response) at
    full 3B text dims, remat, PPO loss with KL. Honest scaling notes, recorded
    in the returned detail:
      - optimizer = adafactor (factored second moments): AdamW moments for
        3.1B params are 24.8 GB fp32 — they cannot sit next to params+grads
        on one 16 GB v5e; multi-chip shards them over the fsdp axis
        (dryrun_multichip validates that path). adafactor is the standard
        memory-lean TPU optimizer and runs the same fwd+bwd FLOPs.
      - the train step uses the fused chunked lm-head (no (B,L,V) logits).
      - TrainState is DONATED to the jitted step (in-place buffer reuse);
        the bench owns the only reference.
    MFU convention: 6·P FLOPs/token train (fwd 2P + bwd 4P), 2·P logprob,
    against 197 TFLOP/s bf16 peak."""
    import os

    import jax
    import jax.numpy as jnp
    import optax
    from socioreasoner_tpu.distributed.trainer import (TrainState,
                                                       make_logprob_step,
                                                       make_train_step)
    from socioreasoner_tpu.pipeline.losses import PPOLossConfig

    B = int(os.environ.get("SOCIO_BENCH_TRAIN_BATCH", "4"))
    L = 2304
    rng = np.random.default_rng(0)
    ids = rng.integers(10, 100000, size=(B, L))
    resp = np.zeros((B, L), np.int64)
    resp[:, 2048:] = 1                       # 256-token responses
    batch = {
        "input_ids": jnp.asarray(ids),
        "position_ids": jnp.asarray(
            np.tile(np.arange(L)[None, None], (B, 3, 1))),
        "attention_mask": jnp.ones((B, L), jnp.int32),
        "response_mask": jnp.asarray(resp),
        "advantages": jnp.asarray(
            rng.normal(size=(B, L - 1)).astype(np.float32)),
        "old_log_probs": jnp.asarray(
            -np.abs(rng.normal(size=(B, L - 1))).astype(np.float32)),
        "ref_log_probs": jnp.asarray(
            -np.abs(rng.normal(size=(B, L - 1))).astype(np.float32)),
    }
    optimizer = optax.chain(optax.clip_by_global_norm(1.0),
                            optax.adafactor(1e-6))
    state = TrainState.create(params, optimizer)
    loss_cfg = PPOLossConfig(pg_clip=0.2, use_kl_loss=True, kl_loss_coef=5e-3)
    step = jax.jit(make_train_step(config, loss_cfg, optimizer),
                   donate_argnums=(0,))
    state, _ = step(state, batch)            # compile + warm
    jax.block_until_ready(state.params)
    iters = 3
    t0 = time.perf_counter()
    for _ in range(iters):
        state, metrics = step(state, batch)
    jax.block_until_ready(state.params)
    train_dt = (time.perf_counter() - t0) / iters
    train_tps = B * L / train_dt
    train_mfu = train_tps * 6 * 3.1e9 / 197e12

    logprob = jax.jit(make_logprob_step(config, remat=False))
    lp_batch = {k: batch[k] for k in ("input_ids", "position_ids",
                                      "attention_mask", "response_mask")}
    out = logprob(state.params, lp_batch)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = logprob(state.params, lp_batch)
    jax.block_until_ready(out)
    lp_dt = (time.perf_counter() - t0) / iters
    lp_tps = B * L / lp_dt
    return {
        "train_step_ms": round(train_dt * 1e3, 1),
        "train_tokens_per_s": round(train_tps, 1),
        "train_mfu_est": round(train_mfu, 3),
        "train_batch": [B, L],
        "train_optimizer": "adafactor",
        "logprob_step_ms": round(lp_dt * 1e3, 1),
        "logprob_tokens_per_s": round(lp_tps, 1),
        "logprob_mfu_est": round(lp_tps * 2 * 3.1e9 / 197e12, 3),
    }


def _backend_watchdog(timeout_s: float):
    """Fail fast (rc=1) if the TPU backend never comes up.

    The axon plugin's device claim blocks indefinitely when the pool is
    unreachable (observed 2026-08-17: jax.devices() hung >25 min during a
    tunnel outage), which would leave the driver with NO bench record at all.
    Probe backend init on a side thread; if it does not finish inside
    `timeout_s` (healthy claims take seconds, cold ones ~1 min), report and
    exit non-zero so the failure is recorded instead of a hang."""
    import os
    import sys
    import threading

    import jax

    done = threading.Event()

    def probe():
        jax.devices()
        done.set()

    threading.Thread(target=probe, daemon=True).start()
    if not done.wait(timeout_s):
        print(f"[bench] FATAL: jax backend init did not complete within "
              f"{timeout_s:.0f}s (TPU pool unreachable?)", file=sys.stderr)
        os._exit(1)


def main():
    import os

    import jax

    if os.environ.get("SOCIO_BENCH_TINY") != "1":
        _backend_watchdog(float(os.environ.get(
            "SOCIO_BENCH_INIT_TIMEOUT", "900")))
    rng = np.random.default_rng(0)

    if os.environ.get("SOCIO_BENCH_TINY") == "1":
        # CPU plumbing check only — runs the full two-stage path at toy dims
        tiles_per_s, socio_detail = bench_socioseg(n_tiles=2, tiny=True)
        print(json.dumps({"metric": "socioseg_tiles_per_s_per_chip",
                          "value": round(tiles_per_s, 3), "unit": "tiles/s",
                          "vs_baseline": 0.0,
                          "detail": {**socio_detail, "tiny_plumbing_check": True}}))
        return

    import gc
    import sys
    import traceback

    # Phase isolation: round 2's driver bench recorded NOTHING because the
    # socioseg phase kernel-faulted and killed the process (VERDICT r2 Weak
    # #1). Each phase now reports its failure in `detail` instead of taking
    # the whole bench down; the JSON line is emitted as long as ANY phase
    # produced a number (exit 1 only when everything failed).
    errors = {}
    tiles_per_s = socio_detail = h20 = None
    try:
        if os.environ.get("SOCIO_BENCH_SOCIO", "1") != "1":
            # phase-isolation knob: skip the ~40 min socioseg phase when
            # validating the later phases (prefill/decode/w8a8/train) alone;
            # the JSON line then falls back to the prefill metric
            raise RuntimeError("socioseg phase skipped (SOCIO_BENCH_SOCIO=0)")
        tiles_per_s, socio_detail = bench_socioseg()
    except Exception as e:  # noqa: BLE001
        errors["socioseg_error"] = f"{type(e).__name__}: {e}"
        traceback.print_exc()
        if (os.environ.get("SOCIO_BENCH_TILES") is None
                and os.environ.get("SOCIO_BENCH_SOCIO", "1") == "1"):
            # retry once at the conservative 8-tile bf16 config: never let
            # the tuned default (32 tiles + int8 weights) be the reason the
            # driver records no socioseg number at all
            os.environ.update(SOCIO_BENCH_TILES="8",
                              SOCIO_BENCH_WEIGHT_QUANT="none")
            gc.collect()
            try:
                tiles_per_s, socio_detail = bench_socioseg()
                socio_detail["conservative_fallback"] = True
            except Exception as e2:  # noqa: BLE001
                errors["socioseg_retry_error"] = f"{type(e2).__name__}: {e2}"
                traceback.print_exc()
    if tiles_per_s is not None:
        h20 = h20_theoretical_tiles_per_s(
            socio_detail["tiles"], prompt_tokens=2048,
            decode_tokens=2 * socio_detail["max_new_tokens_per_stage"])
        print(f"[bench] socioseg {tiles_per_s:.3f} tiles/s", file=sys.stderr)
    # free the socioseg pipeline's 3B+ViT+SAM params/caches before the prefill
    # phase allocates its own 3B copy — together they exceed v5e's 16 GB HBM
    gc.collect()

    try:
        params, config, prefill_tps, mfu, dt = bench_prefill()
        print(f"[bench] prefill {prefill_tps:.0f} tok/s", file=sys.stderr)
    except Exception as e:  # noqa: BLE001
        errors["prefill_error"] = f"{type(e).__name__}: {e}"
        traceback.print_exc()
        if tiles_per_s is None:
            print(json.dumps({"metric": "socioseg_tiles_per_s_per_chip",
                              "value": 0.0, "unit": "tiles/s",
                              "vs_baseline": 0.0, "detail": errors}))
            raise
        prefill_tps = mfu = None
    try:
        if prefill_tps is None:
            raise RuntimeError("prefill phase failed; no params for decode")
        e2e8, steady8, e2e24, steady24 = bench_decode(params, config, rng)
        print(f"[bench] decode e2e {e2e8:.0f}/{e2e24:.0f}, steady "
              f"{steady8:.0f}/{steady24:.0f} tok/s @8/24", file=sys.stderr)
    except Exception as e:  # noqa: BLE001
        errors["decode_error"] = f"{type(e).__name__}: {e}"
        e2e8 = steady8 = e2e24 = steady24 = None
    int8_detail = {}
    if os.environ.get("SOCIO_BENCH_INT8", "1") == "1" and prefill_tps is not None:
        # ~9 min one-time compile through a cold remote XLA compiler (fast on
        # a warm one); never let this bonus metric kill the main bench line
        try:
            steady24_q = bench_decode_int8(params, config, rng)
            print(f"[bench] decode int8 steady {steady24_q:.0f} tok/s @24",
                  file=sys.stderr)
            int8_detail["decode_int8_steady_state_tokens_per_s_24slots"] = \
                round(steady24_q, 1)
        except Exception as e:  # noqa: BLE001
            print(f"[bench] int8 decode skipped: {e}", file=sys.stderr)
    if (os.environ.get("SOCIO_BENCH_W8A8", "1") == "1"
            and prefill_tps is not None):
        try:
            w8a8_tps = bench_prefill_w8a8(params, config)
            print(f"[bench] prefill w8a8 {w8a8_tps:.0f} tok/s", file=sys.stderr)
            int8_detail["prefill_w8a8_tokens_per_s"] = round(w8a8_tps, 1)
            int8_detail["prefill_w8a8_mfu_int8"] = round(
                w8a8_tps * 2 * 3.1e9 / 394e12, 3)
        except Exception as e:  # noqa: BLE001
            print(f"[bench] w8a8 prefill skipped: {e}", file=sys.stderr)
    train_detail = {}
    if (os.environ.get("SOCIO_BENCH_TRAIN", "1") == "1"
            and prefill_tps is not None):
        # on-chip GRPO train-step numbers (VERDICT r4 item 4). Reuses the
        # prefill phase's 3B text params; the train step DONATES them, so
        # this phase must run last.
        gc.collect()
        try:
            train_detail = {"socioseg_train_step": bench_train_step(params,
                                                                    config)}
            print(f"[bench] train {train_detail['socioseg_train_step']}",
                  file=sys.stderr)
        except Exception as e:  # noqa: BLE001
            errors["train_error"] = f"{type(e).__name__}: {e}"
            traceback.print_exc()

    detail = {
        "anchor": "theoretical-h20-model",
        "bench_version": "r5-median3-honest-steps",
        **(socio_detail or {}),
        **int8_detail,
        **train_detail,
        **errors,
        "dtype": "bfloat16",
        "device": str(jax.devices()[0]),
    }
    if h20 is not None:
        detail["h20_model_tiles_per_s"] = round(h20, 3)
    if prefill_tps is not None:
        detail["prefill_tokens_per_s"] = round(prefill_tps, 1)
        detail["prefill_mfu_est"] = round(mfu, 3)
    if e2e8 is not None:
        detail.update({
            "decode_tokens_per_s_8slots": round(e2e8, 1),
            "decode_tokens_per_s_24slots": round(e2e24, 1),
            "decode_steady_state_tokens_per_s_8slots": round(steady8, 1),
            "decode_steady_state_tokens_per_s_24slots": round(steady24, 1),
        })
    if tiles_per_s is not None:
        print(json.dumps({
            "metric": "socioseg_tiles_per_s_per_chip",
            "value": round(tiles_per_s, 3),
            "unit": "tiles/s",
            "vs_baseline": round(tiles_per_s / h20, 3),
            "detail": detail,
        }))
    else:
        # socioseg phase failed — fall back to the round-1 metric so the
        # driver still records a number (vs_baseline anchors BASELINE.md
        # config 1: HF eager bf16 prefill ≈ 9547 tok/s on one H20)
        print(json.dumps({
            "metric": "qwen25vl3b_prefill_tokens_per_s_per_chip",
            "value": round(prefill_tps, 1),
            "unit": "tokens/s",
            "vs_baseline": round(prefill_tps / 9547.0, 3),
            "detail": detail,
        }))


if __name__ == "__main__":
    main()
