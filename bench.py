"""Benchmark entry — prints ONE JSON line for the driver.

Current metric (round 1): Qwen2.5-VL-3B text prefill throughput, bf16, single
chip, L=1024. This is the decode-engine's upper bound and tracks the compute
path that dominates SocioSeg stage-1/2 reasoning. Will evolve to SocioSeg
tiles/sec/chip once the full two-stage pipeline + SAM2 are wired (BASELINE.md).

vs_baseline: ratio vs the H20 reference anchor. The reference publishes no
numbers (BASELINE.md); we anchor on the H20's theoretical bf16 peak ratio
(v5e 197 TFLOP/s vs H20 148 TFLOP/s dense ≈ 1.33) applied to measured MFU —
i.e. vs_baseline = (our tokens/s) / (H20-peak-scaled tokens/s at same MFU=0.4
reference assumption).
"""

import json
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from socioreasoner_tpu.models.qwen2_5_vl.config import (
        Qwen25VLConfig, TextConfig, VisionConfig)
    from socioreasoner_tpu.models.qwen2_5_vl import model as qmodel
    from socioreasoner_tpu.models.qwen2_5_vl import rope as qrope

    config = Qwen25VLConfig()  # full 3B text dims (36 layers)
    key = jax.random.key(0)
    params = qmodel.init_params(config, key, dtype=jnp.bfloat16, with_vision=False)

    B, L = 1, 1024
    rng = np.random.default_rng(0)
    ids = rng.integers(10, 100000, size=(B, L))
    attn = np.ones((B, L), np.int32)
    pos, _ = qrope.get_rope_index(config, ids, None, attn)

    iters = 10
    # distinct inputs per iteration — defeats loop-invariant code motion / CSE
    ids_stack = rng.integers(10, 100000, size=(iters, B, L))

    @jax.jit
    def fwd_loop(params, ids_stack, pos, attn):
        def body(i, c):
            ids_i = jax.lax.dynamic_index_in_dim(ids_stack, i, keepdims=False)
            hidden, _ = qmodel.forward(config, params, ids_i, pos, attn,
                                       logits=False, use_flash=True)
            return c + hidden.astype(jnp.float32).mean()
        return jax.lax.fori_loop(0, iters, body, jnp.float32(0.0))

    ids_d, pos_d, attn_d = jnp.asarray(ids_stack), jnp.asarray(pos), jnp.asarray(attn)
    float(fwd_loop(params, ids_d, pos_d, attn_d))  # compile + warmup

    t0 = time.perf_counter()
    float(fwd_loop(params, ids_d, pos_d, attn_d))  # value fetch = real sync
    dt = (time.perf_counter() - t0) / iters

    tokens_per_s = B * L / dt
    # ~2*N_params FLOPs/token forward; 3B text params (no vocab head matmul here)
    n_params = 3.1e9
    flops_per_tok = 2 * n_params
    mfu = tokens_per_s * flops_per_tok / 197e12
    # H20 anchor: same MFU on 148 TFLOP/s dense bf16
    h20_tokens_per_s = 0.4 * 148e12 / flops_per_tok

    # ---- decode throughput: engine chunked loop (paged pallas attention),
    # at the RL rollout concurrency (8) and the serving concurrency (24,
    # the example configs' infer_batch_size)
    from socioreasoner_tpu.generation.engine import DecodeEngine, Request
    from socioreasoner_tpu.generation.sampling import SamplingParams

    def decode_tps(slots, max_new):
        engine = DecodeEngine(config, params, max_slots=slots, max_len=1536,
                              decode_chunk=64, prefill_buckets=(512,))
        sp = SamplingParams(temperature=1.0, top_p=0.9, top_k=50,
                            max_new_tokens=max_new)
        reqs = [Request(request_id=i,
                        prompt_ids=rng.integers(10, 100000, size=400).tolist(),
                        sampling=sp) for i in range(slots)]
        engine.generate([Request(request_id="warm", prompt_ids=reqs[0].prompt_ids,
                                 sampling=SamplingParams(max_new_tokens=33))])
        t0 = time.perf_counter()
        outs = engine.generate(reqs)
        dt = time.perf_counter() - t0
        toks = sum(len(o.output_ids) for o in outs)
        return toks, toks / dt

    decode_tokens, tps8 = decode_tps(8, 256)
    _, tps24 = decode_tps(24, 128)

    print(json.dumps({
        "metric": "qwen25vl3b_prefill_tokens_per_s_per_chip",
        "value": round(tokens_per_s, 1),
        "unit": "tokens/s",
        "vs_baseline": round(tokens_per_s / h20_tokens_per_s, 3),
        "detail": {"batch": B, "seq": L, "dtype": "bfloat16",
                   "mfu_est": round(mfu, 3), "ms_per_iter": round(dt * 1e3, 2),
                   "decode_tokens_per_s_8slots": round(tps8, 1),
                   "decode_tokens_per_s_24slots": round(tps24, 1),
                   "decode_tokens": decode_tokens,
                   "device": str(jax.devices()[0])},
    }))


if __name__ == "__main__":
    main()
