"""Marginal ablations inside the REAL engine decode loop.

Standalone component micro-timings are unreliable in this environment (axon
relay + 1 CPU core — see memory/single-cpu-core.md). Instead: run the real
bench_decode harness (24 slots, 128 new tokens, decode_chunk 64) with ONE
component neutralized per run, and read the marginal cost off the tok/s delta.

Usage: python scripts/ablate_decode.py <variant>
  base       unmodified engine
  argmax     sampler -> pure argmax (isolates lax.top_k(256) over V)
  approx     sampler top_k -> lax.approx_max_k
  nohead     skip lm_head + sampler (token = constant; isolates head+sampler)
  noattn     paged_decode_attention -> q passthrough (isolates the kernel)
  chunk128   decode_chunk 128 (isolates per-chunk host overhead)
"""

import sys
import time

import numpy as np

sys.path.insert(0, ".")


def main():
    variant = sys.argv[1] if len(sys.argv) > 1 else "base"
    import jax
    import jax.numpy as jnp

    import socioreasoner_tpu.generation.engine as eng_mod
    import socioreasoner_tpu.ops.decode_attention as da
    from socioreasoner_tpu.models.qwen2_5_vl.config import Qwen25VLConfig
    from socioreasoner_tpu.models.qwen2_5_vl import model as qmodel
    from socioreasoner_tpu.generation.engine import DecodeEngine, Request
    from socioreasoner_tpu.generation.sampling import SamplingParams

    if variant == "argmax":
        def fake_sample(logits, key, temperature, top_p, top_k):
            return jnp.argmax(logits, axis=-1).astype(jnp.int32)
        eng_mod.sample_tokens = fake_sample
    elif variant == "approx":
        # sample_tokens clone with lax.top_k -> lax.approx_max_k
        def approx_sample(logits, key, temperature, top_p, top_k):
            B, V = logits.shape
            logits = logits.astype(jnp.float32)
            greedy = jnp.argmax(logits, axis=-1)
            scaled = logits / jnp.maximum(temperature, 1e-5)[:, None]
            K = min(256, V)
            vals, idx = jax.lax.approx_max_k(scaled, K, recall_target=0.95)
            pos = jnp.arange(K)[None, :]
            topk_mask = jnp.where(top_k[:, None] > 0,
                                  pos < jnp.minimum(top_k, K)[:, None], True)
            lse = jax.scipy.special.logsumexp(scaled, axis=-1, keepdims=True)
            probs = jnp.exp(vals - lse)
            cum = jnp.cumsum(probs, axis=-1)
            topp_mask = (cum - probs) < top_p[:, None]
            masked = jnp.where(topk_mask & topp_mask, vals, -jnp.inf)
            choice = jax.random.categorical(key, masked, axis=-1)
            sampled = jnp.take_along_axis(idx, choice[:, None], axis=-1)[:, 0]
            return jnp.where(temperature <= 0, greedy,
                             sampled).astype(jnp.int32)
        eng_mod.sample_tokens = approx_sample
    elif variant == "nohead":
        orig_fwd = qmodel.forward

        def fwd_nohead(config, params, ids, pos, mask, **kw):
            kw["logits"] = False
            # hidden (B, L, H) stands in for logits; patched sampler consumes it
            return orig_fwd(config, params, ids, pos, mask, **kw)
        eng_mod.qmodel.forward = fwd_nohead

        def fake_sample(logits, key, temperature, top_p, top_k):
            return jnp.argmax(logits.astype(jnp.float32), -1).astype(jnp.int32)
        eng_mod.sample_tokens = fake_sample
    elif variant == "noattn":
        def fake_paged(q, k, v, lengths, *a, **kw):
            return q * (lengths[:, None, None] > 0)
        da.paged_decode_attention = fake_paged
        import socioreasoner_tpu.models.qwen2_5_vl.text  # noqa: F401 (late import target)
    elif variant not in ("base", "chunk128", "int8", "int4"):
        raise SystemExit(f"unknown variant {variant}")

    config = Qwen25VLConfig()
    params = qmodel.init_params(config, jax.random.key(0), dtype=jnp.bfloat16,
                                with_vision=False)
    rng = np.random.default_rng(0)
    chunk = 128 if variant == "chunk128" else 64
    engine = DecodeEngine(config, params, max_slots=24, max_len=1536,
                          decode_chunk=chunk, prefill_buckets=(512,),
                          weight_quant=variant if variant in ("int8", "int4")
                          else None)
    sp = SamplingParams(temperature=1.0, top_p=0.9, top_k=50,
                        max_new_tokens=257)
    reqs = [Request(request_id=i,
                    prompt_ids=rng.integers(10, 100000, size=400).tolist(),
                    sampling=sp) for i in range(24)]
    # warmup: compile prefill + decode chunk
    engine.generate([Request(request_id="warm", prompt_ids=reqs[0].prompt_ids,
                             sampling=SamplingParams(max_new_tokens=chunk + 1))])
    for r in reqs:
        engine.waiting.append(r)
    t0 = time.perf_counter()
    outs = engine.step()            # 24 prefills + first decode chunk
    t1 = time.perf_counter()
    for o in outs:
        if o.finish_reason == "error":
            print(f"ERROR req {o.request_id}: {(o.meta or {}).get('error')}",
                  flush=True)
    nsteps = 0
    while engine.has_work():
        outs += engine.step()       # pure decode chunks
        nsteps += chunk
    dt = time.perf_counter() - t1
    toks = sum(len(o.output_ids) for o in outs)
    print(f"{variant}: prefill+1st chunk {t1-t0:.2f}s; decode-only "
          f"{nsteps} steps in {dt:.2f}s = {dt/nsteps*1000:.2f} ms/step = "
          f"{24*nsteps/dt:.0f} tok/s; total {toks} toks", flush=True)

    # second round: prefill timing with compiles warm
    reqs2 = [Request(request_id=100 + i, prompt_ids=r.prompt_ids,
                     sampling=sp) for i, r in enumerate(reqs)]
    for r in reqs2:
        engine.waiting.append(r)
    t2 = time.perf_counter()
    outs2 = engine.step()
    t3 = time.perf_counter()
    while engine.has_work():
        outs2 += engine.step()
    t4 = time.perf_counter()
    print(f"{variant} warm: prefill(24)+1st chunk {t3-t2:.2f}s; "
          f"e2e {24*257/(t4-t2):.0f} tok/s incl prefill", flush=True)


if __name__ == "__main__":
    main()
