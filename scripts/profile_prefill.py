"""Decompose the engine prefill call: fixed per-call overhead vs FLOP slope.

The r4 waves show ~0.67 s per batch-2 prefill call REGARDLESS of prompt
bucket (2048 vs 3072 vs 4096) and weight dtype (bf16 vs single-copy int8) —
flat cost means something fixed dominates (relay dispatch RTT, readback
sync, cache-scatter, image-table handling), not the matmul FLOPs.

Times engine._prefill_group directly at each prompt bucket with VLM-shaped
requests (1458 device-resident image-embed rows per request, the SocioSeg
768px geometry), releasing slots between calls. Run:

    python scripts/profile_prefill.py [--weight-quant int8] [--iters 8]

Prints per-bucket mean seconds + the linear fit intercept (fixed cost) and
slope (s per 1k prompt tokens).
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def log(msg):
    print(f"[{time.strftime('%H:%M:%S')}] {msg}", flush=True)


def main():
    import jax
    import jax.numpy as jnp
    from socioreasoner_tpu.generation.engine import DecodeEngine, Request
    from socioreasoner_tpu.generation.sampling import SamplingParams
    from socioreasoner_tpu.models.qwen2_5_vl import model as qmodel
    from socioreasoner_tpu.models.qwen2_5_vl.config import Qwen25VLConfig

    wq = (sys.argv[sys.argv.index("--weight-quant") + 1]
          if "--weight-quant" in sys.argv else None)
    iters = (int(sys.argv[sys.argv.index("--iters") + 1])
             if "--iters" in sys.argv else 8)
    config = Qwen25VLConfig()
    params = qmodel.init_params(config, jax.random.key(0), dtype=jnp.bfloat16,
                                with_vision=False)
    if wq:
        from socioreasoner_tpu.ops.quant import quantize_decode_params
        quantize_decode_params(params, mode=wq, inplace=True)
    log(f"params ready (weight_quant={wq})")

    buckets = (2048, 3072, 4096)
    # prefix_fork OFF: identical prompts would fork from the registry instead
    # of prefilling (the first run of this script measured 1 ms "prefills")
    engine = DecodeEngine(config, params, max_slots=24, max_len=4096,
                          decode_chunk=64, prefill_buckets=buckets,
                          image_buckets=(0, 4096), prefill_batch_sizes=(2,),
                          weight_quant=wq, prefix_fork=False,
                          act_quant="int8" if "--act-quant" in sys.argv
                          else None)
    rng = np.random.default_rng(0)
    n_img = 1458
    embeds = jnp.asarray(rng.normal(size=(n_img, config.text.hidden_size)),
                         jnp.bfloat16)
    embeds.block_until_ready()

    def make_reqs(plen, tag, it=0):
        # image tokens must exist in the prompt for the scatter; use the
        # image_token_id at the front like a real SocioSeg prompt. The text
        # tail varies per (tag, it, i) so no two prompts are ever identical.
        ids = np.full(plen, 42, np.int64)
        ids[:n_img] = config.image_token_id
        reqs = []
        for i in range(2):
            u = ids.copy()
            u[-1] = 100 + 31 * it + i        # uniquify
            reqs.append(Request(request_id=(tag, it, i),
                                prompt_ids=u.tolist(), image_embeds=embeds,
                                sampling=SamplingParams(max_new_tokens=4)))
        return reqs

    # image-table ablation: same buckets, no images (img_bucket 0) — isolates
    # the fixed cost of the 4096-row image table + scatter from the text path
    def make_text_reqs(plen, tag, it=0):
        reqs = []
        for i in range(2):
            ids = np.full(plen, 42, np.int64)
            ids[-1] = 500 + 31 * it + i
            reqs.append(Request(request_id=("t", tag, it, i),
                                prompt_ids=ids.tolist(),
                                sampling=SamplingParams(max_new_tokens=4)))
        return reqs

    for b in (2048, 4096):
        engine._admit_group(make_text_reqs(b - 32, f"w{b}"), [])
        for s in list(engine.slot_req):
            engine._release(s)
        ts = []
        for it in range(iters):
            t0 = time.perf_counter()
            engine._admit_group(make_text_reqs(b - 32, b, it), [])
            ts.append(time.perf_counter() - t0)
            for s in list(engine.slot_req):
                engine._release(s)
        log(f"bucket {b} NO-IMAGE: {np.mean(ts)*1e3:.0f} ± "
            f"{np.std(ts)*1e3:.0f} ms")

    results = {}
    for b in buckets:
        plen = b - 32
        # warm the compile
        outs = []
        engine._admit_group(make_reqs(plen, f"w{b}"), outs)
        for s in list(engine.slot_req):
            engine._release(s)
        ts = []
        for it in range(iters):
            outs = []
            t0 = time.perf_counter()
            engine._admit_group(make_reqs(plen, b, it), outs)
            ts.append(time.perf_counter() - t0)
            for s in list(engine.slot_req):
                engine._release(s)
        results[b] = (float(np.mean(ts)), float(np.std(ts)))
        log(f"bucket {b}: {np.mean(ts)*1e3:.0f} ± {np.std(ts)*1e3:.0f} ms "
            f"(dev {engine.prefill_device_time:.2f}s cumulative)")

    xs = np.array(buckets, np.float64)
    ys = np.array([results[b][0] for b in buckets])
    slope, intercept = np.polyfit(xs, ys, 1)
    log(f"RESULT: fixed per-call cost ≈ {intercept*1e3:.0f} ms, "
        f"slope ≈ {slope*1e6:.1f} ms per 1k prompt tokens (batch 2)")
    flops_per_tok = 2 * 3.1e9 * 2            # batch 2
    log(f"implied prefill MFU at 4096 bucket: "
        f"{flops_per_tok * 4096 / results[4096][0] / 197e12:.2f}")


if __name__ == "__main__":
    main()
