"""Bisect the round-2 TPU kernel fault at the 24-slot int8-KV bench config.

BENCH_r02 crashed ("TPU worker process crashed or restarted") inside the first
decode chunk of bench_socioseg (24 tiles, kv_quant=int8, Lalloc=4352,
SAM2-large + ViT resident).  Stages, each run in its OWN process
(`python scripts/bisect_int8kv.py <stage>`), smallest reproducer first:

  kernel   — paged_decode_attention quantized+stacked at the exact geometry
             (S=24, Lalloc=4352, Hkv=2, D=128, H=16), parity vs dequant+dense
  engine   — DecodeEngine text-only 3B, 24 slots, max_len=4096, kv_quant=int8
  resident — same engine with ViT + SAM2-large params resident (HBM pressure)
  bench    — the full bench_socioseg at the crashed config
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def log(msg):
    print(f"[{time.strftime('%H:%M:%S')}] {msg}", flush=True)


def mem():
    import jax
    try:
        s = jax.devices()[0].memory_stats()
        return (f"{s['bytes_in_use']/2**30:.2f} GiB in use / "
                f"{s.get('bytes_limit', 0)/2**30:.2f} limit")
    except Exception as e:  # noqa: BLE001
        return f"mem_stats unavailable: {e}"


def stage_kernel():
    import jax
    import jax.numpy as jnp
    from socioreasoner_tpu.ops.decode_attention import (
        dequantize_kv, paged_decode_attention, quantize_kv)

    S, Lalloc, Hkv, D, H, layers = 24, 4352, 2, 128, 16, 2
    rng = np.random.default_rng(0)
    k = rng.normal(size=(layers, S, Lalloc, Hkv, D)).astype(np.float32)
    v = rng.normal(size=(layers, S, Lalloc, Hkv, D)).astype(np.float32)
    kq, ks, vq, vs = [], [], [], []
    for i in range(layers):
        a, b = quantize_kv(jnp.asarray(k[i]))
        c, d = quantize_kv(jnp.asarray(v[i]))
        kq.append(a); ks.append(jnp.swapaxes(b, -1, -2))
        vq.append(c); vs.append(jnp.swapaxes(d, -1, -2))
    kq = jnp.stack(kq); ks = jnp.stack(ks)
    vq = jnp.stack(vq); vs = jnp.stack(vs)
    q = jnp.asarray(rng.normal(size=(S, H, D)), jnp.float32)
    lengths = jnp.asarray(
        np.concatenate([np.full(S // 2, 4097), np.full(S - S // 2, 403)]),
        jnp.int32)
    log(f"kernel inputs ready; {mem()}")
    for lyr in range(layers):
        out = paged_decode_attention(q, kq, vq, lengths, ks, vs,
                                     layer=jnp.int32(lyr))
        out = np.asarray(out)
        log(f"layer {lyr} kernel done; {mem()}")
        kd = dequantize_kv(kq[lyr], ks[lyr], jnp.float32)
        vd = dequantize_kv(vq[lyr], vs[lyr], jnp.float32)
        # dense reference
        mask = np.arange(Lalloc)[None] < np.asarray(lengths)[:, None]
        qf = np.asarray(q)
        kf = np.asarray(kd); vf = np.asarray(vd)
        rep = H // Hkv
        ref = np.zeros((S, H, D), np.float32)
        for s in range(S):
            for g in range(Hkv):
                qs = qf[s, g * rep:(g + 1) * rep] * D ** -0.5
                lg = qs @ kf[s, :, g].T
                lg = np.where(mask[s][None], lg, -1e30)
                p = np.exp(lg - lg.max(-1, keepdims=True))
                p /= p.sum(-1, keepdims=True)
                ref[s, g * rep:(g + 1) * rep] = p @ vf[s, :, g]
        err = np.abs(out - ref).max()
        log(f"layer {lyr} parity max err {err:.2e}")
        assert err < 2e-2, err
    log("kernel stage OK")


def _text_engine(kv_quant="int8", with_resident=False, slots=24,
                 max_len=4096, n_new=129, prompt_len=400):
    import os

    import jax
    import jax.numpy as jnp
    if "--dense" in sys.argv:
        # disable the Pallas decode/flash kernels: dense dequant fallback.
        # If the engine STILL crashes dense, the paged kernel is exonerated
        # in the full-engine context too.
        os.environ["SOCIO_DISABLE_FLASH"] = "1"
    decode_chunk = (int(sys.argv[sys.argv.index("--decode-chunk") + 1])
                    if "--decode-chunk" in sys.argv else 64)
    decode_inner = (int(sys.argv[sys.argv.index("--decode-inner") + 1])
                    if "--decode-inner" in sys.argv else 0)
    from socioreasoner_tpu.generation.engine import DecodeEngine, Request
    from socioreasoner_tpu.generation.sampling import SamplingParams
    from socioreasoner_tpu.models.qwen2_5_vl import model as qmodel
    from socioreasoner_tpu.models.qwen2_5_vl.config import Qwen25VLConfig

    config = Qwen25VLConfig()
    resident = []
    log(f"init params (with_vision={with_resident}); {mem()}")
    params = qmodel.init_params(config, jax.random.key(0), dtype=jnp.bfloat16,
                                with_vision=with_resident)
    if with_resident:
        from socioreasoner_tpu.models.sam2 import model as smodel
        from socioreasoner_tpu.models.sam2.config import Sam2Config
        resident.append(smodel.init_params(Sam2Config.large(), jax.random.key(1),
                                           dtype=jnp.bfloat16))
    log(f"params ready; {mem()}")
    engine = DecodeEngine(config, params, max_slots=slots, max_len=max_len,
                          decode_chunk=decode_chunk, decode_inner=decode_inner,
                          prefill_buckets=(512, 1024, 2048, 4096),
                          max_prefill_batch=8, kv_quant=kv_quant,
                          # --exact: lax.top_k sampling instead of
                          # approx_max_k (TPU PartialReduce) — discriminates
                          # whether PartialReduce + Mosaic kernel in one
                          # while_loop body is the engine-stage fault trigger
                          sampler_exact="--exact" in sys.argv)
    log(f"engine built (Lalloc={engine.Lalloc}); {mem()}")
    rng = np.random.default_rng(0)
    sp = SamplingParams(temperature=1.0, top_p=0.8, max_new_tokens=n_new)
    reqs = [Request(request_id=i,
                    prompt_ids=rng.integers(10, 100000, size=prompt_len).tolist(),
                    sampling=sp) for i in range(slots)]
    t0 = time.perf_counter()
    outs = engine.generate(reqs)
    dt = time.perf_counter() - t0
    toks = sum(len(o.output_ids) for o in outs)
    log(f"generate done: {toks} tokens in {dt:.1f}s ({toks/dt:.0f} tok/s); {mem()}")
    # force-materialize the caches: an async fault in the LAST graph (e.g.
    # the prefill's quantized scatter with --n-new 1) must surface here,
    # not silently at process exit
    csum = float(sum(c.astype("float32").sum()
                     for c in engine.caches.values()))
    log(f"cache checksum {csum:.3e}")
    assert len(outs) == slots
    return engine


def stage_engine():
    def argval(name, default):
        return (int(sys.argv[sys.argv.index(name) + 1])
                if name in sys.argv else default)
    # --n-new 1 → requests finish AT PREFILL (first sampled token hits the
    # budget), so the engine never runs a decode chunk: isolates the prefill
    # graph (incl. its quantized-cache scatter) from the decode graph.
    _text_engine(with_resident=False, n_new=argval("--n-new", 129),
                 prompt_len=argval("--prompt-len", 400))
    log("engine stage OK")


def stage_stepwise():
    """Localize the faulting decode-step index: decode_chunk=1, drive
    engine.step() manually, flush a marker (step #, per-slot kvlen extremes)
    BEFORE each dispatch — the crash surfaces at the following readback, so
    the last printed marker names the poisoned step. Knobs: --slots N,
    --n-new N, --prompt-len N (defaults 24/65/400)."""
    import jax.numpy as jnp

    import jax
    from socioreasoner_tpu.generation.engine import DecodeEngine, Request
    from socioreasoner_tpu.generation.sampling import SamplingParams
    from socioreasoner_tpu.models.qwen2_5_vl import model as qmodel
    from socioreasoner_tpu.models.qwen2_5_vl.config import Qwen25VLConfig

    def argval(name, default):
        return (int(sys.argv[sys.argv.index(name) + 1])
                if name in sys.argv else default)

    slots = argval("--slots", 24)
    n_new = argval("--n-new", 65)
    prompt_len = argval("--prompt-len", 400)
    config = Qwen25VLConfig()
    log(f"stepwise: init params; slots={slots} n_new={n_new} "
        f"prompt_len={prompt_len}")
    params = qmodel.init_params(config, jax.random.key(0), dtype=jnp.bfloat16,
                                with_vision=False)
    engine = DecodeEngine(config, params, max_slots=slots, max_len=4096,
                          decode_chunk=1,
                          prefill_buckets=(512,), max_prefill_batch=8,
                          kv_quant="int8")
    log(f"engine built (Lalloc={engine.Lalloc})")
    rng = np.random.default_rng(0)
    sp = SamplingParams(temperature=1.0, top_p=0.8, max_new_tokens=n_new)
    for i in range(slots):
        engine.waiting.append(Request(
            request_id=i,
            prompt_ids=rng.integers(10, 100000, size=prompt_len).tolist(),
            sampling=sp))
    k = 0
    while engine.has_work():
        log(f"step {k}: steps_executed={engine.steps_executed} "
            f"len[min,max]=({engine.lengths.min()},{engine.lengths.max()})")
        engine.step()
        k += 1
    log(f"stepwise OK: {engine.steps_executed} decode steps")


def stage_resident():
    _text_engine(with_resident=True)
    log("resident stage OK")


def stage_engine4k():
    # long prompts: fill the cache near Lalloc (the bench's real geometry —
    # 4096-token prompts + 256 new at 24 slots)
    _text_engine(with_resident=False, prompt_len=4000, n_new=257)
    log("engine4k stage OK")


def stage_prefillscatter():
    """Replicate the PREFILL's final quantized-cache scatter standalone.

    chunkloop (the decode composition) passed on-chip, so the engine-stage
    crash suspect moves to the prefill graph: its int8 + scale scatters
    (`caches[k].at[:, slots, :bucket].set(upd, mode="drop")`) execute
    asynchronously AFTER the first-token readback the host blocks on — a
    fault there surfaces at the NEXT readback, i.e. inside the first decode
    chunk, exactly the observed signature."""
    import jax
    import jax.numpy as jnp

    layers, S, Lalloc, Hkv, D = 36, 24, 4352, 2, 128
    bucket, B = 512, 2
    caches = {
        "k": jnp.zeros((layers, S, Lalloc, Hkv, D), jnp.int8),
        "v": jnp.zeros((layers, S, Lalloc, Hkv, D), jnp.int8),
        "k_scale": jnp.zeros((layers, S, Hkv, Lalloc), jnp.float32),
        "v_scale": jnp.zeros((layers, S, Hkv, Lalloc), jnp.float32),
    }
    rng = np.random.default_rng(0)

    def scatter(caches, upd_kv, upd_sc, slots):
        out = {}
        for name in ("k", "v"):
            out[name] = caches[name].at[:, slots, :bucket].set(
                upd_kv.astype(jnp.int8), mode="drop")
        for name in ("k_scale", "v_scale"):
            out[name] = caches[name].at[:, slots, :, :bucket].set(
                upd_sc, mode="drop")
        return out

    fn = jax.jit(scatter, donate_argnums=(0,))
    for it in range(12):
        upd_kv = jnp.asarray(
            rng.integers(-127, 127, size=(layers, B, bucket, Hkv, D)), jnp.int8)
        upd_sc = jnp.asarray(
            rng.normal(size=(layers, B, Hkv, bucket)).astype(np.float32))
        slots = jnp.asarray([it % S, (it + 7) % S], jnp.int32)
        caches = fn(caches, upd_kv, upd_sc, slots)
        s = float(caches["k_scale"].sum())      # force readback each iter
        log(f"iter {it} scatter ok (scale sum {s:.2f}); {mem()}")
    log("prefillscatter stage OK")


def stage_scatterthenchunk():
    """Prefill-scatter executable THEN decode-chunk executable on the SAME
    donated buffers in one process — the cross-executable buffer hand-off
    the engine does (every standalone piece passes; the real engine's
    prefill→decode sequence is the remaining untested composition besides
    the full transformer body)."""
    import functools

    import jax
    import jax.numpy as jnp
    from socioreasoner_tpu.ops.decode_attention import quantize_kv
    from socioreasoner_tpu.ops.decode_attention import (
        paged_decode_attention as _pda)
    from socioreasoner_tpu.ops.flags import on_tpu
    paged = functools.partial(_pda, interpret=not on_tpu())

    layers, S, Lalloc, Hkv, D, H = 36, 24, 4352, 2, 128, 16
    bucket, B = 512, 8
    rng = np.random.default_rng(0)
    caches = {
        "k": jnp.zeros((layers, S, Lalloc, Hkv, D), jnp.int8),
        "v": jnp.zeros((layers, S, Lalloc, Hkv, D), jnp.int8),
        "k_scale": jnp.zeros((layers, S, Hkv, Lalloc), jnp.float32),
        "v_scale": jnp.zeros((layers, S, Hkv, Lalloc), jnp.float32),
    }

    def scatter(caches, upd_kv, upd_sc, slots):
        out = {}
        for name in ("k", "v"):
            out[name] = caches[name].at[:, slots, :bucket].set(
                upd_kv.astype(jnp.int8), mode="drop")
        for name in ("k_scale", "v_scale"):
            out[name] = caches[name].at[:, slots, :, :bucket].set(
                upd_sc, mode="drop")
        return out

    scatter_j = jax.jit(scatter, donate_argnums=(0,))
    # three batch-8 prefill scatters (the engine's 24-slot admission)
    for g in range(3):
        upd_kv = jnp.asarray(rng.integers(-127, 127,
                                          size=(layers, B, bucket, Hkv, D)),
                             jnp.int8)
        upd_sc = jnp.asarray(rng.normal(size=(layers, B, Hkv, bucket))
                             .astype(np.float32))
        slots = jnp.asarray(np.arange(g * B, (g + 1) * B), jnp.int32)
        caches = scatter_j(caches, upd_kv, upd_sc, slots)
    log(f"scatters done; {mem()}")

    # then the decode chunk on the SAME buffers
    lengths = jnp.full((S,), bucket - 8, jnp.int32)
    q0 = jnp.asarray(rng.normal(size=(S, H, D)), jnp.bfloat16)
    bidx = jnp.arange(S)[:, None]

    def chunk(caches, lengths, q):
        def cond(c):
            return c[0] < 64

        def body(c):
            i, caches, lengths, acc = c
            cache_positions = lengths[:, None]
            k_all, v_all = caches["k"], caches["v"]
            ks_all, vs_all = caches["k_scale"], caches["v_scale"]
            for lyr in range(36):
                kv_new = (q[:, :Hkv] * (1.0 + acc))[:, None]
                kq, ksc = quantize_kv(kv_new)
                vq, vsc = quantize_kv(kv_new + 1.0)
                k_all = k_all.at[lyr, bidx, cache_positions].set(kq)
                v_all = v_all.at[lyr, bidx, cache_positions].set(vq)
                ks_all = ks_all.at[lyr, bidx, :, cache_positions].set(ksc)
                vs_all = vs_all.at[lyr, bidx, :, cache_positions].set(vsc)
                out = paged(q, k_all, v_all, lengths + 1, ks_all, vs_all,
                            layer=lyr)
                acc = acc + out.astype(jnp.float32).mean()
            return (i + 1, dict(caches, k=k_all, v=v_all, k_scale=ks_all,
                                v_scale=vs_all), lengths + 1, acc)

        _, caches, lengths, acc = jax.lax.while_loop(
            cond, body, (jnp.int32(0), caches, lengths, jnp.float32(0.0)))
        return caches, lengths, acc

    chunk_j = jax.jit(chunk, donate_argnums=(0,))
    caches, lengths, acc = chunk_j(caches, lengths, q0)
    log(f"chunk done acc={float(acc):.4f}; {mem()}")
    log("scatterthenchunk stage OK")


def stage_chunkloop():
    """Replicate the decode-CHUNK composition standalone: stacked int8 caches
    + lax.while_loop of N steps, each step quantize-scatter-writing one token
    per layer then reading via the paged kernel — the exact cache/kernel
    interaction of _decoder_cached_unrolled under _decode_loop, minus the
    transformer math. Flags bisect the trigger:

      --layers N    (36)   --steps N (64)   --slots N (24)  --maxlen N (4096)
      --no-write    skip the in-place quantize+scatter (read-only kernel loop)
      --no-kernel   skip the paged kernel (scatter-writes only)
      --no-donate   don't donate the cache buffers
      --no-loop     run the body once, no while_loop
      --sample      add an approx_max_k (TPU PartialReduce) + categorical
                    sample per step like the real decode loop
      --mlp         add a (S, H)x(H, 4H)x(4H, H) matmul pair per layer
                    (VMEM-pressure stand-in for the transformer MLP)
      --embed       gather the next q from a (V, hidden) embedding table with
                    the PREVIOUS iteration's sampled token (the real loop's
                    data-dependent last_token feedback)
      --head        real (S, hidden) @ (hidden, V) lm-head matmul for the
                    sample logits instead of broadcast_to
      --valid       recompute a (S, Lalloc) kv_valid mask per iteration like
                    the real loop body
    """
    import functools

    import jax
    import jax.numpy as jnp
    from socioreasoner_tpu.ops.decode_attention import quantize_kv
    from socioreasoner_tpu.ops.decode_attention import (
        paged_decode_attention as _pda)
    from socioreasoner_tpu.ops.flags import on_tpu
    paged_decode_attention = functools.partial(_pda, interpret=not on_tpu())

    args = set(sys.argv[2:])

    def argval(name, default):
        return (int(sys.argv[sys.argv.index(name) + 1])
                if name in sys.argv else default)

    layers = argval("--layers", 36)
    steps = argval("--steps", 64)
    S = argval("--slots", 24)
    max_len = argval("--maxlen", 4096)
    Lalloc = -(-(max_len + 64) // 256) * 256
    Hkv, D, H = 2, 128, 16
    write = "--no-write" not in args
    kernel = "--no-kernel" not in args
    donate = "--no-donate" not in args
    loop = "--no-loop" not in args
    sample = "--sample" in args
    mlp = "--mlp" in args
    embed = "--embed" in args
    head = "--head" in args
    valid = "--valid" in args
    if embed or head:
        sample = True                      # both need the sampled token/logits
    log(f"chunkloop layers={layers} steps={steps} S={S} Lalloc={Lalloc} "
        f"write={write} kernel={kernel} donate={donate} loop={loop} "
        f"sample={sample} mlp={mlp} embed={embed} head={head} valid={valid}")
    hidden, V = 2048, 151936
    mlp_w = (jnp.asarray(np.random.default_rng(1).normal(
                 size=(hidden, 4 * hidden)) * 0.01, jnp.bfloat16),
             jnp.asarray(np.random.default_rng(2).normal(
                 size=(4 * hidden, hidden)) * 0.01, jnp.bfloat16)) if mlp else None
    embed_w = (jnp.asarray(np.random.default_rng(3).normal(
                   size=(V, hidden)) * 0.01, jnp.bfloat16)
               if (embed or head) else None)

    caches = {
        "k": jnp.zeros((layers, S, Lalloc, Hkv, D), jnp.int8),
        "v": jnp.zeros((layers, S, Lalloc, Hkv, D), jnp.int8),
        "k_scale": jnp.zeros((layers, S, Hkv, Lalloc), jnp.float32),
        "v_scale": jnp.zeros((layers, S, Hkv, Lalloc), jnp.float32),
    }
    lengths0 = jnp.full((S,), 400, jnp.int32)
    q0 = jnp.asarray(np.random.default_rng(0).normal(size=(S, H, D)),
                     jnp.bfloat16)
    bidx = jnp.arange(S)[:, None]

    def body_once(caches, lengths, q, acc, tok):
        cache_positions = lengths[:, None]
        k_all, v_all = caches["k"], caches["v"]
        ks_all, vs_all = caches["k_scale"], caches["v_scale"]
        if embed:
            # the real loop's data-dependent feedback: iteration i's q comes
            # from an embedding-table gather of iteration i-1's sampled token
            q = embed_w[tok].reshape(S, H, D).astype(jnp.bfloat16)
        if valid:
            kv_valid = (jnp.arange(Lalloc)[None, :]
                        < (lengths + 1)[:, None]).astype(jnp.int32)
            acc = acc + kv_valid.sum().astype(jnp.float32) * 1e-9
        for i in range(layers):
            kv_new = (q[:, :Hkv] * (1.0 + acc))[:, None]     # (S, 1, Hkv, D)
            if write:
                kq, ksc = quantize_kv(kv_new)
                vq, vsc = quantize_kv(kv_new + 1.0)
                k_all = k_all.at[i, bidx, cache_positions].set(kq)
                v_all = v_all.at[i, bidx, cache_positions].set(vq)
                ks_all = ks_all.at[i, bidx, :, cache_positions].set(ksc)
                vs_all = vs_all.at[i, bidx, :, cache_positions].set(vsc)
            if kernel:
                out = paged_decode_attention(q, k_all, v_all, lengths + 1,
                                             ks_all, vs_all, layer=i)
                acc = acc + out.astype(jnp.float32).mean()
            if mlp:
                h = jnp.broadcast_to(acc, (S, hidden)).astype(jnp.bfloat16)
                h = jax.nn.silu(h @ mlp_w[0]) @ mlp_w[1]
                acc = acc + h.astype(jnp.float32).mean()
        if sample:
            # the real decode loop ends each step with approx_max_k (TPU
            # PartialReduce) over (S, V) + a categorical draw
            if head:
                h = jnp.broadcast_to(acc, (S, hidden)).astype(jnp.bfloat16)
                logits = (h @ embed_w.T).astype(jnp.float32)
            else:
                logits = jnp.broadcast_to(acc, (S, V)).astype(jnp.float32)
            logits = logits + jax.lax.broadcasted_iota(
                jnp.float32, (S, V), 1) * 1e-6
            vals, idx = jax.lax.approx_max_k(logits, 256, recall_target=0.95)
            key = jax.random.fold_in(jax.random.key(0),
                                     lengths[0].astype(jnp.uint32))
            choice = jax.random.categorical(key, vals, axis=-1)
            tok = jnp.take_along_axis(idx, choice[:, None], axis=-1)[:, 0]
            acc = acc + tok.astype(jnp.float32).mean() * 1e-9
        return (dict(caches, k=k_all, v=v_all, k_scale=ks_all, v_scale=vs_all),
                lengths + 1, acc, tok)

    tok0 = jnp.zeros((S,), jnp.int32)

    def chunk(caches, lengths, q):
        if not loop:
            caches, lengths, acc, _ = body_once(caches, lengths, q,
                                                jnp.float32(0.0), tok0)
            return caches, lengths, acc

        def cond(c):
            return c[0] < steps

        def wbody(c):
            i, caches, lengths, acc, tok = c
            caches, lengths, acc, tok = body_once(caches, lengths, q, acc, tok)
            return (i + 1, caches, lengths, acc, tok)

        _, caches, lengths, acc, _ = jax.lax.while_loop(
            cond, wbody, (jnp.int32(0), caches, lengths, jnp.float32(0.0),
                          tok0))
        return caches, lengths, acc

    fn = jax.jit(chunk, donate_argnums=(0,) if donate else ())
    t0 = time.perf_counter()
    caches, lengths, acc = fn(caches, lengths0, q0)
    val = float(acc)                       # blocks
    log(f"chunkloop OK: acc={val:.4f} in {time.perf_counter() - t0:.1f}s "
        f"(incl. compile); {mem()}")


def stage_bench():
    import os
    os.environ["SOCIO_BENCH_TILES"] = "24"
    os.environ["SOCIO_BENCH_KV_QUANT"] = "int8"
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import bench
    tiles_per_s, detail = bench.bench_socioseg()
    log(f"bench stage OK: {tiles_per_s:.3f} tiles/s {detail}")


if __name__ == "__main__":
    stage = sys.argv[1]
    log(f"stage {stage} starting")
    dict(kernel=stage_kernel, engine=stage_engine, engine4k=stage_engine4k,
         resident=stage_resident, bench=stage_bench,
         chunkloop=stage_chunkloop,
         prefillscatter=stage_prefillscatter,
         scatterthenchunk=stage_scatterthenchunk,
         stepwise=stage_stepwise)[stage]()
