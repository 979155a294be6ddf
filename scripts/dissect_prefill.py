"""Dissect the engine-prefill executable: which graph stage carries the cost?

bench_prefill's bare forward runs at 0.74 MFU (B=1 L=1024 text-only,
no-cache), yet an engine prefill call at (2, 2048) + 4096-row image table
costs ~0.65 s where 0.74-MFU FLOPs predict ~0.17 s. Builds the graph up in
stages, jits each, times warm calls at the production geometry:

  fwd        forward, logits=False, no cache, no image
  fwd_img    + 4096-row image table scatter
  fwd_cache  + local KV cache threading (the (36,B,bucket,2,128) writes)
  fwd_scatter+ the big-cache slot scatter (donated (36,24,4352,...) bufs)
  full       + last-token gather, head_logits, sample_tokens == _prefill

Run on the chip: python scripts/dissect_prefill.py [--weight-quant int8]
"""

import sys
import time

import numpy as np

sys.path.insert(0, ".")


def log(msg):
    print(f"[{time.strftime('%H:%M:%S')}] {msg}", flush=True)


def main():
    import jax
    import jax.numpy as jnp
    from socioreasoner_tpu.generation.sampling import SamplingParams, sample_tokens
    from socioreasoner_tpu.models.qwen2_5_vl import model as qmodel
    from socioreasoner_tpu.models.qwen2_5_vl.config import Qwen25VLConfig
    from socioreasoner_tpu.ops.flags import use_flash_attention
    from socioreasoner_tpu.ops.quant import head_logits

    wq = (sys.argv[sys.argv.index("--weight-quant") + 1]
          if "--weight-quant" in sys.argv else None)
    cfg = Qwen25VLConfig()
    params = qmodel.init_params(cfg, jax.random.key(0), dtype=jnp.bfloat16,
                                with_vision=False)
    if wq:
        from socioreasoner_tpu.ops.quant import quantize_decode_params
        quantize_decode_params(params, mode=wq, inplace=True)
    log(f"params ready (weight_quant={wq})")

    B, bucket, img_bucket = 2, 2048, 4096
    S, Lalloc = 24, 4352
    Lyr = cfg.text.num_hidden_layers
    Hkv, D = cfg.text.num_key_value_heads, cfg.text.head_dim
    n_img = 1458
    rng = np.random.default_rng(0)

    ids = np.full((B, bucket), 42, np.int32)
    ids[:, :n_img] = cfg.image_token_id
    ids = jnp.asarray(ids)
    pos = jnp.asarray(np.broadcast_to(
        np.clip(np.arange(bucket), 0, bucket - 1)[None, None],
        (B, 3, bucket)).copy(), jnp.int64)
    attn = jnp.ones((B, bucket), jnp.int32)
    img = jnp.asarray(rng.normal(size=(img_bucket, cfg.text.hidden_size)),
                      jnp.bfloat16)
    slots = jnp.asarray([0, 1], jnp.int32)
    Ps = jnp.asarray([bucket - 8, bucket - 8], jnp.int32)
    temps = jnp.ones(B, jnp.float32)
    top_ps = jnp.full(B, 0.8, jnp.float32)
    top_ks = jnp.zeros(B, jnp.int32)
    key = jax.random.key(7)
    flops = 2 * 3.1e9 * B * bucket

    def local_cache():
        return {
            "k": jnp.zeros((Lyr, B, bucket, Hkv, D), jnp.bfloat16),
            "v": jnp.zeros((Lyr, B, bucket, Hkv, D), jnp.bfloat16),
            "kv_valid": attn,
        }

    def fwd(params, ids, pos, attn):
        h, _ = qmodel.forward(cfg, params, ids, pos, attn, logits=False,
                              use_flash=use_flash_attention())
        return h.astype(jnp.float32).mean()

    def fwd_img(params, ids, pos, attn, img):
        h, _ = qmodel.forward(cfg, params, ids, pos, attn, image_embeds=img,
                              logits=False, use_flash=use_flash_attention())
        return h.astype(jnp.float32).mean()

    def fwd_cache(params, ids, pos, attn, img):
        cp = jnp.broadcast_to(jnp.arange(bucket)[None], (B, bucket))
        h, nc = qmodel.forward(cfg, params, ids, pos, None, image_embeds=img,
                               cache=local_cache(), cache_positions=cp,
                               logits=False, use_flash=use_flash_attention())
        return h.astype(jnp.float32).mean() + nc["k"].astype(jnp.float32).mean()

    def fwd_scatter(params, caches, ids, pos, attn, img, slots):
        cp = jnp.broadcast_to(jnp.arange(bucket)[None], (B, bucket))
        h, nc = qmodel.forward(cfg, params, ids, pos, None, image_embeds=img,
                               cache=local_cache(), cache_positions=cp,
                               logits=False, use_flash=use_flash_attention())
        out = {}
        for name in caches:
            if name in ("k", "v"):
                out[name] = caches[name].at[:, slots, :bucket].set(
                    nc[name].astype(caches[name].dtype), mode="drop")
        return out, h.astype(jnp.float32).mean()

    def full(params, caches, ids, pos, attn, img, slots, Ps, key, temps,
             top_ps, top_ks):
        cp = jnp.broadcast_to(jnp.arange(bucket)[None], (B, bucket))
        h, nc = qmodel.forward(cfg, params, ids, pos, None, image_embeds=img,
                               cache=local_cache(), cache_positions=cp,
                               logits=False, use_flash=use_flash_attention())
        last = jnp.take_along_axis(
            h, (Ps - 1)[:, None, None].astype(jnp.int32), axis=1)[:, 0]
        tok = sample_tokens(head_logits(params, last), key, temps, top_ps,
                            top_ks)
        out = {}
        for name in caches:
            if name in ("k", "v"):
                out[name] = caches[name].at[:, slots, :bucket].set(
                    nc[name].astype(caches[name].dtype), mode="drop")
        return out, tok

    def timeit(label, mk_args, f, n=6, donate=None):
        fj = jax.jit(f, donate_argnums=donate or ())
        out = fj(*mk_args())
        jax.tree.leaves(out)[-1].block_until_ready()      # compile
        ts = []
        for _ in range(n):
            args = mk_args()
            t0 = time.perf_counter()
            out = fj(*args)
            jax.block_until_ready(out)
            ts.append(time.perf_counter() - t0)
        m = float(np.mean(ts))
        log(f"{label}: {m*1e3:.0f} ± {np.std(ts)*1e3:.0f} ms  "
            f"(MFU {flops / m / 197e12:.2f})")
        return m

    timeit("fwd (no cache/img)", lambda: (params, ids, pos, attn), fwd)
    timeit("fwd_img", lambda: (params, ids, pos, attn, img), fwd_img)
    timeit("fwd_cache", lambda: (params, ids, pos, attn, img), fwd_cache)

    def mk_caches():
        return {
            "k": jnp.zeros((Lyr, S, Lalloc, Hkv, D), jnp.bfloat16),
            "v": jnp.zeros((Lyr, S, Lalloc, Hkv, D), jnp.bfloat16),
        }

    # donated big caches must be re-made per call
    caches_holder = [mk_caches()]

    def mk_args_scatter():
        c = caches_holder[0]
        caches_holder[0] = None
        return (params, c, ids, pos, attn, img, slots)

    fj = jax.jit(fwd_scatter, donate_argnums=(1,))
    out, _ = fj(*(params, mk_caches(), ids, pos, attn, img, slots))
    jax.block_until_ready(out["k"])
    ts = []
    for _ in range(6):
        t0 = time.perf_counter()
        out, m = fj(params, out, ids, pos, attn, img, slots)
        jax.block_until_ready(m)
        ts.append(time.perf_counter() - t0)
    log(f"fwd_scatter (donated): {np.mean(ts)*1e3:.0f} ± "
        f"{np.std(ts)*1e3:.0f} ms  (MFU {flops/np.mean(ts)/197e12:.2f})")

    fj2 = jax.jit(full, donate_argnums=(1,))
    out, tok = fj2(params, mk_caches(), ids, pos, attn, img, slots, Ps, key,
                   temps, top_ps, top_ks)
    np.asarray(tok)
    ts = []
    for i in range(6):
        key2 = jax.random.key(i)
        t0 = time.perf_counter()
        out, tok = fj2(params, out, ids, pos, attn, img, slots, Ps, key2,
                       temps, top_ps, top_ks)
        np.asarray(tok)                      # the engine's blocking readback
        ts.append(time.perf_counter() - t0)
    log(f"full (=_prefill, tok readback): {np.mean(ts)*1e3:.0f} ± "
        f"{np.std(ts)*1e3:.0f} ms  (MFU {flops/np.mean(ts)/197e12:.2f})")


if __name__ == "__main__":
    main()
