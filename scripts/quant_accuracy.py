"""Quantized-serving accuracy bounds at full 3B dims (VERDICT r4 item 3).

Fixed seeded eval comparing the serving stacks the bench promotes:
    bf16 → int8w (single-copy) → +w8a8 prefill → int4w
on (a) prefill last-position logits (max/mean rel err, top-1 agreement) and
(b) GREEDY decode token agreement over 64 steps on 8 fixed prompts.

Why token agreement is the giou bound here: the SocioSeg pipeline's masks are
a pure function of the decoded TEXT (parse → SAM prompts). At temperature 0,
if a quantized stack reproduces the bf16 token stream exactly, giou is
EXACTLY unchanged; the divergence fraction bounds how often giou can move at
all. (Absolute giou deltas on the real checkpoint require the weights —
no egress in this harness; run this same script pointing `--hf <dir>` at a
downloaded checkpoint to get the production numbers. Random weights bound
the MECHANISM: they are a hard case for per-channel scales because their
channel distributions are flat.)

Usage:  python scripts/quant_accuracy.py            (TPU, ~10 min with compiles)
        python scripts/quant_accuracy.py --tiny     (CPU plumbing check)
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def log(msg):
    print(f"[{time.strftime('%H:%M:%S')}] {msg}", flush=True)


def greedy_tokens(config, params, prompts, n_new, engine_kwargs):
    from socioreasoner_tpu.generation.engine import DecodeEngine, Request
    from socioreasoner_tpu.generation.sampling import SamplingParams
    engine = DecodeEngine(config, params, max_slots=len(prompts),
                          max_len=prompts.shape[1] + n_new + 64,
                          decode_chunk=16,
                          prefill_buckets=(prompts.shape[1],),
                          **engine_kwargs)
    sp = SamplingParams(temperature=0.0, max_new_tokens=n_new)
    outs = engine.generate([
        Request(request_id=i, prompt_ids=list(map(int, p)), sampling=sp)
        for i, p in enumerate(prompts)])
    outs.sort(key=lambda o: o.request_id)
    toks = np.full((len(prompts), n_new), -1, np.int64)
    for i, o in enumerate(outs):
        toks[i, :len(o.output_ids)] = o.output_ids
    del engine
    return toks


def last_logits(config, params, prompts, act_quant=False):
    """Last-position logits through the CACHED forward — the path the engine
    prefill actually runs (text.py matmul_q applies the weight scales there;
    the uncached path's plain `x @ q_w` would multiply int8 codes without
    scales and return garbage for a quantized tree)."""
    import jax
    import jax.numpy as jnp
    from socioreasoner_tpu.models.qwen2_5_vl import model as qmodel
    from socioreasoner_tpu.models.qwen2_5_vl import rope as qrope
    from socioreasoner_tpu.ops.flags import use_flash_attention
    from socioreasoner_tpu.ops.quant import head_logits
    attn = np.ones_like(prompts, np.int32)
    pos, _ = qrope.get_rope_index(config, prompts, None, attn)
    B, P = prompts.shape
    Lyr = config.text.num_hidden_layers
    Hkv, D = config.text.num_key_value_heads, config.text.head_dim

    @jax.jit
    def f(params, ids, pos, attn):
        cache = {
            "k": jnp.zeros((Lyr, B, P, Hkv, D), jnp.bfloat16),
            "v": jnp.zeros((Lyr, B, P, Hkv, D), jnp.bfloat16),
            "kv_valid": attn,
        }
        cache_positions = jnp.broadcast_to(jnp.arange(P)[None], (B, P))
        hidden, _ = qmodel.forward(config, params, ids, pos, None,
                                   cache=cache,
                                   cache_positions=cache_positions,
                                   use_flash=use_flash_attention(),
                                   logits=False, act_quant=act_quant)
        return head_logits(params, hidden[:, -1]).astype(jnp.float32)

    return np.asarray(f(params, jnp.asarray(prompts), jnp.asarray(pos),
                        jnp.asarray(attn)))


def main():
    tiny = "--tiny" in sys.argv
    import gc

    import jax
    import jax.numpy as jnp
    from socioreasoner_tpu.models.qwen2_5_vl import model as qmodel
    from socioreasoner_tpu.models.qwen2_5_vl.config import Qwen25VLConfig
    from socioreasoner_tpu.ops.quant import quantize_decode_params

    config = Qwen25VLConfig.tiny(512) if tiny else Qwen25VLConfig()
    rng = np.random.default_rng(0)
    B, P, n_new = (4, 64, 8) if tiny else (8, 1024, 64)
    prompts = rng.integers(10, config.text.vocab_size - 10, size=(B, P))
    dtype = jnp.float32 if tiny else jnp.bfloat16

    def fresh_params():
        return qmodel.init_params(config, jax.random.key(0), dtype=dtype,
                                  with_vision=False)

    results = {}
    log("bf16 reference…")
    params = fresh_params()
    ref_logits = last_logits(config, params, prompts)
    ref_toks = greedy_tokens(config, params, prompts, n_new, {})
    del params
    gc.collect()

    def cos(a, b):
        a = a.astype(np.float64).ravel(); b = b.astype(np.float64).ravel()
        return float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b) + 1e-12))

    configs = [
        ("int8w", dict(mode="int8"), dict(weight_quant="int8"), False),
        ("int8w+w8a8", dict(mode="int8"), dict(weight_quant="int8",
                                               act_quant="int8"), True),
        ("int4w", dict(mode="int4"), dict(weight_quant="int4"), False),
        # the decode-side KV-cache quantizer (wave-14 decode_inner=32
        # workaround) — logits go through the same bf16 prefill, so only the
        # greedy-decode agreement is the new information here
        ("int8w+kvint8", dict(mode="int8"),
         dict(weight_quant="int8", kv_quant="int8", decode_inner=16), False),
    ]
    for name, qkw, engine_kwargs, a8 in configs:
        if tiny and "int4" in name:
            continue
        log(f"{name}…")
        params = quantize_decode_params(fresh_params(), **qkw)
        logits = last_logits(config, params, prompts, act_quant=a8)
        denom = np.abs(ref_logits).max()
        rel = np.abs(logits - ref_logits).max() / denom
        csim = cos(logits, ref_logits)
        top1 = float(np.mean(logits.argmax(-1) == ref_logits.argmax(-1)))
        toks = greedy_tokens(config, params, prompts, n_new, engine_kwargs)
        agree = float(np.mean(toks == ref_toks))
        # first divergence position per prompt (−1 = fully identical)
        first_div = [int(np.argmax(t != r)) if (t != r).any() else -1
                     for t, r in zip(toks, ref_toks)]
        results[name] = dict(logit_rel_err=float(rel), logit_cos=csim,
                             top1_agree=top1,
                             greedy_agree=agree, first_divergence=first_div)
        log(f"  logit rel err {rel:.4f}  cos {csim:.5f}  top1 {top1:.3f}  "
            f"greedy agree {agree:.3f}  first_div {first_div}")
        del params
        gc.collect()

    # ---- depth curve: random weights are CHAOTIC in depth (each random
    # layer amplifies a perturbation; trained nets with layernorm don't) —
    # the per-depth cosine separates the quantizer's own noise (depth 1-2,
    # the bound that transfers to real checkpoints) from chaos compounding
    # (depth 36, a property of random weights, not of the quantizer)
    curve = {}
    for depth in ((1, 2) if tiny else (1, 2, 4, 8)):
        import dataclasses
        dcfg = dataclasses.replace(
            config, text=dataclasses.replace(config.text,
                                             num_hidden_layers=depth))
        dparams = qmodel.init_params(dcfg, jax.random.key(0), dtype=dtype,
                                     with_vision=False)
        r = last_logits(dcfg, dparams, prompts)
        q8 = last_logits(dcfg, quantize_decode_params(dparams, mode="int8"),
                         prompts)
        curve[depth] = dict(
            cos=cos(q8, r),
            rel=float(np.abs(q8 - r).max() / np.abs(r).max()))
        log(f"  depth {depth}: int8w cos {curve[depth]['cos']:.5f} "
            f"rel {curve[depth]['rel']:.4f}")
        del dparams
        gc.collect()
    results["int8w_depth_curve"] = curve

    import json
    print(json.dumps(results))


if __name__ == "__main__":
    main()
