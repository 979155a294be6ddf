"""On-chip flash-attention block tuning at the prefill production shapes.

VERDICT r4 item 5: prefill is FLOP-bound at ~0.55 MFU (w8a16); the attention
kernel is the only non-XLA matmul in the graph. Sweeps (block_q, block_k) at
the socioseg prefill buckets (batch 2, L 2048/2560, 16q/2kv heads, D=128,
bf16, causal) and quantifies the GQA fold (K/V DMA'd once per KV head) vs
the pre-r5 jnp.repeat layout (K/V materialized+fetched once per q head).

Usage:  python scripts/tune_flash_prefill.py [--quick]
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
    from socioreasoner_tpu.ops.flash_attention import flash_attention

    quick = "--quick" in sys.argv
    rng = np.random.default_rng(0)
    B, H, Hkv, D = 2, 16, 2, 128
    lengths = (2048,) if quick else (2048, 2560)
    blocks = ((128, 128), (256, 128)) if quick else (
        (128, 128), (128, 256), (128, 512),
        (256, 128), (256, 256), (256, 512),
        (512, 256), (512, 512))

    for L in lengths:
        q = jnp.asarray(rng.normal(size=(B, L, H, D)) * 0.1, jnp.bfloat16)
        k = jnp.asarray(rng.normal(size=(B, L, Hkv, D)) * 0.1, jnp.bfloat16)
        v = jnp.asarray(rng.normal(size=(B, L, Hkv, D)) * 0.1, jnp.bfloat16)
        mask = jnp.ones((B, L), jnp.int32)
        # causal: ~half the pairs survive
        flops = 2 * 2 * B * H * L * L * D / 2
        ref = None
        for (bq, bk) in blocks:
            fn = jax.jit(lambda q, k, v, m, _bq=bq, _bk=bk: flash_attention(
                q, k, v, m, causal=True, block_q=_bq, block_k=_bk))
            try:
                out = fn(q, k, v, mask)
                out.block_until_ready()
            except Exception as e:  # noqa: BLE001
                log(f"L={L} bq={bq} bk={bk}: FAILED {type(e).__name__}: "
                    f"{str(e)[:120]}")
                continue
            if ref is None:
                ref = np.asarray(out, np.float32)
            else:
                err = float(np.max(np.abs(np.asarray(out, np.float32) - ref)))
                assert err < 2e-2, (bq, bk, err)
            iters = 30
            t0 = time.perf_counter()
            for _ in range(iters):
                out = fn(q, k, v, mask)
            out.block_until_ready()
            dt = (time.perf_counter() - t0) / iters
            log(f"L={L} bq={bq} bk={bk}: {dt*1e3:7.3f} ms  "
                f"{flops/dt/1e12:6.2f} TFLOP/s")

        # pre-r5 baseline: repeat K/V to all q heads (rep=1 inside the call)
        kr = jnp.repeat(k, H // Hkv, axis=2)
        vr = jnp.repeat(v, H // Hkv, axis=2)
        fn = jax.jit(lambda q, k, v, m: flash_attention(
            q, k, v, m, causal=True))
        out = fn(q, kr, vr, mask); out.block_until_ready()
        iters = 30
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(q, kr, vr, mask)
        out.block_until_ready()
        dt = (time.perf_counter() - t0) / iters
        log(f"L={L} REPEAT baseline (incl repeat op): {dt*1e3:7.3f} ms  "
            f"{flops/dt/1e12:6.2f} TFLOP/s")


if __name__ == "__main__":
    main()
