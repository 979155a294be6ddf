"""On-chip verify of the KV-tiled segmented flash kernel at the packed-ViT
geometry that scoped-vmem-OOMed pre-fix (S=46720, 16 segments, H=16, D=80).

Checks numerics per segment (kernel on the full packed seq vs XLA dense on
each segment alone) and times the dispatch. Run with the TPU tunnel up:
    python scripts/verify_seg_kernel_tpu.py
"""

import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

from socioreasoner_tpu.ops.flash_attention import flash_attention_segmented


def dense_ref(q, k, v):
    s = jnp.einsum("shd,thd->hst", q.astype(jnp.float32),
                   k.astype(jnp.float32)) * (q.shape[-1] ** -0.5)
    p = jax.nn.softmax(s, axis=-1)
    return jnp.einsum("hst,thd->shd", p, v.astype(jnp.float32))


def main():
    n_seg, seg_len, H, D = 16, 2920, 16, 80
    S = n_seg * seg_len
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.standard_normal((S, H, D)), jnp.bfloat16)
    k = jnp.asarray(rng.standard_normal((S, H, D)), jnp.bfloat16)
    v = jnp.asarray(rng.standard_normal((S, H, D)), jnp.bfloat16)
    seg = jnp.repeat(jnp.arange(n_seg, dtype=jnp.int32), seg_len)

    from socioreasoner_tpu.ops.flash_attention import seg_max_span_blocks
    maxk = seg_max_span_blocks(np.asarray(seg))
    out_d = flash_attention_segmented(q, k, v, seg)
    out_d.block_until_ready()
    print(f"dense-fallback compiled + ran: out {out_d.shape} {out_d.dtype}")
    t0 = time.perf_counter()
    for _ in range(3):
        out_d = flash_attention_segmented(q, k, v, seg)
    out_d.block_until_ready()
    print(f"dense-fallback S={S}: "
          f"{(time.perf_counter() - t0) / 3 * 1e3:.1f} ms/call")

    out = flash_attention_segmented(q, k, v, seg, max_span_blocks=maxk)
    out.block_until_ready()
    t0 = time.perf_counter()
    for _ in range(3):
        out = flash_attention_segmented(q, k, v, seg, max_span_blocks=maxk)
    out.block_until_ready()
    print(f"block-sparse (maxk={maxk}) S={S}: "
          f"{(time.perf_counter() - t0) / 3 * 1e3:.1f} ms/call")
    err_sp = float(jnp.abs(out.astype(jnp.float32)
                           - out_d.astype(jnp.float32)).max())
    print(f"sparse vs dense-fallback: max |err| = {err_sp:.4f}")
    assert err_sp < 0.05

    # numerics: check segments 0 and 7 against per-segment dense attention
    for si in (0, 7):
        sl = slice(si * seg_len, (si + 1) * seg_len)
        ref = dense_ref(q[sl], k[sl], v[sl])
        got = out[sl].astype(jnp.float32)
        err = float(jnp.abs(got - ref).max())
        print(f"segment {si}: max |err| = {err:.4f}")
        assert err < 0.05, f"numerics mismatch on segment {si}"
    print("OK")


if __name__ == "__main__":
    main()
