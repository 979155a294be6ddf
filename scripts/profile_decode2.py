"""Micro-variants for the decode hot spots found by profile_decode.py.

Candidates:
  scatter: advanced-index scatter (current) vs pallas row-writer DMA kernel
  sampler: lax.top_k(256) (current) vs lax.approx_max_k(256)
  embed:   params["embed"][ids] gather breakdown (gather vs rope trig)
  lm_head: 3D vs 2D matmul, f32 vs bf16 accum
"""

import time
import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

S, L, Hkv, D, H, V = 24, 36, 2, 128, 16, 151936
LALLOC = 1536


def timed(fn, *args, iters=10):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters * 1000


def main():
    rng = np.random.default_rng(0)
    k_all = jnp.zeros((L, S, LALLOC, Hkv, D), jnp.bfloat16)
    v_all = jnp.zeros((L, S, LALLOC, Hkv, D), jnp.bfloat16)
    knew = jnp.asarray(rng.normal(size=(S, 1, Hkv, D)), jnp.bfloat16)
    lengths = jnp.asarray(np.full(S, 520, np.int32))

    # ---- current: advanced-index scatter, 36 layers (k only)
    @jax.jit
    def scatter_adv(k_all, knew, positions):
        bidx = jnp.arange(S)[:, None]
        def body(i, k_all):
            return k_all.at[i, bidx, positions].set(knew)
        return jax.lax.fori_loop(0, L, body, k_all)

    ms = timed(scatter_adv, k_all, knew, lengths[:, None])
    print(f"scatter advanced-index x{L} (k only): {ms:.2f} ms")

    # ---- pallas row writer: one kernel writes k+v rows of all slots at layer i
    def _writer(len_ref, layer_ref, knew_ref, vnew_ref, k_hbm, v_hbm,
                ko_hbm, vo_hbm, sem):
        lyr = layer_ref[0]
        del k_hbm, v_hbm  # aliased with ko/vo
        copies = []
        for i in range(S):
            pos = len_ref[i]
            copies.append(pltpu.make_async_copy(
                knew_ref.at[i], ko_hbm.at[lyr, i].at[pl.ds(pos, 1)],
                sem.at[i, 0]))
            copies.append(pltpu.make_async_copy(
                vnew_ref.at[i], vo_hbm.at[lyr, i].at[pl.ds(pos, 1)],
                sem.at[i, 1]))
        for c in copies:
            c.start()
        for c in copies:
            c.wait()

    def write_rows(k_all, v_all, knew, vnew, positions, layer):
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(1,),
            in_specs=[
                pl.BlockSpec((S, 1, Hkv, D), lambda *_: (0, 0, 0, 0)),
                pl.BlockSpec((S, 1, Hkv, D), lambda *_: (0, 0, 0, 0)),
                pl.BlockSpec(memory_space=pltpu.ANY),
                pl.BlockSpec(memory_space=pltpu.ANY),
            ],
            out_specs=(pl.BlockSpec(memory_space=pltpu.ANY),
                       pl.BlockSpec(memory_space=pltpu.ANY)),
            scratch_shapes=[pltpu.SemaphoreType.DMA((S, 2))],
        )
        return pl.pallas_call(
            _writer, grid_spec=grid_spec,
            out_shape=(jax.ShapeDtypeStruct(k_all.shape, k_all.dtype),
                       jax.ShapeDtypeStruct(v_all.shape, v_all.dtype)),
            input_output_aliases={4: 0, 5: 1},   # 2 prefetch + 2 vmem → idx 4,5
            compiler_params=pltpu.CompilerParams(has_side_effects=True),
        )(positions, jnp.asarray(layer, jnp.int32).reshape(1), knew, vnew,
          k_all, v_all)

    @jax.jit
    def scatter_pallas(k_all, v_all, knew, vnew, positions):
        def body(i, carry):
            k_all, v_all = carry
            return write_rows(k_all, v_all, knew, vnew, positions, i)
        return jax.lax.fori_loop(0, L, body, (k_all, v_all))

    ms = timed(scatter_pallas, k_all, v_all, knew, knew, lengths)
    print(f"scatter pallas row-writer x{L} (k AND v): {ms:.2f} ms")

    # ---- sampler variants
    logits = jnp.asarray(rng.normal(size=(S, V)) * 3, jnp.float32)

    @jax.jit
    def top_k_exact(logits):
        return jax.lax.top_k(logits, 256)

    @jax.jit
    def top_k_approx(logits):
        return jax.lax.approx_max_k(logits, 256, recall_target=0.95)

    print(f"lax.top_k(256) over (24,152k): {timed(top_k_exact, logits):.2f} ms")
    print(f"approx_max_k(256): {timed(top_k_approx, logits):.2f} ms")

    @jax.jit
    def argmax_only(logits):
        return jnp.argmax(logits, axis=-1)
    print(f"argmax: {timed(argmax_only, logits):.2f} ms")

    @jax.jit
    def lse_only(logits):
        return jax.scipy.special.logsumexp(logits, axis=-1)
    print(f"logsumexp: {timed(lse_only, logits):.2f} ms")

    # ---- embed gather vs rope trig
    embed = jnp.asarray(rng.normal(size=(V, 2048)) * 0.02, jnp.bfloat16)
    tok = jnp.asarray(rng.integers(0, V, S), jnp.int32)

    @jax.jit
    def gather_rows(embed, tok):
        return embed[tok[:, None]]
    print(f"embed gather only: {timed(gather_rows, embed, tok):.2f} ms")

    @jax.jit
    def take_rows(embed, tok):
        return jnp.take(embed, tok, axis=0)[:, None]
    print(f"embed take only: {timed(take_rows, embed, tok):.2f} ms")

    from socioreasoner_tpu.models.qwen2_5_vl.rope import (make_inv_freq,
                                                          mrope_channel_axis,
                                                          mrope_cos_sin)

    @jax.jit
    def rope_only(next_pos):
        pos = jnp.broadcast_to(next_pos[:, None, None], (S, 3, 1)).astype(jnp.int64)
        inv_freq = jnp.asarray(make_inv_freq(D, 1000000.0))
        chan = mrope_channel_axis(D, (16, 24, 24))
        return mrope_cos_sin(pos, inv_freq, chan)
    print(f"mrope trig only: {timed(rope_only, lengths):.2f} ms")

    # ---- lm_head variants
    head = jnp.asarray(rng.normal(size=(2048, V)) * 0.02, jnp.bfloat16)
    h3 = jnp.asarray(rng.normal(size=(S, 1, 2048)), jnp.bfloat16)
    h2 = h3[:, 0]

    @jax.jit
    def head_3d(h, head):
        return h @ head
    print(f"lm_head 3D (24,1,2048)@(2048,V): {timed(head_3d, h3, head):.2f} ms")

    @jax.jit
    def head_2d(h, head):
        return h @ head
    print(f"lm_head 2D (24,2048)@(2048,V): {timed(head_2d, h2, head):.2f} ms")

    @jax.jit
    def head_2d_f32(h, head):
        return jax.lax.dot_general(h, head, (((1,), (0,)), ((), ())),
                                   preferred_element_type=jnp.float32)
    print(f"lm_head 2D pref_f32: {timed(head_2d_f32, h2, head):.2f} ms")

    headT = jnp.asarray(np.asarray(head.astype(jnp.float32)).T, jnp.bfloat16)

    @jax.jit
    def head_T(h, headT):
        return jax.lax.dot_general(h, headT, (((1,), (1,)), ((), ())),
                                   preferred_element_type=jnp.float32)
    print(f"lm_head (24,2048)@(V,2048)^T: {timed(head_T, h2, headT):.2f} ms")

    # int8 weight-only matmul (per-out-channel scale folded after)
    head_q = jnp.clip(jnp.round(head.astype(jnp.float32) / 0.001), -127, 127
                      ).astype(jnp.int8)
    scale = jnp.full((V,), 0.001, jnp.float32)

    @jax.jit
    def head_int8(h, head_q, scale):
        y = jax.lax.dot_general(h, head_q.astype(jnp.bfloat16),
                                (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
        return y * scale[None, :]
    print(f"lm_head int8 weights: {timed(head_int8, h2, head_q, scale):.2f} ms")

    # layer matmul int8 check: gate_w-shaped (2048, 11008)
    w = jnp.asarray(rng.normal(size=(2048, 11008)) * 0.02, jnp.bfloat16)
    w_q = jnp.clip(jnp.round(w.astype(jnp.float32) / 0.001), -127, 127
                   ).astype(jnp.int8)
    ws = jnp.full((11008,), 0.001, jnp.float32)

    @jax.jit
    def mm_bf16(h, w):
        return h @ w
    print(f"mlp matmul bf16 (2048x11008): {timed(mm_bf16, h2, w):.3f} ms")

    @jax.jit
    def mm_int8(h, w_q, ws):
        y = jax.lax.dot_general(h, w_q.astype(jnp.bfloat16),
                                (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
        return (y * ws[None, :]).astype(jnp.bfloat16)
    print(f"mlp matmul int8 weights: {timed(mm_int8, h2, w_q, ws):.3f} ms")


if __name__ == "__main__":
    main()
