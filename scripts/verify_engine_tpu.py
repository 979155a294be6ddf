"""On-device greedy parity check: DecodeEngine (flash prefill + paged decode)
vs a naive full-forward greedy loop, on the real TPU.

Exercises the production decode path of `generation/engine.py` at real 3B head
dims (head_dim=128 activates the paged decode kernel in
models/qwen2_5_vl/text.py). Greedy argmax can legitimately flip on near-tie
logits between the pallas kernels and the XLA dense path; a divergence is only
a FAILURE when the naive top-2 logit gap at the divergent step is large
(> GAP_TOL) or the engine token is not the naive runner-up.

Run:  PYTHONPATH=. python scripts/verify_engine_tpu.py   (real TPU; ~3-5 min)
"""

import numpy as np
import jax
import jax.numpy as jnp

from socioreasoner_tpu.models.qwen2_5_vl.config import (
    Qwen25VLConfig, TextConfig, VisionConfig)
from socioreasoner_tpu.models.qwen2_5_vl import model as qmodel
from socioreasoner_tpu.models.qwen2_5_vl import rope as qrope
from socioreasoner_tpu.generation.engine import DecodeEngine, Request
from socioreasoner_tpu.generation.sampling import SamplingParams

GAP_TOL = 0.05   # bf16-scale logit gap below which a greedy flip is a tie


def main():
    vocab = 8192
    config = Qwen25VLConfig(
        vision=VisionConfig(depth=1, hidden_size=64, intermediate_size=128,
                            num_heads=4, out_hidden_size=2048, window_size=28,
                            fullatt_block_indexes=(0,)),
        text=TextConfig(vocab_size=vocab, hidden_size=2048,
                        intermediate_size=4096, num_hidden_layers=2,
                        num_attention_heads=16, num_key_value_heads=2,
                        head_dim=128, mrope_section=(16, 24, 24),
                        tie_word_embeddings=False),
        image_token_id=vocab - 3, video_token_id=vocab - 2,
        vision_start_token_id=vocab - 4,
        bos_token_id=0, eos_token_id=1, pad_token_id=0)
    params = qmodel.init_params(config, jax.random.key(7), dtype=jnp.bfloat16,
                                with_vision=False)

    rng = np.random.default_rng(0)
    prompts = [rng.integers(2, vocab - 8, size=n).tolist() for n in (37, 61)]
    MAX_NEW = 6

    engine = DecodeEngine(config, params, max_slots=4, max_len=256,
                          decode_chunk=4, prefill_buckets=(64,))
    sp = SamplingParams(temperature=0.0, do_sample=False, max_new_tokens=MAX_NEW)
    outs = engine.generate([Request(request_id=i, prompt_ids=p, sampling=sp)
                            for i, p in enumerate(prompts)])

    W = 128

    @jax.jit
    def fwd(params, ids, attn, pos):
        logits, _ = qmodel.forward(config, params, ids, pos, attn)
        return logits

    failures = 0
    for r, prompt in enumerate(prompts):
        got = list(outs[r].output_ids)
        toks = list(prompt)
        for step in range(min(MAX_NEW, len(got))):
            ids = np.zeros((1, W), np.int64)
            ids[0, :len(toks)] = toks
            attn = np.zeros((1, W), np.int64)
            attn[0, :len(toks)] = 1
            pos, _ = qrope.get_rope_index(config, ids, None, attn)
            logits = fwd(params, jnp.asarray(ids), jnp.asarray(attn),
                         jnp.asarray(pos))
            row = np.asarray(logits[0, len(toks) - 1], np.float32)
            top2 = np.argsort(row)[-2:][::-1]
            want, runner = int(top2[0]), int(top2[1])
            gap = float(row[top2[0]] - row[top2[1]])
            eng = got[step]
            if eng != want:
                tie = eng == runner and gap < GAP_TOL
                print(f"req {r} step {step}: engine {eng} naive {want} "
                      f"runner-up {runner} gap {gap:.4f} "
                      f"{'TIE-FLIP (ok)' if tie else 'FAILURE'}")
                if not tie:
                    failures += 1
            toks.append(eng)   # continue on the engine's trajectory
        print(f"req {r}: engine {got}")

    assert failures == 0, f"{failures} non-tie divergence(s)"
    print("OK: engine greedy == naive forward on TPU (ties excluded)")

    # ---- prefix fork on the real chip: duplicates of prompt 0 must fork
    # (device KV row copy) and reproduce the leader's greedy tokens exactly
    fouts = engine.generate([
        Request(request_id=("f", j), prompt_ids=list(prompts[0]), sampling=sp)
        for j in range(2)])
    assert engine.forked_requests >= 1, "no fork happened on the duplicates"
    for o in fouts:
        assert list(o.output_ids) == list(outs[0].output_ids), (
            o.output_ids, outs[0].output_ids)
    print(f"OK: prefix fork on TPU (forked_requests={engine.forked_requests}) "
          "matches the leader's greedy tokens")


if __name__ == "__main__":
    main()
