"""Round-3 perf exploration on the real chip (run configs as separate
processes so a crash in one doesn't kill the rest).

  seg   — instrument Sam2Predictor.set_images (encoder) vs _predict (decoder)
          inside bench_socioseg to split the segment_s1/s2 time
  int8  — bench_socioseg with weight_quant=int8 (hybrid int8 decode loop)
  t24   — bench_socioseg with 24 tiles, bf16 KV (r2's crash config minus
          int8 KV), max_prefill_batch=8

Usage: python scripts/explore_r3.py <seg|int8|t24>
"""

import sys
import time

sys.path.insert(0, ".")


def patch_seg_timers():
    import numpy as np
    import jax
    from socioreasoner_tpu.models.sam2.model import Sam2Predictor

    orig_set = Sam2Predictor.set_images
    orig_pred = Sam2Predictor.predict_objects_mask_batch

    def set_images(self, images):
        t0 = time.perf_counter()
        out = orig_set(self, images)
        jax.block_until_ready(self._embeddings)
        print(f"    [sam encode b={len(images)}] "
              f"{time.perf_counter() - t0:.2f}s", flush=True)
        return out

    def predict_batch(self, prompts_list, out_size, max_objects=16,
                      embeddings=None):
        t0 = time.perf_counter()
        out = orig_pred(self, prompts_list, out_size, max_objects,
                        embeddings=embeddings)
        np.asarray(out[0])
        kmax = max((len(p) for p in prompts_list), default=0)
        npts = max((len(o.get("points", [])) for ps in prompts_list
                    for o in ps), default=0)
        print(f"    [sam decode b={len(prompts_list)} k<={kmax} pts<={npts}] "
              f"{time.perf_counter() - t0:.2f}s", flush=True)
        return out

    Sam2Predictor.set_images = set_images
    Sam2Predictor.predict_objects_mask_batch = predict_batch


def main():
    mode = sys.argv[1]
    import bench as B

    if mode == "seg":
        patch_seg_timers()
        tps, detail = B.bench_socioseg()
    elif mode == "int8":
        tps, detail = B.bench_socioseg(weight_quant="int8")
    elif mode == "t24":
        tps, detail = B.bench_socioseg(n_tiles=24)
    elif mode == "t24int8":
        tps, detail = B.bench_socioseg(n_tiles=24, weight_quant="int8")
    else:
        raise SystemExit(f"unknown mode {mode}")
    print(f"[{mode}] tiles/s={tps:.3f} {detail}", flush=True)


if __name__ == "__main__":
    main()
