"""Time the ViT tower bf16 vs int8 (w8a8) in isolation on-chip.

The wave-11 full-bench A/B of SOCIO_BENCH_VIT_QUANT=int8 regressed hard
(0.966 -> 0.380 tiles/s) but ran concurrently with a host-side pytest sweep,
so the number is contaminated. This probe times ONLY run_vision_u8 (one
map+sat pair at 768 px, the socioseg shape) under both param trees, warm,
in one quiet process: `python scripts/profile_vision_quant.py`.
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
    from socioreasoner_tpu.datasets.processor import ImageProcessorConfig
    from socioreasoner_tpu.models.qwen2_5_vl import model as qmodel
    from socioreasoner_tpu.models.qwen2_5_vl.config import Qwen25VLConfig
    from socioreasoner_tpu.models.qwen2_5_vl.vision import run_vision_u8

    cfg = Qwen25VLConfig()
    ic = ImageProcessorConfig(defer_patchify=True)
    params = qmodel.init_params(cfg, jax.random.key(0), dtype=jnp.bfloat16,
                                with_vision=True)
    rng = np.random.default_rng(0)
    # smart_resize(768) -> 756x756 at patch 14 / merge 2: grid (1, 54, 54)
    img = rng.integers(0, 255, (756, 756, 3), dtype=np.uint8)
    grid = np.array([[1, 54, 54], [1, 54, 54]])
    imgs = [img, img.copy()]

    def timed(tag, p):
        out = run_vision_u8(cfg.vision, p, imgs, grid, ic,
                            dtype=jnp.bfloat16)
        out.block_until_ready()            # compile + warm
        ts = []
        for _ in range(5):
            t0 = time.perf_counter()
            out = run_vision_u8(cfg.vision, p, imgs, grid, ic,
                                dtype=jnp.bfloat16)
            out.block_until_ready()
            ts.append(time.perf_counter() - t0)
        log(f"{tag}: warm {min(ts)*1e3:.1f} ms (median "
            f"{sorted(ts)[len(ts)//2]*1e3:.1f})")
        return out

    ref = np.asarray(timed("bf16", params["vision"]), np.float32)

    from socioreasoner_tpu.ops.quant import quantize_vision_params
    quantize_vision_params(params["vision"], inplace=True)
    got = np.asarray(timed("int8 w8a8", params["vision"]), np.float32)
    rel = (np.abs(got - ref).max()
           / max(np.abs(ref).max(), 1e-6))
    log(f"closeness: max abs rel err {rel:.3e}")


if __name__ == "__main__":
    main()
