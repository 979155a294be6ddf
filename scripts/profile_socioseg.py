"""Phase profiler for the SocioSeg two-stage infer pipeline on real hardware.

Wraps the pipeline's collator / image-embeds / generate / segment / restage
phases with wall timers and runs bench.bench_socioseg (warmup + timed run).
This is how the round-2 transfer bottlenecks were found (image_embeds 81s of
a 110s batch = eager ViT dispatch + f32 uploads + embed round-trips).

Usage: python scripts/profile_socioseg.py
"""

import sys
import time

sys.path.insert(0, ".")

import bench as B  # noqa: E402
import socioreasoner_tpu.pipeline.rlvr.socioseg_infer_pipeline as sip  # noqa: E402
import socioreasoner_tpu.distributed.jax_strategies as js  # noqa: E402


def timed(name, fn):
    def wrap(*a, **k):
        t0 = time.perf_counter()
        out = fn(*a, **k)
        print(f"  [{name}] {time.perf_counter() - t0:.2f}s", flush=True)
        return out
    return wrap


def main():
    sip.batch_image_embeds = timed("image_embeds", js.batch_image_embeds)
    sip.collate_restage = timed("collate_restage", sip.collate_restage)

    _orig_two = sip.SocioSegInferPipeline._two_stage

    def two(self, rows):
        t0 = time.perf_counter()
        out = _orig_two(self, rows)
        print(f"[two_stage total] {time.perf_counter() - t0:.2f}s", flush=True)
        return out
    sip.SocioSegInferPipeline._two_stage = two

    _orig_init = sip.SocioSegInferPipeline.__init__

    def init(self, *a, **k):
        _orig_init(self, *a, **k)
        self.decode_group.generate = timed("generate",
                                           self.decode_group.generate)
        self._segment = timed("segment", self._segment)
        self.collator = timed("collator", self.collator)
    sip.SocioSegInferPipeline.__init__ = init

    tps, detail = B.bench_socioseg()
    print("tiles/s:", tps, detail, flush=True)


if __name__ == "__main__":
    main()
