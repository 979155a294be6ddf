"""On-device integrated check: ONE full GRPO SocioSeg pipeline step on the real
TPU — rollout (decode engine) → SAM2 segment → rule rewards → advantages →
policy update — with tiny models (the CPU e2e test's config, on-chip).

Run:  PYTHONPATH=/root/repo:/root/.axon_site python scripts/verify_pipeline_tpu.py
(~2-4 min including compiles.)
"""

import sys

import numpy as np
import jax
import jax.numpy as jnp


def main():
    sys.path.insert(0, ".")
    from socioreasoner_tpu.configs.rlvr_config import SocioSegConfig
    from socioreasoner_tpu.datasets.processor import (ImageProcessorConfig,
                                                      SocioProcessor)
    from socioreasoner_tpu.datasets.socioseg import encode_sample
    from socioreasoner_tpu.models.qwen2_5_vl.config import Qwen25VLConfig
    from socioreasoner_tpu.models.qwen2_5_vl import model as qmodel
    from socioreasoner_tpu.models.sam2.config import Sam2Config
    from socioreasoner_tpu.models.sam2 import model as smodel
    from socioreasoner_tpu.pipeline.rlvr.socioseg_pipeline import SocioSegPipeline
    from tests.test_infer_pipeline_e2e import TinyTokenizer, make_tiles

    VOCAB = 512
    model_config = Qwen25VLConfig.tiny(VOCAB)
    policy_params = qmodel.init_params(model_config, jax.random.key(0), jnp.float32)
    ref_params = qmodel.init_params(model_config, jax.random.key(0), jnp.float32)
    sam_config = Sam2Config.tiny_test()
    sam_params = smodel.init_params(sam_config, jax.random.key(1))
    img_cfg = ImageProcessorConfig(min_pixels=56 * 56, max_pixels=56 * 56 * 4)
    processor = SocioProcessor(TinyTokenizer(), img_cfg,
                               image_token_id=model_config.image_token_id)

    import tempfile
    cfg = SocioSegConfig(
        output_dir=tempfile.mkdtemp(), rollout_batch_size=2, prompt_length=640,
        response_length=16, save_steps=-1, track_with="stdout", max_steps=1,
        num_return_sequences_in_group=2, adv_estimator="grpo",
        use_kl_loss=True, kl_loss_coef=5e-3, entropy_loss_coef=0.01)
    cfg.actor_infer.generating_args.max_new_tokens = 6
    cfg.actor_infer.generating_args.num_return_sequences = 2
    cfg.actor_train.backward_batch_size = 4

    dataset = [encode_sample(t, img_cfg) for t in make_tiles(2)]
    pipe = SocioSegPipeline(
        cfg, model_config=model_config, policy_params=policy_params,
        reference_params=ref_params, sam_config=sam_config, sam_params=sam_params,
        processor=processor, dataset=dataset,
        engine_kwargs={"max_slots": 4, "max_len": 700, "decode_chunk": 4,
                       "prefill_buckets": (640,), "image_buckets": (0, 16, 32),
                       "cache_dtype": jnp.float32})
    import time
    t0 = time.perf_counter()
    metrics = pipe.run()
    dt = time.perf_counter() - t0
    loss = metrics["map/actor_train/total_loss"]
    assert np.isfinite(loss), loss
    diff = jax.tree.map(lambda a, b: float(jnp.abs(a - b).max()),
                        pipe.actor_train.params, ref_params)
    assert max(jax.tree.leaves(diff)) > 0, "params did not move"
    print(f"OK: full GRPO pipeline step on {jax.devices()[0].platform} "
          f"in {dt:.1f}s, loss={loss:.4f}")


if __name__ == "__main__":
    main()
