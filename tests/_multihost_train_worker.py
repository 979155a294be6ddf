"""Worker for the 2-process GRPO train-step test (VERDICT r4 item 7).

The multi-slice execution model this exercises (and documents):
  - model state is GLOBAL: params/optimizer shard over a mesh spanning BOTH
    processes' devices (here 2 × 4 virtual CPU devices → an 8-device
    dp=2 × fsdp=2 × tp=2 mesh), GSPMD inserts the cross-process collectives;
  - the host driver is SPMD-REPLICATED: every process runs the same pipeline
    host code on identical batch data (rank 0 owns trackers/writers), so
    `jax.device_put(host_array, global_sharding)` is valid — each process
    contributes its addressable shards of the same logical array;
  - the decode engine is PER-PROCESS DATA-PARALLEL: each host builds its own
    DecodeEngine on its local devices and serves its share of prompts
    (the reference's vllm dp=world_size layout, vllm_strategy.py:98-99) —
    cross-host weight sync rides the global arrays, not the engine.
"""

import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")

from socioreasoner_tpu.runtime.initialize import get_driver_rank, init


def main():
    init(timeout_s=120)
    import jax
    import jax.numpy as jnp
    import numpy as np

    rank = get_driver_rank()
    assert jax.process_count() == 2, jax.process_count()
    assert jax.device_count() == 8, jax.device_count()
    assert jax.local_device_count() == 4

    from socioreasoner_tpu.configs.worker_config import WorkerConfig
    from socioreasoner_tpu.distributed.jax_strategies import (
        JaxInferStrategy, JaxTrainStrategy)
    from socioreasoner_tpu.distributed.strategy import ParamStore
    from socioreasoner_tpu.models.qwen2_5_vl import model as qmodel
    from socioreasoner_tpu.models.qwen2_5_vl.config import Qwen25VLConfig
    from socioreasoner_tpu.parallel.mesh import make_mesh
    from socioreasoner_tpu.pipeline.losses import PPOLossConfig
    from socioreasoner_tpu.protocol import BatchProto

    mesh = make_mesh(dp=2, fsdp=2, tp=2)
    config = Qwen25VLConfig.tiny(512)
    params = qmodel.init_params(config, jax.random.key(0), jnp.float32,
                                with_vision=False)

    store = ParamStore()
    train = JaxTrainStrategy(worker_config=WorkerConfig(), param_store=store)
    train.initialize(config, params, PPOLossConfig(use_kl_loss=True,
                                                   kl_loss_coef=5e-3),
                     training_args=None, mesh=mesh)
    ref = JaxInferStrategy(worker_config=WorkerConfig(), param_store=store)
    ref.initialize(config, params, mesh=mesh)

    # identical batch on every process (SPMD-replicated host driver)
    rng = np.random.default_rng(0)
    B, L = 4, 32
    ids = rng.integers(2, 400, size=(B, L))
    resp = np.zeros((B, L), np.int64)
    resp[:, L // 2:] = 1
    batch = BatchProto.from_dict(tensors={
        "input_ids": ids,
        "attention_mask": np.ones((B, L), np.int64),
        "position_ids": np.tile(np.arange(L)[None, None], (B, 3, 1)),
        "response_mask": resp,
        "advantages": rng.normal(size=(B, L - 1)).astype(np.float32),
        "old_log_probs": -np.abs(rng.normal(size=(B, L - 1))).astype(np.float32),
        "ref_log_probs": -np.abs(rng.normal(size=(B, L - 1))).astype(np.float32),
    })

    lp = ref.compute_log_probs(batch)["log_probs"]
    assert lp.shape == (B, L - 1) and np.isfinite(lp).all()

    metrics = train.train_step(batch)
    loss = metrics["actor_train/loss"]
    assert np.isfinite(loss), metrics

    # per-process DP decode replica on local devices only
    from socioreasoner_tpu.generation.engine import DecodeEngine, Request
    from socioreasoner_tpu.generation.sampling import SamplingParams
    engine = DecodeEngine(config, params, max_slots=2, max_len=64,
                          decode_chunk=4, prefill_buckets=(32,),
                          cache_dtype=jnp.float32)
    outs = engine.generate([Request(
        request_id=(rank, i), prompt_ids=ids[i, :16].tolist(),
        sampling=SamplingParams(max_new_tokens=4)) for i in range(2)])
    assert len(outs) == 2 and all(len(o.output_ids) >= 1 for o in outs)

    # train loss must agree bit-for-bit across processes (same global program)
    from socioreasoner_tpu.utils.collective import broadcast_host_data
    loss0 = broadcast_host_data(float(loss), src=0)
    assert abs(loss0 - float(loss)) < 1e-6, (loss0, loss)
    print(f"rank {rank} TRAIN OK loss={float(loss):.6f}")


if __name__ == "__main__":
    sys.exit(main())
