"""socioreasoner_tpu — a TPU-native (JAX/XLA/Pallas) rebuild of AMAP-ML/SocioReasoner.

The reference stack (ROLL + mcore_adapter + vLLM + SAM2 on GPUs) is rebuilt here as
an idiomatic single-program TPU design: one set of Qwen2.5-VL weights sharded over a
`jax.sharding.Mesh`, reused by the train step, the log-prob step, and the decode
engine; a SAM2-style mask decoder and the IoU reward on the same devices; host-side
orchestration kept minimal (no Ray — a thread-pool single controller).

Layer map (mirrors SURVEY.md §1):
  protocol / runtime      — BatchProto batches, Cluster/Worker dispatch
  distributed             — strategy layer (train / infer / seg backends)
  models                  — Qwen2.5-VL + SAM2 in functional JAX
  ops                     — Pallas kernels + sharded numerics
  parallel                — mesh axes, sharding rules, ring attention
  generation              — continuous-batching decode engine
  pipeline                — SocioSeg infer/train pipelines, rewards
  datasets / configs / utils
"""

__version__ = "0.1.0"
