"""Device mesh construction and canonical axis names.

The reference implements DP/TP/PP/CP/EP as torch process groups
(mcore_adapter/initialize.py:37-70, SURVEY.md §2.9). TPU-native, parallelism is a
`jax.sharding.Mesh` + named shardings; XLA inserts the collectives over ICI.

Canonical axes:
  dp    — data parallel (batch dim)
  fsdp  — parameter/optimizer sharding (zero-style; batch also sharded here)
  tp    — tensor/model parallel (heads, mlp hidden, vocab)
  sp    — sequence/context parallel (ring attention axis; usually folded into tp)
  ep    — expert parallel (MoE experts; folded into tp for dense models)

Batch axes shard over ("dp","fsdp"); model-weight axes over "tp".
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXES = ("dp", "fsdp")
MODEL_AXIS = "tp"
SEQ_AXIS = "sp"


@dataclass(frozen=True)
class MeshConfig:
    dp: int = 1
    fsdp: int = 1
    tp: int = 1
    sp: int = 1
    ep: int = 1  # folded into tp at mesh level; kept for config parity

    @property
    def world_size(self) -> int:
        return self.dp * self.fsdp * self.tp * self.sp


def make_mesh(dp: int = 1, fsdp: int = 1, tp: int = 1, sp: int = 1,
              pp: int = 1,
              devices: Optional[Sequence[jax.Device]] = None) -> Mesh:
    """pp (pipeline stages) sits outside sp/tp so a stage's tensor-parallel
    group stays on adjacent devices (ICI) while activations stream between
    stages (ref pipeline_model_parallel_size, training_args.py:20)."""
    devices = list(devices if devices is not None else jax.devices())
    need = dp * fsdp * tp * sp * pp
    if len(devices) < need:
        raise ValueError(f"need {need} devices, have {len(devices)}")
    arr = np.array(devices[:need]).reshape(dp, fsdp, pp, sp, tp)
    return Mesh(arr, axis_names=("dp", "fsdp", "pp", "sp", "tp"))


def auto_mesh(n_devices: Optional[int] = None, tp: int = 1, sp: int = 1) -> Mesh:
    """Fill remaining devices into fsdp (preferred over dp for memory savings)."""
    n = n_devices if n_devices is not None else len(jax.devices())
    assert n % (tp * sp) == 0, f"{n} devices not divisible by tp*sp={tp * sp}"
    return make_mesh(dp=1, fsdp=n // (tp * sp), tp=tp, sp=sp)


def batch_spec(extra: Tuple = ()) -> P:
    """Sharding for batch-leading arrays: batch over (dp, fsdp), rest replicated."""
    return P(DATA_AXES, *extra)


def batch_sharding(mesh: Mesh, extra: Tuple = ()) -> NamedSharding:
    return NamedSharding(mesh, batch_spec(extra))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def local_mesh_1d() -> Mesh:
    """Single-axis mesh over all local devices (bench/single-chip paths)."""
    return Mesh(np.array(jax.devices()), axis_names=("dp",))
