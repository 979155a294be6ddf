"""Device resource bookkeeping: device_mapping → mesh slices per role.

Plays `roll/distributed/scheduler/resource_manager.py:11-144`: the reference
builds Ray placement groups and pins multiple roles onto the same GPUs. Here
roles get `jax.sharding.Mesh` slices of the global device list; overlapping
device_mappings are the single-program co-located default (roles share the
resident weights), disjoint mappings give disaggregated train/infer meshes
(weight flow via distributed/transfer.py).
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh

from ..configs.worker_config import WorkerConfig
from ..parallel.mesh import make_mesh


class ResourceManager:
    def __init__(self, devices: Optional[Sequence] = None):
        self.devices = list(devices if devices is not None else jax.devices())
        self.role_meshes: Dict[str, Mesh] = {}

    @property
    def num_devices(self) -> int:
        return len(self.devices)

    def allocate_mesh(self, role: str, worker_config: WorkerConfig,
                      tp: int = 1, sp: int = 1) -> Mesh:
        """Build the role's mesh from its device_mapping (reference semantics:
        `device_mapping: list(range(0,4))` selects global device ranks)."""
        mapping = worker_config.resolved_device_mapping()
        if mapping is None:
            devices = self.devices
        else:
            missing = [i for i in mapping if i >= len(self.devices)]
            if missing:
                raise ValueError(
                    f"role {role}: device_mapping {mapping} exceeds available "
                    f"{len(self.devices)} devices")
            devices = [self.devices[i] for i in mapping]
        strat_cfg = worker_config.strategy_args.config
        tp = int(strat_cfg.get("tensor_model_parallel_size", tp))
        cp = int(strat_cfg.get("context_parallel_size", sp))
        n = len(devices)
        assert n % (tp * cp) == 0, f"{n} devices not divisible by tp*cp={tp * cp}"
        fsdp = n // (tp * cp)
        mesh = make_mesh(dp=1, fsdp=fsdp, tp=tp, sp=cp, devices=devices)
        self.role_meshes[role] = mesh
        return mesh

    def colocated(self, role_a: str, role_b: str) -> bool:
        """True if two roles share any device (→ ParamStore pointer-swap sync)."""
        a = {d.id for d in np.array(self.role_meshes[role_a].devices).reshape(-1)}
        b = {d.id for d in np.array(self.role_meshes[role_b].devices).reshape(-1)}
        return bool(a & b)
