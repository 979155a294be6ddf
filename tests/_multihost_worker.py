"""Worker for the multihost smoke test: joins a 2-process jax.distributed
CPU cluster via the runtime's launcher contract (RANK/WORLD_SIZE/MASTER_ADDR/
MASTER_PORT env — ref roll/distributed/scheduler/initialize.py:26-51) and
exercises host-data broadcast + barrier + a cross-process device collective."""

import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")

from socioreasoner_tpu.runtime.initialize import (get_driver_rank, init,
                                                  is_driver)


def main():
    init(timeout_s=120)
    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    rank = get_driver_rank()
    assert jax.process_count() == 2, jax.process_count()
    assert jax.process_index() == rank
    assert (rank == 0) == is_driver()

    from socioreasoner_tpu.utils.collective import barrier, broadcast_host_data
    # arbitrary object; non-src passes its own (ignored) value
    payload = {"step": 7, "blob": [1, 2, 3], "s": "hello"} if rank == 0 else None
    out = broadcast_host_data(payload, src=0)
    assert out == {"step": 7, "blob": [1, 2, 3], "s": "hello"}, out
    barrier("smoke")

    # cross-process device collective: global sum over a 2-process mesh
    from jax.experimental import multihost_utils
    devices = np.array(jax.devices()[:2])
    mesh = Mesh(devices, ("x",))
    local = np.array([float(rank + 1)], np.float32)
    g = multihost_utils.host_local_array_to_global_array(local, mesh, P("x"))
    s = jax.jit(lambda a: jnp.sum(a),
                out_shardings=NamedSharding(mesh, P()))(g)
    local_s = multihost_utils.global_array_to_host_local_array(s, mesh, P())
    total = float(np.asarray(local_s))
    assert total == 3.0, total
    print(f"rank {rank} OK")


if __name__ == "__main__":
    sys.exit(main())
