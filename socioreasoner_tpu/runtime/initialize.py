"""Cluster bring-up (ref roll/distributed/scheduler/initialize.py:26-83).

The reference launches a Ray head + joins nodes and exits non-rank-0 drivers.
TPU-native: `jax.distributed.initialize` joins the pod (coordinator from env
RANK/WORLD_SIZE/MASTER_ADDR/PORT — same launcher contract as the reference's
driver_utils); every host runs the same SPMD program, and host-side driver logic
runs on process 0 only (`is_driver()`).
"""

from __future__ import annotations

import logging
import os
from typing import Optional

logger = logging.getLogger(__name__)


def get_driver_rank() -> int:
    return int(os.environ.get("RANK", "0"))


def get_driver_world_size() -> int:
    return int(os.environ.get("WORLD_SIZE", "1"))


def get_master_addr_port() -> str:
    addr = os.environ.get("MASTER_ADDR", "127.0.0.1")
    port = os.environ.get("MASTER_PORT", "8476")
    return f"{addr}:{port}"


def init(timeout_s: int = 300) -> None:
    """Join the multi-host mesh (no-op single host)."""
    world = get_driver_world_size()
    if world <= 1:
        logger.info("single-host run; skipping jax.distributed.initialize")
        return
    import jax
    jax.distributed.initialize(
        coordinator_address=get_master_addr_port(),
        num_processes=world,
        process_id=get_driver_rank(),
        initialization_timeout=timeout_s)
    logger.info("joined mesh: process %d/%d, %d local / %d global devices",
                get_driver_rank(), world,
                jax.local_device_count(), jax.device_count())


def is_driver() -> bool:
    return get_driver_rank() == 0
