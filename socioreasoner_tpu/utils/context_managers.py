"""Execution context managers: profiling + timing around worker calls.

Plays the reference's `state_offload_manger` + `local_profiler`
(roll/utils/context_managers.py:44-205) on TPU terms: there is no offload (roles
share resident weights) — what remains is the per-call observability: wall time,
device memory stats, and an env-gated JAX trace (PROFILER_TIMELINE=1 →
jax.profiler trace viewable in TensorBoard/XProf, replacing torch.profiler;
PROFILER_MEMORY=1 → device memory profile snapshot, replacing CUDA snapshots).
"""

from __future__ import annotations

import contextlib
import os
import time
from typing import Dict, Iterator, Optional


def device_memory_stats() -> Dict[str, float]:
    """Per-device HBM usage (bytes) where the backend exposes it."""
    import jax
    stats = {}
    for i, d in enumerate(jax.local_devices()):
        try:
            s = d.memory_stats()
        except Exception:
            s = None
        if s:
            stats[f"device{i}/bytes_in_use"] = float(s.get("bytes_in_use", 0))
            stats[f"device{i}/peak_bytes_in_use"] = float(s.get("peak_bytes_in_use", 0))
    return stats


@contextlib.contextmanager
def local_profiler(name: str, log_dir: Optional[str] = None) -> Iterator[None]:
    """Env-gated JAX profiler trace (ref local_profiler :44-78)."""
    timeline = os.environ.get("PROFILER_TIMELINE", "0") == "1"
    memory = os.environ.get("PROFILER_MEMORY", "0") == "1"
    log_dir = log_dir or os.environ.get("PROFILER_OUTPUT_DIR", "./output/profiler")
    if timeline:
        import jax
        os.makedirs(log_dir, exist_ok=True)
        jax.profiler.start_trace(os.path.join(log_dir, name))
    try:
        yield
    finally:
        if timeline:
            import jax
            jax.profiler.stop_trace()
        if memory:
            import jax
            os.makedirs(log_dir, exist_ok=True)
            jax.profiler.save_device_memory_profile(
                os.path.join(log_dir, f"{name}_memory.prof"))


@contextlib.contextmanager
def state_timing_manager(metrics: Dict, name: str,
                         profile: bool = False) -> Iterator[None]:
    """Wraps a worker call with timing + memory metrics (ref
    state_offload_manger :99-205, minus the offload)."""
    start = time.perf_counter()
    ctx = local_profiler(name) if profile else contextlib.nullcontext()
    with ctx:
        yield
    elapsed = time.perf_counter() - start
    metrics[f"time/{name}/total"] = elapsed
    for k, v in device_memory_stats().items():
        metrics[f"memory/{name}/{k}"] = v


@contextlib.contextmanager
def disable_gradients(*args):
    """API parity with ref disable_gradients (:206); JAX grads are explicit so
    this is a documentation no-op."""
    yield
