"""XLA trace capture + per-op summary tables.

Deepens the tracing/profiling subsystem (SURVEY §5: the reference exposes
torch.profiler tensorboard traces via `local_profiler`,
roll/utils/context_managers.py:44-78, and leaves analysis to the TB UI).
Here the trace is parsed directly: `trace_summary` runs a callable under
`jax.profiler.trace` and returns aggregated per-op device timings, so perf
triage works headless (no TensorBoard) — which is how TPU kernel work
actually gets debugged in CI.

The .xplane.pb protobuf is read via tensorflow's xplane schema when
available; otherwise `trace_summary` degrades to wall-clock only.
"""

from __future__ import annotations

import glob
import os
import tempfile
import time
from typing import Callable, Dict, List, Optional

import jax


def _find_xplanes(log_dir: str) -> List[str]:
    return sorted(glob.glob(os.path.join(
        log_dir, "**", "*.xplane.pb"), recursive=True))


def parse_xplane(path: str, device_only: bool = True) -> List[Dict]:
    """Aggregate XEvent durations per op name from one .xplane.pb.

    Returns [{"name", "total_us", "count", "avg_us"}] sorted by total time,
    from the device planes (names containing 'TPU'/'GPU'/'/device:') unless
    device_only=False. Requires the tensorflow xplane proto (present in this
    image); raises ImportError otherwise."""
    xplane_pb2 = None
    for mod in ("tensorflow.tsl.profiler.protobuf.xplane_pb2",
                "tensorflow.core.profiler.protobuf.xplane_pb2",
                "tsl.profiler.protobuf.xplane_pb2"):
        try:
            import importlib
            xplane_pb2 = importlib.import_module(mod)
            break
        except ImportError:
            continue
    if xplane_pb2 is None:
        raise ImportError("no xplane proto module available")

    space = xplane_pb2.XSpace()
    with open(path, "rb") as f:
        space.ParseFromString(f.read())
    dev_planes = [p for p in space.planes
                  if any(t in p.name for t in ("TPU", "GPU", "/device:"))]
    planes = dev_planes
    if not device_only or not dev_planes:
        # CPU runs put XLA ops on '/host:CPU'; fall back when no device plane
        planes = [p for p in space.planes if p.lines]
    agg: Dict[tuple, List[float]] = {}
    for plane in planes:
        metadata = {m.id: m.name for m in plane.event_metadata.values()}
        for line in plane.lines:
            for ev in line.events:
                name = metadata.get(ev.metadata_id, str(ev.metadata_id))
                dur_us = ev.duration_ps / 1e6
                tot_cnt = agg.setdefault((plane.name, name), [0.0, 0])
                tot_cnt[0] += dur_us
                tot_cnt[1] += 1
    rows = [{"plane": k[0], "name": k[1], "total_us": v[0], "count": v[1],
             "avg_us": v[0] / max(v[1], 1)} for k, v in agg.items()]
    rows.sort(key=lambda r: -r["total_us"])
    return rows


def trace_summary(fn: Callable, *args, log_dir: Optional[str] = None,
                  top: int = 25, device_only: bool = True, **kwargs) -> Dict:
    """Run fn(*args, **kwargs) under the JAX profiler and summarize.

    Returns {"wall_s", "result", "ops": top-N per-op rows, "trace_dir"}.
    The trace directory is kept (caller's log_dir) or a tempdir the caller
    may inspect/delete."""
    log_dir = log_dir or tempfile.mkdtemp(prefix="socio_trace_")
    t0 = time.perf_counter()
    with jax.profiler.trace(log_dir):
        result = fn(*args, **kwargs)
        jax.block_until_ready(result)
    wall = time.perf_counter() - t0
    ops: List[Dict] = []
    try:
        for path in _find_xplanes(log_dir):
            ops.extend(parse_xplane(path, device_only=device_only))
        ops.sort(key=lambda r: -r["total_us"])
    except ImportError:
        pass
    return {"wall_s": wall, "result": result, "ops": ops[:top],
            "trace_dir": log_dir}


def format_op_table(ops: List[Dict], limit: int = 25) -> str:
    lines = [f"{'total_ms':>10} {'count':>7} {'avg_us':>9}  op"]
    for r in ops[:limit]:
        lines.append(f"{r['total_us'] / 1e3:10.3f} {r['count']:7d} "
                     f"{r['avg_us']:9.1f}  {r['name']}")
    return "\n".join(lines)
