"""Dispatch/collect modes for cluster method calls.

Behavior parity with the reference's decorator layer
(`roll/distributed/scheduler/decorator.py:24-285`), re-grounded for a
single-controller, single-JAX-program runtime: "model-parallel ranks" collapse
into one logical worker per data-parallel shard (GSPMD owns TP/PP/CP inside the
program), so DP_MP_COMPUTE = chunk the batch over workers and concat results,
and the TP/PP-aware collect rules (tp0/cp0/last-pp only) are satisfied by
construction.

Modes:
  ONE_TO_ALL        — same args to every worker, list of results
  ONE_TO_ALL_ONE    — same args to every worker, return the first result
  ALL_TO_ALL        — pre-chunked list of args, one per worker
  DP_MP_COMPUTE     — chunk a BatchProto over workers, concat result protos
  DP_MP_DISPATCH_FIRST — whole batch to worker 0 (in-band broadcast is a no-op
                      in the single-program runtime)
"""

from __future__ import annotations

import enum
import functools
from typing import Any, Callable, List, Optional

from ..protocol import BatchProto


class Dispatch(enum.Enum):
    ONE_TO_ALL = enum.auto()
    ONE_TO_ALL_ONE = enum.auto()
    ALL_TO_ALL = enum.auto()
    DP_MP_COMPUTE = enum.auto()
    DP_MP_DISPATCH_FIRST = enum.auto()


def register(dispatch_mode: Dispatch = Dispatch.ONE_TO_ALL, blocking: bool = True,
             clear_cache: bool = False):
    """Mark a worker method for cluster binding (ref decorator.py:257-285)."""

    def decorator(func: Callable) -> Callable:
        @functools.wraps(func)
        def wrapper(*args, **kwargs):
            return func(*args, **kwargs)

        wrapper._dispatch_mode = dispatch_mode
        wrapper._blocking = blocking
        wrapper._registered = True
        return wrapper

    return decorator


def dispatch_args(mode: Dispatch, n_workers: int, args: tuple, kwargs: dict
                  ) -> tuple:
    """Split call args into per-worker (args, kwargs). Returns (calls, ctx)
    where ctx carries collect-side state (pad size for DP_MP_COMPUTE)."""
    if mode in (Dispatch.ONE_TO_ALL, Dispatch.ONE_TO_ALL_ONE):
        return [(args, kwargs)] * n_workers, None
    if mode == Dispatch.ALL_TO_ALL:
        split = []
        for i in range(n_workers):
            a = tuple(x[i] if isinstance(x, (list, tuple)) and len(x) == n_workers else x
                      for x in args)
            split.append((a, kwargs))
        return split, None
    if mode == Dispatch.DP_MP_COMPUTE:
        proto = _find_proto(args, kwargs)
        if proto is None:
            return [(args, kwargs)] * n_workers, None
        padded = proto.pad_to_divisor(n_workers)
        pad = padded.meta.get("_pad_size", 0)
        chunks = padded.chunk(n_workers)
        return ([(_replace_proto(args, c), _replace_proto_kwargs(kwargs, c))
                 for c in chunks], {"pad": pad})
    if mode == Dispatch.DP_MP_DISPATCH_FIRST:
        return [(args, kwargs)], None  # only worker 0 runs
    raise NotImplementedError(mode)


def collect_results(mode: Dispatch, results: List[Any], ctx=None) -> Any:
    if mode == Dispatch.ONE_TO_ALL_ONE or mode == Dispatch.DP_MP_DISPATCH_FIRST:
        return results[0]
    if mode == Dispatch.DP_MP_COMPUTE:
        if all(isinstance(r, BatchProto) for r in results):
            out = BatchProto.concat(results)
            pad = (ctx or {}).get("pad", 0)
            if pad and len(out) > pad:
                out = out.slice(0, len(out) - pad)
            return out
        return results
    return results


def _find_proto(args: tuple, kwargs: dict) -> Optional[BatchProto]:
    for x in list(args) + list(kwargs.values()):
        if isinstance(x, BatchProto):
            return x
    return None


def _replace_proto(args: tuple, chunk: BatchProto) -> tuple:
    replaced = False
    out = []
    for x in args:
        if isinstance(x, BatchProto) and not replaced:
            out.append(chunk)
            replaced = True
        else:
            out.append(x)
    return tuple(out)


def _replace_proto_kwargs(kwargs: dict, chunk: BatchProto) -> dict:
    out = {}
    replaced = False
    for k, v in kwargs.items():
        if isinstance(v, BatchProto) and not replaced:
            out[k] = chunk
            replaced = True
        else:
            out[k] = v
    return out
