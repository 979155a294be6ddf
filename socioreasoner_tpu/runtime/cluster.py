"""Cluster: typed proxy over N role workers (single-controller).

Plays the reference's `roll/distributed/executor/cluster.py:29` role without Ray:
workers are in-process objects (host-bound roles may fan out over a thread
pool; device roles hold jitted functions over the shared mesh). Every
`@register`-ed worker method is bound onto the cluster with its dispatch/collect
semantics (ref cluster.py:137-189); `execute_all/execute_rank_zero` mirror
cluster.py:191-219. `worker_cls` strings resolve via safe_import_class
(ref utils/import_utils.py).
"""

from __future__ import annotations

import importlib
import inspect
from concurrent.futures import Future, ThreadPoolExecutor
from typing import Any, Callable, List, Optional, Type

from ..configs.worker_config import WorkerConfig
from .dispatch import Dispatch, collect_results, dispatch_args


def safe_import_class(path: str) -> Type:
    module_name, _, cls_name = path.rpartition(".")
    module = importlib.import_module(module_name)
    return getattr(module, cls_name)


class RankInfo:
    """Logical rank bookkeeping (ref worker.py:22-38). In the single-program
    runtime dp_size spans the workers; tp/pp/cp live inside the jit program."""

    def __init__(self, rank: int = 0, world_size: int = 1):
        self.rank = rank
        self.world_size = world_size
        self.dp_rank = rank
        self.dp_size = world_size
        self.tp_rank = 0
        self.tp_size = 1
        self.pp_rank = 0
        self.pp_size = 1
        self.cp_rank = 0
        self.cp_size = 1


class Cluster:
    def __init__(self, name: str, worker_cls, worker_config: WorkerConfig,
                 resource_manager=None, shared: Optional[dict] = None):
        if isinstance(worker_cls, str):
            worker_cls = safe_import_class(worker_cls)
        self.name = name
        self.worker_config = worker_config
        self.world_size = max(worker_config.world_size, 1)
        self.resource_manager = resource_manager
        self.shared = shared or {}
        self.workers = []
        for rank in range(self.world_size):
            kwargs = {"worker_config": worker_config}
            sig = inspect.signature(worker_cls.__init__)
            if "rank_info" in sig.parameters:
                kwargs["rank_info"] = RankInfo(rank, self.world_size)
            if "shared" in sig.parameters:
                kwargs["shared"] = self.shared
            if "cluster_name" in sig.parameters:
                kwargs["cluster_name"] = name
            self.workers.append(worker_cls(**kwargs))
        self._pool = ThreadPoolExecutor(max_workers=max(self.world_size, 1),
                                        thread_name_prefix=f"cluster-{name}")
        self._bind_registered_methods()

    # ------------------------------------------------------------------ binding
    def _bind_registered_methods(self):
        seen = set()
        for name, attr in inspect.getmembers(type(self.workers[0])):
            if not callable(attr) or not getattr(attr, "_registered", False):
                continue
            if name in seen:
                continue
            seen.add(name)
            self._bind(name, attr._dispatch_mode, attr._blocking)

    def _bind(self, method_name: str, mode: Dispatch, default_blocking: bool):
        def call(*args, blocking: bool = default_blocking, **kwargs):
            per_worker, ctx = dispatch_args(mode, self.world_size, args, kwargs)
            futures = [self._pool.submit(getattr(w, method_name), *a, **kw)
                       for w, (a, kw) in zip(self.workers, per_worker)]
            if not blocking:
                return _LazyResults(futures, mode, ctx)
            results = [f.result() for f in futures]
            return collect_results(mode, results, ctx)

        call.__name__ = method_name
        setattr(self, method_name, call)

    # ----------------------------------------------------------------- generic
    def execute_all(self, method: str, *args, **kwargs) -> List[Any]:
        futures = [self._pool.submit(getattr(w, method), *args, **kwargs)
                   for w in self.workers]
        return [f.result() for f in futures]

    def execute_rank_zero(self, method: str, *args, **kwargs) -> Any:
        return getattr(self.workers[0], method)(*args, **kwargs)

    def execute_all_async(self, method: str, *args, **kwargs) -> List[Future]:
        return [self._pool.submit(getattr(w, method), *args, **kwargs)
                for w in self.workers]

    def shutdown(self):
        self._pool.shutdown(wait=True)


class _LazyResults:
    """Future-backed result handle (the reference's non-blocking ObjectRef list)."""

    def __init__(self, futures: List[Future], mode: Dispatch, ctx=None):
        self.futures = futures
        self.mode = mode
        self.ctx = ctx

    def get(self):
        return collect_results(self.mode, [f.result() for f in self.futures], self.ctx)

    def done(self) -> bool:
        return all(f.done() for f in self.futures)
