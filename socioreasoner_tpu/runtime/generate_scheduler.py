"""Rollout schedulers.

Parity with the reference (`roll/distributed/scheduler/generate_scheduler.py`):

  GenerateScheduler — opt level 0: plain cluster batch-generate with
    num_return_sequences expansion (:101-138); opt level 1: request-level async
    streaming — per-prompt requests to the least-loaded DP worker, alive-check
    pings, ABORT of sibling requests once a prompt has enough samples
    (:180-333), final re-pad + reorder by prompt id.

  DynamicSamplingScheduler — dataset-pulling rollout with query/response
    filters (difficulty filtering) and flow control (:336-751): keeps spawning
    prompts until `rollout_batch_size` prompts pass the response filter.

In the single-controller runtime "DP workers" are cluster workers each owning a
DecodeEngine (or one engine shared); the abort semantics come from the engine.
"""

from __future__ import annotations

import itertools
import threading
import time
from typing import Any, Callable, Dict, List, Optional

import numpy as np

from ..protocol import BatchProto
from ..utils.functionals import GenerateRequestType, concatenate_input_and_output


class GlobalCounter:
    """Monotonic id source (ref :753)."""

    def __init__(self):
        self._count = itertools.count()
        self._lock = threading.Lock()

    def get_value(self) -> int:
        with self._lock:
            return next(self._count)


class GenerateScheduler:
    def __init__(self, cluster, pipeline_config=None):
        self.cluster = cluster
        self.pipeline_config = pipeline_config
        self.counter = GlobalCounter()
        self._lock = threading.Lock()

    # ---------------------------------------------------------------- level 0
    def generate(self, batch: BatchProto, generating_args,
                 opt_level: int = 0) -> BatchProto:
        if opt_level == 0:
            out = self.cluster.generate(batch, generating_args)
            return out
        return self.generate_requests(batch, generating_args)

    # ---------------------------------------------------------------- level 1
    def generate_requests(self, batch: BatchProto, generating_args,
                          alive_check_interval: float = 10.0) -> BatchProto:
        """Request-level streaming with abort-on-complete (ref :195-333)."""
        n = generating_args.num_return_sequences
        num_prompts = len(batch)
        needed = {i: n for i in range(num_prompts)}
        collected: Dict[int, List] = {i: [] for i in range(num_prompts)}
        inflight: Dict[Any, int] = {}
        done = threading.Event()
        lock = threading.Lock()

        workers = self.cluster.workers
        loads = [0] * len(workers)

        self.cluster.start_server()

        def report_response(out):
            """Per-request completion callback (ref report_response :301-333)."""
            with lock:
                prompt_id = inflight.pop(out.request_id, None)
                if prompt_id is None:
                    return
                loads[out.request_id[2]] -= 1
                if len(collected[prompt_id]) < n:
                    collected[prompt_id].append(out)
                if len(collected[prompt_id]) >= n:
                    # abort sibling requests still running for this prompt
                    for rid, pid in list(inflight.items()):
                        if pid == prompt_id:
                            workers[rid[2]].add_request(
                                GenerateRequestType.ABORT, {"request_id": rid})
                            inflight.pop(rid, None)
                            loads[rid[2]] -= 1
                if all(len(v) >= n for v in collected.values()):
                    done.set()

        pad = None
        from ..generation.sampling import SamplingParams
        sp = SamplingParams.from_generating_args(generating_args)
        embeds = batch.meta.get("image_embeds_list")
        for i in range(num_prompts):
            ids = np.asarray(batch.batch["input_ids"][i])
            attn = np.asarray(batch.batch["attention_mask"][i])
            valid = attn == 1
            prompt_ids = ids[valid].tolist()
            pos = None
            if "position_ids" in batch.batch:
                pos = np.asarray(batch.batch["position_ids"][i])[:, valid]
            for j in range(n):
                # least-loaded worker (ref get_available_dp_rank :180)
                with lock:
                    w = int(np.argmin(loads))
                    loads[w] += 1
                rid = (i, j, w)
                with lock:
                    inflight[rid] = i
                workers[w].add_request(GenerateRequestType.ADD, {
                    "request_id": rid, "prompt_ids": prompt_ids,
                    "sampling": sp, "position_ids": pos,
                    "image_embeds": None if embeds is None else embeds[i],
                    "callback": report_response})

        last_ping = time.time()
        while not done.wait(timeout=0.05):
            if time.time() - last_ping > alive_check_interval:
                for w in workers:
                    w.add_request(GenerateRequestType.ALIVE_CHECK, None)
                last_ping = time.time()
        self.cluster.stop_server()

        # assemble right-padded outputs ordered by (prompt, sample)
        pad_id = generating_args.extra_fields.get("pad_token_id", 0) \
            if hasattr(generating_args, "extra_fields") else 0
        P = np.asarray(batch.batch["input_ids"]).shape[1]
        max_out = max((len(o.output_ids) for outs in collected.values()
                       for o in outs), default=0)
        result = np.full((num_prompts * n, P + max_out), pad_id, np.int64)
        for i in range(num_prompts):
            outs = sorted(collected[i], key=lambda o: o.request_id[1])
            for j, o in enumerate(outs[:n]):
                row = i * n + j
                result[row, :P] = np.asarray(batch.batch["input_ids"][i])
                result[row, P:P + len(o.output_ids)] = o.output_ids
        return BatchProto.from_dict(tensors={"output": result})


class DynamicSamplingScheduler:
    """Dataset-pulling rollout with filters + flow control (ref :336-751).

    Pulls prompts from `dataset_iter`, generates n samples each, applies
    `query_filter(sample_row)` before generation and
    `response_filter(row, outputs)` after; keeps pulling until
    `target_prompts` pass. Used by the generic RLVRPipeline for difficulty
    filtering / dynamic batch composition.
    """

    def __init__(self, cluster, collate_fn: Callable,
                 query_filter: Optional[Callable] = None,
                 response_filter: Optional[Callable] = None,
                 max_additional_prompts: int = 64):
        self.cluster = cluster
        self.collate_fn = collate_fn
        self.query_filter = query_filter or (lambda row: True)
        self.response_filter = response_filter or (lambda row, outs: True)
        self.max_additional_prompts = max_additional_prompts

    def get_batch(self, dataset_iter, target_prompts: int, generating_args
                  ) -> BatchProto:
        accepted: List[BatchProto] = []
        attempts = 0
        budget = target_prompts + self.max_additional_prompts
        while len(accepted) < target_prompts and attempts < budget:
            try:
                row = next(dataset_iter)
            except StopIteration:
                break
            attempts += 1
            if not self.query_filter(row):
                continue
            batch = self.collate_fn([row])
            out = self.cluster.generate(batch, generating_args)
            output = out.batch["output"] if isinstance(out, BatchProto) else out
            if not self.response_filter(row, output):
                continue
            batch.union(BatchProto.from_dict(tensors={"output": np.asarray(output)}))
            accepted.append(batch)
        if not accepted:
            return BatchProto()
        return BatchProto.concat(accepted)
