"""DecodeEngine — TPU-native continuous-batching autoregressive decoder.

Replaces vLLM (ref §2.10: paged-KV continuous batching, `roll/distributed/
strategy/vllm_strategy.py`). TPU-first design:

  * Slot-based static KV cache (layers, S slots, Lmax, Hkv, D) — static shapes,
    no dynamic paging; slot admission/release is host bookkeeping. (A Pallas
    paged-attention kernel can swap in under the same interface later.)
  * Prefill at bucketed prompt lengths (powers of two) — one compiled program
    per bucket, writes the slot's KV rows and samples the first token.
  * Chunked device decode loop — `lax.while_loop` generates up to
    `decode_chunk` tokens for ALL active slots per host round-trip (the
    host↔device latency amortization vLLM gets from its C++ engine loop),
    early-exiting once every slot hit a stop token or its budget.
  * Per-slot sampling params as arrays → mixed greedy/stochastic in one batch.
  * M-RoPE: text continuation positions are `next_pos` scalars broadcast to the
    3 axes (t==h==w after the prompt; ref functionals.py:806-860 semantics).

Request lifecycle mirrors the reference server contract (ADD/ABORT/STOP/
ALIVE_CHECK — functionals.py:761, base_worker.py:343-381) via server.py.
"""

from __future__ import annotations

import dataclasses
import time
import weakref
from typing import Any, Callable, Dict, List, Optional, Tuple

import numpy as np

import jax
import jax.numpy as jnp

from ..models.qwen2_5_vl import model as qmodel
from ..models.qwen2_5_vl.config import Qwen25VLConfig
from ..models.qwen2_5_vl.rope import make_inv_freq, mrope_channel_axis, mrope_cos_sin
from .sampling import SamplingParams, sample_tokens


_MISS = object()                    # sentinel: prompt not yet seen in a group


def _bucket(n: int, buckets: Tuple[int, ...]) -> int:
    for b in buckets:
        if n <= b:
            return b
    raise ValueError(f"prompt length {n} exceeds max bucket {buckets[-1]}")


@dataclasses.dataclass
class Request:
    request_id: Any
    prompt_ids: List[int]
    sampling: SamplingParams
    image_embeds: Optional[np.ndarray] = None
    position_ids: Optional[np.ndarray] = None   # (3, P) M-RoPE prompt positions
    callback: Optional[Callable] = None
    meta: Optional[Dict] = None
    # runtime
    slot: int = -1
    output_ids: List[int] = dataclasses.field(default_factory=list)
    finished: bool = False
    aborted: bool = False


@dataclasses.dataclass
class EngineOutput:
    request_id: Any
    prompt_ids: List[int]
    output_ids: List[int]
    finish_reason: str                  # "stop" | "length" | "abort" | "error"
    meta: Optional[Dict] = None


@dataclasses.dataclass
class _PrefixEntry:
    """A forkable prompt prefix resident in some slot's KV cache.

    Valid while `epoch` matches the slot's assignment epoch: decode only
    writes cache positions >= P, and a released slot's rows survive until the
    slot is re-assigned, so an entry can outlive its request. `embeds` is a
    WEAK ref: if the pipeline drops its ViT output, the entry dies with it
    (a dead ref can't fork — and a strong ref would pin ~6 MB of HBM per
    entry long after the request finished). While the referent lives, the
    identity comparison is sound (no id() reuse)."""
    slot: int
    epoch: int
    P: int                              # prompt length (cache rows 0..P-1)
    next_pos: int                       # M-RoPE position AFTER the prompt
    last_token: int                     # prompt_ids[-1]
    embeds: Any                         # weakref.ref | None
    position_ids: Any


class DecodeEngine:
    def __init__(self, config: Qwen25VLConfig, params, *, max_slots: int = 8,
                 max_len: int = 8192, decode_chunk: int = 16,
                 decode_inner: int = 0,
                 prefill_buckets: Tuple[int, ...] = (128, 256, 512, 1024, 2048, 4096),
                 # total image rows per batched prefill (VLM requests carry
                 # ~1.5k rows each — the larger buckets let several share one
                 # prefill call; unused sizes never compile)
                 image_buckets: Tuple[int, ...] = (0, 512, 1024, 2048, 4096,
                                                   8192, 16384),
                 cache_dtype=jnp.bfloat16, kv_quant: Optional[str] = None,
                 weight_quant: Optional[str] = None,
                 max_prefill_batch: Optional[int] = None, seed: int = 0,
                 device=None, sampler_exact: bool = False,
                 prefill_batch_sizes: Optional[Tuple[int, ...]] = None,
                 mesh=None, tp_axis: str = "tp", prefix_fork: bool = True,
                 act_quant: Optional[str] = None):
        self.config = config
        if weight_quant not in (None, "int8", "int4"):
            raise ValueError(f"weight_quant must be None, 'int8' or 'int4', "
                             f"got {weight_quant!r}")
        if weight_quant and config.text.n_experts:
            raise NotImplementedError("weight_quant with MoE expert stacks")
        self.weight_quant = weight_quant
        # w8a8 prefill (ops/quant.py matmul_w8a8): int8×int8 MXU matmuls on
        # the compute-bound multi-token pass — v5e int8 peak is 2× bf16.
        # Decode keeps w8a16 (weight-HBM-bound). Requires int8 weights.
        if act_quant not in (None, "int8"):
            raise ValueError(f"act_quant must be None or 'int8', "
                             f"got {act_quant!r}")
        if act_quant and weight_quant != "int8":
            raise ValueError("act_quant='int8' requires weight_quant='int8' "
                             "(w8a8 runs on the int8 weight tree)")
        self.act_quant = bool(act_quant)
        # device pinning for DP decode replicas (ref vllm dp = world_size,
        # vllm_strategy.py:98-99): committed params pull every jit call —
        # caches, slot state, sampling — onto this replica's chip
        self.device = device
        # exact lax.top_k candidate selection for parity/eval runs (ADVICE
        # r2: approx_max_k can drop a high-probability rank-2 candidate that
        # shares the max's reduction bin; greedy is exact either way)
        self.sampler_exact = sampler_exact
        # TENSOR-PARALLEL engine (SURVEY §2.10 item 3, "ICI-sharded paged KV
        # cache"): weights get the Megatron column/row layout over the mesh's
        # tp axis (parallel/sharding.py), the KV caches shard their Hkv dim,
        # and the pallas attention kernels run per-shard on local heads via
        # shard_map (ops/*_tp wrappers) — the per-layer o_proj psum is the
        # only cross-chip collective. Mutually exclusive with `device`
        # (single-chip DP replica pinning).
        if mesh is not None and device is not None:
            raise ValueError("pass either mesh (TP engine) or device "
                             "(DP replica pin), not both")
        if mesh is not None and mesh.shape.get(tp_axis, 1) > 1:
            t = config.text
            T = mesh.shape[tp_axis]
            if t.num_attention_heads % T or t.num_key_value_heads % T:
                raise ValueError(
                    f"tp={T} must divide heads ({t.num_attention_heads}) and "
                    f"kv heads ({t.num_key_value_heads})")
            self.tp = (mesh, tp_axis)
        else:
            self.tp = None
        self.mesh = mesh
        if mesh is not None:
            from ..parallel.sharding import shard_params
            params = shard_params(params, mesh)
        elif device is not None:
            params = jax.device_put(params, device)
        self.params = params
        # Quantization layouts (ops/quant.py):
        #  * HYBRID (default with weight_quant): decode runs weight-only
        #    per-channel int8 — measured 12.9 → 7.0 ms/step at 24 slots on
        #    v5e (weight-HBM traffic is the decode bound) — while prefill
        #    keeps the bf16 params. BOTH copies stay resident (~9.3 GB at
        #    3B), which caps slot count (tiles16+int8w OOMed on v5e).
        #  * SINGLE-COPY: pass a PRE-quantized tree (quantize_decode_params
        #    with inplace=True before construction) — detected here; prefill
        #    and decode then share the one quantized tree (w8a16 prefill:
        #    the dequant fuses into the MXU operand load) and no bf16 copy
        #    exists anywhere.
        from ..ops.quant import params_prequantized
        self.params_q = None
        if params_prequantized(params):
            if config.text.n_experts:
                raise NotImplementedError(
                    "pre-quantized params with MoE expert stacks")
            pass                      # single tree serves prefill AND decode
        elif weight_quant:
            from ..ops.quant import quantize_decode_params
            self.params_q = quantize_decode_params(params, mode=weight_quant)
        self.S = max_slots
        self.Lmax = max_len
        self.decode_chunk = decode_chunk
        # decode_inner > 0 splits a chunk into ceil(chunk/inner)-dispatch
        # groups of inner-iteration while_loops with ONE readback at the end:
        # chunk-64 readback economics (the blocking download costs ~32 ms
        # through the relayed link) with shorter loop executables. Shipped as
        # the int8-KV workaround: ≥~32-iteration quantized-cache loops fault
        # the v5e worker (docs/BENCH_MATRIX_r5.md wave 13); early-exit
        # semantics are preserved exactly by threading `running` through the
        # device state across the group.
        if decode_inner and decode_chunk % decode_inner:
            # the Lalloc slack is sized by decode_chunk, and each inner size
            # is a separate compiled executable — keep the group exact
            raise ValueError(f"decode_chunk={decode_chunk} must be a "
                             f"multiple of decode_inner={decode_inner}")
        self.decode_inner = decode_inner
        self.prefill_buckets = tuple(b for b in prefill_buckets if b <= max_len)
        self.image_buckets = image_buckets
        # admission batch sizes (pad-to bucket): bounds prefill compile count.
        # max_prefill_batch caps the group (prefill activation + local-cache
        # memory scales with batch × bucket — at long prompt buckets an
        # uncapped group can transiently exceed HBM)
        cap = max_prefill_batch or max_slots
        if prefill_batch_sizes:
            # explicit set — pin to ONE size for streaming workloads: with
            # continuous admission the group size at each step() is
            # nondeterministic, and every novel (batch, prompt-bucket,
            # image-bucket) combo compiles a fresh prefill graph (minutes via
            # the remote compiler). A single padded batch size collapses the
            # combo space; partial groups waste at most (Bp-1)/Bp of one
            # prefill's FLOPs (~0.2 s at B2×4096 on v5e).
            self._prefill_batch_buckets = tuple(sorted(prefill_batch_sizes))
        else:
            self._prefill_batch_buckets = tuple(sorted(
                {b for b in (1, 2, 4, 8, 16, 32) if b < min(max_slots, cap)}
                | {min(max_slots, cap)}))
        t = config.text
        L, Hkv, D = t.num_hidden_layers, t.num_key_value_heads, t.head_dim

        # decode_chunk slack: a chunk may overshoot max_len before the host
        # notices; keep scatters in bounds. Rounded up to 256 so the paged
        # kernel's DMA blocks never cross the cache end (ops/decode_attention).
        self.Lalloc = -(-(max_len + decode_chunk) // 256) * 256
        if kv_quant not in (None, "int8"):
            raise ValueError(f"kv_quant must be None or 'int8', got {kv_quant!r}")
        self.kv_quant = kv_quant
        if kv_quant == "int8":
            # int8 KV + per-token-per-head scales: halves decode HBM traffic
            # and doubles cache capacity (the vLLM quantized-KV counterpart)
            self.caches = {
                "k": jnp.zeros((L, self.S, self.Lalloc, Hkv, D), jnp.int8),
                "v": jnp.zeros((L, self.S, self.Lalloc, Hkv, D), jnp.int8),
                "k_scale": jnp.zeros((L, self.S, Hkv, self.Lalloc), jnp.float32),
                "v_scale": jnp.zeros((L, self.S, Hkv, self.Lalloc), jnp.float32),
            }
        else:
            self.caches = {
                "k": jnp.zeros((L, self.S, self.Lalloc, Hkv, D), cache_dtype),
                "v": jnp.zeros((L, self.S, self.Lalloc, Hkv, D), cache_dtype),
            }
        if mesh is not None:
            self.caches = jax.device_put(self.caches, self._cache_shardings())
        elif device is not None:
            self.caches = jax.device_put(self.caches, device)
        self.lengths = np.zeros(self.S, np.int32)         # host copy
        self.next_pos = np.zeros(self.S, np.int32)        # next M-RoPE position value
        self.last_token = np.zeros(self.S, np.int32)
        self.free_slots = list(range(self.S))
        self.slot_req: Dict[int, Request] = {}
        self.steps_executed = 0           # diagnostic: total decode steps run
        # wall-time split diagnostics (prefill blocks on the first-token
        # readback, decode on the chunk readback, so step()-side wall timing
        # is an honest device-time split; SOCIO_TRACE surfaces these)
        self.admit_time = 0.0             # s spent admitting (incl. prefill)
        self.decode_time = 0.0            # s spent in decode chunks
        self.prefill_device_time = 0.0    # s inside the jitted prefill call
        self.prefill_hist: Dict[Tuple[int, int, int], int] = {}
        # prefix forking: identical prompts (GRPO n-sampling submits the same
        # prompt n times, ref generate_scheduler per-prompt fan-out) prefill
        # ONCE; siblings device-copy the leader's KV rows and draw their first
        # token in the next decode step (exact: it rewrites an identical KV
        # entry at P-1 and samples from the same last-position logits)
        self.prefix_fork = prefix_fork
        self._slot_epoch = np.zeros(self.S, np.int64)
        self._prefix_registry: Dict[tuple, _PrefixEntry] = {}
        self._jit_fork = {}
        self.prefill_rows = 0             # diagnostic: prompts actually prefilled
        self.forked_requests = 0          # diagnostic: prompts forked instead

        self.waiting: List[Request] = []
        self._rng = jax.random.key(seed)
        self._jit_prefill = {}
        self._jit_decode = jax.jit(self._decode_loop, static_argnames=("n_steps",),
                                   donate_argnums=(1, 2))
        self._embed_dtype = params["embed"].dtype
        # device-resident decode state (slot scalars + sampling params + PRNG
        # key), refreshed only when admission/release changes the slot set:
        # re-uploading ~8 small arrays every chunk cost ~1 ms/step through
        # the host link at decode_chunk=64
        self._dev_state = None
        self._dev_dirty = True

    def _cache_shardings(self):
        """KV caches shard their Hkv dim over the tp axis (matching the
        contiguous-GQA-block head split the kernels and the column-parallel
        k_w/v_w produce); everything else about the cache is replicated."""
        from jax.sharding import NamedSharding, PartitionSpec as P
        ax = self.tp[1] if self.tp is not None else None
        out = {}
        for name, arr in self.caches.items():
            if name in ("k", "v"):        # (L, S, Lalloc, Hkv, D)
                spec = P(None, None, None, ax, None)
            else:                         # scales (L, S, Hkv, Lalloc)
                spec = P(None, None, ax, None)
            out[name] = NamedSharding(self.mesh, spec)
        return out

    # ------------------------------------------------------------------ public
    def set_params(self, params):
        """Swap in new weights (train→infer sync); re-derives the quantized
        decode copy when weight_quant is enabled. Caller must drain the engine
        first (see JaxDecodeStrategy.model_update)."""
        if self.mesh is not None:
            from ..parallel.sharding import shard_params
            params = shard_params(params, self.mesh)
        elif self.device is not None:
            params = jax.device_put(params, self.device)
        self.params = params
        # prefixes cached under the OLD weights must never fork under the new
        # ones (the drained slots' KV rows are stale the moment weights swap)
        self._prefix_registry.clear()
        from ..ops.quant import params_prequantized
        if params_prequantized(params):
            self.params_q = None      # single-copy: one quantized tree
        elif self.weight_quant:
            from ..ops.quant import quantize_decode_params
            self.params_q = quantize_decode_params(params, mode=self.weight_quant)

    def add_request(self, request_id, prompt_ids, sampling: SamplingParams,
                    image_embeds: Optional[np.ndarray] = None,
                    position_ids: Optional[np.ndarray] = None,
                    callback: Optional[Callable] = None,
                    meta: Optional[Dict] = None):
        self.waiting.append(Request(
            request_id=request_id, prompt_ids=list(map(int, prompt_ids)),
            sampling=sampling, image_embeds=image_embeds,
            position_ids=position_ids, callback=callback, meta=meta))

    def abort_request(self, request_id) -> bool:
        for r in self.waiting:
            if r.request_id == request_id:
                r.aborted = True
                self.waiting.remove(r)
                return True
        for slot, r in list(self.slot_req.items()):
            if r.request_id == request_id:
                r.aborted = True
                self._release(slot)
                return True
        return False

    def has_work(self) -> bool:
        return bool(self.waiting or self.slot_req)

    def num_waiting(self) -> int:
        return len(self.waiting)

    def num_running(self) -> int:
        return len(self.slot_req)

    def step(self) -> List[EngineOutput]:
        """Admit waiting requests (batched prefill), decode one chunk, return
        finished outputs.

        Admission groups consecutive waiting requests that share a prompt
        bucket into ONE batched prefill call — 24 sequential batch-1 prefills
        ran at ~0.16 MFU (measured; batch-1 matmuls can't fill the MXU), and
        dominated short-generation latency. The batch dim is padded to a small
        set of sizes to bound compile count; padded rows scatter to slot index
        S which `mode="drop"` discards (vLLM's prefill batching role).

        Per-request admission errors (e.g. prompt longer than the largest
        prefill bucket) finish that request with finish_reason="error" and the
        callback fired, instead of killing the caller — pending requests in a
        server loop must keep flowing (ref vllm server-mode resilience)."""
        outputs: List[EngineOutput] = []
        t0 = time.perf_counter()
        while self.waiting and self.free_slots:
            group = self._next_group(outputs)
            if not group:
                break
            try:
                self._admit_group(group, outputs)
            except Exception as e:  # noqa: BLE001 — isolate bad batches
                for req in group:
                    if req.slot >= 0:
                        # the slot's KV may never have been written — any
                        # prefix entry registered against it must die
                        self._slot_epoch[req.slot] += 1
                        if req.slot in self.slot_req:
                            self._release(req.slot)
                    self._finish_error(req, e, outputs)
        t1 = time.perf_counter()
        self.admit_time += t1 - t0
        if self.slot_req:
            outputs.extend(self._decode_chunk())
            self.decode_time += time.perf_counter() - t1
        return outputs

    def _finish_error(self, req: Request, e: Exception,
                      outputs: List[EngineOutput]):
        req.finished = True
        meta = dict(req.meta or {})
        meta["error"] = f"{type(e).__name__}: {e}"
        out = EngineOutput(req.request_id, req.prompt_ids, req.output_ids,
                           "error", meta)
        outputs.append(out)
        if req.callback is not None:
            req.callback(out)

    def _next_group(self, outputs: List[EngineOutput]) -> List[Request]:
        """Pull a FIFO run of waiting requests sharing one prompt bucket,
        bounded by free slots and the total image-row budget. Requests that
        can never be admitted are errored here (per-request isolation)."""
        group: List[Request] = []
        img_total = 0
        key = None
        seen: Dict = {}                    # in-group fork prediction
        cap = min(len(self.free_slots), self._prefill_batch_buckets[-1])
        while self.waiting and len(group) < cap:
            req = self.waiting[0]
            try:
                b = _bucket(len(req.prompt_ids), self.prefill_buckets)
                n_img = (0 if req.image_embeds is None
                         else req.image_embeds.shape[0])
                if n_img:
                    _bucket(n_img, self.image_buckets)
            except Exception as e:  # noqa: BLE001
                self.waiting.pop(0)
                self._finish_error(req, e, outputs)
                continue
            if key is None:
                key = b
            elif b != key:
                break                      # keep FIFO order; next step() turn
            # a duplicate of an earlier request in THIS group is guaranteed to
            # fork (its leader registers in the same admission pass), so its
            # image rows never enter the prefill — don't count them. The
            # prediction mirrors _prefix_lookup: same prompt, same embeds
            # object, equal position_ids.
            if self.prefix_fork:
                pkey = (tuple(req.prompt_ids), id(req.image_embeds))
                lead_pos = seen.get(pkey, _MISS)
                if lead_pos is not _MISS and (
                        lead_pos is req.position_ids
                        or (lead_pos is not None and req.position_ids is not None
                            and np.array_equal(lead_pos, req.position_ids))):
                    n_img = 0
                elif lead_pos is _MISS:
                    seen[pkey] = req.position_ids
            if group and n_img and img_total + n_img > self.image_buckets[-1]:
                break
            group.append(self.waiting.pop(0))
            img_total += n_img
        return group

    def generate(self, requests: List[Request]) -> List[EngineOutput]:
        """Batch API: run all requests to completion (ref strategy.generate)."""
        for r in requests:
            self.waiting.append(r)
        done: List[EngineOutput] = []
        while self.has_work():
            done.extend(self.step())
        order = {r.request_id: i for i, r in enumerate(requests)}
        return sorted(done, key=lambda o: order.get(o.request_id, 1 << 30))

    # ---------------------------------------------------------------- internals
    def _release(self, slot: int):
        self.slot_req.pop(slot, None)
        self.lengths[slot] = 0
        self.free_slots.append(slot)
        self._dev_dirty = True

    def _batch_bucket(self, n: int) -> int:
        for b in self._prefill_batch_buckets:
            if n <= b:
                return b
        return self._prefill_batch_buckets[-1]

    def _admit_group(self, reqs: List[Request], outputs: List[EngineOutput]):
        """Admit `reqs`: requests whose prompt prefix is already resident in a
        slot's KV cache FORK it (device row copy, no prefill); the rest run
        one batched prefill. Epoch validation happens per lookup, IN ORDER
        with slot assignment, so an entry whose slot gets reused earlier in
        this same pass simply falls back to prefill.

        Copy ordering: a fork source that was RESIDENT before this pass must
        be copied BEFORE the prefill runs — the source slot may be handed to
        a prefill request later in this very pass, whose prefill would
        overwrite the leader's rows. A fork whose leader prefills in THIS
        pass must copy AFTER. The two groups are disjoint by construction
        (`pass_slots`), and no fork source can be another fork's destination
        (destinations get fresh epochs, which invalidates their entries)."""
        prefill_reqs: List[Request] = []
        pre_pairs: List[tuple] = []        # source resident before this pass
        post_pairs: List[tuple] = []       # source prefilled in this pass
        pass_slots = set()
        for req in reqs:
            entry = self._prefix_lookup(req)
            slot = self.free_slots.pop(0)
            self._slot_epoch[slot] += 1
            req.slot = slot
            self.slot_req[slot] = req
            if entry is not None:
                (post_pairs if entry.slot in pass_slots
                 else pre_pairs).append((entry, req))
            else:
                self._register_prefix(req, slot)
                prefill_reqs.append(req)
                pass_slots.add(slot)
        if pre_pairs:
            self._fork_group(pre_pairs)
        if prefill_reqs:
            self._prefill_group(prefill_reqs, outputs)
        if post_pairs:
            self._fork_group(post_pairs)

    # --------------------------------------------------------- prefix forking
    def _prefix_lookup(self, req: Request) -> Optional[_PrefixEntry]:
        """A valid resident prefix for `req`, or None. Identity of the embeds
        object (the pipelines reuse one ViT output across a GRPO group's n
        siblings) plus prompt equality define a match; position_ids are
        checked defensively."""
        if not self.prefix_fork:
            return None
        e = self._prefix_registry.get(tuple(req.prompt_ids))
        if e is None or self._slot_epoch[e.slot] != e.epoch:
            return None
        lead_embeds = e.embeds() if e.embeds is not None else None
        if e.embeds is not None and lead_embeds is None:
            return None                      # referent freed → entry dead
        if (lead_embeds is None) != (req.image_embeds is None):
            return None
        if lead_embeds is not None and lead_embeds is not req.image_embeds:
            return None
        if (e.position_ids is None) != (req.position_ids is None):
            return None
        if (e.position_ids is not None and e.position_ids is not req.position_ids
                and not np.array_equal(e.position_ids, req.position_ids)):
            return None
        return e

    def _register_prefix(self, req: Request, slot: int):
        if not self.prefix_fork or not req.prompt_ids:
            return
        last = int(req.prompt_ids[-1])
        if last in (self.config.image_token_id, self.config.video_token_id):
            # the fork's first decode step re-embeds the last prompt token by
            # id; an image position's hidden state came from the ViT scatter
            # instead, so such a prompt (never produced by our chat templates)
            # must not be a fork source
            return
        P = len(req.prompt_ids)
        npos = (int(req.position_ids.max()) + 1
                if req.position_ids is not None else P)
        self._prefix_registry[tuple(req.prompt_ids)] = _PrefixEntry(
            slot=slot, epoch=int(self._slot_epoch[slot]), P=P, next_pos=npos,
            last_token=last,
            embeds=(None if req.image_embeds is None
                    else weakref.ref(req.image_embeds)),
            position_ids=req.position_ids)
        if len(self._prefix_registry) > 2 * self.S:
            self._prefix_registry = {
                k: v for k, v in self._prefix_registry.items()
                if self._slot_epoch[v.slot] == v.epoch}

    def _fork_group(self, fork_pairs: List[tuple]):
        """Copy each entry's slot row to its fork's slot (ONE jitted call,
        sequential in-order row copies), and stage the fork so its next decode
        step rewrites the identical KV entry at P-1 and samples its own first
        token from the same last-position logits the leader's came from."""
        srcs, dsts = [], []
        for e, req in fork_pairs:
            slot = req.slot
            self.lengths[slot] = e.P - 1
            self.next_pos[slot] = e.next_pos - 1
            self.last_token[slot] = e.last_token
            srcs.append(e.slot)
            dsts.append(slot)
            self.forked_requests += 1
        # Pad to ONE fixed width (max_slots) by repeating the last real pair:
        # the duplicate destinations all write the identical gathered row, so
        # scatter order can't matter, and no live slot is clobbered. A single
        # padded width means a single executable — the earlier per-bucket
        # unrolled copies compiled MID-RUN through the remote XLA compiler and
        # cost ~40 s of the timed region at GRPO fan-out shape (the wave-10
        # 135→79 tok/s prefix-fork regression).
        pad = self.S - len(srcs)
        srcs += [srcs[-1]] * pad
        dsts += [dsts[-1]] * pad
        fn = self._get_fork(self.S)
        self.caches = fn(self.caches, jnp.asarray(np.asarray(srcs, np.int32)),
                         jnp.asarray(np.asarray(dsts, np.int32)))
        self._dev_dirty = True

    def _get_fork(self, F: int):
        if F not in self._jit_fork:
            self._jit_fork[F] = jax.jit(self._fork_slots, donate_argnums=(0,))
        return self._jit_fork[F]

    def _fork_slots(self, caches, srcs, dsts):
        """Gather the source rows, then scatter them to the destination slots
        (slot axis = 1 in every cache leaf). Sources and destinations are
        disjoint within a call (_admit_group's epoch invariant), so the
        gather-before-scatter semantics need no ordering; duplicate
        destinations only come from padding, which repeats the last real pair
        (identical rows — any scatter order agrees)."""
        out = {}
        for name, c in caches.items():
            rows = jnp.take(c, srcs, axis=1)
            out[name] = c.at[:, dsts].set(rows)
        return out

    def _prefill_group(self, reqs: List[Request], outputs: List[EngineOutput]):
        """One batched prefill for `reqs` (all sharing a prompt bucket, slots
        already assigned by _admit_group).

        Image embeds are concatenated CONTIGUOUSLY in request order (no
        inter-request padding) — scatter_image_embeds assigns rows by the
        global batch-major image-token ordinal, so row i of the concat feeds
        the i-th image token across the batch. Batch padding rows scatter
        their cache to slot index S, dropped by mode="drop"."""
        B = len(reqs)
        Bp = self._batch_bucket(B)
        bucket = _bucket(max(len(r.prompt_ids) for r in reqs),
                         self.prefill_buckets)

        ids = np.full((Bp, bucket), self.config.pad_token_id, np.int32)
        attn = np.zeros((Bp, bucket), np.int32)
        attn[B:, 0] = 1                   # padded rows: 1 valid token (masks
        #                                   can't be all-zero in the kernels)
        pos = np.zeros((Bp, 3, bucket), np.int64)
        slots = np.full(Bp, self.S, np.int32)       # S = out-of-range → drop
        Ps = np.ones(Bp, np.int32)
        temps = np.zeros(Bp, np.float32)
        top_ps = np.ones(Bp, np.float32)
        top_ks = np.zeros(Bp, np.int32)
        next_pos_host = np.zeros(Bp, np.int64)
        imgs = []
        n_img_total = 0
        self.prefill_rows += B
        for i, req in enumerate(reqs):
            P = len(req.prompt_ids)
            slot = req.slot
            ids[i, :P] = req.prompt_ids
            attn[i, :P] = 1
            slots[i] = slot
            Ps[i] = P
            s = req.sampling
            temps[i] = s.temperature if s.do_sample else 0.0
            top_ps[i] = s.top_p
            top_ks[i] = s.top_k
            if req.position_ids is not None:
                pos[i, :, :P] = req.position_ids
                next_pos_host[i] = int(req.position_ids.max()) + 1
            else:
                pos[i] = np.clip(np.arange(bucket), 0, P - 1)[None]
                next_pos_host[i] = P
            if req.image_embeds is not None and req.image_embeds.shape[0]:
                imgs.append(req.image_embeds)
                n_img_total += req.image_embeds.shape[0]

        img_bucket = _bucket(n_img_total, self.image_buckets) if n_img_total else 0
        # embeds computed OUTSIDE the engine (e.g. ViT on the train mesh) may
        # be committed to other devices; a pinned/TP engine must re-home them
        # or the prefill jit rejects the mixed-device args (the transfer is
        # the explicit train→decode hand-off on a disaggregated deployment)
        if self.mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P
            _target = NamedSharding(self.mesh, P())
        else:
            _target = self.device           # None → default single device
        if not img_bucket:
            img = None
        elif any(not isinstance(e, np.ndarray) for e in imgs):
            # device-resident embeds (ViT output stays on device): ONE padded
            # concatenate (a single dispatch) instead of a dynamic_update_
            # slice per request — each out-of-jit primitive is a separate
            # device execution, which costs real latency through the axon
            # relay at SocioSeg's 2-images-per-prompt admission rate
            parts = []
            for e in imgs:
                if _target is not None and not isinstance(e, np.ndarray):
                    e = jax.device_put(e, _target)
                parts.append(jnp.asarray(e, self._embed_dtype))
            if img_bucket > n_img_total:
                pad = jnp.zeros((img_bucket - n_img_total,
                                 self.config.text.hidden_size),
                                self._embed_dtype)
                if _target is not None:
                    pad = jax.device_put(pad, _target)
                parts.append(pad)
            img = jnp.concatenate(parts, axis=0)
        else:
            img = np.zeros((img_bucket, self.config.text.hidden_size), np.float32)
            img[:n_img_total] = np.concatenate(imgs, axis=0)
            img = jnp.asarray(img, self._embed_dtype)
            if _target is not None:
                img = jax.device_put(img, _target)

        hk = (Bp, bucket, img_bucket)
        self.prefill_hist[hk] = self.prefill_hist.get(hk, 0) + 1
        fn = self._get_prefill(bucket, img_bucket, Bp)
        self._rng, key = jax.random.split(self._rng)
        tdev = time.perf_counter()
        # w8a8 prefill in HYBRID quant mode runs on the int8 tree (in
        # single-copy mode self.params IS the int8 tree already)
        pf_params = (self.params_q
                     if self.act_quant and self.params_q is not None
                     else self.params)
        self.caches, first_tok = fn(
            pf_params, self.caches, jnp.asarray(ids), jnp.asarray(pos),
            jnp.asarray(attn), jnp.asarray(slots), jnp.asarray(Ps),
            img, key, jnp.asarray(temps), jnp.asarray(top_ps),
            jnp.asarray(top_ks))
        toks = np.asarray(first_tok)     # blocks → true device prefill time
        self.prefill_device_time += time.perf_counter() - tdev
        self._dev_dirty = True
        # cache holds the P prompt tokens; the first sampled token is written
        # at position P (= lengths) by the first decode step
        for i, req in enumerate(reqs):
            slot = req.slot
            self.lengths[slot] = Ps[i]
            self.next_pos[slot] = next_pos_host[i]
            self.last_token[slot] = int(toks[i])
            req.output_ids.append(int(toks[i]))
            self._maybe_finish(req, outputs)

    def _stop_tokens(self, req: Request) -> frozenset:
        base = getattr(self.config, "stop_set",
                       frozenset((self.config.eos_token_id,)))
        extra = getattr(req.sampling, "stop_token_ids", ()) or ()
        return base | frozenset(int(t) for t in extra) if extra else base

    def _maybe_finish(self, req: Request, outputs: List[EngineOutput]):
        tok = req.output_ids[-1] if req.output_ids else None
        reason = None
        if tok is not None and tok in self._stop_tokens(req):
            reason = "stop"
        elif len(req.output_ids) >= req.sampling.max_new_tokens:
            reason = "length"
        elif self.lengths[req.slot] >= self.Lmax:
            reason = "length"
        if reason:
            req.finished = True
            out = EngineOutput(req.request_id, req.prompt_ids, req.output_ids,
                               reason, req.meta)
            self._release(req.slot)
            outputs.append(out)
            if req.callback is not None:
                req.callback(out)

    STOP_SET_K = 8   # device-side per-slot stop-token capacity; overflow
    #                  tokens just lose the in-chunk early exit (host still
    #                  finishes the request correctly)

    def _refresh_dev_state(self):
        active = np.zeros(self.S, bool)
        temps = np.zeros(self.S, np.float32)
        top_ps = np.ones(self.S, np.float32)
        top_ks = np.zeros(self.S, np.int32)
        budget = np.zeros(self.S, np.int32)
        stops = np.full((self.S, self.STOP_SET_K), -1, np.int32)
        for slot, req in self.slot_req.items():
            active[slot] = True
            s = req.sampling
            temps[slot] = s.temperature if s.do_sample else 0.0
            top_ps[slot] = s.top_p
            top_ks[slot] = s.top_k
            budget[slot] = max(s.max_new_tokens - len(req.output_ids), 0)
            st = sorted(self._stop_tokens(req))[:self.STOP_SET_K]
            stops[slot, :len(st)] = st
        self._rng, key = jax.random.split(self._rng)
        self._dev_state = {
            "last_token": jnp.asarray(self.last_token),
            "lengths": jnp.asarray(self.lengths),
            "next_pos": jnp.asarray(self.next_pos),
            "active": jnp.asarray(active),
            "temps": jnp.asarray(temps),
            "top_ps": jnp.asarray(top_ps),
            "top_ks": jnp.asarray(top_ks),
            "budget": jnp.asarray(budget),
            "stops": jnp.asarray(stops),
            "key": key,
            "running": jnp.asarray(active),
        }
        if self.mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P
            rep = NamedSharding(self.mesh, P())
            self._dev_state = {k: jax.device_put(v, rep)
                               for k, v in self._dev_state.items()}
        self._dev_dirty = False

    def _decode_chunk(self) -> List[EngineOutput]:
        if self._dev_dirty or self._dev_state is None:
            self._refresh_dev_state()
        n = self.decode_chunk
        inner = self.decode_inner or n
        prm = self.params_q if self.params_q is not None else self.params
        if inner >= n:
            self.caches, self._dev_state, packed = self._jit_decode(
                prm, self.caches, self._dev_state, n_steps=n)
            packed = np.asarray(packed)  # (S+1, n) — the only download per chunk
            toks = packed[:-1]
            steps = int(packed[-1, 0])   # ≤ n: the loop exits once EVERY slot
        else:                            # hit a stop token or its budget
            # chained inner dispatches, one concatenated readback: the host
            # enqueues every dispatch before blocking, so the group costs one
            # relay round-trip like a monolithic chunk
            packeds = []
            for _ in range(-(-n // inner)):
                self.caches, self._dev_state, p = self._jit_decode(
                    prm, self.caches, self._dev_state, n_steps=inner)
                packeds.append(p)
            packed = np.asarray(jnp.concatenate(packeds, axis=1))
            segs, steps = [], 0
            for i in range(len(packeds)):
                seg = packed[:, i * inner:(i + 1) * inner]
                s_i = int(seg[-1, 0])
                segs.append(seg[:-1, :s_i])
                steps += s_i
            toks = np.concatenate(segs, axis=1)
        self.steps_executed += steps
        # host mirrors advance arithmetically (the device did lengths+steps);
        # a released/admitted slot marks the state dirty and forces re-upload
        outputs: List[EngineOutput] = []
        for slot, req in list(self.slot_req.items()):
            emitted = toks[slot][:steps]
            stop = self._stop_tokens(req)
            for t in emitted:
                req.output_ids.append(int(t))
                if (int(t) in stop
                        or len(req.output_ids) >= req.sampling.max_new_tokens):
                    break
            self.lengths[slot] += steps
            self.next_pos[slot] += steps
            if emitted.size:
                self.last_token[slot] = int(emitted[-1])
            self._maybe_finish(req, outputs)
        return outputs

    # ----------------------------------------------------------- jitted kernels
    def _get_prefill(self, bucket: int, img_bucket: int, batch: int):
        key = (bucket, img_bucket, batch)
        if key not in self._jit_prefill:
            self._jit_prefill[key] = jax.jit(self._prefill, donate_argnums=(1,))
        return self._jit_prefill[key]

    def _prefill(self, params, caches, ids, pos, attn, slots, Ps,
                 image_embeds, key, temps, top_ps, top_ks):
        """Run a BATCH of prompts through the model, scatter each row's KV
        into its slot (padded rows target slot S → dropped), sample token 1."""
        cfg = self.config
        B, bucket = ids.shape
        Lyr = cfg.text.num_hidden_layers
        Hkv, D = cfg.text.num_key_value_heads, cfg.text.head_dim
        # local cache covering the bucket
        local = {
            "k": jnp.zeros((Lyr, B, bucket, Hkv, D), caches["k"].dtype),
            "v": jnp.zeros((Lyr, B, bucket, Hkv, D), caches["v"].dtype),
            "kv_valid": attn,
        }
        if "k_scale" in caches:
            local["k_scale"] = jnp.zeros((Lyr, B, Hkv, bucket), jnp.float32)
            local["v_scale"] = jnp.zeros((Lyr, B, Hkv, bucket), jnp.float32)
        from ..ops.flags import use_flash_attention
        from ..ops.quant import head_logits
        cache_positions = jnp.broadcast_to(jnp.arange(bucket)[None], (B, bucket))
        # logits=False: only each row's LAST position feeds sampling — the
        # full (B, bucket, V) logits would be GBs (and the full-sequence
        # lm_head matmul is ~20% of prefill FLOPs, all wasted)
        hidden, new_cache = qmodel.forward(
            cfg, params, ids, pos, None, image_embeds=image_embeds,
            cache=local, cache_positions=cache_positions,
            use_flash=use_flash_attention(), logits=False, tp=self.tp,
            act_quant=self.act_quant)
        last_hidden = jnp.take_along_axis(
            hidden, (Ps - 1)[:, None, None].astype(jnp.int32), axis=1)[:, 0]
        tok = sample_tokens(head_logits(params, last_hidden), key,
                            temps, top_ps, top_ks,
                            exact=self.sampler_exact)
        out = {}
        for name in caches:
            upd = new_cache[name].astype(caches[name].dtype)
            if name in ("k", "v"):       # (L, S, Lalloc, Hkv, D) ← (L, B, bucket, …)
                out[name] = caches[name].at[:, slots, :bucket].set(
                    upd, mode="drop")
            else:                        # scales (L, S, Hkv, Lalloc) ← (L, B, Hkv, bucket)
                out[name] = caches[name].at[:, slots, :, :bucket].set(
                    upd, mode="drop")
        return out, tok

    def _decode_loop(self, params, caches, state, *, n_steps: int):
        """Generate up to n_steps tokens for all active slots on-device.

        `state` is the device-resident slot state (_refresh_dev_state); it is
        donated, updated in place and handed back so steady-state chunks
        upload nothing and download only the emitted tokens.

        lax.while_loop EARLY-EXITS once every active slot has emitted a stop
        token or exhausted its max_new_tokens budget — a slot that finishes at
        position 1 of a 64-token chunk no longer costs the remaining 63 steps
        when it was the last one running (VERDICT r2 Weak #8). A finished slot
        whose NEIGHBORS still run keeps decoding padding work; that waste is
        intrinsic to batched decode and is ~free (decode is weight-HBM-bound,
        shared across slots)."""
        cfg = self.config
        S = self.S
        temps, top_ps, top_ks = state["temps"], state["top_ps"], state["top_ks"]
        active = state["active"]
        stops = state["stops"]

        def cond(carry):
            i, running = carry[0], carry[1]
            return (i < n_steps) & jnp.any(running)

        def body(carry):
            (i, running, caches, last_token, lengths, next_pos, budget, key,
             toks) = carry
            pos = jnp.broadcast_to(next_pos[:, None, None], (S, 3, 1)).astype(jnp.int64)
            kv_valid = (jnp.arange(self.Lalloc)[None, :] < (lengths + 1)[:, None]).astype(jnp.int32)
            cache = dict(caches)
            cache["kv_valid"] = kv_valid
            from ..ops.flags import use_flash_attention
            logits, new_cache = qmodel.forward(
                cfg, params, last_token[:, None], pos, None,
                cache=cache, cache_positions=lengths[:, None],
                use_flash=use_flash_attention(), tp=self.tp)
            key, sub = jax.random.split(key)
            tok = sample_tokens(logits[:, 0], sub, temps, top_ps, top_ks,
                                exact=self.sampler_exact)
            tok = jnp.where(active, tok, cfg.pad_token_id).astype(jnp.int32)
            toks = toks.at[:, i].set(tok)
            lengths = jnp.where(active, lengths + 1, lengths)
            next_pos = jnp.where(active, next_pos + 1, next_pos)
            budget = jnp.where(active, budget - 1, budget)
            stopped = jnp.any(stops == tok[:, None], axis=1)
            running = running & ~stopped & (budget > 0)
            return (i + 1, running, {k: new_cache[k] for k in caches},
                    tok, lengths, next_pos, budget, key, toks)

        toks0 = jnp.zeros((S, n_steps), jnp.int32)
        # `running` rides in the state so chained decode_inner dispatches
        # keep the early-exit sticky: a later dispatch whose predecessors
        # already stopped every slot exits at iteration 0
        running0 = state.get("running", active) & active
        (steps, running, caches, last_token, lengths, next_pos, budget, key,
         toks) = jax.lax.while_loop(
            cond, body,
            (jnp.int32(0), running0, caches, state["last_token"],
             state["lengths"], state["next_pos"], state["budget"],
             state["key"], toks0))
        new_state = {"last_token": last_token, "lengths": lengths,
                     "next_pos": next_pos, "active": active, "temps": temps,
                     "top_ps": top_ps, "top_ks": top_ks, "budget": budget,
                     "stops": stops, "key": key, "running": running}
        # steps rides as an extra row of toks: ONE device→host transfer per
        # chunk instead of two (each blocking readback costs ~32 ms through
        # the relayed link — two per chunk was ~6% of in-pipeline decode wall)
        packed = jnp.concatenate(
            [toks, jnp.full((1, n_steps), steps, jnp.int32)], axis=0)
        return caches, new_state, packed
