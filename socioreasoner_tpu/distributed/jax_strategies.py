"""Concrete strategies: jax_train / jax_infer / jax_decode / seg_infer.

These replace the reference backends (SURVEY.md §2.2): megatron_train/infer →
JaxTrainStrategy/JaxInferStrategy (jitted steps over the mesh), vllm →
JaxDecodeStrategy (DecodeEngine + GenerateServer), seg_infer → SegStrategy
(Sam2Predictor). All share one ParamStore: `model_update` is a pointer swap
("actor" → "rollout"), not a weight broadcast.

Vision handling: the RL loop precomputes image embeddings once per batch (per-
sample jitted ViT call; SocioSeg tiles share one shape bucket) and reuses them
for rollout, old/ref logprobs and the train step. The ViT is frozen during RL
(`model_args.freeze_vision_tower`, default true here) — full ViT finetuning
routes through trainer.make_train_step's `vision_inputs` instead.
"""

from __future__ import annotations

import os
from typing import Any, Callable, Dict, List, Optional

import numpy as np

import jax
import jax.numpy as jnp

from ..configs.worker_config import WorkerConfig
from ..generation.engine import DecodeEngine, Request
from ..generation.sampling import SamplingParams
from ..generation.server import GenerateServer
from ..models.qwen2_5_vl import model as qmodel
from ..models.qwen2_5_vl.config import Qwen25VLConfig
from ..models.qwen2_5_vl.vision import run_vision
from ..pipeline.losses import PPOLossConfig
from ..protocol import BatchProto
from ..utils.checkpoint import CheckpointManager
from .strategy import InferenceStrategy, ParamStore, TrainStrategy
from .trainer import TrainState, make_logprob_step, make_optimizer, make_train_step


import contextlib


def _mesh_ctx(mesh):
    return jax.sharding.set_mesh(mesh) if mesh is not None \
        else contextlib.nullcontext()


def _put_batch(device_batch: Dict, mesh) -> Dict:
    """Upload a host batch; with a mesh, shard batch dims over (dp, fsdp) and
    replicate packed image embeds (their ragged row packing doesn't align with
    the batch axis — GSPMD reshards inside the ViT scatter as needed)."""
    if mesh is None:
        return {k: jnp.asarray(v) for k, v in device_batch.items()}
    from jax.sharding import NamedSharding, PartitionSpec as P
    from ..parallel.sharding import batch_shardings
    img = device_batch.pop("image_embeds", None)
    shardings = batch_shardings(mesh, device_batch)
    out = {k: jax.device_put(jnp.asarray(v), shardings[k])
           for k, v in device_batch.items()}
    if img is not None:
        out["image_embeds"] = jax.device_put(jnp.asarray(img),
                                             NamedSharding(mesh, P()))
    return out


def _batch_divisor(mesh) -> int:
    if mesh is None:
        return 1
    return (mesh.shape.get("dp", 1) * mesh.shape.get("fsdp", 1))


def _fetch_global(v) -> np.ndarray:
    """Device array → host numpy, valid under multi-process jax.distributed:
    an output sharded over a mesh spanning other processes' devices cannot be
    read with np.asarray — allgather its shards first (every process gets the
    full global value; the host driver is SPMD-replicated across processes)."""
    if getattr(v, "is_fully_addressable", True):
        return np.asarray(v)
    from jax.experimental import multihost_utils
    return np.asarray(multihost_utils.process_allgather(v, tiled=True))


def _micro_batched_log_probs(logprob_step, params, batch: BatchProto,
                             worker_config, mesh=None) -> Dict[str, np.ndarray]:
    """Micro-batched forward (ref forward_step micro-batching,
    megatron_strategy.py:127-157 — bounded activation memory at full scale).
    With a mesh, each chunk is padded to a multiple of dp*fsdp (forward-only:
    padded rows are sliced off the outputs — the DataProto pad_to_divisor
    role, ref protocol.py:28)."""
    n = len(batch)
    mb = getattr(worker_config, "infer_batch_size", 0) or n
    div = _batch_divisor(mesh)
    mb = max(div, (mb // div) * div)
    img = batch.meta.get("image_embeds")
    # per-sample image-row counts: ragged (agentic episodes carry different
    # image counts) via meta["image_embeds_rows"], else uniform rows/sample
    rows = batch.meta.get("image_embeds_rows")
    if img is not None and rows is None:
        rows = np.full(n, img.shape[0] // max(n, 1), np.int64)
    offs = None if rows is None else np.concatenate(
        [[0], np.cumsum(np.asarray(rows, np.int64))])
    outs: Dict[str, list] = {}
    for start in range(0, n, mb):
        chunk = batch.slice(start, start + mb)
        k0 = len(chunk)
        pad = (-k0) % div
        device_batch = {k: np.asarray(v) for k, v in chunk.batch.items()}
        if pad:
            device_batch = {k: np.concatenate(
                [v, np.repeat(v[-1:], pad, axis=0)], axis=0)
                for k, v in device_batch.items()}
        if img is not None and offs[start + k0] > offs[start]:
            device_batch["image_embeds"] = img[offs[start]:offs[start + k0]]
        with _mesh_ctx(mesh):
            out = logprob_step(params, _put_batch(device_batch, mesh))
        for k, v in out.items():
            outs.setdefault(k, []).append(_fetch_global(v)[:k0])
    return {k: np.concatenate(v, axis=0) for k, v in outs.items()}


def compute_image_embeds(config: Qwen25VLConfig, params, pixel_values: np.ndarray,
                         grid_thw: np.ndarray):
    """One sample's packed images → (S_merged, hidden) embeddings.

    Returns a DEVICE array: embeds flow straight into engine requests /
    logprob steps, and a host round-trip would move ~12 MB per VLM sample
    each way (the infer pipeline's measured bottleneck through the axon
    relay — and a gratuitous PCIe round-trip on any host)."""
    return run_vision(config.vision, params["vision"], pixel_values, grid_thw)


def batch_image_embeds(config: Qwen25VLConfig, params, batch: BatchProto,
                       prefix: str = "", image_config=None
                       ) -> List[Optional[np.ndarray]]:
    """Per-sample merged ViT embeddings for every sample in `batch`.

    Default: PER-SAMPLE tower dispatches. On-chip (r4 wave 1) eight
    5.8k-token dispatches beat one 46k-token packed dispatch 0.525 vs
    0.398 tiles/s — the packed geometry runs the tower at worse MXU
    utilization than the per-image shape, outweighing the saved relay
    round-trips. SOCIO_PACK_EMBEDS=1 opts back into packing (one dispatch,
    segmented attention isolates images; numerically identical).
    """
    out: List[Optional[np.ndarray]] = [None] * len(batch)
    pv_col = batch.non_tensor.get(f"{prefix}pixel_values")
    u8_col = batch.non_tensor.get(f"{prefix}pixel_u8")
    grid_col = batch.non_tensor.get(f"{prefix}grid_thw")
    if os.environ.get("SOCIO_PACK_EMBEDS", "0") == "0":
        # per-sample dispatch (the on-chip winner); packing is the opt-in
        # on-chip ablation or if a packed geometry misbehaves on real hardware
        for i in range(len(batch)):
            u8 = u8_col[i] if u8_col is not None else None
            pv = pv_col[i] if pv_col is not None else None
            if u8 is not None:
                if image_config is None:
                    raise ValueError("pixel_u8 requires image_config")
                from ..models.qwen2_5_vl.vision import run_vision_u8
                out[i] = run_vision_u8(config.vision, params["vision"], u8,
                                       grid_col[i], image_config)
            elif pv is not None:
                out[i] = compute_image_embeds(config, params, pv, grid_col[i])
        return out
    if u8_col is not None and image_config is None and any(
            u is not None for u in u8_col):
        # device patchify normalizes with the processor's mean/std and
        # patch/merge geometry — guessing defaults silently produces wrong
        # embeddings for customized processors (ADVICE r2)
        raise ValueError(
            "batch_image_embeds: pixel_u8 columns present but image_config "
            "is None — pass the processor's ImageProcessorConfig")
    mu = config.vision.spatial_merge_unit
    u8_idx, u8_imgs, u8_grids, u8_lens = [], [], [], []
    pv_idx, pv_vals, pv_grids, pv_lens = [], [], [], []
    for i in range(len(batch)):
        u8 = u8_col[i] if u8_col is not None else None
        pv = pv_col[i] if pv_col is not None else None
        grid = grid_col[i] if grid_col is not None else None
        if u8 is not None:                 # defer_patchify: uint8 → device
            u8_idx.append(i)
            u8_imgs.extend(u8)
            u8_grids.append(np.atleast_2d(np.asarray(grid)))
            u8_lens.append(int(np.prod(grid, axis=-1).sum()) // mu)
        elif pv is not None:
            pv_idx.append(i)
            pv_vals.append(np.asarray(pv))
            pv_grids.append(np.atleast_2d(np.asarray(grid)))
            pv_lens.append(int(np.prod(grid, axis=-1).sum()) // mu)
    if u8_imgs:
        from ..models.qwen2_5_vl.vision import run_vision_u8
        emb = run_vision_u8(config.vision, params["vision"], u8_imgs,
                            np.concatenate(u8_grids, axis=0), image_config)
        offs = np.cumsum([0] + u8_lens)
        for k, i in enumerate(u8_idx):
            out[i] = emb[offs[k]:offs[k + 1]]
    if pv_vals:
        emb = compute_image_embeds(config, params,
                                   np.concatenate(pv_vals, axis=0),
                                   np.concatenate(pv_grids, axis=0))
        offs = np.cumsum([0] + pv_lens)
        for k, i in enumerate(pv_idx):
            out[i] = emb[offs[k]:offs[k + 1]]
    return out


class JaxTrainStrategy(TrainStrategy):
    """The actor-train backend (reference megatron_train role)."""

    strategy_name = "jax_train"

    def initialize(self, model_config: Qwen25VLConfig, params,
                   loss_cfg: Optional[PPOLossConfig] = None,
                   training_args=None, param_store: Optional[ParamStore] = None,
                   checkpoint_dir: Optional[str] = None, mesh=None):
        self.model_config = model_config
        self.mesh = mesh
        if param_store is not None:
            self.param_store = param_store
        if mesh is not None:
            # shard the pytree over the mesh (the mcore dist-load role,
            # ref megatron_strategy.py:69-96 + dist_converter TP splits);
            # optimizer state created from sharded params inherits shardings
            from ..parallel.sharding import shard_params
            params = shard_params(params, mesh)
        ta = training_args
        self.grad_accum_steps = max(
            1, int(getattr(ta, "gradient_accumulation_steps", 1) or 1))
        self.optimizer = make_optimizer(
            lr=getattr(ta, "learning_rate", 1e-6),
            weight_decay=getattr(ta, "weight_decay", 0.0),
            b1=getattr(ta, "adam_beta1", 0.9), b2=getattr(ta, "adam_beta2", 0.999),
            max_grad_norm=getattr(ta, "max_grad_norm", 1.0),
            warmup_steps=getattr(ta, "warmup_steps", 0),
            total_steps=getattr(ta, "max_steps", None) or None,
            schedule=getattr(ta, "lr_scheduler_type", "constant"),
            gradient_accumulation_steps=self.grad_accum_steps)
        with _mesh_ctx(mesh):
            self.state = TrainState.create(params, self.optimizer)
        self.loss_cfg = loss_cfg or PPOLossConfig()
        cp, pp, vp_mesh = self._parallel_plan(mesh)
        self._train_step = jax.jit(make_train_step(
            model_config, self.loss_cfg, self.optimizer, cp=cp, pp=pp,
            vp_mesh=vp_mesh, allow_flash=mesh is None))
        self._logprob_step = jax.jit(make_logprob_step(
            model_config, cp=cp, pp=pp, vp_mesh=vp_mesh,
            allow_flash=mesh is None))
        self.param_store.put("actor", self.state.params)
        self.ckpt = CheckpointManager(checkpoint_dir) if checkpoint_dir else None

    def _parallel_plan(self, mesh):
        """CP/PP plans from strategy_args (ref training_args.py:20,35
        context_parallel_size / pipeline_model_parallel_size): CP = zigzag
        ring attention over the sp axis; PP = GPipe microbatch schedule over
        the pp axis."""
        from ..parallel.context_parallel import make_cp_config
        from ..parallel.pipeline_parallel import make_pp_config
        cfg = (self.worker_config.strategy_args.config
               if self.worker_config else {})
        cp = make_cp_config(mesh, int(cfg.get("context_parallel_size", 1)),
                            impl=str(cfg.get("context_parallel_impl", "ring")))
        pp = make_pp_config(mesh, int(cfg.get("pipeline_model_parallel_size", 1)),
                            n_micro=int(cfg.get("pp_micro_batches", 0)),
                            vpp=int(cfg.get(
                                "virtual_pipeline_model_parallel_size", 1) or 1))
        # opt-in explicit vocab-parallel token ops (ref vocab_parallel role)
        vp_mesh = mesh if (cfg.get("vocab_parallel_logprobs") and cp is None
                           and pp is None) else None
        return cp, pp, vp_mesh

    @property
    def params(self):
        return self.state.params

    def train_step(self, batch: BatchProto, loss_func: Callable = None) -> Dict:
        div = _batch_divisor(self.mesh)
        pad = (-len(batch)) % div
        device_batch = {k: v for k, v in batch.batch.items()}
        if pad:
            # reference pads to the divisor instead of crashing
            # (protocol.py:28 pad_dataproto_to_divisor). Pad rows repeat row 0
            # with response_mask (and sample_weights) zeroed: agg_loss drops
            # all-zero-mask rows from numerator AND denominator in every
            # loss_agg_mode, so the padded loss/grad is exactly the unpadded
            # one — only the forward FLOPs of the pad rows are wasted.
            import numpy as _np
            for k, v in device_batch.items():
                rep = _np.repeat(_np.asarray(v[:1]), pad, axis=0)
                if k in ("response_mask", "sample_weights"):
                    rep = _np.zeros_like(rep)
                device_batch[k] = _np.concatenate([_np.asarray(v), rep], axis=0)
            if "sample_weights" not in device_batch:
                w = _np.ones((len(batch) + pad,), _np.float32)
                w[len(batch):] = 0.0
                device_batch["sample_weights"] = w
        if "image_embeds" in batch.meta:
            device_batch["image_embeds"] = batch.meta["image_embeds"]
        with _mesh_ctx(self.mesh):
            self.state, metrics = self._train_step(
                self.state, _put_batch(device_batch, self.mesh))
        self.param_store.put("actor", self.state.params)
        return {k: float(v) for k, v in metrics.items()}

    def forward_step(self, batch: BatchProto, forward_func: Callable = None):
        return self.compute_log_probs(batch)

    def compute_log_probs(self, batch: BatchProto) -> Dict[str, np.ndarray]:
        return _micro_batched_log_probs(self._logprob_step, self.state.params,
                                        batch, self.worker_config, self.mesh)

    def model_update(self, *args, **kwargs):
        """Expose current weights to the rollout engine (ref model_update plane)."""
        self.param_store.put("rollout", self.state.params)

    def save_checkpoint(self, step: int, meta: Optional[Dict] = None, wait=False):
        if self.ckpt:
            self.ckpt.save(step, {"params": self.state.params,
                                  "opt_state": self.state.opt_state},
                           meta=meta, wait=wait)

    def load_checkpoint(self, step: Optional[int] = None):
        if not self.ckpt:
            return None
        restored, meta = self.ckpt.restore(
            step, like={"params": self.state.params, "opt_state": self.state.opt_state})
        if restored is not None:
            self.state = self.state.replace(params=restored["params"],
                                            opt_state=restored["opt_state"])
            self.param_store.put("actor", self.state.params)
        return meta


class JaxInferStrategy(InferenceStrategy):
    """Frozen-policy forward backend (reference megatron_infer / hf_infer role)."""

    strategy_name = "jax_infer"

    def initialize(self, model_config: Qwen25VLConfig, params,
                   param_store: Optional[ParamStore] = None, mesh=None):
        self.model_config = model_config
        self.mesh = mesh
        if param_store is not None:
            self.param_store = param_store
        if mesh is not None:
            from ..parallel.sharding import shard_params
            params = shard_params(params, mesh)
        self._params = params
        cp, pp, vp_mesh = JaxTrainStrategy._parallel_plan(self, mesh)
        self._logprob_step = jax.jit(make_logprob_step(
            model_config, cp=cp, pp=pp, vp_mesh=vp_mesh,
            allow_flash=mesh is None))

    @property
    def params(self):
        return self._params

    def compute_log_probs(self, batch: BatchProto) -> Dict[str, np.ndarray]:
        return _micro_batched_log_probs(self._logprob_step, self._params,
                                        batch, self.worker_config, self.mesh)

    def forward_step(self, batch: BatchProto, forward_func: Callable = None):
        return self.compute_log_probs(batch)


class JaxRewardStrategy(InferenceStrategy):
    """Sequence-classification reward-model backend (ref RewardWorker,
    roll/pipeline/base_worker.py:537-603: AutoModelForSequenceClassification
    protocol — scalar value head on the backbone, reward read at the last
    non-pad token). Params must carry value_head_w/value_head_b
    (trainer.add_value_head)."""

    strategy_name = "jax_reward"

    def initialize(self, model_config: Qwen25VLConfig, params,
                   param_store: Optional[ParamStore] = None, mesh=None):
        self.model_config = model_config
        self.mesh = mesh
        if param_store is not None:
            self.param_store = param_store
        if "value_head_w" not in params:
            raise ValueError("jax_reward strategy needs a value head "
                             "(trainer.add_value_head) on the params pytree")
        if mesh is not None:
            from ..parallel.sharding import shard_params
            head = {k: params[k] for k in ("value_head_w", "value_head_b")}
            body = {k: v for k, v in params.items() if k not in head}
            from jax.sharding import NamedSharding, PartitionSpec
            params = {**shard_params(body, mesh),
                      **jax.device_put(head,
                                       NamedSharding(mesh, PartitionSpec()))}
        self._params = params

        def value_step(params, batch):
            hidden, _ = qmodel.forward(
                self.model_config, params, batch["input_ids"],
                batch["position_ids"], batch.get("attention_mask"),
                image_embeds=batch.get("image_embeds"), logits=False)
            values = (hidden @ params["value_head_w"]
                      + params["value_head_b"])[..., 0]
            # shifted frame: value at position i scores prefix ..i (ref
            # forward_func_values output_tensor[:, 1:])
            return {"values": values[:, 1:]}

        self._value_step = jax.jit(value_step)

    @property
    def params(self):
        return self._params

    def compute_values(self, batch: BatchProto) -> np.ndarray:
        out = _micro_batched_log_probs(self._value_step, self._params, batch,
                                       self.worker_config, self.mesh)
        return out["values"]

    def forward_step(self, batch: BatchProto, forward_func: Callable = None):
        return {"values": self.compute_values(batch)}


class JaxDecodeStrategy(InferenceStrategy):
    """Rollout backend (reference vllm role): continuous-batching engine +
    request-level server."""

    strategy_name = "jax_decode"

    def initialize(self, model_config: Qwen25VLConfig, params=None,
                   param_store: Optional[ParamStore] = None,
                   engine_kwargs: Optional[Dict] = None, mesh=None):
        self.model_config = model_config
        if param_store is not None:
            self.param_store = param_store
        if params is not None:
            self.param_store.put("rollout", params)
        self.engine_kwargs = dict(engine_kwargs or {})
        # single-copy quantized serving: quantize the rollout tree ONCE here
        # and store the quantized tree (dropping the store's bf16 reference);
        # the engine detects the pre-quantized tree and shares it between
        # prefill and decode instead of keeping bf16 + int8 copies resident
        self._single_copy = self.engine_kwargs.pop("single_copy_quant", False)
        # vit_quant: int8 (w8a8) ViT tower — the pipelines compute image
        # embeds from this store's vision subtree (batch_image_embeds)
        self._vit_quant = self.engine_kwargs.pop("vit_quant", None)
        if self._single_copy:
            if not self.engine_kwargs.get("weight_quant"):
                raise ValueError("single_copy_quant requires weight_quant")
        if self._single_copy or self._vit_quant:
            self._quantize_store()
        if mesh is not None:
            # TP decode engine (ICI-sharded weights + paged KV cache) — the
            # tp counterpart of the reference's vLLM tensor_parallel_size
            self.engine_kwargs.setdefault("mesh", mesh)
        self._build_engine()
        self.server: Optional[GenerateServer] = None

    def _quantize_store(self):
        from ..ops.quant import (params_prequantized, quantize_decode_params,
                                 quantize_vision_params, vision_prequantized)
        tree = self.param_store.get("rollout")
        if self._single_copy and not params_prequantized(tree):
            tree = quantize_decode_params(
                tree, mode=self.engine_kwargs["weight_quant"])
        if (self._vit_quant and "vision" in tree
                and not vision_prequantized(tree["vision"])):
            tree = dict(tree)
            tree["vision"] = quantize_vision_params(tree["vision"])
        self.param_store.put("rollout", tree)

    def _build_engine(self):
        self.engine = DecodeEngine(self.model_config,
                                   self.param_store.get("rollout"),
                                   **self.engine_kwargs)

    def model_update(self, *args, **kwargs):
        """Pick up the latest rollout weights (pointer swap).

        Safe only while the engine is idle: in-flight slots hold KV computed
        with the old params, so swapping mid-decode would mix weight versions
        within one sequence. Pipelines drain the engine between steps (ref
        model_update happens between rollout phases); assert that here."""
        if self.engine.has_work():
            raise RuntimeError(
                "model_update while the decode engine has in-flight or waiting "
                f"requests ({self.engine.num_running()} running, "
                f"{self.engine.num_waiting()} waiting); drain/stop generation "
                "before swapping weights")
        if getattr(self, "_single_copy", False) or getattr(self, "_vit_quant",
                                                           None):
            # fresh bf16 weights from the trainer: quantize, keep only the
            # quantized tree in the store (the trainer retains its own copy)
            self._quantize_store()
        self.engine.set_params(self.param_store.get("rollout"))

    # ------------------------------------------------------------- batch mode
    def generate(self, batch: BatchProto, generating_args) -> np.ndarray:
        """Batch generate (ref vllm_strategy.generate :114-141): returns
        right-padded full sequences (prompt + response), n per prompt."""
        sp = SamplingParams.from_generating_args(generating_args)
        n = generating_args.num_return_sequences
        pad_id = self.model_config.pad_token_id
        requests = []
        embeds = batch.meta.get("image_embeds_list")
        for i in range(len(batch)):
            ids = batch.batch["input_ids"][i]
            attn = batch.batch["attention_mask"][i]
            valid = np.asarray(attn) == 1
            prompt_ids = np.asarray(ids)[valid].tolist()
            pos = None
            if "position_ids" in batch.batch:
                pos = np.asarray(batch.batch["position_ids"][i])[:, valid]
            for j in range(n):
                requests.append(Request(
                    request_id=(i, j), prompt_ids=prompt_ids, sampling=sp,
                    image_embeds=None if embeds is None else embeds[i],
                    position_ids=pos))
        outs = self.engine.generate(requests)
        # Layout contract with postprocess_generate (functionals.py:768): rows are
        # [left-padded prompt exactly as passed in | right-padded response].
        P = np.asarray(batch.batch["input_ids"]).shape[1]
        max_out = max(len(o.output_ids) for o in outs) if outs else 0
        result = np.full((len(batch) * n, P + max_out), pad_id, np.int64)
        order = {(i, j): i * n + j for i in range(len(batch)) for j in range(n)}
        for o in outs:
            row = order[o.request_id]
            i = row // n
            result[row, :P] = np.asarray(batch.batch["input_ids"][i])
            result[row, P:P + len(o.output_ids)] = o.output_ids
        return result

    # ------------------------------------------------------------ server mode
    def start_server(self, data: Optional[BatchProto] = None):
        if self.server is None:
            self.server = GenerateServer(self.engine)
        self.server.start()

    def add_request(self, command, data):
        assert self.server is not None, "start_server first"
        return self.server.add_request(command, data)

    def stop_server(self):
        if self.server is not None:
            self.server.stop()
