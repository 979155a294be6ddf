"""Jitted GRPO/PPO train + logprob steps over a device mesh.

Replaces the reference's MegatronTrainStrategy train path
(`roll/distributed/strategy/megatron_strategy.py:355-409`: 1F1B fwd/bwd, dist
optimizer, offload juggling). TPU-native: one jitted `train_step(state, batch)`
with remat, optax optimizer sharded alongside params (ZeRO via the `fsdp` mesh
axis), and no offload — every role shares the same resident weights.

The logprob step plays `ActorWorker.compute_log_probs` (base_worker.py:206-246):
token log-probs + entropy of the response region.
"""

from __future__ import annotations

import functools
from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from flax import struct

from ..models.qwen2_5_vl import model as qmodel
from ..models.qwen2_5_vl.config import Qwen25VLConfig
from ..pipeline.losses import PPOLossConfig, ppo_policy_loss
from ..utils.functionals import entropy_from_logits, log_probs_from_logits


class TrainState(struct.PyTreeNode):
    params: Any
    opt_state: Any
    step: jnp.ndarray

    @classmethod
    def create(cls, params, optimizer: optax.GradientTransformation) -> "TrainState":
        return cls(params=params, opt_state=optimizer.init(params),
                   step=jnp.zeros((), jnp.int32))


def make_optimizer(lr: float = 1e-6, weight_decay: float = 0.0, b1: float = 0.9,
                   b2: float = 0.999, eps: float = 1e-8, max_grad_norm: float = 1.0,
                   warmup_steps: int = 0, total_steps: Optional[int] = None,
                   schedule: str = "constant",
                   gradient_accumulation_steps: int = 1
                   ) -> optax.GradientTransformation:
    """Optimizer factory (ref training_args lr/betas/clip; constant lr by default).

    gradient_accumulation_steps > 1 wraps the chain in optax.MultiSteps: each
    train_step call contributes one micro-batch gradient; parameters update
    every K calls with the averaged gradient (the Megatron num_microbatches
    role, ref megatron_strategy.py:368-376)."""
    if schedule == "cosine" and total_steps:
        sched = optax.warmup_cosine_decay_schedule(0.0, lr, warmup_steps, total_steps)
    elif warmup_steps > 0:
        sched = optax.linear_schedule(0.0, lr, warmup_steps)
    else:
        sched = lr
    opt = optax.chain(
        optax.clip_by_global_norm(max_grad_norm),
        optax.adamw(sched, b1=b1, b2=b2, eps=eps, weight_decay=weight_decay),
    )
    if gradient_accumulation_steps and gradient_accumulation_steps > 1:
        opt = optax.MultiSteps(opt, every_k_schedule=gradient_accumulation_steps)
    return opt


def chunked_logp_entropy(params, hidden: jnp.ndarray, labels: jnp.ndarray,
                         chunk_size: int = 256, with_entropy: bool = True
                         ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(B, L, H) hidden + (B, L) labels → fp32 (logp, entropy), each (B, L),
    WITHOUT materializing the (B, L, V) logits.

    The lm-head matmul + softmax stats run per sequence chunk under a
    sequential lax.map with remat: peak extra HBM is B×chunk×V fp32 (≈0.6 GB
    at the 3B train shape, B=4 c=256) instead of the full B×L×V logits
    (≈5.6 GB bf16 at B=8 L=2304 V=152k) — the unlock for single-chip 3B
    GRPO steps on a 16 GB v5e, and less HBM write traffic everywhere.
    Backward recomputes each chunk's logits (remat); the head weight's
    gradient accumulates across chunks inside the scan. Numerically identical
    to log_probs_from_logits/entropy_from_logits (same fp32 softmax)."""
    from ..ops.quant import head_logits
    B, L, H = hidden.shape
    C = min(chunk_size, L)
    n = -(-L // C)
    pad = n * C - L
    if pad:
        hidden = jnp.pad(hidden, ((0, 0), (0, pad), (0, 0)))
        labels = jnp.pad(labels, ((0, 0), (0, pad)))
    h = hidden.reshape(B, n, C, H).transpose(1, 0, 2, 3)     # (n, B, C, H)
    y = labels.reshape(B, n, C).transpose(1, 0, 2)

    @jax.checkpoint
    def body(hc, yc):
        logits = head_logits(params, hc).astype(jnp.float32)
        logz = jax.nn.logsumexp(logits, axis=-1)
        lp = jnp.take_along_axis(logits, yc[..., None], axis=-1)[..., 0] - logz
        if with_entropy:
            pd = jax.nn.softmax(logits, axis=-1)
            ent = logz - jnp.sum(pd * logits, axis=-1)
        else:
            ent = jnp.zeros_like(lp)
        return lp, ent

    lp, ent = jax.lax.map(lambda args: body(*args), (h, y))
    lp = lp.transpose(1, 0, 2).reshape(B, n * C)[:, :L]
    ent = ent.transpose(1, 0, 2).reshape(B, n * C)[:, :L]
    return lp, ent


def _head_chunk_default() -> int:
    """Env-tunable chunk for the fused head (0 disables → full logits)."""
    import os
    return int(os.environ.get("SOCIO_HEAD_CHUNK", "256"))


def _model_log_probs(config: Qwen25VLConfig, params, batch: Dict,
                     remat: bool, with_entropy: bool = True,
                     use_flash: bool = False, cp=None, pp=None, vp_mesh=None):
    """Forward → (logp of next-token labels, entropy), both (B, L-1).

    With cp (context parallelism): the model returns logits in the zigzag
    layout; next-token targets are built in ORIGINAL order, permuted to match,
    the per-token logp/entropy are inverse-permuted back — only (B, L) float
    arrays cross the permutation, never the (B, L, V) logits."""
    ids = batch["input_ids"]
    if cp is None:
        head_chunk = _head_chunk_default()
        if pp is None and vp_mesh is None and head_chunk:
            # fused chunked head: logp/entropy straight from hidden states,
            # the (B, L, V) logits never materialize (see chunked_logp_entropy)
            hidden, _ = qmodel.forward(
                config, params, ids, batch["position_ids"],
                batch.get("attention_mask"),
                image_embeds=batch.get("image_embeds"),
                vision_inputs=batch.get("vision_inputs"),
                remat=remat, use_flash=use_flash, logits=False)
            return chunked_logp_entropy(params, hidden[:, :-1], ids[:, 1:],
                                        chunk_size=head_chunk,
                                        with_entropy=with_entropy)
        logits, _ = qmodel.forward(
            config, params, ids, batch["position_ids"],
            batch.get("attention_mask"),
            image_embeds=batch.get("image_embeds"),
            vision_inputs=batch.get("vision_inputs"),
            remat=remat, use_flash=use_flash, pp=pp)
        shift_logits = logits[:, :-1]
        labels = ids[:, 1:]
        if vp_mesh is not None:
            # explicit vocab-parallel token ops (ref megatron_strategy.py:
            # 216-237 via parallel_functions/vocab_parallel.py): pin the
            # logits' vocab dim to the tp axis and reduce with shard_map
            # collectives — the full (B, L, V) array never materializes on
            # one device. GSPMD reaches the same collectives implicitly; this
            # is the opt-in guaranteed-sharded path for big-vocab models.
            from jax.sharding import NamedSharding, PartitionSpec as P
            from ..ops.vocab_parallel import (vocab_parallel_entropy,
                                              vocab_parallel_log_probs)
            shift_logits = jax.lax.with_sharding_constraint(
                shift_logits,
                NamedSharding(vp_mesh, P(("dp", "fsdp"), None, "tp")))
            lp = vocab_parallel_log_probs(shift_logits, labels, vp_mesh)
            ent = (vocab_parallel_entropy(shift_logits, vp_mesh)
                   if with_entropy else jnp.zeros_like(lp))
            return lp, ent
        lp = log_probs_from_logits(shift_logits, labels)
        ent = entropy_from_logits(shift_logits) if with_entropy else jnp.zeros_like(lp)
        return lp, ent

    B, L = ids.shape
    perm = jnp.asarray(cp.perm(L))
    inv = jnp.asarray(cp.inv_perm(L))
    # position i predicts token i+1; the last column is a dummy (masked out by
    # every caller — response masks never reach index L-1 of the shifted frame)
    labels_full = jnp.concatenate([ids[:, 1:], ids[:, -1:]], axis=1)
    logits_p, _ = qmodel.forward(
        config, params, ids, batch["position_ids"],
        batch.get("attention_mask"),
        image_embeds=batch.get("image_embeds"),
        vision_inputs=batch.get("vision_inputs"),
        remat=remat, use_flash=use_flash, cp=cp)
    lp_p = log_probs_from_logits(logits_p, labels_full[:, perm])
    ent_p = (entropy_from_logits(logits_p) if with_entropy
             else jnp.zeros_like(lp_p))
    return lp_p[:, inv][:, :-1], ent_p[:, inv][:, :-1]


def make_train_step(config: Qwen25VLConfig, loss_cfg: PPOLossConfig,
                    optimizer: optax.GradientTransformation, remat: bool = True,
                    cp=None, pp=None, vp_mesh=None, allow_flash: bool = True
                    ) -> Callable[[TrainState, Dict], Tuple[TrainState, Dict]]:
    """Build the jittable GRPO train step.

    batch keys: input_ids (B,L), attention_mask, position_ids (B,3,L),
    response_mask (B,L), advantages/old_log_probs/ref_log_probs (B,L-1),
    optional image_embeds / vision_inputs, optional sample weights.
    cp: optional CPConfig — shards the sequence over the mesh's sp axis with
    zigzag ring attention (ref context_parallel_size, training_args.py:35).
    """

    from ..ops.flags import use_flash_attention
    # allow_flash=False under a GSPMD mesh: the Pallas kernel is a custom
    # call XLA cannot partition — CP's ring attention (shard_map) is the
    # sharded-kernel path instead
    flash = use_flash_attention() and cp is None and pp is None and allow_flash

    def train_step(state: TrainState, batch: Dict) -> Tuple[TrainState, Dict]:
        def loss_fn(params):
            lp, ent = _model_log_probs(config, params, batch, remat,
                                       with_entropy=True, use_flash=flash,
                                       cp=cp, pp=pp, vp_mesh=vp_mesh)
            resp = batch["response_mask"][:, 1:]
            return ppo_policy_loss(
                lp, ent, batch["old_log_probs"], batch.get("ref_log_probs"),
                batch["advantages"], resp, loss_cfg, batch.get("sample_weights"))

        (loss, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
        updates, new_opt = optimizer.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        metrics["actor_train/grad_norm"] = optax.global_norm(grads)
        metrics["actor_train/loss"] = loss
        return state.replace(params=new_params, opt_state=new_opt,
                             step=state.step + 1), metrics

    return train_step


def make_logprob_step(config: Qwen25VLConfig, remat: bool = False, cp=None,
                      pp=None, vp_mesh=None, allow_flash: bool = True
                      ) -> Callable[[Any, Dict], Dict]:
    """Forward-only: {"log_probs": (B,L-1), "entropy": (B,L-1)} masked to response.
    Uses the Pallas flash kernel on TPU (forward has no autodiff requirement)."""
    from ..ops.flags import use_flash_attention
    flash = use_flash_attention() and cp is None and pp is None and allow_flash

    def logprob_step(params, batch: Dict) -> Dict:
        lp, ent = _model_log_probs(config, params, batch, remat, use_flash=flash,
                                   cp=cp, pp=pp, vp_mesh=vp_mesh)
        resp = batch["response_mask"][:, 1:].astype(lp.dtype)
        return {"log_probs": lp * resp, "entropy": ent * resp}

    return logprob_step


def make_value_step(config: Qwen25VLConfig, optimizer: optax.GradientTransformation,
                    value_clip: float = 0.2, loss_agg_mode: str = "seq-mean-token-sum",
                    remat: bool = True):
    """Critic train step (ref CriticWorker base_worker.py:384-534): value head on
    the backbone's hidden states, clipped value loss vs returns."""
    from ..pipeline.losses import value_loss as value_loss_fn

    def value_forward(params, batch):
        hidden, _ = qmodel.forward(
            config, params, batch["input_ids"], batch["position_ids"],
            batch.get("attention_mask"), image_embeds=batch.get("image_embeds"),
            remat=remat, logits=False)
        values = (hidden @ params["value_head_w"] + params["value_head_b"])[..., 0]
        return values[:, 1:]   # align with response_mask[:, 1:]

    def value_step(state: TrainState, batch: Dict) -> Tuple[TrainState, Dict]:
        def loss_fn(params):
            values = value_forward(params, batch)
            return value_loss_fn(values, batch["old_values"], batch["returns"],
                                 batch["response_mask"][:, 1:], value_clip,
                                 loss_agg_mode)
        (loss, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
        updates, new_opt = optimizer.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        metrics["critic_train/grad_norm"] = optax.global_norm(grads)
        return state.replace(params=new_params, opt_state=new_opt,
                             step=state.step + 1), metrics

    return value_step, value_forward


def add_value_head(params, key, hidden_size: int, dtype=jnp.float32):
    """Attach a scalar value head to a backbone params pytree."""
    params = dict(params)
    params["value_head_w"] = (jax.random.normal(key, (hidden_size, 1)) * 0.02).astype(dtype)
    params["value_head_b"] = jnp.zeros((1,), dtype)
    return params


def make_sft_step(config: Qwen25VLConfig, optimizer: optax.GradientTransformation,
                  remat: bool = True):
    """Supervised next-token CE step (the mcore_adapter McaTrainer role,
    SURVEY.md §2.5 trainer/trainer.py)."""

    def sft_step(state: TrainState, batch: Dict) -> Tuple[TrainState, Dict]:
        def loss_fn(params):
            lp, _ = _model_log_probs(config, params, batch, remat, with_entropy=False)
            mask = batch["loss_mask"][:, 1:].astype(jnp.float32)
            loss = -(lp * mask).sum() / (mask.sum() + 1e-8)
            return loss, {"sft/loss": loss}

        (loss, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
        updates, new_opt = optimizer.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        metrics["sft/grad_norm"] = optax.global_norm(grads)
        return state.replace(params=new_params, opt_state=new_opt,
                             step=state.step + 1), metrics

    return sft_step
