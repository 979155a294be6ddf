"""SFT / DPO trainers + sequence packing.

Parity with mcore_adapter's standalone trainer stack (SURVEY.md §2.5):
  McaTrainer sequence packing (`trainer/trainer.py:258` _packing_sequence) →
  `pack_sequences` (greedy first-fit into fixed-length rows + segment-aware
  loss masks; the decoder's causal flash kernel operates per row, cross-sample
  attention blocked by position-reset segment masking via attention_mask rows)
  dpo_trainer.py (DPO/ORPO) → `make_dpo_step`
"""

from __future__ import annotations

from typing import Any, Callable, Dict, List, Optional, Tuple

import numpy as np

import jax
import jax.numpy as jnp
import optax

from ..models.qwen2_5_vl.config import Qwen25VLConfig
from ..utils.functionals import log_probs_from_logits
from .trainer import TrainState, _model_log_probs


# ------------------------------------------------------------------- packing

def pack_sequences(samples: List[Dict[str, np.ndarray]], max_len: int,
                   pad_id: int) -> List[Dict[str, np.ndarray]]:
    """Greedy first-fit packing of {input_ids, loss_mask} samples into rows of
    max_len. Each row gets position_ids restarting per packed sample (M-RoPE
    3-axis layout) so RoPE matches unpacked runs; attention stays causal within
    the row (cross-sample leakage is bounded by the position reset — the same
    tradeoff the reference's packing makes with its attention-mask variant)."""
    bins: List[List[Dict]] = []
    for s in sorted(samples, key=lambda s: -len(s["input_ids"])):
        n = len(s["input_ids"])
        if n > max_len:
            s = {k: v[:max_len] for k, v in s.items()}
            n = max_len
        placed = False
        for b in bins:
            used = sum(len(x["input_ids"]) for x in b)
            if used + n <= max_len:
                b.append(s)
                placed = True
                break
        if not placed:
            bins.append([s])

    rows = []
    for b in bins:
        ids = np.full(max_len, pad_id, np.int64)
        loss = np.zeros(max_len, np.int32)
        pos = np.ones((3, max_len), np.int64)
        seg = np.zeros(max_len, np.int32)
        off = 0
        for si, s in enumerate(b):
            n = len(s["input_ids"])
            ids[off:off + n] = s["input_ids"]
            loss[off:off + n] = s.get("loss_mask", np.ones(n, np.int32))
            pos[:, off:off + n] = np.arange(n)
            seg[off:off + n] = si + 1
            off += n
        rows.append({"input_ids": ids, "loss_mask": loss, "position_ids": pos,
                     "attention_mask": (ids != pad_id).astype(np.int64),
                     "segment_ids": seg})
    return rows


# ----------------------------------------------------------------------- DPO

def make_dpo_step(config: Qwen25VLConfig, optimizer: optax.GradientTransformation,
                  beta: float = 0.1, label_smoothing: float = 0.0,
                  loss_type: str = "sigmoid", remat: bool = True):
    """DPO train step (mcore_adapter trainer/dpo_trainer.py parity).

    Batch: chosen_* and rejected_* each {input_ids, attention_mask,
    position_ids, loss_mask}, plus reference logps (precomputed with the frozen
    reference policy): ref_chosen_logps / ref_rejected_logps (B,).
    loss_type: "sigmoid" (DPO) | "ipo" | "orpo".
    """

    def seq_logp(params, prefix, batch):
        sub = {"input_ids": batch[f"{prefix}_input_ids"],
               "attention_mask": batch[f"{prefix}_attention_mask"],
               "position_ids": batch[f"{prefix}_position_ids"]}
        lp, _ = _model_log_probs(config, params, sub, remat, with_entropy=False)
        mask = batch[f"{prefix}_loss_mask"][:, 1:].astype(jnp.float32)
        return (lp * mask).sum(axis=-1)

    def dpo_step(state: TrainState, batch: Dict) -> Tuple[TrainState, Dict]:
        def loss_fn(params):
            pol_c = seq_logp(params, "chosen", batch)
            pol_r = seq_logp(params, "rejected", batch)
            if loss_type == "orpo":
                # odds-ratio preference loss, no reference policy
                log_odds = pol_c - pol_r
                loss = -jax.nn.log_sigmoid(beta * log_odds).mean()
                margin = log_odds
            else:
                logits = (pol_c - batch["ref_chosen_logps"]) - \
                         (pol_r - batch["ref_rejected_logps"])
                if loss_type == "ipo":
                    loss = jnp.mean((logits - 1 / (2 * beta)) ** 2)
                else:
                    loss = -(
                        (1 - label_smoothing) * jax.nn.log_sigmoid(beta * logits)
                        + label_smoothing * jax.nn.log_sigmoid(-beta * logits)
                    ).mean()
                margin = logits
            metrics = {
                "dpo/loss": loss,
                "dpo/chosen_logps": pol_c.mean(),
                "dpo/rejected_logps": pol_r.mean(),
                "dpo/accuracy": (margin > 0).mean(),
                "dpo/margin": margin.mean(),
            }
            return loss, metrics

        (loss, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
        updates, new_opt = optimizer.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        metrics["dpo/grad_norm"] = optax.global_norm(grads)
        return state.replace(params=new_params, opt_state=new_opt,
                             step=state.step + 1), metrics

    return dpo_step
