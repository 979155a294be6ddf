"""PPO/GRPO policy loss — exact formula parity with the reference ActorWorker
(`roll/pipeline/base_worker.py:248-322`):

  ratio = exp(logp - old_logp); surr1/surr2 with pg_clip; optional dual-clip
  (-max(-pg_loss, (1+2*clip)*adv) where adv<0); k3 KL loss vs the reference
  policy; optional entropy bonus; all aggregated with agg_loss(loss_agg_mode).

Pure jittable function over arrays; metrics returned as a dict of scalars.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from ..utils.functionals import agg_loss, compute_approx_kl, masked_mean


@dataclass(frozen=True)
class PPOLossConfig:
    pg_clip: float = 0.2
    dual_clip_loss: bool = False
    use_kl_loss: bool = True
    kl_loss_coef: float = 5e-3
    entropy_loss_coef: float = 0.0
    loss_agg_mode: str = "seq-mean-token-sum"
    loss_type: str = "ppo"            # ppo | topr (ref rlvr/actor_worker.py:9-166)
    topr_clip_min: float = 0.0        # TopR: clip(ratio, min, 1) * advantage


def ppo_policy_loss(
    log_probs: jnp.ndarray,         # (B, T) current policy logp of response tokens
    entropy: jnp.ndarray,           # (B, T)
    old_log_probs: jnp.ndarray,     # (B, T) behavior policy
    ref_log_probs: Optional[jnp.ndarray],  # (B, T) frozen reference
    advantages: jnp.ndarray,        # (B, T)
    response_mask: jnp.ndarray,     # (B, T) 1 on response tokens
    cfg: PPOLossConfig,
    weights: Optional[jnp.ndarray] = None,
) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    response_mask = response_mask.astype(jnp.float32)
    ratio = jnp.exp(log_probs - old_log_probs)
    surr1 = ratio * advantages
    surr2 = jnp.clip(ratio, 1 - cfg.pg_clip, 1 + cfg.pg_clip) * advantages
    if cfg.loss_type == "topr":
        # TopR (ref actor_worker topr variant): asymmetric truncation — positive
        # advantages use a plain REINFORCE term (stop-grad ratio weight clipped
        # to [min,1]); negatives keep the importance-weighted term.
        w = jnp.clip(jax.lax.stop_gradient(ratio), cfg.topr_clip_min, 1.0)
        pg_loss_mat = -jnp.where(advantages >= 0,
                                 w * log_probs * advantages,
                                 ratio * advantages)
    else:
        pg_loss_mat = -jnp.minimum(surr1, surr2)
        if cfg.dual_clip_loss:
            dual = -jnp.maximum(-pg_loss_mat, (1 + cfg.pg_clip * 2) * advantages)
            pg_loss_mat = jnp.where(advantages < 0, dual, pg_loss_mat)
    pg_loss = agg_loss(pg_loss_mat, response_mask, cfg.loss_agg_mode, weights)

    if ref_log_probs is not None:
        kl_mat = compute_approx_kl(log_probs, ref_log_probs, response_mask, "k3")
    else:
        kl_mat = jnp.zeros_like(log_probs)
    kl_loss = agg_loss(kl_mat, response_mask, cfg.loss_agg_mode, weights)

    approxkl = compute_approx_kl(log_probs, old_log_probs, response_mask, "mse")
    policykl = compute_approx_kl(log_probs, old_log_probs, response_mask, "kl")

    entropy_loss = agg_loss(entropy, response_mask, cfg.loss_agg_mode, weights)

    total = pg_loss
    if cfg.use_kl_loss:
        total = total + kl_loss * cfg.kl_loss_coef
    if cfg.entropy_loss_coef > 0:
        total = total - entropy_loss * cfg.entropy_loss_coef

    # clipfrac stats over RESPONSE tokens only — ratios on padding are garbage
    # (ref masked stats, base_worker.py:304-320)
    clipped_low = (ratio < 1 - cfg.pg_clip).astype(jnp.float32)
    clipped_high = (ratio > 1 + cfg.pg_clip).astype(jnp.float32)
    metrics = {
        "actor_train/ppo_ratio_high_clipfrac": masked_mean(clipped_high,
                                                           response_mask),
        "actor_train/ppo_ratio_low_clipfrac": masked_mean(clipped_low,
                                                          response_mask),
        "actor_train/ppo_ratio_clipfrac": masked_mean(clipped_low + clipped_high,
                                                      response_mask),
        "actor_train/ratio_mean": masked_mean(ratio, response_mask, axis=-1).mean(),
        "actor_train/ratio_max": jnp.max(ratio * response_mask),
        "actor_train/ratio_min": jnp.min(ratio * response_mask + (1 - response_mask) * 1e10),
        "actor_train/clipfrac": agg_loss((surr2 < surr1).astype(jnp.float32),
                                         response_mask, cfg.loss_agg_mode),
        "actor_train/pg_loss": pg_loss,
        "actor_train/kl_loss": kl_loss,
        "actor_train/total_loss": total,
        "actor_train/entropy": entropy_loss,
        "actor_train/approxkl": agg_loss(approxkl, response_mask, cfg.loss_agg_mode),
        "actor_train/policykl": agg_loss(policykl, response_mask, cfg.loss_agg_mode),
    }
    return total, metrics


def value_loss(values: jnp.ndarray, old_values: jnp.ndarray, returns: jnp.ndarray,
               response_mask: jnp.ndarray, value_clip: Optional[float] = 0.2,
               loss_agg_mode: str = "seq-mean-token-sum"
               ) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    """Critic clipped value loss (ref CriticWorker base_worker.py:384-534)."""
    response_mask = response_mask.astype(jnp.float32)
    if value_clip is not None:
        clipped = old_values + jnp.clip(values - old_values, -value_clip, value_clip)
        surr1 = jnp.square(values - returns)
        surr2 = jnp.square(clipped - returns)
        loss_mat = 0.5 * jnp.maximum(surr1, surr2)
        clipfrac = masked_mean((surr2 > surr1).astype(jnp.float32), response_mask)
    else:
        loss_mat = 0.5 * jnp.square(values - returns)
        clipfrac = jnp.array(0.0)
    loss = agg_loss(loss_mat, response_mask, loss_agg_mode)
    return loss, {"critic_train/value_loss": loss, "critic_train/value_clipfrac": clipfrac}
