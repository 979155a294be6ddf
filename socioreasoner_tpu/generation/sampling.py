"""Token sampling — vectorized per-slot temperature / top-k / top-p.

Replaces vLLM SamplingParams handling (ref vllm_strategy.py:114-141 builds
SamplingParams from GeneratingArguments). All ops are jit-friendly with static
shapes; per-slot parameters are arrays so one jitted sampler serves mixed
requests (greedy and stochastic in the same batch).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional

import jax
import jax.numpy as jnp


@dataclass(frozen=True)
class SamplingParams:
    temperature: float = 1.0
    top_p: float = 1.0
    top_k: int = 0               # 0 = disabled
    max_new_tokens: int = 512
    do_sample: bool = True

    @classmethod
    def from_generating_args(cls, args) -> "SamplingParams":
        do_sample = bool(getattr(args, "do_sample", True)) and args.temperature > 0
        return cls(temperature=max(args.temperature, 1e-5), top_p=args.top_p,
                   top_k=args.top_k, max_new_tokens=args.max_new_tokens,
                   do_sample=do_sample)


def sample_tokens(
    logits: jnp.ndarray,          # (B, V) float
    key: jax.Array,               # single PRNG key (split internally)
    temperature: jnp.ndarray,     # (B,) — 0/negative → greedy
    top_p: jnp.ndarray,           # (B,)
    top_k: jnp.ndarray,           # (B,) int32 — 0 → disabled
) -> jnp.ndarray:
    """Returns (B,) sampled token ids. Greedy where temperature <= 0."""
    B, V = logits.shape
    logits = logits.astype(jnp.float32)
    greedy = jnp.argmax(logits, axis=-1)

    scaled = logits / jnp.maximum(temperature, 1e-5)[:, None]

    # top-k mask: keep the k largest (k==0 → keep all)
    sorted_desc = jnp.sort(scaled, axis=-1)[:, ::-1]            # (B, V) descending
    k_idx = jnp.clip(top_k - 1, 0, V - 1)
    kth_val = jnp.take_along_axis(sorted_desc, k_idx[:, None], axis=-1)  # (B,1)
    topk_mask = jnp.where(top_k[:, None] > 0, scaled >= kth_val, True)

    # top-p (nucleus): keep smallest prefix of sorted probs with cumsum < p,
    # always keeping the top token
    probs_sorted = jax.nn.softmax(sorted_desc, axis=-1)
    cum = jnp.cumsum(probs_sorted, axis=-1)
    cutoff_sorted = (cum - probs_sorted) < top_p[:, None]       # keep while mass before < p
    # map back: token kept iff its prob >= prob of last kept sorted position
    last_kept = jnp.sum(cutoff_sorted, axis=-1) - 1             # (B,)
    thresh = jnp.take_along_axis(sorted_desc, jnp.clip(last_kept, 0, V - 1)[:, None], axis=-1)
    topp_mask = scaled >= thresh

    masked = jnp.where(topk_mask & topp_mask, scaled, -jnp.inf)
    sampled = jax.random.categorical(key, masked, axis=-1)
    return jnp.where(temperature <= 0, greedy, sampled)
