"""RL math and batch plumbing, JAX-native.

Re-implements the numerics of the reference's ``roll/utils/functionals.py`` as pure
jittable functions over arrays (the reference mutates DataProto/torch tensors in
place; here the pipeline composes pure fns and writes results back to BatchProto).

Key parity points (reference file:line):
  masked_mean/var/whiten            functionals.py:261-343
  log_probs_from_logits             functionals.py:193
  entropy_from_logits               functionals.py:200
  compute_approx_kl (kl/abs/mse/k3) functionals.py:160
  agg_loss 4 modes                  functionals.py:208
  get_pad_mask / get_eos_mask       functionals.py:289-314
  compute_reinforce_return / GAE    functionals.py:376-425
  expand_to_token_level             functionals.py:429 (3-D M-RoPE aware)
  batch/group_reward_norm (GRPO)    functionals.py:452-473
  difficulty_mask                   functionals.py:475
  compute_advantage dispatcher      functionals.py:709-758
  apply_kl_penalty                  functionals.py:640-676
  postprocess_generate              functionals.py:768-874 (vectorized here)
"""

from __future__ import annotations

import enum
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

EPS = 1e-8


# --------------------------------------------------------------------- masking

def masked_mean(tensor: jnp.ndarray, mask: jnp.ndarray, axis: Optional[int] = None) -> jnp.ndarray:
    mask = mask.astype(tensor.dtype)
    if axis is not None:
        mask_sum = mask.sum(axis=axis)
        val = (tensor * mask).sum(axis=axis) / (mask_sum + EPS)
        return jnp.where(mask_sum > 0, val, jnp.zeros_like(val))
    s = mask.sum()
    return jnp.where(s > 0, (tensor * mask).sum() / (s + EPS), 0.0)


def masked_var(values: jnp.ndarray, mask: jnp.ndarray, unbiased: bool = True) -> jnp.ndarray:
    mean = masked_mean(values, mask)
    variance = masked_mean((values - mean) ** 2, mask)
    if unbiased:
        n = mask.sum()
        variance = variance * n / jnp.maximum(n - 1, 1)
    return variance


def masked_whiten(values: jnp.ndarray, mask: jnp.ndarray, shift_mean: bool = True) -> jnp.ndarray:
    mean, var = masked_mean(values, mask), masked_var(values, mask)
    whitened = (values - mean) * jax.lax.rsqrt(var + EPS)
    if not shift_mean:
        whitened = whitened + mean
    return whitened


def masked_normalize(tensor: jnp.ndarray, mask: jnp.ndarray, axis: int = 1) -> jnp.ndarray:
    tensor = tensor * mask
    mean = masked_mean(tensor, mask, axis=axis)[..., None]
    var = masked_mean((tensor - mean) ** 2 * mask, mask, axis=axis)[..., None]
    return (tensor - mean) * jax.lax.rsqrt(jnp.clip(var, EPS, None))


def get_pad_mask(response_id: jnp.ndarray, pad_token: int, dtype=jnp.int32) -> jnp.ndarray:
    """1 where token != pad (ref :289)."""
    return (response_id != pad_token).astype(dtype)


def get_eos_mask(response_id: jnp.ndarray, eos_token: int, dtype=jnp.int32) -> jnp.ndarray:
    """1 up to and including the first eos token (ref :300)."""
    is_eos = (response_id == eos_token).astype(jnp.int32)
    seen_before = jnp.cumsum(is_eos, axis=1) - is_eos  # eos strictly before position
    return (seen_before == 0).astype(dtype)


# ------------------------------------------------------------- token-level ops

def log_probs_from_logits(logits: jnp.ndarray, labels: jnp.ndarray) -> jnp.ndarray:
    """log softmax gathered at labels, float32 (ref :193)."""
    logits = logits.astype(jnp.float32)
    logz = jax.nn.logsumexp(logits, axis=-1)
    picked = jnp.take_along_axis(logits, labels[..., None], axis=-1)[..., 0]
    return picked - logz


def entropy_from_logits(logits: jnp.ndarray) -> jnp.ndarray:
    """H = logsumexp(z) - sum softmax(z)*z (ref :200)."""
    logits = logits.astype(jnp.float32)
    pd = jax.nn.softmax(logits, axis=-1)
    return jax.nn.logsumexp(logits, axis=-1) - jnp.sum(pd * logits, axis=-1)


def compute_approx_kl(
    log_probs: jnp.ndarray,
    log_probs_base: jnp.ndarray,
    action_mask: Optional[jnp.ndarray] = None,
    kl_penalty: str = "kl",
) -> jnp.ndarray:
    """Schulman approximate KLs (ref :160). k3 = exp(q-p) - (q-p) - 1, clamped."""
    if kl_penalty == "kl":
        log_ratio = log_probs - log_probs_base
    elif kl_penalty == "abs":
        log_ratio = jnp.abs(log_probs - log_probs_base)
    elif kl_penalty == "mse":
        log_ratio = 0.5 * jnp.square(log_probs - log_probs_base)
    elif kl_penalty == "k3":
        kl = log_probs_base - log_probs
        log_ratio = jnp.clip(jnp.exp(kl) - kl - 1.0, -10.0, 10.0)
    elif kl_penalty == "full":
        # inputs are full log-distributions over vocab
        log_ratio = jnp.sum(jnp.exp(log_probs_base) * (log_probs_base - log_probs), axis=-1)
    else:
        raise NotImplementedError(kl_penalty)
    if action_mask is not None:
        log_ratio = log_ratio * action_mask
    return log_ratio


def agg_loss(loss_mat: jnp.ndarray, loss_mask: jnp.ndarray, loss_agg_mode: str,
             weights: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """Aggregate a (bs, T) loss matrix to a scalar (ref :208, verl semantics)."""
    loss_mask = loss_mask.astype(loss_mat.dtype)
    if weights is None:
        weights = jnp.ones((loss_mask.shape[0],), dtype=loss_mat.dtype)
    if loss_agg_mode == "token-mean":
        return masked_mean(loss_mat * weights[:, None], loss_mask)
    seq_losses = masked_mean(loss_mat, loss_mask, axis=-1)  # per-seq masked mean
    valid = jnp.any(loss_mask > 0, axis=-1).astype(loss_mat.dtype)
    if loss_agg_mode == "seq-mean-token-sum":
        return (seq_losses * weights * valid).sum() / (valid.sum() + EPS)
    if loss_agg_mode == "seq-mean-token-mean":
        seq_losses = seq_losses / (loss_mask.sum(axis=-1) + EPS)
        return (seq_losses * weights * valid).sum() / (valid.sum() + EPS)
    if loss_agg_mode == "seq-mean-token-sum-norm":
        return (seq_losses * weights * valid).sum() / loss_mask.shape[-1]
    raise ValueError(f"Invalid loss_agg_mode: {loss_agg_mode}")


# ------------------------------------------------------------------ advantages

def discounted_returns(token_level_rewards: jnp.ndarray, gamma: float) -> jnp.ndarray:
    """Reverse cumulative discounted sum along axis -1 (ref compute_reinforce_return :376)."""
    def step(carry, r):
        cum = r + gamma * carry
        return cum, cum
    rev = jnp.flip(token_level_rewards, axis=-1)
    _, out = jax.lax.scan(step, jnp.zeros(rev.shape[0], rev.dtype), rev.T)
    return jnp.flip(out.T, axis=-1)


def compute_reinforce_return(token_level_rewards: jnp.ndarray, gamma: float, lambd: float = 0.0
                             ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    adv = discounted_returns(token_level_rewards, gamma)
    return adv, adv


def compute_gae_advantage_return(token_level_rewards: jnp.ndarray, values: jnp.ndarray,
                                 gamma: float, lambd: float) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """GAE (ref :390)."""
    T = token_level_rewards.shape[-1]
    next_values = jnp.concatenate([values[:, 1:], jnp.zeros_like(values[:, :1])], axis=-1)
    delta = token_level_rewards + gamma * next_values - values

    def step(carry, d):
        gae = d + gamma * lambd * carry
        return gae, gae
    rev = jnp.flip(delta, axis=-1)
    _, out = jax.lax.scan(step, jnp.zeros(rev.shape[0], rev.dtype), rev.T)
    advantages = jnp.flip(out.T, axis=-1)
    return advantages, advantages + values


def expand_to_token_level(response_level_rewards: jnp.ndarray, attention_mask: jnp.ndarray,
                          position_ids: jnp.ndarray) -> jnp.ndarray:
    """Place the scalar reward at the eos index; return token rewards for tokens 1: .

    Ref functionals.py:429 — for 3-D (M-RoPE) position_ids use the first axis; eos
    index is argmax(position_ids * attention_mask) over a right-padded sequence.
    """
    if position_ids.ndim == 3:
        position_ids = position_ids[:, 0]
    eos_idx = jnp.argmax(position_ids * attention_mask, axis=-1)  # (bs,)
    token_rewards = jnp.zeros(attention_mask.shape, dtype=response_level_rewards.dtype)
    token_rewards = token_rewards.at[jnp.arange(attention_mask.shape[0]), eos_idx].set(
        response_level_rewards)
    return token_rewards[:, 1:]


def batch_reward_norm(rewards: jnp.ndarray, div_std: bool = True) -> jnp.ndarray:
    out = rewards - rewards.mean()
    if div_std:
        out = out / (rewards.std(ddof=1) + 1e-6)
    return out


def group_reward_norm(rewards: jnp.ndarray, n_sample: int, div_std: bool = True,
                      div_std_global: bool = False) -> jnp.ndarray:
    """GRPO group normalization (ref :463): groups are contiguous blocks of n_sample."""
    assert n_sample > 1, "n_sample must > 1"
    shaped = rewards.reshape(*rewards.shape[:-1], -1, n_sample)
    shaped = shaped - shaped.mean(axis=-1, keepdims=True)
    if div_std:
        if div_std_global:
            shaped = shaped / (shaped.std(ddof=1) + 1e-6)
        else:
            shaped = shaped / (shaped.std(axis=-1, keepdims=True, ddof=1) + 1e-6)
    return shaped.reshape(rewards.shape)


def difficulty_mask(scores: jnp.ndarray, n_sample: int, low_threshold: float = 0.1,
                    high_threshold: float = 0.95) -> jnp.ndarray:
    """Keep samples whose group-mean score is strictly inside (low, high) (ref :475)."""
    if n_sample <= 1:
        return jnp.ones_like(scores)
    shaped = scores.reshape(*scores.shape[:-1], -1, n_sample)
    group_mean = shaped.mean(axis=-1, keepdims=True)
    mask = (group_mean > low_threshold) & (group_mean < high_threshold)
    return jnp.broadcast_to(mask, shaped.shape).reshape(scores.shape).astype(scores.dtype)


def compute_advantage(
    token_level_rewards: jnp.ndarray,
    response_mask: jnp.ndarray,
    *,
    adv_estimator: str = "grpo",
    gamma: float = 1.0,
    lambd: float = 1.0,
    values: Optional[jnp.ndarray] = None,
    advantage_clip: Optional[float] = None,
    whiten_advantages: bool = False,
    whiten_rewards: bool = False,
) -> Dict[str, jnp.ndarray]:
    """Ref compute_advantage (functionals.py:709-758). Returns dict with
    token_level_rewards/advantages/returns/raw_advantages and clip metrics."""
    token_level_rewards = token_level_rewards.astype(jnp.float32)
    response_mask = response_mask.astype(jnp.float32)
    if whiten_rewards:
        token_level_rewards = masked_whiten(token_level_rewards, response_mask)
    token_level_rewards = token_level_rewards * response_mask

    if adv_estimator == "gae":
        assert values is not None
        values = values.astype(jnp.float32) * response_mask
        advantages, returns = compute_gae_advantage_return(token_level_rewards, values, gamma, lambd)
    elif adv_estimator in ("reinforce", "grpo"):
        advantages, returns = compute_reinforce_return(token_level_rewards, gamma, lambd)
    else:
        raise NotImplementedError(adv_estimator)

    raw_advantages = advantages
    if whiten_advantages:
        advantages = masked_whiten(advantages, response_mask)
    advantages = advantages * response_mask

    out = {"token_level_rewards": token_level_rewards, "raw_advantages": raw_advantages,
           "returns": returns}
    if advantage_clip is not None:
        clip_frac = jnp.mean(((advantages > advantage_clip) | (advantages < -advantage_clip)).astype(jnp.float32))
        advantages = jnp.clip(advantages, -advantage_clip, advantage_clip)
        out["advantage_clip_frac"] = clip_frac
    out["advantages"] = advantages
    return out


def apply_kl_penalty(
    response_level_rewards: jnp.ndarray,
    attention_mask: jnp.ndarray,
    position_ids: jnp.ndarray,
    response_mask_shifted: jnp.ndarray,
    old_log_probs: jnp.ndarray,
    ref_log_probs: Optional[jnp.ndarray],
    kl_coef: float,
    kl_penalty: str = "kl",
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Token rewards = reward@eos − β·KL (ref apply_kl_penalty :640).

    Returns (token_level_rewards (bs, T-1), current_kl scalar)."""
    token_level = expand_to_token_level(response_level_rewards, attention_mask, position_ids)
    if ref_log_probs is not None:
        kld = compute_approx_kl(old_log_probs, ref_log_probs, response_mask_shifted, kl_penalty)
        beta = kl_coef
    else:
        kld = jnp.zeros_like(response_mask_shifted, dtype=jnp.float32)
        beta = 0.0
    token_level = token_level - beta * kld
    current_kl = masked_mean(kld, response_mask_shifted, axis=-1).mean()
    return token_level, current_kl


def compute_clip_fraction(values: jnp.ndarray, clip_max: float, clip_min: float) -> jnp.ndarray:
    return jnp.mean(((values > clip_max) | (values < clip_min)).astype(jnp.float32))


# -------------------------------------------------------------- host-side ops

def pad_to_length(arr: np.ndarray, length: int, pad_value, axis: int = -1) -> np.ndarray:
    """Right-pad (or truncate) along axis (ref :350)."""
    size = arr.shape[axis]
    if size >= length:
        sl = [slice(None)] * arr.ndim
        sl[axis] = slice(0, length)
        return arr[tuple(sl)]
    pad_width = [(0, 0)] * arr.ndim
    pad_width[axis if axis >= 0 else arr.ndim + axis] = (0, length - size)
    return np.pad(arr, pad_width, constant_values=pad_value)


def concatenate_input_and_output(input_ids: np.ndarray, output_ids: np.ndarray,
                                 num_return_sequences: int) -> np.ndarray:
    """(bs, P) + (bs*n, R) → (bs*n, P+R) with inputs repeated (ref :363)."""
    bs, P = input_ids.shape
    rep = np.repeat(input_ids, num_return_sequences, axis=0)
    return np.concatenate([rep, output_ids], axis=1)


class GenerateRequestType(enum.Enum):
    """Rollout-server control messages (ref functionals.py:761)."""
    ADD = enum.auto()
    ABORT = enum.auto()
    STOP = enum.auto()
    ALIVE_CHECK = enum.auto()


def postprocess_generate(
    *,
    input_ids: np.ndarray,          # (bs, P) left-padded prompts
    attention_mask: np.ndarray,     # (bs, P) left-pad mask
    position_ids: np.ndarray,       # (bs, P) or (bs, 3, P) M-RoPE
    output: np.ndarray,             # (bs*n, L>=P) full sequences: prompt + response
    num_return_sequences: int,
    sequence_length: int,
    eos_token_id: int,
    pad_token_id: int,
    fill_eos_token: bool = False,
    prompt_id: Optional[np.ndarray] = None,
) -> Dict[str, np.ndarray]:
    """Convert left-padded prompt + right-padded response into a unified
    right-padded layout with masks and extended position ids.

    Vectorized re-derivation of ref functionals.py:768-874 (which loops per row):
    each row is rolled left by its prompt left-pad amount via a gather, then
    everything beyond the valid length is re-padded. 3-D M-RoPE position ids are
    extended by arange past their last prompt value and rolled the same way.
    """
    output = np.array(output)
    if fill_eos_token:
        last = output.shape[1] - 1
        need = output[:, last] != pad_token_id
        output[need, last] = eos_token_id

    bs, P = input_ids.shape
    out_bs = output.shape[0]
    assert out_bs == bs * num_return_sequences
    output = pad_to_length(output, sequence_length, pad_token_id)
    L = sequence_length

    prompt = output[:, :P].copy()
    response = output[:, P:].copy()

    attn = np.repeat(attention_mask, num_return_sequences, axis=0)  # (out_bs, P)
    response_mask_r = (response != pad_token_id).astype(attn.dtype)
    full_attn = np.concatenate([attn, response_mask_r], axis=-1)    # (out_bs, L)
    assert full_attn.any(axis=1).all(), "all-zero attention row"

    mrope = position_ids.ndim == 3
    if mrope:
        pos = np.repeat(position_ids, num_return_sequences, axis=0)  # (out_bs, 3, P)
        delta = np.arange(1, L - P + 1).reshape(1, 1, -1)
        resp_pos = pos[..., -1:] + delta                             # extend past prompt
        full_pos = np.concatenate([pos, resp_pos], axis=-1)          # (out_bs, 3, L)

    shift = full_attn.argmax(axis=1)                                 # left-pad amount
    valid_len = full_attn.sum(axis=1).astype(np.int64)
    resp_len = response_mask_r.sum(axis=1).astype(np.int64)

    # Roll rows left by `shift` via gather; positions past the end read the last col
    # and are overwritten by the re-pad below.
    gather = np.minimum(np.arange(L)[None, :] + shift[:, None], L - 1)
    output = np.take_along_axis(output, gather, axis=1)
    cols = np.arange(L)[None, :]
    new_attn = (cols < valid_len[:, None]).astype(full_attn.dtype)
    new_resp_mask = ((cols >= (valid_len - resp_len)[:, None]) & (cols < valid_len[:, None])
                     ).astype(full_attn.dtype)
    output = np.where(new_attn.astype(bool), output, pad_token_id)

    if mrope:
        full_pos = np.take_along_axis(full_pos, np.broadcast_to(gather[:, None, :], full_pos.shape), axis=2)
        new_pos = full_pos
    else:
        new_pos = np.clip(np.cumsum(new_attn, axis=-1) - 1, 0, None).astype(np.int64)

    result = {
        "prompts": prompt,
        "responses": response,
        "input_ids": output,
        "attention_mask": new_attn,
        "position_ids": new_pos,
        "prompt_mask": ((new_attn == 1) & (new_resp_mask == 0)).astype(new_attn.dtype),
        "response_mask": new_resp_mask,
    }
    if prompt_id is not None:
        result["prompt_id"] = np.repeat(np.asarray(prompt_id).reshape(-1), num_return_sequences)
    return result


# ------------------------------------------------------------------ statistics

class RunningMoments:
    """Streaming mean/std (ref functionals.py:117)."""

    def __init__(self):
        self.mean = 0.0
        self.std = 1.0
        self.var = 1.0
        self.count = 1e-24

    def update(self, xs: np.ndarray) -> Tuple[float, float]:
        xs = np.asarray(xs, dtype=np.float64)
        n = xs.size
        xs_mean = xs.mean()
        xs_var = xs.var()
        delta = xs_mean - self.mean
        tot = self.count + n
        new_sum = xs_var * n
        old_sum = self.var * self.count + delta ** 2 * self.count * n / tot
        self.mean += delta * n / tot
        self.var = (old_sum + new_sum) / tot
        self.std = float(np.sqrt(self.var * tot / max(tot - 1, 1e-24)))
        self.count = tot
        return float(xs_mean), float(np.sqrt(xs_var * n / max(n - 1, 1)))


def reduce_metrics(metrics: dict, reduce_func=np.mean) -> dict:
    return {k: float(reduce_func(v)) for k, v in metrics.items()}


def append_to_dict(data: Dict, new_data: Dict):
    for key, val in new_data.items():
        data.setdefault(key, []).append(val)
