"""Golden tests for RL math vs independent torch re-derivations of the reference
formulas (roll/utils/functionals.py — the reference ships no tests, SURVEY.md §4)."""

import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as F

import socioreasoner_tpu.utils.functionals as fn


def test_masked_mean_var_whiten():
    x = np.random.default_rng(0).normal(size=(4, 7)).astype(np.float32)
    m = (np.random.default_rng(1).random((4, 7)) > 0.3).astype(np.float32)
    got = float(fn.masked_mean(jnp.array(x), jnp.array(m)))
    want = (x * m).sum() / (m.sum() + 1e-8)
    assert abs(got - want) < 1e-5

    got_var = float(fn.masked_var(jnp.array(x), jnp.array(m)))
    mean = (x * m).sum() / (m.sum() + 1e-8)
    var = ((x - mean) ** 2 * m).sum() / (m.sum() + 1e-8)
    var *= m.sum() / (m.sum() - 1)
    assert abs(got_var - var) < 1e-4

    w = np.array(fn.masked_whiten(jnp.array(x), jnp.array(m)))
    wm = (w * m).sum() / m.sum()
    assert abs(wm) < 1e-3


def test_log_probs_and_entropy_vs_torch():
    logits = np.random.default_rng(0).normal(size=(2, 5, 11)).astype(np.float32)
    labels = np.random.default_rng(1).integers(0, 11, size=(2, 5))
    got = np.array(fn.log_probs_from_logits(jnp.array(logits), jnp.array(labels)))
    tl = F.log_softmax(torch.tensor(logits), dim=-1)
    want = tl.gather(-1, torch.tensor(labels).unsqueeze(-1)).squeeze(-1).numpy()
    np.testing.assert_allclose(got, want, atol=2e-4)

    got_e = np.array(fn.entropy_from_logits(jnp.array(logits)))
    pd = F.softmax(torch.tensor(logits), dim=-1)
    want_e = (torch.logsumexp(torch.tensor(logits), -1) - (pd * torch.tensor(logits)).sum(-1)).numpy()
    np.testing.assert_allclose(got_e, want_e, atol=2e-4)


@pytest.mark.parametrize("mode", ["kl", "abs", "mse", "k3"])
def test_approx_kl_modes(mode):
    rng = np.random.default_rng(2)
    lp = rng.normal(size=(3, 6)).astype(np.float32)
    lpb = rng.normal(size=(3, 6)).astype(np.float32)
    mask = np.ones((3, 6), np.float32)
    got = np.array(fn.compute_approx_kl(jnp.array(lp), jnp.array(lpb), jnp.array(mask), mode))
    t_lp, t_lpb = torch.tensor(lp), torch.tensor(lpb)
    if mode == "kl":
        want = t_lp - t_lpb
    elif mode == "abs":
        want = (t_lp - t_lpb).abs()
    elif mode == "mse":
        want = 0.5 * (t_lp - t_lpb).square()
    else:
        kl = t_lpb - t_lp
        want = torch.clamp(kl.exp() - kl - 1, -10, 10)
    np.testing.assert_allclose(got, want.numpy(), atol=1e-4)


@pytest.mark.parametrize("mode", ["token-mean", "seq-mean-token-sum",
                                  "seq-mean-token-mean", "seq-mean-token-sum-norm"])
def test_agg_loss_modes(mode):
    rng = np.random.default_rng(3)
    loss = rng.normal(size=(4, 6)).astype(np.float32)
    mask = (rng.random((4, 6)) > 0.4).astype(np.float32)
    mask[2] = 0  # one fully-masked sequence
    got = float(fn.agg_loss(jnp.array(loss), jnp.array(mask), mode))

    # torch re-derivation of reference agg_loss (functionals.py:208)
    tl, tm = torch.tensor(loss), torch.tensor(mask)

    def masked_mean_t(t, m, dim=None):
        if dim is not None:
            ms = m.sum(dim)
            return torch.where(ms > 0, (t * m).sum(dim) / (ms + 1e-8), torch.zeros_like(ms))
        return (t * m).sum() / (m.sum() + 1e-8)

    if mode == "token-mean":
        want = masked_mean_t(tl, tm)
    else:
        seq = masked_mean_t(tl, tm, dim=-1)
        valid = torch.any(tm > 0, dim=-1).float()
        if mode == "seq-mean-token-sum":
            want = (seq * valid).sum() / (valid.sum() + 1e-8)
        elif mode == "seq-mean-token-mean":
            seq = seq / (tm.sum(-1) + 1e-8)
            want = (seq * valid).sum() / (valid.sum() + 1e-8)
        else:
            want = (seq * valid).sum() / tm.shape[-1]
    assert abs(got - float(want)) < 1e-5


def test_eos_pad_masks():
    resp = jnp.array([[5, 7, 2, 9, 2, 0], [1, 1, 1, 1, 1, 1]])
    eos = np.array(fn.get_eos_mask(resp, eos_token=2))
    np.testing.assert_array_equal(eos, [[1, 1, 1, 0, 0, 0], [1, 1, 1, 1, 1, 1]])
    pad = np.array(fn.get_pad_mask(jnp.array([[4, 5, 0, 0]]), pad_token=0))
    np.testing.assert_array_equal(pad, [[1, 1, 0, 0]])


def test_discounted_and_gae_vs_loop():
    rng = np.random.default_rng(4)
    r = rng.normal(size=(2, 5)).astype(np.float32)
    v = rng.normal(size=(2, 5)).astype(np.float32)
    gamma, lam = 0.9, 0.8

    adv, ret = fn.compute_reinforce_return(jnp.array(r), gamma)
    want = np.zeros_like(r)
    cum = np.zeros(2)
    for t in reversed(range(5)):
        cum = r[:, t] + gamma * cum
        want[:, t] = cum
    np.testing.assert_allclose(np.array(adv), want, atol=1e-5)

    adv2, ret2 = fn.compute_gae_advantage_return(jnp.array(r), jnp.array(v), gamma, lam)
    lastgae = np.zeros(2)
    want2 = np.zeros_like(r)
    for t in reversed(range(5)):
        nextv = v[:, t + 1] if t < 4 else 0.0
        delta = r[:, t] + gamma * nextv - v[:, t]
        lastgae = delta + gamma * lam * lastgae
        want2[:, t] = lastgae
    np.testing.assert_allclose(np.array(adv2), want2, atol=1e-5)
    np.testing.assert_allclose(np.array(ret2), want2 + v, atol=1e-5)


def test_expand_to_token_level_mrope():
    # right-padded: valid lengths 4 and 3 out of 6
    attn = jnp.array([[1, 1, 1, 1, 0, 0], [1, 1, 1, 0, 0, 0]])
    pos = jnp.stack([jnp.array([[0, 1, 2, 3, 0, 0], [0, 1, 2, 0, 0, 0]])] * 3, axis=1)
    rw = jnp.array([2.0, 3.0])
    out = np.array(fn.expand_to_token_level(rw, attn, pos))
    want = np.zeros((2, 5), np.float32)
    want[0, 2] = 2.0  # eos idx 3 → shifted [:,1:] → col 2
    want[1, 1] = 3.0
    np.testing.assert_array_equal(out, want)


def test_group_reward_norm_grpo():
    r = jnp.array([1.0, 2.0, 3.0, 10.0, 20.0, 30.0])
    out = np.array(fn.group_reward_norm(r, n_sample=3))
    # each group zero-mean
    assert abs(out[:3].sum()) < 1e-5 and abs(out[3:].sum()) < 1e-5
    # torch re-derivation (std with Bessel, matches torch.std default)
    t = torch.tensor([1.0, 2.0, 3.0, 10.0, 20.0, 30.0]).reshape(2, 3)
    t = t - t.mean(-1, keepdim=True)
    t = t / (t.std(-1, keepdim=True) + 1e-6)
    np.testing.assert_allclose(out, t.reshape(-1).numpy(), atol=1e-5)


def test_difficulty_mask():
    scores = jnp.array([0.0, 0.0, 1.0, 1.0, 0.4, 0.6])  # group means 0, 1, 0.5
    mask = np.array(fn.difficulty_mask(scores, n_sample=2, low_threshold=0.1, high_threshold=0.95))
    np.testing.assert_array_equal(mask, [0, 0, 0, 0, 1, 1])


def test_compute_advantage_grpo_path():
    rng = np.random.default_rng(5)
    tr = rng.normal(size=(4, 6)).astype(np.float32)
    mask = np.ones((4, 6), np.float32)
    mask[:, 4:] = 0
    out = fn.compute_advantage(jnp.array(tr), jnp.array(mask), adv_estimator="grpo",
                               gamma=1.0, advantage_clip=0.5, whiten_advantages=True)
    adv = np.array(out["advantages"])
    assert adv.shape == (4, 6)
    assert np.all(np.abs(adv) <= 0.5 + 1e-6)
    assert np.all(adv[:, 4:] == 0)


def test_postprocess_generate_text():
    # 2 prompts, left-padded to P=4; n=2 returns; L=8
    pad = 0
    input_ids = np.array([[pad, pad, 5, 6], [pad, 7, 8, 9]])
    attn = np.array([[0, 0, 1, 1], [0, 1, 1, 1]])
    pos = np.clip(np.cumsum(attn, -1) - 1, 0, None)
    # full sequences: prompt + response (right-padded)
    output = np.array([
        [pad, pad, 5, 6, 11, 12, pad, pad],
        [pad, pad, 5, 6, 13, pad, pad, pad],
        [pad, 7, 8, 9, 14, 15, 16, pad],
        [pad, 7, 8, 9, 17, pad, pad, pad],
    ])
    res = fn.postprocess_generate(
        input_ids=input_ids, attention_mask=attn, position_ids=pos, output=output,
        num_return_sequences=2, sequence_length=8, eos_token_id=2, pad_token_id=pad)
    # row 0: shift 2 → [5,6,11,12,...pad]
    np.testing.assert_array_equal(res["input_ids"][0], [5, 6, 11, 12, pad, pad, pad, pad])
    np.testing.assert_array_equal(res["attention_mask"][0], [1, 1, 1, 1, 0, 0, 0, 0])
    np.testing.assert_array_equal(res["response_mask"][0], [0, 0, 1, 1, 0, 0, 0, 0])
    np.testing.assert_array_equal(res["prompt_mask"][0], [1, 1, 0, 0, 0, 0, 0, 0])
    # row 3: shift 1, prompt len 3, resp len 1
    np.testing.assert_array_equal(res["input_ids"][3], [7, 8, 9, 17, pad, pad, pad, pad])
    np.testing.assert_array_equal(res["response_mask"][3], [0, 0, 0, 1, 0, 0, 0, 0])
    # position ids are cumsum-style for text
    np.testing.assert_array_equal(res["position_ids"][0][:4], [0, 1, 2, 3])


def test_postprocess_generate_mrope():
    pad = 0
    input_ids = np.array([[pad, 5, 6]])
    attn = np.array([[0, 1, 1]])
    pos1d = np.array([[0, 0, 1]])
    pos = np.stack([pos1d, pos1d + 10, pos1d + 20], axis=1)  # (1, 3, 3) fake t/h/w
    output = np.array([[pad, 5, 6, 30, 31, pad]])
    res = fn.postprocess_generate(
        input_ids=input_ids, attention_mask=attn, position_ids=pos, output=output,
        num_return_sequences=1, sequence_length=6, eos_token_id=2, pad_token_id=pad)
    assert res["position_ids"].shape == (1, 3, 6)
    # after shift 1: prompt positions [0,1], responses extend last+1, last+2
    np.testing.assert_array_equal(res["position_ids"][0, 0, :4], [0, 1, 2, 3])
    np.testing.assert_array_equal(res["position_ids"][0, 1, :4], [10, 11, 12, 13])
    np.testing.assert_array_equal(res["input_ids"][0], [5, 6, 30, 31, pad, pad])


def test_running_moments_vs_numpy():
    rm = fn.RunningMoments()
    rng = np.random.default_rng(6)
    all_x = []
    for _ in range(5):
        x = rng.normal(loc=3.0, scale=2.0, size=100)
        all_x.append(x)
        rm.update(x)
    cat = np.concatenate(all_x)
    assert abs(rm.mean - cat.mean()) < 1e-6
    assert abs(rm.std - cat.std(ddof=1)) < 1e-6


def test_kl_controllers():
    from socioreasoner_tpu.utils.kl_controller import AdaptiveKLController, FixedKLController
    c = AdaptiveKLController(0.1, target=0.05, horizon=100)
    c.update(current=0.5, n_steps=10)
    assert c.value > 0.1  # KL too high → increase coef
    f = FixedKLController(0.2)
    f.update(1.0, 5)
    assert f.value == 0.2
