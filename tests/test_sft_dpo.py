"""Sequence packing + DPO trainer."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from socioreasoner_tpu.distributed.sft import make_dpo_step, pack_sequences
from socioreasoner_tpu.distributed.trainer import TrainState, make_optimizer
from socioreasoner_tpu.models.qwen2_5_vl.config import Qwen25VLConfig
from socioreasoner_tpu.models.qwen2_5_vl import model as qmodel


def test_pack_sequences():
    rng = np.random.default_rng(0)
    samples = [{"input_ids": rng.integers(2, 100, size=n)}
               for n in (30, 20, 25, 10, 64, 5)]
    rows = pack_sequences(samples, max_len=64, pad_id=0)
    # every token preserved
    total = sum((r["input_ids"] != 0).sum() for r in rows)
    assert total == sum(min(len(s["input_ids"]), 64) for s in samples)
    for r in rows:
        assert r["input_ids"].shape == (64,)
        assert r["position_ids"].shape == (3, 64)
        # positions restart at each packed segment
        seg = r["segment_ids"]
        for si in np.unique(seg[seg > 0]):
            where = np.nonzero(seg == si)[0]
            np.testing.assert_array_equal(r["position_ids"][0][where],
                                          np.arange(len(where)))


@pytest.mark.parametrize("loss_type", ["sigmoid", "ipo", "orpo"])
def test_dpo_step_improves_margin(loss_type):
    config = Qwen25VLConfig.tiny(256)
    params = qmodel.init_params(config, jax.random.key(0), jnp.float32,
                                with_vision=False)
    opt = make_optimizer(lr=5e-4)
    state = TrainState.create(params, opt)
    step = jax.jit(make_dpo_step(config, opt, beta=0.5, loss_type=loss_type))

    rng = np.random.default_rng(1)
    B, L = 2, 10
    def mk(seed):
        r = np.random.default_rng(seed)
        ids = r.integers(2, 200, size=(B, L))
        attn = np.ones((B, L), np.int64)
        pos = np.broadcast_to(np.arange(L)[None, None], (B, 3, L)).copy()
        loss_mask = np.zeros((B, L), np.int32)
        loss_mask[:, 4:] = 1
        return ids, attn, pos, loss_mask
    c_ids, c_attn, c_pos, c_lm = mk(2)
    r_ids, r_attn, r_pos, r_lm = mk(3)
    batch = {
        "chosen_input_ids": jnp.asarray(c_ids), "chosen_attention_mask": jnp.asarray(c_attn),
        "chosen_position_ids": jnp.asarray(c_pos), "chosen_loss_mask": jnp.asarray(c_lm),
        "rejected_input_ids": jnp.asarray(r_ids), "rejected_attention_mask": jnp.asarray(r_attn),
        "rejected_position_ids": jnp.asarray(r_pos), "rejected_loss_mask": jnp.asarray(r_lm),
        "ref_chosen_logps": jnp.zeros(B), "ref_rejected_logps": jnp.zeros(B),
    }
    margins = []
    for _ in range(5):
        state, m = step(state, batch)
        margins.append(float(m["dpo/margin"]))
    assert margins[-1] > margins[0]    # preference margin grows on fixed batch
    assert np.isfinite(margins).all()
