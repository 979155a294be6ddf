"""Trace capture + xplane per-op summary (utils/profiling.py)."""

import jax
import jax.numpy as jnp

from socioreasoner_tpu.utils.profiling import format_op_table, trace_summary


def test_trace_summary_collects_ops(tmp_path):
    @jax.jit
    def f(x):
        return (x @ x.T).sum()

    out = trace_summary(f, jnp.ones((128, 128)), log_dir=str(tmp_path))
    assert out["wall_s"] > 0
    assert float(out["result"]) == 128 * 128 * 128
    assert out["ops"], "no ops parsed from the trace"
    for row in out["ops"]:
        assert row["total_us"] >= 0 and row["count"] >= 1
    table = format_op_table(out["ops"], 5)
    assert "total_ms" in table and len(table.splitlines()) >= 2
