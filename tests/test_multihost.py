"""Multihost smoke test: two real jax.distributed CPU processes through the
runtime launcher contract (VERDICT r2 item 10; ref initialize.py:26-51 runs
the RANK/MASTER_ADDR path in production — here we actually exercise it)."""

import os
import socket
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def test_two_process_init_and_broadcast():
    port = _free_port()
    procs = []
    for rank in range(2):
        env = dict(os.environ)
        env.update({
            "RANK": str(rank), "WORLD_SIZE": "2",
            "MASTER_ADDR": "127.0.0.1", "MASTER_PORT": str(port),
            "JAX_PLATFORMS": "cpu",
            "PALLAS_AXON_POOL_IPS": "",          # no TPU plugin claim
            "PYTHONPATH": REPO + os.pathsep + env.get("PYTHONPATH", ""),
        })
        # the parent test process forces a virtual 8-device mesh; children
        # must not inherit it (1 CPU device per process)
        env["XLA_FLAGS"] = " ".join(
            f for f in env.get("XLA_FLAGS", "").split()
            if "xla_force_host_platform_device_count" not in f)
        procs.append(subprocess.Popen(
            [sys.executable, os.path.join(REPO, "tests", "_multihost_worker.py")],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT))
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=240)
        outs.append(out.decode(errors="replace"))
    for rank, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"rank {rank} failed:\n{out}"
        assert f"rank {rank} OK" in out


def test_two_process_grpo_train_step():
    """2-process × 4-virtual-device GRPO train step (VERDICT r4 item 7):
    global dp=2×fsdp=2×tp=2 mesh over jax.distributed, SPMD-replicated host
    driver, per-process DP decode replica. See _multihost_train_worker.py for
    the multi-slice execution-model notes."""
    port = _free_port()
    procs = []
    for rank in range(2):
        env = dict(os.environ)
        env.update({
            "RANK": str(rank), "WORLD_SIZE": "2",
            "MASTER_ADDR": "127.0.0.1", "MASTER_PORT": str(port),
            "JAX_PLATFORMS": "cpu",
            "PALLAS_AXON_POOL_IPS": "",
            "PYTHONPATH": REPO + os.pathsep + env.get("PYTHONPATH", ""),
        })
        flags = [f for f in env.get("XLA_FLAGS", "").split()
                 if "xla_force_host_platform_device_count" not in f]
        env["XLA_FLAGS"] = " ".join(
            flags + ["--xla_force_host_platform_device_count=4"])
        procs.append(subprocess.Popen(
            [sys.executable,
             os.path.join(REPO, "tests", "_multihost_train_worker.py")],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT))
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=600)
        outs.append(out.decode(errors="replace"))
    for rank, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"rank {rank} failed:\n{out}"
        assert f"rank {rank} TRAIN OK" in out
    # both processes computed the SAME loss (one global program)
    losses = [o.split("loss=")[1].split()[0] for o in outs]
    assert losses[0] == losses[1], losses
