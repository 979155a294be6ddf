"""Cross-mesh weight transfer, resource manager, collective helpers."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from socioreasoner_tpu.configs.worker_config import StrategyArguments, WorkerConfig
from socioreasoner_tpu.distributed.transfer import (ModelUpdateGroup,
                                                    leaf_buckets, transfer_params)
from socioreasoner_tpu.parallel.mesh import make_mesh
from socioreasoner_tpu.runtime.resource_manager import ResourceManager


def test_leaf_buckets():
    params = {"a": jnp.zeros((100, 100), jnp.float32),    # 40 KB
              "b": jnp.zeros((200, 200), jnp.float32),    # 160 KB
              "c": jnp.zeros((10,), jnp.float32)}
    buckets = leaf_buckets(params, bucket_bytes=100 * 1024)
    assert len(buckets) >= 2
    total = sum(len(b) for b in buckets)
    assert total == 3


def test_transfer_params_across_meshes():
    devs = jax.devices()
    mesh_a = make_mesh(dp=1, fsdp=2, tp=2, devices=devs[:4])
    mesh_b = make_mesh(dp=1, fsdp=1, tp=4, devices=devs[4:])
    params = {"w": jnp.arange(64, dtype=jnp.float32).reshape(8, 8),
              "b": jnp.arange(8, dtype=jnp.float32)}
    src_shardings = {"w": NamedSharding(mesh_a, P("fsdp", "tp")),
                     "b": NamedSharding(mesh_a, P())}
    tgt_shardings = {"w": NamedSharding(mesh_b, P(None, "tp")),
                     "b": NamedSharding(mesh_b, P())}
    src = jax.device_put(params, src_shardings)
    moved = transfer_params(src, tgt_shardings, bucket_bytes=128)
    np.testing.assert_array_equal(np.array(moved["w"]), np.array(params["w"]))
    assert moved["w"].sharding.mesh == mesh_b
    # no bucketing path
    moved2 = transfer_params(src, tgt_shardings, bucket_bytes=None)
    np.testing.assert_array_equal(np.array(moved2["b"]), np.array(params["b"]))


def test_resource_manager_meshes():
    rm = ResourceManager()
    cfg_a = WorkerConfig(device_mapping="list(range(0,4))",
                         strategy_args=StrategyArguments(
                             strategy_config={"tensor_model_parallel_size": 2}))
    cfg_b = WorkerConfig(device_mapping="list(range(4,8))")
    mesh_a = rm.allocate_mesh("actor_train", cfg_a)
    mesh_b = rm.allocate_mesh("actor_infer", cfg_b)
    assert mesh_a.shape["tp"] == 2 and mesh_a.shape["fsdp"] == 2
    assert mesh_b.shape["fsdp"] == 4
    assert not rm.colocated("actor_train", "actor_infer")
    cfg_c = WorkerConfig(device_mapping=[0, 1])
    rm.allocate_mesh("reward", cfg_c)
    assert rm.colocated("actor_train", "reward")
    with pytest.raises(ValueError, match="exceeds"):
        rm.allocate_mesh("bad", WorkerConfig(device_mapping=[99]))


def test_collective_helpers(mesh8):
    from socioreasoner_tpu.utils.collective import allreduce, broadcast
    x = jnp.array([1.0, 2.0])
    out = allreduce(x, mesh8, "tp", op="sum")
    np.testing.assert_allclose(np.array(out), [2.0, 4.0])  # tp size 2
    out_mean = allreduce(x, mesh8, "fsdp", op="mean")
    np.testing.assert_allclose(np.array(out_mean), [1.0, 2.0])
    b = broadcast(jnp.array(5.0), mesh8, "dp", src=0)
    assert float(b) == 5.0


def test_model_update_group_frequency():
    calls = {"src": 0, "tgt": 0}

    class FakeStrategy:
        def __init__(self, name):
            self.name = name
        def model_update(self):
            calls[self.name] += 1

    g = ModelUpdateGroup(FakeStrategy("src"), FakeStrategy("tgt"), frequency=2)
    for step in range(4):
        g.model_update(step)
    assert calls == {"src": 2, "tgt": 2}   # steps 0 and 2 only
