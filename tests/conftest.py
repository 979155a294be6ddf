"""Test harness config: run everything on a virtual 8-device CPU mesh.

Multi-chip hardware is not available in CI; sharding/collective tests use
XLA's host-platform device-count override (SURVEY.md §4 test strategy).
"""

import os

# Force CPU even when the launcher exports JAX_PLATFORMS (e.g. a real TPU
# plugin): the suite is written against the virtual 8-device mesh.
os.environ["JAX_PLATFORMS"] = os.environ.get("SOCIO_TEST_PLATFORM", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402  (import after env is set)

# A sitecustomize may have imported jax (and latched JAX_PLATFORMS) before
# this file runs — override via jax.config, which works until backend init.
jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def devices():
    return jax.devices()


@pytest.fixture(scope="session")
def mesh8():
    from socioreasoner_tpu.parallel.mesh import make_mesh
    return make_mesh(dp=2, fsdp=2, tp=2)


@pytest.fixture
def rng():
    return np.random.default_rng(0)
