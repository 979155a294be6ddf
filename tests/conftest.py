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


# ---------------------------------------------------------------- fast/slow
# The full suite is ~45 min serial on CPU (multi-second jit compiles dominate);
# the dev loop (`make test`) runs `-m "not slow"` in ~3 min. Marks are applied
# centrally here from measured durations (2026-08-17, -q --durations=60) so a
# new heavy test only needs its file/id added below.
SLOW_FILES = {
    "test_train_pipeline_e2e.py", "test_infer_pipeline_e2e.py",
    "test_math_vlm_pipeline.py", "test_mesh_wiring.py", "test_train_step.py",
    "test_export.py", "test_pipeline_parallel.py", "test_sft_dpo.py",
    "test_llm_families.py", "test_qwen25vl_parity.py", "test_qwen2vl_parity.py",
    "test_sam2_parity.py", "test_flash_bwd.py", "test_flash_attention.py",
    "test_decode_engine.py", "test_agentic_and_critic.py",
    "test_rlvr_generic.py", "test_minibatch_train.py", "test_multihost.py",
}
SLOW_TESTS = {
    "tests/test_runtime.py::test_generate_scheduler_level1",
    "tests/test_sampling_approx.py::test_exact_mode_matches_full_masked_softmax_distribution",
    "tests/test_parallel.py::test_cp_train_and_logprob_match_dense",
    "tests/test_parallel.py::test_strategy_honors_context_parallel_knob",
    "tests/test_decode_attention.py::test_int8_cache_decode_step_close_to_fp",
    "tests/test_decode_attention.py::test_paged_decode_int8_matches_dequantized_dense",
    "tests/test_decode_attention.py::test_engine_int8_kv_smoke",
}


def pytest_collection_modifyitems(config, items):
    for item in items:
        if (item.fspath.basename in SLOW_FILES
                or item.nodeid in SLOW_TESTS):
            item.add_marker(pytest.mark.slow)


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
