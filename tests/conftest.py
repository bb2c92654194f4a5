"""Test configuration: run everything on a virtual 8-device CPU mesh so
multi-chip sharding is exercised without TPU hardware."""

import os

# Hard-override the machine's axon/TPU preset (the plugin ignores a plain
# JAX_PLATFORMS=cpu, so belt and braces, including the config knob below).
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["JAX_PLATFORM_NAME"] = "cpu"
os.environ["PJRT_DEVICE"] = "CPU"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
# Persistent compile cache: the training-quality gate rebuilds the same
# step programs every run; cached, its 4-minute compile drops to seconds.
jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.dirname(
                      os.path.abspath(__file__))), ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

import numpy as np  # noqa: E402
import pytest  # noqa: E402

# Two-tier suite: `pytest -m quick` (~3 min) for the edit loop,
# bare `pytest tests/` (everything, ~13 min) before commits.
# Anything measured >~6 s on the virtual 8-device CPU mesh is `slow`.
_SLOW_TESTS = {
    "test_trains_to_psnr",                      # 250 s fixture
    "test_gaussian_dim3",
    "test_multichunk_saturation",
    "test_train_smoke",
    "test_batch_stats_match_reference_semantics",
    "test_block_sweep_recall_and_rigid_error",
    "test_mean2d_tap_gradient",
    "test_strips_sharded_gradients",
    "test_strips_match_full_frame",
    "test_pallas_overflow_is_whole_gaussian_truncation",
    "test_unroll2_matches_unroll1",
    "test_pallas_gradients_match_oracle",
    "test_seed_determinism",
    "test_pallas_forward_matches_xla",
    "test_trainer_overflow_grow_then_clean",
    "test_empty_tiles_interleaved",
    "test_resume_is_bit_exact",
    "test_trainer_uses_sharded_step_on_mesh",
    "test_strips_step_matches_full_frame",
    "test_oracle_combos_4d",
    "test_env_adam_gradients_flow",
    "test_fast_grad_reduce_close_to_exact",
    "test_sharded_step_matches_single_device",
    "test_dim4_separable_time",
    "test_sharded_step_pallas_backend",
}
_SLOW_MODULES = ("test_multihost", "test_training_quality")


def pytest_configure(config):
    config.addinivalue_line("markers", "slow: >6s on the CPU mesh")
    config.addinivalue_line("markers", "quick: edit-loop tier (-m quick)")


def pytest_collection_modifyitems(config, items):
    for it in items:
        base = it.name.split("[")[0]
        if base in _SLOW_TESTS or any(m in str(it.fspath)
                                      for m in _SLOW_MODULES):
            it.add_marker(pytest.mark.slow)
        else:
            it.add_marker(pytest.mark.quick)


@pytest.fixture
def rng():
    return np.random.default_rng(0)
