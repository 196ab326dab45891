"""Test harness: force an 8-device virtual CPU platform BEFORE jax import.

Multi-chip sharding tests run against this virtual mesh
(XLA_FLAGS=--xla_force_host_platform_device_count=8), mirroring how the driver
dry-run-compiles the multi-chip path. Real-TPU behavior is exercised by
bench.py, not the unit suite.
"""

import os
import sys
from pathlib import Path

# HARD-set (not setdefault): the TPU-tunnel kernel env exports
# JAX_PLATFORMS=axon, so a setdefault silently leaves the suite running on
# the single tunneled TPU chip — slow (every dispatch pays a ~30 ms relay
# round trip), contended with any concurrent TPU job, and with 1 device
# instead of the virtual 8 the sharding tests need.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

REPO_ROOT = Path(__file__).resolve().parent.parent
if str(REPO_ROOT) not in sys.path:
    sys.path.insert(0, str(REPO_ROOT))

import jax  # noqa: E402

# The TPU-tunnel sitecustomize in this image force-registers the 'axon'
# platform and overrides jax_platforms, ignoring the env var — which also
# makes concurrent test/train processes serialize on the single TPU. Re-apply
# the env selection through the config API (this wins over the sitecustomize).
jax.config.update("jax_platforms", "cpu")
assert jax.default_backend() == "cpu", (
    "unit tests must run on the virtual CPU mesh, not the tunneled TPU; "
    f"got {jax.default_backend()!r}")

# Persistent XLA compilation cache: the suite's cost on this 1-core box is
# dominated by CPU compiles of shapes that never change between runs (env
# scans, agent updates, interpret-mode Pallas). Keyed on HLO, so edits that
# change a traced program re-compile exactly that program.
_CACHE_DIR = os.environ.get("JAX_TEST_COMPILATION_CACHE",
                            str(Path.home() / ".cache" / "ldp_tpu_test_xla"))
jax.config.update("jax_compilation_cache_dir", _CACHE_DIR)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

import pytest  # noqa: E402


def pytest_configure(config):
    # fast CI tier: `pytest -m "not slow"` (<~4 min on this 1-core box);
    # slow = interpret-mode Pallas kernels + compile-heavy env/agent suites
    config.addinivalue_line(
        "markers",
        "slow: compile-heavy (interpret-mode Pallas, env rollouts, agents)")


@pytest.fixture(scope="session")
def devices():
    return jax.devices()


@pytest.fixture(scope="session")
def rng():
    return jax.random.PRNGKey(0)
