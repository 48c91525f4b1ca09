"""Test configuration.

Tests run on a virtual 8-device CPU platform so that multi-chip sharding code
paths (``sparse_matrix_tpu.parallel``) are exercised without TPU hardware.
Note: this environment's axon plugin force-selects ``jax_platforms=axon,cpu``
at interpreter start, so the env var alone is not enough — we must override
the config after importing jax.
"""

import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

# tests must not read this machine's autotune calibration cache: dispatch
# assertions are written against the packaged v5e defaults (individual
# tests repoint this to tmp files to test calibration-driven dispatch)
os.environ.setdefault("SPMX_AUTOTUNE_CACHE", "/nonexistent/spmx-autotune-off.json")

import jax  # noqa: E402

# SPMX_TPU_TESTS=1 keeps the real backend so tests/test_tpu_kernels.py can
# exercise the actual Mosaic kernels (everything else skips itself there).
if os.environ.get("SPMX_TPU_TESTS", "0") in ("", "0"):
    jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402

from hypothesis import settings, HealthCheck  # noqa: E402

settings.register_profile(
    "default",
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.data_too_large],
    max_examples=50,
)
settings.register_profile("deep", parent=settings.get_profile("default"), max_examples=1000)
settings.load_profile(os.environ.get("HYPOTHESIS_PROFILE", "default"))


@pytest.fixture
def rng():
    return np.random.default_rng(0)
