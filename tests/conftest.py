"""Test configuration.

Tests run on a virtual 8-device CPU platform so that multi-chip sharding code
paths (``sparse_matrix_tpu.parallel``) are exercised without TPU hardware, per
the project environment contract. Must run before the first ``import jax``.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

import numpy as np  # noqa: E402
import pytest  # noqa: E402

from hypothesis import settings, HealthCheck  # noqa: E402

# Property tests compile nothing by default (host formats) but device-kernel
# properties jit-compile; keep deadlines off.
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
