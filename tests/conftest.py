"""Test environment: virtual 8-device CPU mesh, float64 enabled.

Must run before the first `import jax` anywhere in the test session.
Filter math is validated in float64 on CPU (golden/finite-difference
tests); TPU execution is exercised by bench.py and __graft_entry__.py.
"""

import os

# The harness environment pins JAX_PLATFORMS=axon (the tunneled TPU); tests
# must run on the local CPU backend -- override unconditionally.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import numpy as np  # noqa: E402
import pytest  # noqa: E402

from openekfmonoslam_tpu.config import SlamConfig  # noqa: E402


@pytest.fixture(scope="session")
def config():
    return SlamConfig(max_features=8, max_keypoints=64, dtype="float64")


@pytest.fixture
def rng():
    return np.random.default_rng(42)
