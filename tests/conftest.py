"""Test configuration: force the JAX CPU backend with 8 virtual devices so
multi-chip sharding (pjit / shard_map over a Mesh) is exercised without TPU
hardware. This must run before jax is imported anywhere."""

import os

# JEGAL_TEST_TPU=1 runs the suite against the real chip instead (used for
# the on-chip Pallas-kernel parity tests, which skip on CPU).
_USE_TPU = os.environ.get("JEGAL_TEST_TPU") == "1"

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ.setdefault("TOKENIZERS_PARALLELISM", "false")

import numpy as np  # noqa: E402
import pytest  # noqa: E402
import jax  # noqa: E402

# The axon TPU plugin overrides the JAX_PLATFORMS env var; force the CPU
# backend in-process so the 8-virtual-device mesh is available and tests are
# hermetic w.r.t. the tunnel-attached TPU.
if not _USE_TPU:
    jax.config.update("jax_platforms", "cpu")

# Parity tests compare fp32 numerics against torch; the XLA:CPU default
# matmul precision is lower (oneDNN bf16-ish). Pin to full fp32 for tests.
jax.config.update("jax_default_matmul_precision", "highest")


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(0)
