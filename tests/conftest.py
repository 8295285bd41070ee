"""Test harness: force an 8-device virtual CPU mesh before JAX import.

Multi-chip sharding is validated the standard JAX way — N fake host
devices via XLA_FLAGS — because only a single physical TPU chip is
available in CI (SURVEY.md section 4 test strategy).
"""

import os

# Force CPU: the ambient environment selects the tunneled TPU backend
# (JAX_PLATFORMS=axon), which would make every test compile over the
# tunnel. Tests must be hermetic and multi-device (8 virtual CPU devices).
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")
# This environment's default matmul precision is bf16-grade even for f32
# inputs (observed ~0.4% error); golden-value parity tests need true f32.
os.environ["JAX_DEFAULT_MATMUL_PRECISION"] = "highest"

# The container's sitecustomize pre-imports jax in EVERY python process,
# so the env vars above were already consumed — re-apply through the
# config API (the backend itself initialises lazily, so platform and
# XLA_FLAGS still take effect at first use).
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
