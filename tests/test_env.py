"""Harness sanity: tests must run on the 8-device virtual CPU mesh with
full-precision f32 matmuls (see conftest.py; the container pre-imports
jax with the TPU-tunnel backend selected)."""

import jax
import jax.numpy as jnp
import numpy as np


def test_backend_is_cpu_with_8_devices():
    assert jax.default_backend() == "cpu"
    assert len(jax.devices()) == 8


def test_matmul_precision_is_exact_f32():
    rng = np.random.default_rng(0)
    a = rng.standard_normal((64, 64)).astype(np.float32)
    b = rng.standard_normal((64, 64)).astype(np.float32)
    got = np.asarray(jnp.asarray(a) @ jnp.asarray(b))
    exact = (a.astype(np.float64) @ b.astype(np.float64)).astype(np.float32)
    assert np.abs(got - exact).max() < 1e-4
