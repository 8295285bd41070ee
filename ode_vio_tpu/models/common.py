"""Shared model components."""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

# torch kaiming_normal_ parity: gain sqrt(2), fan_in, normal distribution
# (the reference's global init pass, DeepVIO.py:77-122).
KAIMING = nn.initializers.variance_scaling(2.0, "fan_in", "normal")


class PoseRegressor(nn.Module):
    """hidden -> 128 -> 6-DoF relative pose head
    (PoseODERNN.py:64-68 / PoseCDE.py:68-72 / PoseRNN.py:48-52)."""

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        x = nn.Dense(128, kernel_init=KAIMING, name="fc0")(x)
        x = nn.leaky_relu(x, 0.1)
        return nn.Dense(6, kernel_init=KAIMING, name="fc1")(x)
