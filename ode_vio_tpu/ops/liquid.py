"""Liquid time-constant cells: CfC (closed-form continuous) and LTC.

TPU-native replacement for the `ncps` dependency used by the reference's
(inactive) PoseNCP path (/root/reference/src/models/PoseNCP.py:4-27; the
reference dispatcher raises NotImplementedError for 'ltc', DeepVIO.py:58-59
— here both cells are functional).

* CfC — the closed-form continuous-depth cell (Hasani et al., 2022,
  'default' mode): two candidate states blended by a learned sigmoidal
  time gate, so irregular timestamps enter through the elapsed time
  directly with no ODE solve.
* LTC — liquid time-constant dynamics
      dh/dt = -(1/tau + f(x, h)) * h + f(x, h) * A
  integrated over the step's elapsed time with fused semi-implicit Euler
  unfolds (unconditionally stable; the standard LTC discretisation), each
  unfold one batched matmul + elementwise VPU work.
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp

from ode_vio_tpu.ops.mlp import init_linear


def _linear(p, x):
    return x @ p["w"].T + p["b"]


# ---------------------------------------------------------------------------
# CfC
# ---------------------------------------------------------------------------

def init_cfc(key, input_size: int, hidden_size: int,
             backbone_units: int = 128) -> Dict[str, Any]:
    ks = jax.random.split(key, 5)
    cat = input_size + hidden_size
    return {
        "backbone": init_linear(ks[0], cat, backbone_units),
        "ff1": init_linear(ks[1], backbone_units, hidden_size),
        "ff2": init_linear(ks[2], backbone_units, hidden_size),
        "time_a": init_linear(ks[3], backbone_units, hidden_size),
        "time_b": init_linear(ks[4], backbone_units, hidden_size),
    }


def cfc_cell(params, x, h, elapsed):
    """One CfC update. x (B, in), h (B, H), elapsed (B,) or scalar > 0."""
    z = jnp.tanh(_linear(params["backbone"], jnp.concatenate([x, h], -1)))
    ff1 = jnp.tanh(_linear(params["ff1"], z))
    ff2 = jnp.tanh(_linear(params["ff2"], z))
    t_a = _linear(params["time_a"], z)
    t_b = _linear(params["time_b"], z)
    elapsed = jnp.asarray(elapsed)
    if elapsed.ndim == 1:
        elapsed = elapsed[:, None]
    gate = jax.nn.sigmoid(t_a * elapsed + t_b)
    return ff1 * (1.0 - gate) + ff2 * gate


# ---------------------------------------------------------------------------
# LTC
# ---------------------------------------------------------------------------

def init_ltc(key, input_size: int, hidden_size: int) -> Dict[str, Any]:
    ks = jax.random.split(key, 3)
    return {
        "w_x": init_linear(ks[0], input_size, hidden_size),
        "w_h": init_linear(ks[1], hidden_size, hidden_size),
        # log-parameterised time constant (positive), reversal potential A
        "log_tau": jnp.zeros((hidden_size,)),
        "A": 0.1 * jax.random.normal(ks[2], (hidden_size,)),
    }


def ltc_cell(params, x, h, elapsed, unfolds: int = 6):
    """Semi-implicit Euler integration of the LTC dynamics over `elapsed`:

        h <- (h + dt * f * A) / (1 + dt * (1/tau + f))

    with conductance f = sigmoid(W_x x + W_h h + b); `unfolds` sub-steps.
    """
    elapsed = jnp.asarray(elapsed)
    if elapsed.ndim == 1:
        elapsed = elapsed[:, None]
    dt = elapsed / unfolds
    inv_tau = jnp.exp(-params["log_tau"])
    gx = _linear(params["w_x"], x)  # input conductance drive, constant per step

    def body(h, _):
        f = jax.nn.sigmoid(gx + _linear(params["w_h"], h))
        h_new = (h + dt * f * params["A"]) / (1.0 + dt * (inv_tau + f))
        return h_new, None

    h_final, _ = jax.lax.scan(body, h, None, length=unfolds)
    return h_final
