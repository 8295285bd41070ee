"""Pure-function MLPs for continuous-time vector fields.

The ODE/CDE dynamics networks (/root/reference/src/models/ODEFunc.py:5-84)
are plain Linear stacks; they are evaluated inside solver loops, so — like
the RNN cells — they live as param-pytree pure functions rather than flax
modules (closures over concrete arrays are what ``lax.while_loop`` bodies
want).

Init parity note: the reference first initialises these layers N(0, 0.1)
(ODEFunc.py:19-22) but DeepVIO's global ``initialization`` pass then
overwrites every nn.Linear with kaiming-normal (DeepVIO.py:42-43, 77-122,
runs *after* submodule construction). We therefore default to
kaiming-normal and expose ``init_scheme='normal'`` for the standalone
ODEFunc behaviour.
"""

from __future__ import annotations

from typing import Any, Dict, List, Sequence

import jax
import jax.numpy as jnp

ACTIVATIONS = {
    "tanh": jnp.tanh,
    "relu": jax.nn.relu,
    "leaky_relu": lambda x: jax.nn.leaky_relu(x, 0.01),  # torch default slope
    "softplus": jax.nn.softplus,
}


def get_activation(name: str):
    try:
        return ACTIVATIONS[name]
    except KeyError:
        raise ValueError(
            f"Activation '{name}' not supported; choose from {sorted(ACTIVATIONS)}"
        ) from None


def init_linear(key, in_dim: int, out_dim: int, scheme: str = "kaiming"):
    """torch layout: w (out, in), b (out,)."""
    if scheme == "kaiming":
        # torch kaiming_normal_ default: gain sqrt(2), fan_in
        std = jnp.sqrt(2.0 / in_dim)
        w = std * jax.random.normal(key, (out_dim, in_dim))
    elif scheme == "normal":
        w = 0.1 * jax.random.normal(key, (out_dim, in_dim))
    else:
        raise ValueError(f"unknown init scheme '{scheme}'")
    return {"w": w, "b": jnp.zeros((out_dim,))}


def init_mlp(key, sizes: Sequence[int], scheme: str = "kaiming") -> List[Dict[str, Any]]:
    keys = jax.random.split(key, len(sizes) - 1)
    return [
        init_linear(k, sizes[i], sizes[i + 1], scheme) for i, k in enumerate(keys)
    ]


def apply_mlp(params, x, activation: str, final_tanh: bool = True):
    """Linear -> act -> ... -> Linear [-> tanh]. The trailing tanh bounds
    the vector field (ODEFunc.py:14 'improves training')."""
    act = get_activation(activation)
    for layer in params[:-1]:
        x = act(x @ layer["w"].T + layer["b"])
    x = x @ params[-1]["w"].T + params[-1]["b"]
    return jnp.tanh(x) if final_tanh else x


def ode_func_sizes(feature_dim: int, hidden_dim: int, num_hidden_layers: int):
    """feature -> hidden x num_hidden_layers -> feature
    (ODEFunc.py:8-13: one in-layer + (n-1) hidden + out)."""
    return [feature_dim] + [hidden_dim] * num_hidden_layers + [feature_dim]


def cde_func_sizes(input_dim: int, hidden_dim: int, num_hidden_layers: int):
    """hidden -> hidden x num_hidden_layers -> hidden*input_dim, reshaped to
    the (hidden, input_dim) CDE field matrix (ODEFunc.py:51-58, 82-84)."""
    return [hidden_dim] + [hidden_dim] * num_hidden_layers + [hidden_dim * input_dim]


def apply_cde_func(params, z, activation: str, hidden_dim: int, input_dim: int):
    out = apply_mlp(params, z, activation, final_tanh=True)
    return out.reshape(out.shape[:-1] + (hidden_dim, input_dim))
