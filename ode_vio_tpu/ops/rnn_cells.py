"""Recurrent cells as pure param-pytree functions (cuDNN RNN/GRU/LSTM
replacement — /root/reference/src/models/PoseODERNN.py:139-148,
PoseRNN.py:76-85).

Cells are deliberately NOT flax modules: the pose cores call them inside
``lax.scan``/``lax.while_loop`` bodies, where pure closures over concrete
param arrays are the clean pattern. Weight layout and gate order follow
torch conventions (GRU gates r,z,n; LSTM gates i,f,g,o; weights stored
``(out, in)``) so converted reference checkpoints drop in unchanged.

Default initialisation matches torch's nn.RNN/nn.GRU:
``U(-1/sqrt(H), 1/sqrt(H))`` for every weight and bias (the reference's
``initialization`` pass touches only *Cell variants, leaving the stacked
RNN/GRU at torch defaults — DeepVIO.py:92-122).

A fused one-matmul formulation: each step computes
``x @ W_ihᵀ + h @ W_hhᵀ`` as two MXU matmuls over the whole batch; gate
nonlinearities are elementwise VPU ops that XLA fuses into the matmul
epilogue.
"""

from __future__ import annotations

from typing import Any, Dict, List

import jax
import jax.numpy as jnp

GATES = {"rnn": 1, "gru": 3, "lstm": 4}


def init_cell(key, cell_type: str, input_size: int, hidden_size: int) -> Dict[str, Any]:
    """One layer's parameters, torch layout: w_ih (G*H, in), w_hh (G*H, H),
    b_ih (G*H,), b_hh (G*H,)."""
    g = GATES[cell_type]
    bound = 1.0 / jnp.sqrt(hidden_size)
    k1, k2, k3, k4 = jax.random.split(key, 4)
    u = lambda k, shape: jax.random.uniform(k, shape, jnp.float32, -bound, bound)
    return {
        "w_ih": u(k1, (g * hidden_size, input_size)),
        "w_hh": u(k2, (g * hidden_size, hidden_size)),
        "b_ih": u(k3, (g * hidden_size,)),
        "b_hh": u(k4, (g * hidden_size,)),
    }


def init_stack(key, cell_type: str, input_size: int, hidden_size: int,
               num_layers: int) -> List[Dict[str, Any]]:
    """Multi-layer stack; layer l>0 consumes layer l-1's output."""
    keys = jax.random.split(key, num_layers)
    return [
        init_cell(k, cell_type, input_size if l == 0 else hidden_size, hidden_size)
        for l, k in enumerate(keys)
    ]


def rnn_tanh_cell(params, x, h):
    """h' = tanh(x W_ihᵀ + b_ih + h W_hhᵀ + b_hh)."""
    return jnp.tanh(
        x @ params["w_ih"].T + params["b_ih"] + h @ params["w_hh"].T + params["b_hh"]
    )


def gru_cell(params, x, h):
    """torch GRU gate order (r, z, n):
    r = sigma(gi_r + gh_r); z = sigma(gi_z + gh_z);
    n = tanh(gi_n + r * gh_n); h' = (1 - z) n + z h."""
    gi = x @ params["w_ih"].T + params["b_ih"]
    gh = h @ params["w_hh"].T + params["b_hh"]
    gi_r, gi_z, gi_n = jnp.split(gi, 3, axis=-1)
    gh_r, gh_z, gh_n = jnp.split(gh, 3, axis=-1)
    r = jax.nn.sigmoid(gi_r + gh_r)
    z = jax.nn.sigmoid(gi_z + gh_z)
    n = jnp.tanh(gi_n + r * gh_n)
    return (1.0 - z) * n + z * h


def lstm_cell(params, x, hc):
    """torch LSTM gate order (i, f, g, o); state is (h, c)."""
    h, c = hc
    gates = (
        x @ params["w_ih"].T + params["b_ih"] + h @ params["w_hh"].T + params["b_hh"]
    )
    i, f, g, o = jnp.split(gates, 4, axis=-1)
    c_new = jax.nn.sigmoid(f) * c + jax.nn.sigmoid(i) * jnp.tanh(g)
    h_new = jax.nn.sigmoid(o) * jnp.tanh(c_new)
    return h_new, c_new


def step_stack(cell_type: str, stack_params, x, h):
    """Advance a multi-layer stack one timestep.

    x: (B, in). h: (L, B, H) hidden states (LSTM: tuple of (L,B,H)).
    Returns (top-layer output (B, H), new hidden (L, B, H)).
    """
    if cell_type == "rnn":
        cell = rnn_tanh_cell
    elif cell_type == "gru":
        cell = gru_cell
    elif cell_type == "lstm":
        new_h, new_c = [], []
        inp = x
        for l, p in enumerate(stack_params):
            hl, cl = lstm_cell(p, inp, (h[0][l], h[1][l]))
            new_h.append(hl)
            new_c.append(cl)
            inp = hl
        return inp, (jnp.stack(new_h), jnp.stack(new_c))
    else:
        raise ValueError(f"cell type '{cell_type}' not supported")

    new_h = []
    inp = x
    for l, p in enumerate(stack_params):
        hl = cell(p, inp, h[l])
        new_h.append(hl)
        inp = hl
    return inp, jnp.stack(new_h)
