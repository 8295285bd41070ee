"""PoseRNN — discrete recurrent baseline (no continuous-time evolution).

Parity with /root/reference/src/models/PoseRNN.py:37-91: the same fusion,
multi-layer RNN/GRU and regressor as PoseODERNN but the hidden state passes
between frames unchanged (timestamps unused). One ``lax.scan`` over time.
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax.numpy as jnp
from jax import lax

from ode_vio_tpu.config import ModelConfig
from ode_vio_tpu.models.common import PoseRegressor
from ode_vio_tpu.models.fusion import FusionModule
from ode_vio_tpu.ops.rnn_cells import init_stack, step_stack


class PoseRNN(nn.Module):
    cfg: ModelConfig

    @nn.compact
    def __call__(
        self,
        fv: jnp.ndarray,
        fi: jnp.ndarray,
        ts: jnp.ndarray,               # accepted for interface parity; unused
        prev: Optional[jnp.ndarray] = None,
        train: bool = False,
    ):
        cfg = self.cfg
        F = cfg.f_len
        L = cfg.rnn_num_layers
        B = fv.shape[0]

        fused = FusionModule(F, cfg.fuse_method, name="fuse")(fv, fi)
        rnn_params = self.param(
            "rnn", lambda key: init_stack(key, cfg.ode_rnn_type, F, F, L)
        )
        h0 = jnp.zeros((L, B, F), fused.dtype) if prev is None else prev

        def step(h, x_t):
            out, h_new = step_stack(cfg.ode_rnn_type, rnn_params, x_t, h)
            return h_new, out

        h_T, outs = lax.scan(step, h0, jnp.swapaxes(fused, 0, 1))
        outs = jnp.swapaxes(outs, 0, 1)
        outs = nn.Dropout(cfg.rnn_dropout_out, deterministic=not train)(outs)
        pose = PoseRegressor(name="regressor")(outs)
        return pose, h_T
