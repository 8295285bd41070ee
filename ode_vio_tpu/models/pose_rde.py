"""PoseRDE — neural rough differential equation pose core (log-ODE method).

Capability parity with /root/reference/src/models/PoseRDE.py:43-125
(marked 'under development' there): the time-augmented feature path is
compressed into depth-2 log-signature windows
(:func:`ode_vio_tpu.ops.logsig.logsig_windows`, replacing
``torchcde.logsig_windows``/signatory) and a CDE driven by the compressed
path integrates the latent state — the reference's own long-context
compression mechanism (SURVEY.md section 5.7).

Reference discrepancy handled here: the reference declares its CDE field
for ``cde_hidden+1`` input channels (PoseRDE.py:48) yet drives it with the
log-signature of a 769-channel path (~296k channels, PoseRDE.py:88), which
cannot typecheck. We first reduce the features to ``rde_reduced_dim``
channels (its ``reduction_net``, commented out in the reference forward,
PoseRDE.py:57,81) so the logsig dimension d + d(d-1)/2 stays tractable.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from ode_vio_tpu.config import ModelConfig, SolverConfig
from ode_vio_tpu.models.common import KAIMING, PoseRegressor
from ode_vio_tpu.models.fusion import FusionModule
from ode_vio_tpu.ops.interpolation import cdeint, make_path
from ode_vio_tpu.ops.logsig import logsig_dim, logsig_windows
from ode_vio_tpu.ops.mlp import apply_cde_func, cde_func_sizes, init_mlp
from ode_vio_tpu.ops.solvers import SolverOptions


class PoseRDE(nn.Module):
    cfg: ModelConfig
    solver: SolverConfig

    @nn.compact
    def __call__(
        self,
        fv: jnp.ndarray,
        fi: jnp.ndarray,
        ts: jnp.ndarray,                    # (B, S)
        prev: Optional[jnp.ndarray] = None,  # (B, cde_hidden)
        train: bool = False,
    ):
        cfg = self.cfg
        H = cfg.cde_hidden_dim
        d = cfg.rde_reduced_dim + 1          # + time channel
        sig_dim = logsig_dim(d, cfg.logsig_depth)

        fused = FusionModule(cfg.f_len, cfg.fuse_method, name="fuse")(fv, fi)
        x = nn.Dense(cfg.rde_reduced_dim, kernel_init=KAIMING,
                     name="reduction")(fused)

        ts = ts.astype(jnp.float32)
        ts_eff = ts - ts[:, :1]              # re-based (PoseRDE.py:85)
        knots = ts_eff[:, 1:]                # (B, S-1)
        obs = jnp.concatenate([knots[..., None], x], axis=-1)  # (B, S-1, d)

        cde_params = self.param(
            "cde_func",
            lambda key: init_mlp(
                key, cde_func_sizes(sig_dim, H, cfg.cde_fn_num_layers)
            ),
        )
        initial = nn.Dense(H, kernel_init=KAIMING, name="initial")

        opts = dataclasses.replace(
            SolverOptions.from_config(self.solver, train=train),
            unroll_mode="bounded" if train else "while",
        )

        def g(z):
            return apply_cde_func(
                cde_params, z, cfg.cde_activation_fn, H, sig_dim
            )

        def solve_one(obs_i, knots_i, eval_ts_i, z0_i):
            # window-compressed logsig path (log-ODE method, PoseRDE.py:88)
            ys, t_new = logsig_windows(
                obs_i, knots_i, depth=cfg.logsig_depth,
                window=cfg.logsig_window,
            )
            path = make_path(t_new, ys, "linear")
            zs, stats = cdeint(path, g, z0_i, eval_ts_i, opts)
            return zs, stats

        if prev is None:
            z0 = jnp.tanh(initial(obs[:, 0]))
        else:
            z0 = prev
            _ = initial(obs[:, 0])

        zs, stats = jax.vmap(solve_one)(obs, knots, knots, z0)
        self.sow("intermediates", "rde_steps_accepted", jnp.sum(stats.accepted))
        self.sow("intermediates", "rde_solves_incomplete",
                 jnp.sum(stats.incomplete))

        poses = PoseRegressor(name="regressor")(zs)
        return poses, zs[:, -1, :]
