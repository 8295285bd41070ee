"""PoseCDE — neural controlled differential equation pose core.

Capability parity with /root/reference/src/models/PoseCDE.py:43-112: fused
features become a time-augmented observation path X(t); a neural CDE
``dz = g(z) dX(t)`` is integrated through the window's timestamps and the
hidden states regress to per-step poses.

Design notes / reference discrepancies (documented deliberately):

* The reference declares its CDE field for ``input_dim = cde_hidden + 1``
  channels (PoseCDE.py:49,63) but builds the path from the *unreduced*
  768-d fused features (PoseCDE.py:83-84), never calling its own
  ``reduction_net`` — dimensionally inconsistent as written. We apply the
  declared reduction (f_len -> f_len/2 -> cde_hidden, PoseCDE.py:53-57) so
  the path has exactly ``input_dim`` channels.
* The reference builds the interpolation over integer knot indices but
  evaluates at wall-clock timestamps (torchcde default coeffs + t=ts[0,1:],
  PoseCDE.py:94-101). We put the knots at the actual timestamps — the
  mathematically intended irregular-sampling behaviour.
* Control path: linear interpolation (reference) or cubic-Hermite
  (``cfg.cde_interpolation='cubic'``).
* Streaming eval: the reference appends each window to an unbounded
  ``history`` path and re-integrates from scratch (PoseCDE.py:87-92) —
  O(T^2) and shape-dynamic. TPU-native version: the carried state is
  (z at window start, window-start time), and integration continues from
  it — O(T) with static shapes. The reference's carried ``z_0`` never
  advances (it returns the first window's initial state forever,
  PoseCDE.py:103); we carry the *last* evaluated state, which is the
  mathematically consistent continuation.
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from ode_vio_tpu.config import ModelConfig, SolverConfig
from ode_vio_tpu.models.common import KAIMING, PoseRegressor
from ode_vio_tpu.models.fusion import FusionModule
from ode_vio_tpu.ops.interpolation import cdeint, make_path
from ode_vio_tpu.ops.mlp import apply_cde_func, cde_func_sizes, init_mlp
from ode_vio_tpu.ops.solvers import SolverOptions

import dataclasses


class PoseCDE(nn.Module):
    cfg: ModelConfig
    solver: SolverConfig

    @nn.compact
    def __call__(
        self,
        fv: jnp.ndarray,                    # (B, S-1, v_f_len)
        fi: jnp.ndarray,                    # (B, S-1, i_f_len)
        ts: jnp.ndarray,                    # (B, S)
        prev: Optional[jnp.ndarray] = None,  # (B, cde_hidden) carried state
        train: bool = False,
    ):
        cfg = self.cfg
        H = cfg.cde_hidden_dim
        input_dim = H + 1  # reduced features + time channel (PoseCDE.py:49)

        fused = FusionModule(cfg.f_len, cfg.fuse_method, name="fuse")(fv, fi)
        x = nn.Dense(cfg.f_len // 2, kernel_init=KAIMING, name="reduction0")(fused)
        x = nn.leaky_relu(x, 0.1)
        x = nn.Dense(H, kernel_init=KAIMING, name="reduction1")(x)

        ts = ts.astype(jnp.float32)
        ts_eff = ts - ts[:, :1] if train or prev is None else ts
        knots = ts_eff[:, 1:]                          # (B, S-1) feature times
        obs = jnp.concatenate([knots[..., None], x], axis=-1)  # (B,S-1,input_dim)

        cde_params = self.param(
            "cde_func",
            lambda key: init_mlp(
                key, cde_func_sizes(input_dim, H, cfg.cde_fn_num_layers)
            ),
        )
        initial = nn.Dense(H, kernel_init=KAIMING, name="initial")

        if prev is None:
            z0 = jnp.tanh(initial(obs[:, 0]))          # z0 from first obs
        else:
            z0 = prev
            _ = initial(obs[:, 0])                     # materialize params

        opts = dataclasses.replace(
            SolverOptions.from_config(self.solver, train=train),
            unroll_mode="bounded" if train else "while",
        )

        def g(z):
            return apply_cde_func(
                cde_params, z, cfg.cde_activation_fn, H, input_dim
            )

        if cfg.adjoint and train:
            # O(1)-memory continuous-adjoint gradients (torchcde
            # adjoint=True parity; PoseCDE.py:98-101)
            from ode_vio_tpu.ops.interpolation import cdeint_adjoint

            def field_apply(params, z):
                return apply_cde_func(
                    params, z, cfg.cde_activation_fn, H, input_dim
                )

            def solve_one(obs_i, knots_i, z0_i):
                path = make_path(knots_i, obs_i, cfg.cde_interpolation)
                return cdeint_adjoint(
                    path, z0_i, knots_i, cde_params, field_apply, opts
                )

            zs = jax.vmap(solve_one)(obs, knots, z0)      # (B, S-1, H)
        else:
            def solve_one(obs_i, knots_i, z0_i):
                path = make_path(knots_i, obs_i, cfg.cde_interpolation)
                return cdeint(path, g, z0_i, knots_i, opts)

            zs, stats = jax.vmap(solve_one)(obs, knots, z0)   # (B, S-1, H)
            self.sow("intermediates", "cde_steps_accepted",
                     jnp.sum(stats.accepted))

        poses = PoseRegressor(name="regressor")(zs)
        return poses, zs[:, -1, :]
