"""PoseODERNN — the flagship ODE-RNN pose core ("ODE-VIO").

Capability parity with /root/reference/src/models/PoseODERNN.py:39-154,
re-designed TPU-first:

* The per-step latent evolution (torchode ``AutoDiffAdjoint.solve`` per
  timestep, PoseODERNN.py:70-75) runs on the in-repo adaptive solver core
  (:mod:`ode_vio_tpu.ops.solvers`) with per-sample step sizes.
* The reference's ``torch.jit.fork``/``wait`` fan-out over RNN layers
  (PoseODERNN.py:108-111) disappears: all layers' hidden states fold into
  the solve's batch axis (one (L*B, F) solve — bigger matmuls for the MXU
  instead of host-side threading).
* The sequential Python loop over timesteps (PoseODERNN.py:108-116)
  becomes one ``lax.scan`` whose carry is the stacked hidden state.
* Training uses the reverse-differentiable bounded-scan solver mode;
  inference uses the raw ``lax.while_loop`` mode (the reference's
  ``update_method`` inference swap, PoseODERNN.py:77-86, maps to passing a
  different SolverConfig, e.g. fixed-step euler).

Timestamps are re-based to 0 when no carried state is supplied
(PoseODERNN.py:100); with a carried state (streaming eval) they are used
as-is so integration continues on the sequence clock.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
from jax import lax

from ode_vio_tpu.config import ModelConfig, SolverConfig
from ode_vio_tpu.models.common import PoseRegressor
from ode_vio_tpu.models.fusion import FusionModule
from ode_vio_tpu.ops.mlp import apply_mlp, init_mlp, ode_func_sizes
from ode_vio_tpu.ops.rnn_cells import init_stack, step_stack
from ode_vio_tpu.ops.solvers import SolverOptions
from ode_vio_tpu.ops.solvers.odeint import solve_ivp_batched_dt, solve_ivp_dt


class PoseODERNN(nn.Module):
    cfg: ModelConfig
    solver: SolverConfig

    @nn.compact
    def __call__(
        self,
        fv: jnp.ndarray,                 # (B, S-1, v_f_len)
        fi: jnp.ndarray,                 # (B, S-1, i_f_len)
        ts: jnp.ndarray,                 # (B, S)
        prev: Optional[jnp.ndarray] = None,  # (L, B, F) carried hidden
        train: bool = False,
    ):
        cfg = self.cfg
        F = cfg.f_len
        L = cfg.rnn_num_layers
        B, steps, _ = fv.shape

        fused = FusionModule(F, cfg.fuse_method, name="fuse")(fv, fi)

        ode_params = self.param(
            "ode_func",
            lambda key: init_mlp(
                key,
                ode_func_sizes(F, cfg.ode_hidden_dim, cfg.ode_fn_num_layers),
            ),
        )
        rnn_params = self.param(
            "rnn",
            lambda key: init_stack(key, cfg.ode_rnn_type, F, F, L),
        )

        h0 = (
            jnp.zeros((L, B, F), fused.dtype) if prev is None else prev
        )
        ts = ts.astype(jnp.float32)
        ts_eff = ts - ts[:, :1] if prev is None else ts

        # training must reverse-differentiate through the solver: bounded
        # scan (discretize-then-optimize) by default, continuous adjoint
        # when configured; inference takes the faster raw while_loop.
        base_opts = SolverOptions.from_config(self.solver, train=train)
        use_adjoint = train and base_opts.unroll_mode == "adjoint"
        opts = dataclasses.replace(
            base_opts, unroll_mode="bounded" if train else "while"
        )

        # the autonomous latent vector field f(t, h) = MLP(h) (ODEFunc.py:38)
        def ode_fn(t, y):
            return apply_mlp(ode_params, y, cfg.ode_activation_fn)

        use_pallas = cfg.resolved_use_pallas() and not train and opts.adaptive

        if use_adjoint:
            from ode_vio_tpu.ops.solvers import solve_ivp_adjoint

            def adj_func(t, y, args):
                return apply_mlp(args, y, cfg.ode_activation_fn)

            adj = jax.vmap(
                lambda y, a, b: solve_ivp_adjoint(
                    adj_func, opts, y, a, b, ode_params
                )
            )

            def evolve(y, t0, t1, dt0):
                y1 = adj(y, t0, t1)
                zero = jnp.zeros((), jnp.int32)
                return y1, dt0, zero, zero, jnp.zeros((B,), jnp.int32)
        elif use_pallas:
            from ode_vio_tpu.ops.pallas_kernels import fused_ode_solve

            def evolve(y, t0, t1, dt0):
                y1, dt_fin, acc, rej, inc = fused_ode_solve(
                    ode_params, y, t0, t1,
                    activation=cfg.ode_activation_fn,
                    method=opts.method, rtol=opts.rtol, atol=opts.atol,
                    dt0=dt0, max_steps=opts.max_steps,
                    safety=opts.safety, factor_min=opts.factor_min,
                    factor_max=opts.factor_max,
                )
                # incomplete stays per-sample: (L*B,) -> (B,) so callers
                # can attribute truncated solves to batch lanes
                return (y1, dt_fin, acc.sum(), rej.sum(),
                        inc.reshape(L, B).sum(0))
        elif opts.unroll_mode == "bounded" and opts.adaptive:
            # training: batched bounded solve with chunked early exit —
            # once every (layer, sample) lane converged, whole chunks of
            # the masked scan are skipped by a scalar-predicate lax.cond
            # instead of running the full max_steps_train budget
            def evolve(y, t0, t1, dt0):
                y1, dt_fin, stats = solve_ivp_batched_dt(
                    ode_fn, y, t0, t1, opts, dt0
                )
                return (y1, dt_fin, stats.accepted.sum(),
                        stats.rejected.sum(),
                        stats.incomplete.reshape(L, B).sum(0))
        else:
            solve = jax.vmap(
                lambda y, a, b, d: solve_ivp_dt(ode_fn, y, a, b, opts, d)
            )

            def evolve(y, t0, t1, dt0):
                y1, dt_fin, stats = solve(y, t0, t1, dt0)
                return (y1, dt_fin, stats.accepted.sum(),
                        stats.rejected.sum(),
                        stats.incomplete.reshape(L, B).sum(0))

        def step(carry, inp):
            h, dt = carry
            x_t, t0, t1 = inp           # (B,F), (B,), (B,)
            # evolve all L layers' states in one batched solve; the
            # controller's final dt warm-starts the next frame's solve
            y = h.reshape(L * B, F)
            y1, dt_fin, acc, rej, inc = evolve(
                y, jnp.tile(t0, L), jnp.tile(t1, L), dt
            )
            h_evolved = y1.reshape(L, B, F)
            out, h_new = step_stack(cfg.ode_rnn_type, rnn_params, x_t, h_evolved)
            return (h_new, dt_fin), (out, acc, rej, inc)

        xs = (
            jnp.swapaxes(fused, 0, 1),   # (S-1, B, F)
            ts_eff[:, :-1].T,            # (S-1, B)
            ts_eff[:, 1:].T,
        )
        dt_init = jnp.full((L * B,), opts.dt0, jnp.float32)
        (h_T, _), (outs, acc, rej, inc) = lax.scan(step, (h0, dt_init), xs)
        self.sow("intermediates", "ode_steps_accepted", jnp.sum(acc))
        self.sow("intermediates", "ode_steps_rejected", jnp.sum(rej))
        # count of (lane, interval) solves that ran out of step budget
        # before reaching t1 — nonzero means the integration silently
        # truncated (starved max_steps/max_steps_train). Kept per batch
        # lane (B,) so multi-session serving can attribute truncations.
        self.sow("intermediates", "ode_solves_incomplete",
                 jnp.sum(inc, axis=0))

        outs = jnp.swapaxes(outs, 0, 1)  # (B, S-1, F)
        outs = nn.Dropout(cfg.rnn_dropout_out, deterministic=not train)(outs)
        pose = PoseRegressor(name="regressor")(outs)
        return pose, h_T
