"""Fused Pallas ODE-solve kernel vs the reference XLA solver path
(interpret mode on CPU; the same kernel compiles with Mosaic on TPU)."""

import jax
import jax.numpy as jnp
import numpy as np

from ode_vio_tpu.ops.mlp import apply_mlp, init_mlp, ode_func_sizes
from ode_vio_tpu.ops.pallas_kernels import fused_ode_solve
from ode_vio_tpu.ops.solvers import SolverOptions, solve_ivp


def make_problem(N=5, F=8, hidden=16, layers=2, seed=0):
    key = jax.random.PRNGKey(seed)
    k1, k2, k3 = jax.random.split(key, 3)
    params = init_mlp(k1, ode_func_sizes(F, hidden, layers))
    y0 = 0.5 * jax.random.normal(k2, (N, F))
    t0 = jnp.zeros((N,))
    t1 = jax.random.uniform(k3, (N,), minval=0.2, maxval=1.5)
    return params, y0, t0, t1


class TestFusedOdeSolve:
    def test_matches_xla_solver_stepwise(self):
        """Same controller, same tableau: values and per-row step counts
        must match the vmapped XLA while-loop solver."""
        params, y0, t0, t1 = make_problem()
        kw = dict(rtol=1e-3, atol=1e-6, dt0=1e-2, max_steps=64)

        y_pl, dt_pl, acc_pl, rej_pl, inc_pl = fused_ode_solve(
            params, y0, t0, t1, activation="tanh", interpret=True, **kw
        )

        opts = SolverOptions(method="dopri5", unroll_mode="while", **kw)
        fn = lambda t, y: apply_mlp(params, y, "tanh")
        y_x, stats = jax.vmap(
            lambda y, a, b: solve_ivp(fn, y, a, b, opts)
        )(y0, t0, t1)

        np.testing.assert_allclose(np.asarray(y_pl), np.asarray(y_x),
                                   rtol=2e-5, atol=2e-6)
        np.testing.assert_array_equal(np.asarray(acc_pl),
                                      np.asarray(stats.accepted))
        np.testing.assert_array_equal(np.asarray(rej_pl),
                                      np.asarray(stats.rejected))
        np.testing.assert_array_equal(np.asarray(inc_pl),
                                      np.asarray(stats.incomplete))

    def test_zero_interval_rows(self):
        params, y0, t0, _ = make_problem()
        t1 = t0  # nothing to do
        y_pl, dt_fin, acc, rej, inc = fused_ode_solve(
            params, y0, t0, t1, rtol=1e-3, atol=1e-6, dt0=1e-2,
            max_steps=16, interpret=True,
        )
        np.testing.assert_allclose(np.asarray(y_pl), np.asarray(y0))
        assert int(np.asarray(acc).sum()) == 0

    def test_row_padding_transparent(self):
        """Row counts that are not multiples of 8 pad internally and the
        padding never leaks into results."""
        params, y0, t0, t1 = make_problem(N=3)
        y_pl, dt_fin, acc, rej, inc = fused_ode_solve(
            params, y0, t0, t1, rtol=1e-3, atol=1e-6, dt0=1e-2,
            max_steps=64, interpret=True,
        )
        assert y_pl.shape == (3, 8)
        assert acc.shape == (3,)

    def test_softplus_activation(self):
        params, y0, t0, t1 = make_problem(seed=1)
        y_pl, _, _, _, _ = fused_ode_solve(
            params, y0, t0, t1, activation="softplus",
            rtol=1e-3, atol=1e-6, dt0=1e-2, max_steps=64, interpret=True,
        )
        opts = SolverOptions(method="dopri5", unroll_mode="while",
                             rtol=1e-3, atol=1e-6, dt0=1e-2, max_steps=64)
        fn = lambda t, y: apply_mlp(params, y, "softplus")
        y_x, _ = jax.vmap(lambda y, a, b: solve_ivp(fn, y, a, b, opts))(
            y0, t0, t1
        )
        np.testing.assert_allclose(np.asarray(y_pl), np.asarray(y_x),
                                   rtol=2e-5, atol=2e-6)


class TestPallasDropout:
    """pallas_dropout (hardware-PRNG fused dropout). The TPU PRNG
    primitives have no interpret-mode lowering, so these tests run only
    on a real TPU (they self-skip on CPU); the same checks ran on
    hardware via scripts/probe_pallas_dropout.py (BENCH.md round 3:
    exact correctness, measured slower than the rbg path — ships
    unwired)."""

    def _tpu(self):
        import pytest

        if jax.default_backend() not in ("tpu", "axon"):
            pytest.skip("pltpu PRNG primitives need a real TPU backend")

    def test_mask_semantics_and_bwd_identity(self):
        self._tpu()
        from ode_vio_tpu.ops.pallas_kernels import pallas_dropout

        x = jnp.ones((512, 512), jnp.float32)
        seed = jnp.asarray(42, jnp.int32)
        y = np.asarray(jax.jit(pallas_dropout, static_argnums=(2, 3))(
            x, seed, 0.5))
        kept = y != 0
        assert abs(kept.mean() - 0.5) < 0.02
        np.testing.assert_allclose(y[kept], 2.0, rtol=1e-6)
        g = np.asarray(jax.jit(
            jax.grad(lambda x: jnp.sum(pallas_dropout(x, seed, 0.5) * 3.0))
        )(x))
        np.testing.assert_array_equal(y != 0, g != 0)
        np.testing.assert_allclose(g[g != 0], 6.0, rtol=1e-6)
