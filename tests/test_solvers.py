"""Solver-core tests: closed-form ODE accuracy, convergence order, gradient
correctness (bounded scan vs finite differences vs continuous adjoint),
batched per-sample adaptivity, and mode equivalence."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ode_vio_tpu.ops.solvers import SolverOptions, solve_at, solve_ivp, solve_ivp_adjoint
from ode_vio_tpu.ops.solvers.odeint import MULTISTEP_METHODS, rk_step
from ode_vio_tpu.ops.solvers.tableaus import TABLEAUS, get_tableau

DECAY = -0.7


def f_decay(t, y):
    return DECAY * y


def f_oscillator(t, y):
    # y = (q, p): q' = p, p' = -q  -> q(t) = cos t with q0=1, p0=0
    return jnp.stack([y[1], -y[0]])


class TestAccuracy:
    # order-2 methods carry a 1st-order embedded error estimate, so their
    # step count scales ~ rtol^-1/2: test them at a looser tolerance.
    @pytest.mark.parametrize(
        "method,rtol,check", [("dopri5", 1e-5, 1e-4), ("tsit5", 1e-5, 1e-4),
                              ("bosh3", 1e-5, 1e-4), ("heun", 1e-4, 3e-3),
                              ("midpoint", 1e-4, 3e-3)]
    )
    @pytest.mark.parametrize("mode", ["while", "bounded"])
    def test_exponential_decay(self, method, rtol, check, mode):
        opts = SolverOptions(method=method, rtol=rtol, atol=1e-7,
                             unroll_mode=mode, max_steps=256, dt0=0.01)
        y0 = jnp.ones(3)
        y1, stats = jax.jit(lambda y: solve_ivp(f_decay, y, 0.0, 2.0, opts))(y0)
        np.testing.assert_allclose(np.asarray(y1), np.exp(DECAY * 2.0), rtol=check)
        assert int(stats.accepted) > 0

    def test_harmonic_oscillator(self):
        opts = SolverOptions(rtol=1e-6, atol=1e-8, max_steps=512, dt0=0.01,
                             unroll_mode="while")
        y0 = jnp.array([1.0, 0.0])
        ys, _ = solve_at(f_oscillator, y0, jnp.linspace(0.0, 2 * np.pi, 9), opts)
        expected_q = np.cos(np.linspace(0.0, 2 * np.pi, 9)[1:])
        np.testing.assert_allclose(np.asarray(ys[:, 0]), expected_q, atol=5e-4)

    def test_fixed_step_rk4_convergence_order(self):
        # halving dt must reduce error ~16x for a 4th-order method
        errs = []
        for n in (8, 16):
            opts = SolverOptions(method="rk4", adaptive=False, fixed_steps=n)
            y1, _ = solve_ivp(f_decay, jnp.ones(()), 0.0, 2.0, opts)
            errs.append(abs(float(y1) - np.exp(DECAY * 2.0)))
        order = np.log2(errs[0] / errs[1])
        assert 3.5 < order < 4.8

    def test_fixed_step_euler(self):
        opts = SolverOptions(method="euler", adaptive=False, fixed_steps=1000)
        y1, stats = solve_ivp(f_decay, jnp.ones(()), 0.0, 1.0, opts)
        np.testing.assert_allclose(float(y1), np.exp(DECAY), rtol=1e-3)
        assert int(stats.accepted) == 1000

    def test_euler_adaptive_raises(self):
        opts = SolverOptions(method="euler", adaptive=True)
        with pytest.raises(ValueError, match="no embedded error"):
            solve_ivp(f_decay, jnp.ones(()), 0.0, 1.0, opts)

    def test_zero_length_interval(self):
        y0 = jnp.arange(4.0)
        y1, stats = solve_ivp(f_decay, y0, 1.0, 1.0, SolverOptions(unroll_mode="while"))
        np.testing.assert_allclose(np.asarray(y1), np.asarray(y0))
        assert int(stats.total) == 0

    def test_pytree_state(self):
        func = lambda t, y: {"a": DECAY * y["a"], "b": -y["b"]}
        y0 = {"a": jnp.ones(2), "b": jnp.ones(3)}
        y1, _ = solve_ivp(func, y0, 0.0, 1.0,
                          SolverOptions(rtol=1e-5, atol=1e-7, max_steps=128))
        np.testing.assert_allclose(np.asarray(y1["a"]), np.exp(DECAY), rtol=1e-4)
        np.testing.assert_allclose(np.asarray(y1["b"]), np.exp(-1.0), rtol=1e-4)


class TestModes:
    def test_bounded_matches_while_exactly(self):
        """The masked scan must produce the identical step sequence to the
        while loop (same iterates, just padded)."""
        y0 = jnp.array([1.0, -0.5, 2.0])
        for method in ("dopri5", "tsit5"):
            w = SolverOptions(method=method, unroll_mode="while", max_steps=64,
                              rtol=1e-3, atol=1e-6, dt0=1e-3)
            b = dataclasses.replace(w, unroll_mode="bounded")
            yw, sw = solve_ivp(f_decay, y0, 0.0, 1.5, w)
            yb, sb = solve_ivp(f_decay, y0, 0.0, 1.5, b)
            np.testing.assert_array_equal(np.asarray(yw), np.asarray(yb))
            assert int(sw.accepted) == int(sb.accepted)
            assert int(sw.rejected) == int(sb.rejected)

    def test_max_steps_bound_respected(self):
        opts = SolverOptions(max_steps=3, unroll_mode="while", dt0=1e-6)
        _, stats = solve_ivp(f_decay, jnp.ones(()), 0.0, 10.0, opts)
        assert int(stats.total) == 3

    @pytest.mark.parametrize("mode", ["while", "bounded"])
    def test_starved_budget_is_surfaced(self, mode):
        """Exhausting max_steps before t1 must NOT be silent: the solve
        returns the partial state AND stats.incomplete == 1 (torchode
        surfaces solver failure; VERDICT round 1 weak #2)."""
        opts = SolverOptions(max_steps=3, unroll_mode=mode, dt0=1e-6,
                             factor_max=1.5)
        _, stats = solve_ivp(f_decay, jnp.ones(()), 0.0, 10.0, opts)
        assert int(stats.incomplete) == 1

        ok = SolverOptions(max_steps=256, unroll_mode=mode, dt0=0.01)
        _, stats_ok = solve_ivp(f_decay, jnp.ones(()), 0.0, 1.0, ok)
        assert int(stats_ok.incomplete) == 0

    def test_solve_at_counts_incomplete_segments(self):
        opts = SolverOptions(max_steps=2, unroll_mode="while", dt0=1e-6,
                             factor_max=1.2)
        ts = jnp.array([0.0, 5.0, 10.0])
        _, stats = solve_at(f_decay, jnp.ones(()), ts, opts)
        assert int(stats.incomplete) == 2


class TestBatching:
    def test_vmap_per_sample_intervals(self):
        """Each batch element integrates its own [t0, t1] with its own
        adaptive step sequence (torchode's key capability)."""
        opts = SolverOptions(rtol=1e-5, atol=1e-7, max_steps=256, dt0=0.01,
                             unroll_mode="while")
        t1s = jnp.array([0.5, 1.0, 2.0, 4.0])
        y0s = jnp.ones((4, 2))

        batched = jax.vmap(lambda y, t1: solve_ivp(f_decay, y, 0.0, t1, opts))
        ys, stats = jax.jit(batched)(y0s, t1s)
        expected = np.tile(np.exp(DECAY * np.asarray(t1s))[:, None], (1, 2))
        np.testing.assert_allclose(np.asarray(ys), expected, rtol=1e-4)
        # longer intervals must take more accepted steps
        acc = np.asarray(stats.accepted)
        assert acc[3] > acc[0]

    def test_vmap_matches_loop(self):
        opts = SolverOptions(rtol=1e-4, atol=1e-7, max_steps=128, dt0=0.01)
        y0s = jnp.array([[1.0], [2.0], [-1.0]])
        t1s = jnp.array([0.3, 0.9, 1.7])
        ys_v, _ = jax.vmap(lambda y, t1: solve_ivp(f_decay, y, 0.0, t1, opts))(y0s, t1s)
        for k in range(3):
            yk, _ = solve_ivp(f_decay, y0s[k], 0.0, t1s[k], opts)
            np.testing.assert_allclose(np.asarray(ys_v[k]), np.asarray(yk), rtol=1e-6)


class TestBatchedEarlyExit:
    """solve_ivp_batched_dt: the scan-outside-vmap bounded solver whose
    chunked lax.cond skips whole chunks once every lane converged. Must be
    numerically identical to jax.vmap(solve_ivp_dt) in values, stats and
    gradients (skipped chunks are identity on converged state)."""

    def _solve_pair(self, opts, y0s, t0s, t1s, dt0s):
        from ode_vio_tpu.ops.solvers.odeint import (
            solve_ivp_batched_dt, solve_ivp_dt,
        )

        vmapped = jax.jit(jax.vmap(
            lambda y, a, b, d: solve_ivp_dt(f_decay, y, a, b, opts, d)
        ))
        batched = jax.jit(
            lambda y, a, b, d: solve_ivp_batched_dt(f_decay, y, a, b, opts, d)
        )
        return vmapped(y0s, t0s, t1s, dt0s), batched(y0s, t0s, t1s, dt0s)

    @pytest.mark.parametrize("exit_chunk", [1, 3, 4, 0])
    def test_matches_vmapped_bounded(self, exit_chunk):
        opts = SolverOptions(rtol=1e-4, atol=1e-7, max_steps=32, dt0=0.01,
                             unroll_mode="bounded", exit_chunk=exit_chunk)
        y0s = jnp.array([[1.0, 2.0], [0.5, -1.0], [3.0, 0.1], [-2.0, 1.5]])
        t0s = jnp.zeros(4)
        t1s = jnp.array([0.3, 0.9, 1.7, 0.05])
        dt0s = jnp.full(4, 0.01)
        (y_v, dt_v, s_v), (y_b, dt_b, s_b) = self._solve_pair(
            opts, y0s, t0s, t1s, dt0s
        )
        np.testing.assert_array_equal(np.asarray(y_v), np.asarray(y_b))
        np.testing.assert_array_equal(np.asarray(dt_v), np.asarray(dt_b))
        np.testing.assert_array_equal(np.asarray(s_v.accepted),
                                      np.asarray(s_b.accepted))
        np.testing.assert_array_equal(np.asarray(s_v.rejected),
                                      np.asarray(s_b.rejected))
        np.testing.assert_array_equal(np.asarray(s_v.incomplete),
                                      np.asarray(s_b.incomplete))

    def test_while_mode_any_active(self):
        opts = SolverOptions(rtol=1e-4, atol=1e-7, max_steps=128, dt0=0.01,
                             unroll_mode="while")
        from ode_vio_tpu.ops.solvers.odeint import solve_ivp_batched_dt

        y0s = jnp.array([[1.0], [2.0], [-1.0]])
        t1s = jnp.array([0.3, 0.9, 1.7])
        y_b, _, _ = jax.jit(
            lambda y, a, b, d: solve_ivp_batched_dt(f_decay, y, a, b, opts, d)
        )(y0s, jnp.zeros(3), t1s, jnp.full(3, 0.01))
        expected = np.asarray(y0s) * np.exp(DECAY * np.asarray(t1s))[:, None]
        np.testing.assert_allclose(np.asarray(y_b), expected, rtol=1e-4)

    def test_gradients_match_vmapped(self):
        from ode_vio_tpu.ops.solvers.odeint import (
            solve_ivp_batched_dt, solve_ivp_dt,
        )

        opts = SolverOptions(rtol=1e-4, atol=1e-7, max_steps=32, dt0=0.01,
                             unroll_mode="bounded", exit_chunk=4)
        y0s = jnp.array([[1.0, 2.0], [0.5, -1.0], [3.0, 0.1]])
        t0s = jnp.zeros(3)
        t1s = jnp.array([0.3, 1.2, 0.7])
        dt0s = jnp.full(3, 0.01)

        def loss_v(y):
            ys, _, _ = jax.vmap(
                lambda yy, a, b, d: solve_ivp_dt(f_decay, yy, a, b, opts, d)
            )(y, t0s, t1s, dt0s)
            return jnp.sum(ys ** 2)

        def loss_b(y):
            ys, _, _ = solve_ivp_batched_dt(f_decay, y, t0s, t1s, opts, dt0s)
            return jnp.sum(ys ** 2)

        g_v = jax.jit(jax.grad(loss_v))(y0s)
        g_b = jax.jit(jax.grad(loss_b))(y0s)
        np.testing.assert_allclose(np.asarray(g_v), np.asarray(g_b),
                                   rtol=1e-6, atol=1e-9)

    def test_starved_budget_surfaced_batched(self):
        opts = SolverOptions(rtol=1e-10, atol=1e-12, max_steps=4, dt0=1e-3,
                             unroll_mode="bounded", exit_chunk=2)
        from ode_vio_tpu.ops.solvers.odeint import solve_ivp_batched_dt

        y0s = jnp.ones((2, 2))
        _, _, stats = jax.jit(
            lambda y: solve_ivp_batched_dt(
                f_decay, y, jnp.zeros(2), jnp.full(2, 5.0), opts,
                jnp.full(2, 1e-3),
            )
        )(y0s)
        assert np.all(np.asarray(stats.incomplete) == 1)


class TestGradients:
    def test_grad_matches_finite_difference(self):
        opts = SolverOptions(rtol=1e-6, atol=1e-9, max_steps=256, dt0=0.01)

        def loss(theta):
            func = lambda t, y: theta * y
            y1, _ = solve_ivp(func, jnp.ones(()), 0.0, 1.0, opts)
            return y1

        theta = -0.4
        g = float(jax.grad(loss)(jnp.asarray(theta)))
        # d/dtheta e^theta = e^theta
        np.testing.assert_allclose(g, np.exp(theta), rtol=1e-3)
        eps = 1e-3
        fd = (float(loss(jnp.asarray(theta + eps))) -
              float(loss(jnp.asarray(theta - eps)))) / (2 * eps)
        np.testing.assert_allclose(g, fd, rtol=1e-3)

    def test_grad_wrt_y0(self):
        opts = SolverOptions(rtol=1e-6, atol=1e-9, max_steps=256, dt0=0.01)

        def loss(y0):
            y1, _ = solve_ivp(f_decay, y0, 0.0, 2.0, opts)
            return jnp.sum(y1)

        g = float(jax.grad(loss)(jnp.ones(())))
        np.testing.assert_allclose(g, np.exp(DECAY * 2.0), rtol=1e-3)

    def test_adjoint_matches_direct(self):
        opts = SolverOptions(rtol=1e-7, atol=1e-10, max_steps=512, dt0=0.01)
        func = lambda t, y, args: jnp.tanh(args["w"] @ y + args["b"])
        key = jax.random.PRNGKey(0)
        args = {
            "w": 0.5 * jax.random.normal(key, (3, 3)),
            "b": jnp.zeros(3),
        }
        y0 = jnp.array([0.3, -0.2, 0.1])

        def loss_adj(a):
            return jnp.sum(solve_ivp_adjoint(func, opts, y0, 0.0, 1.0, a) ** 2)

        def loss_dir(a):
            y1, _ = solve_ivp(lambda t, y: func(t, y, a), y0, 0.0, 1.0, opts)
            return jnp.sum(y1 ** 2)

        g_adj = jax.grad(loss_adj)(args)
        g_dir = jax.grad(loss_dir)(args)
        np.testing.assert_allclose(
            np.asarray(g_adj["w"]), np.asarray(g_dir["w"]), rtol=2e-3, atol=1e-5
        )
        np.testing.assert_allclose(
            np.asarray(g_adj["b"]), np.asarray(g_dir["b"]), rtol=2e-3, atol=1e-5
        )

    def test_grad_through_solve_at(self):
        opts = SolverOptions(rtol=1e-6, atol=1e-9, max_steps=128, dt0=0.01)

        def loss(theta):
            func = lambda t, y: theta * y
            ys, _ = solve_at(func, jnp.ones(()), jnp.array([0.0, 0.5, 1.0]), opts)
            return ys[-1]

        g = float(jax.grad(loss)(jnp.asarray(-0.3)))
        np.testing.assert_allclose(g, np.exp(-0.3), rtol=1e-3)


class TestTableaus:
    def test_consistency_conditions(self):
        """b coefficients sum to 1; stage rows sum to c (standard RK
        consistency)."""
        for name, tab in TABLEAUS.items():
            assert abs(sum(tab.b_sol) - 1.0) < 1e-12, name
            for i, row in enumerate(tab.a):
                assert abs(sum(row) - tab.c[i]) < 1e-9, (name, i)
            if tab.b_err is not None:
                # b_err = b - bhat with sum(bhat) = 1 -> sums to 0
                assert abs(sum(tab.b_err)) < 1e-9, name
            if tab.fsal:
                assert tuple(tab.a[-1]) == tuple(tab.b_sol[:-1]), name

    def test_single_step_order(self):
        """One dopri5 step on y'=y over dt has error O(dt^6).

        Needs float64: the true local error (~1e-10 at dt=0.1) is below
        float32 resolution.
        """
        tab = get_tableau("dopri5")
        func = lambda t, y: y
        errs = []
        with jax.enable_x64():
            for dt in (0.2, 0.1):
                y1, _, _ = rk_step(
                    func, jnp.asarray(0.0, jnp.float64),
                    jnp.ones((), jnp.float64), jnp.asarray(dt, jnp.float64), tab
                )
                errs.append(abs(float(y1) - np.exp(dt)))
        assert np.log2(errs[0] / errs[1]) > 5.0

    def test_alias(self):
        assert get_tableau("runge_kutta").name == "rk4"
        # torchdiffeq's adaptive_heun IS Heun + embedded-Euler error
        assert get_tableau("adaptive_heun").name == "heun"

    def test_fehlberg2_adaptive(self):
        # RKF1(2)'s embedded pair has a famously small error constant
        # (err = dt*(k3-k1)/512), so the controller's realised error runs
        # ~2 orders looser than rtol — same behaviour as torchdiffeq's
        # fehlberg2; test at a correspondingly tight rtol.
        opts = SolverOptions(method="fehlberg2", rtol=1e-6, atol=1e-9,
                             max_steps=4096, dt0=0.01, unroll_mode="while")
        y1, stats = solve_ivp(f_decay, jnp.ones(3), 0.0, 2.0, opts)
        np.testing.assert_allclose(np.asarray(y1), np.exp(DECAY * 2.0),
                                   rtol=3e-3)
        assert int(stats.accepted) > 0

    def test_fehlberg2_convergence_order(self):
        errs = []
        for n in (16, 32):
            opts = SolverOptions(method="fehlberg2", adaptive=False,
                                 fixed_steps=n)
            y1, _ = solve_ivp(f_decay, jnp.ones(()), 0.0, 2.0, opts)
            errs.append(abs(float(y1) - np.exp(DECAY * 2.0)))
        assert 1.7 < np.log2(errs[0] / errs[1]) < 2.6


class TestAdamsMultistep:
    """torchdiffeq fixed-grid method strings explicit_adams /
    implicit_adams (used by the reference's experiment diary through the
    --cde_solver flag, /root/reference/results/log.txt)."""

    @pytest.mark.parametrize("method", ["explicit_adams", "implicit_adams"])
    def test_accuracy_and_stats(self, method):
        opts = SolverOptions(method=method, adaptive=False, fixed_steps=64)
        y1, stats = jax.jit(
            lambda y: solve_ivp(f_decay, y, 0.0, 2.0, opts)
        )(jnp.ones(3))
        np.testing.assert_allclose(np.asarray(y1), np.exp(DECAY * 2.0),
                                   rtol=1e-5)
        assert int(stats.accepted) == 64
        assert int(stats.incomplete) == 0

    @pytest.mark.parametrize("method", ["explicit_adams", "implicit_adams"])
    def test_convergence_order_4(self, method):
        # halving dt must reduce error ~16x (both AB4 and ABM4 are order 4)
        errs = []
        with jax.enable_x64():
            for n in (32, 64):
                opts = SolverOptions(method=method, adaptive=False,
                                     fixed_steps=n)
                y1, _ = solve_ivp(
                    f_decay, jnp.ones((), jnp.float64), 0.0, 2.0, opts
                )
                errs.append(abs(float(y1) - np.exp(DECAY * 2.0)))
        assert 3.5 < np.log2(errs[0] / errs[1]) < 4.8

    def test_exact_on_cubic_rhs(self):
        # AB4/AM4 (and the RK4 startup) integrate t-polynomials up to
        # degree 3 exactly: y' = 4 t^3 -> y(1) = 1
        f = lambda t, y: 4.0 * t**3 * jnp.ones_like(y)
        for method in MULTISTEP_METHODS:
            opts = SolverOptions(method=method, adaptive=False, fixed_steps=7)
            y1, _ = solve_ivp(f, jnp.zeros(()), 0.0, 1.0, opts)
            np.testing.assert_allclose(float(y1), 1.0, rtol=2e-6)

    def test_implicit_differs_from_explicit(self):
        opts_e = SolverOptions(method="explicit_adams", adaptive=False,
                               fixed_steps=8)
        opts_i = SolverOptions(method="implicit_adams", adaptive=False,
                               fixed_steps=8)
        y_e, _ = solve_ivp(f_decay, jnp.ones(()), 0.0, 2.0, opts_e)
        y_i, _ = solve_ivp(f_decay, jnp.ones(()), 0.0, 2.0, opts_i)
        assert float(y_e) != float(y_i)
        # the PECE corrector must improve the prediction
        exact = np.exp(DECAY * 2.0)
        assert abs(float(y_i) - exact) < abs(float(y_e) - exact)

    def test_short_grid_falls_back_to_rk4(self):
        # n <= 3 is pure RK4 startup
        opts = SolverOptions(method="implicit_adams", adaptive=False,
                             fixed_steps=2)
        y1, stats = solve_ivp(f_decay, jnp.ones(()), 0.0, 0.5, opts)
        np.testing.assert_allclose(float(y1), np.exp(DECAY * 0.5), rtol=1e-5)
        assert int(stats.accepted) == 2

    def test_method_string_forces_fixed_grid(self):
        """adaptive=True + a multistep method string must behave as the
        fixed-grid method (torchdiffeq semantics: rtol/atol ignored),
        through every entry point."""
        from ode_vio_tpu.ops.solvers.odeint import solve_ivp_batched_dt, solve_ivp_dt

        opts_a = SolverOptions(method="implicit_adams", adaptive=True,
                               fixed_steps=16)
        opts_f = dataclasses.replace(opts_a, adaptive=False)
        y_a, _, _ = solve_ivp_dt(f_decay, jnp.ones(()), 0.0, 1.0, opts_a)
        y_f, _, _ = solve_ivp_dt(f_decay, jnp.ones(()), 0.0, 1.0, opts_f)
        assert float(y_a) == float(y_f)

        y0 = jnp.ones((4, 3))
        t0 = jnp.zeros(4)
        t1 = jnp.ones(4)
        yb, _, stats = solve_ivp_batched_dt(f_decay, y0, t0, t1, opts_a)
        np.testing.assert_allclose(np.asarray(yb), np.exp(DECAY), rtol=1e-5)
        assert np.all(np.asarray(stats.accepted) == 16)

    def test_from_config_normalizes_adaptive(self):
        from ode_vio_tpu.config import SolverConfig

        cfg = SolverConfig(method="implicit_adams", adaptive=True)
        assert SolverOptions.from_config(cfg).adaptive is False

    def test_solve_at_multistep(self):
        opts = SolverOptions(method="implicit_adams", adaptive=False,
                             fixed_steps=16)
        ts = jnp.array([0.0, 0.5, 1.0, 2.0])
        ys, stats = solve_at(f_decay, jnp.ones(()), ts, opts)
        np.testing.assert_allclose(
            np.asarray(ys), np.exp(DECAY * np.asarray(ts[1:])), rtol=1e-5
        )
        assert int(stats.accepted) == 16 * 3

    def test_gradients_flow(self):
        opts = SolverOptions(method="implicit_adams", adaptive=False,
                             fixed_steps=12)

        def loss(a):
            y1, _ = solve_ivp(lambda t, y: a * y, jnp.ones(()), 0.0, 1.0,
                              opts)
            return y1

        g = float(jax.grad(loss)(jnp.asarray(-0.3)))
        # d/da exp(a) at a=-0.3
        np.testing.assert_allclose(g, np.exp(-0.3), rtol=1e-4)

    def test_pytree_state(self):
        opts = SolverOptions(method="explicit_adams", adaptive=False,
                             fixed_steps=32)
        y0 = {"a": jnp.ones(2), "b": (jnp.zeros(()), jnp.ones((3, 1)))}
        y1, _ = solve_ivp(lambda t, y: jax.tree_util.tree_map(
            lambda x: DECAY * x, y), y0, 0.0, 1.0, opts)
        np.testing.assert_allclose(
            np.asarray(y1["a"]), np.exp(DECAY), rtol=1e-5
        )
        np.testing.assert_allclose(np.asarray(y1["b"][0]), 0.0)


class TestSolveAt:
    def test_values_and_stats(self):
        opts = SolverOptions(rtol=1e-5, atol=1e-8, max_steps=256, dt0=0.01)
        ts = jnp.array([0.0, 0.3, 0.8, 1.0, 2.5])
        ys, stats = solve_at(f_decay, jnp.ones(()), ts, opts)
        np.testing.assert_allclose(
            np.asarray(ys), np.exp(DECAY * np.asarray(ts[1:])), rtol=1e-4
        )
        assert int(stats.accepted) > 3

    def test_warm_restart_cheaper_than_cold(self):
        """Carrying dt across segments must not blow up the step count
        relative to a single long solve."""
        opts = SolverOptions(rtol=1e-4, atol=1e-7, max_steps=512, dt0=1e-4,
                             unroll_mode="while")
        ts = jnp.linspace(0.0, 2.0, 11)
        _, s_multi = solve_at(f_decay, jnp.ones(()), ts, opts)
        _, s_single = solve_ivp(f_decay, jnp.ones(()), 0.0, 2.0, opts)
        assert int(s_multi.total) < 4 * int(s_single.total) + 40


class TestLaneArgs:
    """solve_ivp_batched_dt(..., lane_args=...): per-lane auxiliary data
    threaded to the vector field under the hoisted scan — must be
    bitwise-identical to jax.vmap of per-lane closures, with gradients
    flowing to the lane args."""

    def _f(self, t, y, rate):
        return rate * y

    @pytest.mark.parametrize("mode", ["bounded", "while"])
    def test_matches_per_lane_closure(self, mode):
        from ode_vio_tpu.ops.solvers.odeint import (
            solve_ivp_batched_dt, solve_ivp_dt,
        )

        opts = SolverOptions(rtol=1e-4, atol=1e-7, max_steps=32, dt0=0.01,
                             unroll_mode=mode, exit_chunk=4)
        rates = jnp.array([-0.7, -0.1, -2.5])
        y0s = jnp.array([[1.0, 2.0], [0.5, -1.0], [3.0, 0.1]])
        t0s = jnp.zeros(3)
        t1s = jnp.array([0.3, 0.9, 1.7])
        dt0s = jnp.full(3, 0.01)

        y_v, dt_v, s_v = jax.jit(jax.vmap(
            lambda y, a, b, d, r: solve_ivp_dt(
                lambda t, yy: self._f(t, yy, r), y, a, b, opts, d)
        ))(y0s, t0s, t1s, dt0s, rates)
        y_b, dt_b, s_b = jax.jit(
            lambda y, a, b, d, r: solve_ivp_batched_dt(
                self._f, y, a, b, opts, d, lane_args=r)
        )(y0s, t0s, t1s, dt0s, rates)
        np.testing.assert_array_equal(np.asarray(y_v), np.asarray(y_b))
        np.testing.assert_array_equal(np.asarray(dt_v), np.asarray(dt_b))
        np.testing.assert_array_equal(np.asarray(s_v.accepted),
                                      np.asarray(s_b.accepted))

    def test_gradient_flows_to_lane_args(self):
        from ode_vio_tpu.ops.solvers.odeint import (
            solve_ivp_batched_dt, solve_ivp_dt,
        )

        opts = SolverOptions(rtol=1e-4, atol=1e-7, max_steps=32, dt0=0.01,
                             unroll_mode="bounded", exit_chunk=4)
        rates = jnp.array([-0.7, -0.4])
        y0s = jnp.ones((2, 2))
        t0s = jnp.zeros(2)
        t1s = jnp.array([0.8, 1.3])
        dt0s = jnp.full(2, 0.01)

        def loss_b(r):
            ys, _, _ = solve_ivp_batched_dt(
                self._f, y0s, t0s, t1s, opts, dt0s, lane_args=r)
            return jnp.sum(ys ** 2)

        def loss_v(r):
            ys, _, _ = jax.vmap(
                lambda y, a, b, d, rr: solve_ivp_dt(
                    lambda t, yy: self._f(t, yy, rr), y, a, b, opts, d)
            )(y0s, t0s, t1s, dt0s, r)
            return jnp.sum(ys ** 2)

        g_b = jax.jit(jax.grad(loss_b))(rates)
        g_v = jax.jit(jax.grad(loss_v))(rates)
        np.testing.assert_allclose(np.asarray(g_b), np.asarray(g_v),
                                   rtol=1e-6, atol=1e-9)
        # d/dr of sum(y0^2 exp(2 r T)) = 2 T * loss_lane — analytic check
        expect = 2.0 * np.asarray(t1s) * 2.0 * np.exp(
            2.0 * np.asarray(rates) * np.asarray(t1s))
        np.testing.assert_allclose(np.asarray(g_b), expect, rtol=1e-3)
