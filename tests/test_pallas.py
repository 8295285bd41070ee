"""Fused Pallas ODE-solve kernel vs the reference XLA solver path
(interpret mode on CPU; the same kernel compiles with Mosaic on TPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

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


class TestFusedCdeSolve:
    """fused_cde_solve vs the XLA cdeint path (interpret mode on CPU)."""

    def _problem(self, N=5, T=6, C=7, H=8, layers=2, seed=0, cubic=False,
                 repeated_knots=False):
        from ode_vio_tpu.ops.mlp import cde_func_sizes

        key = jax.random.PRNGKey(seed)
        k1, k2, k3, k4 = jax.random.split(key, 4)
        params = init_mlp(k1, cde_func_sizes(C, H, layers))
        z0 = 0.3 * jax.random.normal(k2, (N, H))
        ts = jnp.cumsum(
            jax.random.uniform(k3, (N, T), minval=0.05, maxval=0.3), axis=1
        )
        if repeated_knots:
            # ring-buffer masked prefix: first knots collapsed (zero-length
            # segments, zero derivative)
            ts = ts.at[:, :2].set(ts[:, 2:3])
        xs = jax.random.normal(k4, (N, T, C))
        if repeated_knots:
            xs = xs.at[:, :2].set(xs[:, 2:3])
        return params, z0, ts, xs

    def _run_both(self, params, z0, ts, xs, kind="linear", eval_ts=None,
                  **kw):
        from ode_vio_tpu.ops.interpolation import cdeint, make_path
        from ode_vio_tpu.ops.mlp import apply_cde_func
        from ode_vio_tpu.ops.pallas_kernels import fused_cde_solve

        H = z0.shape[1]
        C = xs.shape[2]
        ev = ts if eval_ts is None else eval_ts

        paths = jax.vmap(lambda t, x: make_path(t, x, kind))(ts, xs)
        cubic = kind == "cubic"
        res_pl = fused_cde_solve(
            params, z0, paths.ts, paths.b,
            paths.c if cubic else None, paths.d if cubic else None,
            ev, activation="tanh", interpret=True, **kw,
        )

        opts = SolverOptions(method=kw.get("method", "dopri5"),
                             unroll_mode="while",
                             rtol=kw["rtol"], atol=kw["atol"],
                             dt0=kw["dt0"], max_steps=kw["max_steps"])

        def one(t_i, x_i, z0_i, ev_i):
            path = make_path(t_i, x_i, kind)
            g = lambda z: apply_cde_func(params, z, "tanh", H, C)
            return cdeint(path, g, z0_i, ev_i, opts)

        zs_x, stats = jax.vmap(one)(ts, xs, z0, ev)
        return res_pl, zs_x, stats

    def test_matches_xla_cdeint_stepwise(self):
        """Values, per-row accepted/rejected step counts and incomplete
        totals must match the vmapped XLA cdeint/solve_at path."""
        params, z0, ts, xs = self._problem()
        kw = dict(rtol=1e-3, atol=1e-6, dt0=1e-2, max_steps=64)
        (zs, dt, acc, rej, inc), zs_x, stats = self._run_both(
            params, z0, ts, xs, **kw
        )
        np.testing.assert_allclose(np.asarray(zs), np.asarray(zs_x),
                                   rtol=3e-5, atol=3e-6)
        np.testing.assert_array_equal(np.asarray(acc),
                                      np.asarray(stats.accepted))
        np.testing.assert_array_equal(np.asarray(rej),
                                      np.asarray(stats.rejected))
        np.testing.assert_array_equal(np.asarray(inc),
                                      np.asarray(stats.incomplete))

    def test_cubic_path(self):
        params, z0, ts, xs = self._problem(seed=1)
        kw = dict(rtol=1e-3, atol=1e-6, dt0=1e-2, max_steps=64)
        (zs, _, acc, _, _), zs_x, stats = self._run_both(
            params, z0, ts, xs, kind="cubic", **kw
        )
        np.testing.assert_allclose(np.asarray(zs), np.asarray(zs_x),
                                   rtol=3e-5, atol=3e-6)
        np.testing.assert_array_equal(np.asarray(acc),
                                      np.asarray(stats.accepted))

    def test_repeated_knots_zero_length(self):
        """Ring-buffer masked prefixes: repeated knots are zero-length
        segments with zero derivative — no steps spent, z unchanged."""
        params, z0, ts, xs = self._problem(seed=2, repeated_knots=True)
        kw = dict(rtol=1e-3, atol=1e-6, dt0=1e-2, max_steps=64)
        (zs, _, acc, _, inc), zs_x, stats = self._run_both(
            params, z0, ts, xs, **kw
        )
        np.testing.assert_allclose(np.asarray(zs), np.asarray(zs_x),
                                   rtol=3e-5, atol=3e-6)
        # the two collapsed leading segments produce z0 unchanged
        np.testing.assert_allclose(np.asarray(zs[:, 0]), np.asarray(z0),
                                   rtol=1e-6)
        np.testing.assert_array_equal(np.asarray(acc),
                                      np.asarray(stats.accepted))
        np.testing.assert_array_equal(np.asarray(inc),
                                      np.asarray(stats.incomplete))

    def test_eval_ts_decoupled_from_path_knots(self):
        """RDE shape: evaluate at times that are NOT the path knots (the
        compressed logsig path vs original window times)."""
        params, z0, ts, xs = self._problem(seed=3, T=5)
        # eval at midpoints between the path knots plus the endpoint
        ev = 0.5 * (ts[:, :-1] + ts[:, 1:])
        ev = jnp.concatenate([ev, ts[:, -1:]], axis=1)
        kw = dict(rtol=1e-3, atol=1e-6, dt0=1e-2, max_steps=64)
        (zs, _, acc, rej, inc), zs_x, stats = self._run_both(
            params, z0, ts, xs, eval_ts=ev, **kw
        )
        np.testing.assert_allclose(np.asarray(zs), np.asarray(zs_x),
                                   rtol=3e-5, atol=3e-6)
        np.testing.assert_array_equal(np.asarray(acc),
                                      np.asarray(stats.accepted))
        np.testing.assert_array_equal(np.asarray(inc),
                                      np.asarray(stats.incomplete))

    def test_row_padding_and_blocking(self):
        """Non-multiple-of-8 rows pad transparently, and a forced
        multi-block contraction (block size not dividing C, so the padded
        tail block is exercised) stays exact. Tight solver tolerances pin
        the trajectories so fp-ordering noise between the two contraction
        orders cannot amplify through the chaotic dynamics (at loose rtol
        both solutions are valid-but-different within tolerance)."""
        params, z0, ts, xs = self._problem(N=3, C=13, H=16, seed=4)
        kw = dict(rtol=1e-6, atol=1e-9, dt0=1e-2, max_steps=512)
        (zs, _, acc, _, inc), zs_x, stats = self._run_both(
            params, z0, ts, xs, block_target_bytes=4096, **kw
        )
        assert zs.shape == (3, ts.shape[1], 16)
        np.testing.assert_allclose(np.asarray(zs), np.asarray(zs_x),
                                   rtol=2e-4, atol=2e-4)
        # no step-count assertion here: at rtol 1e-6 the f32 error
        # estimate sits at fp-noise scale, so the two contraction orders
        # legitimately take different (equally valid) step sequences
        np.testing.assert_array_equal(np.asarray(inc),
                                      np.asarray(stats.incomplete))


class TestFusedCdeModels:
    """--use_pallas on the CDE/RDE families: the fused whole-solve kernel
    must reproduce the XLA streaming eval (both streaming modes, state
    carried across windows)."""

    def _batch(self, seed=0, B=2, S=3):
        rng = np.random.default_rng(seed)
        img = jnp.asarray(rng.random((B, S, 32, 64, 3), np.float32) - 0.5)
        imu = jnp.asarray(
            rng.standard_normal((B, 10 * (S - 1) + 1, 6)), jnp.float32
        )
        ts = jnp.asarray(
            np.cumsum(rng.random((B, S)).astype(np.float32) * 0.1, 1)
        )
        return img, imu, ts

    @pytest.mark.parametrize("model_type,mode", [
        ("cde", "carry"), ("cde", "history"),
        ("rde", "carry"), ("rde", "history"),
    ])
    def test_use_pallas_matches_xla_eval(self, model_type, mode):
        from ode_vio_tpu.models.deepvio import init_model
        from tests.test_models import tiny_config

        mode_kw = (
            {"cde_streaming_mode": mode} if model_type == "cde"
            else {"rde_streaming_mode": mode}
        )
        cfg_x = tiny_config(model_type, **mode_kw)
        cfg_p = tiny_config(model_type, use_pallas=True, **mode_kw)
        model_x, variables = init_model(cfg_x, jax.random.PRNGKey(0),
                                        batch_size=1)
        model_p, _ = init_model(cfg_p, jax.random.PRNGKey(0), batch_size=1)
        rngs = {"gumbel": jax.random.PRNGKey(1)}

        img, imu, ts = self._batch()
        carry_x = carry_p = None
        for w in range(3):   # three streamed windows, carried state
            ts_w = ts + 0.5 * w
            px, carry_x = model_x.apply(variables, img + 0.01 * w, imu,
                                        ts_w, hc=carry_x, train=False,
                                        rngs=rngs)
            pp, carry_p = model_p.apply(variables, img + 0.01 * w, imu,
                                        ts_w, hc=carry_p, train=False,
                                        rngs=rngs)
            # window 0 (fresh state) pins fp-level agreement — a layout
            # bug would show O(1) relative error here; later windows
            # integrate ever-longer paths, where fp-ordering noise flips
            # marginal accept decisions and the two (equally valid) step
            # sequences diverge at SOLVER-tolerance scale, not fp scale
            rt, at = (2e-4, 2e-5) if w == 0 else (3e-2, 5e-3)
            np.testing.assert_allclose(np.asarray(pp), np.asarray(px),
                                       rtol=rt, atol=at,
                                       err_msg=f"window {w}")
        jax.tree_util.tree_map(
            lambda a, b: np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=3e-2, atol=5e-3
            ),
            carry_p, carry_x,
        )


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
