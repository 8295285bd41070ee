"""Control-path and log-signature tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ode_vio_tpu.ops.interpolation import (
    cdeint,
    cubic_hermite_path,
    linear_path,
)
from ode_vio_tpu.ops.logsig import logsig_dim, logsig_windows, logsignature
from ode_vio_tpu.ops.solvers import SolverOptions


class TestLinearPath:
    def test_hits_knots(self, rng):
        ts = jnp.asarray(np.sort(rng.uniform(0, 5, 7)).astype(np.float32))
        xs = jnp.asarray(rng.normal(size=(7, 3)).astype(np.float32))
        path = linear_path(ts, xs)
        for k in range(7):
            np.testing.assert_allclose(
                np.asarray(path.evaluate(ts[k])), np.asarray(xs[k]), atol=1e-5
            )

    def test_midpoint_and_derivative(self):
        ts = jnp.array([0.0, 2.0])
        xs = jnp.array([[0.0], [4.0]])
        path = linear_path(ts, xs)
        assert float(path.evaluate(1.0)[0]) == 2.0
        assert float(path.derivative(0.5)[0]) == 2.0

    def test_piecewise_constant_derivative(self):
        ts = jnp.array([0.0, 1.0, 3.0])
        xs = jnp.array([[0.0], [1.0], [1.0]])
        path = linear_path(ts, xs)
        assert float(path.derivative(0.5)[0]) == 1.0
        assert float(path.derivative(2.0)[0]) == 0.0


class TestCubicHermitePath:
    def test_hits_knots(self, rng):
        ts = jnp.asarray(np.sort(rng.uniform(0, 5, 6)).astype(np.float32))
        xs = jnp.asarray(rng.normal(size=(6, 2)).astype(np.float32))
        path = cubic_hermite_path(ts, xs)
        for k in range(6):
            np.testing.assert_allclose(
                np.asarray(path.evaluate(ts[k])), np.asarray(xs[k]), atol=1e-4
            )

    def test_c1_continuity(self, rng):
        """The right-derivative of segment k-1 equals the left-derivative
        of segment k exactly (checked analytically on the coefficients)."""
        ts = jnp.asarray(np.linspace(0, 3, 7, dtype=np.float32))
        xs = jnp.asarray(rng.normal(size=(7, 2)).astype(np.float32))
        p = cubic_hermite_path(ts, xs)
        h = np.asarray(ts[1:] - ts[:-1])[:, None]
        right_deriv = np.asarray(p.b) + 2 * np.asarray(p.c) * h + 3 * np.asarray(p.d) * h ** 2
        np.testing.assert_allclose(right_deriv[:-1], np.asarray(p.b)[1:],
                                   atol=1e-3)

    def test_reproduces_linear_data_exactly(self):
        ts = jnp.array([0.0, 1.0, 2.0, 3.0])
        xs = 2.0 * ts[:, None] + 1.0
        path = cubic_hermite_path(ts, xs)
        for t in (0.25, 1.5, 2.9):
            np.testing.assert_allclose(float(path.evaluate(t)[0]), 2 * t + 1,
                                       atol=1e-5)
            np.testing.assert_allclose(float(path.derivative(t)[0]), 2.0,
                                       atol=1e-5)


class TestCDEInt:
    def test_identity_field_recovers_path(self):
        """With func(z) = I, dz = dX so z(t) = z0 + X(t) - X(t0)."""
        ts = jnp.array([0.0, 0.5, 1.0, 2.0])
        xs = jnp.array([[0.0, 1.0], [1.0, 0.5], [0.5, 2.0], [2.0, -1.0]])
        path = linear_path(ts, xs)
        func = lambda z: jnp.eye(2)
        z0 = xs[0]
        opts = SolverOptions(rtol=1e-5, atol=1e-8, max_steps=256, dt0=0.01,
                             unroll_mode="while")
        zs, _ = cdeint(path, func, z0, ts[1:], opts)
        np.testing.assert_allclose(np.asarray(zs), np.asarray(xs[1:]), atol=1e-3)

    def test_grad_flows_through_cde(self):
        ts = jnp.array([0.0, 1.0, 2.0])
        xs = jnp.array([[0.0], [1.0], [0.5]])
        path = linear_path(ts, xs)
        opts = SolverOptions(rtol=1e-4, atol=1e-7, max_steps=64, dt0=0.01)

        def loss(w):
            func = lambda z: jnp.tanh(w * z).reshape(1, 1)
            zs, _ = cdeint(path, func, jnp.ones(1), ts[1:], opts)
            return jnp.sum(zs ** 2)

        g = jax.grad(loss)(jnp.asarray(0.3))
        assert np.isfinite(float(g)) and abs(float(g)) > 0


class TestLogSignature:
    def test_dims(self):
        assert logsig_dim(4, 1) == 4
        assert logsig_dim(4, 2) == 4 + 6
        assert logsig_dim(769, 2) == 769 + 769 * 768 // 2

    def test_increment_term(self, rng):
        xs = jnp.asarray(rng.normal(size=(10, 3)).astype(np.float32))
        sig = logsignature(xs, depth=2)
        np.testing.assert_allclose(
            np.asarray(sig[:3]), np.asarray(xs[-1] - xs[0]), atol=1e-5
        )

    def test_straight_line_has_zero_area(self):
        ts = np.linspace(0, 1, 9, dtype=np.float32)
        xs = jnp.asarray(np.stack([ts, 2 * ts, -ts], axis=1))
        sig = logsignature(xs, depth=2)
        np.testing.assert_allclose(np.asarray(sig[3:]), 0.0, atol=1e-6)

    def test_levy_area_of_closed_triangle(self):
        """For a closed path, the Levy area equals the signed enclosed
        area: triangle (0,0)->(1,0)->(1,1)->(0,0) has area 1/2."""
        xs = jnp.array([[0.0, 0.0], [1.0, 0.0], [1.0, 1.0], [0.0, 0.0]])
        sig = logsignature(xs, depth=2)
        np.testing.assert_allclose(np.asarray(sig[:2]), 0.0, atol=1e-6)
        assert float(sig[2]) == np.float32(0.5)

    def test_matches_bruteforce_double_sum(self, rng):
        xs = rng.normal(size=(12, 4)).astype(np.float32)
        D = np.diff(xs, axis=0)
        C = 4
        area = np.zeros((C, C))
        for k in range(len(D)):
            for l in range(k):
                area += 0.5 * (np.outer(D[l], D[k]) - np.outer(D[k], D[l]))
        iu, ju = np.triu_indices(C, k=1)
        expected = np.concatenate([xs[-1] - xs[0], area[iu, ju]])
        got = np.asarray(logsignature(jnp.asarray(xs), depth=2))
        np.testing.assert_allclose(got, expected, atol=1e-4)

    def test_batched(self, rng):
        xs = jnp.asarray(rng.normal(size=(5, 12, 3)).astype(np.float32))
        sig = logsignature(xs, depth=2)
        assert sig.shape == (5, logsig_dim(3, 2))
        np.testing.assert_allclose(
            np.asarray(sig[2]), np.asarray(logsignature(xs[2])), atol=1e-6
        )


class TestLogsigWindows:
    def test_shapes_and_times(self, rng):
        xs = jnp.asarray(rng.normal(size=(2, 45, 3)).astype(np.float32))
        ts = jnp.asarray(np.linspace(0, 4.4, 45, dtype=np.float32))
        ys, t_new = logsig_windows(xs, ts, depth=2, window=20)
        # windows: [0,20], [20,40], [40,44] -> 3 windows, 4 knots
        assert ys.shape == (2, 4, logsig_dim(3, 2))
        assert t_new.shape == (4,)
        assert float(t_new[0]) == 0.0 and float(t_new[-1]) == float(ts[-1])

    def test_increments_are_window_logsigs(self, rng):
        xs = jnp.asarray(rng.normal(size=(30, 2)).astype(np.float32))
        ts = jnp.asarray(np.arange(30, dtype=np.float32))
        ys, _ = logsig_windows(xs, ts, depth=2, window=10)
        first = logsignature(xs[0:11], depth=2)
        np.testing.assert_allclose(
            np.asarray(ys[1] - ys[0]), np.asarray(first), atol=1e-5
        )


class TestCdeintBatched:
    """cdeint_batched: the scan-above-batch CDE solve (per-lane control
    paths as lane_args) must reproduce jax.vmap(cdeint) exactly — values,
    stats, and gradients (it is the cde/rde train/eval XLA path since
    round 4)."""

    def _setup(self, rng, B=3, T=6, C=4, H=5):
        ts = np.sort(rng.uniform(0, 2, (B, T)).astype(np.float32), axis=1)
        # strictly ascending per lane
        ts += np.arange(T, dtype=np.float32) * 1e-2
        xs = rng.normal(size=(B, T, C)).astype(np.float32) * 0.5
        z0 = rng.normal(size=(B, H)).astype(np.float32) * 0.1
        W = rng.normal(size=(H * C, H)).astype(np.float32) * 0.3
        eval_ts = ts[:, 1:]

        def field(W):
            def g(z):
                return jnp.tanh(W @ z).reshape(H, C)
            return g

        return (jnp.asarray(ts), jnp.asarray(xs), jnp.asarray(z0),
                jnp.asarray(W), jnp.asarray(eval_ts), field, H)

    @pytest.mark.parametrize("kind", ["linear", "cubic"])
    @pytest.mark.parametrize("mode", ["bounded", "while"])
    def test_matches_vmapped_cdeint(self, rng, kind, mode):
        from ode_vio_tpu.ops.interpolation import cdeint_batched, make_path

        ts, xs, z0, W, eval_ts, field, H = self._setup(rng)
        opts = SolverOptions(rtol=1e-3, atol=1e-6, max_steps=32, dt0=1e-2,
                             unroll_mode=mode, exit_chunk=4)
        g = field(W)

        def one(t_i, x_i, z_i, e_i):
            path = make_path(t_i, x_i, kind)
            return cdeint(path, g, z_i, e_i, opts)

        zs_v, s_v = jax.jit(jax.vmap(one))(ts, xs, z0, eval_ts)
        zs_b, s_b = jax.jit(
            lambda t, x, z, e: cdeint_batched(g, z, t, x, e, kind, opts)
        )(ts, xs, z0, eval_ts)
        np.testing.assert_array_equal(np.asarray(zs_v), np.asarray(zs_b))
        np.testing.assert_array_equal(np.asarray(s_v.accepted),
                                      np.asarray(s_b.accepted))
        np.testing.assert_array_equal(np.asarray(s_v.rejected),
                                      np.asarray(s_b.rejected))
        np.testing.assert_array_equal(np.asarray(s_v.incomplete),
                                      np.asarray(s_b.incomplete))

    def test_gradients_match_vmapped(self, rng):
        """Gradients w.r.t. the field params AND the observations (both
        feed from the network in PoseCDE/PoseRDE) agree with the vmapped
        per-lane bounded scan."""
        from ode_vio_tpu.ops.interpolation import cdeint_batched, make_path

        ts, xs, z0, W, eval_ts, field, H = self._setup(rng)
        opts = SolverOptions(rtol=1e-3, atol=1e-6, max_steps=32, dt0=1e-2,
                             unroll_mode="bounded", exit_chunk=4)

        def loss_v(W, xs):
            g = field(W)

            def one(t_i, x_i, z_i, e_i):
                path = make_path(t_i, x_i, "linear")
                return cdeint(path, g, z_i, e_i, opts)[0]

            zs = jax.vmap(one)(ts, xs, z0, eval_ts)
            return jnp.sum(zs ** 2)

        def loss_b(W, xs):
            zs, _ = cdeint_batched(field(W), z0, ts, xs, eval_ts,
                                   "linear", opts)
            return jnp.sum(zs ** 2)

        gW_v, gx_v = jax.jit(jax.grad(loss_v, argnums=(0, 1)))(W, xs)
        gW_b, gx_b = jax.jit(jax.grad(loss_b, argnums=(0, 1)))(W, xs)
        # forward VALUES are bitwise-equal (test above); gradients differ
        # by f32 reassociation only — the per-chunk remat replay and the
        # hoisted scan accumulate the same contributions in a different
        # order (measured ~2e-6 rel on this fixture)
        np.testing.assert_allclose(np.asarray(gW_v), np.asarray(gW_b),
                                   rtol=5e-4, atol=1e-6)
        np.testing.assert_allclose(np.asarray(gx_v), np.asarray(gx_b),
                                   rtol=5e-4, atol=1e-6)
