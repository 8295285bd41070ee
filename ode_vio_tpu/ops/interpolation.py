"""Continuous control paths for neural CDEs (torchcde replacement).

Provides the reference's `torchcde.linear_interpolation_coeffs` /
`LinearInterpolation` / `cdeint` capability
(/root/reference/src/models/PoseCDE.py:94-101, PoseRDE.py:97-106) plus the
cubic-Hermite control path (torchcde's
``hermite_cubic_coefficients_with_backward_differences``), as pure
shape-static JAX ops.

A path is a NamedTuple of knot times and per-segment polynomial
coefficients; ``evaluate``/``derivative`` locate the segment with a
branchless ``searchsorted`` + ``clip`` so they are cheap inside solver
loops. CDE integration reduces the CDE to an ODE ``z' = g(z) @ dX/dt``
solved on the shared solver core (SURVEY.md section 7, step 3).
"""

from __future__ import annotations

from typing import Callable, NamedTuple

import jax.numpy as jnp

from ode_vio_tpu.ops.solvers.odeint import SolverOptions, Stats, solve_at


class InterpolatedPath(NamedTuple):
    """Piecewise-cubic path ``X(t) = a + b*s + c*s^2 + d*s^3`` with
    ``s = t - ts[k]`` on segment ``k``. Linear paths simply have zero
    ``c``/``d``. Coefficient arrays have shape ``(T-1, C)``."""

    ts: jnp.ndarray  # (T,) knot times, strictly ascending
    a: jnp.ndarray   # (T-1, C)
    b: jnp.ndarray
    c: jnp.ndarray
    d: jnp.ndarray

    @property
    def t0(self) -> jnp.ndarray:
        return self.ts[0]

    @property
    def t1(self) -> jnp.ndarray:
        return self.ts[-1]

    def _segment(self, t):
        k = jnp.searchsorted(self.ts, t, side="right") - 1
        k = jnp.clip(k, 0, self.ts.shape[0] - 2)
        return k, t - self.ts[k]

    def evaluate(self, t) -> jnp.ndarray:
        """X(t); clamps outside [t0, t1] to the boundary polynomials."""
        k, s = self._segment(t)
        return ((self.d[k] * s + self.c[k]) * s + self.b[k]) * s + self.a[k]

    def derivative(self, t) -> jnp.ndarray:
        """dX/dt at t."""
        k, s = self._segment(t)
        return (3.0 * self.d[k] * s + 2.0 * self.c[k]) * s + self.b[k]


def linear_path(ts: jnp.ndarray, xs: jnp.ndarray) -> InterpolatedPath:
    """Piecewise-linear interpolation of observations ``xs`` (T, C) at knot
    times ``ts`` (T,) — `torchcde.linear_interpolation_coeffs` parity.

    Zero-length segments (repeated knots, used by masked/ring-buffer
    streaming paths) are tolerated: their derivative is defined as 0.
    """
    dt = (ts[1:] - ts[:-1])[:, None]
    safe_dt = jnp.where(dt > 0, dt, 1.0)
    b = (xs[1:] - xs[:-1]) / safe_dt
    zeros = jnp.zeros_like(b)
    return InterpolatedPath(ts=ts, a=xs[:-1], b=b, c=zeros, d=zeros)


def cubic_hermite_path(ts: jnp.ndarray, xs: jnp.ndarray) -> InterpolatedPath:
    """C^1 cubic-Hermite spline with backward-difference knot derivatives
    (torchcde's recommended smooth control path; BASELINE.json north star).

    Knot derivative ``m_k = (x_k - x_{k-1}) / (t_k - t_{k-1})`` with
    ``m_0 = m_1`` so the first segment degrades gracefully.
    """
    dt = ts[1:] - ts[:-1]
    safe = jnp.where(dt > 0, dt, 1.0)
    diffs = (xs[1:] - xs[:-1]) / safe[:, None]        # (T-1, C)
    m = jnp.concatenate([diffs[:1], diffs], axis=0)   # (T, C) backward diffs
    m0, m1 = m[:-1], m[1:]
    x0, x1 = xs[:-1], xs[1:]
    h = safe[:, None]
    # Hermite basis on s in [0, h]
    c = (3.0 * (x1 - x0) / h - 2.0 * m0 - m1) / h
    d = (2.0 * (x0 - x1) / h + m0 + m1) / (h * h)
    return InterpolatedPath(ts=ts, a=x0, b=m0, c=c, d=d)


def make_path(ts, xs, kind: str = "linear") -> InterpolatedPath:
    if kind == "linear":
        return linear_path(ts, xs)
    if kind == "cubic":
        return cubic_hermite_path(ts, xs)
    raise ValueError(f"unknown interpolation '{kind}'")


def cdeint(
    path: InterpolatedPath,
    func: Callable[[jnp.ndarray], jnp.ndarray],
    z0: jnp.ndarray,
    ts_eval: jnp.ndarray,
    opts: SolverOptions = SolverOptions(),
) -> tuple[jnp.ndarray, Stats]:
    """Integrate the neural CDE ``dz = func(z) dX(t)`` and return ``z`` at
    each ``ts_eval[i]`` (torchcde ``cdeint`` parity, PoseCDE.py:101).

    ``func(z) -> (H, C)`` is the CDE vector field; the CDE reduces to the
    ODE ``z' = func(z) @ X'(t)`` solved on the shared RK core, so every
    solver method / controller / gradient mode applies unchanged.
    """

    def ode_func(t, z):
        return func(z) @ path.derivative(t)

    ts = jnp.concatenate([jnp.reshape(path.t0, (1,)), jnp.asarray(ts_eval)])
    return solve_at(ode_func, z0, ts, opts)


def cdeint_batched(
    func: Callable[[jnp.ndarray], jnp.ndarray],
    z0: jnp.ndarray,        # (B, H)
    ts: jnp.ndarray,        # (B, T) path knot times
    xs: jnp.ndarray,        # (B, T, C) path observations
    eval_ts: jnp.ndarray,   # (B, E) evaluation times
    kind: str,
    opts: SolverOptions = SolverOptions(),
) -> tuple[jnp.ndarray, Stats]:
    """Batched ``vmap(cdeint)`` restructured so the solver loop runs ABOVE
    the batch axis (:func:`ode_vio_tpu.ops.solvers.odeint.solve_ivp_batched_dt`
    with the per-lane control paths as ``lane_args``). Iterates are
    identical to ``jax.vmap`` of :func:`cdeint` (per-lane masked updates),
    but:

    * ``'bounded'`` mode (training) gets the chunked early exit and
      per-chunk rematerialisation — the step cost and AD residuals pay
      for steps actually taken instead of ``max_steps_train`` per segment
      per lane (under ``vmap`` the early-exit ``lax.cond`` would lower to
      ``select`` and run both branches; this hoisting is what made the
      flagship's train solve cheap, BENCH.md round 3 — the cde/rde train
      path previously missed it).
    * ``'while'`` mode runs one loop with a scalar any-active predicate.

    Returns ``(zs (B, E, H), Stats)`` with per-lane ``(B,)`` stats —
    the same contract as :func:`cdeint_fused`.
    """
    import jax
    from jax import lax

    paths = jax.vmap(lambda t, x: make_path(t, x, kind))(ts, xs)
    arrays = tuple(paths)

    def fn(t, z, lane_path):
        pth = InterpolatedPath(*lane_path)
        return func(z) @ pth.derivative(t)

    B = z0.shape[0]
    eval_ts = jnp.asarray(eval_ts)
    # segment 0 runs path.t0 -> eval[0]; segment j runs eval[j-1] -> eval[j]
    seg_t0 = jnp.concatenate([ts[:, :1], eval_ts[:, :-1]], axis=1)  # (B, E)
    dt0 = jnp.full((B,), opts.dt0, jnp.float32)

    from ode_vio_tpu.ops.solvers.odeint import solve_ivp_batched_dt

    def seg(carry, bounds):
        z, dt = carry
        t0s, t1s = bounds
        z1, dt_next, stats = solve_ivp_batched_dt(
            fn, z, t0s, t1s, opts, dt, lane_args=arrays
        )
        return (z1, dt_next), (z1, stats)

    (_, _), (zs, stats) = lax.scan(
        seg, (z0, dt0), (seg_t0.T, eval_ts.T)
    )
    total = Stats(
        stats.accepted.sum(0), stats.rejected.sum(0), stats.incomplete.sum(0)
    )
    return jnp.swapaxes(zs, 0, 1), total


def cdeint_fused(
    field_params,
    activation: str,
    z0: jnp.ndarray,        # (B, H)
    ts: jnp.ndarray,        # (B, T) path knot times
    xs: jnp.ndarray,        # (B, T, C) path observations
    eval_ts: jnp.ndarray,   # (B, E) evaluation times
    kind: str,
    opts: SolverOptions,
) -> tuple[jnp.ndarray, Stats]:
    """Batched ``vmap(cdeint)`` as ONE fused Pallas TPU kernel
    (:func:`ode_vio_tpu.ops.pallas_kernels.fused_cde_solve`): the CDE
    field's MLP weights stay VMEM-resident across every RK stage of the
    whole multi-segment solve instead of re-streaming from HBM (~8.4 MB
    per stage at flagship dims — the measured bottleneck of the cde eval
    row, BENCH.md round 3). Inference only; identical semantics to the
    XLA path (parity pinned in tests/test_pallas.py::TestFusedCdeSolve).

    Returns ``(zs (B, E, H), Stats)`` with per-row (B,) aggregate stats,
    matching ``jax.vmap`` of :func:`cdeint`.
    """
    import jax

    from ode_vio_tpu.ops.pallas_kernels import fused_cde_solve

    paths = jax.vmap(lambda t, x: make_path(t, x, kind))(ts, xs)
    cubic = kind == "cubic"
    zs, _, acc, rej, inc = fused_cde_solve(
        field_params, z0, paths.ts, paths.b,
        paths.c if cubic else None, paths.d if cubic else None,
        eval_ts, activation=activation, method=opts.method,
        rtol=opts.rtol, atol=opts.atol, dt0=opts.dt0,
        max_steps=opts.max_steps, safety=opts.safety,
        factor_min=opts.factor_min, factor_max=opts.factor_max,
    )
    return zs, Stats(acc, rej, inc)


def cdeint_adjoint(
    path: InterpolatedPath,
    z0: jnp.ndarray,
    ts_eval: jnp.ndarray,
    field_params,
    field_apply: Callable,
    opts: SolverOptions = SolverOptions(),
) -> jnp.ndarray:
    """O(1)-memory CDE integration: gradients flow through the continuous
    adjoint (``jax.custom_vjp``) instead of stored solver intermediates —
    torchcde's ``adjoint=True`` with explicit ``adjoint_params`` including
    the interpolation coefficients (PoseCDE.py:98, PoseRDE.py:105-106).

    ``field_apply(params, z) -> (H, C)``; both the field parameters and the
    path coefficients receive gradients. Returns ``zs`` at each
    ``ts_eval[i]`` (no stats: the adjoint wrapper hides the solve)."""
    from jax import lax

    from ode_vio_tpu.ops.solvers.odeint import solve_ivp_adjoint

    def func(t, z, args):
        params, path_arrays = args
        pth = InterpolatedPath(*path_arrays)
        return field_apply(params, z) @ pth.derivative(t)

    args = (field_params, tuple(path))

    def seg(z, t_pair):
        z1 = solve_ivp_adjoint(func, opts, z, t_pair[0], t_pair[1], args)
        return z1, z1

    ts = jnp.concatenate([jnp.reshape(path.t0, (1,)), jnp.asarray(ts_eval)])
    pairs = jnp.stack([ts[:-1], ts[1:]], axis=-1)
    _, zs = lax.scan(seg, z0, pairs)
    return zs
