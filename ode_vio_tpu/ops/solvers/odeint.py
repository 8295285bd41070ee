"""Differentiable adaptive/fixed-step ODE integration under ``jit``.

TPU-native replacement for the reference's solver runtime — torchode's
``AutoDiffAdjoint(step_method, IntegralController).solve(InitialValueProblem)``
(/root/reference/src/models/PoseODERNN.py:55-75) and torchdiffeq's
``odeint``/``odeint_adjoint`` reached through torchcde
(/root/reference/src/models/PoseCDE.py:101).

Design (SURVEY.md section 7, hard parts 1-2):

* One generic explicit-RK stepper over a :class:`ButcherTableau`, operating
  on arbitrary pytree states.
* An integral (I) step-size controller with the torchdiffeq/torchode
  semantics: RMS error norm over ``err / (atol + rtol*max(|y0|,|y1|))``,
  growth factor ``safety * ratio**(-1/order)`` clipped to
  ``[factor_min, factor_max]``. Controller decisions are
  ``stop_gradient``-ed so step sizes act as constants of the computation.
* Three execution modes:
    - ``'while'``   — ``lax.while_loop``; fastest, forward-only (inference).
    - ``'bounded'`` — masked ``lax.scan`` over ``max_steps``; identical
      iterates, reverse-mode differentiable (discretize-then-optimize).
    - ``'adjoint'`` — :func:`solve_ivp_adjoint`, continuous adjoint via
      ``jax.custom_vjp`` with O(1) memory.
* Per-sample adaptive steps in a batch come for free: ``jax.vmap`` of the
  while/scan loop batches the predicate and masks per-lane updates —
  torchode's headline capability (its `InitialValueProblem` batching) by
  construction.

Everything is shape-static and jit/vmap/pjit-compatible.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any, Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp
from jax import lax

from ode_vio_tpu.ops.solvers.tableaus import ButcherTableau, get_tableau

Pytree = Any
VectorField = Callable[[jnp.ndarray, Pytree], Pytree]  # f(t, y) -> dy/dt

_SAFE_RATIO_FLOOR = 1e-10

# torchdiffeq's fixed-grid linear-multistep method strings (the reference's
# experiment diary runs implicit_adams through the --cde_solver flag,
# /root/reference/results/log.txt). Choosing one of these implies
# fixed-grid semantics, exactly as in torchdiffeq — rtol/atol are ignored.
MULTISTEP_METHODS = ("explicit_adams", "implicit_adams")


@dataclasses.dataclass(frozen=True)
class SolverOptions:
    """Static solver options (hashable; safe as a jit-static argument)."""

    method: str = "dopri5"
    rtol: float = 1e-2
    atol: float = 1e-6
    dt0: float = 1e-4
    max_steps: int = 64
    adaptive: bool = True
    fixed_steps: int = 4
    unroll_mode: str = "bounded"  # 'bounded' | 'while' | 'adjoint'
    safety: float = 0.9
    factor_min: float = 0.2
    factor_max: float = 10.0
    # chunk size for the batched bounded solver's early exit
    # (solve_ivp_batched_dt): the masked scan is grouped into
    # ceil(max_steps/exit_chunk) chunks, each wrapped in a scalar-predicate
    # lax.cond that skips the whole chunk once EVERY lane has converged.
    exit_chunk: int = 4
    # Rematerialise each chunk under reverse-mode AD. Without this the
    # forward pass stacks every RK-stage intermediate for the FULL step
    # budget (scan residuals are written even for chunks the early-exit
    # cond skips — the identity branch zero-fills its residual slots), so
    # the backward cost scales with max_steps instead of actual steps:
    # measured ~25 ms of the flagship B=32 train step at budget 16 where
    # the warm-started solves take ~2-3 steps (BENCH.md round 3). With
    # remat, residuals collapse to the chunk-entry carry and the backward
    # replays only chunks whose forward actually ran. Exact (same values,
    # deterministic recompute); costs one extra forward of taken chunks.
    remat_chunks: bool = True

    @classmethod
    def from_config(cls, cfg, train: bool = False) -> "SolverOptions":
        """Build from a :class:`ode_vio_tpu.config.SolverConfig`. Training
        uses the tighter ``max_steps_train`` budget (the bounded scan pays
        for every iteration whether needed or not)."""
        max_steps = (
            getattr(cfg, "max_steps_train", cfg.max_steps)
            if train
            else cfg.max_steps
        )
        return cls(
            method=cfg.method, rtol=cfg.rtol, atol=cfg.atol, dt0=cfg.dt0,
            max_steps=max_steps,
            # multistep method strings are fixed-grid by construction
            # (torchdiffeq semantics): they override the adaptive flag
            adaptive=cfg.adaptive and cfg.method not in MULTISTEP_METHODS,
            fixed_steps=cfg.fixed_steps, unroll_mode=cfg.unroll_mode,
            safety=cfg.safety, factor_min=cfg.factor_min,
            factor_max=cfg.factor_max,
            exit_chunk=getattr(cfg, "exit_chunk", 4),
        )

    @property
    def tableau(self) -> ButcherTableau:
        return get_tableau(self.method)


class Stats(NamedTuple):
    """Solver step statistics (int32), for observability and step-count
    parity tests against the reference solver stack.

    ``incomplete`` is 1 when the solve exhausted its step budget before
    reaching ``t1`` (the returned state is the partial integral at
    ``t < t1``). torchode surfaces this as a solver status; silent
    truncation would quietly change what gradients mean under a starved
    ``max_steps_train`` budget (VERDICT round 1, weak #2)."""

    accepted: jnp.ndarray
    rejected: jnp.ndarray
    incomplete: jnp.ndarray

    @property
    def total(self) -> jnp.ndarray:
        return self.accepted + self.rejected


class _State(NamedTuple):
    t: jnp.ndarray        # current time (scalar)
    y: Pytree             # current state
    f: Pytree             # derivative at (t, y) — FSAL cache
    dt: jnp.ndarray       # proposed next step size (scalar, > 0)
    accepted: jnp.ndarray
    rejected: jnp.ndarray


# ---------------------------------------------------------------------------
# Generic explicit RK step over pytrees
# ---------------------------------------------------------------------------

def _weighted_sum(coeffs, trees):
    """sum_i coeffs[i] * trees[i] over pytrees, skipping zero coefficients."""
    terms = [(c, k) for c, k in zip(coeffs, trees) if c != 0.0]
    if not terms:
        return jax.tree_util.tree_map(jnp.zeros_like, trees[0])
    acc = jax.tree_util.tree_map(lambda x: terms[0][0] * x, terms[0][1])
    for c, k in terms[1:]:
        acc = jax.tree_util.tree_map(lambda a, x: a + c * x, acc, k)
    return acc


def rk_step(
    func: VectorField,
    t: jnp.ndarray,
    y: Pytree,
    dt: jnp.ndarray,
    tab: ButcherTableau,
    f0: Optional[Pytree] = None,
):
    """One explicit RK step: returns ``(y1, err, k_last)`` where ``err`` is
    the embedded error estimate (zeros if the method has none) and
    ``k_last`` the final stage derivative (equals ``f(t+dt, y1)`` for FSAL
    methods)."""
    add_scaled = lambda base, incr: jax.tree_util.tree_map(
        lambda b, i: b + dt * i, base, incr
    )
    ks = [f0 if (tab.fsal and f0 is not None) else func(t, y)]
    for i in range(1, tab.num_stages):
        yi = add_scaled(y, _weighted_sum(tab.a[i], ks))
        ks.append(func(t + tab.c[i] * dt, yi))
    y1 = add_scaled(y, _weighted_sum(tab.b_sol, ks))
    if tab.b_err is not None:
        err = jax.tree_util.tree_map(
            lambda e: dt * e, _weighted_sum(tab.b_err, ks)
        )
    else:
        err = jax.tree_util.tree_map(jnp.zeros_like, y)
    return y1, err, ks[-1]


def _error_ratio(err, y0, y1, rtol, atol):
    """RMS norm of the scaled error (torchdiffeq/torchode convention)."""
    def leaf(e, a, b):
        scale = atol + rtol * jnp.maximum(jnp.abs(a), jnp.abs(b))
        r = e / scale
        return jnp.sum(r * r), r.size

    parts = jax.tree_util.tree_leaves(
        jax.tree_util.tree_map(leaf, err, y0, y1, is_leaf=lambda x: False)
    )
    sq = sum(parts[0::2])
    n = sum(parts[1::2])
    return jnp.sqrt(sq / n)


# ---------------------------------------------------------------------------
# Adaptive integration of one interval [t0, t1]
# ---------------------------------------------------------------------------

def _adaptive_step_body(func, t1, opts: SolverOptions, s: _State) -> _State:
    tab = opts.tableau
    remaining = jnp.maximum(t1 - s.t, 0.0)
    clamped = s.dt >= remaining
    dt = jnp.where(clamped, remaining, s.dt)

    y1, err, k_last = rk_step(func, s.t, s.y, dt, tab, s.f)
    ratio = _error_ratio(err, s.y, y1, opts.rtol, opts.atol)
    accept = ratio <= 1.0

    # Integral controller; decisions are constants of the computation.
    safe_ratio = jnp.maximum(lax.stop_gradient(ratio), _SAFE_RATIO_FLOOR)
    factor = jnp.clip(
        opts.safety * safe_ratio ** (-1.0 / tab.order),
        opts.factor_min,
        opts.factor_max,
    )
    dt_next = jnp.maximum(lax.stop_gradient(dt) * factor, jnp.finfo(dt.dtype).tiny)

    t_new = jnp.where(accept, jnp.where(clamped, t1, s.t + dt), s.t)
    select = lambda a, b: jax.tree_util.tree_map(
        lambda x, z: jnp.where(accept, x, z), a, b
    )
    y_new = select(y1, s.y)
    f_new = select(k_last, s.f) if tab.fsal else s.f
    return _State(
        t=t_new,
        y=y_new,
        f=f_new,
        dt=dt_next,
        accepted=s.accepted + accept.astype(jnp.int32),
        rejected=s.rejected + (~accept).astype(jnp.int32),
    )


def _init_state(func, y0, t0, dt0, tab) -> _State:
    t0 = jnp.asarray(t0, dtype=jnp.result_type(t0, jnp.float32))
    f0 = func(t0, y0) if tab.fsal else jax.tree_util.tree_map(jnp.zeros_like, y0)
    zero = jnp.zeros((), jnp.int32)
    return _State(
        t=t0, y=y0, f=f0,
        dt=jnp.asarray(dt0, dtype=t0.dtype),
        accepted=zero, rejected=zero,
    )


def _solve_adaptive(func, y0, t0, t1, opts: SolverOptions, dt0):
    tab = opts.tableau
    if not tab.adaptive_capable:
        raise ValueError(
            f"method '{tab.name}' has no embedded error estimate; "
            "use adaptive=False (fixed-step)"
        )
    t1 = jnp.asarray(t1, dtype=jnp.result_type(t1, jnp.float32))
    state = _init_state(func, y0, t0, dt0, tab)
    body = partial(_adaptive_step_body, func, t1, opts)

    if opts.unroll_mode == "while":
        def cond(s: _State):
            return ((t1 - s.t) > 0.0) & (s.accepted + s.rejected < opts.max_steps)

        final = lax.while_loop(cond, body, state)
    else:  # 'bounded': masked scan — reverse-mode differentiable
        def scan_body(s: _State, _):
            active = ((t1 - s.t) > 0.0) & (s.accepted + s.rejected < opts.max_steps)
            nxt = body(s)
            sel = lambda a, b: jax.tree_util.tree_map(
                lambda x, z: jnp.where(active, x, z), a, b
            )
            return _State(*sel(tuple(nxt), tuple(s))), None

        final, _ = lax.scan(scan_body, state, None, length=opts.max_steps)

    incomplete = ((t1 - final.t) > 0.0).astype(jnp.int32)
    stats = Stats(final.accepted, final.rejected, incomplete)
    return final.y, final.dt, stats


def _solve_fixed_adams(func, y0, t0, t1, opts: SolverOptions):
    """Fixed-step order-4 Adams multistep integration over
    ``opts.fixed_steps`` equal steps — torchdiffeq's fixed-grid
    ``explicit_adams`` (Adams-Bashforth) and ``implicit_adams``
    (Adams-Bashforth-Moulton PECE) method strings.

    Startup deviates deliberately from torchdiffeq's order ramp (it grows
    the multistep order 1..4 over the first steps): the first
    ``min(3, n)`` steps run single-step RK4 of the same asymptotic order,
    which keeps the whole trajectory O(dt^4) and avoids carrying a
    variable-order history through ``lax.scan``. Thereafter:

    * predictor (AB4):  y* = y + dt/24 (55 f_k - 59 f_{k-1} + 37 f_{k-2}
      - 9 f_{k-3})
    * corrector (AM4, implicit_adams only, one PECE sweep):
      y_{k+1} = y + dt/24 (9 f(t_{k+1}, y*) + 19 f_k - 5 f_{k-1}
      + f_{k-2})
    """
    t0 = jnp.asarray(t0, dtype=jnp.result_type(t0, jnp.float32))
    t1 = jnp.asarray(t1, dtype=t0.dtype)
    n = opts.fixed_steps
    dt = (t1 - t0) / n
    implicit = opts.method == "implicit_adams"
    rk4 = get_tableau("rk4")

    add = lambda base, coeffs, trees: jax.tree_util.tree_map(
        lambda b, i: b + dt * i, base, _weighted_sum(coeffs, trees)
    )

    # RK4 startup (python-unrolled; n is static), recording f at each knot.
    y = y0
    hist = []  # f(t_k, y_k), oldest first
    for k in range(min(3, n)):
        t = t0 + k * dt
        hist.append(func(t, y))
        y, _, _ = rk_step(func, t, y, dt, rk4, None)

    if n > 3:
        def body(carry, k):
            yk, fm1, fm2, fm3 = carry  # f at t_{k-1}, t_{k-2}, t_{k-3}
            t = t0 + k * dt
            f0 = func(t, yk)
            y_pred = add(
                yk, (55 / 24, -59 / 24, 37 / 24, -9 / 24), (f0, fm1, fm2, fm3)
            )
            if implicit:
                fp = func(t + dt, y_pred)
                y_next = add(
                    yk, (9 / 24, 19 / 24, -5 / 24, 1 / 24), (fp, f0, fm1, fm2)
                )
            else:
                y_next = y_pred
            return (y_next, f0, fm1, fm2), None

        (y, _, _, _), _ = lax.scan(
            body,
            (y, hist[2], hist[1], hist[0]),
            jnp.arange(3, n, dtype=t0.dtype),
        )

    zero = jnp.zeros((), jnp.int32)
    return y, dt, Stats(zero + n, zero, zero)


def _solve_fixed(func, y0, t0, t1, opts: SolverOptions):
    """Fixed-step integration with ``opts.fixed_steps`` equal steps
    (torchode FixedStepController parity, PoseODERNN.py:77-86)."""
    if opts.method in MULTISTEP_METHODS:
        return _solve_fixed_adams(func, y0, t0, t1, opts)
    tab = opts.tableau
    t0 = jnp.asarray(t0, dtype=jnp.result_type(t0, jnp.float32))
    t1 = jnp.asarray(t1, dtype=t0.dtype)
    n = opts.fixed_steps
    dt = (t1 - t0) / n

    def body(carry, k):
        y, f = carry
        t = t0 + k * dt
        y1, _, k_last = rk_step(func, t, y, dt, tab, f)
        return (y1, k_last if tab.fsal else f), None

    f0 = func(t0, y0) if tab.fsal else jax.tree_util.tree_map(jnp.zeros_like, y0)
    (y1, _), _ = lax.scan(body, (y0, f0), jnp.arange(n, dtype=t0.dtype))
    zero = jnp.zeros((), jnp.int32)
    return y1, dt, Stats(zero + n, zero, zero)


def solve_ivp(
    func: VectorField,
    y0: Pytree,
    t0,
    t1,
    opts: SolverOptions = SolverOptions(),
    dt0=None,
):
    """Integrate ``dy/dt = func(t, y)`` from ``t0`` to ``t1 >= t0``.

    Returns ``(y1, stats)``. Batch by ``jax.vmap``; per-sample adaptive
    step sizes then fall out of the loop-batching rules.
    """
    y1, _, stats = solve_ivp_dt(func, y0, t0, t1, opts, dt0)
    return y1, stats


def solve_ivp_dt(
    func: VectorField,
    y0: Pytree,
    t0,
    t1,
    opts: SolverOptions = SolverOptions(),
    dt0=None,
):
    """As :func:`solve_ivp` but also returns the controller's final
    proposed step size — pass it as the next interval's ``dt0`` to
    warm-start the controller (a torchode-style optimization the
    reference forfeits by re-solving from dt0=1e-4 every frame,
    PoseODERNN.py:72; cuts the ramp-up steps of consecutive solves).

    Returns ``(y1, dt_final, stats)``.
    """
    dt0 = opts.dt0 if dt0 is None else dt0
    if opts.unroll_mode == "adjoint":
        raise ValueError(
            "use solve_ivp_adjoint() for the continuous-adjoint mode "
            "(it needs explicit params)"
        )
    if opts.adaptive and opts.method not in MULTISTEP_METHODS:
        return _solve_adaptive(func, y0, t0, t1, opts, dt0)
    return _solve_fixed(func, y0, t0, t1, opts)


def solve_ivp_batched_dt(
    func: VectorField,
    y0: Pytree,
    t0,
    t1,
    opts: SolverOptions = SolverOptions(),
    dt0=None,
    lane_args: Pytree = None,
):
    """Batched adaptive solve with chunked early exit — the
    reverse-differentiable counterpart of torchode's batch solve that does
    NOT pay for the full ``max_steps`` budget once every lane converged.

    ``y0`` leaves carry a leading batch axis ``N``; ``t0``/``t1``/``dt0``
    are ``(N,)``. Semantics are identical to
    ``jax.vmap(solve_ivp_dt)(y0, t0, t1, dt0)`` in the ``'bounded'`` mode
    (per-lane masked iterates, bitwise-equal results), but the scan runs
    OUTSIDE the batching: the per-lane active mask reduces to one scalar
    ``any(active)`` per chunk of ``opts.exit_chunk`` iterations, and a
    ``lax.cond`` on that scalar skips converged chunks entirely — forward
    and backward. Under ``jax.vmap`` a per-lane cond would lower to
    ``select`` (both branches execute); hoisting the loop above the batch
    axis is what makes the skip real. With the warm-started controller
    (~2-3 accepted steps/solve) this cuts most of the masked-scan waste of
    a generous ``max_steps_train`` budget.

    ``lane_args``: optional pytree of PER-LANE auxiliary data (leading
    axis ``N``), passed through to ``func(t, y, lane_arg)`` — e.g. each
    lane's control-path coefficients in a batched CDE solve (the vector
    field then differs per lane, which a plain closure cannot express
    under the hoisted scan). Gradients flow to ``lane_args`` normally.
    When supplied, ``func`` must take the third argument.

    Returns ``(y1, dt_final, stats)`` with per-lane ``(N,)`` stats.
    """
    if lane_args is None:
        fn = lambda t, y, _la: func(t, y)
        la = jnp.zeros_like(jnp.asarray(t0, jnp.float32))
    else:
        fn = func
        la = lane_args
    dt0 = (
        jnp.full_like(jnp.asarray(t0, jnp.float32), opts.dt0)
        if dt0 is None
        else dt0
    )
    if (
        not (opts.adaptive and opts.unroll_mode != "adjoint")
        or opts.method in MULTISTEP_METHODS
    ):
        return jax.vmap(
            lambda y, a, b, d, l: solve_ivp_dt(
                lambda t, yy: fn(t, yy, l), y, a, b, opts, d
            )
        )(y0, t0, t1, dt0, la)

    tab = opts.tableau
    t1 = jnp.asarray(t1, dtype=jnp.result_type(t1, jnp.float32))
    state = jax.vmap(
        lambda y, a, d, l: _init_state(
            lambda t, yy: fn(t, yy, l), y, a, d, tab
        )
    )(y0, t0, dt0, la)
    vbody = jax.vmap(
        lambda tt, s, l: _adaptive_step_body(
            lambda t, yy: fn(t, yy, l), tt, opts, s
        )
    )

    def active(s: _State) -> jnp.ndarray:  # (N,) bool
        return ((t1 - s.t) > 0.0) & (s.accepted + s.rejected < opts.max_steps)

    def masked(act, new, old):
        sel = lambda x, z: jnp.where(
            act.reshape(act.shape + (1,) * (x.ndim - 1)), x, z
        )
        return _State(*jax.tree_util.tree_map(sel, tuple(new), tuple(old)))

    def inner(s: _State, _):
        return masked(active(s), vbody(t1, s, la), s), None

    if opts.unroll_mode == "while":
        # batched while: one loop, scalar any-active predicate
        final = lax.while_loop(
            lambda s: jnp.any(active(s)),
            lambda s: inner(s, None)[0],
            state,
        )
    else:  # 'bounded' with chunked early exit
        # exit_chunk <= 0 -> one chunk spanning the whole budget (the cond
        # then only skips when the solve converged before the first check)
        chunk = (
            opts.max_steps
            if opts.exit_chunk <= 0
            else min(opts.exit_chunk, opts.max_steps)
        )
        n_chunks = -(-opts.max_steps // chunk)

        def run_chunk(ss: _State) -> _State:
            return lax.scan(inner, ss, None, length=chunk)[0]

        if opts.remat_chunks:
            run_chunk = jax.checkpoint(run_chunk)

        def chunk_body(s: _State, _):
            s2 = lax.cond(jnp.any(active(s)), run_chunk, lambda ss: ss, s)
            return s2, None

        final, _ = lax.scan(chunk_body, state, None, length=n_chunks)

    incomplete = ((t1 - final.t) > 0.0).astype(jnp.int32)
    stats = Stats(final.accepted, final.rejected, incomplete)
    return final.y, final.dt, stats


def solve_at(
    func: VectorField,
    y0: Pytree,
    ts: jnp.ndarray,
    opts: SolverOptions = SolverOptions(),
):
    """Dense output: integrate through the strictly-ascending knot vector
    ``ts`` (shape ``(T,)``, ``y0`` at ``ts[0]``) and return states at
    ``ts[1:]`` stacked on a new leading axis, plus aggregate stats.

    The proposed step size is carried across segments (warm restart), so a
    T-knot solve costs barely more than one long solve — the same
    continuous-solve economics as torchode's ``t_eval`` interpolation,
    without the interpolation machinery (eval points are segment ends).
    """
    ts = jnp.asarray(ts)

    def seg(carry, t_pair):
        y, dt = carry
        t0, t1 = t_pair
        if opts.adaptive and opts.method not in MULTISTEP_METHODS:
            y1, dt_next, stats = _solve_adaptive(func, y, t0, t1, opts, dt)
        else:
            y1, dt_next, stats = _solve_fixed(func, y, t0, t1, opts)
        return (y1, dt_next), (y1, stats)

    dt0 = jnp.asarray(opts.dt0, dtype=jnp.result_type(ts, jnp.float32))
    pairs = jnp.stack([ts[:-1], ts[1:]], axis=-1)
    (_, _), (ys, stats) = lax.scan(seg, (y0, dt0), pairs)
    total = Stats(jnp.sum(stats.accepted), jnp.sum(stats.rejected),
                  jnp.sum(stats.incomplete))
    return ys, total


# ---------------------------------------------------------------------------
# Continuous adjoint (optimize-then-discretize), O(1) memory in step count
# ---------------------------------------------------------------------------

@partial(jax.custom_vjp, nondiff_argnums=(0, 1))
def solve_ivp_adjoint(func, opts: SolverOptions, y0, t0, t1, args):
    """Adjoint-mode ``solve_ivp``. ``func(t, y, args) -> dy/dt`` must take
    its differentiable parameters explicitly through ``args``.

    Forward runs the fast ``while`` loop; backward integrates the augmented
    adjoint ODE from ``t1`` back to ``t0`` with the same method/tolerances
    (torchdiffeq ``odeint_adjoint`` / torchcde ``adjoint=True`` parity,
    PoseCDE.py:98-101).
    """
    fwd_opts = dataclasses.replace(opts, unroll_mode="while")
    y1, _ = solve_ivp(lambda t, y: func(t, y, args), y0, t0, t1, fwd_opts)
    return y1


def _adjoint_fwd(func, opts, y0, t0, t1, args):
    y1 = solve_ivp_adjoint(func, opts, y0, t0, t1, args)
    return y1, (y0, y1, t0, t1, args)


def _adjoint_bwd(func, opts, residuals, ct_y1):
    y0, y1, t0, t1, args = residuals
    t0 = jnp.asarray(t0, dtype=jnp.result_type(t0, jnp.float32))
    t1 = jnp.asarray(t1, dtype=t0.dtype)

    # dL/dt1 = ct . f(t1, y1)
    f1 = func(t1, y1, args)
    t1_bar = sum(
        jnp.vdot(a, b)
        for a, b in zip(jax.tree_util.tree_leaves(ct_y1),
                        jax.tree_util.tree_leaves(f1))
    )

    zero_args = jax.tree_util.tree_map(jnp.zeros_like, args)
    aug0 = (y1, ct_y1, zero_args)

    def aug_dot(s, aug):
        y, a_y, _ = aug
        t = t1 - s  # reverse time
        f_val, vjp_fn = jax.vjp(lambda yy, aa: func(t, yy, aa), y, args)
        df_dy_t_a, df_darg_t_a = vjp_fn(a_y)
        neg = lambda tr: jax.tree_util.tree_map(jnp.negative, tr)
        return (neg(f_val), df_dy_t_a, df_darg_t_a)

    bwd_opts = dataclasses.replace(opts, unroll_mode="while")
    span = t1 - t0
    (y0_rec, a_y0, args_bar), _ = solve_ivp(
        aug_dot, aug0, jnp.zeros_like(span), span, bwd_opts
    )
    del y0_rec  # reconstructed initial state (not reused; y0 is exact)

    f0 = func(t0, y0, args)
    t0_bar = -sum(
        jnp.vdot(a, b)
        for a, b in zip(jax.tree_util.tree_leaves(a_y0),
                        jax.tree_util.tree_leaves(f0))
    )
    return a_y0, t0_bar, t1_bar, args_bar


solve_ivp_adjoint.defvjp(_adjoint_fwd, _adjoint_bwd)


# ---------------------------------------------------------------------------
# Initial step-size heuristic (Hairer, Norsett & Wanner)
# ---------------------------------------------------------------------------

def initial_step_size(func, y0, t0, order, rtol, atol):
    """Automatic dt0 selection; optional alternative to the reference's
    hard-coded ``dt0=1e-4`` (PoseODERNN.py:72)."""
    f0 = func(t0, y0)
    norm = lambda tr: jnp.sqrt(
        sum(jnp.sum(x * x) for x in jax.tree_util.tree_leaves(tr))
        / sum(x.size for x in jax.tree_util.tree_leaves(tr))
    )
    scale = jax.tree_util.tree_map(
        lambda y: atol + jnp.abs(y) * rtol, y0
    )
    d0 = norm(jax.tree_util.tree_map(lambda y, s: y / s, y0, scale))
    d1 = norm(jax.tree_util.tree_map(lambda f, s: f / s, f0, scale))
    h0 = jnp.where((d0 < 1e-5) | (d1 < 1e-5), 1e-6, 0.01 * d0 / d1)

    y1 = jax.tree_util.tree_map(lambda y, f: y + h0 * f, y0, f0)
    f1 = func(t0 + h0, y1)
    d2 = norm(jax.tree_util.tree_map(lambda a, b, s: (a - b) / s, f1, f0, scale)) / h0
    h1 = jnp.where(
        jnp.maximum(d1, d2) <= 1e-15,
        jnp.maximum(1e-6, h0 * 1e-3),
        (0.01 / jnp.maximum(d1, d2)) ** (1.0 / (order + 1.0)),
    )
    return jnp.minimum(100.0 * h0, h1)
