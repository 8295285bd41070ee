"""Pallas TPU kernels for the hot compute path.

:func:`fused_ode_solve` — the flagship kernel: the ENTIRE per-timestep
adaptive ODE integration of PoseODERNN (the reference's
``torchode AutoDiffAdjoint.solve`` call, PoseODERNN.py:70-75) runs as one
Pallas kernel. Why this is the speed-of-light design on TPU:

  * The ODE-func MLP weights (~5.6 MB bf16 at flagship size) load into
    VMEM once per *solve*; the XLA while-loop path re-streams them from
    HBM for every one of the ~7 RK stages of every adaptive step
    (~40 MB of HBM traffic per step).
  * All RK stage derivatives, the controller state and the error norms
    stay in VMEM/registers; nothing round-trips to HBM inside the loop.
  * Per-sample adaptive step sizes are row-masked vector ops — identical
    semantics to ``jax.vmap(solve_ivp)`` (verified step-for-step in
    tests/test_pallas.py).

Forward/inference only (the kernel contains a ``while_loop``); training
keeps the reverse-differentiable bounded-scan XLA path.
"""

from __future__ import annotations

import functools
from typing import Sequence

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ode_vio_tpu.ops.mlp import get_activation
from ode_vio_tpu.ops.solvers.tableaus import get_tableau

_SAFE_RATIO_FLOOR = 1e-10


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def fused_ode_solve(
    params: Sequence[dict],
    y0: jnp.ndarray,   # (N, F) float32
    t0: jnp.ndarray,   # (N,)
    t1: jnp.ndarray,   # (N,)
    *,
    activation: str = "tanh",
    method: str = "dopri5",
    rtol: float = 1e-2,
    atol: float = 1e-6,
    dt0: float = 1e-4,
    max_steps: int = 64,
    safety: float = 0.9,
    factor_min: float = 0.2,
    factor_max: float = 10.0,
    interpret: bool | None = None,
):
    """Batched adaptive integration of the autonomous MLP vector field
    ``dy/dt = MLP(y)`` from t0 to t1 (>= t0), per-row step control.

    params: ops.mlp layer list [{'w': (out,in), 'b': (out,)}, ...].
    ``dt0`` may be a scalar or a per-row (N,) warm-start array.
    Returns (y1 (N, F), dt_final (N,), accepted (N,), rejected (N,),
    incomplete (N,)) — ``incomplete[i]=1`` when row i exhausted
    ``max_steps`` before reaching ``t1`` (partial integral returned).
    """
    if interpret is None:  # Mosaic on TPU, interpreter elsewhere (tests/CPU)
        interpret = jax.default_backend() != "tpu"
    tab = get_tableau(method)
    if not tab.adaptive_capable:
        raise ValueError(f"method '{method}' has no error estimate")
    act = get_activation(activation)
    n_layers = len(params)
    N, F = y0.shape

    rows = _round_up(max(N, 8), 8)
    pad = rows - N
    y0p = jnp.pad(y0.astype(jnp.float32), ((0, pad), (0, 0)))
    t0p = jnp.pad(t0.astype(jnp.float32), (0, pad)).reshape(rows, 1)
    # padded rows get a zero-length interval -> immediately done
    t1p = jnp.pad(t1.astype(jnp.float32), (0, pad)).reshape(rows, 1)
    dt0_arr = jnp.broadcast_to(jnp.asarray(dt0, jnp.float32), (N,))
    dt0p = jnp.pad(dt0_arr, (0, pad), constant_values=1.0).reshape(rows, 1)

    flat_weights = []
    for layer in params:
        flat_weights.append(layer["w"].astype(jnp.float32))
        flat_weights.append(layer["b"].astype(jnp.float32).reshape(1, -1))

    def mlp(h, wrefs):
        for i in range(n_layers):
            w = wrefs[2 * i][:]
            b = wrefs[2 * i + 1][:]
            h = (
                jax.lax.dot_general(
                    h, w, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                + b
            )
            h = act(h) if i < n_layers - 1 else jnp.tanh(h)
        return h

    def kernel(y0_ref, t0_ref, t1_ref, dt0_ref, *refs):
        wrefs = refs[: 2 * n_layers]
        y1_ref, dt_ref, acc_ref, rej_ref, inc_ref = refs[2 * n_layers :]

        y_init = y0_ref[:]
        t_init = t0_ref[:]
        t_end = t1_ref[:]
        f_init = mlp(y_init, wrefs) if tab.fsal else jnp.zeros_like(y_init)
        zero_i = jnp.zeros((rows, 1), jnp.int32)

        def cond(carry):
            step, t, dt, y, f, acc, rej = carry
            return jnp.logical_and(
                step < max_steps, jnp.any((t_end - t) > 0.0)
            )

        def body(carry):
            step, t, dt, y, f, acc, rej = carry
            active = (t_end - t) > 0.0                     # (rows, 1)
            remaining = jnp.maximum(t_end - t, 0.0)
            clamped = dt >= remaining
            dt_c = jnp.where(clamped, remaining, dt)

            ks = [f if tab.fsal else mlp(y, wrefs)]
            for i in range(1, tab.num_stages):
                incr = None
                for c, k in zip(tab.a[i], ks):
                    if c == 0.0:
                        continue
                    incr = c * k if incr is None else incr + c * k
                yi = y if incr is None else y + dt_c * incr
                ks.append(mlp(yi, wrefs))

            sol = None
            for c, k in zip(tab.b_sol, ks):
                if c == 0.0:
                    continue
                sol = c * k if sol is None else sol + c * k
            y1 = y + dt_c * sol
            err = None
            for c, k in zip(tab.b_err, ks):
                if c == 0.0:
                    continue
                err = c * k if err is None else err + c * k
            err = dt_c * err

            scale = atol + rtol * jnp.maximum(jnp.abs(y), jnp.abs(y1))
            ratio = jnp.sqrt(
                jnp.mean((err / scale) ** 2, axis=1, keepdims=True)
            )
            accept = jnp.logical_and(ratio <= 1.0, active)

            safe = jnp.maximum(ratio, _SAFE_RATIO_FLOOR)
            factor = jnp.clip(
                safety * safe ** (-1.0 / tab.order), factor_min, factor_max
            )
            dt_next = jnp.where(
                active,
                jnp.maximum(dt_c * factor, jnp.finfo(jnp.float32).tiny),
                dt,
            )
            t_next = jnp.where(
                accept, jnp.where(clamped, t_end, t + dt_c), t
            )
            y_next = jnp.where(accept, y1, y)
            f_next = jnp.where(accept, ks[-1], f) if tab.fsal else f
            acc = acc + accept.astype(jnp.int32)
            rej = rej + jnp.logical_and(~accept, active).astype(jnp.int32)
            return (step + 1, t_next, dt_next, y_next, f_next, acc, rej)

        carry = (
            jnp.zeros((), jnp.int32),
            t_init,
            dt0_ref[:],
            y_init,
            f_init,
            zero_i,
            zero_i,
        )
        _, t_fin, dt_fin, y_fin, _, acc, rej = jax.lax.while_loop(
            cond, body, carry
        )
        y1_ref[:] = y_fin
        dt_ref[:] = dt_fin
        acc_ref[:] = acc
        rej_ref[:] = rej
        inc_ref[:] = ((t_end - t_fin) > 0.0).astype(jnp.int32)

    vmem = functools.partial(pl.BlockSpec, memory_space=pl.ANY if interpret
                             else pltpu.VMEM)
    out = pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct((rows, F), jnp.float32),
            jax.ShapeDtypeStruct((rows, 1), jnp.float32),
            jax.ShapeDtypeStruct((rows, 1), jnp.int32),
            jax.ShapeDtypeStruct((rows, 1), jnp.int32),
            jax.ShapeDtypeStruct((rows, 1), jnp.int32),
        ),
        in_specs=[vmem()] * (4 + 2 * n_layers),
        out_specs=(vmem(), vmem(), vmem(), vmem(), vmem()),
        interpret=interpret,
    )(y0p, t0p, t1p, dt0p, *flat_weights)

    y1, dt_fin, acc, rej, inc = out
    return y1[:N], dt_fin[:N, 0], acc[:N, 0], rej[:N, 0], inc[:N, 0]


def fused_cde_solve(
    params: Sequence[dict],
    z0: jnp.ndarray,        # (N, H) float32
    path_ts: jnp.ndarray,   # (N, T) control-path knot times
    path_b: jnp.ndarray,    # (N, T-1, C) segment derivative coeffs (linear: slope)
    path_c,                 # (N, T-1, C) or None (linear)
    path_d,                 # (N, T-1, C) or None (linear)
    eval_ts: jnp.ndarray,   # (N, E) evaluation times, ascending, >= path_ts[:,0]
    *,
    activation: str = "tanh",
    method: str = "dopri5",
    rtol: float = 1e-4,
    atol: float = 1e-6,
    dt0: float = 1e-4,
    max_steps: int = 256,
    safety: float = 0.9,
    factor_min: float = 0.2,
    factor_max: float = 10.0,
    interpret: bool | None = None,
    block_target_bytes: int = 3 << 19,
):
    """The ENTIRE multi-segment neural-CDE integration of PoseCDE/PoseRDE
    (``ops.interpolation.cdeint``: solve ``dz = MLP(z).reshape(H, C) @
    dX(t) dt`` through ``[path_ts[:,0]] + eval_ts``, torchcde ``cdeint``
    parity, reference PoseCDE.py:101 / PoseRDE.py:105) as ONE Pallas
    kernel. Why this is the right design on TPU: the CDE field's final
    layer is ``(H*C, hidden)`` — 8.4 MB f32 at flagship dims — and the
    XLA while-loop path re-streams it from HBM for every RK stage of
    every adaptive step (~30 ms/window of pure weight traffic, the
    measured bottleneck of the cde eval row, BENCH.md round 3). Here the
    weights load into VMEM once per *window*; every stage reads them at
    VMEM bandwidth and the per-segment scan, controller state and stage
    derivatives never round-trip to HBM.

    Exact semantics of ``vmap(lambda: cdeint(path, g, z0, eval_ts,
    opts))`` with per-segment step budgets, warm-restarted dt across
    segments, per-segment FSAL re-init, and the same boundary rule for
    the path derivative (``searchsorted(ts, t, 'right') - 1`` clipped —
    a clamped final stage landing exactly on a knot reads the NEXT
    segment's slope, replicated here so step counts match the XLA path
    step for step). Repeated knots (ring-buffer masked prefixes) have
    zero derivative and zero-length solve segments, exactly as
    ``linear_path`` defines them.

    ``params``: ops.mlp layer list for the CDE field — last layer out dim
    ``H*C`` in apply_cde_func's (H, C) h-major layout (permuted to
    C-major internally so the contraction tiles lane-aligned).
    Forward/inference only. Returns ``(zs (N, E, H), dt_final (N,),
    accepted (N,), rejected (N,), incomplete (N,))`` — stats summed over
    segments per row, matching ``solve_at``'s aggregate Stats.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    tab = get_tableau(method)
    if not tab.adaptive_capable:
        raise ValueError(f"method '{method}' has no error estimate")
    act = get_activation(activation)
    cubic = path_c is not None
    n_layers = len(params)
    N, H = z0.shape
    T = path_ts.shape[1]
    E = eval_ts.shape[1]
    C = path_b.shape[2]
    in_dim = params[-1]["w"].shape[1]
    if params[-1]["w"].shape[0] != H * C:
        raise ValueError(
            f"last layer out dim {params[-1]['w'].shape[0]} != H*C "
            f"({H}*{C})"
        )

    rows = _round_up(max(N, 8), 8)
    pad = rows - N
    z0p = jnp.pad(z0.astype(jnp.float32), ((0, pad), (0, 0)))
    # padded rows: all-zero knots/eval times -> every segment zero-length
    ts_p = jnp.pad(path_ts.astype(jnp.float32), ((0, pad), (0, 0)))
    ev_p = jnp.pad(eval_ts.astype(jnp.float32), ((0, pad), (0, 0)))
    # block the (H*C, in) final layer over C so each stage's transient
    # activation tile stays ~`block_target_bytes` of VMEM (the knob is
    # exposed for tests/tuning); permute h-major -> c-major so each block
    # reshapes to (rows, Cb, H) with a lane-aligned minor dim
    n_blocks = max(1, -(-rows * C * H * 4 // block_target_bytes))
    n_blocks = min(n_blocks, C)
    cb = -(-C // n_blocks)
    # Mosaic can only lower the (rows, cb) -> (rows, cb, 1) relayout the
    # per-block contraction needs for small second-minor sizes (one
    # sublane tile); larger cb fails with "Unsupported reshape" on real
    # TPU (bit round 3 at flagship dims, cb=65)
    cb = min(cb, 8)
    n_blocks = -(-C // cb)
    c_pad = n_blocks * cb
    # channel-pad the derivative coefficients to c_pad OUTSIDE the kernel
    # (padded channels have zero coefficients -> zero contribution)
    cpad3 = ((0, pad), (0, 0), (0, c_pad - C))
    coeff_args = [jnp.pad(path_b.astype(jnp.float32), cpad3)]
    if cubic:
        coeff_args.append(jnp.pad(path_c.astype(jnp.float32), cpad3))
        coeff_args.append(jnp.pad(path_d.astype(jnp.float32), cpad3))
    # segment bounds, leading-axis indexed inside the kernel:
    # segment 0 runs path.t0 -> eval[0]; segment j runs eval[j-1] -> eval[j]
    seg_t0 = jnp.concatenate([ts_p[:, :1], ev_p[:, :-1]], axis=1)  # (rows,E)
    seg_t0 = seg_t0.T[:, :, None]                                  # (E,rows,1)
    seg_t1 = ev_p.T[:, :, None]                                    # (E,rows,1)
    w_last = params[-1]["w"].astype(jnp.float32).reshape(H, C, in_dim)
    w_last = jnp.pad(w_last, ((0, 0), (0, c_pad - C), (0, 0)))
    w_last = w_last.transpose(1, 0, 2).reshape(c_pad * H, in_dim)
    b_last = params[-1]["b"].astype(jnp.float32).reshape(H, C)
    b_last = jnp.pad(b_last, ((0, 0), (0, c_pad - C))).T.reshape(1, c_pad * H)
    flat_weights = []
    for layer in params[:-1]:
        flat_weights.append(layer["w"].astype(jnp.float32))
        flat_weights.append(layer["b"].astype(jnp.float32).reshape(1, -1))
    flat_weights += [w_last, b_last]

    def kernel(z0_ref, ts_ref, t0s_ref, t1s_ref, *refs):
        # int32 iota cast to f32: Mosaic rejects float iota on real TPU
        seg_idx = jax.lax.broadcasted_iota(
            jnp.int32, (1, T - 1), 1
        ).astype(jnp.float32)  # (1, T-1)
        crefs = refs[: 1 + 2 * cubic]
        wrefs = refs[1 + 2 * cubic : 1 + 2 * cubic + 2 * n_layers]
        zs_ref, dt_ref, acc_ref, rej_ref, inc_ref = refs[
            1 + 2 * cubic + 2 * n_layers :
        ]
        ts_all = ts_ref[:]                                   # (rows, T)

        def seg_onehot(t):                                   # t (rows, 1)
            # k = clip(searchsorted(ts, t, 'right') - 1, 0, T-2) as a
            # one-hot mask over segments (interpolation.py:45-58)
            ge = (t >= ts_all).astype(jnp.float32)           # (rows, T)
            k = jnp.clip(
                jnp.sum(ge, axis=1, keepdims=True) - 1.0, 0.0, T - 2.0
            )
            return (k == seg_idx).astype(jnp.float32)        # (rows, T-1)

        def deriv_at(t, sel, blk):
            # the piecewise-polynomial derivative of the selected segment,
            # restricted to channel block `blk`. The block's coefficients
            # are lane-sliced from the REF (not from a full (rows, c_pad)
            # value): a value slice at a non-tile-aligned lane offset
            # carries that offset in its layout, and Mosaic cannot lower
            # the subsequent (rows, cb) -> (rows, cb, 1) relayout of an
            # offset-carrying vector (bit round 3 at flagship dims)
            lo, hi = blk * cb, (blk + 1) * cb
            b3 = crefs[0][:, :, lo:hi]                     # (rows,T-1,cb)
            dX = jnp.sum(sel[:, :, None] * b3, axis=1)       # (rows, cb)
            if cubic:
                tk = jnp.sum(sel * ts_all[:, : T - 1], axis=1, keepdims=True)
                s = t - tk                                   # (rows, 1)
                ck = jnp.sum(sel[:, :, None] * crefs[1][:, :, lo:hi], axis=1)
                dk = jnp.sum(sel[:, :, None] * crefs[2][:, :, lo:hi], axis=1)
                dX = (3.0 * dk * s + 2.0 * ck) * s + dX
            return dX

        def field(t, z):
            h = z
            for i in range(n_layers - 1):
                w = wrefs[2 * i][:]
                bb = wrefs[2 * i + 1][:]
                h = act(
                    jax.lax.dot_general(
                        h, w, (((1,), (1,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    )
                    + bb
                )
            sel = seg_onehot(t)
            dz = jnp.zeros((rows, H), jnp.float32)
            for blk in range(n_blocks):
                w = wrefs[2 * (n_layers - 1)][blk * cb * H : (blk + 1) * cb * H]
                bb = wrefs[2 * (n_layers - 1) + 1][
                    :, blk * cb * H : (blk + 1) * cb * H
                ]
                o = (
                    jax.lax.dot_general(
                        h, w, (((1,), (1,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    )
                    + bb
                )
                o3 = jnp.tanh(o).reshape(rows, cb, H)
                dX = deriv_at(t, sel, blk)                   # (rows, cb)
                dz = dz + jnp.sum(o3 * dX[:, :, None], axis=1)
            return dz

        def solve_segment(j, carry):
            z, dt, acc, rej, inc = carry
            t_start = t0s_ref[j]                             # (rows, 1)
            t_end = t1s_ref[j]
            f_init = (
                field(t_start, z) if tab.fsal else jnp.zeros_like(z)
            )

            def cond(c):
                step, t, dtc, y, f, a, r = c
                return jnp.logical_and(
                    step < max_steps, jnp.any((t_end - t) > 0.0)
                )

            def body(c):
                step, t, dtc, y, f, a, r = c
                active = (t_end - t) > 0.0
                remaining = jnp.maximum(t_end - t, 0.0)
                clamped = dtc >= remaining
                dt_c = jnp.where(clamped, remaining, dtc)

                ks = [f if tab.fsal else field(t, y)]
                for i in range(1, tab.num_stages):
                    incr = None
                    for cc, k in zip(tab.a[i], ks):
                        if cc == 0.0:
                            continue
                        incr = cc * k if incr is None else incr + cc * k
                    yi = y if incr is None else y + dt_c * incr
                    ks.append(field(t + tab.c[i] * dt_c, yi))

                sol = None
                for cc, k in zip(tab.b_sol, ks):
                    if cc == 0.0:
                        continue
                    sol = cc * k if sol is None else sol + cc * k
                y1 = y + dt_c * sol
                err = None
                for cc, k in zip(tab.b_err, ks):
                    if cc == 0.0:
                        continue
                    err = cc * k if err is None else err + cc * k
                err = dt_c * err

                scale = atol + rtol * jnp.maximum(jnp.abs(y), jnp.abs(y1))
                ratio = jnp.sqrt(
                    jnp.mean((err / scale) ** 2, axis=1, keepdims=True)
                )
                accept = jnp.logical_and(ratio <= 1.0, active)

                safe = jnp.maximum(ratio, _SAFE_RATIO_FLOOR)
                factor = jnp.clip(
                    safety * safe ** (-1.0 / tab.order),
                    factor_min, factor_max,
                )
                dt_next = jnp.where(
                    active,
                    jnp.maximum(dt_c * factor, jnp.finfo(jnp.float32).tiny),
                    dtc,
                )
                t_next = jnp.where(
                    accept, jnp.where(clamped, t_end, t + dt_c), t
                )
                y_next = jnp.where(accept, y1, y)
                f_next = jnp.where(accept, ks[-1], f) if tab.fsal else f
                a = a + accept.astype(jnp.int32)
                r = r + jnp.logical_and(~accept, active).astype(jnp.int32)
                return (step + 1, t_next, dt_next, y_next, f_next, a, r)

            zero_i = jnp.zeros((rows, 1), jnp.int32)
            _, t_fin, dt_fin, z_fin, _, a_seg, r_seg = jax.lax.while_loop(
                cond, body,
                (jnp.zeros((), jnp.int32), t_start, dt, z, f_init,
                 zero_i, zero_i),
            )
            zs_ref[pl.dslice(j, 1)] = z_fin[None]
            inc_seg = ((t_end - t_fin) > 0.0).astype(jnp.int32)
            return (z_fin, dt_fin, acc + a_seg, rej + r_seg, inc + inc_seg)

        zero_i = jnp.zeros((rows, 1), jnp.int32)
        dt_init = jnp.full((rows, 1), dt0, jnp.float32)
        _, dt_fin, acc, rej, inc = jax.lax.fori_loop(
            0, E, solve_segment,
            (z0_ref[:], dt_init, zero_i, zero_i, zero_i),
        )
        dt_ref[:] = dt_fin
        acc_ref[:] = acc
        rej_ref[:] = rej
        inc_ref[:] = inc

    vmem = functools.partial(pl.BlockSpec, memory_space=pl.ANY if interpret
                             else pltpu.VMEM)
    n_in = 4 + len(coeff_args) + 2 * n_layers
    out = pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct((E, rows, H), jnp.float32),
            jax.ShapeDtypeStruct((rows, 1), jnp.float32),
            jax.ShapeDtypeStruct((rows, 1), jnp.int32),
            jax.ShapeDtypeStruct((rows, 1), jnp.int32),
            jax.ShapeDtypeStruct((rows, 1), jnp.int32),
        ),
        in_specs=[vmem()] * n_in,
        out_specs=(vmem(), vmem(), vmem(), vmem(), vmem()),
        interpret=interpret,
        # the resident field weights alone exceed Mosaic's 16 MiB default
        # scoped-VMEM budget at flagship dims (final layer (H*C, in) is
        # 8.5 MiB f32) — that residency is the kernel's entire purpose;
        # size the budget from the actual operands + transient margin
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=min(
                int(sum(a.size * 4 for a in flat_weights)
                    + sum(a.size * 4 for a in coeff_args)
                    + 4 * rows * (T + 3 * E + H)
                    + 4 * E * rows * H  # the zs output buffer
                    + (6 + tab.num_stages) * rows * max(H, cb * H) * 4
                    + (12 << 20)),
                100 << 20,
            ),
        ),
    )(z0p, ts_p, seg_t0, seg_t1, *coeff_args, *flat_weights)

    zs, dt_fin, acc, rej, inc = out
    return (
        zs.transpose(1, 0, 2)[:N],
        dt_fin[:N, 0],
        acc[:N, 0],
        rej[:N, 0],
        inc[:N, 0],
    )


# ---------------------------------------------------------------------------
# Fused dropout: hardware PRNG + mask + scale in one VMEM pass
# ---------------------------------------------------------------------------


def _dropout_kernel(seed_ref, x_ref, o_ref, *, thresh: int, scale: float):
    # distinct per-tile stream: large-odd-multiplier hash of the grid index
    pltpu.prng_seed(
        seed_ref[0, 0] + pl.program_id(0) * jnp.int32(0x3779B99)
    )
    bits = pltpu.bitcast(pltpu.prng_random_bits(x_ref.shape), jnp.uint32)
    mask = (bits >= jnp.uint32(thresh)).astype(x_ref.dtype)
    o_ref[:] = x_ref[:] * mask * jnp.asarray(scale, x_ref.dtype)


def _dropout_run(x2d, seed, thresh: int, scale: float,
                 interpret: bool = False):
    M, C = x2d.shape
    TR = M
    for cand in (4096, 2048, 1024, 512, 256, 128, 64, 32, 16, 8, 4, 2, 1):
        if M % cand == 0:
            TR = cand
            break
    kern = functools.partial(_dropout_kernel, thresh=thresh, scale=scale)
    return pl.pallas_call(
        kern,
        grid=(M // TR,),
        in_specs=[
            pl.BlockSpec((1, 1), lambda i: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((TR, C), lambda i: (i, 0),
                         memory_space=pl.ANY if interpret else pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((TR, C), lambda i: (i, 0),
                               memory_space=pl.ANY if interpret
                               else pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((M, C), x2d.dtype),
        interpret=interpret,
    )(seed.reshape(1, 1), x2d)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def pallas_dropout(x, seed, rate: float, interpret: bool = False):
    """Dropout as ONE fused Pallas pass: the TPU core's hardware PRNG
    generates the mask bits directly in VMEM/registers — no XLA rng op,
    no separate mask tensor. Bernoulli(1-rate) keep semantics with exact
    1/(1-rate) scaling (drop iff u32 < round(rate * 2^32)).

    The backward pass REGENERATES the identical mask from the saved seed
    (hardware PRNG is deterministic per seed), so the mask never exists
    in HBM in either direction — O(1) residual memory, one fused pass
    each way. ``seed`` is an int32 scalar array; gradients don't flow to
    it.

    ``x`` is flattened to (rows, last_dim) tiles; the last dim must be a
    multiple of 128 (trunk channel counts 64.. are handled by the caller
    flattening trailing dims together).

    STATUS — measured, NOT wired into the encoders
    (scripts/probe_pallas_dropout.py on TPU v5e, flagship trunk B=32):
    correctness is exact (keep fraction, scale, deterministic fwd/bwd
    mask identity) but the standalone pallas_call costs 80.6 ms vs
    56.2 ms for the shipping rbg path — as a separate kernel it re-reads
    and re-writes every activation tensor from HBM, while XLA fuses the
    rbg mask-and-multiply into the adjacent BN/LeakyReLU elementwise
    pass whose traffic is already paid. Beating rbg would require fusing
    conv+BN+relu+dropout into one Pallas kernel, and the convs are
    already at 85-90 % of the MXU roofline under XLA (BENCH.md). Kept as
    a correct, seed-replayable fused-dropout building block (e.g. for
    mask application where no neighbouring elementwise pass exists).
    """
    return _pallas_dropout_fwd(x, seed, rate, interpret)[0]


def _pallas_dropout_fwd(x, seed, rate: float, interpret: bool):
    thresh = min(int(round(rate * 4294967296.0)), 4294967295)
    scale = 1.0 / (1.0 - rate)
    shape = x.shape
    C = shape[-1]
    # fold trailing dims until the row-minor width is a lane multiple
    flat = x.reshape(-1, C)
    if C % 128:
        flat = x.reshape(-1, 128) if x.size % 128 == 0 else x.reshape(1, -1)
    y = _dropout_run(flat, seed, thresh, scale, interpret)
    return y.reshape(shape), seed


def _pallas_dropout_bwd(rate: float, interpret: bool, seed, g):
    thresh = min(int(round(rate * 4294967296.0)), 4294967295)
    scale = 1.0 / (1.0 - rate)
    shape = g.shape
    C = shape[-1]
    flat = g.reshape(-1, C)
    if C % 128:
        flat = g.reshape(-1, 128) if g.size % 128 == 0 else g.reshape(1, -1)
    dx = _dropout_run(flat, seed, thresh, scale, interpret).reshape(shape)
    import numpy as _np

    from jax import dtypes as _dtypes

    return dx, _np.zeros(seed.shape, _dtypes.float0)


pallas_dropout.defvjp(_pallas_dropout_fwd, _pallas_dropout_bwd)
