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
