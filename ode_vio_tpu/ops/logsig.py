"""Depth-2 log-signatures of piecewise-linear paths (signatory/torchcde
`logsig_windows` replacement — /root/reference/src/models/PoseRDE.py:88).

The depth-2 log-signature of a path ``X: [0,T] -> R^C`` is
``(S1, A)`` where ``S1 = X(T) - X(0)`` is the total increment (C terms) and
``A`` is the Levy area, the antisymmetric part of the second signature
level (C*(C-1)/2 independent terms):

    A_ij = 0.5 * integral (X_i - X_i(0)) dX_j - (X_j - X_j(0)) dX_i .

For piecewise-linear paths both reduce to closed-form sums over segment
increments, computed here with one cumulative sum and one einsum — no
iterated-integral recursion, no host loops. This is exact (not an
approximation) at depth 2, which is the only depth the reference uses.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def logsig_dim(channels: int, depth: int = 2) -> int:
    """Dimension of the depth-1/2 log-signature of a C-channel path."""
    if depth == 1:
        return channels
    if depth == 2:
        return channels + (channels * (channels - 1)) // 2
    raise ValueError("only depth 1 and 2 are supported (reference uses 2)")


def _triu_indices(c: int):
    return jnp.triu_indices(c, k=1)


def logsignature(xs: jnp.ndarray, depth: int = 2) -> jnp.ndarray:
    """Depth-``depth`` log-signature of a piecewise-linear path.

    xs: (..., T, C) observations. Returns (..., logsig_dim).
    """
    increments = xs[..., 1:, :] - xs[..., :-1, :]          # (..., T-1, C)
    s1 = jnp.sum(increments, axis=-2)                      # (..., C)
    if depth == 1:
        return s1
    if depth != 2:
        raise ValueError("only depth 1 and 2 are supported")
    # prefix_k = sum_{l<k} D_l  (exclusive cumulative sum)
    prefix = jnp.cumsum(increments, axis=-2) - increments
    # second level S2 = sum_k prefix_k (x) D_k + 0.5 D_k (x) D_k ;
    # its antisymmetric part is the Levy area (the symmetric part is
    # 0.5 * S1 (x) S1 for any path and carries no information).
    # Levy areas are small antisymmetric residuals of large sums: keep the
    # contraction in full f32 even where the platform default is bf16.
    outer = jnp.einsum(
        "...ki,...kj->...ij", prefix, increments,
        precision=jax.lax.Precision.HIGHEST,
    )
    area = 0.5 * (outer - jnp.swapaxes(outer, -1, -2))
    iu, ju = _triu_indices(xs.shape[-1])
    return jnp.concatenate([s1, area[..., iu, ju]], axis=-1)


def logsig_windows(
    xs: jnp.ndarray,
    ts: jnp.ndarray,
    depth: int = 2,
    window: int = 20,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Compress a path into non-overlapping log-signature windows
    (the log-ODE method; torchcde ``logsig_windows`` parity,
    PoseRDE.py:88).

    xs: (..., T, C) observations, ts: (T,) knot times.
    Returns ``(ys, t_new)``: a new piecewise-linear path ``ys`` of shape
    (..., W+1, logsig_dim) whose segment increments are the per-window
    log-signatures (so a linear interpolation of ``ys`` drives a CDE with
    the window's logsig density), and the window-boundary times ``t_new``
    (W+1,). A trailing partial window is kept (matching signatory's
    behaviour of covering the whole path).
    """
    T = xs.shape[-2]
    if T < 2:
        raise ValueError("need at least 2 observations")
    # window boundary start indices: 0, window, 2*window, ..., last<=T-1
    starts = list(range(0, T - 1, window))
    bounds = starts + [T - 1]
    sigs = [
        logsignature(xs[..., b0 : b1 + 1, :], depth)
        for b0, b1 in zip(bounds[:-1], bounds[1:])
    ]
    sigs = jnp.stack(sigs, axis=-2)                        # (..., W, D)
    y0 = jnp.zeros_like(sigs[..., :1, :])
    ys = jnp.concatenate([y0, jnp.cumsum(sigs, axis=-2)], axis=-2)
    t_new = jnp.asarray(ts)[jnp.asarray(bounds)]
    return ys, t_new
