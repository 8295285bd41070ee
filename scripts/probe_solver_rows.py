"""Solver-matmul row-tiling probe (VERDICT r2 next #1b).

The flagship PoseODERNN folds all L RNN layers into one batched solve, so
each dopri5 stage evaluates the ODE MLP (768 -> 1024 -> 1024 -> 768,
softplus) on an (L*B, 768) activation block. At B=32 that is 96 rows —
less than one 128-row MXU tile; the round-2 cost profile named these
sub-tile matmuls as a training-step bottleneck candidate. This probe
measures the MLP fwd and fwd+bwd at the row counts that matter (96 = B32,
128 = padded tile, 192 = B64, 256, 512) in f32 and bf16, slope-method.

Run on the TPU: ``PYTHONPATH=/root/repo:/root/.axon_site python -u
scripts/probe_solver_rows.py``. One JSON line per case; recorded in
BENCH.md.
"""

from __future__ import annotations

import json
import os
import time

import jax

try:
    os.makedirs("/root/repo/.jax_cache", exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
except Exception:
    pass

import jax.numpy as jnp
import numpy as np

F, H = 768, 1024
SIZES = [(F, H), (H, H), (H, F)]  # ode_func_sizes(768, 1024, 2)


def slope_time(fn, args, k1=2048, k2=16384, reps=3):
    """Per-iteration time via wall(K=k2) - wall(K=k1). The iteration here
    is MICROSECOND-scale, so the K gap must be large enough that the
    signal (tens of ms) clears the tunnel's RTT jitter (~1-3 ms)."""

    def make(K):
        @jax.jit
        def run(*a):
            def body(c, _):
                out = fn(c, *a[1:])
                return out[0] * 0.999 + a[0] * 1e-3, out[1]
            xf, _ = jax.lax.scan(body, a[0], None, length=K)
            return jnp.sum(xf)
        return run

    r1, r2 = make(k1), make(k2)
    # fetch the scalar (not block_until_ready: through the axon relay it
    # can return without waiting) — constant RTT cancels in the slope
    float(r1(*args))
    float(r2(*args))
    samples = []
    for _ in range(reps):
        t0 = time.perf_counter()
        float(r1(*args))
        ta = time.perf_counter() - t0
        t0 = time.perf_counter()
        float(r2(*args))
        tb = time.perf_counter() - t0
        samples.append((tb - ta) / (k2 - k1))
    samples.sort()
    return samples[len(samples) // 2]


def main():
    rng = np.random.default_rng(0)
    Ws = [
        (np.asarray(0.05 * rng.standard_normal((a, b)), np.float32),
         np.asarray(0.01 * rng.standard_normal((b,)), np.float32))
        for a, b in SIZES
    ]
    gflop_per_row = 2.0 * sum(a * b for a, b in SIZES) / 1e9

    for rows in (96, 128, 192, 384):
        for dt in (jnp.float32, jnp.bfloat16):
            x = jnp.asarray(rng.standard_normal((rows, F)), dt)
            params = [(jnp.asarray(W, dt), jnp.asarray(b, dt)) for W, b in Ws]

            def mlp(y, params):
                for i, (W, b) in enumerate(params):
                    y = y @ W + b
                    if i < len(params) - 1:
                        y = jax.nn.softplus(y)
                return y

            def fwd(x, params):
                y = mlp(x, params)
                return (y[:, :F].astype(x.dtype) + x * 0.0,
                        jnp.sum(y.astype(jnp.float32)))

            def fwdbwd(x, params):
                def loss(x_):
                    y = mlp(x_, params)
                    return jnp.sum((y * y).astype(jnp.float32))
                l, dx = jax.value_and_grad(loss)(x)
                return (dx.astype(x.dtype), l)

            gf = gflop_per_row * rows
            t_f = slope_time(fwd, (x, params))
            t_fb = slope_time(fwdbwd, (x, params))
            print(json.dumps({
                "rows": rows, "dtype": str(np.dtype(dt)),
                "fwd_us": round(t_f * 1e6, 1),
                "fwd_tfs": round(gf / t_f / 1e3, 1),
                "fwdbwd_us": round(t_fb * 1e6, 1),
                # bwd-to-x only here (solver bwd re-runs stages; dW is
                # accumulated outside the scan) -> 2x fwd FLOPs nominal
                "fwdbwd_tfs": round(3 * gf / t_fb / 1e3, 1),
            }), flush=True)


if __name__ == "__main__":
    main()
