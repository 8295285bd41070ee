"""Device-only multi-session serving scaling probe (VERDICT r2 next #8).

Round 2 measured multi-session serving THROUGH the HTTP tunnel, where the
~16 MB/lane host->device transfer dominated (BENCH.md round 2) and the
claimed near-N-fold scaling on real hardware was an extrapolation. This
probe isolates the DEVICE step: synthetic windows live on device, the
streaming step (carried state fed back) runs inside one jit under a
lax.scan, and the slope method (W2-W1 iterations) removes dispatch and
transfer entirely.

Run on the TPU: ``python scripts/probe_serving.py [--sessions 1 4 8]``.
Prints one JSON line per lane count; recorded in BENCH.md.
"""

from __future__ import annotations

import argparse
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


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sessions", type=int, nargs="+", default=[1, 2, 4, 8])
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument("--use_pallas", action="store_true",
                    help="fused Pallas adaptive-ODE solve on the eval path")
    args = ap.parse_args()

    import dataclasses

    from ode_vio_tpu.config import flagship_config
    from ode_vio_tpu.models.deepvio import create_model, init_model
    from ode_vio_tpu.models.fold import fold_batchnorm_into_bias

    cfg = flagship_config()
    if args.use_pallas:
        cfg = dataclasses.replace(
            cfg, model=dataclasses.replace(cfg.model, use_pallas=True))
    _, variables = init_model(cfg, jax.random.PRNGKey(0), batch_size=1)
    # production eval graph: BN-free bias fold (same as make_infer_fn)
    model = create_model(
        dataclasses.replace(
            cfg, model=dataclasses.replace(cfg.model, skip_bn=True)
        )
    )
    ev = fold_batchnorm_into_bias(variables)
    S = cfg.model.seq_len
    m = cfg.model

    results = []
    base_ms = None
    for n in args.sessions:
        rng = np.random.default_rng(n)
        img = jnp.asarray(
            rng.random((n, S, m.img_h, m.img_w, 3), np.float32) - 0.5)
        imu = jnp.asarray(rng.standard_normal((n, 10 * (S - 1) + 1, 6)),
                          jnp.float32)
        ts = jnp.asarray(np.cumsum(
            rng.random((n, S)).astype(np.float32) * 0.05 + 0.08, 1))
        carry0 = jnp.zeros((m.rnn_num_layers, n, m.f_len), jnp.float32)

        def make(W):
            @jax.jit
            def run(img, imu, ts, carry):
                def body(c, w):
                    poses, c2 = model.apply(
                        ev, img + w * 1e-3, imu, ts + w * 0.1, hc=c,
                        train=False, rngs={"gumbel": jax.random.PRNGKey(0)},
                    )
                    return c2, jnp.sum(poses)
                c, sums = jax.lax.scan(
                    body, carry, jnp.arange(W, dtype=jnp.float32))
                return jnp.sum(sums)
            return run

        W1, W2 = 2, 2 + args.iters
        r1, r2 = make(W1), make(W2)
        # value fetches: the relay's block_until_ready can return early
        float(r1(img, imu, ts, carry0))
        float(r2(img, imu, ts, carry0))
        samples = []
        for rep in range(3):
            t0 = time.perf_counter()
            float(r1(img + 0.1 * rep, imu, ts, carry0))
            ta = time.perf_counter() - t0
            t0 = time.perf_counter()
            float(r2(img + 0.2 * rep, imu, ts, carry0))
            tb = time.perf_counter() - t0
            samples.append((tb - ta) / (W2 - W1))
        samples.sort()
        step_ms = samples[1] * 1e3
        if base_ms is None:
            base_ms = step_ms
        results.append({
            "sessions": n,
            "device_step_ms": round(step_ms, 3),
            "step_vs_1_session": round(step_ms / base_ms, 3),
            "aggregate_speedup": round(n * base_ms / step_ms, 3),
            "frames_per_sec": round(n * (S - 1) / (step_ms / 1e3), 1),
        })
        print(json.dumps(results[-1]), flush=True)


if __name__ == "__main__":
    main()
