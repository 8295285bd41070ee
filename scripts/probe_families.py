"""Eval throughput sweep across the pose-core families at flagship
encoder dimensions (B=32 streaming windows, BN-free folded eval graph).

The headline bench (bench.py) covers the flagship ode-rnn; this probe
records the same streaming measurement for the other live families so
the breadth of the framework is a number, not a claim.

``PYTHONPATH=/root/repo:/root/.axon_site python -u
scripts/probe_families.py [--families rnn cde ...]``
"""

from __future__ import annotations

import argparse
import dataclasses
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

B = 32


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--families", nargs="+",
                    default=["ode-rnn", "rnn", "cde", "rde", "cfc", "ltc"])
    ap.add_argument("--use_pallas", action="store_true",
                    help="fused Pallas whole-solve kernels (ode-rnn/cde/rde)")
    ap.add_argument("--ab", action="store_true",
                    help="same-session A/B: measure each family with the "
                         "XLA while-loop AND the fused Pallas solve")
    ap.add_argument("--batch", type=int, default=None)
    args = ap.parse_args()
    global B
    if args.batch is not None:
        B = args.batch

    from ode_vio_tpu.config import flagship_config
    from ode_vio_tpu.models.deepvio import create_model, init_model
    from ode_vio_tpu.models.fold import fold_batchnorm_into_bias

    base = flagship_config()
    S = base.model.seq_len
    m = base.model
    rng = np.random.default_rng(0)
    img = jnp.asarray(
        rng.random((B, S, m.img_h, m.img_w, 3), np.float32) - 0.5)
    imu = jnp.asarray(rng.standard_normal((B, 10 * (S - 1) + 1, 6)),
                      jnp.float32)
    ts = jnp.asarray(np.cumsum(
        rng.random((B, S)).astype(np.float32) * 0.05 + 0.08, 1))

    for fam in args.families:
      # only the solver families read use_pallas; --ab for rnn/cfc would
      # time the identical executable twice
      has_pallas = fam in ("ode-rnn", "cde", "rde")
      settings = ([False, True] if args.ab and has_pallas
                  else [args.use_pallas and has_pallas])
      for use_pallas in settings:
        cfg = dataclasses.replace(
            base, model=dataclasses.replace(
                base.model, model_type=fam, use_pallas=use_pallas))
        model, variables = init_model(cfg, jax.random.PRNGKey(0),
                                      batch_size=1)
        eval_model = create_model(
            dataclasses.replace(
                cfg, model=dataclasses.replace(cfg.model, skip_bn=True)))
        ev = fold_batchnorm_into_bias(variables)

        def make(W, mdl=eval_model):
            @jax.jit
            def run(v, img, imu, ts):
                def body(c, w):
                    poses, c2 = mdl.apply(
                        v, img + w * 1e-3, imu, ts + w * 0.1, hc=c,
                        train=False,
                        rngs={"gumbel": jax.random.PRNGKey(0)},
                    )
                    return c2, jnp.sum(poses.astype(jnp.float32))

                # cold start to learn the carry structure, then scan
                poses0, c0 = mdl.apply(
                    v, img, imu, ts, train=False,
                    rngs={"gumbel": jax.random.PRNGKey(0)},
                )
                c, sums = jax.lax.scan(
                    body, c0, jnp.arange(W, dtype=jnp.float32))
                return jnp.sum(sums) + jnp.sum(poses0)
            return run

        try:
            r1, r2 = make(2), make(6)
            float(r1(ev, img, imu, ts))
            float(r2(ev, img, imu, ts))
            samples = []
            for _ in range(3):
                t0 = time.perf_counter()
                float(r1(ev, img, imu, ts))
                ta = time.perf_counter() - t0
                t0 = time.perf_counter()
                float(r2(ev, img, imu, ts))
                tb = time.perf_counter() - t0
                samples.append((tb - ta) / 4)
            samples.sort()
            w = samples[1]
            print(json.dumps({
                "family": fam, "ms_per_window": round(w * 1e3, 2),
                "frames_per_sec": round(B * (S - 1) / w, 1),
                "use_pallas": use_pallas, "batch": B,
            }), flush=True)
        except Exception as e:
            print(json.dumps({"family": fam, "error": str(e)[:300]}),
                  flush=True)


if __name__ == "__main__":
    main()
