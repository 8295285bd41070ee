"""Same-session A/B of the eval graph at the bench operating point
(B=64 streaming windows, flagship dims): value-level BN fold (identity
affine left in the graph) vs bias-fold + skip_bn (BN ops removed).

``PYTHONPATH=/root/repo:/root/.axon_site python -u
scripts/probe_eval_ab.py``
"""

from __future__ import annotations

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

B = 64


def main():
    from ode_vio_tpu.config import flagship_config
    from ode_vio_tpu.models.deepvio import create_model, init_model
    from ode_vio_tpu.models.fold import (
        fold_batchnorm, fold_batchnorm_into_bias,
    )

    cfg = flagship_config()
    model, variables = init_model(cfg, jax.random.PRNGKey(0), batch_size=1)
    skim = create_model(
        dataclasses.replace(
            cfg, model=dataclasses.replace(cfg.model, skip_bn=True)
        )
    )

    S = cfg.model.seq_len
    rng = np.random.default_rng(0)
    img = jnp.asarray(
        rng.random((B, S, cfg.model.img_h, cfg.model.img_w, 3), np.float32)
        - 0.5
    )
    imu = jnp.asarray(rng.standard_normal((B, 10 * (S - 1) + 1, 6)),
                      jnp.float32)
    ts = jnp.asarray(
        np.cumsum(rng.random((B, S)).astype(np.float32) * 0.05 + 0.08, 1)
    )
    carry0 = jnp.zeros(
        (cfg.model.rnn_num_layers, B, cfg.model.f_len), jnp.float32
    )

    def make_stream(m, W):
        @jax.jit
        def run(v, img, imu, ts, carry):
            def body(c, w):
                poses, c2 = m.apply(
                    v, img + w * 1e-3, imu, ts + w * 0.1, hc=c, train=False,
                    rngs={"gumbel": jax.random.PRNGKey(0)},
                )
                return c2, jnp.sum(poses.astype(jnp.float32))
            c, sums = jax.lax.scan(body, carry,
                                   jnp.arange(W, dtype=jnp.float32))
            return jnp.sum(sums)
        return run

    cases = [
        ("value_fold", model, fold_batchnorm(variables)),
        ("bias_fold_skip_bn", skim, fold_batchnorm_into_bias(variables)),
        ("unfolded", model, variables),
    ]
    for name, m, v in cases:
        r1, r2 = make_stream(m, 2), make_stream(m, 6)
        float(r1(v, img, imu, ts, carry0))
        float(r2(v, img, imu, ts, carry0))
        samples = []
        for _ in range(3):
            t0 = time.perf_counter()
            float(r1(v, img, imu, ts, carry0))
            ta = time.perf_counter() - t0
            t0 = time.perf_counter()
            float(r2(v, img, imu, ts, carry0))
            tb = time.perf_counter() - t0
            samples.append((tb - ta) / 4)
        samples.sort()
        w = samples[1]
        print(json.dumps({
            "case": name, "ms_per_window": round(w * 1e3, 2),
            "frames_per_sec": round(B * (S - 1) / w, 1),
        }), flush=True)


if __name__ == "__main__":
    main()
