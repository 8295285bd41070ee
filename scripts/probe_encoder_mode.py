"""Isolate the train-vs-eval forward cost of each pipeline piece.

probe_train_decomp found ~34 ms of train-mode FORWARD overhead over the
eval forward (92.7 ms @ 1-iter solve vs 58.6 ms) that is NOT dropout
masks (encdrop0: no change) and NOT the solve (isolated separately).
This probe times the ImageEncoder alone in both modes, and the pose core
(fusion + ODE-RNN + regressor) alone in both modes, to locate it.

``PYTHONPATH=/root/repo:/root/.axon_site python -u
scripts/probe_encoder_mode.py``
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

B = 32


def slope(run, args, k1=2, k2=6, reps=3):
    outs = [run(*args, 1)]
    float(outs[0])
    samples = []
    for _ in range(reps):
        t0 = time.perf_counter()
        float(run(*args, k1))
        ta = time.perf_counter() - t0
        t0 = time.perf_counter()
        float(run(*args, k2))
        tb = time.perf_counter() - t0
        samples.append((tb - ta) / (k2 - k1))
    samples.sort()
    return samples[len(samples) // 2]


def main():
    from ode_vio_tpu.config import flagship_config
    from ode_vio_tpu.models.encoders import ImageEncoder

    cfg = flagship_config()
    S = cfg.model.seq_len
    rng = np.random.default_rng(0)
    img = jnp.asarray(
        rng.random((B, S, cfg.model.img_h, cfg.model.img_w, 3), np.float32)
        - 0.5
    )

    enc = ImageEncoder(cfg.model)
    variables = enc.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        img[:1], train=False,
    )

    from functools import partial

    @partial(jax.jit, static_argnums=(2, 3))
    def run_enc(variables, img, train, k):
        def body(c, i):
            x = img + i * 1e-3
            if train:
                feats, _ = enc.apply(
                    variables, x, train=True,
                    rngs={"dropout": jax.random.PRNGKey(0)},
                    mutable=["batch_stats"],
                )
            else:
                feats = enc.apply(variables, x, train=False)
            return c + jnp.sum(feats.astype(jnp.float32)), None
        tot, _ = jax.lax.scan(
            body, jnp.zeros((), jnp.float32),
            jnp.arange(k, dtype=jnp.float32),
        )
        return tot

    for mode in (False, True):
        t = slope(lambda v, im, k: run_enc(v, im, mode, k), (variables, img))
        print(json.dumps({
            "piece": "image_encoder", "train": mode,
            "ms": round(t * 1e3, 2),
        }), flush=True)

    # pose core alone (fusion + ODE-RNN + regressor) on synthetic features
    from ode_vio_tpu.models.deepvio import init_model

    model, mvars = init_model(cfg, jax.random.PRNGKey(0), batch_size=1)
    fv = jnp.asarray(
        rng.standard_normal((B, S - 1, cfg.model.v_f_len)) * 0.1, jnp.float32
    )
    imu = jnp.asarray(rng.standard_normal((B, 10 * (S - 1) + 1, 6)),
                      jnp.float32)
    ts = jnp.asarray(
        np.cumsum(rng.random((B, S)).astype(np.float32) * 0.05 + 0.08, 1)
    )

    # go through the full model but with a pre-encoded visual path is not
    # exposed; instead time the full model fwd in both modes minus the
    # encoder-mode cost measured above (the remainder = pose-side delta).
    @partial(jax.jit, static_argnums=(2, 3))
    def run_model(mvars, batch, train, k):
        img, imu, ts = batch

        def body(c, i):
            x = img + i * 1e-3
            if train:
                (poses, _), _ = model.apply(
                    mvars, x, imu, ts, train=True,
                    rngs={"dropout": jax.random.PRNGKey(0),
                          "gumbel": jax.random.PRNGKey(1)},
                    mutable=["batch_stats"],
                )
            else:
                poses, _ = model.apply(
                    mvars, x, imu, ts, train=False,
                    rngs={"gumbel": jax.random.PRNGKey(1)},
                )
            return c + jnp.sum(poses.astype(jnp.float32)), None

        tot, _ = jax.lax.scan(
            body, jnp.zeros((), jnp.float32),
            jnp.arange(k, dtype=jnp.float32),
        )
        return tot

    for mode in (False, True):
        t = slope(
            lambda v, b, k: run_model(v, b, mode, k), (mvars, (img, imu, ts))
        )
        print(json.dumps({
            "piece": "full_model_fwd", "train": mode,
            "ms": round(t * 1e3, 2),
        }), flush=True)


if __name__ == "__main__":
    main()
