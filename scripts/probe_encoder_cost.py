"""Compare XLA cost_analysis (FLOPs / bytes accessed) and measured time of
the ImageEncoder in three configurations at flagship dims (B=32):

  eval          — running-stats BN, unfolded
  eval_folded   — BN folded into conv weights (the shipping eval path)
  train         — batch-stats BN + dropout + running-stat update

The round-3 mode probe found eval-unfolded 56 ms vs the 31.4 ms pure-conv
trunk and train 89 ms; the HBM-traffic model predicts far less. This
probe asks XLA itself where the bytes go.

``PYTHONPATH=/root/repo:/root/.axon_site python -u
scripts/probe_encoder_cost.py``
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
    float(run(*args, 1))
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
    from functools import partial

    from ode_vio_tpu.config import flagship_config
    from ode_vio_tpu.models.encoders import ImageEncoder
    from ode_vio_tpu.models.fold import fold_batchnorm

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
    try:
        folded = fold_batchnorm(variables)
    except Exception as e:
        print("fold failed:", e)
        folded = None

    @partial(jax.jit, static_argnums=(2, 3))
    def run_enc(variables, img, mode, k):
        def body(c, i):
            x = img + i * 1e-3
            if mode == "train":
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

    cases = [("eval", variables, "eval")]
    if folded is not None:
        cases.append(("eval_folded", folded, "eval"))
    cases.append(("train", variables, "train"))

    for name, v, mode in cases:
        lowered = run_enc.lower(v, img, mode, 4)
        compiled = lowered.compile()
        ca = compiled.cost_analysis()
        if isinstance(ca, list):
            ca = ca[0]
        flops = ca.get("flops", float("nan"))
        byt = ca.get("bytes accessed", float("nan"))
        t = slope(lambda vv, im, k: run_enc(vv, im, mode, k), (v, img))
        print(json.dumps({
            "case": name,
            "ms": round(t * 1e3, 2),
            "gflop_per_iter": round(flops / 4 / 1e9, 1),
            "gb_accessed_per_iter": round(byt / 4 / 1e9, 2),
        }), flush=True)


if __name__ == "__main__":
    main()
