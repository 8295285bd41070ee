"""Decompose the frozen-encoder flagship train step (131 ms @ B=32).

Round 3 established per-op that neither backward convs nor solver-MLP
tiling explain the gap between the step's ~45 ms of roofline compute
(trunk fwd 31 ms + solve matmuls) and its 131 ms wall. This probe times
the REAL step pipeline under targeted ablations to attribute the rest:

  full        — make_train_step as shipped (reference point)
  fwd         — loss forward only (no value_and_grad): backward cost
  steps1      — max_steps_train=1 (one masked solver iter): solve cost
  euler1      — fixed-step euler, 1 step: solver machinery floor
  nodrop      — rnn/imu dropout rates zeroed (RNG + mask traffic)

Each variant is timed with the slope method (2 vs 6 chained steps inside
one jit, value-fetch timing) so tunnel RTT cancels. Run:
``PYTHONPATH=/root/repo:/root/.axon_site python -u
scripts/probe_train_decomp.py [--variants full fwd ...]``
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


def build(cfg_mod=None, fwd_only=False, eval_mode=False):
    from ode_vio_tpu.config import flagship_config
    from ode_vio_tpu.models.deepvio import init_model
    from ode_vio_tpu.training.loop import (
        create_train_state, make_optimizer, make_train_step,
    )

    cfg = flagship_config()
    cfg = dataclasses.replace(
        cfg, train=dataclasses.replace(cfg.train, freeze_encoder=True)
    )
    if cfg_mod:
        cfg = cfg_mod(cfg)
    model, variables = init_model(cfg, jax.random.PRNGKey(0), batch_size=1)
    tx = make_optimizer(cfg)
    state = create_train_state(cfg, variables, tx, jax.random.PRNGKey(1))

    if eval_mode:
        # eval-mode forward on the same shapes: while-loop solver, BN
        # read-only, no dropout — the train-forward's lower bound
        @jax.jit
        def eval_step(s, img, imu, gts, ts):
            (poses, _) = model.apply(
                {"params": s.params, "batch_stats": s.batch_stats},
                img, imu, ts, train=False,
                rngs={"gumbel": jax.random.PRNGKey(0)},
            )
            s2 = dataclasses.replace(s, step=s.step + 1)
            return s2, {"loss": jnp.sum(poses) + 1e-6 * s.step}

        return cfg, state, eval_step

    if not fwd_only:
        step = make_train_step(model, tx, cfg)
        return cfg, state, lambda s, i, u, g, t: step(s, i, u, g, t)

    # forward-only: same loss computation + BN update, no grad
    w = cfg.train.angle_loss_weight

    @jax.jit
    def fwd_step(s, img, imu, gts, ts):
        rng, r_drop, r_gumbel = jax.random.split(s.rng, 3)
        (poses, _), updates = model.apply(
            {"params": s.params, "batch_stats": s.batch_stats},
            img, imu, ts, train=True,
            rngs={"dropout": r_drop, "gumbel": r_gumbel},
            mutable=["batch_stats"],
        )
        angle = jnp.mean((poses[..., :3] - gts[..., :3]) ** 2)
        trans = jnp.mean((poses[..., 3:] - gts[..., 3:]) ** 2)
        loss = w * angle + trans
        s2 = dataclasses.replace(
            s, batch_stats=updates["batch_stats"], rng=rng,
            step=s.step + 1,
        )
        return s2, {"loss": loss}

    return cfg, state, fwd_step


def time_step(state, step, cfg, k1=2, k2=6, reps=3):
    """Chain k step calls back-to-back inside Python (state threading makes
    them sequential on device); time the k1-vs-k2 difference with a final
    loss fetch forcing completion."""
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
    gts = jnp.asarray(rng.standard_normal((B, S - 1, 6)) * 0.1, jnp.float32)

    def run(s, k):
        for _ in range(k):
            s, m = step(s, img, imu, gts, ts)
        float(m["loss"])  # force completion (relay block_until_ready lies)
        return s

    state = run(state, 1)  # compile + warm
    samples = []
    for _ in range(reps):
        t0 = time.perf_counter()
        state = run(state, k1)
        ta = time.perf_counter() - t0
        t0 = time.perf_counter()
        state = run(state, k2)
        tb = time.perf_counter() - t0
        samples.append((tb - ta) / (k2 - k1))
    samples.sort()
    return samples[len(samples) // 2]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--variants", nargs="+", default=None)
    args = ap.parse_args()

    def steps1(cfg):
        return dataclasses.replace(
            cfg, solver=dataclasses.replace(cfg.solver, max_steps_train=1)
        )

    def euler1(cfg):
        return dataclasses.replace(
            cfg,
            solver=dataclasses.replace(
                cfg.solver, method="euler", adaptive=False, fixed_steps=1
            ),
        )

    def nodrop(cfg):
        return dataclasses.replace(
            cfg,
            model=dataclasses.replace(
                cfg.model, rnn_dropout_out=0.0, imu_dropout=0.0,
            ),
        )

    def chunk(n):
        def mod(cfg):
            return dataclasses.replace(
                cfg, solver=dataclasses.replace(cfg.solver, exit_chunk=n)
            )
        return mod

    variants = {
        "full": (None, False),
        "fwd": (None, True),
        "steps1": (steps1, False),
        "euler1": (euler1, False),
        "nodrop": (nodrop, False),
        # forward-only with a 1-iteration solve budget: direct solve-fwd cost
        "fwdsteps1": (steps1, True),
        # early-exit chunk-size sweep (full step)
        "chunk1": (chunk(1), False),
        "chunk2": (chunk(2), False),
        "chunk8": (chunk(8), False),
        "evalfwd": (None, False, True),
    }

    if args.variants and "encdrop0" in args.variants:
        # zero the FlowNet trunk's dropout rates (module-level constant):
        # isolates the cost of the ~1.56e9 threefry mask draws per step
        from ode_vio_tpu.models import encoders

        encoders.ImageEncoder.TRUNK = tuple(
            (f, k, s, 0.0) for f, k, s, _ in encoders.ImageEncoder.TRUNK
        )
        variants["encdrop0"] = (None, False)
    for name, spec in variants.items():
        if args.variants and name not in args.variants:
            continue
        mod, fwd_only = spec[0], spec[1]
        eval_mode = spec[2] if len(spec) > 2 else False
        cfg, state, step = build(mod, fwd_only, eval_mode)
        t = time_step(state, step, cfg)
        print(json.dumps({
            "variant": name,
            "ms_per_step": round(t * 1e3, 2),
            "frames_per_sec": round(B * (cfg.model.seq_len - 1) / t, 1),
        }), flush=True)


if __name__ == "__main__":
    main()
