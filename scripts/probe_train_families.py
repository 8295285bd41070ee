"""Training-step cost across the pose-core families at flagship encoder
dimensions (B=32, frozen encoder — the reference's canonical recipe,
run_training.sh).

bench.py and BENCH.md round 3 pinned the flagship ode-rnn train step to
its platform limits; this probe records the same jitted-step measurement
for every live family so the training-side breadth is a number too. For
cde/rde the interesting quantity is how much of the step is the CDE
field's final-layer weight streaming (the (H*C, hidden) matrix the XLA
while/scan path re-reads per RK stage — the measured eval bottleneck,
attacked there with the fused Pallas kernel).

``PYTHONPATH=/root/repo:/root/.axon_site python -u
scripts/probe_train_families.py [--families rnn cde ...] [--batch 32]``
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


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--families", nargs="+",
                    default=["ode-rnn", "rnn", "cfc", "rde", "cde"])
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--adjoint", action="store_true",
                    help="cde/rde: O(1)-memory continuous-adjoint gradients "
                         "instead of the bounded-scan discretize-then-optimize")
    ap.add_argument("--frozen_eval", action="store_true",
                    help="run the frozen image encoder in inference mode "
                         "inside the train step (--frozen_encoder_eval: BN "
                         "bias-folded, trunk dropout off)")
    ap.add_argument("--cde_rtol", type=float, default=None,
                    help="override the cde/rde solver rtol (the reference "
                         "default 1e-4 makes a RANDOM-INIT field truncate "
                         "every solve; 1e-2 gives the tame few-steps-per-"
                         "segment regime of a trained field)")
    ap.add_argument("--budget", type=int, default=None,
                    help="override max_steps_train (differentiable bounded-"
                         "scan budget) — sweep to show the early-exit + "
                         "remat economics: cost should track ACTUAL steps, "
                         "not the budget, once lanes converge")
    ap.add_argument("--tbptt", action="store_true",
                    help="time the full-sequence TBPTT streaming step "
                         "(make_streaming_train_step) in its steady-state "
                         "carried variant instead of the standard fresh "
                         "step — the marginal cost of state threading")
    args = ap.parse_args()
    B = args.batch

    from ode_vio_tpu.config import flagship_config
    from ode_vio_tpu.models.deepvio import init_model
    from ode_vio_tpu.training.loop import (
        create_train_state, make_optimizer, make_train_step,
    )

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
    gts = jnp.asarray(rng.standard_normal((B, S - 1, 6)) * 0.1, jnp.float32)

    if args.frozen_eval:
        base = dataclasses.replace(
            base, train=dataclasses.replace(
                base.train, frozen_encoder_eval=True))
    if args.cde_rtol is not None:
        base = dataclasses.replace(
            base, cde_solver_cfg=dataclasses.replace(
                base.cde_solver_cfg, rtol=args.cde_rtol))
    if args.budget is not None:
        base = dataclasses.replace(
            base,
            solver=dataclasses.replace(
                base.solver, max_steps_train=args.budget),
            cde_solver_cfg=dataclasses.replace(
                base.cde_solver_cfg, max_steps_train=args.budget))

    for fam in args.families:
        cfg = dataclasses.replace(
            base, model=dataclasses.replace(
                base.model, model_type=fam, adjoint=args.adjoint))
        try:
            model, variables = init_model(cfg, jax.random.PRNGKey(0),
                                          batch_size=1)
            tx = make_optimizer(cfg)
            state = create_train_state(cfg, variables, tx,
                                       jax.random.PRNGKey(1))
            if args.tbptt:
                from ode_vio_tpu.training.loop import (
                    make_streaming_train_step,
                )

                sstep = make_streaming_train_step(model, tx, cfg)
                hc_box = [None]

                def step(state, img, imu, gts, ts):
                    state, m, hc_box[0] = sstep(
                        state, img, imu, gts, ts, hc_box[0])
                    return state, m
            else:
                step = make_train_step(model, tx, cfg)

            def run(state, k):
                m = None
                for _ in range(k):
                    state, m = step(state, img, imu, gts, ts)
                # value fetch: relay block_until_ready lies (BENCH.md r3)
                fetched = {
                    k2: float(m[k2])
                    for k2 in ("loss", "solver_incomplete")
                }
                return state, fetched

            t0 = time.perf_counter()
            # tbptt: 2 warm steps so BOTH compiled variants (cold chain
            # start + carried) exist before timing; the slope then
            # measures the steady-state carried step
            state, met = run(state, 2 if args.tbptt else 1)
            compile_s = time.perf_counter() - t0
            K1, K2 = 2, 6
            samples = []
            for _ in range(3):
                t0 = time.perf_counter()
                state, _ = run(state, K1)
                ta = time.perf_counter() - t0
                t0 = time.perf_counter()
                state, met = run(state, K2)
                tb = time.perf_counter() - t0
                samples.append((tb - ta) / (K2 - K1))
            samples.sort()
            w = samples[1]
            print(json.dumps({
                "family": fam, "train_ms_per_step": round(w * 1e3, 2),
                "train_frames_per_sec": round(B * (S - 1) / w, 1),
                "incomplete_per_step": met["solver_incomplete"],
                "tbptt": args.tbptt,
                "adjoint": args.adjoint, "frozen_eval": args.frozen_eval,
                "batch": B, "cde_rtol": args.cde_rtol,
                "budget": args.budget,
                "compile_s": round(compile_s, 1),
            }), flush=True)
        except Exception as e:
            print(json.dumps({"family": fam, "error": str(e)[:300]}),
                  flush=True)


if __name__ == "__main__":
    main()
