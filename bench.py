"""Headline benchmark: KITTI frames/sec/chip on the flagship PoseODERNN.

Measures jitted eval-mode streaming inference (adaptive dopri5, bf16
encoders) at reference dimensions — 256x512 image pairs, seq_len 11,
768-d fused features, 3-layer ODE-RNN — on the available accelerator.
"frames" = image-pair transitions regressed to poses (B * (seq_len-1) per
call), the unit of work of the reference eval loop
(/root/reference/src/data/KITTI_eval.py:124-160).

vs_baseline: the reference records no throughput numbers anywhere
(BASELINE.md); its commented CUDA-event timing loop ran single-window
batch-1 eval on an RTX 3090. We use an estimated 400 frames/s for that
setup (FlowNet-S forward ~8.6 GFLOP/pair at ~35% fp32 utilisation plus the
dominant per-step Python/torchode adaptive-solve overhead at ~5-10 ms per
frame); the estimate and its basis are recorded here so the ratio can be
re-based once a measured reference number exists.

Prints ONE JSON line to stdout.
"""

from __future__ import annotations

import json
import os
import sys
import time

import jax

try:  # persistent compile cache: repeat driver runs skip the 1-2 min compile
    os.makedirs("/root/repo/.jax_cache", exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
except Exception:
    pass

import jax.numpy as jnp
import numpy as np

REFERENCE_RTX3090_FPS_ESTIMATE = 400.0

BATCH = 64  # throughput sweet spot measured on v5e (see BENCH notes)
WARMUP = 2
ITERS = 10


def main() -> None:
    import dataclasses

    from ode_vio_tpu.config import flagship_config
    from ode_vio_tpu.models.deepvio import create_model, init_model
    from ode_vio_tpu.models.fold import fold_batchnorm_into_bias

    cfg = flagship_config()
    model, variables = init_model(cfg, jax.random.PRNGKey(0), batch_size=1)
    # eval path ships with the frozen BN statistics folded into the conv
    # weights+bias and the BN ops dropped from the graph (exact;
    # models/fold.py) — same configuration as cli/test.py via make_infer_fn
    eval_model = create_model(
        dataclasses.replace(
            cfg, model=dataclasses.replace(cfg.model, skip_bn=True)
        )
    )
    eval_variables = fold_batchnorm_into_bias(variables)

    S = cfg.model.seq_len
    rng = np.random.default_rng(0)
    img = jnp.asarray(
        rng.random((BATCH, S, cfg.model.img_h, cfg.model.img_w, 3), np.float32)
        - 0.5
    )
    imu = jnp.asarray(
        rng.standard_normal((BATCH, 10 * (S - 1) + 1, 6)), jnp.float32
    )
    ts = jnp.asarray(
        np.cumsum(rng.random((BATCH, S)).astype(np.float32) * 0.05 + 0.08, 1)
    )
    carry0 = jnp.zeros(
        (cfg.model.rnn_num_layers, BATCH, cfg.model.f_len), jnp.float32
    )

    # Streaming eval exactly as KittiEvaluator runs it: W consecutive
    # windows with the hidden state carried across them, scanned inside
    # ONE jit call so the measurement is pure device throughput (per-call
    # host dispatch — large under a tunneled TPU — would otherwise bias
    # the number low). Timing is the W2-W1 slope, which also cancels the
    # single dispatch of the call itself.
    def make_stream(W):
        @jax.jit
        def run(img, imu, ts, carry):
            def body(c, w):
                poses, c2 = eval_model.apply(
                    eval_variables, img + w * 1e-3, imu, ts + w * 0.1,
                    hc=c, train=False,
                    rngs={"gumbel": jax.random.PRNGKey(0)},
                )
                return c2, jnp.sum(poses)
            c, sums = jax.lax.scan(
                body, carry, jnp.arange(W, dtype=jnp.float32)
            )
            return jnp.sum(sums)
        return run

    W1, W2 = 2, 2 + ITERS
    run1, run2 = make_stream(W1), make_stream(W2)
    # timing forces a VALUE fetch (float(...)): through the tunneled TPU,
    # block_until_ready can return before execution finishes (async-future
    # relay semantics; see BENCH.md round-3 gotcha)
    t_compile = time.perf_counter()
    float(run1(img, imu, ts, carry0))
    float(run2(img, imu, ts, carry0))
    compile_s = time.perf_counter() - t_compile

    samples = []
    for rep in range(3):
        t0 = time.perf_counter()
        float(run1(img + 0.1 * rep, imu, ts, carry0))
        ta = time.perf_counter() - t0
        t0 = time.perf_counter()
        float(run2(img + 0.2 * rep, imu, ts, carry0))
        tb = time.perf_counter() - t0
        samples.append((tb - ta) / (W2 - W1))
    samples.sort()
    per_window = samples[1]
    elapsed = per_window * ITERS
    frames = BATCH * (S - 1) * ITERS
    fps = frames / elapsed

    # secondary metric (BASELINE.json): odeint solver steps per second
    try:
        (_, _), inter = jax.jit(
            lambda i, u, t, c: model.apply(
                variables, i, u, t, hc=c, train=False,
                rngs={"gumbel": jax.random.PRNGKey(0)},
                mutable=["intermediates"],
            )
        )(img, imu, ts, carry0)
        steps = int(
            sum(
                int(np.asarray(v).ravel().sum())
                for k, v in jax.tree_util.tree_flatten_with_path(
                    inter["intermediates"]
                )[0]
                if "accepted" in str(k)
            )
        )
        print(
            f"odeint_steps_per_sec={steps * ITERS / elapsed:.0f} "
            f"(accepted steps per forward: {steps})",
            file=sys.stderr,
        )
    except Exception as e:  # observability only — never fail the bench
        print(f"step-count introspection skipped: {e}", file=sys.stderr)
    print(
        f"device={jax.devices()[0]} compile+warmup={compile_s:.1f}s "
        f"elapsed={elapsed:.3f}s frames={frames}",
        file=sys.stderr,
    )
    # training-path throughput (flagship config, B=32): a fused jitted
    # train step — forward + backward through the bounded-scan solver +
    # clip + Adam update (VERDICT r1 next #9: regressable, not prose)
    train_fps = None
    try:
        from ode_vio_tpu.training.loop import (
            create_train_state, make_optimizer, make_train_step,
        )

        TB = 32
        tx = make_optimizer(cfg)
        state = create_train_state(cfg, variables, tx, jax.random.PRNGKey(1))
        step = make_train_step(model, tx, cfg)
        gts = jnp.asarray(
            rng.standard_normal((TB, S - 1, 6)) * 0.1, jnp.float32
        )
        timg, timu, tts = img[:TB], imu[:TB], ts[:TB]

        def run_train(state, k):
            for _ in range(k):
                state, m = step(state, timg, timu, gts, tts)
            float(m["loss"])  # value fetch: relay block_until_ready lies
            return state

        state = run_train(state, 1)  # compile + warm
        K1, K2 = 2, 6
        tsamples = []
        for _ in range(3):
            t0 = time.perf_counter()
            state = run_train(state, K1)
            ta = time.perf_counter() - t0
            t0 = time.perf_counter()
            state = run_train(state, K2)
            tb = time.perf_counter() - t0
            tsamples.append((tb - ta) / (K2 - K1))
        tsamples.sort()
        train_ms = tsamples[1] * 1e3
        train_fps = TB * (S - 1) / tsamples[1]
        print(
            f"train_step={train_ms:.1f}ms "
            f"train_frames_per_sec={train_fps:.0f}",
            file=sys.stderr,
        )
    except Exception as e:  # never fail the headline bench
        print(f"train-step bench skipped: {e}", file=sys.stderr)

    # the recommended fast recipe: --frozen_encoder_eval runs the frozen
    # FlowNet through its inference graph inside the train step (BN folded
    # into the conv bias, trunk dropout off — standard frozen-backbone
    # practice; the reference's torch train mode keeps paying both,
    # train_model.py:191-194). Same flagship recipe otherwise.
    train_fe_fps = None
    try:
        cfg_fe = cfg.replace(
            train=dataclasses.replace(cfg.train, frozen_encoder_eval=True)
        )
        tx_fe = make_optimizer(cfg_fe)
        state = create_train_state(cfg_fe, init_model(
            cfg_fe, jax.random.PRNGKey(0), batch_size=1)[1],
            tx_fe, jax.random.PRNGKey(1))
        step_fe = make_train_step(model, tx_fe, cfg_fe)

        def run_fe(state, k):
            for _ in range(k):
                state, m = step_fe(state, timg, timu, gts, tts)
            float(m["loss"])
            return state

        state = run_fe(state, 1)
        fsamples = []
        for _ in range(3):
            t0 = time.perf_counter()
            state = run_fe(state, K1)
            ta = time.perf_counter() - t0
            t0 = time.perf_counter()
            state = run_fe(state, K2)
            tb = time.perf_counter() - t0
            fsamples.append((tb - ta) / (K2 - K1))
        fsamples.sort()
        train_fe_fps = TB * (S - 1) / fsamples[1]
        print(
            f"train_step_frozen_eval={fsamples[1] * 1e3:.1f}ms "
            f"train_frames_per_sec_frozen_eval={train_fe_fps:.0f}",
            file=sys.stderr,
        )
    except Exception as e:  # never fail the headline bench
        print(f"frozen-eval train bench skipped: {e}", file=sys.stderr)

    result = {
        "metric": "kitti_frames_per_sec_per_chip",
        "value": round(fps, 2),
        "unit": "frames/s",
        "vs_baseline": round(fps / REFERENCE_RTX3090_FPS_ESTIMATE, 3),
    }
    if train_fps is not None:
        result["train_frames_per_sec"] = round(train_fps, 2)
    if train_fe_fps is not None:
        result["train_frames_per_sec_frozen_eval"] = round(train_fe_fps, 2)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
