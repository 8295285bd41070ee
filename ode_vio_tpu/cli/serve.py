"""Online serving entry point: ``python -m ode_vio_tpu.cli.serve``.

Streams sequences through the model as a live odometry service would:
windows arrive in order, the hidden state carries across them, and each
step's wall-clock latency (decode-wait + device step + readback) is
recorded. Reports p50/p90/p99 step latency and steady-state throughput
as one JSON line on stdout, and writes the accumulated KITTI-format
trajectories.

One ``--val_seq`` entry serves that sequence alone; several entries are
multiplexed as concurrent sessions onto the lanes of one compiled
executable via the :class:`ode_vio_tpu.serving.StreamingEngine` — the
multi-camera / multi-vehicle serving shape.

The reference has no serving surface (SURVEY.md section 0: "no serving
path"); this is the deployment-shaped complement of the batch tester
(cli/test.py ≙ /root/reference/scripts/test_model.py). The pipeline is
the production configuration: folded BatchNorm (models/fold.py), bf16
encoders, warm-started adaptive solver, native C++ decode prefetched one
window ahead (data/native_loader.py), single jit-compiled executable.
"""

from __future__ import annotations

import json
import time

import numpy as np
import jax

from ode_vio_tpu.cli.flags import build_parser, config_from_args
from ode_vio_tpu.data.evaluation import EvalPartition, kitti_eval
from ode_vio_tpu.data.native_loader import Prefetcher
from ode_vio_tpu.models.deepvio import init_model
from ode_vio_tpu.training.loop import make_infer_fn
from ode_vio_tpu.utils import geometry as geo
from ode_vio_tpu.utils.logging_utils import (
    setup_experiment_directories,
    setup_logger,
)


def main(argv=None):
    args = build_parser().parse_args(argv)
    cfg = config_from_args(args)
    dirs = setup_experiment_directories(
        cfg.save_dir, cfg.experiment_name + "_serve"
    )
    logger = setup_logger(f"serve_{cfg.experiment_name}", dirs["logs"])
    seq = cfg.data.val_seq[0]

    model, variables = init_model(cfg, jax.random.PRNGKey(cfg.train.seed))
    converted = None
    if cfg.pretrain:
        from ode_vio_tpu.models.convert import maybe_load_reference

        converted = maybe_load_reference(cfg.pretrain, cfg.model, variables)
    if converted is not None:
        variables = converted
        logger.info("converted reference checkpoint %s", cfg.pretrain)
    elif cfg.pretrain:
        from ode_vio_tpu.training.checkpoint import CheckpointManager
        from ode_vio_tpu.training.loop import (
            create_train_state, make_optimizer,
        )

        ckpt = CheckpointManager(cfg.pretrain)
        latest = ckpt.latest_epoch()
        name = ckpt.epoch_name(latest) if latest is not None else "best"
        tx = make_optimizer(cfg)
        target = jax.device_get(
            create_train_state(cfg, variables, tx,
                               jax.random.PRNGKey(cfg.train.seed + 1))
        )
        state = ckpt.restore(name, target)
        variables = {"params": state.params, "batch_stats": state.batch_stats}
        logger.info("loaded checkpoint %s/%s", cfg.pretrain, name)
    else:
        logger.warning("no --pretrain given: serving random init")

    fold = not getattr(args, "no_fold_bn", False)
    if len(cfg.data.val_seq) > 1:
        return _serve_multi(cfg, model, variables, fold, dirs, logger,
                            serve_dp=getattr(args, "eval_dp", 1))

    infer = make_infer_fn(model, variables, fold_bn=fold)

    part = EvalPartition(
        cfg.data.data_dir, seq, cfg.data.seq_len,
        (cfg.model.img_h, cfg.model.img_w),
    )

    # warm-up: compile both the cold-start and carried executables on a
    # synthetic window so the first served frame pays no compile latency;
    # truncated-solve counters reset afterwards so the report only counts
    # solves that actually served a frame
    w0 = part[0]
    p0, carry = infer(w0.imgs[None], w0.imus[None], w0.ts[None], None)
    np.asarray(p0)  # value fetch: block_until_ready can return while the
    # remote compile is still in flight on relayed backends, leaving the
    # first served window to absorb it
    np.asarray(infer(w0.imgs[None], w0.imus[None], w0.ts[None], carry)[0])
    infer.reset_incomplete()
    logger.info("compiled; serving sequence %s (%d windows)", seq, len(part))

    pf = Prefetcher(part.img_hw)
    latencies = []
    chunks = []
    carry = None
    t_start = time.perf_counter()
    try:
        pf.submit(0, part.paths(0))
        for i in range(len(part)):
            t0 = time.perf_counter()
            if i + 1 < len(part):
                pf.submit(i + 1, part.paths(i + 1))
            w = part.assemble(i, pf.get(i))
            poses, carry = infer(w.imgs[None], w.imus[None], w.ts[None], carry)
            chunks.append(np.asarray(poses)[0, : w.valid])  # sync point
            latencies.append(time.perf_counter() - t0)
    finally:
        pf.close()
    wall = time.perf_counter() - t_start

    pose_est = np.concatenate(chunks, 0)
    est_mats = geo.accumulate_path(pose_est)
    out_path = dirs["poses"] / f"{seq}_pred.txt"
    geo.save_trajectory(est_mats, out_path)

    gt = np.asarray(part.seq.rel_poses[: len(pose_est)], np.float32)
    metrics = kitti_eval(pose_est, gt)

    lat_ms = np.sort(np.asarray(latencies)) * 1e3
    pct = lambda p: float(np.percentile(lat_ms, p))
    frames = int(pose_est.shape[0])
    report = {
        "seq": seq,
        "windows": len(part),
        "frames": frames,
        "latency_ms_p50": round(pct(50), 2),
        "latency_ms_p90": round(pct(90), 2),
        "latency_ms_p99": round(pct(99), 2),
        "frames_per_sec": round(frames / wall, 1),
        "t_rmse": round(float(metrics["t_rmse"]), 6),
        "trajectory": str(out_path),
    }
    if infer.incomplete() > 0:
        report["solver_incomplete"] = int(infer.incomplete())
    logger.info("serve report: %s", report)
    print(json.dumps(report))
    return report


def _serve_multi(cfg, model, variables, fold_bn, dirs, logger,
                 serve_dp: int = 1):
    """Serve every ``--val_seq`` sequence as a concurrent session on one
    compiled executable (StreamingEngine). The engine is warmed up
    (compiled) on synthetic proto windows before the clock starts, so both
    the throughput denominator and the latency percentiles are
    steady-state."""
    from ode_vio_tpu.serving import StreamingEngine

    seqs = list(cfg.data.val_seq)
    parts = {
        s: EvalPartition(cfg.data.data_dir, s, cfg.data.seq_len,
                         (cfg.model.img_h, cfg.model.img_w))
        for s in seqs
    }
    sharding = None
    n_lanes = len(seqs)
    if serve_dp == -1:
        serve_dp = len(jax.devices())
    if serve_dp > 1:
        # shard the session lanes over a 1-D data mesh (lane count rounds
        # up to a mesh multiple; spare lanes stay free for open_session)
        from ode_vio_tpu.parallel.mesh import batch_sharding, create_mesh

        mesh = create_mesh(data=serve_dp, model=1,
                           devices=jax.devices()[:serve_dp])
        sharding = batch_sharding(mesh)
        n_lanes = -(-len(seqs) // serve_dp) * serve_dp
    engine = StreamingEngine(model, variables, max_sessions=n_lanes,
                             fold_bn=fold_bn, sharding=sharding)
    sids = {s: engine.open_session() for s in seqs}
    w0 = parts[seqs[0]][0]
    engine.warmup((w0.imgs, w0.imus, w0.ts))
    logger.info("compiled; serving %d sessions", len(seqs))
    pf = Prefetcher(parts[seqs[0]].img_hw)
    n_steps = max(len(p) for p in parts.values())

    def submit(step):
        for s in seqs:
            if step < len(parts[s]):
                pf.submit(step * len(seqs) + sids[s], parts[s].paths(step))

    chunks = {s: [] for s in seqs}
    latencies = []
    t_start = time.perf_counter()
    try:
        submit(0)
        for step in range(n_steps):
            t0 = time.perf_counter()
            if step + 1 < n_steps:
                submit(step + 1)
            windows = {}
            metas = {}
            for s in seqs:
                if step >= len(parts[s]):
                    continue  # finished sequence: session idles
                w = parts[s].assemble(
                    step, pf.get(step * len(seqs) + sids[s])
                )
                metas[s] = w
                windows[sids[s]] = (w.imgs, w.imus, w.ts)
            out = engine.step(windows)
            for s, w in metas.items():
                chunks[s].append(out[sids[s]][: w.valid])
            latencies.append(time.perf_counter() - t0)
    finally:
        pf.close()
    wall = time.perf_counter() - t_start

    per_seq = {}
    total_frames = 0
    for s in seqs:
        pose_est = np.concatenate(chunks[s], 0)
        total_frames += int(pose_est.shape[0])
        est_mats = geo.accumulate_path(pose_est)
        geo.save_trajectory(est_mats, dirs["poses"] / f"{s}_pred.txt")
        gt = np.asarray(parts[s].seq.rel_poses[: len(pose_est)], np.float32)
        per_seq[s] = round(float(kitti_eval(pose_est, gt)["t_rmse"]), 6)

    lat = np.sort(np.asarray(latencies)) * 1e3
    steady = lat if len(lat) <= 4 else np.sort(
        np.asarray(latencies[2:])) * 1e3
    pct = lambda p: float(np.percentile(steady, p))
    report = {
        "sessions": len(seqs),
        "steps": len(latencies),
        "frames": total_frames,
        "latency_ms_p50": round(pct(50), 2),
        "latency_ms_p90": round(pct(90), 2),
        "latency_ms_p99": round(pct(99), 2),
        "frames_per_sec": round(total_frames / wall, 1),
        "t_rmse": per_seq,
        "solver_incomplete": engine.incomplete(),
    }
    logger.info("serve report: %s", report)
    print(json.dumps(report))
    return report


if __name__ == "__main__":
    main()
