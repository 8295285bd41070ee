"""Per-window diagnostic of carried-state drift in streaming eval.

Round 4 attributed the CDE/RDE families' streaming-eval error to the
carried-state distribution shift (training always starts windows fresh —
reference parity, PoseCDE.py:81 — while eval carries the latent across
windows, KITTI_eval.py:141). Round 5 measured that single-splice
carried-state exposure training (TrainConfig.carry_exposure) does NOT
close that gap. This probe explains why, as a number: it streams one
sequence window-by-window and records, per window index w,

  * ``z_carried``  — the norm of the latent the carry-mode eval feeds
    window w+1 (accumulated across all previous windows),
  * ``z_fresh``    — the norm of the latent a FRESH run of the same
    window produces (the distribution training's splice exposes: the
    carry a TBPTT split sees is the latent k steps after a fresh start),
  * ``t_rmse_carried`` / ``t_rmse_fresh`` — the window's translation RMSE
    under the accumulated carry vs stateless.

If the carried-z trajectory leaves the fresh-z distribution and keeps
drifting with w, no amount of single-splice exposure can cover it — the
carried state at eval is NONSTATIONARY in the window index, which is the
round-5 conclusion recorded in BENCH.md.

Usage (CPU is fine at the fixture's 64x128 dims)::

    PYTHONPATH=/root/repo python -u scripts/probe_carry_drift.py \
        --params /tmp/r5_ce_params/cde.pkl --family cde --tree /tmp/r5_tree
"""

from __future__ import annotations

import argparse
import json
import os
import pickle
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def _tree_norm(tree) -> float:
    import jax

    leaves = [np.asarray(l, np.float64) for l in jax.tree_util.tree_leaves(tree)]
    return float(np.sqrt(sum(float((l * l).sum()) for l in leaves)))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--family", default="cde")
    ap.add_argument("--params", required=True,
                    help="pickled variables from exp_irregularity --save_params")
    ap.add_argument("--tree", required=True, help="synthetic KITTI tree")
    ap.add_argument("--seq", default="05")
    ap.add_argument("--eval_dropout", type=float, default=0.0)
    ap.add_argument("--platform", default=None,
                    help="force a jax platform (e.g. cpu)")
    args = ap.parse_args()

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)

    from exp_irregularity import build_config

    from ode_vio_tpu.data.evaluation import EvalPartition
    from ode_vio_tpu.models.deepvio import create_model
    from ode_vio_tpu.training.loop import make_infer_fn

    with open(args.params, "rb") as f:
        variables = jax.tree_util.tree_map(np.asarray, pickle.loads(f.read()))
    cfg = build_config(args.family)
    model = create_model(cfg)
    infer = make_infer_fn(model, variables)

    part = EvalPartition(
        args.tree, args.seq, cfg.data.seq_len, (64, 128),
        args.eval_dropout, np.random.default_rng(7919),
    )
    gt = np.asarray(part.seq.rel_poses, np.float32)

    carry = None
    rows = []
    off = 0
    for i in range(len(part)):
        w = part[i]
        poses_c, carry = infer(w.imgs[None], w.imus[None], w.ts[None], carry)
        poses_f, fresh_final = infer(w.imgs[None], w.imus[None], w.ts[None],
                                     None)
        g = gt[off: off + w.valid]
        ec = float(np.sqrt(np.mean(
            (np.asarray(poses_c)[0, : w.valid, 3:] - g[:, 3:]) ** 2)))
        ef = float(np.sqrt(np.mean(
            (np.asarray(poses_f)[0, : w.valid, 3:] - g[:, 3:]) ** 2)))
        row = {
            "w": i,
            "z_carried": round(_tree_norm(carry), 4),
            "z_fresh": round(_tree_norm(fresh_final), 4),
            "t_rmse_carried": round(ec, 4),
            "t_rmse_fresh": round(ef, 4),
        }
        rows.append(row)
        print(json.dumps(row), flush=True)
        off += w.valid

    zc = np.array([r["z_carried"] for r in rows])
    zf = np.array([r["z_fresh"] for r in rows])
    ec = np.array([r["t_rmse_carried"] for r in rows])
    ef = np.array([r["t_rmse_fresh"] for r in rows])
    n = len(rows)
    k = max(1, n // 5)
    corr = float(np.corrcoef(np.arange(n), zc)[0, 1]) if n > 2 else float("nan")
    print(f"# windows={n}  corr(w, ||z_carried||)={corr:+.3f}")
    print(f"# ||z_carried|| first{k}/last{k}: "
          f"{zc[:k].mean():.3f} -> {zc[-k:].mean():.3f}  "
          f"(fresh stays {zf.min():.3f}..{zf.max():.3f})")
    print(f"# t_rmse carried first{k}/last{k}: "
          f"{ec[:k].mean():.3f} -> {ec[-k:].mean():.3f}; "
          f"fresh {ef[:k].mean():.3f} -> {ef[-k:].mean():.3f}")
    outside = float(np.mean((zc < zf.min()) | (zc > zf.max())))
    print(f"# fraction of carried-z outside the fresh-z range: "
          f"{100 * outside:.0f}%")


if __name__ == "__main__":
    main()
