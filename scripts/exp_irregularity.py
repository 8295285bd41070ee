"""Irregular-sampling robustness experiment: the reference's headline
claim, reproduced inside this framework on the hermetic odometric fixture.

The reference's distinguishing capability is graceful degradation under
irregular frame sampling (README.md:4 "up to 40 % better" vs SOTA under
extreme irregularity; exercised by frame-dropout injection,
src/data/KITTI_dataset.py:63-74, src/data/KITTI_eval.py:59-70). This
script measures that capability head-to-head between the continuous-time
flagship (ode-rnn) and the discrete baseline (rnn) with matched
architecture, data, budget and seeds:

  * data: synthetic mini-KITTI with ODOMETRY-CONSISTENT IMU
    (data/synthetic.py::make_imu_odometric) — each frame interval's IMU
    samples carry that interval's body-frame VELOCITY. Frame dropout
    composes the relative poses of merged intervals but deletes the
    dropped interval's IMU rows, so the surviving window's displacement
    target scales with the (irregular) elapsed time while its IMU
    velocity evidence does not: recovering the pose REQUIRES using the
    timestamps. The continuous-time core integrates its latent over the
    true dt; the discrete RNN (reference parity: PoseRNN ignores ts,
    src/models/PoseRNN.py:53-73) cannot.
  * train: both families, identical dims/seeds, frame dropout
    N(0.3, 0.1) resampled per epoch (train_model.py:122-151 recipe).
  * eval: official segment metric at eval dropout 0 / 0.3 / 0.5 / 0.7,
    `--run_times` repeats with re-rolled dropout (test_model.py:101-128).

Run: ``PYTHONPATH=/root/repo:/root/.axon_site python -u
scripts/exp_irregularity.py [--families ode-rnn rnn] [--epochs 15]``
Emits one JSON line per (family, eval_dropout) and a summary table.

Training-regime arms (BENCH.md round 5): ``--carry_exposure p``
(single-splice TBPTT exposure — measured: mild rates help carry-mode
streaming 10-25 %, no rate closes the gap) and ``--tbptt N``
(full-sequence TBPTT chains — measured: CLOSES the cde/rde carry-mode
streaming gap at N=8). ``--eval_modes carry history reset`` selects the
streaming statefulness under eval.
"""

from __future__ import annotations

import argparse
import json
import tempfile
import time
from pathlib import Path

import numpy as np


def build_config(family: str):
    from ode_vio_tpu.config import (
        Config, DataConfig, ModelConfig, SolverConfig, TrainConfig,
    )

    return Config(
        model=ModelConfig(
            model_type=family, img_w=128, img_h=64, seq_len=11,
            v_f_len=64, i_f_len=64, ode_hidden_dim=128,
            rnn_num_layers=2, compute_dtype="float32",
        ),
        solver=SolverConfig(max_steps=32, max_steps_train=16, dt0=1e-2),
        train=TrainConfig(batch_size=8, lr_warmup=1e-3, seed=0),
        data=DataConfig(seq_len=11),
    )


def train_family(family: str, root, epochs: int, dropout: float,
                 dropout_std: float, seed: int, lr: float = 1e-3,
                 lr_fine: float | None = None,
                 carry_exposure: float = 0.0, tbptt_chain: int = 0):
    import jax
    import jax.numpy as jnp

    from ode_vio_tpu.data.kitti import (
        BoundarySafeBatchSampler, KittiDataset, collate,
    )
    from ode_vio_tpu.data.transforms import Center, Compose
    from ode_vio_tpu.models.deepvio import init_model
    from ode_vio_tpu.training.loop import (
        create_train_state, make_optimizer, make_train_step,
        set_learning_rate,
    )

    cfg = build_config(family)
    model, variables = init_model(cfg, jax.random.PRNGKey(seed))
    tx = make_optimizer(cfg)
    state = create_train_state(cfg, variables, tx,
                               jax.random.PRNGKey(seed + 1))
    state = state.replace(
        opt_state=set_learning_rate(state.opt_state, lr)
    )
    if tbptt_chain and carry_exposure > 0.0:
        raise ValueError("--tbptt and --carry_exposure are mutually "
                         "exclusive (TrainConfig.__post_init__ rationale)")
    if tbptt_chain:
        # full-sequence TBPTT (TrainConfig.tbptt_chain): sequence-ordered
        # chains with state carried across steps — the true streaming
        # regime, vs carry_exposure's single-splice approximation
        from ode_vio_tpu.training.loop import make_streaming_train_step

        stream_step = make_streaming_train_step(model, tx, cfg)
        fresh_step = step = None
    else:
        fresh_step = step = make_train_step(model, tx, cfg)
    carried_step = None
    if carry_exposure > 0.0:
        # carried-state exposure (TrainConfig.carry_exposure): with
        # probability p a step trains the TBPTT-split window so the pose
        # core sees the carried-state distribution streaming eval feeds it
        carried_step = make_train_step(model, tx, cfg, carry=True)

    t0 = time.time()
    last_losses = []
    fine_from = int(epochs * 2 / 3)
    for epoch in range(epochs):
        if lr_fine is not None and epoch == fine_from:
            # miniature of the reference's phase schedule
            # (train_model.py:25-35): drop to the fine LR for the tail
            state = state.replace(
                opt_state=set_learning_rate(state.opt_state, lr_fine)
            )
            print(f"# {family} epoch {epoch}: lr -> {lr_fine}", flush=True)
        rng = np.random.default_rng(seed * 100003 + epoch)
        if carried_step is not None:
            # reseed the exposure dispatch per epoch from (seed, epoch) so
            # the draw sequence is reconstructible after a resume (same
            # rule as the loader rng above; ode_vio_tpu/cli/train.py)
            ce_rng = np.random.default_rng(seed * 100003 + epoch + 0xCA44)

            def step(state, *batch, _rng=ce_rng):
                if _rng.random() < carry_exposure:
                    return carried_step(state, *batch)
                return fresh_step(state, *batch)

        ratio = float(np.clip(rng.normal(dropout, dropout_std), 0, 0.9))
        ds = KittiDataset(root, cfg.data.seq_len, ["00", "01"],
                          transform=Compose([Center()]),
                          dropout=ratio, rng=rng)
        if tbptt_chain:
            from ode_vio_tpu.data.kitti import StreamingChainSampler

            sampler = StreamingChainSampler(
                ds.seq_num_windows, cfg.train.batch_size, tbptt_chain,
                stride=cfg.data.seq_len - 1, seed=seed + epoch)
        else:
            sampler = BoundarySafeBatchSampler(
                len(ds), cfg.train.batch_size, seed=seed + epoch,
                drop_last=True)
        losses = []
        hc = None
        for it, idx in enumerate(sampler):
            b = collate([ds[i] for i in idx])
            if tbptt_chain:
                if it % tbptt_chain == 0:
                    hc = None
                state, m, hc = stream_step(state, *map(jnp.asarray, b), hc)
            else:
                state, m = step(state, *map(jnp.asarray, b))
            losses.append(m["loss"])
        losses = [float(l) for l in losses]
        if epoch == 0 or epoch == epochs - 1 or (epoch + 1) % 5 == 0:
            print(f"# {family} epoch {epoch}: loss {np.mean(losses):.5f} "
                  f"(dropout {ratio:.2f})", flush=True)
        last_losses = losses
    print(f"# {family}: trained {epochs} epochs in {time.time()-t0:.0f}s, "
          f"final loss {np.mean(last_losses):.5f}", flush=True)
    return model, {"params": state.params, "batch_stats": state.batch_stats}


def eval_family(family: str, model, variables, root, eval_dropouts,
                run_times: int, seed: int, streaming_mode: str = "carry"):
    import dataclasses

    from ode_vio_tpu.data.evaluation import KittiEvaluator
    from ode_vio_tpu.training.loop import make_infer_fn

    if streaming_mode != "carry":
        # 'history' is the reference's CDE/RDE eval statefulness (the
        # re-integrated path, PoseCDE.py:87-92 / PoseRDE.py:90-95);
        # 'reset' is the stateless training regime — a first-class
        # cde/rde_streaming_mode since round 4. Params are independent of
        # the streaming mode, so the trained variables drop straight into
        # the rebuilt model (no-op fields for the non-CDE families).
        model = type(model)(
            cfg=dataclasses.replace(
                model.cfg, cde_streaming_mode=streaming_mode,
                rde_streaming_mode=streaming_mode),
            solver=model.solver, cde_solver=model.cde_solver,
        )
    infer = make_infer_fn(model, variables)
    if streaming_mode == "reset":
        # generic stateless wrapper so 'reset' also applies to families
        # without a streaming-mode field (ode-rnn/rnn/cfc carry an RNN
        # hidden state): discard the carry so every window starts fresh.
        # For cde/rde this is identical to the model-level mode (which
        # ignores prev); the carry-vs-reset delta attributes eval error to
        # the carried-state distribution shift vs window-local accuracy.
        inner = infer

        def infer(img, imu, ts, carry=None, active=None):
            return inner(img, imu, ts, None, active)

        for attr in ("incomplete", "incomplete_by_lane",
                     "reset_incomplete", "set_variables"):
            setattr(infer, attr, getattr(inner, attr))
    rows = []
    for q in eval_dropouts:
        per_run = {k: [] for k in ("t_rel", "r_rel", "t_rmse", "r_rmse")}
        for r in range(run_times):
            ev = KittiEvaluator(
                root, val_seqs=("05",), seq_len=11, img_hw=(64, 128),
                eval_dropout=q,
                rng=np.random.default_rng(seed + 7919 * (r + 1)),
            )
            res = ev.eval(infer)[0]
            for k in per_run:
                per_run[k].append(float(res[k]))
        row = {"family": family, "eval_dropout": q, "runs": run_times,
               "mode": streaming_mode}
        for k, v in per_run.items():
            row[k] = round(float(np.mean(v)), 4)
            row[k + "_std"] = round(float(np.std(v)), 4)
        rows.append(row)
        print(json.dumps(row), flush=True)
    return rows


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--families", nargs="+", default=["ode-rnn", "rnn"])
    ap.add_argument("--epochs", type=int, default=15)
    ap.add_argument("--train_dropout", type=float, default=0.3)
    ap.add_argument("--train_dropout_std", type=float, default=0.1)
    ap.add_argument("--eval_dropouts", nargs="+", type=float,
                    default=[0.0, 0.3, 0.5, 0.7])
    ap.add_argument("--run_times", type=int, default=3)
    ap.add_argument("--lr", type=float, default=1e-3)
    ap.add_argument("--lr_fine", type=float, default=None,
                    help="LR for the last third of the epochs (miniature "
                         "of the reference's warmup/joint/fine schedule)")
    ap.add_argument("--n_frames", type=int, default=300)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--tree", type=str, default=None,
                    help="reuse an existing synthetic tree")
    ap.add_argument("--eval_modes", nargs="+", default=["carry"],
                    choices=["carry", "history", "reset"],
                    help="streaming-eval statefulness to evaluate (the "
                         "reference's CDE/RDE eval is 'history'; 'carry' "
                         "is this repo's O(T) default)")
    ap.add_argument("--carry_exposure", type=float, default=0.0,
                    help="probability a train step uses the carried "
                         "(TBPTT-split) window — trains the pose core on "
                         "the carried-state distribution streaming eval "
                         "feeds it (TrainConfig.carry_exposure)")
    ap.add_argument("--tbptt", type=int, default=0,
                    help="full-sequence TBPTT chain length: windows "
                         "arrive in sequence order and hidden state is "
                         "carried across N consecutive train steps "
                         "(TrainConfig.tbptt_chain); 0 = off")
    ap.add_argument("--save_params", type=str, default=None,
                    help="directory to pickle each family's trained "
                         "variables into (re-evals without retraining)")
    ap.add_argument("--load_params", type=str, default=None,
                    help="directory of pickles from --save_params; skips "
                         "training for families found there")
    args = ap.parse_args()

    from ode_vio_tpu.data.synthetic import make_kitti_tree

    if args.tree:
        root = Path(args.tree)
        if not (root / "poses").exists():
            make_kitti_tree(root, seqs=("00", "01", "05"),
                            n_frames=args.n_frames, img_hw=(64, 128),
                            imu_mode="odometric", speed_scale=10.0,
                            seed=args.seed + 11)
    else:
        root = make_kitti_tree(
            Path(tempfile.mkdtemp(prefix="kitti_irr_")),
            seqs=("00", "01", "05"), n_frames=args.n_frames,
            img_hw=(64, 128), imu_mode="odometric", speed_scale=10.0,
            seed=args.seed + 11,
        )
    print(f"# synthetic odometric tree at {root}", flush=True)

    all_rows = []
    for family in args.families:
        import pickle

        pkl = (Path(args.load_params) / f"{family}.pkl"
               if args.load_params else None)
        if pkl is not None and pkl.exists():
            import jax

            from ode_vio_tpu.models.deepvio import create_model

            variables = pickle.loads(pkl.read_bytes())
            variables = jax.tree_util.tree_map(np.asarray, variables)
            model = create_model(build_config(family))
            print(f"# {family}: loaded trained params from {pkl}",
                  flush=True)
        else:
            model, variables = train_family(
                family, root, args.epochs, args.train_dropout,
                args.train_dropout_std, args.seed, lr=args.lr,
                lr_fine=args.lr_fine, carry_exposure=args.carry_exposure,
                tbptt_chain=args.tbptt)
        if args.save_params:
            import jax

            out = Path(args.save_params)
            out.mkdir(parents=True, exist_ok=True)
            host = jax.tree_util.tree_map(np.asarray, variables)
            (out / f"{family}.pkl").write_bytes(pickle.dumps(host))
        for mode in args.eval_modes:
            all_rows += eval_family(family, model, variables, root,
                                    args.eval_dropouts, args.run_times,
                                    args.seed, streaming_mode=mode)

    # summary: degradation relative to each family's own 0%-dropout point.
    # t_rel needs >=100m segments; on short synthetic paths fall back to rmse.
    key = "t_rel" if all(np.isfinite(r["t_rel"]) for r in all_rows) else "t_rmse"
    rkey = "r_rel" if key == "t_rel" else "r_rmse"
    print(f"\n# family/mode | eval_dropout | {key} | {rkey} | {key} vs own 0%")
    base = {(r["family"], r["mode"]): r[key] for r in all_rows
            if r["eval_dropout"] == 0.0}
    for r in all_rows:
        k = (r["family"], r["mode"])
        rel = r[key] / base[k] if base.get(k) else float("nan")
        print(f"# {r['family']:8s}/{r['mode']:7s} | {r['eval_dropout']:.1f} | "
              f"{r[key]:8.3f} | {r[rkey]:7.3f} | {rel:6.2f}x")


if __name__ == "__main__":
    main()
