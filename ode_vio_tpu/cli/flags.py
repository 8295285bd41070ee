"""One shared CLI flag set building the typed Config.

Fixes the reference's duplicated-and-drifted argparse blocks
(/root/reference/scripts/config.py:5-82 vs scripts/test_model.py:11-74):
train and test consume the same parser and the same defaults; every
reference knob is preserved under the same flag name.
"""

from __future__ import annotations

import argparse

from ode_vio_tpu.config import (
    Config,
    DataConfig,
    MeshConfig,
    ModelConfig,
    SolverConfig,
    TrainConfig,
)


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        formatter_class=argparse.ArgumentDefaultsHelpFormatter
    )
    # paths / experiment
    p.add_argument("--data_dir", type=str, default="./dataset")
    p.add_argument("--save_dir", type=str, default="./results")
    p.add_argument("--experiment_name", type=str, default="experiment")
    p.add_argument("--pretrain", type=str, default=None,
                   help="checkpoint directory to resume/eval from")
    p.add_argument("--pretrain_flownet", type=str, default=None,
                   help="torch FlowNet-S .pth(.tar) to convert and load")
    p.add_argument("--wandb", action="store_true")
    p.add_argument("--wandb_group", type=str, default=None,
                   help="wandb run group (train_model.py:240)")
    p.add_argument("--wandb_id", type=str, default=None,
                   help="wandb run id to resume (resume='must', "
                        "train_model.py:238)")
    p.add_argument("--run_times", type=int, default=1)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--workers", type=int, default=8)
    p.add_argument("--print_frequency", type=int, default=10)
    p.add_argument("--ckpt_every", type=int, default=2,
                   help="save a checkpoint every N epochs "
                        "(train_model.py:223)")

    # sequences
    p.add_argument("--train_seq", type=str, nargs="+",
                   default=["00", "01", "02", "04", "08", "09"])
    p.add_argument("--val_seq", type=str, nargs="+", default=["05", "07", "10"])

    # model
    p.add_argument("--model_type", type=str, default="ode-rnn",
                   choices=["ode-rnn", "rnn", "cde", "rde", "cfc", "ltc"])
    p.add_argument("--img_w", type=int, default=512)
    p.add_argument("--img_h", type=int, default=256)
    p.add_argument("--v_f_len", type=int, default=512)
    p.add_argument("--i_f_len", type=int, default=256)
    p.add_argument("--imu_dropout", type=float, default=0.0)
    p.add_argument("--seq_len", type=int, default=11)
    p.add_argument("--fuse_method", type=str, default="cat",
                   choices=["cat", "soft", "hard"])
    p.add_argument("--compute_dtype", type=str, default="bfloat16",
                   choices=["bfloat16", "float32"])
    p.add_argument("--encoder_int8", action="store_true",
                   help="quantised int8 encoder inference (eval-only; 2x "
                        "MXU rate on v5e, float checkpoints unchanged)")
    p.add_argument("--no_fold_bn", action="store_true",
                   help="disable inference-time BatchNorm folding "
                        "(models/fold.py; folding is exact at eval)")
    p.add_argument("--batch_runs", action="store_true",
                   help="fan every (--run_times repeat, sequence) pair out "
                        "as one batch lane of a single compiled streaming "
                        "eval instead of looping the repeats sequentially "
                        "(the reference's test_model.py:101-128 loop)")
    p.add_argument("--eval_dp", type=int, default=1,
                   help="shard the eval batch lanes (cli.test) or serving "
                        "session lanes (cli.serve multi-session) over this "
                        "many devices (a 1-D data mesh; -1 = all local "
                        "devices). Eval lanes pad by replaying decoded "
                        "data, so any run/sequence count works")
    p.add_argument("--exact_dropout", action="store_true",
                   help="draw encoder dropout masks from threefry instead "
                        "of the TPU hardware rng-bit-generator (same "
                        "Bernoulli semantics; ~2x slower mask generation, "
                        "bit-reproducible against threefry-keyed runs)")
    p.add_argument("--use_pallas", action=argparse.BooleanOptionalAction,
                   default=None,
                   help="fused Pallas adaptive-ODE kernel on the inference "
                        "path (default auto: on for cde/rde on TPU, where "
                        "it measured 2.05x/1.19x — BENCH.md; off elsewhere; "
                        "--no-use_pallas forces the XLA while-loop)")
    p.add_argument("--debug_nans", action="store_true",
                   help="enable jax_debug_nans (fails fast on NaN/Inf; the "
                        "reference's manual tensor-stat NaN logging, "
                        "utils/utils.py:86-87, made automatic)")

    # ODE core
    p.add_argument("--ode_hidden_dim", type=int, default=512)
    p.add_argument("--ode_fn_num_layers", type=int, default=3)
    p.add_argument("--ode_activation_fn", type=str, default="tanh")
    p.add_argument("--ode_solver", type=str, default="dopri5")
    p.add_argument("--ode_rtol", type=float, default=1e-2)
    p.add_argument("--ode_atol", type=float, default=1e-6)
    p.add_argument("--ode_max_steps", type=int, default=64)
    p.add_argument("--ode_max_steps_train", type=int, default=16,
                   help="differentiable (bounded-scan) step budget per "
                        "solve segment during training; the chunked "
                        "early exit means unused budget costs only its "
                        "residual zero-fill, and exhausting it is "
                        "surfaced via the solver_incomplete metric")
    p.add_argument("--ode_exit_chunk", type=int, default=4,
                   help="early-exit chunk of the batched training solve: "
                        "skip whole chunks of the masked scan once every "
                        "lane converged (0 = one chunk spanning the whole "
                        "budget)")
    p.add_argument("--ode_fixed_step", action="store_true",
                   help="fixed-step integration (update_method parity)")

    # RNN core
    p.add_argument("--ode_rnn_type", type=str, default="rnn",
                   choices=["rnn", "gru"])
    p.add_argument("--rnn_num_layers", type=int, default=2)
    p.add_argument("--rnn_hidden_dim", type=int, default=1024)
    p.add_argument("--rnn_dropout_out", type=float, default=0.0)

    # CDE / RDE core
    p.add_argument("--cde_hidden_dim", type=int, default=128)
    p.add_argument("--cde_fn_num_layers", type=int, default=3)
    p.add_argument("--cde_num_layers", type=int, default=3)
    p.add_argument("--cde_activation_fn", type=str, default="tanh")
    p.add_argument("--cde_solver", type=str, default="dopri5")
    p.add_argument("--cde_max_steps", type=int, default=256,
                   help="EVAL step budget per CDE/RDE segment. At the "
                        "reference's rtol 1e-4 a stiff path can need far "
                        "more than the ODE-RNN budget; eval solves run a "
                        "while-loop that only pays for steps actually "
                        "taken, and hitting the cap is surfaced by the "
                        "cde_solves_incomplete counter. Training uses "
                        "--ode_max_steps_train.")
    p.add_argument("--cde_interpolation", type=str, default="linear",
                   choices=["linear", "cubic"])
    p.add_argument("--cde_streaming_mode", type=str, default="carry",
                   choices=["carry", "history", "reset"],
                   help="eval statefulness: carry last z (default), the "
                        "reference's re-integrated history ring buffer, or "
                        "reset (stateless windows — the training regime; "
                        "measured most accurate for this family, BENCH.md)")
    p.add_argument("--cde_history_cap", type=int, default=64)
    p.add_argument("--rde_streaming_mode", type=str, default="carry",
                   choices=["carry", "history", "reset"],
                   help="RDE eval statefulness (mirrors "
                        "--cde_streaming_mode; history = accumulated "
                        "log-signature path, PoseRDE.py:90-95)")
    p.add_argument("--rde_history_cap", type=int, default=32)
    p.add_argument("--adjoint", action="store_true")
    p.add_argument("--rde_reduced_dim", type=int, default=8)

    # training
    p.add_argument("--optimizer", type=str, default="Adam")
    p.add_argument("--batch_size", type=int, default=16)
    p.add_argument("--grad_accumulation_steps", type=int, default=1)
    p.add_argument("--freeze_encoder", action="store_true")
    p.add_argument("--frozen_encoder_eval", action="store_true",
                   help="with --freeze_encoder: run the frozen image "
                        "encoder in inference mode inside the train step "
                        "(BN folded into conv bias, trunk dropout off) — "
                        "deterministic frozen features, no running-stat "
                        "drift, and the step sheds the trunk's dropout-"
                        "mask cost (~27 ms of the 77 ms flagship step). "
                        "Default off = exact reference torch-train-mode "
                        "semantics (train_model.py:191-194)")
    p.add_argument("--carry_exposure", type=float, default=0.0,
                   help="probability a train step uses the carried "
                        "(TBPTT-split) window: segment 1 trains fresh, "
                        "its stop-gradiented final hidden state seeds "
                        "segment 2, exposing the pose core to the "
                        "carried-state distribution streaming eval feeds "
                        "it (the round-4 measured accuracy gap for "
                        "cde/rde). Targets 'carry'-mode streaming eval "
                        "(--cde/rde_streaming_mode); in [0, 1], 0 = exact "
                        "reference semantics. Measured (BENCH.md round "
                        "5): mild rates help (cde ~0.2, rde ~0.5, "
                        "10-25%% lower carry-mode t_rmse, stateless "
                        "accuracy unchanged); higher rates degrade both "
                        "modes")
    p.add_argument("--carry_split", type=int, default=0,
                   help="boundary frame index k of the carried split: "
                        "1..seq_len-2 for ode-rnn/rnn/cfc/ltc, "
                        "2..seq_len-3 for cde/rde (each segment needs "
                        ">= 2 pose steps to interpolate a path); "
                        "0 = midpoint")
    p.add_argument("--tbptt_chain", type=int, default=0,
                   help="full-sequence TBPTT streaming training: windows "
                        "arrive in sequence order (the eval-partition "
                        "layout) and hidden state is carried across N "
                        "consecutive train steps, then reset — trains the "
                        "actual carried-state distribution streaming eval "
                        "feeds the core (gradients still truncate at "
                        "window boundaries). Mutually exclusive with "
                        "--carry_exposure. 0 = off (reference semantics: "
                        "shuffled fresh windows). Measured (BENCH.md "
                        "round 5): closes the cde/rde carry-mode "
                        "streaming gap (t_rmse 6.54 -> 0.20 / 4.42 -> "
                        "0.83 at N=8); do NOT use for ode-rnn/rnn/cfc "
                        "(already stationary carry; chained training "
                        "measurably loses accuracy)")
    p.add_argument("--weight_decay", type=float, default=5e-5)
    p.add_argument("--epochs_warmup", type=int, default=20)
    p.add_argument("--epochs_joint", type=int, default=40)
    p.add_argument("--epochs_fine", type=int, default=40)
    p.add_argument("--lr_warmup", type=float, default=1e-4)
    p.add_argument("--lr_joint", type=float, default=1e-5)
    p.add_argument("--lr_fine", type=float, default=1e-6)
    p.add_argument("--lr_regressor", type=float, default=None,
                   help="separate fixed LR for the pose-regressor param "
                        "group (reference utils/utils.py:116-119)")
    p.add_argument("--gradient_clip", type=float, default=5.0)
    p.add_argument("--shuffle", type=lambda s: s.lower() != "false", default=True)

    # irregularity / augmentation
    p.add_argument("--data_dropout", type=float, default=0.0)
    p.add_argument("--data_dropout_std", type=float, default=0.0)
    p.add_argument("--eval_data_dropout", type=float, default=0.0)
    p.add_argument("--hflip", action="store_true")
    p.add_argument("--color", action="store_true")
    p.add_argument("--normalize", action="store_true")

    # mesh / distributed
    p.add_argument("--mesh_data", type=int, default=-1,
                   help="data-parallel axis size (-1 = all devices)")
    p.add_argument("--mesh_model", type=int, default=1)
    p.add_argument("--multihost", action="store_true",
                   help="call jax.distributed.initialize() for multi-host "
                        "TPU pods (replaces the reference's single-GPU "
                        "slurm launcher; mesh then spans all pod devices)")

    # profiling
    p.add_argument("--profile_dir", type=str, default=None,
                   help="capture an XProf/Perfetto trace of the first "
                        "training steps into this directory")
    return p


def config_from_args(args) -> Config:
    if getattr(args, "debug_nans", False):
        import jax

        jax.config.update("jax_debug_nans", True)
    if getattr(args, "multihost", False):
        import jax

        jax.distributed.initialize()
    return Config(
        experiment_name=args.experiment_name,
        save_dir=args.save_dir,
        pretrain=args.pretrain,
        pretrain_flownet=args.pretrain_flownet,
        run_times=args.run_times,
        wandb=args.wandb,
        model=ModelConfig(
            model_type=args.model_type,
            img_w=args.img_w, img_h=args.img_h,
            v_f_len=args.v_f_len, i_f_len=args.i_f_len,
            imu_dropout=args.imu_dropout, seq_len=args.seq_len,
            fuse_method=args.fuse_method,
            ode_hidden_dim=args.ode_hidden_dim,
            ode_fn_num_layers=args.ode_fn_num_layers,
            ode_activation_fn=args.ode_activation_fn,
            ode_rnn_type=args.ode_rnn_type,
            rnn_num_layers=args.rnn_num_layers,
            rnn_hidden_dim=args.rnn_hidden_dim,
            rnn_dropout_out=args.rnn_dropout_out,
            cde_hidden_dim=args.cde_hidden_dim,
            cde_fn_num_layers=args.cde_fn_num_layers,
            cde_num_layers=args.cde_num_layers,
            cde_activation_fn=args.cde_activation_fn,
            cde_solver=args.cde_solver,
            cde_interpolation=args.cde_interpolation,
            cde_streaming_mode=args.cde_streaming_mode,
            cde_history_cap=args.cde_history_cap,
            rde_streaming_mode=args.rde_streaming_mode,
            rde_history_cap=args.rde_history_cap,
            adjoint=args.adjoint,
            rde_reduced_dim=args.rde_reduced_dim,
            compute_dtype=args.compute_dtype,
            use_pallas=args.use_pallas,
            encoder_int8=args.encoder_int8,
            fast_dropout=not args.exact_dropout,
        ),
        solver=SolverConfig(
            method=args.ode_solver, rtol=args.ode_rtol, atol=args.ode_atol,
            max_steps=args.ode_max_steps,
            max_steps_train=args.ode_max_steps_train,
            adaptive=not args.ode_fixed_step,
            unroll_mode="adjoint" if args.adjoint else "bounded",
            exit_chunk=args.ode_exit_chunk,
        ),
        cde_solver_cfg=SolverConfig(
            method=args.cde_solver, rtol=1e-4, atol=1e-6,
            max_steps=args.cde_max_steps,
            max_steps_train=args.ode_max_steps_train,
        ),
        data=DataConfig(
            data_dir=args.data_dir,
            train_seq=tuple(args.train_seq), val_seq=tuple(args.val_seq),
            seq_len=args.seq_len,
            data_dropout=args.data_dropout,
            data_dropout_std=args.data_dropout_std,
            eval_data_dropout=args.eval_data_dropout,
            hflip=args.hflip, color=args.color, normalize=args.normalize,
            workers=args.workers, shuffle=args.shuffle,
        ),
        train=TrainConfig(
            optimizer=args.optimizer.lower(),
            batch_size=args.batch_size,
            grad_accumulation_steps=args.grad_accumulation_steps,
            weight_decay=args.weight_decay,
            epochs_warmup=args.epochs_warmup,
            epochs_joint=args.epochs_joint,
            epochs_fine=args.epochs_fine,
            lr_warmup=args.lr_warmup, lr_joint=args.lr_joint,
            lr_fine=args.lr_fine, lr_regressor=args.lr_regressor,
            gradient_clip=args.gradient_clip,
            freeze_encoder=args.freeze_encoder,
            frozen_encoder_eval=args.frozen_encoder_eval,
            carry_exposure=args.carry_exposure,
            carry_split=args.carry_split,
            tbptt_chain=args.tbptt_chain,
            seed=args.seed,
            print_frequency=args.print_frequency,
            ckpt_every=args.ckpt_every,
        ),
        mesh=MeshConfig(data_axis=args.mesh_data, model_axis=args.mesh_model),
    )
