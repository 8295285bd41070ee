"""Evaluation entry point: ``python -m ode_vio_tpu.cli.test --pretrain ...``

Protocol parity with /root/reference/scripts/test_model.py:91-153: repeats
the full streaming KITTI evaluation ``--run_times`` times (re-rolling the
stochastic eval frame-dropout each repeat) and writes per-sequence
mean +/- std to ``summary.txt``, plus trajectory plots and KITTI-format
pose dumps.
"""

from __future__ import annotations

import numpy as np
import jax

from ode_vio_tpu.cli.flags import build_parser, config_from_args
from ode_vio_tpu.data.evaluation import KittiEvaluator, summarize_runs
from ode_vio_tpu.models.deepvio import init_model
from ode_vio_tpu.training.checkpoint import CheckpointManager
from ode_vio_tpu.training.loop import make_infer_fn
from ode_vio_tpu.utils.logging_utils import (
    setup_experiment_directories,
    setup_logger,
)


def main(argv=None):
    args = build_parser().parse_args(argv)
    cfg = config_from_args(args)
    dirs = setup_experiment_directories(cfg.save_dir, cfg.experiment_name + "_test")
    logger = setup_logger(f"test_{cfg.experiment_name}", dirs["logs"])

    model, variables = init_model(cfg, jax.random.PRNGKey(cfg.train.seed))
    converted = None
    if cfg.pretrain:
        from ode_vio_tpu.models.convert import maybe_load_reference

        # a reference-layout .pth/.tar/.npz file converts in place, so the
        # upstream pretrained weights load with the upstream flag
        converted = maybe_load_reference(cfg.pretrain, cfg.model, variables)
    if converted is not None:
        variables = converted
        logger.info("converted reference checkpoint %s", cfg.pretrain)
    elif cfg.pretrain:
        from ode_vio_tpu.training.loop import create_train_state, make_optimizer

        ckpt = CheckpointManager(cfg.pretrain)
        latest = ckpt.latest_epoch()
        name = ckpt.epoch_name(latest) if latest is not None else "best"
        # checkpoints hold the full TrainState; rebuild its structure
        tx = make_optimizer(cfg)
        target = jax.device_get(
            create_train_state(cfg, variables, tx,
                               jax.random.PRNGKey(cfg.train.seed + 1))
        )
        state = ckpt.restore(name, target)
        variables = {"params": state.params, "batch_stats": state.batch_stats}
        logger.info("loaded checkpoint %s/%s", cfg.pretrain, name)
    else:
        logger.warning("no --pretrain given: evaluating random init")

    # BN statistics are frozen at eval: fold them into the conv weights
    # (exact; models/fold.py) unless explicitly disabled
    infer = make_infer_fn(model, variables,
                          fold_bn=not getattr(args, "no_fold_bn", False))

    def make_evaluator(run: int) -> KittiEvaluator:
        return KittiEvaluator(
            cfg.data.data_dir, cfg.data.val_seq, cfg.data.seq_len,
            (cfg.model.img_h, cfg.model.img_w), cfg.data.eval_data_dropout,
            rng=np.random.default_rng(cfg.train.seed + run),
        )

    eval_dp = getattr(args, "eval_dp", 1)
    if eval_dp == -1:
        eval_dp = len(jax.devices())
    if getattr(args, "batch_runs", False) or eval_dp > 1:
        # every (run, sequence) pair is one lane of a single compiled
        # streaming eval, optionally sharded over a 1-D data mesh
        from ode_vio_tpu.data.evaluation import eval_runs

        sharding = None
        if eval_dp > 1:
            from ode_vio_tpu.parallel.mesh import batch_sharding, create_mesh

            mesh = create_mesh(data=eval_dp, model=1,
                               devices=jax.devices()[:eval_dp])
            sharding = batch_sharding(mesh)
        evaluators = [make_evaluator(run) for run in range(cfg.run_times)]
        all_runs = eval_runs(infer, evaluators, sharding=sharding,
                             pad_to=eval_dp if eval_dp > 1 else None)
        for run, errors in enumerate(all_runs):
            logger.info("run %d: %s", run, errors)
        evaluators[0].generate_plots(dirs["graphs"])
        evaluators[0].save_text(dirs["poses"])
    else:
        all_runs = []
        for run in range(cfg.run_times):
            evaluator = make_evaluator(run)
            errors = evaluator.eval(infer)
            all_runs.append(errors)
            logger.info("run %d: %s", run, errors)
            if run == 0:
                evaluator.generate_plots(dirs["graphs"])
                evaluator.save_text(dirs["poses"])

    if infer.incomplete() > 0:
        logger.warning(
            "%d ODE solves hit the step budget before t1 across all runs "
            "(truncated; raise ode_max_steps)", infer.incomplete(),
        )
    summary = summarize_runs(all_runs, cfg.data.val_seq)
    (dirs["base"] / "summary.txt").write_text(summary + "\n")
    logger.info("summary:\n%s", summary)


if __name__ == "__main__":
    main()
