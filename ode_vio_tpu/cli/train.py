"""Training entry point: ``python -m ode_vio_tpu.cli.train --data_dir ...``

Epoch driver parity with /root/reference/scripts/train_model.py:163-249:
fresh dropout-resampled loader per epoch, 3-phase LR, per-epoch KITTI eval
with best-checkpoint tracking, checkpoints every 2 epochs, optional wandb.
TPU-native: jitted sharded train step (training/loop.py), device mesh,
Orbax checkpoints carrying optimizer state + epoch + PRNG key.
"""

from __future__ import annotations

import re
import time

import jax
import jax.numpy as jnp
import numpy as np

from ode_vio_tpu.cli.flags import build_parser, config_from_args
from ode_vio_tpu.config import Config
from ode_vio_tpu.data.evaluation import KittiEvaluator
from ode_vio_tpu.data.kitti import BoundarySafeBatchSampler, KittiDataset
from ode_vio_tpu.data.transforms import get_transforms
from ode_vio_tpu.models.deepvio import count_parameters, init_model
from ode_vio_tpu.parallel import create_mesh, shard_batch
from ode_vio_tpu.training.checkpoint import CheckpointManager
from ode_vio_tpu.training.loop import (
    create_train_state,
    lr_for_epoch,
    make_infer_fn,
    make_optimizer,
    make_streaming_train_step,
    make_train_step,
    set_learning_rate,
)
from ode_vio_tpu.utils.logging_utils import setup_experiment_directories, setup_logger


def get_train_loader(cfg: Config, epoch: int, logger):
    """Fresh dataset per epoch with a dropout ratio resampled from
    N(data_dropout, data_dropout_std) (train_model.py:122-151, 210),
    served by the native async prefetching pipeline."""
    from ode_vio_tpu.data.loader import PrefetchingLoader

    rng = np.random.default_rng(cfg.train.seed * 100003 + epoch)
    ratio = float(
        np.clip(rng.normal(cfg.data.data_dropout, cfg.data.data_dropout_std), 0, 0.9)
    )
    logger.info("epoch %d dropout ratio: %.4f", epoch, ratio)
    # decode happens natively at target resolution; the transform pipeline
    # carries only the augmentations
    aug = get_transforms(
        (cfg.model.img_h, cfg.model.img_w),
        hflip=cfg.data.hflip, color=cfg.data.color,
        normalize=cfg.data.normalize, rng=rng, base=False,
    )
    ds = KittiDataset(
        cfg.data.data_dir, cfg.data.seq_len, cfg.data.train_seq,
        transform=None, dropout=ratio, rng=rng,
    )
    if cfg.train.tbptt_chain:
        # full-sequence TBPTT: sequence-ordered boundary-sharing windows
        # in synchronized chains (training/loop.py::
        # make_streaming_train_step); the epoch loop resets the carried
        # state every tbptt_chain steps
        from ode_vio_tpu.data.kitti import StreamingChainSampler

        sampler = StreamingChainSampler(
            ds.seq_num_windows, cfg.train.batch_size,
            cfg.train.tbptt_chain, stride=cfg.data.seq_len - 1,
            shuffle=cfg.data.shuffle, seed=cfg.train.seed + epoch,
        )
    else:
        sampler = BoundarySafeBatchSampler(
            len(ds), cfg.train.batch_size, shuffle=cfg.data.shuffle,
            seed=cfg.train.seed + epoch, drop_last=True,
        )
    return PrefetchingLoader(
        ds, sampler, (cfg.model.img_h, cfg.model.img_w), transform=aug,
        decode_threads=max(1, cfg.data.workers),
    )


def train_epoch(cfg, loader, train_step, state, mesh, logger, epoch,
                profile_dir=None):
    losses = []
    profiling = False
    chain = cfg.train.tbptt_chain
    hc = None
    for it, (imgs, imus, gts, ts) in enumerate(loader):
        if profile_dir and epoch == 0 and it == 1:  # skip the compile step
            jax.profiler.start_trace(profile_dir)
            profiling = True
        batch = shard_batch(
            mesh, (jnp.asarray(imgs), jnp.asarray(imus),
                   jnp.asarray(gts), jnp.asarray(ts))
        )
        if chain:
            # streaming TBPTT: carry hidden state along the chain, reset
            # at the sampler's synchronized chain boundaries
            if it % chain == 0:
                hc = None
            state, metrics, hc = train_step(state, *batch, hc)
        else:
            state, metrics = train_step(state, *batch)
        losses.append(metrics["loss"])
        if profiling and it >= 4:
            jax.block_until_ready(metrics["loss"])
            jax.profiler.stop_trace()
            profiling = False
            logger.info("profiler trace written to %s", profile_dir)
        if (it + 1) % cfg.train.print_frequency == 0:
            m = {k: float(v) for k, v in metrics.items()}
            logger.info(
                "epoch %d iter %d/%d loss %.6f angle %.6f trans %.6f",
                epoch, it + 1, len(loader), m["loss"],
                m["angle_loss"], m["trans_loss"],
            )
            if m.get("solver_incomplete", 0) > 0:
                logger.warning(
                    "epoch %d iter %d: %d ODE solves hit the step budget "
                    "before t1 (truncated integral; raise max_steps_train "
                    "or loosen tolerances)",
                    epoch, it + 1, int(m["solver_incomplete"]),
                )
    if profiling:  # short epoch: close the trace cleanly
        jax.profiler.stop_trace()
    return state, float(np.mean([float(l) for l in losses])) if losses else 0.0


def _exposure_step(fresh_step, carried_step, cfg: Config, epoch: int):
    """Per-epoch Bernoulli dispatch between the fresh and the carried
    (TBPTT-split) train step. The rng is derived from (seed, epoch) — the
    same reconstructible-state rule as the loader rng in
    ``get_train_loader`` — so a run resumed at epoch E makes exactly the
    draws the uninterrupted run would have made at epoch E, preserving the
    repo's split-run bitwise determinism (tests/test_cli.py)."""
    rng = np.random.default_rng(cfg.train.seed * 100003 + epoch + 0xCA44)

    def step(state, *batch):
        if rng.random() < cfg.train.carry_exposure:
            return carried_step(state, *batch)
        return fresh_step(state, *batch)

    return step


def _warm_start_epoch(pretrain) -> int:
    """Epoch to resume at when warm-starting from a reference-layout
    checkpoint file. Upstream parses EXACTLY three trailing digits
    (train_model.py:175-177: ``int(pretrain[-7:-4])``; its epoch
    checkpoints are named ``001.pth``…); anything else — e.g. the
    published ``ode-vio-v1.pth``, whose v1 is a version, not an epoch —
    warm-starts from epoch 0."""
    m = re.search(r"(?<![0-9])(\d{3})\.(?:pth|tar|pt|npz)$", str(pretrain))
    return int(m.group(1)) + 1 if m else 0


def main(argv=None):
    args = build_parser().parse_args(argv)
    cfg = config_from_args(args)
    dirs = setup_experiment_directories(cfg.save_dir, cfg.experiment_name)
    logger = setup_logger(f"train_{cfg.experiment_name}", dirs["logs"])
    logger.info("config: %s", cfg)

    from ode_vio_tpu.parallel.mesh import auto_data_axis

    dp = cfg.mesh.data_axis
    if dp == -1:
        dp = auto_data_axis(cfg.train.batch_size, cfg.mesh.model_axis)
    n_used = dp * cfg.mesh.model_axis
    mesh = create_mesh(dp, cfg.mesh.model_axis,
                       devices=jax.devices()[:n_used])
    logger.info("mesh: %s (of %d devices)", mesh.shape, len(jax.devices()))

    model, variables = init_model(cfg, jax.random.PRNGKey(cfg.train.seed))
    logger.info("total parameters: %d", count_parameters(variables))

    if cfg.pretrain_flownet:
        from ode_vio_tpu.models.convert import (
            convert_image_encoder,
            load_torch_checkpoint,
        )

        sd = load_torch_checkpoint(cfg.pretrain_flownet)
        conv_hw = (cfg.model.img_h // 64, cfg.model.img_w // 64)
        p, s = convert_image_encoder(sd, conv_out_hw=conv_hw)
        enc = dict(variables["params"]["image_encoder"])
        enc_stats = dict(variables["batch_stats"]["image_encoder"])
        for k, v in p.items():
            enc[k] = jax.tree_util.tree_map(
                lambda new, old: jnp.asarray(new, old.dtype), v, enc.get(k, v)
            )
        for k, v in s.items():
            enc_stats[k] = {
                kk: jnp.asarray(vv) for kk, vv in {**enc_stats.get(k, {}), **v}.items()
            }
        variables = {
            "params": {**variables["params"], "image_encoder": enc},
            "batch_stats": {**variables["batch_stats"], "image_encoder": enc_stats},
        }
        logger.info("pretrained FlowNet-S loaded from %s", cfg.pretrain_flownet)

    init_epoch = 0
    best = float("inf")
    converted = None
    if cfg.pretrain:
        from ode_vio_tpu.models.convert import maybe_load_reference

        # a reference-layout .pth file warm-starts the weights (upstream
        # --pretrain semantics; fresh optimizer state — upstream never
        # checkpoints Adam moments either)
        converted = maybe_load_reference(cfg.pretrain, cfg.model, variables)
        if converted is not None:
            variables = converted
            init_epoch = _warm_start_epoch(cfg.pretrain)
            logger.info("warm-started from reference checkpoint %s "
                        "(epoch %d)", cfg.pretrain, init_epoch)

    tx = make_optimizer(cfg)
    state = create_train_state(cfg, variables, tx, jax.random.PRNGKey(cfg.train.seed + 1))
    ckpt = CheckpointManager(dirs["checkpoints"])

    if cfg.pretrain and converted is None:
        resume = CheckpointManager(cfg.pretrain)
        latest = resume.latest_epoch()
        if latest is not None:
            state = resume.restore(resume.epoch_name(latest), state)
            init_epoch = latest + 1
            # carry the best-so-far across the resume so a resumed run
            # cannot overwrite a better earlier best checkpoint
            meta = resume.metadata(resume.epoch_name(latest)) or {}
            best = float(meta.get("best_t_rel", best))
            logger.info("resumed from %s epoch %d (best t_rel %.4f)",
                        cfg.pretrain, latest, best)

    # replicate the train state over the mesh so a restored (host-resident)
    # checkpoint and a fresh init behave identically under the sharded step
    from ode_vio_tpu.parallel.mesh import replicated

    state = jax.device_put(state, replicated(mesh))

    if cfg.train.tbptt_chain:
        train_step = make_streaming_train_step(model, tx, cfg)
        if cfg.data.hflip or cfg.data.color:
            logger.warning(
                "tbptt_chain=%d with per-window random augmentations "
                "(--hflip/--color): augmentation draws are independent "
                "per window, so a chain's carried state crosses "
                "inconsistently-augmented windows", cfg.train.tbptt_chain,
            )
    else:
        train_step = make_train_step(model, tx, cfg)
    carried_step = None
    if cfg.train.carry_exposure > 0.0:
        # carried-state exposure: with probability carry_exposure a step
        # trains the TBPTT-split window (fresh segment -> stop-grad carry
        # -> carried segment), so the pose core sees the carried-state
        # distribution streaming eval feeds it (TrainConfig.carry_exposure).
        # The Bernoulli dispatch is reseeded per epoch from (seed, epoch)
        # inside the epoch loop — see _exposure_step — so a resumed run
        # replays exactly the draws it would have made (the same
        # reconstructible-state rule as get_train_loader's loader rng).
        carried_step = make_train_step(model, tx, cfg, carry=True)
        if (cfg.model.model_type in ("cde", "rde")
                and getattr(cfg.model, f"{cfg.model.model_type}"
                            "_streaming_mode") != "carry"):
            logger.warning(
                "carry_exposure=%.2f targets 'carry'-mode streaming eval "
                "(the carried regime seeds segment 2 with the previous "
                "segment's final latent, exactly what "
                "--%s_streaming_mode=carry feeds the core at eval); with "
                "streaming mode %r the exposed distribution does not match "
                "eval's", cfg.train.carry_exposure, cfg.model.model_type,
                getattr(cfg.model, f"{cfg.model.model_type}_streaming_mode"),
            )

    # one compiled eval executable for the whole run: per-epoch weights are
    # swapped in with set_variables (jit arguments, no re-trace), with the
    # frozen BN statistics folded into the conv weights for the eval pass
    infer = make_infer_fn(
        model, {"params": state.params, "batch_stats": state.batch_stats},
        fold_bn=True,
    )

    wandb_run = None
    if cfg.wandb:
        try:
            import wandb

            # group/id/resume parity with train_model.py:237-248: an
            # explicit id resumes that run ("must"); otherwise a fresh id
            run_id = getattr(args, "wandb_id", None)
            resume_mode = "must" if run_id else "allow"
            if run_id is None:
                run_id = wandb.util.generate_id()
            logger.info("wandb run id: %s", run_id)
            wandb_run = wandb.init(
                project="ode-vio-tpu",
                group=getattr(args, "wandb_group", None),
                id=run_id,
                resume=resume_mode,
                name=cfg.experiment_name,
                config=vars(args),
            )
        except Exception as e:  # wandb not installed / offline
            logger.warning("wandb unavailable (%s); continuing without", e)

    for epoch in range(init_epoch, cfg.train.total_epochs):
        lr = lr_for_epoch(cfg, epoch)
        state = state.replace(opt_state=set_learning_rate(state.opt_state, lr))
        logger.info("epoch %d lr %g", epoch, lr)

        loader = get_train_loader(cfg, epoch, logger)
        step = train_step if carried_step is None else _exposure_step(
            train_step, carried_step, cfg, epoch
        )
        t0 = time.time()
        state, avg_loss = train_epoch(
            cfg, loader, step, state, mesh, logger, epoch,
            profile_dir=getattr(args, "profile_dir", None),
        )
        logger.info("epoch %d done: loss %.6f (%.1fs)", epoch, avg_loss,
                    time.time() - t0)

        if epoch % cfg.train.ckpt_every == 0:
            ckpt.save(ckpt.epoch_name(epoch), jax.device_get(state),
                      {"epoch": epoch, "best_t_rel": best})

        # per-epoch KITTI eval (train_model.py:98-119)
        evaluator = KittiEvaluator(
            cfg.data.data_dir, cfg.data.val_seq, cfg.data.seq_len,
            (cfg.model.img_h, cfg.model.img_w), cfg.data.eval_data_dropout,
            rng=np.random.default_rng(cfg.train.seed + 7919 + epoch),
        )
        infer.set_variables(
            {"params": state.params, "batch_stats": state.batch_stats}
        )
        errors = evaluator.eval(infer)
        t_rel = float(np.mean([e["t_rel"] for e in errors]))
        r_rel = float(np.mean([e["r_rel"] for e in errors]))
        logger.info("epoch %d eval: t_rel %.4f r_rel %.4f", epoch, t_rel, r_rel)
        if infer.incomplete() > 0:
            logger.warning(
                "epoch %d eval: %d ODE solves hit the step budget before "
                "t1 (truncated; raise ode_max_steps)",
                epoch, infer.incomplete(),
            )
        evaluator.generate_plots(dirs["graphs"], tag=f"_{epoch}")
        if t_rel < best:
            best = t_rel
            ckpt.save(f"best_{best:.2f}", jax.device_get(state),
                      {"epoch": epoch, "t_rel": best})
        if wandb_run is not None:
            wandb_run.log({"t_rel": t_rel, "r_rel": r_rel,
                           "best_t_rel": best, "avg_pose_loss": avg_loss})

    logger.info("training finished, best t_rel %.4f", best)


if __name__ == "__main__":
    main()
