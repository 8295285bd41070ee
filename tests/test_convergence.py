"""Learning smoke: a short synthetic training run must reduce both the
training loss and the full streaming-eval pose RMSE versus the untrained
model — exercising the entire train->checkpoint->eval loop end to end."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ode_vio_tpu.config import Config, DataConfig, ModelConfig, SolverConfig, TrainConfig
from ode_vio_tpu.data.evaluation import KittiEvaluator
from ode_vio_tpu.data.kitti import BoundarySafeBatchSampler, KittiDataset, collate
from ode_vio_tpu.data.synthetic import make_kitti_tree
from ode_vio_tpu.data.transforms import Center, Compose
from ode_vio_tpu.models.deepvio import init_model
from ode_vio_tpu.training.loop import (
    create_train_state,
    make_infer_fn,
    make_optimizer,
    make_train_step,
    set_learning_rate,
)


@pytest.mark.slow
def test_training_improves_eval_rmse(tmp_path_factory):
    root = make_kitti_tree(tmp_path_factory.mktemp("kitti_cv"),
                           seqs=("00", "05"), n_frames=40, img_hw=(32, 64))
    cfg = Config(
        model=ModelConfig(model_type="ode-rnn", img_w=64, img_h=32, seq_len=4,
                          v_f_len=32, i_f_len=16, ode_hidden_dim=16,
                          rnn_num_layers=2, compute_dtype="float32"),
        solver=SolverConfig(max_steps=8, max_steps_train=8, dt0=1e-2),
        train=TrainConfig(batch_size=8, lr_warmup=3e-4),
        data=DataConfig(seq_len=4),
    )
    model, variables = init_model(cfg, jax.random.PRNGKey(0))

    def eval_rmse(vars_):
        ev = KittiEvaluator(root, val_seqs=("05",), seq_len=4,
                            img_hw=(32, 64))
        res = ev.eval(make_infer_fn(model, vars_))
        return res[0]["t_rmse"] + res[0]["r_rmse"]

    before = eval_rmse(variables)

    ds = KittiDataset(root, 4, ["00"], transform=Compose([Center()]))
    tx = make_optimizer(cfg)
    state = create_train_state(cfg, variables, tx, jax.random.PRNGKey(1))
    state = state.replace(
        opt_state=set_learning_rate(state.opt_state, cfg.train.lr_warmup)
    )
    step = make_train_step(model, tx, cfg)
    losses = []
    for epoch in range(4):
        sampler = BoundarySafeBatchSampler(len(ds), 8, seed=epoch,
                                           drop_last=True)
        for idx in sampler:
            b = collate([ds[i] for i in idx])
            state, m = step(state, *map(jnp.asarray, b))
            losses.append(float(m["loss"]))

    after = eval_rmse(
        {"params": state.params, "batch_stats": state.batch_stats}
    )
    assert losses[-1] < losses[0] * 0.8, (losses[0], losses[-1])
    assert after < before, (before, after)
    assert np.isfinite(after)


@pytest.mark.slow
def test_odometric_fixture_learns_odometry(tmp_path_factory):
    """On the odometry-CONSISTENT fixture (IMU determines the relative
    pose; data/synthetic.py::make_imu_odometric) training must drive the
    streaming-eval pose RMSE far below the untrained model — evidence the
    framework learns actual odometry end to end, not just the mean step."""
    root = make_kitti_tree(
        tmp_path_factory.mktemp("kitti_odo"), seqs=("00", "05"),
        n_frames=80, img_hw=(32, 64), imu_mode="odometric", seed=3,
    )
    cfg = Config(
        model=ModelConfig(model_type="ode-rnn", img_w=64, img_h=32, seq_len=4,
                          v_f_len=32, i_f_len=16, ode_hidden_dim=16,
                          rnn_num_layers=2, compute_dtype="float32"),
        solver=SolverConfig(max_steps=8, max_steps_train=8, dt0=1e-2),
        train=TrainConfig(batch_size=8, lr_warmup=1e-3),
        data=DataConfig(seq_len=4),
    )
    model, variables = init_model(cfg, jax.random.PRNGKey(0))

    def eval_rmse(vars_):
        ev = KittiEvaluator(root, val_seqs=("05",), seq_len=4,
                            img_hw=(32, 64))
        res = ev.eval(make_infer_fn(model, vars_))
        return res[0]["t_rmse"] + res[0]["r_rmse"]

    before = eval_rmse(variables)

    ds = KittiDataset(root, 4, ["00"], transform=Compose([Center()]))
    tx = make_optimizer(cfg)
    state = create_train_state(cfg, variables, tx, jax.random.PRNGKey(1))
    state = state.replace(
        opt_state=set_learning_rate(state.opt_state, cfg.train.lr_warmup)
    )
    step = make_train_step(model, tx, cfg)
    for epoch in range(10):
        sampler = BoundarySafeBatchSampler(len(ds), 8, seed=epoch,
                                           drop_last=True)
        for idx in sampler:
            b = collate([ds[i] for i in idx])
            state, m = step(state, *map(jnp.asarray, b))

    after = eval_rmse(
        {"params": state.params, "batch_stats": state.batch_stats}
    )
    assert np.isfinite(after)
    assert after < 0.5 * before, (before, after)
