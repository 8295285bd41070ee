"""Full-model golden parity: our DeepVIO (ode-rnn core, fixed-step euler)
against a torch replica of the reference architecture, through the full
convert_deepvio path — encoders + BN statistics + soft fusion + shared
ODE-func evolution + stacked RNN + regressor in one closed loop.

The adaptive-solver paths are covered separately (solver unit tests match
torchdiffeq semantics analytically); fixed-step euler makes the torch side
exactly replicable without the reference's solver dependencies.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as tnn  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from ode_vio_tpu.config import Config, DataConfig, ModelConfig, SolverConfig  # noqa: E402
from ode_vio_tpu.models import convert  # noqa: E402
from ode_vio_tpu.models.deepvio import create_model  # noqa: E402
from test_torch_parity import (  # noqa: E402
    TorchImageEncoder,
    TorchInertialEncoder,
    sd_numpy,
)

H, W, VF, IF, L, S, B = 64, 128, 32, 16, 2, 4, 2
FLEN = VF + IF
ODE_HID = 24
SUBSTEPS = 4


class TorchOdeFunc(tnn.Module):
    def __init__(self):
        super().__init__()
        self.net = tnn.Sequential(
            tnn.Linear(FLEN, ODE_HID), tnn.Tanh(),
            tnn.Linear(ODE_HID, ODE_HID), tnn.Tanh(),
            tnn.Linear(ODE_HID, FLEN), tnn.Tanh(),
        )

    def forward(self, y):
        return self.net(y)


class TorchFuse(tnn.Module):
    def __init__(self):
        super().__init__()
        self.net = tnn.Sequential(tnn.Linear(FLEN, FLEN))

    def forward(self, v, i):
        cat = torch.cat([v, i], -1)
        return cat * self.net(cat)


class TorchPoseODERNN(tnn.Module):
    """Reference PoseODERNN semantics with fixed-step euler evolution
    (the `update_method` inference configuration, PoseODERNN.py:77-86)."""

    def __init__(self):
        super().__init__()
        self.ode_func = TorchOdeFunc()
        self.rnn = tnn.RNN(input_size=FLEN, hidden_size=FLEN, num_layers=L,
                           batch_first=True)
        self.fuse = TorchFuse()
        self.regressor = tnn.Sequential(
            tnn.Linear(FLEN, 128), tnn.LeakyReLU(0.1), tnn.Linear(128, 6)
        )

    def evolve(self, h, t0, t1):
        # h (B, F); per-sample euler with SUBSTEPS equal steps
        dt = ((t1 - t0) / SUBSTEPS).unsqueeze(-1)
        for _ in range(SUBSTEPS):
            h = h + dt * self.ode_func(h)
        return h

    def forward(self, fv, fi, ts, hc=None):
        fused = self.fuse(fv, fi)
        Bc, steps, _ = fused.shape
        # streaming parity: carry-in state; ts re-based only on cold start
        # (PoseODERNN.py:97-100)
        h = torch.zeros(L, Bc, FLEN) if hc is None else hc
        ts = ts - ts[:, :1] if hc is None else ts
        outs = []
        for i in range(steps):
            evolved = torch.stack(
                [self.evolve(h[l], ts[:, i], ts[:, i + 1]) for l in range(L)], 0
            )
            out_i, h = self.rnn(fused[:, i : i + 1], evolved)
            outs.append(out_i)
        out = torch.cat(outs, 1)
        return self.regressor(out), h


class TorchDeepVIO(tnn.Module):
    def __init__(self):
        super().__init__()
        self.Image_net = TorchImageEncoder(VF, H, W)
        self.Inertial_net = TorchInertialEncoder(IF)
        self.Pose_net = TorchPoseODERNN()

    def forward(self, img_pairs, imu, ts, hc=None):
        Bc = imu.shape[0]
        fv = self.Image_net(img_pairs).reshape(Bc, -1, VF)
        fi = self.Inertial_net(imu)
        return self.Pose_net(fv, fi, ts, hc=hc)


class TorchPoseODERNNAdaptive(TorchPoseODERNN):
    """Reference PoseODERNN with the actual ADAPTIVE dopri5 evolution
    (torchode semantics via tests/torch_ref.py), including the per-lane
    warm-started controller dt our core carries across frames."""

    RTOL, ATOL, DT0, MAX_STEPS = 1e-3, 1e-6, 1e-4, 64

    def forward(self, fv, fi, ts, hc=None):
        from torch_ref import odeint_dopri5

        fused = self.fuse(fv, fi)
        Bc, steps, _ = fused.shape
        # streaming parity with the parent: carry-in state, re-base on cold
        # start only (PoseODERNN.py:97-100)
        h = torch.zeros(L, Bc, FLEN) if hc is None else hc
        ts = ts - ts[:, :1] if hc is None else ts
        dt = torch.full((L, Bc), self.DT0)
        outs = []
        for i in range(steps):
            evolved = torch.zeros_like(h)
            for l in range(L):
                for b in range(Bc):
                    y, dt_n, _, _ = odeint_dopri5(
                        lambda t, y: self.ode_func(y),
                        h[l, b], float(ts[b, i]), float(ts[b, i + 1]),
                        rtol=self.RTOL, atol=self.ATOL,
                        dt0=float(dt[l, b]), max_steps=self.MAX_STEPS,
                    )
                    evolved[l, b] = y
                    dt[l, b] = dt_n
            out_i, h = self.rnn(fused[:, i : i + 1], evolved)
            outs.append(out_i)
        out = torch.cat(outs, 1)
        return self.regressor(out), h


def test_full_model_parity_adaptive_dopri5():
    """End-to-end parity on the REAL solver configuration: adaptive dopri5
    with warm-started per-lane step sizes, torch reference implementation
    vs our while-loop core through the full converter path."""
    torch.manual_seed(3)
    t_model = TorchDeepVIO()
    t_model.Pose_net = TorchPoseODERNNAdaptive()
    with torch.no_grad():
        t_model.train()
        t_model.Image_net(torch.randn(6, 6, H, W))
        t_model.Inertial_net(torch.randn(3, 10 * (S - 1) + 1, 6))
        t_model.eval()

    rng = np.random.default_rng(3)
    img = rng.random((B, S, H, W, 3), np.float32).astype(np.float32) - 0.5
    imu = rng.standard_normal((B, 10 * (S - 1) + 1, 6)).astype(np.float32)
    ts = np.cumsum(rng.random((B, S)).astype(np.float32) * 0.1 + 0.05, 1)

    pairs = np.concatenate([img[:, :-1], img[:, 1:]], -1)
    pairs_t = torch.from_numpy(
        pairs.reshape(-1, H, W, 6).transpose(0, 3, 1, 2).copy()
    )
    with torch.no_grad():
        t_poses, t_h = t_model(pairs_t, torch.from_numpy(imu),
                               torch.from_numpy(ts))

    variables = convert.convert_deepvio(
        sd_numpy(t_model), "ode-rnn", rnn_num_layers=L,
        conv_out_hw=(H // 64, W // 64),
    )
    A = TorchPoseODERNNAdaptive
    cfg = Config(
        model=ModelConfig(
            model_type="ode-rnn", img_w=W, img_h=H, seq_len=S,
            v_f_len=VF, i_f_len=IF, ode_hidden_dim=ODE_HID,
            ode_fn_num_layers=2, ode_activation_fn="tanh",
            ode_rnn_type="rnn", rnn_num_layers=L, fuse_method="soft",
            compute_dtype="float32",
        ),
        solver=SolverConfig(method="dopri5", rtol=A.RTOL, atol=A.ATOL,
                            dt0=A.DT0, max_steps=A.MAX_STEPS),
        data=DataConfig(seq_len=S),
    )
    model = create_model(cfg)
    j_poses, j_h = model.apply(
        variables, jnp.asarray(img), jnp.asarray(imu), jnp.asarray(ts),
        train=False, rngs={"gumbel": jax.random.PRNGKey(0)},
    )

    np.testing.assert_allclose(np.asarray(j_poses), t_poses.numpy(), atol=2e-3)
    np.testing.assert_allclose(np.asarray(j_h), t_h.numpy(), atol=2e-3)


def test_full_model_parity():
    torch.manual_seed(0)
    t_model = TorchDeepVIO()
    # warm BN running statistics, then freeze into eval mode
    with torch.no_grad():
        t_model.train()
        t_model.Image_net(torch.randn(6, 6, H, W))
        t_model.Inertial_net(torch.randn(3, 10 * (S - 1) + 1, 6))
        t_model.eval()

    rng = np.random.default_rng(0)
    img = rng.random((B, S, H, W, 3), np.float32).astype(np.float32) - 0.5
    imu = rng.standard_normal((B, 10 * (S - 1) + 1, 6)).astype(np.float32)
    ts = np.cumsum(rng.random((B, S)).astype(np.float32) * 0.1 + 0.05, 1)

    pairs = np.concatenate([img[:, :-1], img[:, 1:]], -1)
    pairs_t = torch.from_numpy(
        pairs.reshape(-1, H, W, 6).transpose(0, 3, 1, 2).copy()
    )
    with torch.no_grad():
        t_poses, t_h = t_model(pairs_t, torch.from_numpy(imu),
                               torch.from_numpy(ts))

    variables = convert.convert_deepvio(
        sd_numpy(t_model), "ode-rnn", rnn_num_layers=L,
        conv_out_hw=(H // 64, W // 64),
    )
    cfg = Config(
        model=ModelConfig(
            model_type="ode-rnn", img_w=W, img_h=H, seq_len=S,
            v_f_len=VF, i_f_len=IF, ode_hidden_dim=ODE_HID,
            ode_fn_num_layers=2, ode_activation_fn="tanh",
            ode_rnn_type="rnn", rnn_num_layers=L, fuse_method="soft",
            compute_dtype="float32",
        ),
        solver=SolverConfig(method="euler", adaptive=False,
                            fixed_steps=SUBSTEPS),
        data=DataConfig(seq_len=S),
    )
    model = create_model(cfg)
    j_poses, j_h = model.apply(
        variables, jnp.asarray(img), jnp.asarray(imu), jnp.asarray(ts),
        train=False, rngs={"gumbel": jax.random.PRNGKey(0)},
    )

    np.testing.assert_allclose(
        np.asarray(j_poses), t_poses.numpy(), atol=2e-3
    )
    np.testing.assert_allclose(np.asarray(j_h), t_h.numpy(), atol=2e-3)
