"""Golden-value parity against torch (CPU) for every converted component:
recurrent cells, conv blocks, full encoders, vector-field MLPs, fusion and
regressor heads. These pin down the silent-drift risks listed in
SURVEY.md section 7 hard-part 4 (BN statistics, padding conventions,
gate ordering, flatten order)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as tnn  # noqa: E402

from ode_vio_tpu.config import ModelConfig  # noqa: E402
from ode_vio_tpu.models import convert  # noqa: E402
from ode_vio_tpu.models.encoders import ImageEncoder, InertialEncoder  # noqa: E402
from ode_vio_tpu.ops.mlp import apply_mlp  # noqa: E402
from ode_vio_tpu.ops.rnn_cells import step_stack  # noqa: E402

ATOL = 2e-4


def sd_numpy(module):
    return {k: v.detach().numpy() for k, v in module.state_dict().items()}


class TestRecurrentCells:
    @pytest.mark.parametrize("cell", ["rnn", "gru"])
    def test_stack_matches_torch(self, cell):
        torch.manual_seed(0)
        B, F, L, T = 3, 10, 2, 4
        t_rnn = (tnn.RNN if cell == "rnn" else tnn.GRU)(
            input_size=F, hidden_size=F, num_layers=L, batch_first=True
        )
        params = convert.convert_rnn_stack(sd_numpy(t_rnn), "", L)

        x = np.random.default_rng(0).standard_normal((B, T, F)).astype(np.float32)
        h0 = np.random.default_rng(1).standard_normal((L, B, F)).astype(np.float32)
        with torch.no_grad():
            t_out, t_h = t_rnn(torch.from_numpy(x), torch.from_numpy(h0))

        h = jnp.asarray(h0)
        outs = []
        for k in range(T):
            out, h = step_stack(cell, params, jnp.asarray(x[:, k]), h)
            outs.append(out)
        j_out = np.stack([np.asarray(o) for o in outs], 1)
        np.testing.assert_allclose(j_out, t_out.numpy(), atol=ATOL)
        np.testing.assert_allclose(np.asarray(h), t_h.numpy(), atol=ATOL)


class TestMLPs:
    def test_ode_func_mlp(self):
        torch.manual_seed(1)
        layers = [tnn.Linear(8, 16), tnn.Tanh(), tnn.Linear(16, 16),
                  tnn.Tanh(), tnn.Linear(16, 8), tnn.Tanh()]
        net = tnn.Sequential(*layers)
        params = convert.convert_mlp(sd_numpy(net), "")
        x = np.random.default_rng(2).standard_normal((5, 8)).astype(np.float32)
        with torch.no_grad():
            expected = net(torch.from_numpy(x)).numpy()
        got = np.asarray(apply_mlp(params, jnp.asarray(x), "tanh"))
        np.testing.assert_allclose(got, expected, atol=ATOL)


def _torch_conv_block(cin, cout, k, s):
    return tnn.Sequential(
        tnn.Conv2d(cin, cout, k, s, padding=(k - 1) // 2, bias=False),
        tnn.BatchNorm2d(cout),
        tnn.LeakyReLU(0.1),
    )


class TorchImageEncoder(tnn.Module):
    """Test-local torch replica of the reference FlowNet-S trunk layout
    (Encoder.py:82-95), for converter golden tests."""

    def __init__(self, v_f_len, h, w):
        super().__init__()
        spec = [(6, 64, 7, 2), (64, 128, 5, 2), (128, 256, 5, 2),
                (256, 256, 3, 1), (256, 512, 3, 2), (512, 512, 3, 1),
                (512, 512, 3, 2), (512, 512, 3, 1), (512, 1024, 3, 2)]
        names = ["conv1", "conv2", "conv3", "conv3_1", "conv4", "conv4_1",
                 "conv5", "conv5_1", "conv6"]
        for n, (ci, co, k, s) in zip(names, spec):
            setattr(self, n, _torch_conv_block(ci, co, k, s))
        feat = 1024 * (h // 64) * (w // 64)
        self.visual_head = tnn.Linear(feat, v_f_len)

    def forward(self, x):  # x (N, 6, H, W)
        for n in ["conv1", "conv2", "conv3", "conv3_1", "conv4", "conv4_1",
                  "conv5", "conv5_1", "conv6"]:
            x = getattr(self, n)(x)
        return self.visual_head(x.flatten(1))


class TestImageEncoderParity:
    def test_eval_mode_matches(self):
        torch.manual_seed(2)
        H, W, VF = 64, 128, 32
        t_enc = TorchImageEncoder(VF, H, W).eval()
        # non-trivial running stats
        with torch.no_grad():
            t_enc.train()
            t_enc(torch.randn(4, 6, H, W))
            t_enc.eval()

        params, stats = convert.convert_image_encoder(
            sd_numpy(t_enc), conv_out_hw=(H // 64, W // 64)
        )
        cfg = ModelConfig(img_w=W, img_h=H, v_f_len=VF,
                          compute_dtype="float32")
        enc = ImageEncoder(cfg)

        rng = np.random.default_rng(3)
        img = rng.random((2, 3, H, W, 3), np.float32) - 0.5  # B=2, S=3
        variables = {"params": params, "batch_stats": stats}
        got = np.asarray(enc.apply(variables, jnp.asarray(img), train=False))

        # torch path: stack pairs channelwise, NCHW
        pairs = np.concatenate([img[:, :-1], img[:, 1:]], -1)  # (2,2,H,W,6)
        x = torch.from_numpy(
            pairs.reshape(-1, H, W, 6).transpose(0, 3, 1, 2).copy()
        )
        with torch.no_grad():
            expected = t_enc(x).numpy().reshape(2, 2, VF)
        np.testing.assert_allclose(got, expected, atol=5e-4)


class TorchInertialEncoder(tnn.Module):
    """Test-local torch replica of the reference IMU encoder layout
    (Encoder.py:39-58)."""

    def __init__(self, i_f_len):
        super().__init__()
        self.encoder_conv = tnn.Sequential(
            tnn.Conv1d(6, 64, 3, padding=1), tnn.BatchNorm1d(64),
            tnn.LeakyReLU(0.1), tnn.Dropout(0),
            tnn.Conv1d(64, 128, 3, padding=1), tnn.BatchNorm1d(128),
            tnn.LeakyReLU(0.1), tnn.Dropout(0),
            tnn.Conv1d(128, 256, 3, padding=1), tnn.BatchNorm1d(256),
            tnn.LeakyReLU(0.1), tnn.Dropout(0),
        )
        self.proj = tnn.Linear(256 * 11, i_f_len)

    def forward(self, imu):  # (B, 10*(S-1)+1, 6)
        B, N, _ = imu.shape
        n = (N - 1) // 10
        wins = torch.cat(
            [imu[:, i * 10 : i * 10 + 11].unsqueeze(1) for i in range(n)], 1
        )
        x = wins.reshape(B * n, 11, 6).permute(0, 2, 1)
        x = self.encoder_conv(x)
        return self.proj(x.reshape(x.shape[0], -1)).reshape(B, n, -1)


class TestInertialEncoderParity:
    def test_eval_mode_matches(self):
        torch.manual_seed(3)
        t_enc = TorchInertialEncoder(16).eval()

        params, stats = convert.convert_inertial_encoder(sd_numpy(t_enc))

        cfg = ModelConfig(i_f_len=16, compute_dtype="float32")
        enc = InertialEncoder(cfg)
        rng = np.random.default_rng(4)
        imu = rng.standard_normal((2, 21, 6)).astype(np.float32)  # S=3
        got = np.asarray(
            enc.apply({"params": params, "batch_stats": stats},
                      jnp.asarray(imu), train=False)
        )
        with torch.no_grad():
            expected = t_enc(torch.from_numpy(imu)).numpy()
        np.testing.assert_allclose(got, expected, atol=ATOL)


class TestHeads:
    def test_regressor_conversion(self):
        torch.manual_seed(4)
        # hidden width 128 matches PoseRegressor (PoseODERNN.py:64-68)
        head = tnn.Sequential(tnn.Linear(12, 128), tnn.LeakyReLU(0.1),
                              tnn.Linear(128, 6))
        params = convert.convert_regressor(sd_numpy(head), "")
        from ode_vio_tpu.models.common import PoseRegressor

        x = np.random.default_rng(5).standard_normal((3, 12)).astype(np.float32)
        got = np.asarray(PoseRegressor().apply({"params": params}, jnp.asarray(x)))
        with torch.no_grad():
            expected = head(torch.from_numpy(x)).numpy()
        np.testing.assert_allclose(got, expected, atol=ATOL)
