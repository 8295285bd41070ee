"""Golden checkpoint-conversion parity for the cde / rde / cfc / ltc pose
cores (completing the 6/6 family coverage; ode-rnn and rnn are covered by
tests/test_full_parity.py).

Each test builds a torch replica with the REFERENCE module layout
(/root/reference/src/models/PoseCDE.py:43-74, PoseRDE.py:43-72,
PoseNCP.py:7-37 — with the documented dimensional fixes from our model
docstrings), converts its state_dict through models/convert.py, and checks
our flax pose core reproduces the torch forward numerically.

The CDE/RDE replicas integrate with fixed-step euler over the linear
control path (exactly replicable without the reference's solver deps);
the adaptive path is cross-checked separately in tests/test_step_goldens.py
and tests/test_full_parity.py against the torch dopri5 reference
implementation (tests/torch_ref.py)."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as tnn  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from ode_vio_tpu.config import ModelConfig, SolverConfig  # noqa: E402
from ode_vio_tpu.models.convert import convert_pose_net  # noqa: E402

B, S, VF, IF = 2, 6, 8, 4
FLEN = VF + IF
H = 6                 # cde_hidden_dim
CDE_LAYERS = 2
SUB = 8               # euler substeps per knot interval
RDE_RED = 3           # rde reduced channels (path dim 4, logsig dim 10)
NCP_H = 5
ATOL = 1e-5


def sd_numpy(module):
    return {k: v.detach().numpy() for k, v in module.state_dict().items()}


def make_inputs(seed=0):
    rng = np.random.default_rng(seed)
    fv = rng.standard_normal((B, S - 1, VF)).astype(np.float32)
    fi = rng.standard_normal((B, S - 1, IF)).astype(np.float32)
    ts = np.cumsum(rng.random((B, S)).astype(np.float32) * 0.1 + 0.05, 1)
    return fv, fi, ts


class TorchCDEFunc(tnn.Module):
    """Reference CDEFunc (ODEFunc.py:44-84)."""

    def __init__(self, feature_dim, hidden_dim, n_layers):
        super().__init__()
        layers = [tnn.Linear(hidden_dim, hidden_dim), tnn.Tanh()]
        for _ in range(n_layers - 1):
            layers += [tnn.Linear(hidden_dim, hidden_dim), tnn.Tanh()]
        layers += [tnn.Linear(hidden_dim, hidden_dim * feature_dim), tnn.Tanh()]
        self.net = tnn.Sequential(*layers)
        self.hidden_dim, self.feature_dim = hidden_dim, feature_dim

    def forward(self, z):
        out = self.net(z)
        return out.view(*z.shape[:-1], self.hidden_dim, self.feature_dim)


def euler_cdeint(cde_func, z0, obs, knots, substeps):
    """Fixed-step euler CDE integration over the piecewise-linear control
    path, replicating our solve_at segment semantics (zs[0] = z0 at the
    first knot; left-endpoint derivative lookups)."""
    Bc, T, _ = obs.shape
    zs = [z0]
    z = z0
    for i in range(T - 1):
        # constant slope on segment i of the linear path
        seg_dt = (knots[:, i + 1] - knots[:, i]).unsqueeze(-1)
        slope = (obs[:, i + 1] - obs[:, i]) / seg_dt
        dt = seg_dt / substeps
        for _ in range(substeps):
            z = z + dt * torch.einsum("bhc,bc->bh", cde_func(z), slope)
        zs.append(z)
    return torch.stack(zs, 1)


class TorchPoseCDE(tnn.Module):
    """Reference PoseCDE layout (PoseCDE.py:43-74) with the documented
    fixes our model applies (reduction actually used; knots at the real
    timestamps)."""

    def __init__(self):
        super().__init__()
        self.reduction_net = tnn.Sequential(
            tnn.Linear(FLEN, FLEN // 2), tnn.LeakyReLU(0.1),
            tnn.Linear(FLEN // 2, H),
        )
        self.initial = tnn.Sequential(tnn.Linear(H + 1, H), tnn.Tanh())
        self.cde_func = TorchCDEFunc(H + 1, H, CDE_LAYERS)
        self.regressor = tnn.Sequential(
            tnn.Linear(H, 128), tnn.LeakyReLU(0.1), tnn.Linear(128, 6)
        )

    def forward(self, fv, fi, ts):
        fused = torch.cat([fv, fi], -1)
        x = self.reduction_net(fused)
        ts = ts - ts[:, :1]
        knots = ts[:, 1:]
        obs = torch.cat([knots.unsqueeze(-1), x], -1)
        z0 = self.initial(obs[:, 0])
        zs = euler_cdeint(self.cde_func, z0, obs, knots, SUB)
        return self.regressor(zs), zs[:, -1]


class TorchPoseRDE(tnn.Module):
    """Reference PoseRDE layout (PoseRDE.py:43-72) with our documented
    reduction fix; drives the CDE with depth-2 logsig windows."""

    WINDOW = 2

    def __init__(self):
        super().__init__()
        d = RDE_RED + 1
        self.sig_dim = d + d * (d - 1) // 2
        self.reduction_net = tnn.Linear(FLEN, RDE_RED)
        self.initial = tnn.Sequential(tnn.Linear(d, H), tnn.Tanh())
        self.cde_func = TorchCDEFunc(self.sig_dim, H, CDE_LAYERS)
        self.regressor = tnn.Sequential(
            tnn.Linear(H, 128), tnn.LeakyReLU(0.1), tnn.Linear(128, 6)
        )

    @staticmethod
    def logsig_windows_np(obs, knots, window):
        """Independent numpy depth-2 log-signature windowing (increments +
        Levy areas over non-overlapping windows, trailing partial kept)."""
        Bc, T, C = obs.shape
        bounds = list(range(0, T - 1, window)) + [T - 1]
        iu, ju = np.triu_indices(C, k=1)
        sigs = []
        for b0, b1 in zip(bounds[:-1], bounds[1:]):
            seg = obs[:, b0 : b1 + 1]
            inc = seg[:, 1:] - seg[:, :-1]                 # (B, n, C)
            s1 = inc.sum(1)
            prefix = np.cumsum(inc, 1) - inc
            outer = np.einsum("bki,bkj->bij", prefix, inc)
            area = 0.5 * (outer - outer.transpose(0, 2, 1))
            sigs.append(np.concatenate([s1, area[:, iu, ju]], -1))
        sigs = np.stack(sigs, 1)                           # (B, W, D)
        ys = np.concatenate(
            [np.zeros_like(sigs[:, :1]), np.cumsum(sigs, 1)], 1
        )
        t_new = knots[:, np.asarray(bounds)]
        return ys.astype(np.float32), t_new

    def forward(self, fv, fi, ts):
        fused = torch.cat([fv, fi], -1)
        x = self.reduction_net(fused)
        ts = ts - ts[:, :1]
        knots = ts[:, 1:]
        obs = torch.cat([knots.unsqueeze(-1), x], -1)
        z0 = self.initial(obs[:, 0])

        ys_np, t_new_np = self.logsig_windows_np(
            obs.detach().numpy(), knots.detach().numpy(), self.WINDOW
        )
        ys = torch.from_numpy(ys_np)
        t_new = torch.from_numpy(t_new_np)

        # euler over the compressed path, evaluated at the ORIGINAL knots
        # (left-endpoint derivative lookup in the t_new grid per substep)
        zs = [z0]
        z = z0
        for i in range(knots.shape[1] - 1):
            dt = ((knots[:, i + 1] - knots[:, i]) / SUB).unsqueeze(-1)
            for k in range(SUB):
                t = knots[:, i] + k * dt.squeeze(-1)
                slopes = []
                for b in range(knots.shape[0]):
                    seg = int(np.searchsorted(
                        t_new[b].numpy(), float(t[b]), side="right") - 1)
                    seg = min(max(seg, 0), t_new.shape[1] - 2)
                    sl = (ys[b, seg + 1] - ys[b, seg]) / (
                        t_new[b, seg + 1] - t_new[b, seg])
                    slopes.append(sl)
                slope = torch.stack(slopes)
                z = z + dt * torch.einsum("bhc,bc->bh", self.cde_func(z), slope)
            zs.append(z)
        zs = torch.stack(zs, 1)
        return self.regressor(zs), zs[:, -1]


class TorchCfCCell(tnn.Module):
    """ncps CfCCell 'default'-mode layout (PoseNCP.py:21-27 stack)."""

    def __init__(self, in_dim, h_dim, units=128):  # = init_cfc backbone_units
        super().__init__()
        self.backbone = tnn.Sequential(tnn.Linear(in_dim + h_dim, units))
        self.ff1 = tnn.Linear(units, h_dim)
        self.ff2 = tnn.Linear(units, h_dim)
        self.time_a = tnn.Linear(units, h_dim)
        self.time_b = tnn.Linear(units, h_dim)

    def forward(self, x, h, dt):
        z = torch.tanh(self.backbone(torch.cat([x, h], -1)))
        ff1 = torch.tanh(self.ff1(z))
        ff2 = torch.tanh(self.ff2(z))
        gate = torch.sigmoid(self.time_a(z) * dt.unsqueeze(-1) + self.time_b(z))
        return ff1 * (1.0 - gate) + ff2 * gate


class TorchLTCCell(tnn.Module):
    """Torch replica of OUR fused semi-implicit LTC cell
    (ops/liquid.py:68-99; ncps's per-synapse LTC has no tensor-level
    mapping onto the TPU re-design, see convert.convert_ltc_cell)."""

    UNFOLDS = 6

    def __init__(self, in_dim, h_dim):
        super().__init__()
        self.w_x = tnn.Linear(in_dim, h_dim)
        self.w_h = tnn.Linear(h_dim, h_dim)
        self.log_tau = tnn.Parameter(torch.zeros(h_dim))
        self.A = tnn.Parameter(0.1 * torch.randn(h_dim))

    def forward(self, x, h, dt):
        dt = (dt / self.UNFOLDS).unsqueeze(-1)
        inv_tau = torch.exp(-self.log_tau)
        gx = self.w_x(x)
        for _ in range(self.UNFOLDS):
            f = torch.sigmoid(gx + self.w_h(h))
            h = (h + dt * f * self.A) / (1.0 + dt * (inv_tau + f))
        return h


class TorchRNNWrap(tnn.Module):
    """Names the cell ``rnn_cell`` like ncps' CfC wrapper."""

    def __init__(self, cell):
        super().__init__()
        self.rnn_cell = cell


class TorchPoseNCP(tnn.Module):
    def __init__(self, cell_type):
        super().__init__()
        if cell_type == "cfc":
            self.rnn = TorchRNNWrap(TorchCfCCell(FLEN, NCP_H))
        else:
            self.rnn = TorchLTCCell(FLEN, NCP_H)
        self.cell_type = cell_type
        self.regressor = tnn.Sequential(
            tnn.Linear(NCP_H, 128), tnn.LeakyReLU(0.1), tnn.Linear(128, 6)
        )

    def forward(self, fv, fi, ts):
        fused = torch.cat([fv, fi], -1)
        h = torch.zeros(fused.shape[0], NCP_H)
        cell = self.rnn.rnn_cell if self.cell_type == "cfc" else self.rnn
        deltas = []
        for i in range(fused.shape[1]):
            h_new = cell(fused[:, i], h, ts[:, i + 1] - ts[:, i])
            deltas.append(h_new - h)
            h = h_new
        return self.regressor(torch.stack(deltas, 1)), h


def mcfg(model_type):
    return ModelConfig(
        model_type=model_type, v_f_len=VF, i_f_len=IF, seq_len=S,
        cde_hidden_dim=H, cde_fn_num_layers=CDE_LAYERS,
        cde_activation_fn="tanh", rde_reduced_dim=RDE_RED,
        logsig_window=TorchPoseRDE.WINDOW, rnn_hidden_dim=NCP_H,
        fuse_method="cat", compute_dtype="float32",
    )


FIXED_EULER = SolverConfig(method="euler", adaptive=False, fixed_steps=SUB)


class TestConvertedCores:
    def test_cde_parity(self):
        torch.manual_seed(0)
        t_model = TorchPoseCDE().eval()
        fv, fi, ts = make_inputs()
        with torch.no_grad():
            t_poses, t_zT = t_model(torch.from_numpy(fv), torch.from_numpy(fi),
                                    torch.from_numpy(ts))

        params = convert_pose_net(sd_numpy(t_model), "cde", prefix="")
        from ode_vio_tpu.models.pose_cde import PoseCDE

        model = PoseCDE(cfg=mcfg("cde"), solver=FIXED_EULER)
        j_poses, j_zT = model.apply(
            {"params": params}, jnp.asarray(fv), jnp.asarray(fi),
            jnp.asarray(ts), train=False,
        )
        np.testing.assert_allclose(np.asarray(j_poses), t_poses.numpy(),
                                   atol=ATOL)
        np.testing.assert_allclose(np.asarray(j_zT), t_zT.numpy(), atol=ATOL)

    def test_rde_parity(self):
        torch.manual_seed(1)
        t_model = TorchPoseRDE().eval()
        fv, fi, ts = make_inputs(1)
        with torch.no_grad():
            t_poses, t_zT = t_model(torch.from_numpy(fv), torch.from_numpy(fi),
                                    torch.from_numpy(ts))

        params = convert_pose_net(sd_numpy(t_model), "rde", prefix="")
        from ode_vio_tpu.models.pose_rde import PoseRDE

        model = PoseRDE(cfg=mcfg("rde"), solver=FIXED_EULER)
        j_poses, j_zT = model.apply(
            {"params": params}, jnp.asarray(fv), jnp.asarray(fi),
            jnp.asarray(ts), train=False,
        )
        np.testing.assert_allclose(np.asarray(j_poses), t_poses.numpy(),
                                   atol=2e-5)
        np.testing.assert_allclose(np.asarray(j_zT), t_zT.numpy(), atol=2e-5)

    @pytest.mark.parametrize("cell", ["cfc", "ltc"])
    def test_ncp_parity(self, cell):
        torch.manual_seed(2)
        t_model = TorchPoseNCP(cell).eval()
        fv, fi, ts = make_inputs(2)
        with torch.no_grad():
            t_poses, t_h = t_model(torch.from_numpy(fv), torch.from_numpy(fi),
                                   torch.from_numpy(ts))

        params = convert_pose_net(sd_numpy(t_model), cell, prefix="")
        from ode_vio_tpu.models.pose_ncp import PoseNCP

        model = PoseNCP(cfg=mcfg(cell), cell_type=cell)
        j_poses, j_h = model.apply(
            {"params": params}, jnp.asarray(fv), jnp.asarray(fi),
            jnp.asarray(ts), train=False,
        )
        np.testing.assert_allclose(np.asarray(j_poses), t_poses.numpy(),
                                   atol=ATOL)
        np.testing.assert_allclose(np.asarray(j_h), t_h.numpy(), atol=ATOL)


class TestRoundtrip:
    """export_deepvio must be the exact inverse of convert_deepvio: a model
    trained here exports to a reference-layout state_dict and converts back
    to the identical variables pytree, for every pose-core family."""

    @pytest.mark.parametrize(
        "mt", ["ode-rnn", "rnn", "cde", "rde", "cfc", "ltc"]
    )
    def test_export_then_convert_is_identity(self, mt):
        from ode_vio_tpu.config import Config, DataConfig
        from ode_vio_tpu.models.convert import convert_deepvio, export_deepvio
        from ode_vio_tpu.models.deepvio import init_model

        cfg = Config(
            model=ModelConfig(
                model_type=mt, img_w=128, img_h=64, seq_len=4,
                v_f_len=16, i_f_len=8, ode_hidden_dim=16,
                rnn_num_layers=2, fuse_method="soft",
                cde_hidden_dim=8, rde_reduced_dim=3,
                compute_dtype="float32",
            ),
            solver=SolverConfig(max_steps=8, dt0=1e-2),
            data=DataConfig(seq_len=4),
        )
        _, v = init_model(cfg, jax.random.PRNGKey(0))
        v = {"params": v["params"], "batch_stats": v.get("batch_stats", {})}

        sd = export_deepvio(v, mt, conv_out_hw=(64 // 64, 128 // 64))
        v2 = convert_deepvio(sd, mt, rnn_num_layers=2,
                             conv_out_hw=(64 // 64, 128 // 64))

        assert (jax.tree_util.tree_structure(v)
                == jax.tree_util.tree_structure(v2)), (
            f"{mt}: roundtrip changed the tree structure"
        )
        for (path, a), (_, b) in zip(
            jax.tree_util.tree_flatten_with_path(v)[0],
            jax.tree_util.tree_flatten_with_path(v2)[0],
        ):
            np.testing.assert_array_equal(
                np.asarray(a), np.asarray(b),
                err_msg=f"{mt}: leaf {jax.tree_util.keystr(path)} differs",
            )


def test_trunk_out_hw():
    from ode_vio_tpu.models.convert import trunk_out_hw

    assert trunk_out_hw(256, 512) == (4, 8)   # reference dims (Encoder.py)
    assert trunk_out_hw(64, 128) == (1, 2)
    assert trunk_out_hw(32, 64) == (1, 1)     # tiny test fixture floor
