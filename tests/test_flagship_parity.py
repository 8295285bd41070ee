"""FLAGSHIP-dimension parity (VERDICT r2 next #2): the full production
operating point — 256x512 images, 768-d fused features, softplus 1024-d
ODE MLP (2 hidden layers), 3 RNN layers, soft fusion, ADAPTIVE dopri5 at
the reference tolerances rtol 1e-2 / atol 1e-6 / dt0 1e-4
(/root/reference/scripts/run_training.sh flag set,
src/models/PoseODERNN.py:57,72) — torch reference replica vs our full
stack through the one-command parity harness on a synthetic KITTI
sequence long enough for real 100 m metric segments.

This exercises exactly what the toy-dim parity tests cannot: bf16->f32
encoder accumulation depth at production channel counts, the
(img_h//64, img_w//64) = (4, 8) conv_out_hw permutation path in the
converter, and the adaptive controller at production tolerances.

Measured deltas are recorded in PARITY.md.
"""

import json

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from ode_vio_tpu.cli.parity import main as parity_main  # noqa: E402
from ode_vio_tpu.cli.flags import build_parser, config_from_args  # noqa: E402
from ode_vio_tpu.data.synthetic import make_kitti_tree  # noqa: E402
from ode_vio_tpu.reference.torch_tester import build_reference_model  # noqa: E402

H, W, S = 256, 512, 11
SEQ = "05"
N_FRAMES = 131  # (N-1) % (S-1) == 0; ~104 m of trajectory at speed 8


def flagship_flags(root, tmp_path):
    """The canonical ODE-VIO configuration (scripts/run_training.sh)."""
    return [
        "--data_dir", str(root), "--save_dir", str(tmp_path / "results"),
        "--experiment_name", "flagship", "--val_seq", SEQ,
        "--img_w", str(W), "--img_h", str(H), "--seq_len", str(S),
        "--v_f_len", "512", "--i_f_len", "256",
        "--ode_hidden_dim", "1024", "--ode_fn_num_layers", "2",
        "--ode_activation_fn", "softplus", "--ode_rnn_type", "rnn",
        "--rnn_num_layers", "3", "--fuse_method", "soft",
        "--ode_solver", "dopri5", "--run_times", "1", "--workers", "0",
    ]


@pytest.mark.slow
def test_flagship_dims_forward_parity(tmp_path):
    """Direct pose-level parity at the flagship operating point, two
    streamed windows (cold start + carried state): torch f32 replica vs
    our production bf16-encoder stack through the converter. This is the
    dtype-and-shape-sensitive check the metric-level protocol test cannot
    provide (the segment metric saturates and the RMSEs are gt-dominated
    for a random-init model)."""
    import jax
    import jax.numpy as jnp

    from ode_vio_tpu.models import convert
    from ode_vio_tpu.models.deepvio import create_model

    cfg = config_from_args(
        build_parser().parse_args(flagship_flags(tmp_path, tmp_path)))
    assert cfg.model.compute_dtype == "bfloat16"  # production numerics

    torch.manual_seed(5)
    t_model = build_reference_model(cfg)
    with torch.no_grad():
        t_model.train()
        t_model.Image_net(torch.randn(1, 3, 3, H, W))
        t_model.Inertial_net(torch.randn(1, 21, 6))
        t_model.eval()

    sd = {k: v.numpy() for k, v in t_model.state_dict().items()}
    variables = convert.convert_deepvio(
        sd, "ode-rnn", rnn_num_layers=3,
        conv_out_hw=convert.trunk_out_hw(H, W),
    )
    model = create_model(cfg)

    rng = np.random.default_rng(9)
    hc_t = None
    hc_j = None
    for wi in range(2):
        img = rng.random((1, S, H, W, 3), np.float32).astype(np.float32) - 0.5
        imu = rng.standard_normal((1, 10 * (S - 1) + 1, 6)).astype(np.float32)
        ts = (wi * 1.1 + np.cumsum(
            rng.random((1, S)).astype(np.float32) * 0.05 + 0.05, 1))

        with torch.no_grad():
            t_poses, hc_t = t_model(
                torch.from_numpy(
                    np.ascontiguousarray(img[0].transpose(0, 3, 1, 2)))[None],
                torch.from_numpy(imu), torch.from_numpy(ts), hc=hc_t)
        j_poses, hc_j = model.apply(
            variables, jnp.asarray(img), jnp.asarray(imu), jnp.asarray(ts),
            hc=hc_j, train=False, rngs={"gumbel": jax.random.PRNGKey(0)},
        )
        t_np = t_poses.numpy()
        j_np = np.asarray(j_poses, np.float32)
        err = float(np.max(np.abs(j_np - t_np)))
        scale = float(np.max(np.abs(t_np)))
        print(f"flagship forward window {wi}: max|dpose| {err:.5f} "
              f"(pose scale {scale:.4f})")
        # bf16 encoder accumulation vs torch f32: sub-percent pose-level
        # agreement at production dims (measured ~2e-3; fails loudly on
        # any layout/permutation/dtype regression, which produce O(1))
        assert err <= 0.02 * max(scale, 0.1), (wi, err, scale)


@pytest.mark.slow
def test_flagship_dims_protocol_parity(tmp_path, capsys):
    root = make_kitti_tree(
        tmp_path / "kitti", seqs=(SEQ,), n_frames=N_FRAMES,
        img_hw=(H, W), speed_scale=8.0,
    )

    cfg = config_from_args(
        build_parser().parse_args(flagship_flags(root, tmp_path)))
    assert cfg.model.f_len == 768
    assert cfg.solver.method == "dopri5" and cfg.solver.adaptive
    assert cfg.solver.rtol == pytest.approx(1e-2)
    assert cfg.solver.atol == pytest.approx(1e-6)

    torch.manual_seed(42)
    t_model = build_reference_model(cfg)
    with torch.no_grad():
        t_model.train()
        t_model.Image_net(torch.randn(1, 3, 3, H, W))
        t_model.Inertial_net(torch.randn(1, 21, 6))
        t_model.eval()
    ckpt = tmp_path / "flagship.pth"
    torch.save(t_model.state_dict(), ckpt)

    rc = parity_main([
        *flagship_flags(root, tmp_path),
        "--ref_ckpt", str(ckpt), "--torch_protocol",
    ])
    report = json.loads(capsys.readouterr().out.strip().splitlines()[-1])

    assert rc == 0
    row = report["rows"][0]
    print(f"flagship parity: ours t_rel {row['ours']['t_rel']:.4f} "
          f"r_rel {row['ours']['r_rel']:.4f} | torch t_rel "
          f"{row['ref']['t_rel']:.4f} r_rel {row['ref']['r_rel']:.4f} | "
          f"delta {row['delta_pct']}")
    assert np.isfinite(row["ours"]["t_rel"])
    assert np.isfinite(row["ref"]["t_rel"])
    # VERDICT r2 #2: flagship-dims agreement within the same 2% tolerance
    # as the toy-dim protocol test
    assert report["worst_delta_pct"] <= 2.0, report
    # the segment metric saturates on a random-init model (near-zero poses
    # vs real motion), so ALSO pin the pose-level RMSEs, which respond
    # directly to the predicted values
    for k in ("t_rmse", "r_rmse"):
        d = abs(row["ours"][k] - row["ref"][k]) / max(abs(row["ref"][k]),
                                                      1e-9)
        print(f"flagship {k}: ours {row['ours'][k]:.6f} "
              f"ref {row['ref'][k]:.6f} rel-delta {d:.5f}")
        assert d <= 0.02, (k, row)
