"""End-to-end PROTOCOL parity: the reference-style tester assembled in
torch (windows -> streaming forward with carried state -> official KITTI
segment metric, /root/reference/src/data/KITTI_eval.py:113-284 +
scripts/test_model.py:91-153) against OUR full eval CLI
(``ode_vio_tpu.cli.test``) on a synthetic mini-KITTI sequence long enough
to contain real 100 m metric segments.

The model weights are shared: the torch replica's state_dict converts
through models/convert.py into an Orbax checkpoint our CLI loads. If ANY
layer of the pipeline drifts — PNG decode/centering, window slicing,
IMU alignment, hidden-state carry, pose accumulation, segment selection,
unit conversions — the reported t_rel / r_rel diverge and this fails.
"""

import re

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax  # noqa: E402

from ode_vio_tpu.data.synthetic import make_kitti_tree  # noqa: E402
from ode_vio_tpu.utils import geometry as geo  # noqa: E402
from test_full_parity import (  # noqa: E402
    H, IF, L, S, SUBSTEPS, VF, TorchDeepVIO, sd_numpy, W,
)

N_FRAMES = 250  # (N-1) divisible by (S-1): no ragged tail on either side
SEQ = "05"


def torch_reference_eval(model, root):
    """The reference KITTI_tester protocol, independently assembled:
    data_partition windows (stride S-1, shared boundary frame,
    KITTI_eval.py:78-91), streaming eval with carried hc
    (KITTI_eval.py:124-160), official segment metric (223-284)."""
    import scipy.io as sio
    from PIL import Image

    mats, rel = geo.read_pose_file(root / "poses" / f"{SEQ}.txt")
    ts_all = geo.read_time_file(root / "sequences" / SEQ / "times.txt")
    imu_all = sio.loadmat(root / "imus" / f"{SEQ}.mat")["imu_data_interp"]
    img_dir = root / "sequences" / SEQ / "image_2"

    def load_imgs(idx):
        out = []
        for k in idx:
            arr = np.asarray(
                Image.open(img_dir / f"{k:06d}.png"), np.float32) / 255.0
            out.append(arr - 0.5)
        return np.stack(out)

    hc = None
    preds = []
    start = 0
    while start + S <= N_FRAMES:  # stride S-1, shared boundary frame
        idx = list(range(start, start + S))
        imgs = load_imgs(idx)                              # (S, H, W, 3)
        pairs = np.concatenate([imgs[:-1], imgs[1:]], -1)  # (S-1, H, W, 6)
        pairs_t = torch.from_numpy(
            pairs.transpose(0, 3, 1, 2).copy())
        imu = torch.from_numpy(
            imu_all[start * 10 : (start + S - 1) * 10 + 1].astype(np.float32)
        )[None]
        ts = torch.from_numpy(ts_all[idx].astype(np.float32))[None]
        with torch.no_grad():
            poses, hc = model(pairs_t, imu, ts, hc=hc)
        preds.append(poses[0].numpy())
        start += S - 1
    pose_est = np.concatenate(preds, 0)
    pose_gt = rel[: len(pose_est)]

    # official metric loop (KITTI_eval.py:249-284)
    est_mats = geo.accumulate_path(pose_est)
    gt_mats = geo.accumulate_path(pose_gt)
    dist, _ = geo.trajectory_distances(gt_mats)
    errs = []
    for first in range(0, len(gt_mats), 10):
        for length in (100, 200, 300, 400, 500, 600, 700, 800):
            last = geo.last_frame_from_segment_length(dist, first, length)
            if last == -1 or last >= len(est_mats):
                continue
            d_gt = geo.relative_pose(gt_mats[first], gt_mats[last])
            d_est = geo.relative_pose(est_mats[first], est_mats[last])
            errs.append((geo.rotation_error(d_est, d_gt) / length,
                         geo.translation_error(d_est, d_gt) / length))
    assert errs, "fixture too short for 100 m segments"
    r_rel = float(np.mean([e[0] for e in errs])) / np.pi * 180.0 * 100.0
    t_rel = float(np.mean([e[1] for e in errs])) * 100.0
    return t_rel, r_rel, len(pose_est)


def test_protocol_t_rel_parity(tmp_path):
    root = make_kitti_tree(
        tmp_path / "kitti", seqs=(SEQ,), n_frames=N_FRAMES,
        img_hw=(H, W), speed_scale=8.0,
    )

    torch.manual_seed(7)
    t_model = TorchDeepVIO()
    with torch.no_grad():
        t_model.train()
        t_model.Image_net(torch.randn(6, 6, H, W))
        t_model.Inertial_net(torch.randn(3, 10 * (S - 1) + 1, 6))
        t_model.eval()

    t_rel_ref, r_rel_ref, n_pred = torch_reference_eval(t_model, root)

    # --- our side: convert -> orbax checkpoint -> full test CLI ---
    from ode_vio_tpu.cli.flags import build_parser, config_from_args
    from ode_vio_tpu.cli.test import main as test_main
    from ode_vio_tpu.models import convert
    from ode_vio_tpu.models.deepvio import init_model
    from ode_vio_tpu.training.checkpoint import CheckpointManager
    from ode_vio_tpu.training.loop import create_train_state, make_optimizer

    flags = [
        "--data_dir", str(root), "--save_dir", str(tmp_path / "results"),
        "--experiment_name", "proto", "--val_seq", SEQ,
        "--img_w", str(W), "--img_h", str(H), "--seq_len", str(S),
        "--v_f_len", str(VF), "--i_f_len", str(IF),
        "--ode_hidden_dim", "24", "--ode_fn_num_layers", "2",
        "--ode_activation_fn", "tanh", "--ode_rnn_type", "rnn",
        "--rnn_num_layers", str(L), "--fuse_method", "soft",
        "--compute_dtype", "float32", "--ode_solver", "euler",
        "--ode_fixed_step", "--run_times", "1", "--workers", "0",
    ]
    cfg = config_from_args(build_parser().parse_args(flags))
    assert cfg.solver.fixed_steps == SUBSTEPS  # matches the torch replica

    variables = convert.convert_deepvio(
        sd_numpy(t_model), "ode-rnn", rnn_num_layers=L,
        conv_out_hw=(H // 64, W // 64),
    )
    _, init_vars = init_model(cfg, jax.random.PRNGKey(0), batch_size=1)
    # converted tree must cover the full init structure
    tx = make_optimizer(cfg)
    state = create_train_state(
        cfg,
        {"params": variables["params"], "batch_stats": variables["batch_stats"]},
        tx, jax.random.PRNGKey(1),
    )
    ckpt_dir = tmp_path / "ckpt"
    ckpt = CheckpointManager(ckpt_dir)
    ckpt.save("epoch_000", jax.device_get(state), {"epoch": 0})

    test_main([*flags, "--pretrain", str(ckpt_dir)])

    summary = (tmp_path / "results" / "proto_test" / "summary.txt").read_text()
    m = re.search(r"t_rel: ([\d.nan]+) .*? r_rel: ([\d.nan]+) ", summary)
    assert m, f"unparseable summary: {summary}"
    t_rel_ours, r_rel_ours = float(m.group(1)), float(m.group(2))

    print(f"protocol parity: torch t_rel {t_rel_ref:.4f} r_rel {r_rel_ref:.4f}"
          f" | ours t_rel {t_rel_ours:.4f} r_rel {r_rel_ours:.4f}"
          f" ({n_pred} transitions)")
    assert np.isfinite(t_rel_ours) and np.isfinite(r_rel_ours)
    # identical weights + identical protocol -> metric-level agreement;
    # tolerance covers conv/XLA float accumulation-order differences
    assert abs(t_rel_ours - t_rel_ref) <= max(0.1, 0.02 * t_rel_ref)
    assert abs(r_rel_ours - r_rel_ref) <= max(0.1, 0.02 * r_rel_ref)
