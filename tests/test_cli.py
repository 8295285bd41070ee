"""End-to-end CLI driver tests on the synthetic mini-KITTI fixture:
one training epoch with eval + checkpointing, then the test CLI consuming
the produced checkpoint, then the plot CLI."""

import numpy as np
import pytest

from ode_vio_tpu.data.synthetic import make_kitti_tree
from ode_vio_tpu.utils import geometry as geo


@pytest.fixture(scope="module")
def kitti_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("kitti_cli")
    return make_kitti_tree(root, seqs=("00", "05"), n_frames=24,
                           img_hw=(32, 64))


TINY_FLAGS = [
    "--img_w", "64", "--img_h", "32", "--seq_len", "4",
    "--v_f_len", "32", "--i_f_len", "16", "--ode_hidden_dim", "16",
    "--rnn_num_layers", "2", "--ode_max_steps", "8",
    "--compute_dtype", "float32", "--batch_size", "4",
    "--train_seq", "00", "--val_seq", "05",
    "--epochs_warmup", "1", "--epochs_joint", "0", "--epochs_fine", "0",
    "--workers", "0", "--print_frequency", "2",
]


def test_train_then_test_cli(kitti_root, tmp_path):
    from ode_vio_tpu.cli.test import main as test_main
    from ode_vio_tpu.cli.train import main as train_main

    save = tmp_path / "results"
    train_main(
        ["--data_dir", str(kitti_root), "--save_dir", str(save),
         "--experiment_name", "e2e", "--data_dropout", "0.2",
         *TINY_FLAGS]
    )
    ckpt_dir = save / "e2e" / "checkpoints"
    assert (ckpt_dir / "epoch_000").exists()
    graphs = list((save / "e2e" / "graphs").glob("*.png"))
    assert graphs, "per-epoch trajectory plot missing"

    test_main(
        ["--data_dir", str(kitti_root), "--save_dir", str(save),
         "--experiment_name", "e2e", "--pretrain", str(ckpt_dir),
         "--run_times", "2", "--eval_data_dropout", "0.3",
         *TINY_FLAGS]
    )
    summary = (save / "e2e_test" / "summary.txt").read_text()
    assert "seq 05" in summary and "+-" in summary
    poses = save / "e2e_test" / "poses"
    assert (poses / "05_pred.txt").exists()

    # plot CLI on the dumped trajectories
    from ode_vio_tpu.cli.plot import main as plot_main

    out = tmp_path / "cmp.png"
    plot_main(["--gt", str(poses / "05_gt.txt"),
               "--pred", f"ours={poses / '05_pred.txt'}",
               "--out", str(out)])
    assert out.exists()

    # serve CLI: online streaming with latency report on the same ckpt
    from ode_vio_tpu.cli.serve import main as serve_main

    report = serve_main(
        ["--data_dir", str(kitti_root), "--save_dir", str(save),
         "--experiment_name", "e2e", "--pretrain", str(ckpt_dir),
         *TINY_FLAGS]
    )
    assert report["windows"] > 0 and report["latency_ms_p50"] > 0
    assert (save / "e2e_serve" / "poses" / "05_pred.txt").exists()
    served, _ = geo.read_pose_file(
        save / "e2e_serve" / "poses" / "05_pred.txt"
    )
    assert served.shape[0] == report["frames"] + 1

    # multi-session serving: both sequences as concurrent sessions on one
    # executable (StreamingEngine under the serve CLI)
    multi = serve_main(
        ["--data_dir", str(kitti_root), "--save_dir", str(save),
         "--experiment_name", "e2e", "--pretrain", str(ckpt_dir),
         *TINY_FLAGS, "--val_seq", "00", "05"]
    )
    assert multi["sessions"] == 2 and multi["frames"] > report["frames"]
    assert (save / "e2e_serve" / "poses" / "00_pred.txt").exists()

    # export CLI: trained checkpoint -> reference-layout state_dict, and
    # the converter roundtrips it back to the identical params
    from ode_vio_tpu.cli.export import main as export_main
    from ode_vio_tpu.models.convert import convert_deepvio, trunk_out_hw

    out = tmp_path / "ref_sd.npz"
    sd = export_main(
        ["--data_dir", str(kitti_root), "--save_dir", str(save),
         "--experiment_name", "e2e", "--pretrain", str(ckpt_dir),
         *TINY_FLAGS, "--out", str(out)]
    )
    assert out.exists() and "Pose_net.regressor.0.weight" in sd
    v2 = convert_deepvio(dict(np.load(out)), "ode-rnn", rnn_num_layers=2,
                         conv_out_hw=trunk_out_hw(32, 64))
    assert "image_encoder" in v2["params"]


def test_resume_from_checkpoint(kitti_root, tmp_path):
    from ode_vio_tpu.cli.train import main as train_main

    save = tmp_path / "results"
    args = ["--data_dir", str(kitti_root), "--save_dir", str(save),
            "--experiment_name", "resume", *TINY_FLAGS]
    train_main(args)
    ckpt_dir = save / "resume" / "checkpoints"
    # second run resumes past epoch 0 and trains epochs 1-2; checkpoints
    # save every 2 epochs, so epoch_002 must appear
    train_main(args + ["--pretrain", str(ckpt_dir),
                       "--epochs_warmup", "3"])
    assert (ckpt_dir / "epoch_002").exists()


def test_entry_importable():
    import sys

    sys.path.insert(0, "/root/repo")
    import __graft_entry__ as ge

    assert callable(ge.entry) and callable(ge.dryrun_multichip)
