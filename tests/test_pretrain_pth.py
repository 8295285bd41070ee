"""Reference-checkpoint loading through the plain ``--pretrain`` flag.

The upstream workflow loads its pretrained ``ode-vio-v1.pth`` with
``--pretrain path.pth`` (/root/reference/scripts/test_model.py:106-108,
README.md:67-77). These tests pin that a reference-layout torch file
passed to OUR ``--pretrain`` (a) converts and evaluates through the test
CLI, (b) warm-starts the train CLI with the epoch parsed from a trailing
``NNN`` in the filename (train_model.py:175-177 semantics), and (c)
produces the same predictions as the pre-converted variables path.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from ode_vio_tpu.cli.flags import build_parser, config_from_args
from ode_vio_tpu.data.synthetic import make_kitti_tree
from ode_vio_tpu.reference.torch_tester import build_reference_model

TINY_FLAGS = [
    "--img_w", "128", "--img_h", "64", "--seq_len", "4",
    "--v_f_len", "32", "--i_f_len", "16", "--ode_hidden_dim", "16",
    "--rnn_num_layers", "2", "--ode_max_steps", "8",
    "--compute_dtype", "float32", "--batch_size", "4",
    "--train_seq", "00", "--val_seq", "05",
    "--epochs_warmup", "1", "--epochs_joint", "0", "--epochs_fine", "0",
    "--workers", "0",
]


@pytest.fixture(scope="module")
def kitti_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("kitti_pth")
    return make_kitti_tree(root, seqs=("00", "05"), n_frames=20,
                           img_hw=(64, 128))


@pytest.fixture(scope="module")
def replica_ckpt(tmp_path_factory, kitti_root):
    cfg = config_from_args(build_parser().parse_args(
        ["--data_dir", str(kitti_root), *TINY_FLAGS]))
    torch.manual_seed(3)
    t_model = build_reference_model(cfg)
    with torch.no_grad():  # non-trivial BN running stats
        t_model.train()
        t_model.Image_net(torch.randn(2, 3, 3, 64, 128))
        t_model.Inertial_net(torch.randn(2, 10 * 2 + 1, 6))
        t_model.eval()
    path = tmp_path_factory.mktemp("ckpt") / "010.pth"
    torch.save(t_model.state_dict(), path)
    return path


def test_test_cli_accepts_reference_pth(kitti_root, replica_ckpt, tmp_path):
    from ode_vio_tpu.cli.test import main as test_main

    save = tmp_path / "results"
    test_main(
        ["--data_dir", str(kitti_root), "--save_dir", str(save),
         "--experiment_name", "pth", "--pretrain", str(replica_ckpt),
         "--run_times", "1", *TINY_FLAGS]
    )
    summary = (save / "pth_test" / "summary.txt").read_text()
    assert "seq 05" in summary
    pred = save / "pth_test" / "poses" / "05_pred.txt"
    assert pred.exists()


def test_pth_predictions_match_preconverted(kitti_root, replica_ckpt):
    """--pretrain file.pth must be exactly the converter + evaluator."""
    import jax

    from ode_vio_tpu.data.evaluation import KittiEvaluator
    from ode_vio_tpu.models import convert
    from ode_vio_tpu.models.deepvio import init_model
    from ode_vio_tpu.training.loop import make_infer_fn

    cfg = config_from_args(build_parser().parse_args(
        ["--data_dir", str(kitti_root), *TINY_FLAGS]))

    via_flag = convert.variables_from_pretrain(replica_ckpt, cfg.model)
    assert via_flag is not None
    sd = convert.load_torch_checkpoint(replica_ckpt)
    direct = convert.convert_deepvio(
        sd, cfg.model.model_type, rnn_num_layers=cfg.model.rnn_num_layers,
        conv_out_hw=convert.trunk_out_hw(cfg.model.img_h, cfg.model.img_w))
    for a, b in zip(jax.tree_util.tree_leaves(via_flag),
                    jax.tree_util.tree_leaves(direct)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    model, _ = init_model(cfg, jax.random.PRNGKey(0), batch_size=1)
    infer = make_infer_fn(model, via_flag)
    ev = KittiEvaluator(kitti_root, ("05",), cfg.data.seq_len, (64, 128),
                        0.0, rng=np.random.default_rng(0))
    res = ev.eval(infer)[0]
    assert np.isfinite(res["t_rmse"])


def test_pretrain_dir_still_goes_through_orbax(kitti_root):
    from ode_vio_tpu.models.convert import variables_from_pretrain

    cfg = config_from_args(build_parser().parse_args(
        ["--data_dir", str(kitti_root), *TINY_FLAGS]))
    assert variables_from_pretrain(kitti_root, cfg.model) is None


def test_train_cli_warm_starts_from_pth(kitti_root, replica_ckpt, tmp_path):
    from ode_vio_tpu.cli.train import main as train_main

    save = tmp_path / "results"
    train_main(
        ["--data_dir", str(kitti_root), "--save_dir", str(save),
         "--experiment_name", "warm", "--pretrain", str(replica_ckpt),
         *TINY_FLAGS]
    )
    # filename 010.pth -> init_epoch 11; one warmup epoch configured means
    # the loop body is skipped but the eval/checkpoint scaffolding ran
    ckpts = list((save / "warm" / "checkpoints").glob("epoch_*"))
    log = (save / "warm" / "logs").glob("*.log")
    text = "".join(p.read_text() for p in log)
    assert "warm-started from reference checkpoint" in text
    assert "(epoch 11)" in text
    assert ckpts == [] or all("epoch_0" not in c.name for c in ckpts)


def test_structure_mismatch_is_readable(kitti_root, replica_ckpt):
    import jax

    from ode_vio_tpu.models import convert
    from ode_vio_tpu.models.deepvio import init_model

    cfg = config_from_args(build_parser().parse_args(
        ["--data_dir", str(kitti_root), *TINY_FLAGS,
         "--ode_hidden_dim", "24"]))  # wrong dim vs the checkpoint
    conv = convert.variables_from_pretrain(replica_ckpt, cfg.model)
    _, init_vars = init_model(cfg, jax.random.PRNGKey(0), batch_size=1)
    with pytest.raises(SystemExit, match="does not match the model flags"):
        convert.check_structure(conv, init_vars)


def test_warm_start_epoch_parsing():
    """Exactly-three-digit epochs parse (upstream int(pretrain[-7:-4]));
    version suffixes like the published ode-vio-v1.pth must NOT."""
    from ode_vio_tpu.cli.train import _warm_start_epoch

    assert _warm_start_epoch("checkpoints/010.pth") == 11
    assert _warm_start_epoch("001.tar") == 2
    assert _warm_start_epoch("ode-vio-v1.pth") == 0
    assert _warm_start_epoch("ode-vio-v2.pth") == 0
    assert _warm_start_epoch("best_2.pth") == 0
    assert _warm_start_epoch("model_1010.pth") == 0  # 4 digits: not an epoch
    assert _warm_start_epoch("exported.npz") == 0
