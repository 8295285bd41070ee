"""Evaluation-layer tests: KITTI metric correctness, streaming partition
coverage, end-to-end tester with a ground-truth oracle."""

import numpy as np
import pytest

from ode_vio_tpu.data.evaluation import (
    EvalPartition,
    KittiEvaluator,
    kitti_eval,
    summarize_runs,
)
from ode_vio_tpu.data.synthetic import make_kitti_tree
from ode_vio_tpu.utils import geometry as geo


def straight_line_poses(n: int, step: float = 2.0) -> np.ndarray:
    """n relative poses moving straight ahead `step` meters each."""
    rel = np.zeros((n, 6))
    rel[:, 5] = step
    return rel


class TestKittiMetric:
    def test_zero_error_on_identical(self):
        rel = straight_line_poses(120)  # 240 m straight
        res = kitti_eval(rel, rel.copy())
        assert res["t_rel"] == pytest.approx(0.0, abs=1e-9)
        assert res["r_rel"] == pytest.approx(0.0, abs=1e-9)
        assert res["t_rmse"] == 0.0

    def test_translation_scale_error(self):
        """A 10% per-step scale error shows up as ~10% t_rel."""
        gt = straight_line_poses(120, 2.0)
        est = straight_line_poses(120, 2.2)
        res = kitti_eval(est, gt)
        assert 8.0 < res["t_rel"] < 12.0
        assert res["r_rel"] == pytest.approx(0.0, abs=1e-9)

    def test_rotation_error_detected(self):
        gt = straight_line_poses(120, 2.0)
        est = gt.copy()
        est[:, 1] += 0.002  # 0.002 rad yaw drift per frame
        res = kitti_eval(est, gt)
        assert res["r_rel"] > 0.1
        assert res["r_rmse"] > 0.0

    def test_short_sequence_gives_nan_segments(self):
        rel = straight_line_poses(10, 2.0)  # only 20 m, min segment is 100
        res = kitti_eval(rel, rel)
        assert np.isnan(res["t_rel"])
        assert res["t_rmse"] == 0.0


@pytest.fixture(scope="module")
def kitti_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("kitti_eval")
    return make_kitti_tree(root, seqs=("05",), n_frames=34, img_hw=(32, 64))


class TestEvalPartition:
    def test_windows_cover_sequence(self, kitti_root):
        part = EvalPartition(kitti_root, "05", seq_len=11, img_hw=(32, 64))
        n = part.seq.num_frames
        total_valid = sum(part[i].valid for i in range(len(part)))
        assert total_valid == n - 1

    def test_windows_share_boundary_frame(self, kitti_root):
        part = EvalPartition(kitti_root, "05", seq_len=11, img_hw=(32, 64))
        w0, w1 = part.windows[0], part.windows[1]
        assert w0["paths"][-1] == w1["paths"][0]
        assert w0["ts"][-1] == w1["ts"][0]

    def test_padded_tail_static_shape(self, kitti_root):
        part = EvalPartition(kitti_root, "05", seq_len=11, img_hw=(32, 64))
        last = part[len(part) - 1]
        assert last.imgs.shape == (11, 32, 64, 3)
        assert last.ts.shape == (11,)
        assert np.all(np.diff(last.ts) > 0)
        assert last.valid <= 10

    def test_sequence_shorter_than_window(self, tmp_path):
        """A sequence with fewer frames than one window still yields one
        fully-padded static-shape window (ragged-tail path, stride-less)."""
        root = make_kitti_tree(tmp_path / "short", seqs=("05",), n_frames=6,
                               img_hw=(32, 64))
        part = EvalPartition(root, "05", seq_len=11, img_hw=(32, 64))
        assert len(part) == 1
        w = part[0]
        assert w.imgs.shape == (11, 32, 64, 3)
        assert w.ts.shape == (11,) and np.all(np.diff(w.ts) > 0)
        assert w.valid == 5  # 6 frames -> 5 real transitions

    def test_eval_dropout_changes_frames(self, kitti_root):
        p0 = EvalPartition(kitti_root, "05", seq_len=11, img_hw=(32, 64))
        p1 = EvalPartition(kitti_root, "05", seq_len=11, img_hw=(32, 64),
                           eval_dropout=0.5, rng=np.random.default_rng(0))
        assert p1.seq.num_frames < p0.seq.num_frames


class TestEvaluator:
    def test_oracle_infer_gives_zero_rmse(self, kitti_root):
        """An infer_fn that returns the ground-truth relative poses must
        score zero RMSE (t_rel is NaN: sequence shorter than 100 m)."""
        ev = KittiEvaluator(kitti_root, val_seqs=("05",), seq_len=11,
                            img_hw=(32, 64))
        part = ev.partitions[0]
        counter = {"i": 0}

        def oracle(imgs, imus, ts, carry=None):
            w = part.windows[counter["i"]]
            counter["i"] += 1
            gts = w["gts"]
            S = part.seq_len - 1
            padded = np.zeros((1, S, 6), np.float32)
            padded[0, : len(gts)] = gts
            return padded, None

        errs = ev.eval(oracle)
        assert errs[0]["t_rmse"] == pytest.approx(0.0, abs=1e-7)
        assert errs[0]["r_rmse"] == pytest.approx(0.0, abs=1e-7)

    def test_plots_and_text(self, kitti_root, tmp_path):
        ev = KittiEvaluator(kitti_root, val_seqs=("05",), seq_len=11,
                            img_hw=(32, 64))
        zeros = lambda imgs, imus, ts, carry=None: (
            np.zeros((1, 10, 6), np.float32), None
        )
        ev.eval(zeros)
        ev.generate_plots(tmp_path)
        ev.save_text(tmp_path)
        assert (tmp_path / "05_path_2d.png").exists()
        est, _ = geo.read_pose_file(tmp_path / "05_pred.txt")
        assert est.shape[0] == 34  # identity path has N poses

    def test_prefetched_windows_match_direct_decode(self, kitti_root):
        """eval_sequence pipelines decode through the native Prefetcher
        (window i+1 decodes while the device runs window i); the windows
        the model sees must be bit-identical to direct __getitem__."""
        ev = KittiEvaluator(kitti_root, val_seqs=("05",), seq_len=11,
                            img_hw=(32, 64))
        part = ev.partitions[0]
        seen = []

        def record(imgs, imus, ts, carry=None):
            seen.append(np.asarray(imgs)[0])
            return np.zeros((1, 10, 6), np.float32), None

        ev.eval_sequence(record, part)
        assert len(seen) == len(part)
        for i in range(len(part)):
            np.testing.assert_array_equal(seen[i], part[i].imgs)

    def test_summarize_runs(self):
        runs = [
            [{"t_rel": 1.0, "r_rel": 2.0, "t_rmse": 0.1, "r_rmse": 0.2}],
            [{"t_rel": 3.0, "r_rel": 4.0, "t_rmse": 0.3, "r_rmse": 0.4}],
        ]
        s = summarize_runs(runs, ("07",))
        assert "seq 07" in s and "2.0000" in s


class TestBatchedEvaluator:
    def test_batched_matches_sequential(self, tmp_path_factory):
        root = make_kitti_tree(tmp_path_factory.mktemp("kitti_lanes"),
                               seqs=("00", "05"), n_frames=30,
                               img_hw=(32, 64))
        import jax
        import jax.numpy as jnp

        from ode_vio_tpu.config import Config, DataConfig, ModelConfig, SolverConfig
        from ode_vio_tpu.models.deepvio import init_model
        from ode_vio_tpu.training.loop import make_infer_fn

        cfg = Config(
            model=ModelConfig(model_type="ode-rnn", img_w=64, img_h=32,
                              seq_len=5, v_f_len=32, i_f_len=16,
                              ode_hidden_dim=16, rnn_num_layers=2,
                              compute_dtype="float32"),
            solver=SolverConfig(max_steps=8, dt0=1e-2),
            data=DataConfig(seq_len=5),
        )
        model, variables = init_model(cfg, jax.random.PRNGKey(0))
        infer = make_infer_fn(model, variables)

        ev = KittiEvaluator(root, val_seqs=("00", "05"), seq_len=5,
                            img_hw=(32, 64))
        seq_res = ev.eval(infer, batched=False)
        bat_res = ev.eval(infer, batched=True)
        for a, b in zip(seq_res, bat_res):
            for k in ("t_rmse", "r_rmse"):
                assert a[k] == pytest.approx(b[k], rel=1e-4, abs=1e-6)


class TestMultiRunEval:
    """eval_runs: the reference's sequential --run_times repetition loop
    (test_model.py:101-128) fanned out as batch lanes, optionally sharded
    over a device mesh."""

    @pytest.fixture(scope="class")
    def setup(self, tmp_path_factory):
        root = make_kitti_tree(tmp_path_factory.mktemp("kitti_runs"),
                               seqs=("00", "05"), n_frames=30,
                               img_hw=(32, 64))
        import jax

        from ode_vio_tpu.config import Config, DataConfig, ModelConfig, SolverConfig
        from ode_vio_tpu.models.deepvio import init_model
        from ode_vio_tpu.training.loop import make_infer_fn

        cfg = Config(
            model=ModelConfig(model_type="ode-rnn", img_w=64, img_h=32,
                              seq_len=5, v_f_len=32, i_f_len=16,
                              ode_hidden_dim=16, rnn_num_layers=2,
                              compute_dtype="float32"),
            solver=SolverConfig(max_steps=8, dt0=1e-2),
            data=DataConfig(seq_len=5),
        )
        model, variables = init_model(cfg, jax.random.PRNGKey(0))
        infer = make_infer_fn(model, variables)

        def evaluators(n_runs, dropout=0.25):
            return [
                KittiEvaluator(root, val_seqs=("00", "05"), seq_len=5,
                               img_hw=(32, 64), eval_dropout=dropout,
                               rng=np.random.default_rng(100 + r))
                for r in range(n_runs)
            ]

        return infer, evaluators

    def test_matches_sequential_runs(self, setup):
        from ode_vio_tpu.data.evaluation import eval_runs

        infer, make_evs = setup
        # sequential baseline: each run's evaluator streamed on its own
        seq_runs = [ev.eval(infer, batched=True) for ev in make_evs(3)]
        # identical rng draws -> identical partitions, now as 6 lanes
        bat_runs = eval_runs(infer, make_evs(3))
        assert len(bat_runs) == 3
        for run_a, run_b in zip(seq_runs, bat_runs):
            for a, b in zip(run_a, run_b):
                for k in ("t_rmse", "r_rmse"):
                    assert a[k] == pytest.approx(b[k], rel=1e-4, abs=1e-6)

    def test_sharded_with_padding(self, setup):
        """3 runs x 2 seqs = 6 lanes pad to 8 and shard over the full
        8-device mesh; results must match the unsharded stream."""
        import jax

        from ode_vio_tpu.data.evaluation import eval_runs
        from ode_vio_tpu.parallel.mesh import batch_sharding, create_mesh

        infer, make_evs = setup
        assert len(jax.devices()) == 8
        mesh = create_mesh(data=8, model=1)
        plain = eval_runs(infer, make_evs(3))
        sharded = eval_runs(infer, make_evs(3),
                            sharding=batch_sharding(mesh), pad_to=8)
        for run_a, run_b in zip(plain, sharded):
            for a, b in zip(run_a, run_b):
                for k in ("t_rel", "r_rel", "t_rmse", "r_rmse"):
                    if np.isnan(a[k]) and np.isnan(b[k]):
                        continue
                    assert a[k] == pytest.approx(b[k], rel=1e-3, abs=1e-5)

    def test_results_assigned_per_evaluator(self, setup):
        from ode_vio_tpu.data.evaluation import eval_runs

        infer, make_evs = setup
        evs = make_evs(2)
        runs = eval_runs(infer, evs)
        for ev, run in zip(evs, runs):
            assert len(ev.results) == 2  # one per sequence: plots work
            assert run[0]["t_rmse"] == pytest.approx(
                ev.results[0]["t_rmse"])
