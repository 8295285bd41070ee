"""Data-layer tests on the synthetic mini-KITTI fixture: loading, the
frame-dropout invariant, windowing shapes, sampler coverage, transforms."""

import numpy as np
import pytest

from ode_vio_tpu.data import transforms as T
from ode_vio_tpu.data.kitti import (
    IMU_FREQ,
    BoundarySafeBatchSampler,
    KittiDataset,
    collate,
    inject_frame_dropout,
    load_sequence,
)
from ode_vio_tpu.data.synthetic import make_kitti_tree
from ode_vio_tpu.utils import geometry as geo


@pytest.fixture(scope="module")
def kitti_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("kitti")
    return make_kitti_tree(root, seqs=("00", "05"), n_frames=36,
                           img_hw=(32, 64), jitter=0.2)


class TestSequenceLoading:
    def test_streams_aligned(self, kitti_root):
        seq = load_sequence(kitti_root, "00")
        n = seq.num_frames
        assert n == 36
        assert seq.abs_poses.shape == (n, 4, 4)
        assert seq.rel_poses.shape == (n - 1, 6)
        assert seq.timestamps.shape == (n,)
        assert seq.imus.shape == (10 * (n - 1) + 1, 6)
        assert np.all(np.diff(seq.timestamps) > 0)

    def test_rel_poses_consistent_with_abs(self, kitti_root):
        seq = load_sequence(kitti_root, "00")
        for k in (0, 7, 20):
            np.testing.assert_allclose(
                geo.relative_pose6dof(seq.abs_poses[k], seq.abs_poses[k + 1]),
                seq.rel_poses[k],
                atol=1e-6,
            )


class TestFrameDropout:
    def test_zero_dropout_identity(self, kitti_root):
        seq = load_sequence(kitti_root, "00")
        out = inject_frame_dropout(seq, 0.0, np.random.default_rng(0))
        assert out is seq

    def test_trajectory_invariant(self, kitti_root):
        """Accumulating the surviving relative poses must reproduce the
        surviving absolute poses exactly (the correctness property the
        reference's off-by-one violates)."""
        seq = load_sequence(kitti_root, "00")
        out = inject_frame_dropout(seq, 0.4, np.random.default_rng(1))
        assert out.num_frames < seq.num_frames
        path = geo.accumulate_path(out.rel_poses)  # starts at identity
        T0 = out.abs_poses[0]
        for k in range(out.num_frames):
            np.testing.assert_allclose(
                T0 @ path[k], out.abs_poses[k], atol=1e-6
            )

    def test_stream_lengths_stay_aligned(self, kitti_root):
        seq = load_sequence(kitti_root, "00")
        out = inject_frame_dropout(seq, 0.5, np.random.default_rng(2))
        n = out.num_frames
        assert len(out.img_paths) == n
        assert out.timestamps.shape == (n,)
        assert out.rel_poses.shape == (n - 1, 6)
        assert out.imus.shape == (10 * (n - 1) + 1, 6)
        assert np.all(np.diff(out.timestamps) > 0)

    def test_first_frames_kept(self, kitti_root):
        seq = load_sequence(kitti_root, "00")
        out = inject_frame_dropout(seq, 0.9, np.random.default_rng(3))
        np.testing.assert_allclose(out.timestamps[0], seq.timestamps[0])
        np.testing.assert_allclose(out.abs_poses[1], seq.abs_poses[1])


class TestWindows:
    def test_dataset_shapes(self, kitti_root):
        ds = KittiDataset(kitti_root, sequence_length=5, train_seqs=["00"],
                          transform=T.Compose([T.Center()]))
        assert len(ds) == 36 - 5
        imgs, imus, gts, ts = ds[0]
        assert imgs.shape == (5, 32, 64, 3)
        assert imus.shape == (10 * 4 + 1, 6)
        assert gts.shape == (4, 6)
        assert ts.shape == (5,)
        assert imgs.min() >= -0.5 and imgs.max() <= 0.5

    def test_windows_do_not_cross_sequences(self, kitti_root):
        ds = KittiDataset(kitti_root, sequence_length=5,
                          train_seqs=["00", "05"])
        folders = [w.folder for w in ds.samples]
        assert folders == ["00"] * 31 + ["05"] * 31

    def test_collate(self, kitti_root):
        ds = KittiDataset(kitti_root, sequence_length=5, train_seqs=["00"],
                          transform=T.Compose([T.Center()]))
        imgs, imus, gts, ts = collate([ds[i] for i in (0, 3, 5)])
        assert imgs.shape == (3, 5, 32, 64, 3)


class TestSampler:
    def test_covers_all_indices_once(self):
        s = BoundarySafeBatchSampler(23, 4, shuffle=True, seed=1)
        seen = [i for b in s for i in b]
        assert sorted(seen) == list(range(23))

    def test_drop_last(self):
        s = BoundarySafeBatchSampler(23, 4, shuffle=False, drop_last=True)
        batches = list(s)
        assert len(batches) == 5 and all(len(b) == 4 for b in batches)

    def test_reshuffles_between_epochs(self):
        s = BoundarySafeBatchSampler(100, 10, shuffle=True, seed=1)
        e1 = [tuple(b) for b in s]
        e2 = [tuple(b) for b in s]
        assert e1 != e2


class TestTransforms:
    def test_hflip_flips_image_and_signs(self):
        rng_always = np.random.default_rng(0)
        t = T.RandomHorizontalFlip(p=1.1, rng=rng_always)
        imgs = np.arange(2 * 4 * 6 * 3, dtype=np.float32).reshape(2, 4, 6, 3)
        imus = np.ones((21, 6), np.float32)
        gts = np.ones((1, 6), np.float32)
        out_i, out_m, out_g, _ = t(imgs, imus, gts, np.arange(2.0))
        np.testing.assert_array_equal(out_i, imgs[:, :, ::-1, :])
        np.testing.assert_array_equal(out_m[:, [1, 3, 5]], -1.0)
        np.testing.assert_array_equal(out_m[:, [0, 2, 4]], 1.0)
        np.testing.assert_array_equal(out_g[0, [1, 2, 3]], -1.0)
        np.testing.assert_array_equal(out_g[0, [0, 4, 5]], 1.0)

    def test_normalize_imu(self):
        t = T.Normalize()
        imus = np.tile(T.KITTI_IMU_MEAN, (5, 1))
        _, out, _, _ = t(np.zeros((1, 2, 2, 3), np.float32), imus,
                         np.zeros((1, 6)), np.arange(1.0))
        np.testing.assert_allclose(out, 0.0, atol=1e-6)

    def test_color_aug_stays_in_range(self):
        t = T.RandomColorAug(p=1.1, rng=np.random.default_rng(0))
        imgs = np.random.default_rng(1).random((2, 4, 6, 3)).astype(np.float32) - 0.5
        out, _, _, _ = t(imgs, np.zeros((21, 6)), np.zeros((1, 6)), np.arange(2.0))
        assert out.min() >= -0.5 - 1e-6 and out.max() <= 0.5 + 1e-6

    def test_resize(self):
        t = T.Resize((16, 32))
        imgs = np.random.default_rng(2).random((2, 32, 64, 3)).astype(np.float32) - 0.5
        out, _, _, _ = t(imgs, None, None, None)
        assert out.shape == (2, 16, 32, 3)
