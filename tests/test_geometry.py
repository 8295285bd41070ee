"""Unit tests for the SE(3)/Euler geometry layer."""

import numpy as np
import pytest

from ode_vio_tpu.utils import geometry as geo


def random_pose6(rng, scale=0.3):
    # keep |ry| < pi/2 so euler extraction is unique
    ang = rng.uniform(-1.2, 1.2, 3) * scale
    t = rng.normal(size=3)
    return np.concatenate([ang, t])


class TestRotations:
    def test_euler_matrix_roundtrip(self, rng):
        for _ in range(50):
            theta = rng.uniform(-1.4, 1.4, 3)
            R = geo.euler_to_matrix(theta)
            assert geo.is_rotation_matrix(R)
            np.testing.assert_allclose(geo.matrix_to_euler(R), theta, atol=1e-10)

    def test_gimbal_lock_branches(self):
        for ry in (np.pi / 2, -np.pi / 2):
            R = geo.euler_to_matrix([0.3, ry, 0.5])
            theta = geo.matrix_to_euler(R)
            # reconstructed matrix must match even though angles are not unique
            np.testing.assert_allclose(geo.euler_to_matrix(theta), R, atol=1e-9)

    def test_rotation_convention_is_zyx(self):
        # R = Rz @ Ry @ Rx per the reference convention
        rx, ry, rz = 0.1, -0.2, 0.3
        cx, sx = np.cos(rx), np.sin(rx)
        cy, sy = np.cos(ry), np.sin(ry)
        cz, sz = np.cos(rz), np.sin(rz)
        Rx = np.array([[1, 0, 0], [0, cx, -sx], [0, sx, cx]])
        Ry = np.array([[cy, 0, sy], [0, 1, 0], [-sy, 0, cy]])
        Rz = np.array([[cz, -sz, 0], [sz, cz, 0], [0, 0, 1]])
        np.testing.assert_allclose(
            geo.euler_to_matrix([rx, ry, rz]), Rz @ Ry @ Rx, atol=1e-12
        )


class TestPoses:
    def test_pose_matrix_roundtrip(self, rng):
        for _ in range(20):
            p = random_pose6(rng)
            np.testing.assert_allclose(
                geo.matrix_to_pose6dof(geo.pose6dof_to_matrix(p)), p, atol=1e-10
            )

    def test_relative_pose_inverts_composition(self, rng):
        p = random_pose6(rng)
        T1 = geo.pose6dof_to_matrix(random_pose6(rng))
        T2 = T1 @ geo.pose6dof_to_matrix(p)
        np.testing.assert_allclose(geo.relative_pose6dof(T1, T2), p, atol=1e-9)

    def test_compose_pose_changes_matches_matrix_product(self, rng):
        p1, p2 = random_pose6(rng), random_pose6(rng)
        composed = geo.compose_pose_changes(p1, p2)
        T = geo.pose6dof_to_matrix(p1) @ geo.pose6dof_to_matrix(p2)
        np.testing.assert_allclose(geo.pose6dof_to_matrix(composed), T, atol=1e-9)

    def test_accumulate_path(self, rng):
        rel = np.stack([random_pose6(rng) for _ in range(10)])
        path = geo.accumulate_path(rel)
        assert len(path) == 11
        np.testing.assert_allclose(path[0], np.eye(4))
        # each consecutive pair differs by exactly the relative pose
        for k in range(10):
            np.testing.assert_allclose(
                geo.relative_pose6dof(path[k], path[k + 1]), rel[k], atol=1e-9
            )


class TestErrors:
    def test_rotation_error_known_angle(self):
        T1 = np.eye(4)
        T2 = np.eye(4)
        T2[:3, :3] = geo.euler_to_matrix([0.0, 0.7, 0.0])
        assert geo.rotation_error(T1, T2) == pytest.approx(0.7, abs=1e-9)

    def test_translation_error_known(self):
        T1, T2 = np.eye(4), np.eye(4)
        T2[:3, 3] = [3.0, 4.0, 0.0]
        assert geo.translation_error(T1, T2) == pytest.approx(5.0)

    def test_rmse_zero_on_identical(self, rng):
        poses = np.stack([random_pose6(rng) for _ in range(5)])
        t, r = geo.rmse_6dof(poses, poses)
        assert t == 0.0 and r == 0.0

    def test_trajectory_distances(self):
        poses = [np.eye(4) for _ in range(4)]
        for i, P in enumerate(poses):
            P = P.copy()
            P[:3, 3] = [i * 2.0, 0, 0]
            poses[i] = P
        dist, speed = geo.trajectory_distances(poses)
        np.testing.assert_allclose(dist, [0, 2, 4, 6])
        np.testing.assert_allclose(speed, [0, 20, 20, 20])

    def test_last_frame_from_segment_length(self):
        dist = np.array([0.0, 1.0, 2.0, 3.0, 4.0])
        assert geo.last_frame_from_segment_length(dist, 0, 2.5) == 3
        assert geo.last_frame_from_segment_length(dist, 0, 10.0) == -1


class TestIO:
    def test_pose_file_roundtrip(self, tmp_path, rng):
        rel = np.stack([random_pose6(rng, scale=0.1) for _ in range(6)])
        path = geo.accumulate_path(rel)
        f = tmp_path / "00.txt"
        geo.save_trajectory(path, f)
        abs_poses, rel_read = geo.read_pose_file(f)
        assert abs_poses.shape == (7, 4, 4)
        np.testing.assert_allclose(rel_read, rel, atol=1e-6)

    def test_time_file(self, tmp_path):
        f = tmp_path / "times.txt"
        np.savetxt(f, np.arange(10) * 0.1)
        ts = geo.read_time_file(f)
        assert ts.shape == (10,)
        np.savetxt(f, [0.0, 0.2, 0.1])
        with pytest.raises(ValueError):
            geo.read_time_file(f)
