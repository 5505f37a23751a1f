"""real2sim toolchain tests: synthetic-geometry golden checks for ArUco
scaling, alignment, label transfer, URDF pcd, COLMAP IO."""

import os

import numpy as np
import pytest

from gsworld_tpu.real2sim import alignment, aruco_scale, colmap_io, label_transfer
from gsworld_tpu.real2sim.urdf_pcd import export_robot_pcd, sample_robot_pcd


def _look_at_c2w(eye, target):
    eye = np.asarray(eye, np.float64)
    fwd = np.asarray(target, np.float64) - eye
    fwd /= np.linalg.norm(fwd)
    up = np.array([0, 0, 1.0])
    right = np.cross(fwd, up)
    right /= np.linalg.norm(right)
    down = np.cross(fwd, right)
    c2w = np.eye(4)
    c2w[:3, 0] = right
    c2w[:3, 1] = down
    c2w[:3, 2] = fwd
    c2w[:3, 3] = eye
    return c2w


class TestArucoScale:
    def test_recovers_known_scale(self):
        """Synthesize a marker seen from several cameras in a world that is
        3.7x too large; the estimator must recover scale = 1/3.7 * ..."""
        world_scale = 3.7     # reconstruction units per meter
        marker_m = 0.1        # real marker size in meters
        # marker corners in the reconstruction frame
        c = marker_m * world_scale / 2
        corners_w = np.array([[-c, -c, 0], [c, -c, 0], [c, c, 0], [-c, c, 0]])
        K = np.array([[600.0, 0, 320], [0, 600, 240], [0, 0, 1]])
        origins, rays, tracks = [], [], {}
        for i, eye in enumerate([[1, 0, 2], [-1, 0.5, 2.2], [0.3, -1, 1.8],
                                 [0.8, 0.9, 2.5]]):
            c2w = _look_at_c2w(np.asarray(eye) * world_scale, [0, 0, 0])
            w2c = np.linalg.inv(c2w)
            cam_pts = corners_w @ w2c[:3, :3].T + w2c[:3, 3]
            px = cam_pts @ K.T
            px = px[:, :2] / px[:, 2:3]
            o, r = aruco_scale.ray_cast_corners(c2w, K, px)
            origins.append(o)
            rays.append(r)
        corners3d = aruco_scale.corners_3d_from_tracks(
            np.asarray(origins), np.asarray(rays))
        np.testing.assert_allclose(corners3d, corners_w, atol=1e-6)
        s = aruco_scale.scale_from_corners(corners3d, marker_m)
        assert s == pytest.approx(1.0 / world_scale, rel=1e-6)


class TestAlignment:
    def test_umeyama_exact(self):
        rng = np.random.default_rng(0)
        src = rng.normal(size=(10, 3))
        ang = 0.7
        R = np.array([[np.cos(ang), -np.sin(ang), 0],
                      [np.sin(ang), np.cos(ang), 0], [0, 0, 1.0]])
        s, t = 0.85, np.array([0.2, -0.1, 0.4])
        dst = s * src @ R.T + t
        T = alignment.umeyama(src, dst)
        np.testing.assert_allclose(T[:3, :3], s * R, atol=1e-8)
        np.testing.assert_allclose(T[:3, 3], t, atol=1e-8)

    def test_icp_refines_noisy_init(self):
        rng = np.random.default_rng(1)
        cloud = rng.uniform(-0.3, 0.3, size=(500, 3))
        ang = 0.3
        R = np.array([[np.cos(ang), 0, np.sin(ang)], [0, 1, 0],
                      [-np.sin(ang), 0, np.cos(ang)]])
        s, t = 0.93, np.array([0.05, 0.1, -0.02])
        dst = s * cloud @ R.T + t
        # init: slightly wrong transform
        T0 = np.eye(4)
        T0[:3, :3] = 0.9 * np.eye(3)
        T0[:3, 3] = t + 0.01
        T, rmse = alignment.icp_point_to_point(cloud, dst, init=T0,
                                               threshold=0.2)
        np.testing.assert_allclose(T[:3, :3], s * R, atol=1e-3)
        assert rmse < 1e-3


class TestLabelTransfer:
    def test_labels_and_bbox_fallback(self):
        rng = np.random.default_rng(2)
        # two labeled clusters in the sim frame
        a = rng.normal(size=(200, 3)) * 0.02 + [0, 0, 0]
        b = rng.normal(size=(200, 3)) * 0.02 + [0.5, 0, 0]
        src = np.concatenate([a, b])
        labels = np.concatenate([np.zeros(200, np.int32),
                                 np.ones(200, np.int32)])
        sim2gs = np.eye(4)
        sim2gs[:3, 3] = [0.1, 0.2, 0.3]   # GS frame is translated
        tgt_sim = np.concatenate([
            rng.normal(size=(50, 3)) * 0.01,            # near cluster 0
            rng.normal(size=(50, 3)) * 0.01 + [0.5, 0, 0],  # near cluster 1
            rng.normal(size=(50, 3)) * 0.01 + [5, 5, 5],    # far background
        ])
        tgt_gs = tgt_sim @ sim2gs[:3, :3].T + sim2gs[:3, 3]
        out, dist = label_transfer.segment_real_gs(
            tgt_gs, src, labels, sim2gs, bbox_distance_threshold=0.1)
        assert (out[:50] == 0).all()
        assert (out[50:100] == 1).all()
        assert (out[100:] == -1).all()


class TestColmapIO:
    def test_roundtrip(self, tmp_path):
        cams = {1: colmap_io.ColmapCamera(1, "PINHOLE", 640, 480,
                                          np.array([600.0, 600, 320, 240]))}
        imgs = {1: colmap_io.ColmapImage(
            1, np.array([1.0, 0, 0, 0]), np.array([0.1, 0.2, 0.3]), 1,
            "img0.png", np.zeros((0, 2)), np.zeros(0, np.int64))}
        pts = (np.array([7]), np.array([[1.0, 2, 3]]),
               np.array([[255, 0, 0]], np.uint8))
        colmap_io.write_model_txt(str(tmp_path), cams, imgs, pts)
        cams2 = colmap_io.read_cameras_txt(str(tmp_path / "cameras.txt"))
        imgs2 = colmap_io.read_images_txt(str(tmp_path / "images.txt"))
        ids, xyz, rgb = colmap_io.read_points3d_txt(
            str(tmp_path / "points3D.txt"))
        np.testing.assert_allclose(cams2[1].K, cams[1].K)
        np.testing.assert_allclose(imgs2[1].tvec, [0.1, 0.2, 0.3])
        np.testing.assert_allclose(xyz, [[1, 2, 3]])


class TestUrdfPcd:
    def test_export(self, tmp_path):
        path = export_robot_pcd("fr3_umi", str(tmp_path), n_points=5000)
        assert os.path.exists(path)
        sem = np.load(str(tmp_path / "fr3_umi_semantics.npy"))
        assert len(sem) == 5000
        # labels drawn from the fr3 semantic map
        assert set(np.unique(sem)) <= set(range(16))
        pts, labs = sample_robot_pcd("fr3_umi", 2000)
        # points near the robot volume at scan pose
        assert np.linalg.norm(pts, axis=1).max() < 1.5
