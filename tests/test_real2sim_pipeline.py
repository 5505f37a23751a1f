"""End-to-end real2sim reconstruction: render a synthetic scene from N
cameras, rebuild it from (images + sparse points) via create_from_pcd +
training, and check held-out-view PSNR — the offline-testable core of the
colmap_and_gs.sh flow (reference colmap_and_gs.sh:100-156)."""

import numpy as np
import pytest

import jax.numpy as jnp

from gsworld_tpu.gs import synthetic
from gsworld_tpu.gs.model import scene_from_splats
from gsworld_tpu.gs.pcd_init import C0, create_from_pcd, mean_sq_dist_3nn
from gsworld_tpu.render.camera import RasterConfig, make_camera
from gsworld_tpu.train3dgs.loss import psnr
from gsworld_tpu.train3dgs.train import render_trainable


def ring_cams(n, dist=2.0, span=1.2):
    cams = []
    for i in range(n):
        ang = (i / max(n - 1, 1) - 0.5) * span
        w2c = np.eye(4, dtype=np.float32)
        c, s = np.cos(ang), np.sin(ang)
        w2c[:3, :3] = np.array([[c, 0, -s], [0, 1, 0], [s, 0, c]], np.float32)
        w2c[2, 3] = dist
        cams.append(make_camera(w2c, 0.5, 0.5))
    return cams


class TestCreateFromPcd:
    def test_knn_scale_init(self):
        # regular grid with spacing h: 3-NN mean squared distance = h^2
        h = 0.1
        g = np.stack(np.meshgrid(*[np.arange(4) * h] * 3), -1).reshape(-1, 3)
        d2 = mean_sq_dist_3nn(g)
        np.testing.assert_allclose(d2, h * h, rtol=1e-5)
        scene = create_from_pcd(g, np.full((64, 3), 0.25))
        np.testing.assert_allclose(np.asarray(scene.log_scales),
                                   np.log(h), atol=1e-5)
        # RGB2SH: band-0 eval must reproduce the input color
        np.testing.assert_allclose(np.asarray(scene.sh0) * C0 + 0.5,
                                   0.25, atol=1e-6)
        # opacity = sigmoid(logit) = 0.1; identity quats; zero semantics
        op = 1 / (1 + np.exp(-np.asarray(scene.logit_opacities)))
        np.testing.assert_allclose(op, 0.1, rtol=1e-5)
        assert (np.asarray(scene.quats)[:, 0] == 1).all()
        assert (np.asarray(scene.semantics) == 0).all()

    def test_uint8_colors_accepted(self):
        pts = np.random.default_rng(0).normal(size=(32, 3))
        scene = create_from_pcd(pts, np.full((32, 3), 128, np.uint8))
        np.testing.assert_allclose(np.asarray(scene.sh0) * C0 + 0.5,
                                   128 / 255.0, atol=1e-6)


class TestReconstruction:
    def test_holdout_psnr(self):
        from gsworld_tpu.real2sim.pipeline import train_from_colmap_model
        from gsworld_tpu.train3dgs.optim import OptimizationParams

        cfg = RasterConfig(width=48, height=48, max_per_tile=256,
                           tile_chunk=3, backend="xla")
        rng = np.random.default_rng(4)
        n = 160
        splats = synthetic.make_blob(rng, n, [0, 0, 0], 0.35,
                                     [0.7, 0.3, 0.2], 0, log_scale_mean=-2.6)
        truth = scene_from_splats(splats)
        cams = ring_cams(5)
        imgs = [render_trainable(truth, jnp.zeros((n, 2)), c, cfg)[0]
                for c in cams]
        # hold out an INTERIOR view (interpolation, as in NVS evaluation)
        hold = 2
        train_cams = [c for i, c in enumerate(cams) if i != hold]
        train_imgs = [im for i, im in enumerate(imgs) if i != hold]
        hold_cam, hold_img = cams[hold], imgs[hold]

        # "sparse points" = the true means + colors with noise (what COLMAP
        # triangulation would hand the trainer)
        pts = splats["means"] + rng.normal(scale=5e-3, size=(n, 3))
        cols = np.clip(np.asarray(splats["sh0"]).reshape(n, 3) * C0 + 0.5
                       + rng.normal(scale=0.02, size=(n, 3)), 0, 1)

        params = OptimizationParams(densify_from_iter=40,
                                    densify_until_iter=120,
                                    densification_interval=40,
                                    opacity_reset_interval=10_000)
        scene, losses = train_from_colmap_model(
            pts, cols, train_cams, train_imgs, cfg, params=params,
            iterations=320, capacity=2 * n, seed=0)
        assert losses[-1] < losses[0] * 0.5, (losses[0], losses[-1])

        n2 = scene.num_gaussians
        out, _ = render_trainable(scene, jnp.zeros((n2, 2)), hold_cam, cfg)
        val = float(psnr(out, hold_img))
        assert val > 25.0, f"held-out PSNR {val:.1f} dB"

    def test_scene_config_roundtrip(self, tmp_path):
        from gsworld_tpu.real2sim.pipeline import write_scene_config
        import json
        p = write_scene_config(str(tmp_path / "cfg.json"), "scene.ply",
                               semantic_labels=3)
        cfg = json.load(open(p))
        assert cfg["models"][0]["data_path"] == "scene.ply"
        assert cfg["models"][0]["semantic_labels"] == 3
