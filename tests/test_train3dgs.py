"""3DGS training: loss functions, densify/prune invariants, and an
end-to-end fit test (train a perturbed scene toward rendered targets)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from gsworld_tpu.gs import synthetic
from gsworld_tpu.gs.model import scene_from_splats
from gsworld_tpu.render.camera import RasterConfig, make_camera
from gsworld_tpu.train3dgs import densify as D
from gsworld_tpu.train3dgs.loss import gs_loss, l1_loss, psnr, ssim
from gsworld_tpu.train3dgs.optim import OptimizationParams, expon_lr_schedule
from gsworld_tpu.train3dgs.train import render_trainable, train


def tiny_scene(n=150, seed=0):
    rng = np.random.default_rng(seed)
    splats = synthetic.make_blob(rng, n, [0, 0, 0], 0.4, [0.7, 0.3, 0.2], 0,
                                 log_scale_mean=-2.5)
    return scene_from_splats(splats)


def cams_around(dist=2.0, n=3):
    cams = []
    for i in range(n):
        ang = i * 0.3 - 0.3
        w2c = np.eye(4, dtype=np.float32)
        c, s = np.cos(ang), np.sin(ang)
        w2c[:3, :3] = np.array([[c, 0, -s], [0, 1, 0], [s, 0, c]], np.float32)
        w2c[2, 3] = dist
        cams.append(make_camera(w2c, 0.5, 0.5))
    return cams


class TestLoss:
    def test_ssim_identity(self):
        img = jnp.asarray(np.random.default_rng(0).random((32, 32, 3)),
                          jnp.float32)
        assert float(ssim(img, img)) == pytest.approx(1.0, abs=1e-5)
        assert float(gs_loss(img, img)) == pytest.approx(0.0, abs=1e-5)

    def test_ssim_decreases_with_noise(self):
        rng = np.random.default_rng(1)
        img = jnp.asarray(rng.random((32, 32, 3)), jnp.float32)
        noisy = jnp.clip(img + 0.2 * jnp.asarray(rng.normal(size=(32, 32, 3)),
                                                 jnp.float32), 0, 1)
        assert float(ssim(img, noisy)) < 0.95

    def test_expon_schedule_endpoints(self):
        s = expon_lr_schedule(1.6e-4, 1.6e-6, 1000)
        assert float(s(0)) == pytest.approx(1.6e-4, rel=1e-5)
        assert float(s(1000)) == pytest.approx(1.6e-6, rel=1e-5)


class TestDensify:
    def test_pad_and_alive(self):
        scene = tiny_scene(100)
        padded = D.pad_scene_capacity(scene, 256)
        ds = D.init_densify_state(256, 100)
        assert padded.num_gaussians == 256
        assert int(ds.alive.sum()) == 100
        # dead slots must never render: opacity logit -10
        assert float(padded.logit_opacities[200]) == -10.0

    def test_prune_low_opacity(self):
        scene = D.pad_scene_capacity(tiny_scene(100), 128)
        scene = scene.replace(
            logit_opacities=scene.logit_opacities.at[:10].set(-8.0))
        ds = D.init_densify_state(128, 100)
        scene2, ds2, _ = D.densify_and_prune(scene, ds, jax.random.PRNGKey(0))
        assert int(ds2.alive[:10].sum()) == 0
        assert int(ds2.alive.sum()) == 90

    def test_densify_fills_dead_slots(self):
        scene = D.pad_scene_capacity(tiny_scene(100), 160)
        ds = D.init_densify_state(160, 100)
        # pretend the first 20 gaussians have huge viewspace gradients
        ds = ds._replace(
            grad_accum=ds.grad_accum.at[:20].set(1.0),
            denom=ds.denom + 1.0)
        scene2, ds2, _ = D.densify_and_prune(scene, ds, jax.random.PRNGKey(0))
        assert int(ds2.alive.sum()) == 120

    def test_opacity_reset(self):
        scene = tiny_scene(50)
        scene2 = D.reset_opacity(scene)
        op = 1 / (1 + np.exp(-np.asarray(scene2.logit_opacities)))
        assert (op <= 0.0101).all()


class TestEndToEndFit:
    def test_loss_decreases(self):
        cfg = RasterConfig(width=48, height=48, max_per_tile=256,
                           tile_chunk=3, backend="xla")
        target_scene = tiny_scene(120, seed=2)
        cams = cams_around(n=2)
        targets = []
        for c in cams:
            img, _ = render_trainable(
                target_scene, jnp.zeros((120, 2)), c, cfg)
            targets.append(img)
        # perturb: jitter colors and positions
        rng = np.random.default_rng(3)
        start = target_scene.replace(
            means=target_scene.means
            + 0.01 * jnp.asarray(rng.normal(size=(120, 3)), jnp.float32),
            sh0=target_scene.sh0
            + 0.3 * jnp.asarray(rng.normal(size=(120, 3)), jnp.float32))
        params = OptimizationParams(densify_from_iter=10_000)  # no densify
        scene2, ds, losses = train(start, cams, targets, cfg, params=params,
                                   capacity=128, iterations=60)
        assert losses[-1] < losses[0] * 0.7, (losses[0], losses[-1])
