"""Pallas compositor parity vs the XLA reference path (interpret mode on
CPU; on-TPU parity is cross-checked in the perf harness)."""

import numpy as np

import jax.numpy as jnp

from gsworld_tpu.gs import synthetic
from gsworld_tpu.gs.transform import PosedGaussians
from gsworld_tpu.render.binning import bin_gaussians
from gsworld_tpu.render.camera import RasterConfig, make_camera
from gsworld_tpu.render.project import project_gaussians
from gsworld_tpu.render.rasterize import composite_tiles
from gsworld_tpu.render.rasterize_pallas import composite_tiles_pallas


def _setup(n=400, seed=0, **cfg_kw):
    rng = np.random.default_rng(seed)
    splats = synthetic.make_blob(rng, n, [0, 0, 0], 0.5, [0.6, 0.4, 0.3], 0,
                                 log_scale_mean=-3.0)
    g = PosedGaussians(
        means=jnp.asarray(splats["means"]),
        log_scales=jnp.asarray(splats["scales"]),
        quats=jnp.asarray(splats["quats"]),
        logit_opacities=jnp.asarray(splats["opacities"].reshape(-1)))
    sh0 = jnp.asarray(splats["sh0"].reshape(-1, 3))
    shN = jnp.asarray(splats["shN"].reshape(-1, 45))
    w2c = np.eye(4, dtype=np.float32)
    w2c[2, 3] = 2.0
    cam = make_camera(w2c, 0.5, 0.5)
    cfg = RasterConfig(width=64, height=48, max_per_tile=256, tile_chunk=4,
                       **cfg_kw)
    proj = project_gaussians(g, cam, cfg, sh0, shN)
    bins = bin_gaussians(proj, cfg)
    return proj, bins, cfg


class TestPallasParity:
    def test_matches_xla_path(self):
        proj, bins, cfg = _setup()
        ix, tx = composite_tiles(proj, bins, cfg)
        ip, tp = composite_tiles_pallas(proj, bins, cfg, interpret=True)
        # colors ride a 10-bit fixed-point encoding (<=0.4% error): compare
        # by PSNR, and transmittance (no quantization) tightly
        mse = float(np.mean((np.asarray(ip) - np.asarray(ix)) ** 2))
        psnr = 10 * np.log10(1.0 / max(mse, 1e-12))
        assert psnr > 50.0, f"PSNR vs XLA path {psnr:.1f} dB"
        np.testing.assert_allclose(np.asarray(tp), np.asarray(tx), atol=2e-4)

    def test_background_and_empty_tiles(self):
        proj, bins, cfg = _setup(n=30)
        cfg = RasterConfig(width=64, height=48, max_per_tile=256,
                           tile_chunk=4, bg=(0.9, 0.1, 0.3))
        ix, _ = composite_tiles(proj, bins, cfg)
        ip, _ = composite_tiles_pallas(proj, bins, cfg, interpret=True)
        mse = float(np.mean((np.asarray(ip) - np.asarray(ix)) ** 2))
        assert 10 * np.log10(1.0 / max(mse, 1e-12)) > 50.0

    def test_batched_frames_match_unbatched(self):
        """The multi-frame grid path (envs x cameras in one pallas call)
        must agree with per-frame composition."""
        import jax
        proj, bins, cfg = _setup(n=250, seed=5)
        ref, _ = composite_tiles_pallas(proj, bins, cfg, interpret=True)
        F = 3
        projB = jax.tree.map(lambda x: jnp.stack([x] * F), proj)
        binsB = jax.tree.map(lambda x: jnp.stack([x] * F), bins)
        out, _ = composite_tiles_pallas(projB, binsB, cfg, interpret=True)
        assert out.shape[0] == F
        for f in range(F):
            np.testing.assert_allclose(np.asarray(out[f]), np.asarray(ref),
                                       atol=1e-5)

    def test_tiles_per_program_variants(self):
        proj, bins, cfg = _setup(n=200, seed=3)
        ref, _ = composite_tiles_pallas(proj, bins, cfg, interpret=True,
                                        tiles_per_program=1)
        for tpb in (2, 4):
            out, _ = composite_tiles_pallas(proj, bins, cfg, interpret=True,
                                            tiles_per_program=tpb)
            np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                       atol=1e-5)
