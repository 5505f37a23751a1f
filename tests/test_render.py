"""Rasterizer correctness: fast vectorized TPU path vs. the literal golden
NumPy implementation (SURVEY.md §4: PSNR-style acceptance; golden stands in
for the CUDA reference, which needs a GPU)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from gsworld_tpu.gs import synthetic
from gsworld_tpu.gs.transform import PosedGaussians
from gsworld_tpu.render import golden as G
from gsworld_tpu.render.binning import bin_gaussians
from gsworld_tpu.render.camera import RasterConfig, camera_from_opencv, make_camera
from gsworld_tpu.render.project import project_gaussians
from gsworld_tpu.render.rasterize import composite_tiles, render
from gsworld_tpu.render.sh import eval_sh


def make_test_scene(n=400, seed=0):
    rng = np.random.default_rng(seed)
    splats = synthetic.make_blob(rng, n, [0.0, 0.0, 0.0], 0.5,
                                 [0.6, 0.4, 0.3], 0, log_scale_mean=-3.0)
    return splats


def front_camera(dist=2.0, fov_tan=0.5):
    # OpenCV convention: +z forward; camera at world (0,0,-dist) looking at +z
    w2c = np.eye(4, dtype=np.float32)
    w2c[2, 3] = dist
    return w2c, fov_tan


def posed_from_splats(splats):
    return PosedGaussians(
        means=jnp.asarray(splats["means"]),
        log_scales=jnp.asarray(splats["scales"]),
        quats=jnp.asarray(splats["quats"]),
        logit_opacities=jnp.asarray(splats["opacities"].reshape(-1)),
    )


def psnr(a, b):
    mse = np.mean((np.asarray(a, np.float64) - np.asarray(b, np.float64)) ** 2)
    return 10 * np.log10(1.0 / max(mse, 1e-12))


class TestSH:
    def test_degree0_constant(self):
        sh0 = jnp.asarray([[1.0, 0.5, -0.2]])
        shN = jnp.zeros((1, 45))
        for d in [np.array([[0, 0, 1.0]]), np.array([[1.0, 0, 0]])]:
            c = np.asarray(eval_sh(sh0, shN, jnp.asarray(d), 0))
            np.testing.assert_allclose(
                c, np.maximum(0.28209479177387814 * np.array([[1, 0.5, -0.2]]) + 0.5, 0),
                atol=1e-6)

    def test_matches_golden(self):
        rng = np.random.default_rng(3)
        sh0 = rng.normal(size=(32, 3))
        shn = rng.normal(size=(32, 45)) * 0.3
        dirs = rng.normal(size=(32, 3))
        dirs /= np.linalg.norm(dirs, axis=1, keepdims=True)
        ours = np.asarray(eval_sh(jnp.asarray(sh0, jnp.float32),
                                  jnp.asarray(shn, jnp.float32),
                                  jnp.asarray(dirs, jnp.float32), 3))
        ref = G._eval_sh(sh0, shn, dirs, 3)
        np.testing.assert_allclose(ours, ref, atol=1e-5)


class TestProjection:
    def test_center_gaussian_projects_to_image_center(self):
        cfg = RasterConfig(width=64, height=64, max_per_tile=64)
        w2c, tanf = front_camera()
        cam = make_camera(w2c, tanf, tanf)
        g = PosedGaussians(
            means=jnp.asarray([[0.0, 0.0, 0.0]]),
            log_scales=jnp.full((1, 3), -2.0),
            quats=jnp.asarray([[1.0, 0, 0, 0]]),
            logit_opacities=jnp.asarray([3.0]),
        )
        proj = project_gaussians(g, cam, cfg, jnp.zeros((1, 3)), jnp.zeros((1, 45)))
        # ndc 0 -> pixel (W-1)/2 = 31.5
        np.testing.assert_allclose(np.asarray(proj.mean2d[0]), [31.5, 31.5], atol=1e-4)
        np.testing.assert_allclose(float(proj.depth[0]), 2.0, atol=1e-5)
        assert int(proj.radius[0]) > 0

    def test_behind_camera_culled(self):
        cfg = RasterConfig(width=64, height=64, max_per_tile=64)
        w2c, tanf = front_camera()
        cam = make_camera(w2c, tanf, tanf)
        g = PosedGaussians(
            means=jnp.asarray([[0.0, 0.0, -5.0]]),   # behind camera
            log_scales=jnp.full((1, 3), -2.0),
            quats=jnp.asarray([[1.0, 0, 0, 0]]),
            logit_opacities=jnp.asarray([3.0]),
        )
        proj = project_gaussians(g, cam, cfg, jnp.zeros((1, 3)), jnp.zeros((1, 45)))
        assert int(proj.radius[0]) == 0
        assert np.isinf(float(proj.depth[0]))


class TestBinning:
    def test_counts_and_overflow(self):
        splats = make_test_scene(300)
        cfg = RasterConfig(width=64, height=64, max_per_tile=512, tile_chunk=8)
        w2c, tanf = front_camera()
        cam = make_camera(w2c, tanf, tanf)
        g = posed_from_splats(splats)
        proj = project_gaussians(g, cam, cfg, jnp.asarray(splats["sh0"].reshape(-1, 3)),
                                 jnp.asarray(splats["shN"].reshape(-1, 45)))
        bins = bin_gaussians(proj, cfg)
        assert int(bins.overflow) == 0
        # each listed gaussian's rect must contain its tile
        lists = np.asarray(bins.lists)
        rect = np.asarray(proj.rect)
        for tid in range(cfg.num_tiles):
            tx, ty = tid % cfg.tiles_x, tid // cfg.tiles_x
            ids = lists[tid][lists[tid] >= 0]
            assert (rect[ids, 0] <= tx).all() and (tx < rect[ids, 2]).all()
            assert (rect[ids, 1] <= ty).all() and (ty < rect[ids, 3]).all()
        # depth-sorted within each tile
        depth = np.asarray(proj.depth)
        for tid in range(cfg.num_tiles):
            ids = lists[tid][lists[tid] >= 0]
            d = depth[ids]
            assert (np.diff(d) >= 0).all()

    def test_overflow_reported(self):
        splats = make_test_scene(300)
        cfg = RasterConfig(width=64, height=64, max_per_tile=8, tile_chunk=8)
        w2c, tanf = front_camera()
        cam = make_camera(w2c, tanf, tanf)
        g = posed_from_splats(splats)
        proj = project_gaussians(g, cam, cfg, jnp.asarray(splats["sh0"].reshape(-1, 3)),
                                 jnp.asarray(splats["shN"].reshape(-1, 45)))
        bins = bin_gaussians(proj, cfg)
        assert int(bins.overflow) > 0
        assert int(np.asarray(bins.counts).max()) <= 8


class TestRasterizeVsGolden:
    @pytest.mark.parametrize("seed,n", [(0, 200), (5, 500)])
    def test_matches_golden(self, seed, n):
        splats = make_test_scene(n, seed)
        cfg = RasterConfig(width=64, height=48, max_per_tile=1024, tile_chunk=4)
        w2c, tanf = front_camera()
        cam = make_camera(w2c, tanf, tanf)
        g = posed_from_splats(splats)
        sh0 = jnp.asarray(splats["sh0"].reshape(-1, 3))
        shN = jnp.asarray(splats["shN"].reshape(-1, 45))
        img = np.asarray(render(g, cam, cfg, sh0, shN))
        ref = G.golden_render(
            splats["means"], splats["scales"], splats["quats"],
            splats["opacities"].reshape(-1), splats["sh0"].reshape(-1, 3),
            splats["shN"].reshape(-1, 45), w2c, tanf, tanf, cfg)
        p = psnr(img, np.clip(ref, 0, 10))
        assert p > 45.0, f"PSNR vs golden = {p:.2f}"

    def test_nonzero_background(self):
        splats = make_test_scene(100)
        cfg = RasterConfig(width=32, height=32, max_per_tile=512,
                           bg=(1.0, 0.0, 0.5), tile_chunk=4)
        w2c, tanf = front_camera()
        cam = make_camera(w2c, tanf, tanf)
        g = posed_from_splats(splats)
        sh0 = jnp.asarray(splats["sh0"].reshape(-1, 3))
        shN = jnp.asarray(splats["shN"].reshape(-1, 45))
        img = np.asarray(render(g, cam, cfg, sh0, shN))
        ref = G.golden_render(
            splats["means"], splats["scales"], splats["quats"],
            splats["opacities"].reshape(-1), splats["sh0"].reshape(-1, 3),
            splats["shN"].reshape(-1, 45), w2c, tanf, tanf, cfg)
        assert psnr(img, np.clip(ref, 0, 10)) > 45.0

    def test_empty_scene_renders_bg(self):
        cfg = RasterConfig(width=32, height=32, max_per_tile=16,
                           bg=(0.25, 0.5, 0.75), tile_chunk=4)
        w2c, tanf = front_camera()
        cam = make_camera(w2c, tanf, tanf)
        g = PosedGaussians(
            means=jnp.zeros((4, 3)) + jnp.asarray([0, 0, -9.0]),  # all behind
            log_scales=jnp.full((4, 3), -2.0),
            quats=jnp.tile(jnp.asarray([[1.0, 0, 0, 0]]), (4, 1)),
            logit_opacities=jnp.full((4,), 3.0))
        img = np.asarray(render(g, cam, cfg, jnp.zeros((4, 3)), jnp.zeros((4, 45))))
        np.testing.assert_allclose(img, np.broadcast_to([0.25, 0.5, 0.75], (32, 32, 3)),
                                   atol=1e-6)

    def test_jit_and_vmap(self):
        splats = make_test_scene(150)
        cfg = RasterConfig(width=32, height=32, max_per_tile=256, tile_chunk=4)
        w2c, tanf = front_camera()
        g = posed_from_splats(splats)
        sh0 = jnp.asarray(splats["sh0"].reshape(-1, 3))
        shN = jnp.asarray(splats["shN"].reshape(-1, 45))
        B = 3
        cams = jax.vmap(lambda d: make_camera(
            jnp.asarray(w2c).at[2, 3].set(2.0 + d), tanf, tanf))(jnp.arange(B, dtype=jnp.float32) * 0.3)
        gb = jax.tree.map(lambda x: jnp.broadcast_to(x, (B,) + x.shape), g)
        fn = jax.jit(jax.vmap(lambda gg, cc: render(gg, cc, cfg, sh0, shN)))
        imgs = np.asarray(fn(gb, cams))
        assert imgs.shape == (B, 32, 32, 3)
        # farther camera -> smaller splat footprint -> dimmer total
        sums = imgs.sum(axis=(1, 2, 3))
        assert sums[0] > sums[-1]


class TestCompositeBackward:
    """The hand-derived custom VJP must match XLA autodiff through the raw
    compositor (the analog of testing backward.cu against a reference
    autograd implementation)."""

    def test_custom_vjp_matches_autodiff(self):
        from gsworld_tpu.render import rasterize as R
        splats = make_test_scene(600, seed=3)
        cfg = RasterConfig(width=96, height=64, max_per_tile=256,
                           max_tiles_per_gaussian=16, tile_chunk=4)
        w2c, tanf = front_camera()
        cam = make_camera(w2c, tanf, tanf)
        g = posed_from_splats(splats)
        sh0 = jnp.asarray(splats["sh0"].reshape(-1, 3))
        shN = jnp.asarray(splats["shN"].reshape(-1, 45))
        proj = project_gaussians(g, cam, cfg, sh0, shN)
        bins = bin_gaussians(proj, cfg)
        floats = dict(mean2d=proj.mean2d, conic=proj.conic,
                      color=proj.color, opacity=proj.opacity)
        key = jax.random.PRNGKey(0)
        ct_img = jax.random.normal(key, (64, 96, 3))
        ct_T = jax.random.normal(jax.random.fold_in(key, 1), (64, 96))

        def loss_ref(fp):
            img, T = R._composite_impl(fp["mean2d"], fp["conic"],
                                       fp["color"], fp["opacity"],
                                       bins.lists, cfg)
            return jnp.sum(img * ct_img) + jnp.sum(T * ct_T)

        def loss_custom(fp):
            img, T = R._composite_diff(cfg, fp, bins.lists)
            return jnp.sum(img * ct_img) + jnp.sum(T * ct_T)

        v1, g1 = jax.value_and_grad(loss_ref)(floats)
        v2, g2 = jax.value_and_grad(loss_custom)(floats)
        np.testing.assert_allclose(float(v1), float(v2), rtol=1e-5)
        for k in floats:
            a, b = np.asarray(g1[k]), np.asarray(g2[k])
            scale = max(np.abs(a).max(), 1e-8)
            rel = np.abs(a - b).max() / scale
            assert rel < 2e-4, f"{k}: rel err {rel:.3e}"

    def test_grad_memory_path_runs_at_chunked_sizes(self):
        # exercise padding (num_tiles not divisible by tile_chunk) + T-only
        # cotangent
        from gsworld_tpu.render import rasterize as R
        splats = make_test_scene(200, seed=5)
        cfg = RasterConfig(width=80, height=48, max_per_tile=128,
                           max_tiles_per_gaussian=8, tile_chunk=7)
        w2c, tanf = front_camera()
        cam = make_camera(w2c, tanf, tanf)
        g = posed_from_splats(splats)
        sh0 = jnp.asarray(splats["sh0"].reshape(-1, 3))
        shN = jnp.asarray(splats["shN"].reshape(-1, 45))
        proj = project_gaussians(g, cam, cfg, sh0, shN)
        bins = bin_gaussians(proj, cfg)
        floats = dict(mean2d=proj.mean2d, conic=proj.conic,
                      color=proj.color, opacity=proj.opacity)
        grad = jax.grad(lambda fp: jnp.sum(
            R._composite_diff(cfg, fp, bins.lists)[1]))(floats)
        for k, v in grad.items():
            assert np.all(np.isfinite(np.asarray(v))), k


class TestPallasVsXlaMidscale:
    def test_pallas_vs_xla_midscale(self):
        """Mid-scale fidelity guard (VERDICT r2 #6): the production path
        (fused binning + Pallas compositor) vs the generous-cap XLA dense
        path at 320x240 / ~9k gaussians — big enough that the rect cap,
        entry budget, two-level searchsorted windows, and multi-chunk tile
        walks all bind, unlike the 64x48 toy parity tests above.  The
        bench-scale (640x480, ~220k) TPU number lives in PARITY.md
        ("Render fidelity", tools/render_parity.py)."""
        from gsworld_tpu.render.binning import bin_entries_fused
        from gsworld_tpu.render.rasterize_pallas import (
            composite_tiles_pallas,
            pack_record_columns,
        )
        splats = synthetic.make_tabletop_scene(
            seed=3, n_background=6000, n_per_link=400, n_per_object=500,
            link_labels={f"l{i}": i for i in range(4)},
            object_labels={"a": 100, "b": 101})
        g = posed_from_splats(splats)
        sh0 = jnp.asarray(splats["sh0"].reshape(-1, 3))
        shN = jnp.asarray(splats["shN"].reshape(-1, 45))
        w2c = np.eye(4, dtype=np.float32)
        w2c[:3, 3] = [-0.3, 0.0, 1.5]
        cam = make_camera(w2c, 0.6, 0.45)

        ref_cfg = RasterConfig(width=320, height=240, tile=16,
                               max_per_tile=4096, max_tiles_per_gaussian=64,
                               tile_chunk=8, backend="xla")
        proj_ref = project_gaussians(g, cam, ref_cfg, sh0, shN)
        ref_bins = bin_gaussians(proj_ref, ref_cfg)
        # the reference itself must be uncapped: a hot tile overflowing
        # the generous caps would silently degrade the oracle (ADVICE r3)
        assert int(np.asarray(ref_bins.overflow)) == 0
        ref_img, _ = composite_tiles(proj_ref, ref_bins, ref_cfg)

        cfg = RasterConfig(width=320, height=240, tile=32, max_per_tile=1024,
                           max_tiles_per_gaussian=64, tile_chunk=16,
                           max_entries=1 << 16)
        proj = project_gaussians(g, cam, cfg, sh0, shN)
        bins = bin_entries_fused(proj, cfg, pack_record_columns(proj, None))
        img, _ = composite_tiles_pallas(proj, bins, cfg, interpret=True)
        assert int(np.asarray(bins.overflow)) == 0
        p = psnr(img, ref_img)
        assert p > 30.0, f"midscale PSNR vs uncapped XLA = {p:.2f} dB"
