"""Pallas segment-compositor parity vs the XLA reference path (interpret
mode on CPU; on-TPU parity is cross-checked in the perf harness).

With caps that don't bind (D >= max tile footprint, ample E/K) the
entry-stream binning (bin_entries) and the dense-list binning
(bin_gaussians) select identical entry sets in identical (tile, depth)
order, so the two compositors must agree up to the 10-bit color encoding.
"""

import numpy as np

import jax
import jax.numpy as jnp

from gsworld_tpu.gs import synthetic
from gsworld_tpu.gs.transform import PosedGaussians
from gsworld_tpu.render.binning import bin_entries, bin_gaussians
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
    cfg_kw.setdefault("max_tiles_per_gaussian", 64)
    # max_per_tile must not bind for the XLA/pallas entry sets to match:
    # at the tile=32 default a single tile can hold every test gaussian
    cfg = RasterConfig(width=64, height=48, max_per_tile=512, tile_chunk=4,
                       max_entries=2048, **cfg_kw)
    proj = project_gaussians(g, cam, cfg, sh0, shN)
    return proj, cfg


def _psnr(a, b):
    mse = float(np.mean((np.asarray(a) - np.asarray(b)) ** 2))
    return 10 * np.log10(1.0 / max(mse, 1e-12))


class TestPallasParity:
    def test_matches_xla_path(self):
        proj, cfg = _setup()
        ix, tx = composite_tiles(proj, bin_gaussians(proj, cfg), cfg)
        ip, tp = composite_tiles_pallas(proj, bin_entries(proj, cfg), cfg,
                                        interpret=True)
        # colors ride a 10-bit fixed-point encoding (<=0.4% error) and the
        # prefix transmittance a split-bf16 two-pass matmul (~2^-18 relative
        # per term, <=6e-3 absolute over a 128 chunk): compare by PSNR, and
        # transmittance within the split-bf16 bound
        assert _psnr(ip, ix) > 50.0, f"PSNR vs XLA path {_psnr(ip, ix):.1f}"
        np.testing.assert_allclose(np.asarray(tp), np.asarray(tx), atol=6e-3)

    def test_background_and_empty_tiles(self):
        proj, cfg = _setup(n=30, bg=(0.9, 0.1, 0.3))
        ix, _ = composite_tiles(proj, bin_gaussians(proj, cfg), cfg)
        ip, _ = composite_tiles_pallas(proj, bin_entries(proj, cfg), cfg,
                                       interpret=True)
        assert _psnr(ip, ix) > 50.0

    def test_segmentation_matches_xla(self):
        proj, cfg = _setup(n=300, seed=7)
        sem = jnp.asarray(np.random.default_rng(7).integers(
            0, 12, proj.depth.shape[0]), jnp.int32)
        ix, _, sx = composite_tiles(proj, bin_gaussians(proj, cfg), cfg, sem)
        ip, _, sp = composite_tiles_pallas(
            proj, bin_entries(proj, cfg), cfg, semantics=sem, interpret=True)
        assert _psnr(ip, ix) > 50.0
        sx, sp = np.asarray(sx), np.asarray(sp)
        # near-ties in blend weight may resolve differently; allow a sliver
        mismatch = float(np.mean(sx != sp))
        assert mismatch < 0.02, f"seg mismatch fraction {mismatch:.3f}"
        assert (sp == -1).any()  # background present

    def test_batched_frames_match_unbatched(self):
        """The multi-frame grid path (envs x cameras in one pallas call)
        must agree with per-frame composition."""
        proj, cfg = _setup(n=250, seed=5)
        bins = bin_entries(proj, cfg)
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
        proj, cfg = _setup(n=200, seed=3)
        bins = bin_entries(proj, cfg)
        ref, _ = composite_tiles_pallas(proj, bins, cfg, interpret=True,
                                        tiles_per_program=1)
        for tpb in (2, 4):
            out, _ = composite_tiles_pallas(proj, bins, cfg, interpret=True,
                                            tiles_per_program=tpb)
            np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                       atol=1e-5)

    def test_fused_binning_matches_and_orders_by_depth(self):
        """bin_entries_fused must reproduce bin_entries' segments with
        per-tile depth ordering — including when culled gaussians carry
        inf/NaN projection values (regression: the emit kernel's one-hot
        MXU select turns a single inf in the 256-rank window into NaN
        depth keys, scrambling within-tile order)."""
        from gsworld_tpu.render.binning import bin_entries_fused
        from gsworld_tpu.render.rasterize_pallas import pack_record_columns
        proj, cfg = _setup(n=400, seed=13)
        # poison culled rows the way a real projection can (inv_w blowup)
        culled = np.asarray(proj.radius) == 0
        if culled.any():
            m2d = np.asarray(proj.mean2d)
            m2d[culled] = np.inf
            proj = proj._replace(mean2d=jnp.asarray(m2d))
        import dataclasses
        cfg = dataclasses.replace(cfg, cull_alpha=False)  # exact membership
        ref = bin_entries(proj, cfg)
        fused = bin_entries_fused(proj, cfg, pack_record_columns(proj, None))
        np.testing.assert_array_equal(np.asarray(ref.starts),
                                      np.asarray(fused.starts))
        depth = np.asarray(proj.depth)
        g = np.asarray(fused.gaussian)
        starts = np.asarray(fused.starts)
        for t in range(cfg.num_tiles):
            s0, s1 = int(starts[t]), int(starts[t + 1])
            seg = g[s0:s1]
            np.testing.assert_array_equal(
                np.sort(np.asarray(ref.gaussian[s0:s1])), np.sort(seg))
            d = depth[seg]
            assert np.isfinite(d).all(), f"tile {t}: culled entry emitted"
            # ranks come from the top-23 bits of the depth pattern: order
            # is exact except ties within 2^-15 relative depth
            tol = 2.0 ** -15 * d[:-1] if len(d) > 1 else 0.0
            assert (np.diff(d) >= -tol).all(), f"tile {t}: depth order broken"

    def test_cull_alpha_is_lossless_and_drops_entries(self):
        """cull_alpha drops exactly the entries whose max alpha over their
        tile is below the 1/255 compositor skip — the composited image
        must be bit-identical, with measurably fewer live entries."""
        import dataclasses

        from gsworld_tpu.render.binning import bin_entries_fused
        from gsworld_tpu.render.rasterize_pallas import pack_record_columns
        proj, cfg = _setup(n=400, seed=21)
        cfg_off = dataclasses.replace(cfg, cull_alpha=False)
        b_on = bin_entries_fused(proj, cfg, pack_record_columns(proj, None))
        b_off = bin_entries_fused(proj, cfg_off,
                                  pack_record_columns(proj, None))
        n_on = int(b_on.starts[-1])
        n_off = int(b_off.starts[-1])
        assert n_on <= n_off
        i_on, t_on = composite_tiles_pallas(proj, b_on, cfg, interpret=True)
        i_off, t_off = composite_tiles_pallas(proj, b_off, cfg_off,
                                              interpret=True)
        # dropped entries sit below the per-pixel skip, so the images agree
        # up to (a) chunk-regrouping of the split-bf16 prefix matmuls and
        # (b) borderline splats whose bf16-evaluated power straddles the
        # 1/255 threshold — both bounded well under 1e-2
        np.testing.assert_allclose(np.asarray(i_on), np.asarray(i_off),
                                   atol=1e-2)
        np.testing.assert_allclose(np.asarray(t_on), np.asarray(t_off),
                                   atol=1e-2)
        assert _psnr(i_on, i_off) > 45.0

    def test_fused_binning_batched_matches_per_frame(self):
        """One leading frame axis through bin_entries_fused must equal
        per-frame calls on the live entry stream (frames fold into the
        emit kernel grid and flat frame-keyed sorts)."""
        from gsworld_tpu.render.binning import bin_entries_fused
        from gsworld_tpu.render.rasterize_pallas import pack_record_columns
        projs = [_setup(n=300, seed=s)[0] for s in (1, 2, 3)]
        cfg = _setup(n=8)[1]
        singles = [bin_entries_fused(p, cfg, pack_record_columns(p, None))
                   for p in projs]
        batched = jax.tree.map(lambda *xs: jnp.stack(xs), *projs)
        fused = bin_entries_fused(batched, cfg,
                                  pack_record_columns(batched, None))
        for i, a in enumerate(singles):
            b = jax.tree.map(lambda x: x[i], fused)
            np.testing.assert_array_equal(np.asarray(a.starts),
                                          np.asarray(b.starts))
            # per-tile membership (exact depth ties may order differently
            # between the two program shapes under the unstable sort)
            sa = np.asarray(a.starts)
            ga, gb = np.asarray(a.gaussian), np.asarray(b.gaussian)
            for t in range(len(sa) - 1):
                np.testing.assert_array_equal(
                    np.sort(ga[sa[t]:sa[t + 1]]),
                    np.sort(gb[sa[t]:sa[t + 1]]))
            depth = np.asarray(projs[i].depth)
            L = int(sa[-1])
            np.testing.assert_allclose(depth[ga[:L]], depth[gb[:L]],
                                       rtol=1e-6)

    def test_entry_cap_drops_farthest_first(self):
        """Shrinking max_entries must drop far entries, keeping the nearest
        content intact (graceful degradation vs the old row-major cut)."""
        proj, cfg = _setup(n=400, seed=11)
        full = bin_entries(proj, cfg)
        total = int(full.starts[-1])
        assert total > 128
        import dataclasses
        small = dataclasses.replace(cfg, max_entries=128)
        capped = bin_entries(proj, small)
        assert int(capped.overflow) >= total - 128
        # the retained entries are the depth-nearest ones per tile
        depth = np.asarray(proj.depth)
        kept = np.asarray(capped.gaussian[:int(capped.starts[-1])])
        dropped_count = total - int(capped.starts[-1])
        assert dropped_count > 0
        assert np.isfinite(depth[kept]).all()

    def test_packed_records_match_unpacked(self):
        """pack_records=True (5 int32 sort operands, in-kernel unpack)
        must reproduce the unpacked fused render within quantization
        error: 1/64-px tile-relative means, bf16 conic, 14-bit opacity,
        exact 10-bit color and semantic ids."""
        import dataclasses

        from gsworld_tpu.render.binning import bin_entries_fused
        from gsworld_tpu.render.rasterize_pallas import pack_record_columns
        proj, cfg = _setup(n=400, seed=11)
        sem = jnp.asarray(np.random.default_rng(3).integers(
            0, 900, proj.depth.shape[0]), jnp.int32)
        cfg_p = dataclasses.replace(cfg, pack_records=True)
        rc = pack_record_columns(proj, sem)
        b_u = bin_entries_fused(proj, cfg, rc, carry_gid=False)
        b_p = bin_entries_fused(proj, cfg_p, rc, carry_gid=False)
        np.testing.assert_array_equal(np.asarray(b_u.starts),
                                      np.asarray(b_p.starts))
        assert len(b_p.payload) == 5 and len(b_u.payload) == 8
        i_u, t_u, s_u = composite_tiles_pallas(proj, b_u, cfg,
                                               semantics=sem, interpret=True)
        i_p, t_p, s_p = composite_tiles_pallas(proj, b_p, cfg_p,
                                               semantics=sem, interpret=True)
        assert _psnr(i_p, i_u) > 40.0, f"packed PSNR {_psnr(i_p, i_u):.1f}"
        np.testing.assert_allclose(np.asarray(t_p), np.asarray(t_u),
                                   atol=2e-2)
        mism = float(np.mean(np.asarray(s_p) != np.asarray(s_u)))
        assert mism < 0.02, f"seg mismatch {mism:.3f}"
