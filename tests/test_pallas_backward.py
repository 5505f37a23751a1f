"""Pallas backward-kernel parity vs the hand-derived XLA custom VJP
(interpret mode on CPU).

The XLA VJP (rasterize._composite_diff_bwd) is itself verified against
autodiff (test_render.py); with caps that don't bind, the segment stream
and the dense lists select identical entries in identical order, so the
Pallas backward must reproduce its gradients up to the split-bf16 prefix
sums (~1e-5 relative) and 10-bit forward color quantization (absent in
the backward records, which carry f32 colors).
"""

import numpy as np

import jax
import jax.numpy as jnp

from tests.test_pallas_kernel import _setup
from gsworld_tpu.render.binning import bin_entries, bin_gaussians
from gsworld_tpu.render.rasterize import (
    _composite_diff,
    _composite_pallas_diff,
)


def _floats_aux(proj, cfg):
    # pre-quantize colors to the kernel's 10-bit grid so the XLA and
    # Pallas forwards are numerically identical (quantization is
    # idempotent); this isolates the backward-kernel math from the
    # forward's color-encoding error
    c = jnp.round(jnp.clip(proj.color / 4.0, 0.0, 1.0) * 1023.0) \
        / 1023.0 * 4.0
    proj = proj._replace(color=c)
    floats = dict(mean2d=proj.mean2d, conic=proj.conic,
                  color=proj.color, opacity=proj.opacity)
    ebins = bin_entries(proj, cfg)
    aux = (proj.radius, jax.lax.stop_gradient(proj.depth), proj.rect, ebins)
    return floats, aux, proj


class TestPallasBackward:
    def test_grads_match_xla_vjp(self):
        proj, cfg = _setup(n=300)
        floats, aux, proj = _floats_aux(proj, cfg)
        lists = bin_gaussians(proj, cfg).lists
        key = jax.random.PRNGKey(3)
        W = jax.random.normal(key, (cfg.height, cfg.width, 3))

        def loss_xla(fp):
            img, _ = _composite_diff(cfg, fp, lists)
            return jnp.sum(img * W)

        def loss_pallas(fp):
            img, _ = _composite_pallas_diff(cfg, fp, aux)
            return jnp.sum(img * W)

        v1, g1 = jax.value_and_grad(loss_xla)(floats)
        v2, g2 = jax.value_and_grad(loss_pallas)(floats)
        assert abs(float(v1) - float(v2)) < 1e-3 * max(1.0, abs(float(v1)))
        # identical forwards (pre-quantized colors); residual error is the
        # kernel's split-bf16 prefix sums
        for k in g1:
            a, b = np.asarray(g1[k]), np.asarray(g2[k])
            scale = np.abs(a).max() + 1e-8
            np.testing.assert_allclose(b / scale, a / scale, atol=1e-3,
                                       err_msg=k)

    def test_grads_match_through_T_cotangent(self):
        proj, cfg = _setup(n=200, bg=(0.2, 0.5, 0.1))
        floats, aux, proj = _floats_aux(proj, cfg)
        lists = bin_gaussians(proj, cfg).lists

        def loss_xla(fp):
            img, T = _composite_diff(cfg, fp, lists)
            return jnp.sum(img) + 0.5 * jnp.sum(T)

        def loss_pallas(fp):
            img, T = _composite_pallas_diff(cfg, fp, aux)
            return jnp.sum(img) + 0.5 * jnp.sum(T)

        g1 = jax.grad(loss_xla)(floats)
        g2 = jax.grad(loss_pallas)(floats)
        for k in g1:
            a, b = np.asarray(g1[k]), np.asarray(g2[k])
            scale = np.abs(a).max() + 1e-8
            np.testing.assert_allclose(b / scale, a / scale, atol=1e-3,
                                       err_msg=k)

    def test_render_is_differentiable_on_pallas_backend(self):
        """jax.grad flows through render() with backend='pallas' end to end
        (posed gaussians -> projection -> kernel VJP)."""
        import dataclasses

        from tests.test_pallas_kernel import _setup as _s  # noqa: F401
        from gsworld_tpu.gs import synthetic
        from gsworld_tpu.gs.transform import PosedGaussians
        from gsworld_tpu.render.camera import RasterConfig, make_camera
        from gsworld_tpu.render.rasterize import render

        rng = np.random.default_rng(1)
        splats = synthetic.make_blob(rng, 150, [0, 0, 0], 0.4,
                                     [0.6, 0.4, 0.3], 0, log_scale_mean=-3.0)
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
        cfg = RasterConfig(width=32, height=32, max_per_tile=256,
                           tile_chunk=4, max_entries=1024,
                           max_tiles_per_gaussian=16, backend="pallas")

        def loss(means):
            img = render(g._replace(means=means), cam, cfg, sh0, shN)
            return jnp.mean(img)

        val = float(loss(g.means))
        grads = jax.grad(loss)(g.means)
        assert np.isfinite(val)
        assert np.isfinite(np.asarray(grads)).all()
        assert float(jnp.abs(grads).max()) > 0.0
