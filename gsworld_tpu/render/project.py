"""Gaussian projection: world -> screen 2D stats (EWA splatting preprocess).

Parity port of the preprocess stage of the diff-gaussian-rasterization CUDA
kernel the reference renders through (SURVEY.md §2.3 row 1): view transform,
perspective projection, EWA 2D covariance with the 0.3 dilation, conic +
3-sigma radius, tile rect, SH color, near-plane cull at 0.05 (GSWorld's
patched constant, reference README.md:33).

All plain jnp — XLA fuses this into a handful of elementwise kernels; it
vmaps over a leading env axis and feeds both the pure-JAX and the Pallas
compositors.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from gsworld_tpu.core.maths import _einsum, quat_normalize, quat_to_matrix
from gsworld_tpu.gs.transform import PosedGaussians
from gsworld_tpu.render.camera import GSCamera, RasterConfig, projection_matrix
from gsworld_tpu.render.sh import eval_sh


class Projected(NamedTuple):
    mean2d: jnp.ndarray   # (..., N, 2) pixel coords
    depth: jnp.ndarray    # (..., N) view-space z
    conic: jnp.ndarray    # (..., N, 3) inverse 2D covariance (A, B, C)
    color: jnp.ndarray    # (..., N, 3) SH-evaluated RGB
    opacity: jnp.ndarray  # (..., N) sigmoid(logit)
    radius: jnp.ndarray   # (..., N) int32 pixel radius (0 = culled)
    rect: jnp.ndarray     # (..., N, 4) int32 tile rect (x0, y0, x1, y1), exclusive


def project_gaussians(g: PosedGaussians, cam: GSCamera, cfg: RasterConfig,
                      sh0, shN) -> Projected:
    """Project world-space Gaussians through one camera.

    ``sh0`` (N, 3) / ``shN`` (N, 45) are the scene's static SH tables (colors
    do not change under rigid repose; view direction does).
    Leading batch axes of ``g``/``cam`` broadcast (vmap for per-env cameras).
    """
    W2C = cam.world_view
    Rv = W2C[..., :3, :3]
    tv = W2C[..., :3, 3]

    p_view = _einsum("...ij,...nj->...ni", Rv, g.means) + tv[..., None, :]
    depth = p_view[..., 2]
    valid = depth > cfg.znear_cull

    # --- perspective projection to pixel coords (ndc2Pix convention) ---
    P = projection_matrix(cam.tanfovx, cam.tanfovy, cfg.znear, cfg.zfar)
    p_hom = _einsum("...ij,...nj->...ni",
                    P[..., :4, :4],
                    jnp.concatenate([p_view, jnp.ones_like(depth)[..., None]], -1))
    p_w = 1.0 / (p_hom[..., 3] + 1e-7)
    ndc = p_hom[..., :2] * p_w[..., None]
    wh = jnp.stack([jnp.asarray(cfg.width, jnp.float32),
                    jnp.asarray(cfg.height, jnp.float32)])
    mean2d = ((ndc + 1.0) * wh - 1.0) * 0.5

    # --- 3D covariance ---
    q = quat_normalize(g.quats)
    Rq = quat_to_matrix(q)
    s = jnp.exp(g.log_scales)
    # Sigma = R diag(s^2) R^T
    RS = Rq * s[..., None, :]
    cov3d = _einsum("...nij,...nkj->...nik", RS, RS)

    # --- EWA: J (2x3) with the CUDA clamp of tan(theta) to 1.3*tanfov ---
    focal_x = cfg.width / (2.0 * cam.tanfovx)
    focal_y = cfg.height / (2.0 * cam.tanfovy)
    tz = depth
    limx = 1.3 * cam.tanfovx
    limy = 1.3 * cam.tanfovy
    txtz = jnp.clip(p_view[..., 0] / tz, -limx, limx)
    tytz = jnp.clip(p_view[..., 1] / tz, -limy, limy)
    tx = txtz * tz
    ty = tytz * tz
    zero = jnp.zeros_like(tz)
    J = jnp.stack([
        jnp.stack([focal_x / tz, zero, -(focal_x * tx) / (tz * tz)], axis=-1),
        jnp.stack([zero, focal_y / tz, -(focal_y * ty) / (tz * tz)], axis=-1),
    ], axis=-2)                                           # (..., N, 2, 3)
    Tm = _einsum("...nij,...jk->...nik", J, Rv)           # (..., N, 2, 3)
    cov2d = _einsum("...nij,...njk,...nlk->...nil", Tm, cov3d, Tm)
    c00 = cov2d[..., 0, 0] + 0.3
    c11 = cov2d[..., 1, 1] + 0.3
    c01 = cov2d[..., 0, 1]

    det = c00 * c11 - c01 * c01
    valid = valid & (det != 0.0)
    det_safe = jnp.where(det == 0.0, 1.0, det)
    conic = jnp.stack([c11, -c01, c00], axis=-1) / det_safe[..., None]

    mid = 0.5 * (c00 + c11)
    lam1 = mid + jnp.sqrt(jnp.maximum(0.1, mid * mid - det))
    radius = jnp.ceil(3.0 * jnp.sqrt(lam1)).astype(jnp.int32)

    # --- tile rect (getRect semantics: [min, max) clamped to the grid) ---
    t = cfg.tile
    gx, gy = cfg.tiles_x, cfg.tiles_y
    rf = radius.astype(jnp.float32)
    x0 = jnp.clip(jnp.floor((mean2d[..., 0] - rf) / t), 0, gx).astype(jnp.int32)
    y0 = jnp.clip(jnp.floor((mean2d[..., 1] - rf) / t), 0, gy).astype(jnp.int32)
    x1 = jnp.clip(jnp.floor((mean2d[..., 0] + rf + t - 1) / t), 0, gx).astype(jnp.int32)
    y1 = jnp.clip(jnp.floor((mean2d[..., 1] + rf + t - 1) / t), 0, gy).astype(jnp.int32)
    area = (x1 - x0) * (y1 - y0)
    valid = valid & (area > 0)
    radius = jnp.where(valid, radius, 0)
    rect = jnp.stack([x0, y0, x1, y1], axis=-1)
    # zero the rect of culled gaussians so binning never picks them up
    rect = jnp.where(valid[..., None], rect, 0)

    # --- color from SH along the true view direction ---
    dirs = g.means - cam.cam_center[..., None, :]
    dirs = dirs / jnp.maximum(jnp.linalg.norm(dirs, axis=-1, keepdims=True), 1e-12)
    color = eval_sh(sh0, shN, dirs, cfg.sh_degree)

    opacity = 1.0 / (1.0 + jnp.exp(-g.logit_opacities))

    depth = jnp.where(valid, depth, jnp.inf)
    return Projected(mean2d=mean2d, depth=depth, conic=conic, color=color,
                     opacity=opacity, radius=radius, rect=rect)
