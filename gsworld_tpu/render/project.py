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

from gsworld_tpu.core.maths import quat_normalize
from gsworld_tpu.gs.transform import PosedGaussians
from gsworld_tpu.render.camera import GSCamera, RasterConfig
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
    # All math below is written in explicit scalar components: XLA lowers
    # batched (N, 3, 3) einsums to poorly-tiled tiny matmuls on TPU, while
    # component form fuses into a handful of elementwise VPU kernels
    # (measured 4x faster at N=200k).
    W2C = cam.world_view
    Rv = W2C[..., :3, :3]
    tv = W2C[..., :3, 3]
    r = [[Rv[..., i, j, None] for j in range(3)] for i in range(3)]
    mx, my, mz = g.means[..., 0], g.means[..., 1], g.means[..., 2]
    px = r[0][0] * mx + r[0][1] * my + r[0][2] * mz + tv[..., 0, None]
    py = r[1][0] * mx + r[1][1] * my + r[1][2] * mz + tv[..., 1, None]
    pz = r[2][0] * mx + r[2][1] * my + r[2][2] * mz + tv[..., 2, None]
    depth = pz
    valid = depth > cfg.znear_cull

    # --- perspective projection to pixel coords (ndc2Pix convention) ---
    inv_w = 1.0 / (pz + 1e-7)
    ndc_x = (px / cam.tanfovx[..., None]) * inv_w
    ndc_y = (py / cam.tanfovy[..., None]) * inv_w
    mean2d = jnp.stack([
        ((ndc_x + 1.0) * cfg.width - 1.0) * 0.5,
        ((ndc_y + 1.0) * cfg.height - 1.0) * 0.5,
    ], axis=-1)

    # --- 3D covariance Sigma = R diag(s^2) R^T, component form ---
    q = quat_normalize(g.quats)
    qw, qx, qy, qz = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    R00 = 1 - 2 * (qy * qy + qz * qz)
    R01 = 2 * (qx * qy - qw * qz)
    R02 = 2 * (qx * qz + qw * qy)
    R10 = 2 * (qx * qy + qw * qz)
    R11 = 1 - 2 * (qx * qx + qz * qz)
    R12 = 2 * (qy * qz - qw * qx)
    R20 = 2 * (qx * qz - qw * qy)
    R21 = 2 * (qy * qz + qw * qx)
    R22 = 1 - 2 * (qx * qx + qy * qy)
    s2 = jnp.exp(2.0 * g.log_scales)
    s0, s1, s2_ = s2[..., 0], s2[..., 1], s2[..., 2]
    S00 = R00 * R00 * s0 + R01 * R01 * s1 + R02 * R02 * s2_
    S11 = R10 * R10 * s0 + R11 * R11 * s1 + R12 * R12 * s2_
    S22 = R20 * R20 * s0 + R21 * R21 * s1 + R22 * R22 * s2_
    S01 = R00 * R10 * s0 + R01 * R11 * s1 + R02 * R12 * s2_
    S02 = R00 * R20 * s0 + R01 * R21 * s1 + R02 * R22 * s2_
    S12 = R10 * R20 * s0 + R11 * R21 * s1 + R12 * R22 * s2_

    # --- EWA: T = J @ Rv rows, cov2d = T Sigma T^T, component form ---
    focal_x = cfg.width / (2.0 * cam.tanfovx)
    focal_y = cfg.height / (2.0 * cam.tanfovy)
    tz = depth
    limx = 1.3 * cam.tanfovx
    limy = 1.3 * cam.tanfovy
    tx = jnp.clip(px / tz, -limx[..., None], limx[..., None]) * tz
    ty = jnp.clip(py / tz, -limy[..., None], limy[..., None]) * tz
    inv_z = 1.0 / tz
    j00 = focal_x[..., None] * inv_z
    j02 = -(focal_x[..., None] * tx) * inv_z * inv_z
    j11 = focal_y[..., None] * inv_z
    j12 = -(focal_y[..., None] * ty) * inv_z * inv_z
    # T rows: t0 = j00 * Rv[0] + j02 * Rv[2]; t1 = j11 * Rv[1] + j12 * Rv[2]
    t0x = j00 * r[0][0] + j02 * r[2][0]
    t0y = j00 * r[0][1] + j02 * r[2][1]
    t0z = j00 * r[0][2] + j02 * r[2][2]
    t1x = j11 * r[1][0] + j12 * r[2][0]
    t1y = j11 * r[1][1] + j12 * r[2][1]
    t1z = j11 * r[1][2] + j12 * r[2][2]

    def quad(ax, ay, az, bx, by, bz):
        # a^T Sigma b for symmetric Sigma
        return (ax * (S00 * bx + S01 * by + S02 * bz)
                + ay * (S01 * bx + S11 * by + S12 * bz)
                + az * (S02 * bx + S12 * by + S22 * bz))

    c00 = quad(t0x, t0y, t0z, t0x, t0y, t0z) + 0.3
    c11 = quad(t1x, t1y, t1z, t1x, t1y, t1z) + 0.3
    c01 = quad(t0x, t0y, t0z, t1x, t1y, t1z)

    det = c00 * c11 - c01 * c01
    valid = valid & (det != 0.0)
    det_safe = jnp.where(det == 0.0, 1.0, det)
    conic = jnp.stack([c11, -c01, c00], axis=-1) / det_safe[..., None]

    opacity = 1.0 / (1.0 + jnp.exp(-g.logit_opacities))

    mid = 0.5 * (c00 + c11)
    lam1 = mid + jnp.sqrt(jnp.maximum(0.1, mid * mid - det))
    # opacity-aware radius (lossless): alpha = opac * exp(-r^2 / 2 sigma^2)
    # drops below the compositor's 1/255 skip threshold beyond
    # sigma * sqrt(2 ln(255 opac)), so the tighter rect excludes only
    # pixels the kernel would skip anyway (capped at the CUDA kernel's
    # 3 sigma); opac < 1/255 can never contribute -> culled outright
    r2 = 2.0 * jnp.log(jnp.maximum(255.0 * opacity, 1e-6))
    valid = valid & (r2 > 0.0)
    rscale = jnp.sqrt(jnp.clip(r2, 0.0, 9.0))
    radius = jnp.ceil(rscale * jnp.sqrt(lam1)).astype(jnp.int32)

    # --- tile rect (getRect semantics: [min, max) clamped to the grid) ---
    t = cfg.tile
    gx, gy = cfg.tiles_x, cfg.tiles_y
    rf = radius.astype(jnp.float32)
    x0 = jnp.clip(jnp.floor((mean2d[..., 0] - rf) / t), 0, gx).astype(jnp.int32)
    y0 = jnp.clip(jnp.floor((mean2d[..., 1] - rf) / t), 0, gy).astype(jnp.int32)
    x1 = jnp.clip(jnp.floor((mean2d[..., 0] + rf + t - 1) / t), 0, gx).astype(jnp.int32)
    y1 = jnp.clip(jnp.floor((mean2d[..., 1] + rf + t - 1) / t), 0, gy).astype(jnp.int32)

    # centered D-cap: when a rect exceeds the binning duplication cap D,
    # shrink it to a <=D-tile window CENTERED on the splat mean instead of
    # letting binning truncate the row-major walk (which keeps only the
    # TOP rows of the rect — a spatially biased amputation that capped
    # bench-scene fidelity at ~23 dB; the centered window keeps the
    # high-alpha core and clips only the faint fringe)
    D = cfg.max_tiles_per_gaussian
    w_t = x1 - x0
    h_t = y1 - y0
    area = w_t * h_t
    over = area > D
    s = jnp.sqrt(D / jnp.maximum(area, 1).astype(jnp.float32))
    w2 = jnp.clip(jnp.floor(w_t * s), 1, None).astype(jnp.int32)
    h2 = jnp.clip(D // jnp.maximum(w2, 1), 1, None).astype(jnp.int32)
    h2 = jnp.minimum(h2, h_t)
    w2 = jnp.minimum((D // jnp.maximum(h2, 1)).astype(jnp.int32), w_t)
    cx = jnp.clip((mean2d[..., 0] / t).astype(jnp.int32), x0, x1 - 1)
    cy = jnp.clip((mean2d[..., 1] / t).astype(jnp.int32), y0, y1 - 1)
    x0n = jnp.clip(cx - (w2 - 1) // 2, x0, x1 - w2)
    y0n = jnp.clip(cy - (h2 - 1) // 2, y0, y1 - h2)
    x0 = jnp.where(over, x0n, x0)
    y0 = jnp.where(over, y0n, y0)
    x1 = jnp.where(over, x0n + w2, x1)
    y1 = jnp.where(over, y0n + h2, y1)
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

    depth = jnp.where(valid, depth, jnp.inf)
    return Projected(mean2d=mean2d, depth=depth, conic=conic, color=color,
                     opacity=opacity, radius=radius, rect=rect)
