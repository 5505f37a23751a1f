"""Slow, literal NumPy reference rasterizer for parity testing.

This is an independent re-derivation of the CUDA tile rasterizer's forward
semantics (projection -> per-tile depth order -> sequential front-to-back
blending with the exact skip/termination rules), written pixel-by-pixel with
explicit Python loops over depth so the fast vectorized TPU path in
``render/rasterize.py`` has something exact to be tested against.  The CUDA
kernel itself is unavailable on this machine (no GPU); PSNR targets vs. real
reference renders remain the acceptance metric when assets+GPU are present
(BASELINE.md).

Only used in tests. Keep in sync with render/project.py + rasterize.py.
"""

from __future__ import annotations

import numpy as np

from gsworld_tpu.render.camera import RasterConfig

ALPHA_MIN = 1.0 / 255.0
T_EPS = 1e-4
ALPHA_MAX = 0.99

_C0 = 0.28209479177387814
_C1 = 0.4886025119029199
_C2 = (1.0925484305920792, -1.0925484305920792, 0.31539156525252005,
       -1.0925484305920792, 0.5462742152960396)
_C3 = (-0.5900435899266435, 2.890611442640554, -0.4570457994644658,
       0.3731763325901154, -0.4570457994644658, 1.445305721320277,
       -0.5900435899266435)


def _quat_to_mat(q):
    q = q / np.linalg.norm(q, axis=-1, keepdims=True)
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    return np.stack([
        1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y),
        2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x),
        2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y),
    ], axis=-1).reshape(q.shape[:-1] + (3, 3))


def _eval_sh(sh0, shn, dirs, degree):
    res = _C0 * sh0
    if degree >= 1:
        sh = shn.reshape(-1, 3, 15)
        x, y, z = dirs[:, :1], dirs[:, 1:2], dirs[:, 2:3]
        c = lambda i: sh[:, :, i]
        res = res - _C1 * y * c(0) + _C1 * z * c(1) - _C1 * x * c(2)
        if degree >= 2:
            xx, yy, zz = x * x, y * y, z * z
            res = (res + _C2[0] * x * y * c(3) + _C2[1] * y * z * c(4)
                   + _C2[2] * (2 * zz - xx - yy) * c(5)
                   + _C2[3] * x * z * c(6) + _C2[4] * (xx - yy) * c(7))
            if degree >= 3:
                res = (res + _C3[0] * y * (3 * xx - yy) * c(8)
                       + _C3[1] * x * y * z * c(9)
                       + _C3[2] * y * (4 * zz - xx - yy) * c(10)
                       + _C3[3] * z * (2 * zz - 3 * xx - 3 * yy) * c(11)
                       + _C3[4] * x * (4 * zz - xx - yy) * c(12)
                       + _C3[5] * z * (xx - yy) * c(13)
                       + _C3[6] * x * (xx - 3 * yy) * c(14))
    return np.maximum(res + 0.5, 0.0)


def golden_render(means, log_scales, quats, logit_opac, sh0, shN,
                  world_view, tanfovx, tanfovy, cfg: RasterConfig):
    """Reference forward render -> (H, W, 3) float64 image in [0, 1]."""
    W, H, tile = cfg.width, cfg.height, cfg.tile
    gx = cfg.tiles_x
    n = means.shape[0]
    W2C = np.asarray(world_view, np.float64)
    Rv, tv = W2C[:3, :3], W2C[:3, 3]
    cam_center = -Rv.T @ tv

    p_view = means @ Rv.T + tv
    depth = p_view[:, 2]

    # projection
    zf, zn = cfg.zfar, cfg.znear
    P = np.array([
        [1 / tanfovx, 0, 0, 0],
        [0, 1 / tanfovy, 0, 0],
        [0, 0, zf / (zf - zn), -(zf * zn) / (zf - zn)],
        [0, 0, 1, 0]])
    hom = np.concatenate([p_view, np.ones((n, 1))], axis=1) @ P.T
    pw = 1.0 / (hom[:, 3] + 1e-7)
    ndc = hom[:, :2] * pw[:, None]
    mean2d = ((ndc + 1) * np.array([W, H]) - 1) * 0.5

    # cov
    Rq = _quat_to_mat(np.asarray(quats, np.float64))
    s = np.exp(np.asarray(log_scales, np.float64))
    RS = Rq * s[:, None, :]
    cov3d = RS @ RS.transpose(0, 2, 1)
    fx = W / (2 * tanfovx)
    fy = H / (2 * tanfovy)
    limx, limy = 1.3 * tanfovx, 1.3 * tanfovy
    tz = depth
    tx = np.clip(p_view[:, 0] / tz, -limx, limx) * tz
    ty = np.clip(p_view[:, 1] / tz, -limy, limy) * tz
    J = np.zeros((n, 2, 3))
    J[:, 0, 0] = fx / tz
    J[:, 0, 2] = -(fx * tx) / (tz * tz)
    J[:, 1, 1] = fy / tz
    J[:, 1, 2] = -(fy * ty) / (tz * tz)
    T = J @ Rv
    cov2d = T @ cov3d @ T.transpose(0, 2, 1)
    c00 = cov2d[:, 0, 0] + 0.3
    c11 = cov2d[:, 1, 1] + 0.3
    c01 = cov2d[:, 0, 1]
    det = c00 * c11 - c01 * c01
    valid = (depth > cfg.znear_cull) & (det != 0)
    conic = np.stack([c11, -c01, c00], axis=1) / np.where(det == 0, 1, det)[:, None]
    mid = 0.5 * (c00 + c11)
    lam = mid + np.sqrt(np.maximum(0.1, mid * mid - det))
    radius = np.ceil(3 * np.sqrt(lam)).astype(int)

    x0 = np.clip(np.floor((mean2d[:, 0] - radius) / tile), 0, gx).astype(int)
    y0 = np.clip(np.floor((mean2d[:, 1] - radius) / tile), 0, cfg.tiles_y).astype(int)
    x1 = np.clip(np.floor((mean2d[:, 0] + radius + tile - 1) / tile), 0, gx).astype(int)
    y1 = np.clip(np.floor((mean2d[:, 1] + radius + tile - 1) / tile), 0, cfg.tiles_y).astype(int)
    valid &= ((x1 - x0) * (y1 - y0)) > 0

    dirs = means - cam_center
    dirs = dirs / np.linalg.norm(dirs, axis=1, keepdims=True)
    color = _eval_sh(np.asarray(sh0, np.float64), np.asarray(shN, np.float64),
                     dirs, cfg.sh_degree)
    opac = 1 / (1 + np.exp(-np.asarray(logit_opac, np.float64)))

    order = np.argsort(depth, kind="stable")
    order = order[valid[order]]

    img = np.zeros((H, W, 3))
    bg = np.asarray(cfg.bg, np.float64)
    for py in range(H):
        for px in range(W):
            tile_x, tile_y = px // tile, py // tile
            Tt = 1.0
            c_acc = np.zeros(3)
            for gi in order:
                if not (x0[gi] <= tile_x < x1[gi] and y0[gi] <= tile_y < y1[gi]):
                    continue
                dx = mean2d[gi, 0] - px
                dy = mean2d[gi, 1] - py
                A, B, Cc = conic[gi]
                power = -0.5 * (A * dx * dx + Cc * dy * dy) - B * dx * dy
                if power > 0:
                    continue
                alpha = min(ALPHA_MAX, opac[gi] * np.exp(power))
                if alpha < ALPHA_MIN:
                    continue
                test_T = Tt * (1 - alpha)
                if test_T < T_EPS:
                    break
                c_acc += color[gi] * alpha * Tt
                Tt = test_T
            img[py, px] = c_acc + Tt * bg
    return img
