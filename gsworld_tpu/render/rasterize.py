"""Tile compositing: front-to-back alpha blending of binned Gaussians.

Exact-semantics TPU reformulation of the CUDA per-tile loop (SURVEY.md §2.3
row 1). The sequential front-to-back recurrence

    T_0 = 1;  C += alpha_i * T_i * c_i;  T_{i+1} = T_i * (1 - alpha_i)

with the reference's skip rules (power > 0 skip, alpha < 1/255 skip,
terminate *before* the Gaussian that would push T below 1e-4) is
data-parallel once expressed through prefix products:

    a~_i  = alpha_i if contributing else 0
    T_i   = prod_{j<i} (1 - a~_j)            (exclusive cumprod)
    done_i = cumulative-or of [T_i * (1 - a~_i) < 1e-4]
    w_i   = a~_i * T_i * (1 - done_i)
    C     = sum w_i c_i + T_final * bg,  T_final = prod (1 - a~_i (1-done_i))

cumprod/cumsum lower to log-depth scans on TPU, so nothing in the hot loop is
sequential over Gaussians. Tiles are processed in chunks via ``lax.map`` to
bound the (C_tiles, px, K) intermediates.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from gsworld_tpu.gs.transform import PosedGaussians
from gsworld_tpu.render.binning import TileBins, bin_gaussians
from gsworld_tpu.render.camera import GSCamera, RasterConfig
from gsworld_tpu.render.project import Projected, project_gaussians

ALPHA_MIN = 1.0 / 255.0
T_EPS = 1e-4
ALPHA_MAX = 0.99


def composite_tiles(proj: Projected, bins: TileBins, cfg: RasterConfig,
                    semantics=None):
    """Blend per-tile lists into ((H, W, 3) image, (H, W) transmittance[,
    (H, W) int32 segmentation when per-gaussian ``semantics`` is given]).

    Segmentation = semantic id of the dominant (max-weight) contributor per
    pixel, -1 where nothing dominates — the GS analog of the reference's
    obs_mode="rgb+segmentation" channel (SAPIEN per-entity seg ids,
    gs_world_wrapper.py:168-173)."""
    t = cfg.tile
    K = cfg.max_per_tile
    gx, gy = cfg.tiles_x, cfg.tiles_y
    num_tiles = gx * gy

    # local pixel grid of one tile, flattened (t*t, 2) as (x, y) floats
    ly, lx = jnp.mgrid[0:t, 0:t]
    local = jnp.stack([lx.reshape(-1), ly.reshape(-1)], axis=-1).astype(jnp.float32)

    bg = jnp.asarray(cfg.bg, jnp.float32)

    tile_idx = jnp.arange(num_tiles, dtype=jnp.int32)
    chunk = max(1, min(cfg.tile_chunk, num_tiles))
    pad = (-num_tiles) % chunk
    tile_idx = jnp.concatenate([tile_idx, jnp.zeros((pad,), jnp.int32)])
    tchunks = tile_idx.reshape(-1, chunk)

    def one_tile(tid):
        idx = bins.lists[tid]                     # (K,)
        entry_valid = idx >= 0
        safe = jnp.maximum(idx, 0)
        mean2d = proj.mean2d[safe]                # (K, 2)
        conic = proj.conic[safe]                  # (K, 3)
        color = proj.color[safe]                  # (K, 3)
        opac = proj.opacity[safe]                 # (K,)

        origin = jnp.stack([(tid % gx) * t, (tid // gx) * t]).astype(jnp.float32)
        pix = origin[None, :] + local             # (P, 2) P = t*t

        d = mean2d[None, :, :] - pix[:, None, :]  # (P, K, 2)
        A, B, Cc = conic[:, 0], conic[:, 1], conic[:, 2]
        power = (-0.5 * (A[None, :] * d[..., 0] ** 2 + Cc[None, :] * d[..., 1] ** 2)
                 - B[None, :] * d[..., 0] * d[..., 1])          # (P, K)
        alpha = jnp.minimum(ALPHA_MAX, opac[None, :] * jnp.exp(power))
        contrib = entry_valid[None, :] & (power <= 0.0) & (alpha >= ALPHA_MIN)
        a = jnp.where(contrib, alpha, 0.0)        # (P, K)

        one_minus = 1.0 - a
        T_incl = jnp.cumprod(one_minus, axis=-1)               # T after i
        T_excl = jnp.concatenate(                              # T before i
            [jnp.ones_like(T_incl[..., :1]), T_incl[..., :-1]], axis=-1)
        done = jnp.cumsum((T_excl * one_minus < T_EPS).astype(jnp.int32),
                          axis=-1) > 0                         # (P, K)
        w = a * T_excl * (1.0 - done)
        T_final = jnp.prod(1.0 - a * (1.0 - done), axis=-1)    # (P,)
        rgb = jnp.einsum("pk,kc->pc", w, color) + T_final[:, None] * bg
        if semantics is None:
            return rgb, T_final, jnp.zeros(w.shape[:-1], jnp.int32)
        # segmentation: semantic id of the dominant contributor per pixel
        # (background -1 where nothing dominates)
        best = jnp.argmax(w, axis=-1)                          # (P,)
        sem = jnp.where(jnp.take_along_axis(w, best[..., None], -1)[..., 0]
                        > 1e-4,
                        semantics[safe][best], -1)
        return rgb, T_final, sem

    def per_chunk(tids):
        return jax.vmap(one_tile)(tids)

    rgb, T_fin, seg = jax.lax.map(per_chunk, tchunks)
    rgb = rgb.reshape(-1, t * t, 3)[:num_tiles]
    T_fin = T_fin.reshape(-1, t * t)[:num_tiles]

    # (gy, gx, t, t, 3) -> (gy*t, gx*t, 3), crop to (H, W)
    img = rgb.reshape(gy, gx, t, t, 3).transpose(0, 2, 1, 3, 4)
    img = img.reshape(gy * t, gx * t, 3)[: cfg.height, : cfg.width]
    T_img = T_fin.reshape(gy, gx, t, t).transpose(0, 2, 1, 3)
    T_img = T_img.reshape(gy * t, gx * t)[: cfg.height, : cfg.width]
    if semantics is None:
        return img, T_img
    seg = seg.reshape(-1, t * t)[:num_tiles]
    seg_img = seg.reshape(gy, gx, t, t).transpose(0, 2, 1, 3)
    seg_img = seg_img.reshape(gy * t, gx * t)[: cfg.height, : cfg.width]
    return img, T_img, seg_img


def _use_pallas(cfg: RasterConfig) -> bool:
    if cfg.backend == "pallas":
        return True
    if cfg.backend == "xla":
        return False
    return jax.default_backend() not in ("cpu",)


def render(g: PosedGaussians, cam: GSCamera, cfg: RasterConfig,
           sh0, shN, semantics=None):
    """Full forward render of one env through one camera -> (H, W, 3) in
    [0, 1] (+ (H, W) int32 segmentation when ``semantics`` is given).
    vmap over leading axes of (g, cam) for batching."""
    proj = project_gaussians(g, cam, cfg, sh0, shN)
    bins = bin_gaussians(proj, cfg)
    if semantics is not None:
        # segmentation path runs through the XLA compositor
        img, _, seg = composite_tiles(proj, bins, cfg, semantics)
        return img, seg
    if _use_pallas(cfg):
        from gsworld_tpu.render.rasterize_pallas import composite_tiles_pallas
        img, _ = composite_tiles_pallas(proj, bins, cfg)
    else:
        img, _ = composite_tiles(proj, bins, cfg)
    return img


def render_uint8(g, cam, cfg, sh0, shN):
    """Render to uint8 (gs_world_wrapper.py:268-270 contract)."""
    img = render(g, cam, cfg, sh0, shN)
    return jnp.clip(img * 255.0, 0, 255).astype(jnp.uint8)
