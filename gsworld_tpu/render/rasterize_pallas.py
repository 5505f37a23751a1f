"""Pallas tile-compositing kernel — the hot path of the rasterizer.

Replaces the XLA composite (rasterize.py) which is memory-bound: every
intermediate (power/alpha/prefix arrays per tile) round-trips HBM.  Here each
16x16 tile is one pallas program step; all per-chunk work lives in VMEM.

Data flow per frame:
  * projection packs one (N, 16) per-gaussian record table (pack_records);
  * ONE row-gather materializes the (T, K) tile lists as (T, 16, K) records
    (gathers dominate cost on this hardware — everything rides one gather);
  * the kernel computes alpha elementwise (dx/dy in f32, no precision
    hazard), prefix transmittance via log-space cumulative sums as a single
    (n_px, C) @ triu_ones (C, C) MXU matmul (a log-depth scan in one op),
    the done-mask cumulative-or with the same trick, and color accumulation
    as w (n_px, C) @ rgb (C, 3).

Per-tile early exit: chunks beyond the tile's entry count, or after every
pixel saturates (T < 1e-4), are skipped via scalar predication — the
data-dependent sparsity the CUDA kernel gets from its per-tile loop
(SURVEY.md §7.3 item 1), unavailable to plain vmapped XLA.

Exact reference semantics preserved (power>0 skip, alpha<1/255 skip,
terminate before the gaussian that crosses T<1e-4); the log-space prefix
introduces only ~1e-6 relative error (tested vs. the XLA path / golden).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from gsworld_tpu.render.binning import TileBins
from gsworld_tpu.render.camera import RasterConfig
from gsworld_tpu.render.project import Projected

ALPHA_MIN = 1.0 / 255.0
T_EPS = 1e-4
ALPHA_MAX = 0.99
CHUNK = 128
REC_W = 16  # packed record width

# record rows: 0 A, 1 B, 2 C (conic), 3 mx, 4 my, 5 opacity,
#              6 r, 7 g, 8 b, 9 valid, 10..15 pad


def pack_records(proj: Projected) -> jnp.ndarray:
    """(N, 16) per-gaussian record table (computed densely, no gather)."""
    n = proj.depth.shape[0]
    valid = (proj.radius > 0).astype(jnp.float32)
    pad = jnp.zeros((n, REC_W - 10), jnp.float32)
    return jnp.concatenate([
        proj.conic,                      # A, B, C
        proj.mean2d,                     # mx, my
        proj.opacity[:, None],
        proj.color,                      # r, g, b
        valid[:, None],
        pad,
    ], axis=1)


def _composite_kernel(counts_ref, recs_ref, out_ref, *, cfg: RasterConfig,
                      n_px: int, tiles_per_program: int):
    tile = cfg.tile
    gx = cfg.tiles_x
    K = cfg.max_per_tile
    n_chunks = K // CHUNK

    li = jax.lax.broadcasted_iota(jnp.int32, (n_px, 1), 0)
    x_loc = (li % tile).astype(jnp.float32)     # (n_px, 1) tile-local coords
    y_loc = (li // tile).astype(jnp.float32)

    triu = (jax.lax.broadcasted_iota(jnp.int32, (CHUNK, CHUNK), 0)
            <= jax.lax.broadcasted_iota(jnp.int32, (CHUNK, CHUNK), 1)
            ).astype(jnp.float32)

    pid = pl.program_id(0)

    def one_tile(ti, _):
        t = pid * tiles_per_program + ti
        count = counts_ref[t]
        ox = ((t % gx) * tile).astype(jnp.float32)
        oy = ((t // gx) * tile).astype(jnp.float32)

        def body(c, rgb_acc, logT, done_px):
            G = recs_ref[ti, :, pl.ds(c * CHUNK, CHUNK)]   # (16, CHUNK)
            A, B, C = G[0:1, :], G[1:2, :], G[2:3, :]
            # tile-local gaussian center; all f32 exact (values ~O(1e3) max)
            mx = (G[3:4, :] - ox)
            my = (G[4:5, :] - oy)
            dx = mx - x_loc                                # (n_px, CHUNK)
            dy = my - y_loc
            power = -0.5 * (A * dx * dx + C * dy * dy) - B * dx * dy
            alpha = jnp.minimum(ALPHA_MAX, G[5:6, :] * jnp.exp(power))
            contrib = ((G[9:10, :] > 0.5) & (power <= 0.0)
                       & (alpha >= ALPHA_MIN))
            a = jnp.where(contrib, alpha, 0.0)
            X = jnp.log1p(-a)
            incl = jnp.dot(X, triu, preferred_element_type=jnp.float32,
                           precision=jax.lax.Precision.HIGHEST)
            T_incl = jnp.exp(incl + logT)
            dead = (T_incl < T_EPS).astype(jnp.float32)
            done = (jnp.dot(dead, triu,
                            preferred_element_type=jnp.float32,
                            precision=jax.lax.Precision.HIGHEST)
                    + done_px) > 0.5                       # cum-or + carry
            live = 1.0 - done.astype(jnp.float32)
            w = a * jnp.exp(incl - X + logT) * live
            rgb = jax.lax.dot_general(
                w, G[6:9, :], (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST)
            logT = logT + jnp.sum(X * live, axis=1, keepdims=True)
            done_px = done[:, CHUNK - 1:CHUNK].astype(jnp.float32)
            return rgb_acc + rgb, logT, done_px

        def loop(c, carry):
            rgb_acc, logT, done_px, alive = carry
            do = (c * CHUNK < count) & alive

            def run():
                rgb, lT, dp = body(c, rgb_acc, logT, done_px)
                return rgb, lT, dp, jnp.min(dp) < 0.5

            return jax.lax.cond(do, run,
                                lambda: (rgb_acc, logT, done_px, alive))

        rgb_acc = jnp.zeros((n_px, 3), jnp.float32)
        logT = jnp.zeros((n_px, 1), jnp.float32)
        done_px = jnp.zeros((n_px, 1), jnp.float32)
        rgb_acc, logT, done_px, _ = jax.lax.fori_loop(
            0, n_chunks, lambda c, carry: loop(c, carry),
            (rgb_acc, logT, done_px, True))

        T_fin = jnp.exp(logT)
        b0, b1, b2 = (float(v) for v in cfg.bg)
        rgb = rgb_acc + jnp.concatenate(
            [T_fin * b0, T_fin * b1, T_fin * b2], axis=1)
        out_ref[ti, :, :] = jnp.concatenate([rgb, T_fin], axis=1).T
        return 0

    jax.lax.fori_loop(0, tiles_per_program, one_tile, 0)


def composite_tiles_pallas(proj: Projected, bins: TileBins,
                           cfg: RasterConfig, interpret: bool = False,
                           tiles_per_program: int = 4):
    """Blend per-tile lists into ((H, W, 3) image, (H, W) transmittance)."""
    T = cfg.num_tiles
    K = cfg.max_per_tile
    assert K % CHUNK == 0, "max_per_tile must be a multiple of 128"
    n_px = cfg.tile * cfg.tile
    while T % tiles_per_program:
        tiles_per_program //= 2
    tpb = max(tiles_per_program, 1)

    packed = pack_records(proj)                        # (N, 16)
    safe = jnp.maximum(bins.lists, 0)
    recs = packed[safe]                                # ONE gather (T, K, 16)
    # kill padding slots' valid flag, then lay out (T, 16, K) for the kernel
    recs = recs.at[:, :, 9].multiply(
        (bins.lists >= 0).astype(jnp.float32))
    recs = recs.transpose(0, 2, 1)                     # (T, 16, K)
    counts = bins.counts.astype(jnp.int32)

    out = pl.pallas_call(
        functools.partial(_composite_kernel, cfg=cfg, n_px=n_px,
                          tiles_per_program=tpb),
        grid=(T // tpb,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),     # full counts in SMEM
            pl.BlockSpec((tpb, REC_W, K), lambda t: (t, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tpb, 4, n_px), lambda t: (t, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((T, 4, n_px), jnp.float32),
        interpret=interpret,
    )(counts, recs)

    gy, gx, t = cfg.tiles_y, cfg.tiles_x, cfg.tile
    out = out.reshape(gy, gx, 4, t, t)
    img = out[:, :, :3].transpose(0, 3, 1, 4, 2).reshape(gy * t, gx * t, 3)
    T_img = out[:, :, 3].transpose(0, 2, 1, 3).reshape(gy * t, gx * t)
    return img[: cfg.height, : cfg.width], T_img[: cfg.height, : cfg.width]
