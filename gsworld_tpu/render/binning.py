"""Tile binning: fixed-capacity, depth-ordered per-tile Gaussian lists.

TPU adaptation of the CUDA pipeline's duplicate + radix-sort-by-(tile, depth)
stage (SURVEY.md §7.3 item 1): instead of dynamic per-tile lists built with
atomic counters, we depth-sort all Gaussians once (``argsort`` by view depth,
stable — matching the radix sort's index-order tie-breaking), then for each
tile compact the overlapping Gaussians into a static (num_tiles, K) index
table with a mask+cumsum scatter.  Overflow beyond K is dropped
front-to-back-last (farthest Gaussians dropped first-ish: entries past the
capacity are the deepest ones, which contribute least after alpha
compositing) and reported via ``overflow``.

Memory is bounded by processing tiles in chunks of ``cfg.tile_chunk`` via
``lax.map`` (the (N, C) mask/cumsum intermediates stay ~tens of MB).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from gsworld_tpu.render.camera import RasterConfig
from gsworld_tpu.render.project import Projected


class TileBins(NamedTuple):
    order: jnp.ndarray     # (N,) int32 depth-sorted gaussian indices
    lists: jnp.ndarray     # (num_tiles, K) int32 indices into N, -1 padded
    counts: jnp.ndarray    # (num_tiles,) int32 valid entries per tile
    overflow: jnp.ndarray  # () int32 total entries dropped by the K cap


def bin_gaussians(proj: Projected, cfg: RasterConfig) -> TileBins:
    """Build depth-ordered per-tile lists for a single camera/env.

    ``proj`` fields must be unbatched here: (N, ...); vmap for batching.
    """
    n = proj.depth.shape[0]
    K = cfg.max_per_tile
    num_tiles = cfg.num_tiles

    # stable depth order; culled gaussians carry depth=inf and sink to the end
    order = jnp.argsort(proj.depth, stable=True).astype(jnp.int32)
    rect_s = proj.rect[order]                       # (N, 4) sorted by depth

    tile_ids = jnp.arange(num_tiles, dtype=jnp.int32)
    chunk = max(1, min(cfg.tile_chunk, num_tiles))
    pad = (-num_tiles) % chunk
    tile_ids = jnp.concatenate(
        [tile_ids, jnp.full((pad,), num_tiles, jnp.int32)])
    tile_chunks = tile_ids.reshape(-1, chunk)

    x0, y0, x1, y1 = (rect_s[:, 0], rect_s[:, 1], rect_s[:, 2], rect_s[:, 3])

    def per_chunk(tids):
        tx = (tids % cfg.tiles_x)[None, :]          # (1, C)
        ty = (tids // cfg.tiles_x)[None, :]
        mask = ((x0[:, None] <= tx) & (tx < x1[:, None]) &
                (y0[:, None] <= ty) & (ty < y1[:, None]))   # (N, C)
        pos = jnp.cumsum(mask.astype(jnp.int32), axis=0) - 1  # (N, C)
        counts = jnp.minimum(pos[-1] + 1, K)
        total = pos[-1] + 1
        # scatter sorted gaussian indices into (C, K); OOB rows/cols dropped
        safe_pos = jnp.where(mask & (pos < K), pos, K)
        cols = jnp.broadcast_to(jnp.arange(chunk, dtype=jnp.int32)[None, :],
                                mask.shape)
        vals = jnp.broadcast_to(order[:, None], mask.shape)
        lists = jnp.full((chunk, K), -1, jnp.int32)
        lists = lists.at[cols.reshape(-1), safe_pos.reshape(-1)].set(
            vals.reshape(-1), mode="drop")
        over = jnp.sum(jnp.maximum(total - K, 0))
        return lists, counts, over

    lists, counts, over = jax.lax.map(per_chunk, tile_chunks)
    lists = lists.reshape(-1, K)[:num_tiles]
    counts = counts.reshape(-1)[:num_tiles]
    return TileBins(order=order, lists=lists, counts=counts,
                    overflow=jnp.sum(over))
