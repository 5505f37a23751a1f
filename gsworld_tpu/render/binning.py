"""Tile binning: depth-ordered per-tile Gaussian lists via duplicate + sort.

TPU adaptation of the CUDA pipeline's duplicate + radix-sort-by-(tile,depth)
stage (SURVEY.md §7.3 item 1).  Pipeline:

  1. depth argsort over all N gaussians (culled ones carry depth=inf and
     sink to the end);
  2. truncate to an *active budget* (frustum culling as static-shape
     compaction: wrist-camera frames typically see <50% of the scene, so
     the sort runs on half the entries; overflow is counted);
  3. each surviving gaussian emits up to D = cfg.max_tiles_per_gaussian
     (tile, gaussian) entries over its tile rect (row-major, like the CUDA
     duplication loop), already in depth order;
  4. ONE stable sort by tile id groups entries per tile while preserving
     depth order — exactly the ordering the CUDA radix sort produces;
  5. per-tile segment starts via a two-level searchsorted (a coarse
     subsampled pass + one windowed gather) — a plain binary search costs
     ~21 sequential HBM gather rounds, the two-level form 2;
  6. the (num_tiles, K) index table is a gather from the sorted array
     (TPU scatters measured ~8x slower than gathers).

Static shapes throughout; every cap (budget, D, K) feeds ``overflow``.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from gsworld_tpu.render.camera import RasterConfig
from gsworld_tpu.render.project import Projected


class TileBins(NamedTuple):
    lists: jnp.ndarray     # (num_tiles, K) int32 gaussian indices, -1 padded
    counts: jnp.ndarray    # (num_tiles,) int32 valid entries per tile
    overflow: jnp.ndarray  # () int32 entries dropped by budget / D / K caps


class EntryBins(NamedTuple):
    """Segment-packed tile lists: the (tile, depth)-sorted entry stream.

    The Pallas compositor walks ``gaussian[starts[t]:starts[t+1]]`` per tile
    (the TPU analog of the CUDA kernel's per-tile range indirection into the
    radix-sorted key array) — no dense (T, K) table is ever materialized.

    ``payload`` optionally carries per-entry record columns that rode the
    sort (see bin_entries(payload=...)): a post-sort random row gather of
    the records runs at DRAM-latency speed (~5.6 ms per frame at E=2^19,
    the hottest op of the round-1 render), while pushing the columns
    through the sort network is bandwidth-bound.
    """

    gaussian: jnp.ndarray  # (E,) int32 gaussian index per entry
    starts: jnp.ndarray    # (T+1,) int32 per-tile segment starts into gaussian
    overflow: jnp.ndarray  # () int32 entries dropped by the D / E caps
    payload: tuple = ()    # sorted per-entry record columns ((E,) f32 each)


def _two_level_searchsorted(sorted_arr, queries, stride: int = 128):
    """searchsorted(sorted_arr, queries, side='left') in 2 gather rounds."""
    m = sorted_arr.shape[0]
    coarse = sorted_arr[::stride]                      # (m/stride,)
    hi = jnp.searchsorted(coarse, queries, side="left")  # block index bound
    base = jnp.maximum(hi - 1, 0) * stride
    win_idx = base[:, None] + jnp.arange(stride)[None, :]
    win = sorted_arr[jnp.minimum(win_idx, m - 1)]      # (Q, stride) one gather
    within = jnp.sum((win < queries[:, None])
                     & (win_idx < m), axis=1)
    return jnp.where(hi == 0, 0, base + within)


def bin_entries(proj: Projected, cfg: RasterConfig) -> EntryBins:
    """Segment-packed binning for the Pallas compositor (single frame).

    TPU reformulation of the CUDA duplicate + radix-sort stage
    (diff-gaussian-rasterization forward; SURVEY.md §2.3 row 1) that never
    materializes the dense (N, D) duplication table the old path sorted:

      1. depth argsort (culled entries carry depth=inf and sink);
      2. per-gaussian entry counts cnt = min(tile-rect area, D) and their
         exclusive prefix sum give each gaussian a segment [offs, offs+cnt)
         in a static entry budget E = cfg.max_entries;
      3. the entry->gaussian map is built with ONE scatter of segment-start
         markers + a prefix-max fill (stream compaction without sorting the
         ~8x-larger dup table);
      4. per-entry tile ids come from enumerating the gaussian's tile rect
         row-major; ONE single-key sort of tile*E2 + entry_rank groups
         entries per tile in depth order (entry rank encodes depth order,
         so the combined key reproduces the CUDA (tile, depth) radix sort);
      5. per-tile segment starts via two-level searchsorted.

    Entries beyond E are dropped farthest-first (depth order), which
    degrades more gracefully than the old row-major D-truncation; both
    drops feed ``overflow``.
    """
    n = proj.depth.shape[0]
    D = cfg.max_tiles_per_gaussian
    E = cfg.max_entries
    T = cfg.num_tiles
    gx = cfg.tiles_x
    assert E % 128 == 0, "max_entries must be a multiple of 128"
    e2 = 1
    while e2 < E:
        e2 *= 2
    assert (T + 1) * e2 < 2 ** 31, (
        "tile/entry key would overflow int32; lower max_entries")

    order = jnp.argsort(proj.depth).astype(jnp.int32)          # (n,)
    rect_o = proj.rect[order]                                  # (n, 4)
    w = rect_o[:, 2] - rect_o[:, 0]
    area = w * (rect_o[:, 3] - rect_o[:, 1])
    cnt = jnp.clip(area, 0, D)
    offs = jnp.concatenate([jnp.zeros((1,), jnp.int32),
                            jnp.cumsum(cnt)[:-1].astype(jnp.int32)])
    total = offs[-1] + cnt[-1]

    # entry -> depth-rank map: scatter segment-start markers (unique
    # positions: one per gaussian with cnt>0), prefix-max forward fill
    rank = jnp.arange(n, dtype=jnp.int32)
    mark_pos = jnp.where(cnt > 0, offs, E)                     # E = dropped
    markers = jnp.full((E,), -1, jnp.int32).at[mark_pos].set(
        rank, mode="drop")
    g_rank = jax.lax.cummax(markers, axis=0)                   # (E,)

    # per-entry tile id (row-major within the gaussian's tile rect);
    # meta rows padded to 8 int32 (32 B): aligned row gathers are ~4x
    # faster than the 20 B rows they replace (measured on v5e)
    safe_rank = jnp.maximum(g_rank, 0)
    zero = jnp.zeros_like(w)
    meta = jnp.stack([rect_o[:, 0], rect_o[:, 1], jnp.maximum(w, 1),
                      offs, order, offs + cnt, zero, zero], axis=1)
    m = meta[safe_rank]                                        # ONE gather
    e_idx = jnp.arange(E, dtype=jnp.int32)
    d = e_idx - m[:, 3]
    dy = d // m[:, 2]
    tile = (m[:, 1] + dy) * gx + m[:, 0] + (d - dy * m[:, 2])
    live = (g_rank >= 0) & (e_idx < m[:, 5])                   # < segment end
    tile = jnp.where(live, tile, T)                            # sentinel

    # gidx (and optional record columns, expanded N->E with the same
    # soft-sequential rank gather the meta row uses) ride the sort as
    # payload: moving data through the sort network is bandwidth-bound,
    # while post-sort random row gathers are DRAM-latency-bound
    # gidx rides the sort as a payload: ~18% extra sort cost vs a ~4 ms
    # post-sort (E,) gather (scalar gathers are latency-per-row-bound)
    key, gaussian = jax.lax.sort(
        (tile * e2 + jnp.arange(E, dtype=jnp.int32), m[:, 4]),
        num_keys=1, is_stable=False)
    starts = _two_level_searchsorted(
        key, jnp.arange(T + 1, dtype=jnp.int32) * e2).astype(jnp.int32)

    overflow = (jnp.sum(jnp.maximum(area, 0)
                        - jnp.minimum(jnp.maximum(area, 0), D))
                + jnp.maximum(total - E, 0))
    return EntryBins(gaussian=gaussian.astype(jnp.int32), starts=starts,
                     overflow=overflow)


def bin_entries_fused(proj: Projected, cfg: RasterConfig,
                      record_cols) -> EntryBins:
    """Segment-packed binning that carries per-entry record columns
    through to the compositor with NO permutation gathers.

    The classic pipeline (bin_entries + a post-sort record gather) pays
    DRAM latency or lane-padded-layout taxes three times over: a depth
    permutation row gather at N scale, an N->E expansion row gather, and
    either a random post-sort gather or per-column slices of wide (E, P)
    arrays.  This variant:

      1. emits entries in ORIGINAL gaussian order (no depth argsort of
         the record data — depth ordering is restored by the final sort
         keying on (tile, view depth) directly, the CUDA radix-sort key);
      2. enforces the entry budget farthest-first by zeroing the counts
         of gaussians whose depth rank exceeds the budget threshold
         (one (N,) argsort + one 1-D gather — the only gathers left);
      3. builds a compact (16, Nemit) column table with ascending-index
         scatters and expands it to per-entry columns with the
         merge-join Pallas kernel (rasterize_pallas.expand_entry_columns:
         compact ranks advance <=1 per entry, so each 128-entry chunk
         reads one contiguous window and selects with a one-hot MXU
         matmul);
      4. sorts (tile, depth, gid, record columns) in one multi-operand
         lax.sort — every operand a contiguous (E,) array.

    ``record_cols`` is a tuple of (N,) f32 arrays in original gaussian
    order (rasterize_pallas.pack_record_columns).
    """
    import numpy as _np

    # binning is integer plumbing (indices, keys, a detached record
    # payload): never differentiated, exactly like the CUDA dup+sort stage
    proj = jax.lax.stop_gradient(proj)
    record_cols = jax.tree.map(jax.lax.stop_gradient, tuple(record_cols))

    n = proj.depth.shape[0]
    D = cfg.max_tiles_per_gaussian
    E = cfg.max_entries
    T = cfg.num_tiles
    gx = cfg.tiles_x
    assert E % 128 == 0, "max_entries must be a multiple of 128"

    rect = proj.rect
    w = rect[:, 2] - rect[:, 0]
    area = w * (rect[:, 3] - rect[:, 1])
    cnt = jnp.clip(area, 0, D)

    # farthest-first budget: depth rank of each gaussian; zero the counts
    # of gaussians whose cumulative entry demand exceeds E
    order = jnp.argsort(proj.depth).astype(jnp.int32)
    cnt_by_rank = cnt[order]                                   # 1-D gather
    csum = jnp.cumsum(cnt_by_rank)
    n_keep = jnp.searchsorted(csum, E, side="right")
    rank = jnp.zeros((n,), jnp.int32).at[order].set(
        jnp.arange(n, dtype=jnp.int32))
    cnt_b = jnp.where(rank < n_keep, cnt, 0)

    emit = cnt_b > 0
    crank = jnp.cumsum(emit.astype(jnp.int32)) - 1             # (n,)
    offs = jnp.concatenate([jnp.zeros((1,), jnp.int32),
                            jnp.cumsum(cnt_b)[:-1].astype(jnp.int32)])

    # compact (R, Npad) column table: ONE int index-scatter builds the
    # compact->original map, then each row is an ascending 1-D gather
    # (TPU scatters measured ~8x slower than gathers; 16 value-scatters
    # here cost ~20 ms/frame)
    npad = ((n + 127) // 128 + 1) * 128
    pos = jnp.where(emit, crank, npad - 1)
    inv = jnp.full((npad,), n, jnp.int32).at[pos].set(
        jnp.arange(n, dtype=jnp.int32), mode="drop")
    ok = inv < n
    safe = jnp.minimum(inv, n - 1)

    rows = [rect[:, 0], rect[:, 1], jnp.maximum(w, 1), offs, offs + cnt_b,
            jnp.arange(n), proj.depth] + list(record_cols)
    R = 16
    table = jnp.stack([r.astype(jnp.float32) for r in rows]
                      + [jnp.zeros((n,), jnp.float32)] * (R - len(rows)),
                      axis=1)                                  # (n, R)
    meta = jnp.where(ok[:, None], table[safe], 0.0).T          # (R, npad)

    # per-entry compact rank: scatter segment-start markers + prefix max
    mark_pos = jnp.where(emit, offs, E)
    markers = jnp.full((E,), -1, jnp.int32).at[mark_pos].set(
        crank, mode="drop")
    g_crank = jnp.maximum(jax.lax.cummax(markers, axis=0), 0)

    from gsworld_tpu.render.rasterize_pallas import expand_entry_columns
    cols = expand_entry_columns(meta, g_crank)                 # (E/C, R, C)

    def col(j, dtype=jnp.float32):
        c = cols[:, j, :].reshape(E)
        return c.astype(dtype) if dtype != jnp.float32 else c

    x0 = col(0, jnp.int32)
    y0 = col(1, jnp.int32)
    wq = col(2, jnp.int32)
    offs_e = col(3, jnp.int32)
    end_e = col(4, jnp.int32)
    gid = col(5)
    depth_e = col(6)

    e_idx = jnp.arange(E, dtype=jnp.int32)
    d = e_idx - offs_e
    dy = d // jnp.maximum(wq, 1)
    tile = (y0 + dy) * gx + x0 + (d - dy * wq)
    live = e_idx < end_e
    tile = jnp.where(live, tile, T)

    n_rec = len(record_cols)
    operands = (tile, jnp.where(live, depth_e, _np.float32(_np.inf)), gid) \
        + tuple(cols[:, 7 + j, :].reshape(E) for j in range(n_rec))
    out = jax.lax.sort(operands, num_keys=2, is_stable=False)
    tile_s, gid_s = out[0], out[2]
    starts = _two_level_searchsorted(
        tile_s, jnp.arange(T + 1, dtype=jnp.int32)).astype(jnp.int32)

    overflow = (jnp.sum(jnp.maximum(area, 0)
                        - jnp.minimum(jnp.maximum(area, 0), D))
                + jnp.sum(cnt - cnt_b))
    return EntryBins(gaussian=gid_s.astype(jnp.int32), starts=starts,
                     overflow=overflow, payload=tuple(out[3:]))


def bin_gaussians(proj: Projected, cfg: RasterConfig) -> TileBins:
    """Build depth-ordered per-tile lists for a single camera/env.
    ``proj`` fields must be unbatched: (N, ...); vmap for batching."""
    n = proj.depth.shape[0]
    K = cfg.max_per_tile
    D = cfg.max_tiles_per_gaussian
    T = cfg.num_tiles
    gx = cfg.tiles_x
    nb = n
    if cfg.active_budget_frac < 1.0:
        nb = max(int(n * cfg.active_budget_frac) // 128 * 128, 128)
        nb = min(nb, n)

    # global depth order; culled entries (depth=inf) sink to the end, so
    # truncating to the budget drops invisible gaussians first
    order = jnp.argsort(proj.depth).astype(jnp.int32)[:nb]   # (nb,)
    rect_s = proj.rect[order]                                # (nb, 4)
    x0, y0, x1, y1 = (rect_s[:, 0], rect_s[:, 1], rect_s[:, 2], rect_s[:, 3])
    w = x1 - x0
    area = w * (y1 - y0)

    # enumerate up to D duplicate slots per gaussian, row-major over the rect
    d = jnp.arange(D, dtype=jnp.int32)[None, :]              # (1, D)
    w_safe = jnp.maximum(w, 1)[:, None]
    dx = d % w_safe
    dy = d // w_safe
    dup_valid = d < area[:, None]
    tile = (y0[:, None] + dy) * gx + (x0[:, None] + dx)      # (nb, D)
    tile = jnp.where(dup_valid, tile, T)                     # sentinel
    gidx = jnp.broadcast_to(order[:, None], (nb, D))

    t_s, g_s = jax.lax.sort((tile.reshape(-1), gidx.reshape(-1)),
                            num_keys=1, is_stable=True)      # (nb*D,)

    starts = _two_level_searchsorted(
        t_s, jnp.arange(T + 1, dtype=jnp.int32)).astype(jnp.int32)
    counts_full = jnp.diff(starts)

    # per-tile entries are contiguous in the sorted array -> gather lists
    slot = starts[:T, None] + jnp.arange(K, dtype=jnp.int32)[None, :]
    in_range = slot < starts[1:, None]
    lists = jnp.where(in_range, g_s[jnp.minimum(slot, nb * D - 1)], -1)

    # overflow: K cap + D cap + budget cap (visible gaussians beyond budget)
    n_valid = jnp.sum(proj.radius > 0)
    overflow = (jnp.sum(jnp.maximum(counts_full - K, 0))
                + jnp.sum(jnp.maximum(area, 0)
                          - jnp.minimum(jnp.maximum(area, 0), D))
                + jnp.maximum(n_valid - nb, 0))
    return TileBins(lists=lists, counts=jnp.minimum(counts_full, K),
                    overflow=overflow)
