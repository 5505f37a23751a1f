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
    """searchsorted(sorted_arr, queries, side='left') in ONE gather round.

    The coarse level is a dense compare-and-sum instead of
    jnp.searchsorted: the latter lowers to ~log2(m) dependent scalar
    gather kernels on TPU (~1 ms of pure dispatch latency at m=2^18),
    while the (Q, m/stride) compare is one fused VPU kernel."""
    m = sorted_arr.shape[0]
    coarse = sorted_arr[::stride]                      # (m/stride,)
    hi = jnp.sum(coarse[None, :] < queries[:, None], axis=1)
    base = jnp.maximum(hi - 1, 0) * stride
    win_idx = base[:, None] + jnp.arange(stride)[None, :]
    win = sorted_arr[jnp.minimum(win_idx, m - 1)]      # (Q, stride) one gather
    within = jnp.sum((win < queries[:, None])
                     & (win_idx < m), axis=1)
    return jnp.where(hi == 0, 0, base + within)


def _fast_cumsum(x, dtype=jnp.int32):
    """Inclusive cumsum (last axis) of small non-negative ints via MXU
    prefix matmul; leading batch axes broadcast.

    jnp.cumsum over (N,) lowers to a log-depth associative scan
    (~0.85 ms at N=2^18 on v5e); one (N/128, 128) @ (128, 128)
    triangular matmul plus a 128x-smaller recursive level is ~20x
    cheaper.  Exact while the total stays under 2^24 (f32 integers;
    HIGHEST precision keeps the accumulate in f32)."""
    n = x.shape[-1]
    if n <= 512:
        return jnp.cumsum(x, axis=-1).astype(dtype)
    npad = -(-n // 128) * 128
    pad = [(0, 0)] * (x.ndim - 1) + [(0, npad - n)]
    xf = jnp.pad(x.astype(jnp.float32), pad).reshape(
        x.shape[:-1] + (npad // 128, 128))
    tri = (jnp.arange(128)[:, None] <= jnp.arange(128)[None, :]
           ).astype(jnp.float32)
    rows = jnp.matmul(xf, tri, precision=jax.lax.Precision.HIGHEST)
    tails = rows[..., -1]
    base = jnp.concatenate([
        jnp.zeros(tails.shape[:-1] + (1,), jnp.float32),
        _fast_cumsum(tails, jnp.float32)[..., :-1]], axis=-1)
    return (rows + base[..., None]).reshape(
        x.shape[:-1] + (npad,))[..., :n].astype(dtype)


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
                      record_cols, _stop_after: int = 0,
                      carry_gid: bool = True) -> EntryBins:
    """Segment-packed binning that carries per-entry record columns
    through to the compositor with NO permutation scatters.

    Everything runs in DEPTH-RANK space: culled gaussians carry
    depth=inf and sink in the argsort, and the farthest-first budget
    zeroes a contiguous rank tail — so the emitting gaussians are
    exactly ranks [0, m) and no compaction scatter is ever needed
    (round-2's compact-rank machinery cost ~3 ms/frame in inverse-
    permutation and marker scatters on v5e).  Pipeline:

      1. depth argsort; ONE (N, 16) aligned row gather brings every
         per-gaussian quantity (rect, gid, depth, record columns) into
         rank order — row gathers run ~13x faster than the same data as
         per-column element gathers;
      2. budget: MXU-matmul cumsum of entry counts (binning._fast_cumsum)
         + a compare-sum threshold; exclusive offsets the same way;
      3. per-128-entry-chunk start ranks r0 via one windowed
         searchsorted (row-aligned window gather + compare);
      4. the rasterize_pallas.emit_entries kernel expands ranks to
         per-entry sort operands IN-KERNEL (window DMA + one-hot MXU
         select + tile-rect walk) — per-entry rank/tile arrays are never
         built in XLA;
      5. one multi-operand lax.sort on (tile, view depth) — the CUDA
         radix-sort key — with gid + records as payload;
      6. per-tile segment starts via compare-based two-level
         searchsorted.

    ``record_cols`` is a tuple of (N,) f32 arrays in original gaussian
    order (rasterize_pallas.pack_record_columns).

    ``proj``/``record_cols`` may carry ONE leading frame axis (batched
    envs x cameras): the whole pipeline — argsort, row gather, cumsum,
    emit kernel (frame-folded grid), the (tile, depth) sort, segment
    starts — runs batched in a single program; EntryBins fields gain the
    same leading axis.  Batching amortizes per-frame dispatch/fusion
    overhead (~3 ms/frame single-frame on v5e) and feeds the TPU full
    (F, E) operands.
    """
    # binning is integer plumbing (indices, keys, a detached record
    # payload): never differentiated, exactly like the CUDA dup+sort stage
    proj = jax.lax.stop_gradient(proj)
    record_cols = jax.tree.map(jax.lax.stop_gradient, tuple(record_cols))

    squeeze = proj.depth.ndim == 1
    if squeeze:
        proj = jax.tree.map(lambda x: x[None], proj)
        record_cols = tuple(c[None] for c in record_cols)

    F, n = proj.depth.shape
    D = cfg.max_tiles_per_gaussian
    E = cfg.max_entries
    T = cfg.num_tiles
    gx = cfg.tiles_x
    assert E % 128 == 0, "max_entries must be a multiple of 128"
    NB = E // 128

    # rank sort carrying ALL per-gaussian columns as payload operands.
    # A (n, 16) row table + rank gather costs ~5.3 ms/frame on v5e — not
    # the gather but materializing the (n, 16) array: a 16-wide minor dim
    # wastes 7/8 of every 128-lane register and the stack is a
    # lane-interleaving relayout.  The multi-operand sort keeps every
    # column in its native layout.
    #
    # The rank key is IMPORTANCE (descending opacity * pixel-radius^2),
    # not depth: within-tile depth order comes from the entry sort's own
    # depth key, so ranks only need (a) culled gaussians contiguous at
    # the tail and (b) a budget-truncation order.  Farthest-first
    # truncation amputated whole background regions (23.4 dB at 50%
    # drop on the bench scene); importance-first spreads the loss over
    # the least-visible splats.
    #
    # CRITICAL: sorts run FLAT 1-D over (F*n,) with a frame id as the
    # leading key — XLA's TPU sort emitter handles a batched 2-D sort
    # ~10x slower than the same data flat (measured 16.8 vs 1.6 ms for
    # the entry sort at E=2^19).
    rect = proj.rect
    w = rect[..., 2] - rect[..., 0]
    rf = proj.radius.astype(jnp.float32)
    valid = (proj.radius > 0) & jnp.isfinite(proj.depth)
    mode = getattr(cfg, "budget_rank", "depth")
    depth_mode = mode == "depth"
    # slim rank sort (the default depth mode): ONE int32 key + ONE packed
    # int32 rect column instead of 2 keys + 5 payload columns — the rank
    # sort is pass-bandwidth-bound, so operand count is its cost (measured
    # 2.0 ms/frame at 15 operands, F=8, n=222k on v5e).
    #   key  = fid << d_bits | top d_bits of the positive-f32 depth
    #          pattern (bit order = value order for positive floats; ties
    #          within ~2^-(d_bits-8) relative depth break arbitrarily —
    #          far below visible compositing-order sensitivity; invalid
    #          rows pin to the frame maximum so they sink WITHIN their
    #          frame span)
    #   rect = x0 | y0<<6 | w<<12 | min(area, 4095)<<19   (int32 payload —
    #          int payloads ride lax.sort exactly; f32 packing caps at 2^24)
    slim = (depth_mode and gx <= 64 and cfg.tiles_y <= 64 and F <= 256
            and D <= 4095)
    area_full = w * (rect[..., 3] - rect[..., 1])
    if slim:
        db = jax.lax.bitcast_convert_type(
            jnp.broadcast_to(proj.depth, (F, n)).astype(jnp.float32),
            jnp.int32)
        # use every key bit the frame count leaves free: fewer depth ties
        # (ties break arbitrarily under the unstable sort)
        fid_bits = (F - 1).bit_length()
        d_bits = 31 - fid_bits
        dq = jnp.where(valid, db >> (31 - d_bits), (1 << d_bits) - 1)
        fid_n = (jnp.arange(F * n, dtype=jnp.int32) // n).astype(jnp.int32)
        key_n = (fid_n << d_bits) | dq.reshape(F * n)
        rpack = (rect[..., 0] | (rect[..., 1] << 6)
                 | (jnp.maximum(w, 1) << 12)
                 | (jnp.minimum(area_full, 4095) << 19))
        ops_in = [key_n, jnp.broadcast_to(rpack, (F, n)).reshape(F * n)]
        if carry_gid:
            ops_in.append(jnp.broadcast_to(
                jnp.arange(n, dtype=jnp.int32), (F, n)).reshape(F * n))
        ops_in += [jnp.broadcast_to(c, (F, n)).astype(jnp.float32)
                   .reshape(F * n) for c in record_cols]
        sorted_ops = jax.lax.sort(tuple(ops_in), num_keys=1,
                                  is_stable=False)
        if _stop_after == 1:    # profiling prefix: rank sort only
            return sorted_ops
        rp = sorted_ops[1].reshape(F, n)
        x0_r = (rp & 63).astype(jnp.float32)
        y0_r = ((rp >> 6) & 63).astype(jnp.float32)
        w_r = ((rp >> 12) & 127).astype(jnp.float32)
        area_f = (rp >> 19).astype(jnp.float32)
        ir = 2
        if carry_gid:
            gid_r = sorted_ops[2].reshape(F, n).astype(jnp.float32)
            ir = 3
        recs_r = tuple(s.reshape(F, n) for s in sorted_ops[ir:])
        depth_r = None
    else:
        gids = jnp.broadcast_to(jnp.arange(n, dtype=jnp.int32), (F, n))
        if mode == "importance":
            key_val = -proj.opacity * rf * rf
        elif mode == "opacity":
            key_val = -proj.opacity
        else:                   # "depth": farthest-first truncation
            key_val = proj.depth
        rank_key = jnp.where(valid, key_val, jnp.inf)
        cols = [rect[..., 0], rect[..., 1], jnp.maximum(w, 1),
                area_full,                                # area (-> cnt/offs)
                gids]
        if not depth_mode:      # depth rides as payload (key is not depth)
            cols.append(jnp.where(valid, proj.depth, 2.0 ** 30))
        cols += list(record_cols)
        cols = [jnp.broadcast_to(c, (F, n)).astype(jnp.float32).reshape(F * n)
                for c in cols]
        fid_n = (jnp.arange(F * n, dtype=jnp.int32) // n).astype(jnp.int32)
        sorted_ops = jax.lax.sort(
            (fid_n, rank_key.astype(jnp.float32).reshape(F * n))
            + tuple(cols), num_keys=2, is_stable=False)
        if _stop_after == 1:    # profiling prefix: rank sort only
            return sorted_ops
        # frame f's rows are exactly [f*n, (f+1)*n): reshape back to (F, n)
        x0_r, y0_r, w_r, area_f, gid_r = (
            s.reshape(F, n) for s in sorted_ops[2:7])
        if depth_mode:
            depth_r = sorted_ops[1].reshape(F, n)
            recs_r = tuple(s.reshape(F, n) for s in sorted_ops[7:])
        else:
            depth_r = sorted_ops[7].reshape(F, n)
            recs_r = tuple(s.reshape(F, n) for s in sorted_ops[8:])

    area_r = area_f.astype(jnp.int32)
    cnt = jnp.clip(area_r, 0, D)
    csum = _fast_cumsum(cnt)                                   # inclusive
    n_keep = jnp.sum(csum <= E, axis=-1, keepdims=True)        # (F, 1)
    ranks = jnp.arange(n, dtype=jnp.int32)[None, :]
    cnt_b = jnp.where(ranks < n_keep, cnt, 0)
    offs = (csum - cnt).astype(jnp.float32)                    # exclusive
    total = jnp.take_along_axis(csum, jnp.maximum(n_keep - 1, 0), axis=-1)
    total = jnp.where(n_keep > 0, total, 0)                    # (F, 1)
    # ranks past the budget: freeze offs at the kept total so the
    # in-kernel rank recovery (count offs <= e) lands on dead slots only
    # for entries past `total`
    offs = jnp.where(ranks < n_keep, offs, total.astype(jnp.float32))

    # meta (F, R, npad) in rank order: x0, y0, w, offs, cnt, gid,
    # [depth when two-key,] record columns — stacked on the SUBLANE axis (each row stays a
    # contiguous (npad,) lane vector; no relayout).
    #
    # Every row MUST be finite: the emit kernel selects rows with a
    # one-hot MXU matmul, and a single inf/NaN anywhere in the 256-rank
    # window poisons the whole dot product (inf*0 = NaN) — culled
    # gaussians carry depth=inf and can carry inf/NaN projection values.
    npad = ((n + 127) // 128 + 1) * 128
    BIG = jnp.float32(2 ** 30)
    # single-key mode: in depth rank order, within-tile depth order IS
    # rank order, so ONE int32 key (tile*span + rank) replaces the
    # (tile, depth) two-key sort — one less operand, one less key pass.
    # span must cover ranks and the combined key must fit int32.
    rank_span = 1
    while rank_span < npad:
        rank_span *= 2
    # within-tile order = rank whenever ranks are depth order; the entry
    # sort then runs on a combined int32 (tile, rank) key when it fits,
    # or (tile_key, rank) two-key otherwise (large F)
    rank_mode = depth_mode
    single_key = rank_mode and F * (T + 1) * rank_span < 2 ** 31
    with_gid = carry_gid or not slim
    recs_f = [jnp.where(jnp.isfinite(r), r, 0.0) for r in recs_r]
    meta_rows = [x0_r, y0_r, w_r, offs, cnt_b.astype(jnp.float32)]
    pad_vals = [0.0, 0.0, 0.0, BIG, 0.0]
    if with_gid:
        meta_rows.append(gid_r)
        pad_vals.append(0.0)
    if not rank_mode:
        meta_rows.append(jnp.where(jnp.isfinite(depth_r), depth_r, BIG))
        pad_vals.append(0.0)
    meta_rows += recs_f
    pad_vals += [0.0] * len(recs_r)
    # the emit kernel DMAs (R, 128) row windows: R must be sublane-aligned
    while len(meta_rows) % 8:
        meta_rows.append(jnp.zeros_like(meta_rows[0]))
        pad_vals.append(0.0)
    meta = jnp.stack([
        jnp.concatenate(
            [row, jnp.full((F, npad - n), pv, jnp.float32)], axis=-1)
        for row, pv in zip(meta_rows, pad_vals)], axis=-2)     # (F, 16, npad)

    # start rank per 128-entry chunk: windowed searchsorted-right on offs
    # (row-aligned window: offs reshaped (npad/128, 128), one row gather)
    offs_pad = jnp.concatenate(
        [offs, jnp.full((F, npad - n), BIG)], axis=-1)
    offs2d = offs_pad.reshape(F, -1, 128)
    cidx = (jnp.arange(NB, dtype=jnp.int32) * 128).astype(jnp.float32)
    hi = jnp.sum(offs2d[:, None, :, 0] <= cidx[None, :, None], axis=-1)
    brow = jnp.maximum(hi - 1, 0)                              # (F, NB)
    win = jnp.take_along_axis(offs2d, brow[..., None], axis=1)  # (F, NB, 128)
    within = jnp.sum(win <= cidx[None, :, None], axis=-1)
    r0 = jnp.maximum(brow * 128 + within - 1, 0).astype(jnp.int32)
    # clamp to the last block start so the kernel's 2-block window fits
    r0 = jnp.minimum(r0, npad - 129)

    if _stop_after == 2:        # profiling prefix: + budget/meta/r0
        return meta, r0
    from gsworld_tpu.render.rasterize_pallas import emit_entries
    ops = emit_entries(meta, r0, E, gx, T, rank_mode=rank_mode,
                       n_rec=len(record_cols), with_gid=with_gid,
                       cull_alpha=getattr(cfg, "cull_alpha", True),
                       tile_px=cfg.tile)  # (F, NB, 2+gid+n_rec, 128)
    if _stop_after == 3:        # profiling prefix: + emit kernel
        return ops

    n_rec = len(record_cols)
    # ONE flat 1-D sort over all frames: frame f's tile key is offset by
    # f*(T+1), so its entries (live tiles [0,T) + sentinel T) stay
    # contiguous in [f*E, (f+1)*E) after the sort — per-frame slices
    # reshape straight back to (F, E)
    fid_e = (jnp.arange(F * E, dtype=jnp.int32) // E).astype(jnp.int32)
    tile_e = (ops[:, :, 0, :].reshape(F * E).astype(jnp.int32)
              + fid_e * (T + 1))
    grow = 2 if with_gid else 1          # output row of gid / first record
    gid_ops = (ops[:, :, 2, :].reshape(F * E),) if with_gid else ()
    packed = (getattr(cfg, "pack_records", False) and not with_gid
              and n_rec == 8)
    if packed:
        # pack the 8 record rows into 5 int32 operands before the entry
        # sort (the sort is pass-bandwidth-bound: operand count IS its
        # cost).  All-int operands also sidestep the TPU sort network's
        # NaN canonicalization of bitcast float patterns.
        #   0: mean, tile-relative at 1/64 px (16+16)
        #   1: conic A | B as bf16 bit patterns (16+16)
        #   2: conic C bf16 | 14-bit opacity
        #   3: 10-bit r | g | b
        #   4: semantic id + 1 (0 = none)
        rr = [ops[:, :, grow + 1 + j, :] for j in range(8)]
        mx, my, A, B, C, opac, rg, bsem = rr
        tf = ops[:, :, 0, :]                       # f32 tile ids
        tyf = jnp.floor(tf / gx)
        txf = tf - tyf * gx
        half = cfg.tile // 2
        ox = txf * cfg.tile + half                 # kernel's centered origin
        oy = tyf * cfg.tile + half

        def q16(m, o):
            return jnp.clip(jnp.round((m - o + 512.0) * 64.0),
                            0, 65535).astype(jnp.int32)

        def bfp(x):
            return jax.lax.bitcast_convert_type(
                x.astype(jnp.bfloat16), jnp.uint16).astype(jnp.int32)

        semf = jnp.floor(bsem * (1.0 / 1024.0))
        cols = (
            q16(mx, ox) | (q16(my, oy) << 16),
            (bfp(A) << 16) | bfp(B),
            (bfp(C) << 16) | jnp.clip(jnp.round(opac * 16383.0),
                                      0, 16383).astype(jnp.int32),
            (rg.astype(jnp.int32)
             | ((bsem - semf * 1024.0).astype(jnp.int32) << 20)),
            semf.astype(jnp.int32),
        )
        recs_e = tuple(c.reshape(F * E) for c in cols)
    else:
        recs_e = tuple(
            ops[:, :, grow + 1 + j, :].reshape(F * E) for j in range(n_rec))
    if single_key:
        # combined int32 (tile, rank) key — exact (rank/tile are small
        # exact floats in the kernel output; combined here as ints)
        rank_e = ops[:, :, 1, :].reshape(F * E).astype(jnp.int32)
        key_e = tile_e * rank_span + rank_e
        out = jax.lax.sort((key_e,) + gid_ops + recs_e, num_keys=1,
                           is_stable=False)
        if _stop_after == 4:    # profiling prefix: + entry sort
            return out
        key_s = out[0]
        gid_s = out[1] if with_gid else None
        payload = tuple(o.reshape(F, E) for o in out[1 + len(gid_ops):])
        if packed:
            # pattern-preserving f32 view so the payload concatenates with
            # one dtype; the compositor kernel bitcasts back (safe: no
            # canonicalizing op — sort/matmul — touches it downstream)
            payload = tuple(jax.lax.bitcast_convert_type(o, jnp.float32)
                            for o in payload)
        starts_all = _two_level_searchsorted(
            key_s, jnp.arange(F * (T + 1), dtype=jnp.int32) * rank_span)
    else:
        # second key: rank (int32, exact) when ranks encode depth order,
        # raw f32 view depth otherwise
        order_e = ops[:, :, 1, :].reshape(F * E)
        if rank_mode:
            order_e = order_e.astype(jnp.int32)
        out = jax.lax.sort((tile_e, order_e) + gid_ops + recs_e,
                           num_keys=2, is_stable=False)
        if _stop_after == 4:    # profiling prefix: + entry sort
            return out
        key_s = out[0]
        gid_s = out[2] if with_gid else None
        payload = tuple(o.reshape(F, E) for o in out[2 + len(gid_ops):])
        if packed:
            payload = tuple(jax.lax.bitcast_convert_type(o, jnp.float32)
                            for o in payload)
        starts_all = _two_level_searchsorted(
            key_s, jnp.arange(F * (T + 1), dtype=jnp.int32))
    starts = (starts_all.reshape(F, T + 1)
              - (jnp.arange(F, dtype=jnp.int32) * E)[:, None]
              ).astype(jnp.int32)

    overflow = (jnp.sum(jnp.maximum(area_r, 0)
                        - jnp.minimum(jnp.maximum(area_r, 0), D), axis=-1)
                + jnp.sum(cnt - cnt_b, axis=-1))
    bins = EntryBins(gaussian=(gid_s.reshape(F, E).astype(jnp.int32)
                               if gid_s is not None else None),
                     starts=starts, overflow=overflow,
                     payload=payload)
    if squeeze:
        bins = jax.tree.map(lambda x: x[0], bins)
    return bins


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
