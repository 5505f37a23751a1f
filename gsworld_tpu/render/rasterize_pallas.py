"""Pallas tile-compositing kernel — the hot path of the rasterizer.

TPU counterpart of the CUDA per-tile compositing loop
(diff-gaussian-rasterization forward; SURVEY.md §2.3 row 1), built on the
segment-packed entry stream from ``binning.bin_entries``:

  * projection packs ONE (N, 8) f32 per-gaussian record:
    [mx, my, A, B, C(conic), opacity, r|g, b|sem] — RGB is 3x10-bit
    fixed point carried as exact integer-valued floats (<=0.4% color
    error; bitcast packings alias NaN encodings the TPU sort/matmul
    canonicalize), the semantic id shares the blue column;
  * records reach sorted-entry order by riding the binning sort as
    payload columns (bin_entries_fused) and re-block to (E/128, 8, 128)
    — fields on sublanes, entries on lanes — so each 128-entry chunk is
    one contiguous (sublane-aligned) DMA;
  * the kernel walks each tile's segment [starts[t], starts[t+1]) (scalar-
    prefetched starts = the CUDA per-tile range indirection) with chunked
    double-buffered HBM->VMEM DMA, overlapping copy and compute;
  * per chunk, prefix transmittance is ONE log-space cumulative sum done as
    a split-bf16 MXU matmul against a triangular 0/1 matrix (two bf16
    passes reproduce ~f32 accuracy because the 0/1 matrix is exact in
    bf16); the done mask needs NO scan — transmittance is monotone along
    the chunk, so the termination bit is carried as a single column;
  * color accumulation is one (n_px, C) @ (C, 3) MXU matmul; the optional
    segmentation channel tracks the max-weight contributor's semantic id
    with two VPU max ops per chunk.

Early exit: chunks beyond the tile's segment never run (dynamic trip
count), and the chunk loop breaks once every pixel saturates (T < 1e-4),
draining the one in-flight DMA — the data-dependent sparsity the CUDA
kernel gets from its per-tile loop, unavailable to plain vmapped XLA.

Reference semantics preserved (power>0 skip, alpha<1/255 skip, terminate
before the gaussian that crosses T<1e-4); tested against the XLA path and
the literal golden implementation (tests/test_pallas_kernel.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from gsworld_tpu.render.binning import EntryBins
from gsworld_tpu.render.camera import RasterConfig
from gsworld_tpu.render.project import Projected

ALPHA_MIN = 1.0 / 255.0
T_EPS = 1e-4
LOG_T_EPS = -9.210340371976184  # ln(T_EPS): termination compares in log space
ALPHA_MAX = 0.99
CHUNK = 128
REC_W = 8   # f32 record width
COLOR_MAX = 4.0
_Q = 1023.0
SEG_NONE = -1.0  # background semantic id

# record rows: 0 mx, 1 my, 2 A, 3 B, 4 C (conic), 5 opacity,
#              6 r|g 2x10-bit, 7 b 10-bit | (semantic+1) << 10.
# Color/semantic bits ride as exact INTEGER-VALUED floats (<= 2^24), never
# as bitcast patterns: bitcast packings alias NaN/inf encodings that the
# TPU sort network and the expansion kernel's matmul silently canonicalize
# (colors corrupt while geometry survives — a ~13 dB image).  8 rows =
# one VMEM sublane group per 128-entry chunk.


def pack_record_columns(proj: Projected, semantics=None):
    """The REC_W per-gaussian record columns as a tuple of (..., N) f32
    arrays in original gaussian order (no stacking — bin_entries_fused
    packs them into its compact column table directly).  Leading batch
    axes of ``proj`` pass through; ``semantics`` (N,) broadcasts.

    The blue channel and the semantic id share one column:
    ``b + (sem + 1) * 1024`` — both small exact ints, sum <= 2^24."""
    valid = proj.radius > 0
    c = jnp.clip(proj.color / COLOR_MAX, 0.0, 1.0)
    q = jnp.round(c * _Q).astype(jnp.uint32)
    rg = (q[..., 0] | (q[..., 1] << 10)).astype(jnp.float32)  # exact <= 2^20
    b = q[..., 2].astype(jnp.float32)
    opac = jnp.where(valid, proj.opacity, 0.0)
    sem = (jnp.full(proj.depth.shape, SEG_NONE, jnp.float32)
           if semantics is None
           else jnp.broadcast_to(semantics.astype(jnp.float32),
                                 proj.depth.shape))
    bsem = b + (sem + 1.0) * 1024.0
    return (proj.mean2d[..., 0], proj.mean2d[..., 1],
            proj.conic[..., 0], proj.conic[..., 1], proj.conic[..., 2],
            opac, rg, bsem)


def pack_records(proj: Projected, semantics=None) -> jnp.ndarray:
    """(N, REC_W) f32 per-gaussian record table (fallback gather path)."""
    return jnp.stack(pack_record_columns(proj, semantics), axis=1)


def _prep_entry_records(proj: Projected, bins: EntryBins, semantics):
    """Records in sorted-entry order, blocked (E/128, REC_W, 128).

    When the records rode the sort as payload columns (bin_entries
    payload=...), each sorted column reshapes straight into its sublane
    row of the blocked layout — no post-sort gather, no row-major
    transpose.  Fallback: one (E, REC_W) row gather (DRAM-latency-bound,
    ~5.6 ms/frame at E=2^19 — why the payload path exists)."""
    if bins.payload:
        E = bins.payload[0].shape[0]
        return jnp.concatenate(
            [c.reshape(E // CHUNK, 1, CHUNK) for c in bins.payload], axis=1)
    packed = pack_records(proj, semantics)          # (N, REC_W)
    recs = packed[bins.gaussian]                    # (E, REC_W) ONE row gather
    E = recs.shape[0]
    return recs.reshape(E // CHUNK, CHUNK, REC_W).transpose(0, 2, 1)


def _emit_kernel(r0_ref, meta_hbm, out_ref, win, sem, *,
                 n_meta: int, n_out: int, gx: int, t_sentinel: int,
                 rank_mode: bool, K: int, NS: int, NB: int, WB: int,
                 nblk: int, with_gid: bool, cull_alpha: bool,
                 tile_px: int):
    """Expand the rank-ordered per-gaussian meta table to per-entry sort
    operands (tile key, depth|rank, [gid,] record columns) — the TPU
    analog of the CUDA duplication loop, K 128-entry chunks per grid step.

    Meta rows (see bin_entries_fused): 0 x0, 1 y0, 2 w, 3 offs, 4 cnt,
    then gid (when ``with_gid``), then depth (when ``rank_mode`` is
    False; with rank_mode=True the second output row is the entry's RANK
    — within-tile order comes from rank itself), then the record columns
    (pack_record_columns order: mx, my, A, B, C, opacity, rg, bsem).
    The table is in RANK order with emitting gaussians a contiguous
    prefix (culled ones carry depth=inf and sink in the argsort), so
    per-entry ranks advance <=1 per entry: one WB = K+1 block window
    starting at the step's first chunk rank covers every rank the step's
    K chunks touch.  The rank of entry e is recovered IN-KERNEL as
    b0j*128 + count(offs_subwindow <= e) - 1 (offs is nondecreasing;
    pre-window ranks all satisfy offs <= e), so no per-entry rank array
    is ever materialized in HBM.

    ``cull_alpha``: exact per-tile alpha culling — an entry whose maximum
    alpha over its tile's pixel rect is below the compositor's 1/255
    skip threshold is emitted as the sentinel tile (the quadratic is
    unimodal, so the max over the tile is at the rect-clamped mean; every
    pixel of such an entry would hit the CUDA kernel's alpha<1/255 skip,
    reference behavior preserved exactly).  Measured on the bench scene
    this drops ~35% of live entries, shrinking every tile segment the
    compositor walks.

    Round-4 redesign (r3 ran one chunk per grid step = 4096 sequential
    steps x ~0.6 us of DMA-wait latency = 2.6 ms/frame): K chunks share
    ONE window DMA, and the next step's window is prefetched while the
    current one computes (double-buffered across grid steps), so the
    kernel is compute-bound, not latency-bound.

    Grid (F*NS,): frames fold into the flat grid (pallas_call is not
    vmappable on TPU), so batched envs x cameras run in one launch.
    """
    i = pl.program_id(0)
    total = pl.num_programs(0)

    def window_dma(slot, step):
        f2, s2 = step // NS, step % NS
        r0 = r0_ref[f2, jnp.minimum(s2 * K, NB - 1)]
        b0 = jnp.minimum(r0 // CHUNK, nblk - WB)
        return pltpu.make_async_copy(
            meta_hbm.at[f2, :, pl.ds(b0 * CHUNK, WB * CHUNK)],
            win.at[slot], sem.at[slot]), b0

    @pl.when(i == 0)
    def _():
        window_dma(0, 0)[0].start()

    @pl.when(i + 1 < total)
    def _():
        window_dma((i + 1) % 2, i + 1)[0].start()

    dma, b0 = window_dma(i % 2, i)
    dma.wait()
    f, s = i // NS, i % NS
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, CHUNK), 1)
    for j in range(K):
        c = s * K + j
        r0j = r0_ref[f, jnp.minimum(c, NB - 1)]
        b0j = r0j // CHUNK
        boff = jnp.clip(b0j - b0, 0, WB - 2)
        wj = win[i % 2, :, pl.ds(boff * CHUNK, 2 * CHUNK)]  # (R, 2C)
        e_idx = (c * CHUNK + lane).astype(jnp.float32)    # (1, CHUNK)
        offs_w = wj[3:4, :].T                             # (2C, 1)
        le = (offs_w <= e_idx).astype(jnp.float32)        # (2C, CHUNK)
        cnt_le = jnp.sum(le, axis=0, keepdims=True)       # (1, CHUNK)
        # offs is nondecreasing, so le per column is a prefix of ones:
        # the one-hot of the last 1 is le - (le shifted up by one row)
        le_next = jnp.concatenate(
            [le[1:], jnp.zeros((1, CHUNK), jnp.float32)], axis=0)
        onehot = le - le_next
        # HIGHEST precision: exact integer-valued columns (offsets up to
        # E ~ 2^19) and f32 record fields survive the MXU select
        cols = jax.lax.dot_general(
            wj, onehot, (((1,), (0,)), ((), ())),
            precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32)           # (n_meta, CHUNK)
        x0, y0 = cols[0:1, :], cols[1:2, :]
        w = cols[2:3, :]
        offs = cols[3:4, :]
        cnt = cols[4:5, :]
        # row-major position within the gaussian's tile rect (exact float
        # math: d <= D-1, w <= tiles_x, both far under f32 precision)
        d = e_idx - offs
        dy = jnp.floor(d / w)
        dx = d - dy * w
        tile = (y0 + dy) * gx + x0 + dx
        live = e_idx < offs + cnt
        rec0 = 5 + (1 if with_gid else 0) + (0 if rank_mode else 1)
        if cull_alpha:
            # exact tile-alpha cull: the max of the (concave) splat
            # quadratic over the tile's pixel box.  NOT the rect-clamped
            # mean — with an anisotropic conic (B != 0) the box max sits
            # elsewhere on the boundary, so the clamp test wrongly culls
            # contributors.  Mean inside the box -> max 0; otherwise the
            # max is on one of the 4 edges, where the 1-D optimum along
            # the edge is a clamped stationary point.
            rmx, rmy = cols[rec0:rec0 + 1, :], cols[rec0 + 1:rec0 + 2, :]
            rA = cols[rec0 + 2:rec0 + 3, :]
            rB = cols[rec0 + 3:rec0 + 4, :]
            rC = cols[rec0 + 4:rec0 + 5, :]
            ropac = cols[rec0 + 5:rec0 + 6, :]
            tpx = (x0 + dx) * float(tile_px)
            tpy = (y0 + dy) * float(tile_px)
            dx0 = tpx - rmx                       # box bounds minus mean
            dx1 = tpx + float(tile_px - 1) - rmx
            dy0 = tpy - rmy
            dy1 = tpy + float(tile_px - 1) - rmy
            A_s = jnp.maximum(rA, 1e-12)
            C_s = jnp.maximum(rC, 1e-12)

            def q(ddx, ddy):
                return (-0.5 * (rA * ddx * ddx + rC * ddy * ddy)
                        - rB * ddx * ddy)

            ex0 = q(dx0, jnp.clip(-rB * dx0 / C_s, dy0, dy1))
            ex1 = q(dx1, jnp.clip(-rB * dx1 / C_s, dy0, dy1))
            ey0 = q(jnp.clip(-rB * dy0 / A_s, dx0, dx1), dy0)
            ey1 = q(jnp.clip(-rB * dy1 / A_s, dx0, dx1), dy1)
            pw = jnp.maximum(jnp.maximum(ex0, ex1),
                             jnp.maximum(ey0, ey1))
            inside = (dx0 <= 0.0) & (dx1 >= 0.0) & (dy0 <= 0.0) & (dy1 >= 0.0)
            pw = jnp.where(inside, 0.0, pw)
            keep = (pw + jnp.log(jnp.maximum(ropac, 1e-12))
                    >= jnp.log(ALPHA_MIN))
            live = live & keep
        tile_key = jnp.where(live, tile, float(t_sentinel))
        if rank_mode:
            # second row = entry's rank (exact small float; combined with
            # the tile into one int32 sort key outside the kernel).
            # cnt_le counts rows of the 2-block subwindow that starts at
            # block (b0 + boff) — use that start, not b0j: they differ
            # whenever the boff/b0 clamps bind (ADVICE r4).
            order_key = ((b0 + boff).astype(jnp.float32)
                         * jnp.float32(CHUNK) + cnt_le - 1.0)
        else:
            order_key = jnp.where(live, cols[rec0 - 1:rec0, :], jnp.inf)
        rows = [tile_key, order_key]
        if with_gid:
            rows.append(cols[5:6, :])
        n_rec_out = n_out - 2 - (1 if with_gid else 0)
        rows.append(cols[rec0:rec0 + n_rec_out, :])
        out_ref[0, j] = jnp.concatenate(rows, axis=0)


def emit_entries(meta, r0, E: int, gx: int, t_sentinel: int,
                 interpret=None, rank_mode: bool = False,
                 n_rec=None, chunks_per_step: int = 8,
                 with_gid: bool = True, cull_alpha: bool = False,
                 tile_px: int = 32):
    """meta (F, R, Npad) f32 rank-ordered tables (R padded to a multiple
    of 8 — the in-kernel row-window DMA requires sublane alignment), r0
    (F, E/128) int32 start rank per 128-entry chunk -> (F, E/128, n_out,
    128) per-entry sort operands [tile_key, depth_key | rank, (gid,)
    records...].  A leading frame axis of 1 is fine (single frame).
    ``cull_alpha`` requires the first 6 record columns to follow the
    pack_record_columns layout (mx, my, A, B, C, opacity)."""
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    F, R, npad = meta.shape
    NB = E // CHUNK
    nblk = npad // CHUNK
    K = chunks_per_step
    while NB % K:
        K //= 2
    WB = min(K + 1, nblk)
    NS = NB // K
    n_fixed = 5 + (1 if with_gid else 0) + (0 if rank_mode else 1)
    if n_rec is None:
        n_rec = R - n_fixed
    assert not cull_alpha or n_rec >= 6, \
        "cull_alpha needs the mx,my,A,B,C,opacity record columns"
    n_out = 2 + (1 if with_gid else 0) + n_rec
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(F * NS,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec((1, K, n_out, CHUNK),
                               lambda i, s: (i // NS, i % NS, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((2, R, WB * CHUNK), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    out = pl.pallas_call(
        functools.partial(_emit_kernel, n_meta=R, n_out=n_out, gx=gx,
                          t_sentinel=t_sentinel, rank_mode=rank_mode,
                          K=K, NS=NS, NB=NB, WB=WB, nblk=nblk,
                          with_gid=with_gid, cull_alpha=cull_alpha,
                          tile_px=tile_px),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((F, NB, n_out, CHUNK), jnp.float32),
        interpret=interpret,
    )(r0, meta)
    return out


def _segment_kernel(starts_ref, recs_hbm, out_ref, buf, sems, *,
                    cfg: RasterConfig, n_px: int, tiles_per_program: int,
                    with_seg: bool, packed: bool = False):
    tile = cfg.tile
    gx = cfg.tiles_x

    li = jax.lax.broadcasted_iota(jnp.int32, (n_px, 1), 0)
    # tile-local coords CENTERED on the tile (integer shift by tile//2):
    # halves the worst-case |mlx| operand of the expanded quadratic, whose
    # large-term cancellation is the dominant error for high-aspect splats
    # binned far from their mean (ADVICE r4)
    half = tile // 2
    x_loc = (li % tile - half).astype(jnp.float32)   # (n_px, 1)
    y_loc = (li // tile - half).astype(jnp.float32)
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, CHUNK), 1)

    # gaussian evaluation rides the MXU: power(px, e) is a quadratic in
    # the tile-local pixel coords, so it is ONE (n_px, 6) @ (6, CHUNK)
    # matmul against per-entry polynomial coefficients instead of ~10 VPU
    # ops per (pixel, entry) pair (the VPU was the compositor bottleneck
    # at tile=32: ~305M pairs/frame).  basis is split bf16-hi/lo (x^2 up
    # to 4096 is not exact in bf16); coeffs split the same way, and the
    # four-way (hi+lo)@(hi+lo) matmul product keeps ~f32 accuracy.
    basis = jnp.concatenate(
        [jnp.ones_like(x_loc), x_loc, y_loc,
         x_loc * x_loc, x_loc * y_loc, y_loc * y_loc], axis=1)  # (n_px, 6)
    basis_h = basis.astype(jnp.bfloat16)
    basis_l = (basis - basis_h.astype(jnp.float32)).astype(jnp.bfloat16)

    triu = (jax.lax.broadcasted_iota(jnp.int32, (CHUNK, CHUNK), 0)
            <= jax.lax.broadcasted_iota(jnp.int32, (CHUNK, CHUNK), 1)
            ).astype(jnp.bfloat16)

    f = pl.program_id(0)
    tb = pl.program_id(1)

    def get_dma(slot, block):
        return pltpu.make_async_copy(
            recs_hbm.at[f, block], buf.at[slot], sems.at[slot])

    for ti in range(tiles_per_program):
        t = tb * tiles_per_program + ti
        s = starts_ref[f, t]
        e = starts_ref[f, t + 1]
        b0 = s // CHUNK
        nch = jnp.where(e > s, (e - b0 * CHUNK + CHUNK - 1) // CHUNK, 0)
        ox = ((t % gx) * tile + half).astype(jnp.float32)
        oy = ((t // gx) * tile + half).astype(jnp.float32)

        @pl.when(nch > 0)
        def _():
            get_dma(0, b0).start()

        def body(carry):
            c, rgb_acc, logT, done_col, best_w, best_sem = carry

            @pl.when(c + 1 < nch)
            def _():
                get_dma((c + 1) % 2, b0 + c + 1).start()

            get_dma(c % 2, b0 + c).wait()
            G = buf[c % 2]                                 # (n_rows, CHUNK)

            ids = (b0 + c) * CHUNK + lane                  # (1, CHUNK)
            maskv = (ids >= s) & (ids < e)
            if packed:
                # 5 packed int32 rows (binning pack_records layout);
                # bitcasts are pattern-exact — bf16 halves expand to f32
                # by masking/shifting (a bf16 IS a truncated f32)
                vi = jax.lax.bitcast_convert_type(G, jnp.int32)
                v0, v1 = vi[0:1, :], vi[1:2, :]
                v2, v3 = vi[2:3, :], vi[3:4, :]
                # tile-relative means were packed against the same
                # centered origin the kernel uses: no ox/oy here
                mlx = ((v0 & 0xFFFF).astype(jnp.float32) * (1.0 / 64.0)
                       - 512.0)
                mly = (((v0 >> 16) & 0xFFFF).astype(jnp.float32)
                       * (1.0 / 64.0) - 512.0)
                A = jax.lax.bitcast_convert_type((v1 >> 16) << 16,
                                                 jnp.float32)
                B = jax.lax.bitcast_convert_type(v1 << 16, jnp.float32)
                C = jax.lax.bitcast_convert_type((v2 >> 16) << 16,
                                                 jnp.float32)
                opac = ((v2 & 0x3FFF).astype(jnp.float32)
                        * (1.0 / 16383.0))
            else:
                opac = G[5:6, :]
                mlx = G[0:1, :] - ox                       # tile-local means
                mly = G[1:2, :] - oy
                A, B, C = G[2:3, :], G[3:4, :], G[4:5, :]
            logop = jnp.log(jnp.maximum(opac, 1e-12))      # (1, CHUNK)
            # power' = power + log(opac) as a polynomial in (x, y); the
            # segment mask folds into the constant term (-1e30 kills the
            # pair in both compares below)
            c0 = jnp.where(
                maskv,
                -0.5 * (A * mlx * mlx + C * mly * mly) - B * mlx * mly
                + logop, -1e30)
            coef = jnp.concatenate([
                c0, A * mlx + B * mly, C * mly + B * mlx,
                -0.5 * A, -B, -0.5 * C], axis=0)           # (6, CHUNK)
            # coef split 3-way (24 mantissa bits ~ f32); basis split is
            # exact (integer entries < 1024), so the 6-matmul product
            # reproduces the VPU-evaluated power to f32 rounding
            ch = coef.astype(jnp.bfloat16)
            rm = coef - ch.astype(jnp.float32)
            cm = rm.astype(jnp.bfloat16)
            cl = (rm - cm.astype(jnp.float32)).astype(jnp.bfloat16)
            dotp = functools.partial(
                jnp.dot, preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.DEFAULT)
            powero = (dotp(basis_h, ch) + dotp(basis_h, cm)
                      + dotp(basis_h, cl) + dotp(basis_l, ch)
                      + dotp(basis_l, cm) + dotp(basis_l, cl))  # (n_px, C)
            # alpha >= ALPHA_MIN <=> power' >= log(ALPHA_MIN); power <= 0
            # <=> power' <= log(opac)
            contrib = (powero <= logop) & (powero >= jnp.log(ALPHA_MIN))
            alpha = jnp.exp(jnp.minimum(powero, jnp.log(ALPHA_MAX)))
            a = jnp.where(contrib, alpha, 0.0)
            X = jnp.log1p(-a)
            # inclusive prefix log-transmittance: split-bf16 two-pass matmul
            # against the exact-in-bf16 0/1 triangular matrix
            # explicit DEFAULT precision: the package-wide f32 matmul
            # default would stamp contract_precision<fp32> on these bf16
            # operands, which Mosaic rejects ("Bad lhs type")
            Xh = X.astype(jnp.bfloat16)
            Xl = (X - Xh.astype(jnp.float32)).astype(jnp.bfloat16)
            incl = (jnp.dot(Xh, triu, preferred_element_type=jnp.float32,
                            precision=jax.lax.Precision.DEFAULT)
                    + jnp.dot(Xl, triu, preferred_element_type=jnp.float32,
                              precision=jax.lax.Precision.DEFAULT))
            S = incl + logT                                # log T_incl
            # transmittance is monotone along the chunk, so "crossed the
            # termination threshold" needs no cumulative-or — one compare,
            # done in LOG space (no exp needed for the test)
            done = (S < LOG_T_EPS) | (done_col > 0.5)      # (n_px, CHUNK)
            live = 1.0 - done.astype(jnp.float32)
            # blend weight w = a * U with U = T_incl/(1-a) = exp(S - X):
            # one exp, no divide
            w = a * jnp.exp(S - X) * live                  # (n_px, CHUNK)
            # decode integer-valued 10-bit color fields -> (3, CHUNK)
            scale = COLOR_MAX / _Q
            if packed:
                semf = vi[4:5, :].astype(jnp.float32)      # (1, CHUNK)
                col = jnp.concatenate([
                    (v3 & 0x3FF).astype(jnp.float32) * scale,
                    ((v3 >> 10) & 0x3FF).astype(jnp.float32) * scale,
                    ((v3 >> 20) & 0x3FF).astype(jnp.float32) * scale,
                ], axis=0)                                 # (3, CHUNK)
            else:
                rg = G[6:7, :].astype(jnp.int32)
                bsem = G[7:8, :]
                semf = jnp.floor(bsem * (1.0 / 1024.0))    # (1, CHUNK)
                col = jnp.concatenate([
                    (rg & 0x3FF).astype(jnp.float32) * scale,
                    (rg >> 10).astype(jnp.float32) * scale,
                    (bsem - semf * 1024.0) * scale,
                ], axis=0)                                 # (3, CHUNK)
            rgb_acc = rgb_acc + jax.lax.dot_general(
                w, col, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
            if with_seg:
                wmax = jnp.max(w, axis=1, keepdims=True)   # (n_px, 1)
                cand = jnp.max(jnp.where(w >= wmax, semf - 1.0, -jnp.inf),
                               axis=1, keepdims=True)
                better = wmax > best_w
                best_w = jnp.where(better, wmax, best_w)
                best_sem = jnp.where(better, cand, best_sem)
            logT = logT + jnp.sum(X * live, axis=1, keepdims=True)
            done_col = done[:, CHUNK - 1:CHUNK].astype(jnp.float32)
            return c + 1, rgb_acc, logT, done_col, best_w, best_sem

        def cond(carry):
            c, _, _, done_col, _, _ = carry
            return (c < nch) & (jnp.min(done_col) < 0.5)

        init = (jnp.int32(0),
                jnp.zeros((n_px, 3), jnp.float32),
                jnp.zeros((n_px, 1), jnp.float32),
                jnp.zeros((n_px, 1), jnp.float32),
                jnp.zeros((n_px, 1), jnp.float32),
                jnp.full((n_px, 1), SEG_NONE, jnp.float32))
        c_fin, rgb_acc, logT, _, best_w, best_sem = jax.lax.while_loop(
            cond, body, init)

        # saturation early-exit leaves one DMA in flight: drain it
        @pl.when(c_fin < nch)
        def _():
            get_dma(c_fin % 2, b0 + c_fin).wait()

        T_fin = jnp.exp(logT)
        b0f, b1f, b2f = (float(v) for v in cfg.bg)
        rgb = rgb_acc + jnp.concatenate(
            [T_fin * b0f, T_fin * b1f, T_fin * b2f], axis=1)
        seg = jnp.where(best_w > T_EPS, best_sem, SEG_NONE)
        out_ref[0, ti, :, :] = jnp.concatenate(
            [rgb, T_fin, seg], axis=1).T                   # (5, n_px)


def pack_records_bwd(proj: Projected) -> jnp.ndarray:
    """(N, 9) f32 backward record: [mx, my, A, B, C, opacity, r, g, b].
    Unlike the forward record the colors stay full f32 — gradients must
    match XLA autodiff to ~1e-4 (test_render.py), beyond 10-bit."""
    valid = proj.radius > 0
    opac = jnp.where(valid, proj.opacity, 0.0)
    return jnp.stack([
        proj.mean2d[:, 0], proj.mean2d[:, 1],
        proj.conic[:, 0], proj.conic[:, 1], proj.conic[:, 2],
        opac, proj.color[:, 0], proj.color[:, 1], proj.color[:, 2],
    ], axis=1)


def _bwd_kernel(ctile_ref, astarts_ref, recs_ref, pix_ref, out_ref,
                state, *, cfg: RasterConfig, n_px: int):
    """Backward over the chunk-aligned entry stream (the TPU analog of
    diff-gaussian-rasterization backward.cu).

    The grid iterates 128-entry CHUNKS of a stream where every tile's
    segment is chunk-aligned (composite_bwd_pallas re-packs it), so each
    grid step owns its output block exclusively and all IO is
    pallas-blocked — no manual DMA.  TPU grids execute sequentially, so
    the per-tile forward-walk state (running prefix of w*r, log
    transmittance, termination column) carries across grid steps in VMEM
    scratch and resets when the prefetched chunk->tile map changes.

    One forward-order walk reconstructs transmittance U_i and the done
    mask exactly as the forward kernel; the suffix sum
    s_i = sum_{j>i} w_j r_j + T_fin (g.bg + tct) needs no reverse pass
    because the grand total is available from the forward outputs:
    S_total = g . rgb_out + T_fin * tct, so s_i = S_total - prefix_i.
    """
    tile_px = cfg.tile
    gx = cfg.tiles_x

    li = jax.lax.broadcasted_iota(jnp.int32, (n_px, 1), 0)
    x_loc = (li % tile_px).astype(jnp.float32)
    y_loc = (li // tile_px).astype(jnp.float32)
    triu = (jax.lax.broadcasted_iota(jnp.int32, (CHUNK, CHUNK), 0)
            <= jax.lax.broadcasted_iota(jnp.int32, (CHUNK, CHUNK), 1)
            ).astype(jnp.bfloat16)

    f = pl.program_id(0)
    c = pl.program_id(1)
    t = ctile_ref[f, c]
    dead = t >= cfg.num_tiles          # chunk beyond every live segment

    prev_t = jnp.where(c > 0, ctile_ref[f, jnp.maximum(c - 1, 0)], -1)
    fresh = (c == 0) | (t != prev_t)

    @pl.when(fresh)
    def _():
        state[...] = jnp.zeros_like(state)

    # state rows: 0 = running prefix of w*r, 1 = logT, 2 = done flag
    pref = state[0:1, :].T                          # (n_px, 1)
    logT = state[1:2, :].T
    done_col = state[2:3, :].T

    gct = pix_ref[0, 0, 0:3, :].T                   # (n_px, 3)
    tct = pix_ref[0, 0, 3:4, :].T
    rgb_out = pix_ref[0, 0, 4:7, :].T
    T_fin = pix_ref[0, 0, 7:8, :].T
    # grand total of the suffix recurrence, from the forward outputs:
    # sum_j w_j (g.c_j) + T_fin (g.bg + tct) = g.rgb_out + T_fin*tct
    S_total = (jnp.sum(gct * rgb_out, axis=1, keepdims=True)
               + T_fin * tct)                       # (n_px, 1)

    ox = ((t % gx) * tile_px).astype(jnp.float32)
    oy = ((t // gx) * tile_px).astype(jnp.float32)

    skip = dead | (jnp.min(done_col) > 0.5)

    @pl.when(skip)
    def _():
        out_ref[...] = jnp.zeros_like(out_ref)

    @pl.when(jnp.logical_not(skip))
    def _():
        G = recs_ref[0, 0]                          # (9, CHUNK)
        # aligned stream: every lane of this chunk belongs to tile t; pad
        # lanes carry gaussian -1 whose record is zeroed -> opacity 0
        maskv = G[5:6, :] > 0.0
        mx, my = G[0:1, :], G[1:2, :]
        dx = (mx - ox) - x_loc                      # (n_px, CHUNK)
        dy = (my - oy) - y_loc
        A, B, C = G[2:3, :], G[3:4, :], G[4:5, :]
        opac = G[5:6, :]
        power = -0.5 * (A * dx * dx + C * dy * dy) - B * dx * dy
        alpha = jnp.minimum(ALPHA_MAX, opac * jnp.exp(power))
        contrib = maskv & (power <= 0.0) & (alpha >= ALPHA_MIN)
        a = jnp.where(contrib, alpha, 0.0)
        X = jnp.log1p(-a)
        Xh = X.astype(jnp.bfloat16)
        Xl = (X - Xh.astype(jnp.float32)).astype(jnp.bfloat16)
        incl = (jnp.dot(Xh, triu, preferred_element_type=jnp.float32,
                        precision=jax.lax.Precision.DEFAULT)
                + jnp.dot(Xl, triu, preferred_element_type=jnp.float32,
                          precision=jax.lax.Precision.DEFAULT))
        T_incl = jnp.exp(incl + logT)
        done = (T_incl < T_EPS) | (done_col > 0.5)
        live = 1.0 - done.astype(jnp.float32)
        U = jnp.exp(incl - X + logT)                # exclusive prefix T
        w = a * U * live                            # (n_px, CHUNK)

        col = G[6:9, :]                             # (3, CHUNK)
        r = jnp.dot(gct, col, preferred_element_type=jnp.float32)
        wr = w * r
        wh = wr.astype(jnp.bfloat16)
        wl = (wr - wh.astype(jnp.float32)).astype(jnp.bfloat16)
        pre = (jnp.dot(wh, triu, preferred_element_type=jnp.float32,
                       precision=jax.lax.Precision.DEFAULT)
               + jnp.dot(wl, triu, preferred_element_type=jnp.float32,
                         precision=jax.lax.Precision.DEFAULT))
        pre_incl = pre + pref                       # inclusive prefix of wr
        s_after = S_total - pre_incl                # (n_px, CHUNK)
        eff = a * live
        ebar = U * r - s_after / (1.0 - eff)
        abar = ebar * live * contrib.astype(jnp.float32)
        q = abar * alpha * (alpha < ALPHA_MAX).astype(jnp.float32)

        # per-entry reductions over pixels (all MXU)
        cbar = jax.lax.dot_general(                 # (CHUNK, 3)
            w, gct, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        basis = jnp.concatenate(
            [jnp.ones_like(x_loc), x_loc, y_loc,
             x_loc * x_loc, x_loc * y_loc, y_loc * y_loc], axis=1)
        M = jax.lax.dot_general(                    # (CHUNK, 6)
            q, basis, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        M0 = M[:, 0:1].T                            # (1, CHUNK)
        Mx, My = M[:, 1:2].T, M[:, 2:3].T
        Mxx, Mxy, Myy = M[:, 3:4].T, M[:, 4:5].T, M[:, 5:6].T
        mlx, mly = mx - ox, my - oy                 # tile-local means
        Sx = mlx * M0 - Mx
        Sy = mly * M0 - My
        mbar_x = -(A * Sx + B * Sy)
        mbar_y = -(C * Sy + B * Sx)
        Abar = -0.5 * (mlx * mlx * M0 - 2.0 * mlx * Mx + Mxx)
        Bbar = -(mlx * mly * M0 - mlx * My - mly * Mx + Mxy)
        Cbar = -0.5 * (mly * mly * M0 - 2.0 * mly * My + Myy)
        obar = M0 / jnp.maximum(opac, 1e-6)
        g9 = jnp.concatenate([
            mbar_x, mbar_y, Abar, Bbar, Cbar,
            cbar[:, 0:1].T, cbar[:, 1:2].T, cbar[:, 2:3].T, obar,
        ], axis=0)                                  # (9, CHUNK)
        out_ref[0, 0] = jnp.where(maskv, g9, 0.0)

        state[0:1, :] = pre_incl[:, CHUNK - 1:CHUNK].T
        state[1:2, :] = (logT + jnp.sum(X * live, axis=1, keepdims=True)).T
        state[2:3, :] = done[:, CHUNK - 1:CHUNK].astype(jnp.float32).T


def composite_bwd_pallas(proj: Projected, bins: EntryBins, cfg: RasterConfig,
                         img_ct, T_ct, img_out, T_out,
                         interpret=None):
    """Gradients of composite_tiles_pallas w.r.t. the projected floats.

    Args are single-frame or with one leading frame axis (matching the
    forward).  Returns per-gaussian grads dict(mean2d, conic, color,
    opacity) summed over frames.
    """
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    n_px = cfg.tile * cfg.tile
    T = cfg.num_tiles
    batched = proj.depth.ndim == 2
    if not batched:
        proj = jax.tree.map(lambda x: x[None], proj)
        bins = jax.tree.map(lambda x: x[None], bins)
        img_ct, T_ct = img_ct[None], T_ct[None]
        img_out, T_out = img_out[None], T_out[None]
    F = bins.starts.shape[0]
    N = proj.depth.shape[1]
    E = bins.gaussian.shape[1]
    # chunk-align every tile segment: static padded budget
    E_pad = E + T * CHUNK
    NB = E_pad // CHUNK

    def repack(b):
        cnt = jnp.diff(b.starts)                                  # (T,)
        acnt = (cnt + CHUNK - 1) // CHUNK * CHUNK
        astarts = jnp.concatenate([
            jnp.zeros((1,), jnp.int32),
            jnp.cumsum(acnt).astype(jnp.int32)])                  # (T+1,)
        idx = jnp.arange(E, dtype=jnp.int32)
        tile_of = (jnp.searchsorted(b.starts, idx, side="right")
                   .astype(jnp.int32) - 1)
        tile_of = jnp.clip(tile_of, 0, T)
        live = idx < b.starts[T]
        dest = jnp.where(
            live, astarts[jnp.minimum(tile_of, T - 1)]
            + (idx - b.starts[jnp.minimum(tile_of, T - 1)]), E_pad)
        ga = jnp.full((E_pad,), -1, jnp.int32).at[dest].set(
            b.gaussian, mode="drop")
        # chunk -> tile map (aligned): sentinel T for fully-dead chunks
        cidx = jnp.arange(NB, dtype=jnp.int32) * CHUNK
        ctile = (jnp.searchsorted(astarts, cidx, side="right")
                 .astype(jnp.int32) - 1)
        ctile = jnp.where(cidx < astarts[T], ctile, T)
        return ga, astarts, ctile

    ga, astarts, ctile = jax.vmap(repack)(bins)                   # (F, ...)

    def prep(p, g):
        packed = pack_records_bwd(p)                              # (N, 9)
        recs = jnp.where((g >= 0)[:, None],
                         packed[jnp.maximum(g, 0)], 0.0)          # (E_pad, 9)
        return recs.reshape(NB, CHUNK, 9).transpose(0, 2, 1)

    recs = jax.vmap(prep)(proj, ga)                               # (F,NB,9,128)

    # per-tile pixel channels [gct(3), tct, rgb_out(3), T_fin] -> (F,T+1,8,npx)
    def tiles_of(img, ch):
        t, gxx, gyy = cfg.tile, cfg.tiles_x, cfg.tiles_y
        pad_h, pad_w = gyy * t - cfg.height, gxx * t - cfg.width
        img = jnp.pad(img, ((0, 0), (0, pad_h), (0, pad_w), (0, 0)))
        img = img.reshape(F, gyy, t, gxx, t, ch)
        return img.transpose(0, 1, 3, 5, 2, 4).reshape(F, gyy * gxx, ch,
                                                       n_px)

    pix = jnp.concatenate([
        tiles_of(img_ct, 3),
        tiles_of(T_ct[..., None], 1),
        tiles_of(img_out, 3),
        tiles_of(T_out[..., None], 1),
    ], axis=2)                                                    # (F,T,8,npx)
    # sentinel tile T indexes one extra zero row
    pix = jnp.concatenate([pix, jnp.zeros((F, 1, 8, n_px))], axis=1)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,    # ctile, astarts
        grid=(F, NB),
        in_specs=[
            pl.BlockSpec((1, 1, 9, CHUNK), lambda f, c, ct, st: (f, c, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 8, n_px),
                         lambda f, c, ct, st: (f, ct[f, c], 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, 9, CHUNK),
                               lambda f, c, ct, st: (f, c, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((3, n_px), jnp.float32),   # pref / logT / done
        ],
    )
    out = pl.pallas_call(
        functools.partial(_bwd_kernel, cfg=cfg, n_px=n_px),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((F, NB, 9, CHUNK), jnp.float32),
        interpret=interpret,
    )(ctile, astarts, recs, pix)

    g9 = out.transpose(0, 1, 3, 2).reshape(F, E_pad, 9)

    def scatter(g, gsn):
        ok = (gsn >= 0)[:, None]
        return jnp.zeros((N, 9), jnp.float32).at[
            jnp.maximum(gsn, 0)].add(jnp.where(ok, g, 0.0))

    acc = jax.vmap(scatter)(g9, ga).sum(axis=0)
    return dict(mean2d=acc[:, 0:2], conic=acc[:, 2:5],
                color=acc[:, 5:8], opacity=acc[:, 8])



def composite_tiles_pallas(proj: Projected, bins: EntryBins,
                           cfg: RasterConfig, semantics=None,
                           interpret=None,
                           tiles_per_program: int = 4):
    """Blend segment-packed entries into ((H, W, 3) image, (H, W)
    transmittance[, (H, W) int32 segmentation if ``semantics`` given]).

    ``proj``/``bins`` may carry one leading frame axis (batched envs x
    cameras): all frames run in ONE pallas grid (axis 0 = frame).
    Segmentation = semantic id of the dominant (max-weight) contributor per
    pixel, -1 where nothing dominates — the GS analog of the reference's
    obs_mode="rgb+segmentation" channel (gs_world_wrapper.py:168-173).
    """
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    T = cfg.num_tiles
    n_px = cfg.tile * cfg.tile
    while T % tiles_per_program:
        tiles_per_program //= 2
    tpb = max(tiles_per_program, 1)

    batched = proj.depth.ndim == 2
    if batched:
        recs = jax.vmap(
            lambda p, b: _prep_entry_records(p, b, semantics))(proj, bins)
        starts = bins.starts                               # (F, T+1)
    else:
        recs = _prep_entry_records(proj, bins, semantics)[None]
        starts = bins.starts[None]
    F = recs.shape[0]
    n_rows = recs.shape[-2]           # REC_W unpacked / 5 packed int32
    packed = n_rows == 5 and getattr(cfg, "pack_records", False)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(F, T // tpb),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec((1, tpb, 5, n_px), lambda f, t, s: (f, t, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((2, n_rows, CHUNK), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    out = pl.pallas_call(
        functools.partial(_segment_kernel, cfg=cfg, n_px=n_px,
                          tiles_per_program=tpb,
                          with_seg=semantics is not None, packed=packed),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((F, T, 5, n_px), jnp.float32),
        interpret=interpret,
    )(starts, recs)

    gy, gx, t = cfg.tiles_y, cfg.tiles_x, cfg.tile
    out = out.reshape(F, gy, gx, 5, t, t)
    img = out[:, :, :, :3].transpose(0, 1, 4, 2, 5, 3).reshape(
        F, gy * t, gx * t, 3)[:, : cfg.height, : cfg.width]
    T_img = out[:, :, :, 3].transpose(0, 1, 3, 2, 4).reshape(
        F, gy * t, gx * t)[:, : cfg.height, : cfg.width]
    outs = (img, T_img)
    if semantics is not None:
        seg = out[:, :, :, 4].transpose(0, 1, 3, 2, 4).reshape(
            F, gy * t, gx * t)[:, : cfg.height, : cfg.width]
        outs = outs + (jnp.round(seg).astype(jnp.int32),)
    if not batched:
        return jax.tree.map(lambda x: x[0], outs)
    return outs
