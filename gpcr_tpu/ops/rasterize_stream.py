"""Streaming Pallas rasterizer — active-tile grid over a sorted entry stream.

This is the round-2 fast path replacing ``rasterize_pallas`` (which gridded
over ALL tiles, paid chunk-aligned re-layout gathers, and issued blocking
per-chunk DMAs). Design, driven by measured TPU primitive costs
(scripts/microbench_prims.py — row gathers ~110M rows/s regardless of width,
lax.sort 6.4M 2-key ~24 ms, scatters/cumsums cheap):

- binning = broadcast duplication (pure vector ops, no gather) + ONE global
  2-key ``lax.sort`` by (tile, depth) + ONE wide row-gather that packs every
  per-entry quantity the blend needs ([x y conic3 op | features]) into a
  row-major ``(k_budget, ncols)`` stream in sorted order. Replaces the CUB
  prefix-scan + 64-bit radix sort of the reference
  (rasterizer_impl.cu:70-138,275-318) with no D2H sync.
- the kernel grid walks tiles in DESCENDING entry-count order (argsort of the
  per-tile counts, scalar-prefetched). Each grid step owns one tile: an inner
  fori loop double-buffers contiguous ``(chunk, ncols)`` row windows from HBM
  (full rows are contiguous — one DMA descriptor per chunk) and composites
  with the exact renderCUDA semantics (forward.cu:264-377): α = min(0.99,
  op·exp(power)), skip α < 1/255 or power > 0, per-pixel termination when
  T < 1e-4 WITHOUT compositing the crossing Gaussian. Math runs in the
  (chunk = sublanes, pixels = lanes) orientation; the inclusive transmittance
  scan is log-space shift-add over sublanes; features hit the MXU once per
  chunk as a (chunk, Cp) x (chunk, P) contraction.
- outputs land in ORDER space (one (Cp, P) block per grid step, final
  transmittance in the last channel row) and are unpermuted/composited
  against the background in XLA.

Because every tile pays exactly its own chunk count (no vmap lockstep) and
empty tiles are a single block write, the wall-clock is the sum of real
per-tile work — the property the CUDA kernel gets from its per-tile thread
blocks.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import rasterize as R

# binning-variant toggles for A/B benchmarking (scripts/bench bisect);
# flip via env before import. Defaults = the measured-fastest config IN THE
# FULL FUSED FRAME GRAPH, which differs from the isolated-stage optima in
# two places (both re-measured, see PERFORMANCE.md "fused-graph defaults"):
# - starts method 'scan' beats 'sort' by ~10 ms/frame fused even though
#   'sort' is 3x faster isolated (the extra lax.sort breaks producer
#   fusions XLA otherwise applies across the searchsorted);
# - the packed-table optimization_barrier is NEUTRAL here (the stream
#   gather is the only consumer, so XLA materializes the table anyway);
#   it is load-bearing only in gather-from-gather chains like the sparse
#   conv ext tables (PERFORMANCE.md pitfall 7).
import os as _os

_STREAM_BARRIER = _os.environ.get("GPCR_STREAM_BARRIER", "0") == "1"
# barrier the (tile, gidx) emit outputs before the big sort — measured a
# WASH at the bench (the emit/sort cost is the transpose or lane waste,
# not producer refusion); kept as an A/B toggle, default off.
_SORT_BARRIER = _os.environ.get("GPCR_SORT_BARRIER", "0") == "1"
_STARTS_METHOD = _os.environ.get("GPCR_STARTS_METHOD", "scan")
# emit layout (round-4 true-cost measurements, microbench_emit_true.py /
# microbench_rank_sort.py, all D2H-timed at the bench shape):
#   rank (default): emit (tile, DEPTH-RANK) keys in (cap, n) orientation
#     and flatten slot-major (free — with unique 2-keys the sort input
#     order is irrelevant), 2-key sort the pair (4.4 ms, same price as
#     1-key), and gather the stream from a rank-ordered packed table
#     (one 800Kx128 PERMUTATION gather, ~0.3 ms — permutations are ~20x
#     cheaper than random gathers on this chip). Composed: 5.3 ms where
#     cn/nc measure 15.5.
#   cn: g-major via (cap,n) emit + .T.reshape — the transpose costs
#     ~8-10 ms (lane<->sublane relayout of 2x 12.8 MB).
#   nc: g-major via (n,cap) emit — free reshape but the 4-lane ops pay
#     ~32x VPU lane waste (~6.6 ms). Both legacy layouts need the STABLE
#     1-key sort (g-major input carries the depth tie-break).
_EMIT_LAYOUT = _os.environ.get("GPCR_EMIT_LAYOUT", "rank")  # rank|cn|nc
_UNPERM = _os.environ.get("GPCR_UNPERM", "gather")  # gather | scatter
# exact per-tile cull (cn layout only): drop (splat, tile) entries whose
# max alpha over the tile's pixel rect is < 1/255 — the blend skips those
# per-pixel anyway (forward.cu:318-320 semantics), so output is
# bit-identical while per-tile blend ranges (and the k_budget needed)
# shrink by the rect-vs-ellipse waste. DEFAULT OFF — measured a NET LOSS
# on both deployed workloads (bench 62->75 ms/frame, pcrender rgb
# 1.77->1.99 s): the 4-edge quadratic over the (cap, n) emit plus 6 extra
# presort payloads cost ~13 ms/frame, while the bench's voxel splats are
# isotropic and the learned splats mostly sub-tile, so almost nothing
# culls. Opt in for scenes with large anisotropic splats.
_TILE_CULL = _os.environ.get("GPCR_TILE_CULL", "0") == "1"
# pre-sort compaction: when the rect cap is much larger than the entry
# budget (learned-path configs: cap=32 -> cap*n = 25.6M enumerated slots
# for ~6.4M real entries), reconstruct the k_budget compacted entry list
# directly (boundary scatter + delta cumsums — no per-entry gathers) and
# sort kb entries instead of cap*n. "auto" enables it when kb*2 <= cap*n;
# "1"/"0" force. Bit-exact vs the dense emit whenever total <= kb (same
# gaussian-major order into the same stable sort); in the overflow regime
# the dropped entries differ (depth-tail vs tile-tail) — both warned.
# ROUND-4 A/B: forcing compact at the bench shape (kb=1.8M vs cap*n=3.2M)
# measured 66.3 vs 47.3 ms/frame — the fill cumsums/scatters cost far
# more than the 1.8x-smaller sort saves.
# ROUND-5 A/B at the LEARNED shape (kb=7.5M, cap*n=12.8M — ratio gate
# off at both shapes): compact 105.1 vs dense 124.5 ms/view
# (profile_stream_prefix --shape learned): the 12.8M dense sort costs
# +22 ms that compact removes, while the fill cumsums add only ~7 —
# at this scale the sort savings dominate; at bench scale (3.2M) they
# don't. So the auto gate is ratio OR absolute dense-sort size:
# kb*2 <= cap*n, or cap*n >= 8M entries (the term compact removes —
# between the measured 3.2M-loses and 11.5M/12.8M-wins shapes; the
# CLI's deployed learned shape is cap 16 x ~717K voxels = 11.5M).
_EMIT_COMPACT = _os.environ.get("GPCR_EMIT_COMPACT", "auto")
# kernel transmittance scan: "two" = two-level (in-vreg 8-sublane scan
# + cross-vreg group scan on a chunk/8-row array, ~13 VPU ops/element) vs
# "flat" = single-level shift scan (log2(chunk) steps, ~24 ops/element).
# MEASURED round 4 at the bench shape: flat 49.2 vs two 50.8 ms/frame —
# the op-count model does not predict Mosaic's lowering here (the
# reshape/slice relayouts eat the two-level savings); default flat.
# "mxu" (round 5) = log-space cumsum on the MXU: the inclusive product
# becomes one (chunk, chunk) 0/1 lower-triangular matmul over
# l = log2(1-a), run as 3 bf16 passes on an exact hi/mid/lo split of l
# (the 0/1 matrix is exact in bf16, so the 3-pass sum reconstructs the
# f32 cumsum to ~1 ulp). Replaces the ~24-op/element shift scan with
# ~5 VPU ops + ~50M MACs/chunk of otherwise-idle MXU; the crossing
# test, thr, and T_run updates move to the log2 domain. Output differs
# from the scan path only by log2/exp2 round-trip ulps (~1e-6 rel).
_SCAN_MODE = _os.environ.get("GPCR_SCAN", "flat")
# early termination of the chunk walk once every pixel crossed: saves
# dead-chunk compute+DMA on opaque scenes, but the cond's vector reduce
# feeds a SCALAR branch each chunk (a vector->scalar sync). "0" makes
# the while_loop condition purely scalar (walk all chunks) to measure
# that sync cost.
_EARLY_EXIT = _os.environ.get("GPCR_EARLY_EXIT", "1") == "1"
# feature-contraction MXU precision: "highest" = 6-pass f32-exact (the
# parity default; gotcha 2 in PERFORMANCE.md), "high" = MANUAL 3-pass
# bf16x3 (hi/lo split + 3 default-precision dots; lax.Precision.HIGH has
# no Mosaic lowering — it fails to compile inside a Pallas kernel), or
# "default" = 1-pass bf16 (~4e-3 relative — at the 1/255 color-
# quantization scale; measured 47.3 -> 44.1 ms/frame, the right trade
# for uint8 output pipelines). ROUND-4 A/B: "high" measured 48.3 —
# NO win over "highest" (the 4 split ops + 3 chained dots cost what the
# 3 saved passes save; max_err 6.6e-6 vs the XLA oracle), so the f32-
# exact default stands and "default" is the only opt-in that pays.
_FEAT_PRECISION = _os.environ.get("GPCR_FEAT_PRECISION", "highest")
# stream-gather mode: "global" = one 1.8M-row gather from the rank-ordered
# packed table (above the ~64 MB table-size cliff: ~130-250 M rows/s and
# BIMODAL across processes, 7-17 ms at the bench shape); "blocked" =
# spatially re-sorted table + blocked-window gather (each block of sorted
# entries gathers from a dynamic-slice window around its own tiles'
# gaussians — windows sit below the byte cliff, where gathers measure
# ~455 M rows/s). Costs two extra 800K sorts + one narrow index map;
# exact up to a window-overflow guard counted into `overflow`.
_STREAM_GATHER = _os.environ.get("GPCR_STREAM_GATHER", "global")
# Packed-table lane width. 0 (default) = narrow-auto: pad the 8 + C + 4
# used columns to the next multiple of 8. The original layout padded to
# 128 lanes (512 B rows) on the assumption that 512 B was the fastest
# gather granule, but the round-5 width sweep
# (scripts/microbench_gather_width.py) shows the row gather is strongly
# BYTE-driven: at 800K rows / 1.8M indices a 24-lane table gathers
# ~1.4-1.5x faster than the 128-lane one and a 16-lane one ~1.7x
# (reproduced twice, same process). Narrow also cuts the table-build
# write 5-8x and the kernel's per-chunk DMA bytes. GPCR_STREAM_NCOLS=128
# restores the old layout.
_STREAM_NCOLS = int(_os.environ.get("GPCR_STREAM_NCOLS", "0"))
_STREAM_WINDOW = int(_os.environ.get("GPCR_STREAM_WINDOW", "98304"))
_STREAM_BLOCK = int(_os.environ.get("GPCR_STREAM_BLOCK", "131072"))


def _round_up(x, m):
    return -(-x // m) * m


def _blocked_row_gather(table, idx, n, window, block):
    """Gather ``table[idx]`` (rows) in blocks, each from a dynamic-slice
    window of the table — the below-cliff gather path (PERFORMANCE.md:
    tables under ~64 MB gather ~4.5x faster than big ones, byte-driven).

    ``table`` is (n + 1, C) with an inert zero row at ``n``; ``idx`` values
    must be window-local per block (callers sort the table spatially so a
    block of tile-sorted entries only references nearby gaussians).
    Rows whose index falls outside the block's window — or the ``n``
    sentinel — come back ZERO (inert for the blend); the count of REAL
    rows dropped this way is returned for overflow accounting.
    """
    kbp = idx.shape[0]
    c = table.shape[1]
    # dynamic_slice sizes may not exceed the sliced dim: a window taller
    # than the (n + 1)-row table would fail at trace time (the lo clamp
    # below only guards the slice START)
    window = min(window, table.shape[0])
    nb = -(-kbp // block)
    idxp = jnp.pad(idx, (0, nb * block - kbp), constant_values=n)
    blocks = idxp.reshape(nb, block)
    real = blocks < n
    lo = jnp.min(jnp.where(real, blocks, n), axis=1)
    lo = jnp.clip(lo, 0, max(n + 1 - window, 0))

    def step(_, xs):
        bidx, lo_b = xs
        win = jax.lax.dynamic_slice(table, (lo_b, 0), (window, c))
        loc = bidx - lo_b
        ok = (loc >= 0) & (loc < window) & (bidx < n)
        rows = win[jnp.clip(loc, 0, window - 1)]
        rows = jnp.where(ok[:, None], rows, 0.0)
        drop = jnp.sum(((bidx < n) & ~ok).astype(jnp.int32))
        return None, (rows, drop)

    _, (out, drops) = jax.lax.scan(step, None, (blocks, lo))
    return out.reshape(nb * block, c)[:kbp], jnp.sum(drops)


# --------------------------------------------------------------------------
# binning: sort + one packed gather
# --------------------------------------------------------------------------


def bin_sorted_stream(
    prep: R.Preprocessed,
    num_tiles: int,
    grid_x: int,
    config: R.RasterizeConfig,
    stage: str = "full",
    return_entries: bool = False,
    tile_window=None,
):
    """Depth-presort -> duplicate -> ONE stable tile sort -> stream gather.

    Exactly reproduces the reference's 64-bit (tile | depth-bits) radix
    ordering (rasterizer_impl.cu:70-111,300-308): gaussians are first sorted
    by (depth, gidx) — 800K keys, ~1 ms — entries are then emitted in that
    order and a STABLE single-key i32 sort groups them by tile, so within a
    tile entries stay (depth, gidx)-ordered, which is the CUB stable-radix
    tie-break. Measured on-chip: the stable 1-key sort costs the same as the
    unstable one and ~30%% less than the 2-key (tile, depth) sort, and the
    800K presort + row permute are ~4 ms combined.

    Returns (stream (kb + chunk, ncols) f32, starts (num_tiles+1,) i32,
    overflow scalar i32, win_drop scalar i32). ``ncols`` = 8 scalar slots +
    channels padded to 8. Entry rows: [x, y, conic_x, conic_y, conic_z,
    opacity, depth, 0, feat...]. ``overflow`` counts entries never emitted
    (dup-cap / k_budget); ``win_drop`` counts entries EMITTED but zeroed by
    the blocked-mode gather window (always 0 in global mode) — kept apart
    so GPCR_STREAM_WINDOW can be tuned against its own counter.

    ``stage`` is a PROFILING-ONLY prefix cut ("presort" | "packed" |
    "emit" | "sort" | "starts" | "full"): the in-graph cost of stage k is
    the measured delta between prefixes, which fusion-blind isolated
    timings misstate (scripts/profile_stream_prefix.py). Cut outputs are
    shaped like the full ones but carry garbage past the cut.

    ``tile_window=(base, count)`` bins only tiles [base, base+count) in
    LOCAL tile ids (the per-shard binning of the tile-sharded multi-chip
    path, mirroring R.tile_bin): the emit stays the full replicated
    elementwise work, but the sort sentinel-sinks non-local entries, the
    starts table has count+1 rows, and k_budget/overflow count LOCAL
    entries only. ``base`` may be traced (shard_map axis index); ``count``
    must be static. Forces the dense emit + global gather (the compact
    and blocked variants assume the full tile range).
    """
    n = prep.depth.shape[0]
    if tile_window is not None:
        win_base, win_count = tile_window
    else:
        win_base, win_count = None, num_tiles
    cap = config.max_dup_per_gaussian
    ch = config.chunk_size
    k_full = n * cap
    kb = config.k_budget or k_full
    kb = min(_round_up(kb, ch), k_full)
    channels = prep.features.shape[-1]

    # 1. presort gaussians by (depth, gidx); invalid ones sink to the end.
    # The tile rect and validity ride along as sort payloads so the emit
    # step needs NO gather and the packed table needs NO permute (the main
    # sort's payload is the ORIGINAL index — stability is a property of
    # input positions, which are depth-ordered, not of payload values).
    # The 4 rect fields + validity pack into ONE i32 payload (sort cost
    # grows per operand; tile grids are <= 255 on each axis at every
    # supported resolution and rect extents are <= 255 by the same bound):
    # [rminx:8 | rminy:8 | rw:8 | rh:8], 0 for invalid (area 0). rw/rh
    # clamp at 255; area computed from the clamps stays >= cap whenever
    # the true area is, so the dup cap and overflow accounting are
    # unaffected.
    depth_key = jnp.where(prep.valid, prep.depth, jnp.inf)
    cull = _TILE_CULL and _EMIT_LAYOUT == "cn"
    grid_y_ = num_tiles // grid_x
    pack_ok = grid_x <= 255 and grid_y_ <= 255
    if pack_ok:
        rw0 = jnp.minimum(prep.rect[:, 2] - prep.rect[:, 0], 255)
        rh0 = jnp.minimum(prep.rect[:, 3] - prep.rect[:, 1], 255)
        rect_pack = jnp.where(
            prep.valid,
            (prep.rect[:, 0] << 24) | (prep.rect[:, 1] << 16)
            | (rw0 << 8) | rh0,
            0,
        ).astype(jnp.int32)
        operands = [depth_key, jnp.arange(n, dtype=jnp.int32), rect_pack]
    else:
        # tile grids beyond 255x255 (> 4080 px internal) don't fit the
        # 8-bit packing: carry the rect fields as separate payloads
        operands = [
            depth_key,
            jnp.arange(n, dtype=jnp.int32),
            prep.valid.astype(jnp.int32),
            prep.rect[:, 0],
            prep.rect[:, 1],
            prep.rect[:, 2],
            prep.rect[:, 3],
        ]
    n_base = len(operands)
    if cull:
        # cull-test payloads: projected mean, conic, and the power
        # threshold 2·ln(255·op) (alpha = op·e^{-q/2} < 1/255 ⇔ q > thr)
        operands += [
            prep.mean2d[:, 0],
            prep.mean2d[:, 1],
            prep.conic[:, 0],
            prep.conic[:, 1],
            prep.conic[:, 2],
            2.0 * jnp.log(255.0 * jnp.maximum(prep.opacity, 1e-12)),
        ]
    sorted_ops = jax.lax.sort(tuple(operands), num_keys=2)
    if pack_ok:
        (_, gidx_s, rect_ps) = sorted_ops[:3]
        # unpack ((v>>k)&0xFF fixes the arithmetic-shift sign extension
        # when rminx >= 128 sets the i32 sign bit); valid gaussians have
        # rh >= 1 so rect_pack == 0 identifies exactly the invalid ones
        rminx_s = (rect_ps >> 24) & 0xFF
        rminy_s = (rect_ps >> 16) & 0xFF
        rmaxx_s = rminx_s + ((rect_ps >> 8) & 0xFF)
        rmaxy_s = rminy_s + (rect_ps & 0xFF)
        valid_si = (rect_ps != 0).astype(jnp.int32)
    else:
        (_, gidx_s, valid_si, rminx_s, rminy_s, rmaxx_s, rmaxy_s) = (
            sorted_ops[:7])
    if stage == "presort":
        return (gidx_s + rminx_s + rmaxy_s + valid_si,
                rminy_s, jnp.int32(0), jnp.int32(0))

    # 2. packed per-gaussian rows (original order, one narrow concat +
    # lane pad; GPCR_STREAM_NCOLS above for the width policy — narrow
    # beat the original 128-lane/512 B rows by the width-sweep law).
    # Row layout: [x y conic3 op depth 0 | feat(C) | rect(4) | 0-pad].
    # The kernel's feature slice 8:8+c_out may overlap the rect cols; those
    # land in acc rows that are either sliced off (> channels) or
    # overwritten by the final-T row, so the overlap is harmless.
    rect_f = prep.rect.astype(jnp.float32)
    packed = jnp.concatenate(
        [
            prep.mean2d,
            prep.conic,
            prep.opacity[:, None],
            prep.depth[:, None],
            jnp.zeros((n, 1)),
            prep.features,
            rect_f,
        ],
        axis=-1,
    ).astype(jnp.float32)
    # +1 sentinel row (opacity 0 -> inert), pad lanes to the table width.
    # The kernel's feature slice is 8:8+c_out (c_out = channels + 1), so
    # the width floor is 8 + c_out even when that exceeds the 12 + C used
    # columns (it never does: rect(4) > the 1-col overlap).
    ncols = _STREAM_NCOLS or -(-max(packed.shape[1], 16) // 8) * 8
    packed = jnp.pad(packed, ((0, 1), (0, ncols - packed.shape[1])))
    if _STREAM_BARRIER:
        packed = jax.lax.optimization_barrier(packed)
    if stage == "packed":
        # barrier: the table build is elementwise — without it, a probe
        # reading one element would let DCE shrink the whole stage
        return (jax.lax.optimization_barrier(packed),
                jnp.zeros((1,), jnp.int32), jnp.int32(0), jnp.int32(0))

    # 8-bit field guards for the packed-rect fill: tile grids above
    # 255x255 (> ~4080 px internal) or caps above 255 fall back to the
    # dense emit. rw packs as min(rw, cap): k < cap, so any clamped
    # value >= cap yields the same kdiv = 0 / kmod = k.
    grid_y = num_tiles // grid_x
    compact = (not cull and _EMIT_COMPACT != "0" and win_base is None
               and grid_x <= 255 and grid_y <= 255 and cap <= 255
               and (_EMIT_COMPACT == "1" or kb * 2 <= k_full
                    or k_full >= 8_000_000))
    rank_mode = _EMIT_LAYOUT == "rank" and not cull
    # blocked stream gather: needs the rank emit (unique (tile, rank)
    # 2-keys), the packed-rect presort payload, and a table taller than
    # the window (otherwise the global gather is already below the cliff)
    blocked = (_STREAM_GATHER == "blocked" and rank_mode and not compact
               and win_base is None and pack_ok and n + 1 > _STREAM_WINDOW)
    if blocked:
        # spatial orders: spos = position in (primary-tile, rank) order.
        # Entries of one tile reference only gaussians whose primary tile
        # sits within a rect-extent span of it, so tile-sorted entry
        # blocks index a near-contiguous window of the spatially-sorted
        # table — the below-cliff gather. Locality SCALES WITH
        # max_dup_per_gaussian (cap 4 = 2x2 rects = one tile-row span;
        # larger caps reference gaussians up to cap-1 tile rows away,
        # so GPCR_STREAM_WINDOW must grow with cap or real rows get
        # zero-dropped — counted separately in win_drop).
        ptile_s = jnp.where(
            valid_si == 1, rminy_s * grid_x + rminx_s, num_tiles
        ).astype(jnp.int32)
        rank_iota = jnp.arange(n, dtype=jnp.int32)
        _, rank_sp, orig_sp = jax.lax.sort(
            (ptile_s, rank_iota, gidx_s), num_keys=2
        )
        # rank -> spos: inverse of the (unique-key) spos -> rank map
        _, spos_of_rank = jax.lax.sort((rank_sp, rank_iota), num_keys=1)
    if rank_mode:
        # depth-rank-ordered copy of the table: entries then carry RANK
        # (their gaussian's presort position) instead of the original
        # index, making (tile, rank) a UNIQUE 2-key whose sort order is
        # exactly the CUB (tile | depth) order with no stability
        # requirement — so the emit can flatten slot-major for free.
        # A permutation gather of (n+1, 128) measures ~0.3 ms (~20x
        # cheaper than a random gather of the same shape).
        perm = orig_sp if blocked else gidx_s
        packed_rank = packed[jnp.concatenate(
            [perm, jnp.full((1,), n, jnp.int32)])]
        if _STREAM_BARRIER or blocked:
            # pitfall 7: packed_rank is itself a gather — without a
            # barrier XLA may fuse it as a producer into the big stream
            # gather and re-evaluate the permutation per stream row.
            # MANDATORY in blocked mode: the per-window dynamic slices
            # would each re-run the permutation over their whole window.
            packed_rank = jax.lax.optimization_barrier(packed_rank)

    # 3. emit entries, (cap, n) orientation: the lane axis carries the
    # 800K gaussians (an (n, cap) layout would use cap of 128 lanes —
    # 32x VPU waste; transposing cut the emit from ~7 ms to ~1 ms)
    valid_s = valid_si.astype(bool)[None, :]
    rw = jnp.maximum(rmaxx_s - rminx_s, 1)[None, :]
    area_raw = ((rmaxx_s - rminx_s) * (rmaxy_s - rminy_s))[None, :]
    area = jnp.where(valid_s, jnp.minimum(area_raw, cap), 0)
    overflow = jnp.sum(
        jnp.where(valid_s, jnp.maximum(area_raw - cap, 0), 0)
    )

    if compact:
        # ---- compacted emit: kb slots, gaussian-major prefix order ----
        # Per-slot per-gaussian values are piecewise constant over the
        # exclusive-cumsum boundaries of `area`; reconstruct each with a
        # boundary scatter of DELTAS + one inclusive cumsum (exact in
        # int32) — no kb-row gathers (narrow-row gathers measured 2x the
        # cost of these cumsums at this size).
        area_v = area[0]
        cum = jnp.cumsum(area_v) - area_v  # exclusive starts (n,)
        total = jnp.sum(area_v)

        def fill(vals):
            d = vals - jnp.concatenate(
                [jnp.zeros((1,), vals.dtype), vals[:-1]])
            z = jnp.zeros((kb,), vals.dtype).at[cum].add(d, mode="drop")
            return jnp.cumsum(z)

        # rminx (<=255), rminy (<=255), min(rw, cap) (<=255) in one i32
        packed_rect = (rminx_s * (1 << 16) + rminy_s * (1 << 8)
                       + jnp.minimum(rw[0], cap)).astype(jnp.int32)
        rect_f2 = fill(packed_rect)
        g_fill = fill(jnp.arange(n, dtype=jnp.int32) if rank_mode
                      else gidx_s)
        k_local = jnp.arange(kb, dtype=jnp.int32) - fill(cum)
        rminx_f = rect_f2 >> 16
        rminy_f = (rect_f2 >> 8) & 0xFF
        rw_f = jnp.maximum(rect_f2 & 0xFF, 1)
        kdiv = jnp.zeros((kb,), jnp.int32)
        for j in range(1, cap):
            kdiv = kdiv + (k_local >= j * rw_f).astype(jnp.int32)
        kmod = k_local - kdiv * rw_f
        live = jnp.arange(kb, dtype=jnp.int32) < total
        tile_flat = jnp.where(
            live, (rminy_f + kdiv) * grid_x + (rminx_f + kmod), num_tiles
        ).astype(jnp.int32)
        g_flat = jnp.where(live, g_fill, n)
    elif rank_mode:
        # ---- rank emit (default): (cap, n) math, slot-major flatten ----
        k = jax.lax.broadcasted_iota(jnp.int32, (cap, n), 0)
        kdiv = jnp.zeros((cap, n), jnp.int32)
        for j in range(1, cap):
            kdiv = kdiv + (k >= j * rw).astype(jnp.int32)
        kmod = k - kdiv * rw
        ty = rminy_s[None, :] + kdiv
        tx = rminx_s[None, :] + kmod
        dup_valid = valid_s & (k < area)
        tile_flat = jnp.where(
            dup_valid, ty * grid_x + tx, num_tiles
        ).astype(jnp.int32).reshape(-1)
        g_flat = jnp.where(
            dup_valid,
            jax.lax.broadcasted_iota(jnp.int32, (cap, n), 1), n,
        ).reshape(-1)
    elif _EMIT_LAYOUT == "cn":
        k = jax.lax.broadcasted_iota(jnp.int32, (cap, n), 0)
        # k // rw and k % rw without integer division (no native int
        # divide on the VPU): k < cap is tiny, so k // rw ==
        # sum_j [k >= j*rw] over j = 1..cap-1
        kdiv = jnp.zeros((cap, n), jnp.int32)
        for j in range(1, cap):
            kdiv = kdiv + (k >= j * rw).astype(jnp.int32)
        kmod = k - kdiv * rw
        ty = rminy_s[None, :] + kdiv
        tx = rminx_s[None, :] + kmod
        dup_valid = valid_s & (k < area)
        if cull:
            # exact min of q(d) = a·dx² + 2b·dx·dy + c·dy² (d = pixel −
            # mean) over the tile's continuous pixel rect: q is convex
            # with its minimum at d = 0, so over a rect not containing
            # the mean the min lies on one of the 4 edges, each a 1-D
            # quadratic with a closed-form clamped minimizer. Entries
            # with qmin > thr have alpha < 1/255 at EVERY tile pixel —
            # the blend (forward.cu:318-320) contributes exactly zero
            # for them, so dropping here is bit-exact.
            mx_s, my_s, ca_s, cb_s, cc_s, thr_s = (
                sorted_ops[n_base:n_base + 6])
            lx = tx.astype(jnp.float32) * config.tile_x - mx_s[None, :]
            hx = lx + (config.tile_x - 1)
            ly = ty.astype(jnp.float32) * config.tile_y - my_s[None, :]
            hy = ly + (config.tile_y - 1)
            a = ca_s[None, :]
            b = cb_s[None, :]
            c = cc_s[None, :]

            def _edge_x(e):
                dy = jnp.clip(-b * e / jnp.maximum(c, 1e-12), ly, hy)
                return (a * e + 2.0 * b * dy) * e + c * dy * dy

            def _edge_y(e):
                dx = jnp.clip(-b * e / jnp.maximum(a, 1e-12), lx, hx)
                return a * dx * dx + (2.0 * b * dx + c * e) * e

            qmin = jnp.minimum(
                jnp.minimum(_edge_x(lx), _edge_x(hx)),
                jnp.minimum(_edge_y(ly), _edge_y(hy)),
            )
            inside = (lx <= 0) & (hx >= 0) & (ly <= 0) & (hy >= 0)
            qmin = jnp.where(inside, 0.0, qmin)
            dup_valid = dup_valid & ~(qmin > thr_s[None, :])
        tile_cn = jnp.where(
            dup_valid, ty * grid_x + tx, num_tiles
        ).astype(jnp.int32)
        g_cn = jnp.where(
            dup_valid, gidx_s[None, :], n  # sentinel row index
        )
        # flatten GAUSSIAN-major: entries in (depth, rect-slot) order,
        # exactly the reference's duplicateWithKeys emission order
        tile_flat = tile_cn.T.reshape(-1)
        g_flat = g_cn.T.reshape(-1)
    else:
        # (n, cap) orientation: wastes VPU lanes in isolation but can
        # fuse into the sort without a materialized transpose
        valid_v = valid_s[0]
        rw_v = rw[0]
        area_v = area[0]
        k = jnp.arange(cap, dtype=jnp.int32)
        kdiv = jnp.zeros((n, cap), jnp.int32)
        for j in range(1, cap):
            kdiv = kdiv + (k[None, :] >= j * rw_v[:, None]).astype(
                jnp.int32)
        kmod = k[None, :] - kdiv * rw_v[:, None]
        ty = rminy_s[:, None] + kdiv
        tx = rminx_s[:, None] + kmod
        dup_valid = valid_v[:, None] & (k[None, :] < area_v[:, None])
        tile_flat = jnp.where(
            dup_valid, ty * grid_x + tx, num_tiles
        ).astype(jnp.int32).reshape(-1)
        g_flat = jnp.where(
            dup_valid, gidx_s[:, None], n
        ).reshape(-1)

    if win_base is not None:
        # per-shard remap: local ids for window tiles, sentinel (count)
        # for everything else (incl. the old num_tiles sentinel); the
        # budget/overflow then count LOCAL entries only
        local = (tile_flat >= win_base) & (tile_flat < win_base + win_count)
        tile_flat = jnp.where(
            local, tile_flat - win_base, win_count).astype(jnp.int32)
        g_flat = jnp.where(local, g_flat, n)
    if _SORT_BARRIER:
        tile_flat, g_flat = jax.lax.optimization_barrier(
            (tile_flat, g_flat))
    if stage == "emit":
        # barrier: the emit is elementwise — see the "packed" cut
        tf, gf = jax.lax.optimization_barrier((tile_flat, g_flat))
        return (tf, gf, jnp.int32(0), jnp.int32(0))

    # 4. THE sort. rank mode: (tile, rank) pairs are UNIQUE (a gaussian
    # never emits one tile twice), so an unstable 2-key sort is
    # deterministic and reproduces the CUB (tile | depth-bits) order
    # exactly (rasterizer_impl.cu:300-308) — ranks are presort (depth,
    # gidx) positions. Legacy layouts feed gaussian-major input and rely
    # on the STABLE 1-key sort for the depth tie-break. Measured: 2-key
    # costs the same as 1-key (4.4 vs 3.8-4.5 ms at 3.2M).
    if rank_mode:
        sorted_tile, sorted_g = jax.lax.sort(
            (tile_flat, g_flat), num_keys=2
        )
    else:
        sorted_tile, sorted_g = jax.lax.sort(
            (tile_flat, g_flat), num_keys=1, is_stable=True
        )
    if stage == "sort":
        return (sorted_tile, sorted_g, jnp.int32(0), jnp.int32(0))
    # count SURVIVING entries (post-cull) against the budget; the
    # compact branch computed its `total` already
    if win_base is not None:
        total = jnp.sum(local.astype(jnp.int32))
    elif not compact:
        total = (jnp.sum(dup_valid.astype(jnp.int32)) if cull
                 else jnp.sum(area))
    overflow = overflow + jnp.maximum(total - kb, 0)

    # starts method: 'sort' merges the 16K tile ids into the entry stream
    # with one extra lax.sort (9.0 -> 3.4 ms ISOLATED at 1.8M entries,
    # scripts/ablate_stream.py) but measures ~10 ms/frame SLOWER in the
    # fused frame graph — default 'scan' (the toggle-block comment above
    # has the full story). 'scatter' computes the same table with one
    # scatter-min of entry positions keyed by tile + a reverse cummin
    # over the 16K-tile axis (exact: the stream is tile-sorted, so the
    # min position of tile t IS searchsorted-left, and the reverse
    # cummin backfills absent tiles with the next present tile's start).
    # NEGATIVE RESULT (round 4): 'scatter' measures 61.5 vs 47.3
    # ms/frame — XLA lowers the 1.8M-update scatter-min far below the
    # sort/searchsorted rates; kept as the A/B record.
    if _STARTS_METHOD == "scatter" and win_base is None:
        starts = jax.lax.cummin(
            jnp.full((num_tiles + 1,), kb, jnp.int32)
            .at[sorted_tile[:kb]]
            .min(jnp.arange(kb, dtype=jnp.int32), mode="drop"),
            reverse=True,
        )
    elif _STARTS_METHOD == "hier" and kb % 128 == 0 and win_base is None:
        # 2-level exact searchsorted over the sorted entry tiles.
        # start(t) = #entries < t. Reshape the kb-entry key list to
        # (kb/128, 128) rows; rows wholly below t are counted by one
        # SMALL searchsorted over the 14K row-last keys, and the
        # boundary row's contribution by one 16K-row gather (below the
        # byte cliff) + a compare-sum. Replaces the 21-step binary
        # search over the full 1.8M-key array (the 'scan' method),
        # whose every step is a separate 16K-element random gather.
        nrows = kb // 128
        st2 = sorted_tile[:kb].reshape(nrows, 128)
        rowlast = st2[:, 127]
        q = jnp.arange(num_tiles + 1, dtype=jnp.int32)
        rstar = jnp.searchsorted(rowlast, q, side="left").astype(jnp.int32)
        rows_b = st2[jnp.minimum(rstar, nrows - 1)]
        within = jnp.sum((rows_b < q[:, None]).astype(jnp.int32), axis=1)
        starts = jnp.where(
            rstar >= nrows, kb, rstar * 128 + within
        ).astype(jnp.int32)
    else:
        starts = jnp.searchsorted(
            sorted_tile[:kb],
            jnp.arange(win_count + 1, dtype=jnp.int32),
            side="left",
            method=_STARTS_METHOD if _STARTS_METHOD != "hier" else "scan",
        ).astype(jnp.int32)
    if stage == "starts":
        return (sorted_g, jax.lax.optimization_barrier(starts), overflow,
                jnp.int32(0))

    # 5. stream gather in sorted-entry order (sentinel payloads produce
    # inert zero rows, so the kernel's chunk slack comes from gathering
    # kb + chunk rows, no extra copy). rank mode gathers from the
    # rank-ordered table with rank indices; legacy from the original.
    sorted_g = jnp.concatenate(
        [sorted_g, jnp.full((ch,), n, jnp.int32)], axis=0
    )[: kb + ch]
    win_drop = jnp.int32(0)
    if blocked:
        # map sorted depth-ranks to spatial positions (one narrow gather
        # from a 4 MB table — far below the byte cliff), then gather the
        # stream rows from window slices of the spatial table
        sorted_g = jnp.concatenate(
            [spos_of_rank, jnp.full((1,), n, jnp.int32)]
        )[sorted_g]
        stream, win_drop = _blocked_row_gather(
            packed_rank, sorted_g, n, _STREAM_WINDOW, _STREAM_BLOCK
        )
    else:
        stream = (packed_rank if rank_mode else packed)[sorted_g]
    if return_entries:
        # (entry indices, index->original-gaussian map or None). The
        # stream rows stay in SORTED-ENTRY order in every mode; in
        # blocked mode the sorted_g VALUES are spatial positions into
        # packed_rank — compose with orig_sp for original gaussian ids
        return (stream, starts, overflow, win_drop, sorted_g,
                (orig_sp if blocked else gidx_s) if rank_mode else None)
    return stream, starts, overflow, win_drop


# --------------------------------------------------------------------------
# kernel
# --------------------------------------------------------------------------


def _stream_kernel(
    order_ref,  # scalar prefetch: (G,) i32 tile ids, actives first
    starts_ref,  # scalar prefetch: (num_tiles+2,) i32 entry offsets
    base_ref,  # scalar prefetch: (1,) i32 global tile id of local tile 0
    stream_hbm,  # (kb + chunk, ncols) f32, ANY (stays in HBM)
    out_ref,  # (tps, c_out, P) f32 VMEM — rows [:C]=acc, row c_out-1 = T
    buf,  # VMEM scratch (tps, 2, chunk, ncols) — per-tile double buffers
    sems,  # DMA semaphores (tps, 2)
    *,
    grid_x: int,
    tile_x: int,
    tile_y: int,
    chunk: int,
    ncols: int,
    c_out: int,
    channels: int,
    downscale: int = 1,
    tps: int = 1,
    with_contrib: bool = False,
    scan_mode: str = None,
    feat_precision: str = None,
):
    # config-resolved toggles (fall back to the env-var module defaults
    # so existing callers and the vjp wrapper keep their behavior)
    scan_mode = _SCAN_MODE if scan_mode is None else scan_mode
    feat_precision = _FEAT_PRECISION if feat_precision is None else feat_precision
    i = pl.program_id(0)
    p = tile_x * tile_y

    row = jax.lax.broadcasted_iota(jnp.int32, (chunk, 1), 0)
    sub = jax.lax.broadcasted_iota(jnp.int32, (chunk, 1), 0)
    colp = jax.lax.broadcasted_iota(jnp.int32, (1, p), 1)
    if scan_mode == "mxu":
        # inclusive lower-triangular 0/1 matrix (exact in bf16); built
        # once per grid step, shared by all tps tiles and their chunks
        tri = (
            jax.lax.broadcasted_iota(jnp.int32, (chunk, chunk), 0)
            >= jax.lax.broadcasted_iota(jnp.int32, (chunk, chunk), 1)
        ).astype(jnp.bfloat16)

    def cumprod_sublanes(x):
        """Inclusive cumulative product along the sublane axis — the same
        shift pattern with multiplies, avoiding the log/exp round-trip.

        Two-level mode (default): scan WITHIN each 8-sublane vreg row
        (3 steps, in-vreg rotates) then scan the per-group products on a
        (chunk/8, P) array (log2(chunk/8) steps on 1/8 the elements) and
        broadcast the exclusive group prefixes back — ~13 VPU
        ops/element vs ~24 for the flat log2(chunk)-step scan whose
        every roll crosses vreg boundaries.
        """
        if scan_mode == "two" and chunk % 8 == 0 and chunk >= 16:
            G = chunk // 8
            x3 = x.reshape(G, 8, p)
            s8 = jax.lax.broadcasted_iota(jnp.int32, (1, 8, 1), 1)
            for sh in (1, 2, 4):
                x3 = x3 * jnp.where(s8 >= sh, pltpu.roll(x3, sh, 1), 1.0)
            g = x3[:, 7, :]  # (G, P) inclusive per-group products
            gi = jax.lax.broadcasted_iota(jnp.int32, (G, 1), 0)
            sh = 1
            while sh < G:
                g = g * jnp.where(gi >= sh, pltpu.roll(g, sh, 0), 1.0)
                sh *= 2
            ge = jnp.where(gi >= 1, pltpu.roll(g, 1, 0), 1.0)  # exclusive
            return (x3 * ge[:, None, :]).reshape(chunk, p)
        shift = 1
        while shift < chunk:
            rolled = pltpu.roll(x, shift, 0)
            x = x * jnp.where(sub >= shift, rolled, 1.0)
            shift *= 2
        return x

    # tps tiles composited sequentially per grid step: the ~1 us fixed
    # per-step cost (launch + output-block write) amortizes tps-fold.
    # Padded order entries carry tile id == num_tiles, whose starts row
    # (starts_ref is padded by one) yields an empty range -> background.
    #
    # v8 DMA schedule: most tiles at the deployed shapes hold <= 1-2
    # chunks, so an in-walk double buffer has nothing to overlap and
    # every tile's first chunk exposed the full HBM round-trip (~4752
    # exposed latencies/frame). Instead the step PROLOGUE issues chunk 0
    # and chunk 1 for ALL tps tiles up front (each tile owns its buffer
    # pair buf[j]); the walk then waits chunk c, computes, and issues
    # chunk c+2 into the just-freed slot — tile j's first wait is
    # covered by tiles 0..j-1's compute.
    infos = []
    for j in range(tps):
        t = order_ref[i * tps + j]
        s = starts_ref[t]
        e = starts_ref[t + 1]
        infos.append((t, s, e, (e - s + chunk - 1) // chunk))

    def dma(j, slot, c, s):
        return pltpu.make_async_copy(
            stream_hbm.at[pl.ds(s + c * chunk, chunk), :],
            buf.at[j, slot],
            sems.at[j, slot],
        )

    for j, (t, s, e, nch) in enumerate(infos):
        @pl.when(nch > 0)
        def _(j=j, s=s):
            dma(j, 0, 0, s).start()

        @pl.when(nch > 1)
        def _(j=j, s=s):
            dma(j, 1, 1, s).start()

    for j, (t, s, e, nch) in enumerate(infos):
        # pixel coords come from the GLOBAL tile id (tile-sharded runs
        # pass local ids + the shard's window base; base is 0 otherwise)
        tg = t + base_ref[0]
        px = ((tg % grid_x) * tile_x + colp % tile_x).astype(jnp.float32)
        py = ((tg // grid_x) * tile_y + colp // tile_x).astype(jnp.float32)
        # NEGATIVE RESULT (round 4): factoring power as a (chunk,6)@(6,P)
        # MXU matmul over the quadratic pixel basis (tile-local coords
        # for f32 exactness) measured 53.9 vs 49.6 ms/frame — K=6
        # matmuls waste the 128x128 systolic array and HIGHEST precision
        # triples the passes; the elementwise VPU form wins.

        def body(state, j=j, s=s, e=e, nch=nch):
            if with_contrib:
                c, T_run, acc, dead, cnt = state
            else:
                c, T_run, acc, dead = state  # (1,P), (c_out,P), (1,P)
                cnt = None
            slot = jax.lax.rem(c, 2)

            dma(j, slot, c, s).wait()

            def live_fn(state):
                T_run, acc, dead = state
                b = buf[j, slot]  # (chunk, ncols)
                x = b[:, 0:1]
                y = b[:, 1:2]
                # conics pre-scaled on the (chunk, 1) columns (1/P the
                # elements — free) so the per-pixel power is a 7-op
                # Horner form in the exp2 domain: alpha = op·exp(power)
                # = op·exp2(p2) with p2 = log2e·power
                log2e = 1.4426950408889634
                cxs = b[:, 2:3] * (-0.5 * log2e)
                cys = b[:, 3:4] * (-log2e)
                czs = b[:, 4:5] * (-0.5 * log2e)
                op = b[:, 5:6]

                in_r = (s + c * chunk + row) < e  # rows past e: other tiles
                dx = x - px  # (chunk, P)
                dy = y - py
                p2 = (cxs * dx + cys * dy) * dx + (czs * dy) * dy
                alpha = jnp.minimum(0.99, op * jnp.exp2(p2))
                # p2 > 0 ⇔ power > 0 (positive scale; q(d) is bounded
                # away from 0 except at d = 0 where both are exactly 0)
                a = jnp.where(
                    (p2 > 0.0) | (alpha < (1.0 / 255.0)) | (~in_r),
                    0.0, alpha,
                )
                om = 1.0 - a  # >= 0.01 wherever a > 0, == 1 where a == 0
                if scan_mode == "mxu":
                    # log-space MXU cumsum: incl[i] = sum_{j<=i} log2(om_j)
                    # via the 0/1 triangular matmul, exact-split bf16x3
                    # (l = l_hi + l_mid + l_lo exactly; 1.0 * part exact).
                    # a == 0 rows give l == 0 — inert, like om == 1 in
                    # the scan path. om >= 0.01 keeps l >= -6.65 (finite).
                    l = jnp.log2(om)
                    l_hi = l.astype(jnp.bfloat16)
                    r1 = l - l_hi.astype(jnp.float32)
                    l_mid = r1.astype(jnp.bfloat16)
                    l_lo = (r1 - l_mid.astype(jnp.float32)).astype(
                        jnp.bfloat16)

                    def _tdot(x):
                        return jax.lax.dot_general(
                            tri, x, (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32,
                        )

                    incl = _tdot(l_hi) + _tdot(l_mid) + _tdot(l_lo)
                    # crossing/threshold/exclusive-product all in log2:
                    # T_incl < 1e-4/T_run  <=>  incl < log2(1e-4) - tlog
                    thr_log = -13.287712379549449 - jnp.log2(T_run)
                    crossed = incl < thr_log
                    applied = (dead == 0.0) & ~crossed
                    # T_excl = 2^(incl - l); first/inert rows hit
                    # exp2(0) == 1 exactly
                    w = a * jnp.exp2(incl - l) * applied
                else:
                    cum = cumprod_sublanes(om)
                    # exclusive product = inclusive shifted down one row
                    # (top row = 1) — replaces the former per-element
                    # divide T_excl = T_incl/om (a divide costs ~10 VPU
                    # ops; the shift is one roll + one select on a
                    # constant mask)
                    cum_excl = jnp.where(
                        sub >= 1, pltpu.roll(cum, 1, 0), 1.0)
                    # T_run factors out of T_incl/T_excl: test the
                    # crossing against thr = 1e-4/T_run (one (1,P)
                    # divide) and scale the feature matmul output by
                    # T_run instead of w — neither T_incl nor T_excl is
                    # ever materialized. cum is monotone nonincreasing
                    # down the chunk, so crossed rows form a suffix:
                    # crossed[i-1] implies crossed[i], making the
                    # reference's separate crossed-before test redundant
                    # — the crossing row and everything after it are
                    # excluded by ~crossed alone (the crossing Gaussian
                    # is NOT composited, forward.cu:349-354)
                    thr = 1e-4 / T_run  # T_run > 0 (>= ~1e-4 alive)
                    crossed = cum < thr
                    applied = (dead == 0.0) & ~crossed
                    w = a * cum_excl * applied  # (chunk, P)
                feat = b[:, 8 : 8 + c_out]  # (chunk, c_out); pad cols zero

                def _dot(f, ww, prec):
                    return jax.lax.dot_general(
                        f, ww, (((0,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32,
                        precision=prec,
                    )  # (c_out, P)

                if feat_precision == "high":
                    # bf16x3 by hand: hi/lo splits are EXACT bf16 values,
                    # the dropped f_lo·w_lo term is ~2^-18 relative, so
                    # the contraction lands ~1e-6 of f32 while running 3
                    # default-precision MXU passes instead of 6
                    f_hi = feat.astype(jnp.bfloat16)
                    f_lo = (feat - f_hi.astype(jnp.float32)).astype(
                        jnp.bfloat16)
                    w_hi = w.astype(jnp.bfloat16)
                    w_lo = (w - w_hi.astype(jnp.float32)).astype(
                        jnp.bfloat16)
                    prec = jax.lax.Precision.DEFAULT
                    contrib = (_dot(f_hi, w_hi, prec)
                               + (_dot(f_hi, w_lo, prec)
                                  + _dot(f_lo, w_hi, prec)))
                else:
                    prec = (jax.lax.Precision.HIGHEST
                            if feat_precision == "highest"
                            else jax.lax.Precision.DEFAULT)
                    contrib = _dot(feat, w, prec)
                acc = acc + T_run * contrib
                # crossing detection: cum/incl monotone ⇒ crossed
                # anywhere in the chunk ⇔ crossed at the LAST row (one
                # (1,P) compare instead of a (chunk,P) max-reduce).
                # T after this chunk = T_incl at the LAST applied row;
                # monotone over applied rows, so a min-reduce gets it
                # (reduce_prod has no Mosaic lowering); empty applied
                # set -> identity fill -> T_run unchanged
                if scan_mode == "mxu":
                    dead = jnp.maximum(
                        dead,
                        (incl[chunk - 1 : chunk, :] < thr_log).astype(
                            jnp.float32),
                    )
                    T_run = T_run * jnp.exp2(jnp.min(
                        jnp.where(applied, incl, 0.0), axis=0,
                        keepdims=True,
                    ))
                else:
                    dead = jnp.maximum(
                        dead,
                        (cum[chunk - 1 : chunk, :] < thr).astype(
                            jnp.float32),
                    )
                    T_run = T_run * jnp.min(
                        jnp.where(applied, cum, 1.0), axis=0,
                        keepdims=True,
                    )
                if with_contrib:
                    # per-pixel count of pre-termination positions (the
                    # reference's last_contributor, backward.cu:431-441);
                    # `applied` is a monotone prefix mask per pixel
                    return (T_run, acc, dead,
                            cnt + jnp.sum(
                                applied.astype(jnp.float32), axis=0,
                                keepdims=True))
                return (T_run, acc, dead)

            new = live_fn((T_run, acc, dead))

            # issue chunk c+2 into the slot just consumed (program order
            # puts the start after every read of buf[j, slot] above, so
            # the DMA cannot race the VPU reads); its latency hides
            # behind chunk c+1's compute
            @pl.when(c + 2 < nch)
            def _():
                dma(j, slot, c + 2, s).start()

            return (c + 1,) + new

        def cond(state, nch=nch):
            c, dead = state[0], state[3]
            # stop as soon as every pixel crossed: saves both the compute
            # AND the remaining chunk DMAs (opaque scenes terminate after
            # a few hundred entries of multi-thousand-entry tiles). The
            # chunks already in flight at exit are torn down below.
            if not _EARLY_EXIT:
                return c < nch
            return (c < nch) & (jnp.sum(1.0 - dead) > 0)

        T0 = jnp.ones((1, p), jnp.float32)
        acc0 = jnp.zeros((c_out, p), jnp.float32)
        dead0 = jnp.zeros((1, p), jnp.float32)
        init = (jnp.int32(0), T0, acc0, dead0)
        if with_contrib:
            init = init + (jnp.zeros((1, p), jnp.float32),)
        # two-phase walk: the early-exit cond's vector reduce feeds a
        # SCALAR branch — a vector->scalar sync per chunk that measured
        # 2.6 ms/frame at the bench shape, paid even by the 1-2-chunk
        # tiles where the exit can never fire. Phase 1 walks the first
        # min(nch, 4) chunks under a scalar-only condition (covers
        # nearly every tile); phase 2 (rare, big tiles) keeps the
        # termination check that saves multi-thousand-entry tiles.
        k0 = jnp.minimum(nch, 4)
        fin = jax.lax.while_loop(lambda st: st[0] < k0, body, init)
        fin = jax.lax.while_loop(cond, body, fin)
        c_end, T_run, acc = fin[0], fin[1], fin[2]
        if with_contrib:
            cnt_fin = fin[4]
        # drain in-flight DMAs on early exit: iterations consumed chunks
        # < c_end and the issue-ahead keeps chunks c_end and c_end+1 (if
        # they exist) in flight — wait both before their slots are reused
        # by the next tile/step
        @pl.when(c_end < nch)
        def _():
            dma(j, jax.lax.rem(c_end, 2), c_end, s).wait()

        @pl.when(c_end + 1 < nch)
        def _():
            dma(j, jax.lax.rem(c_end + 1, 2), c_end + 1, s).wait()
        if downscale == 1:
            out_ref[j] = acc
            out_ref[j, c_out - 1 : c_out, :] = T_run
            if with_contrib:
                out_ref[j, c_out - 2 : c_out - 1, :] = cnt_fin
        else:
            # fused 2x2-mean downscale: one (P, P/4) 0.25-selection matmul
            # — compositing is linear, so downsampling acc and T
            # separately is exact (final = acc_down + T_down * bg)
            d = downscale
            ox = tile_x // d
            pq = jax.lax.broadcasted_iota(jnp.int32, (p, 1), 0)
            qy = (pq // tile_x) // d
            qx = (pq % tile_x) // d
            q_of_p = qy * ox + qx  # (p, 1)
            qcol = jax.lax.broadcasted_iota(
                jnp.int32, (p, p // (d * d)), 1)
            D = jnp.where(q_of_p == qcol, 1.0 / (d * d), 0.0)
            out_ref[j] = jax.lax.dot_general(
                acc, D, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST,
            )
            out_ref[j, c_out - 1 : c_out, :] = jax.lax.dot_general(
                T_run, D, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST,
            )


# --------------------------------------------------------------------------
# host-side wrapper
# --------------------------------------------------------------------------


@functools.partial(
    jax.jit,
    static_argnames=("num_tiles", "grid_x", "config", "channels", "interpret",
                     "stage", "tile_count"),
)
def blend_stream(
    prep: R.Preprocessed,
    bg: jnp.ndarray,  # (C,)
    num_tiles: int,
    grid_x: int,
    config: R.RasterizeConfig,
    channels: int,
    interpret: bool = False,
    stage: str = "full",
    tile_base=None,
    tile_count: int = None,
):
    """Bin + blend with the streaming kernel.

    Returns (out (num_tiles, P, C), final_T (num_tiles, P), overflow,
    win_drop) — overflow = entries never emitted, win_drop = entries
    zeroed by the blocked gather window (0 in the default global mode).
    ``stage``: profiling-only prefix cut (see bin_sorted_stream; extra
    values here: "bin" = binning complete, "kernel" = skip the
    order->tile unpermute/composite epilogue).

    ``tile_base``/``tile_count``: bin + blend only tiles
    [tile_base, tile_base+tile_count) — the per-shard slice of the
    tile-sharded multi-chip path. Outputs are (count, P, C)/(count, P)
    LOCAL tile blocks; pixel coordinates stay global (the kernel adds
    the base). ``tile_base`` may be traced (shard_map axis index);
    ``tile_count`` is static.
    """
    p = config.tile_x * config.tile_y
    ds = config.downscale
    p_out = p // (ds * ds)
    ch = config.chunk_size
    c_out = _round_up(channels + 1, 8)  # acc channels + final-T row

    if stage not in ("full", "bin", "kernel"):
        a, b, c, _ = bin_sorted_stream(
            prep, num_tiles, grid_x, config, stage=stage)
        z = jnp.zeros((num_tiles, p_out, channels), jnp.float32)
        probe = (a.reshape(-1)[0].astype(jnp.float32)
                 + b.reshape(-1)[0].astype(jnp.float32))
        return z.at[0, 0, 0].add(probe), z[:, :, 0], c, jnp.int32(0)
    tile_window = (None if tile_count is None
                   else (tile_base, tile_count))
    nt_local = num_tiles if tile_count is None else tile_count
    stream, starts, overflow, win_drop = bin_sorted_stream(
        prep, num_tiles, grid_x, config, tile_window=tile_window
    )
    if stage == "bin":
        z = jnp.zeros((num_tiles, p_out, channels), jnp.float32)
        # barrier: the stream gather must materialize fully (a 1-element
        # probe would shrink the gather itself under DCE)
        sb, stb = jax.lax.optimization_barrier((stream, starts))
        probe = sb.reshape(-1)[0] + stb[0].astype(jnp.float32)
        return z.at[0, 0, 0].add(probe), z[:, :, 0], overflow, win_drop
    ncols = stream.shape[1]

    counts = starts[1:] - starts[:-1]
    order = jnp.argsort(-counts).astype(jnp.int32)
    n_grid = min(config.max_active_tiles or nt_local, nt_local)
    if n_grid < num_tiles:
        # tiles beyond the grid budget never render: count as overflow
        overflow = overflow + jnp.sum(counts[order[n_grid:]])
    tps = max(1, config.tiles_per_step)
    n_pad = _round_up(n_grid, tps)
    # padded order slots point at tile id num_tiles, whose (empty) range
    # comes from the extra starts row appended below
    order_g = jnp.concatenate(
        [order[:n_grid],
         jnp.full((n_pad - n_grid,), nt_local, jnp.int32)]
    )
    starts_k = jnp.concatenate([starts, starts[-1:]])
    base_arr = (jnp.zeros((1,), jnp.int32) if tile_count is None
                else jnp.asarray(tile_base, jnp.int32).reshape(1))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(n_pad // tps,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=pl.BlockSpec(
            (tps, c_out, p_out), lambda i, *_: (i, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=[
            pltpu.VMEM((tps, 2, ch, ncols), jnp.float32),
            pltpu.SemaphoreType.DMA((tps, 2)),
        ],
    )
    kernel = functools.partial(
        _stream_kernel,
        grid_x=grid_x,
        tile_x=config.tile_x,
        tile_y=config.tile_y,
        chunk=ch,
        ncols=ncols,
        c_out=c_out,
        channels=channels,
        downscale=ds,
        tps=tps,
        scan_mode=None if config.scan == "env" else config.scan,
        feat_precision=(None if config.feat_precision == "env"
                        else config.feat_precision),
    )
    out_o = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_pad, c_out, p_out), jnp.float32),
        interpret=interpret,
    )(order_g, starts_k, base_arr, stream)
    out_o = out_o[:n_grid]
    if stage == "kernel":
        return (out_o[:, :channels, :].transpose(0, 2, 1),
                out_o[:, c_out - 1, :], overflow, win_drop)

    # order space -> tile space via the INVERSE permutation: a gather of
    # num_tiles blocks instead of a scatter (XLA scatters at this size
    # cost ~10 ms; the 16K-element index scatter building `inv` is
    # negligible). Uncovered tiles read the sentinel block (acc=0, T=1).
    if _UNPERM == "gather":
        sentinel = jnp.zeros((1, c_out, p_out), jnp.float32)
        sentinel = sentinel.at[:, c_out - 1, :].set(1.0)
        inv = jnp.full((nt_local,), n_grid, jnp.int32).at[order_g].set(
            jnp.arange(n_grid, dtype=jnp.int32), mode="drop"
        )
        out_t = jnp.concatenate([out_o, sentinel], axis=0)[inv]
    elif n_grid < nt_local:
        base = jnp.zeros((nt_local, c_out, p_out), jnp.float32)
        base = base.at[:, c_out - 1, :].set(1.0)
        out_t = base.at[order_g].set(out_o)
    else:
        out_t = jnp.zeros(
            (nt_local, c_out, p_out), jnp.float32
        ).at[order_g].set(out_o)
    t_run = out_t[:, c_out - 1, :]  # (num_tiles, P)
    acc = out_t[:, :channels, :].transpose(0, 2, 1)  # (num_tiles, P, C)
    out = acc + t_run[..., None] * bg[None, None, :]
    return out, t_run, overflow, win_drop


def rasterize_gaussians_stream(
    means3d,
    opacities,
    settings: R.GaussianRasterizationSettings,
    scales=None,
    rotations=None,
    cov3d_precomp=None,
    shs=None,
    colors_precomp=None,
    valid_mask=None,
    config: R.RasterizeConfig = R.RasterizeConfig(),
    interpret: bool = False,
    return_extra: bool = False,
):
    """Drop-in fast-path variant of ops.rasterize.rasterize_gaussians
    (forward only — use the XLA path for training gradients)."""
    H, W = settings.image_height, settings.image_width
    grid_x = -(-W // config.tile_x)
    grid_y = -(-H // config.tile_y)
    num_tiles = grid_x * grid_y

    prep = R.preprocess(
        means3d, opacities, settings, config,
        scales=scales, rotations=rotations, cov3d_precomp=cov3d_precomp,
        shs=shs, colors_precomp=colors_precomp, valid_mask=valid_mask,
    )
    channels = prep.features.shape[-1]
    out, t_run, overflow, win_drop = blend_stream(
        prep, settings.bg, num_tiles, grid_x, config, channels,
        interpret=interpret,
    )
    from .rasterize_pallas import assemble_tiles

    ds = config.downscale
    if ds > 1:
        # tiles shrank to (tile/ds)^2 in the kernel: assemble at H/ds, W/ds
        if H % ds or W % ds or config.tile_x % ds or config.tile_y % ds:
            raise ValueError("downscale requires even H/W/tile dims")
        acfg = config._replace(
            tile_x=config.tile_x // ds, tile_y=config.tile_y // ds
        )
        color, t_img = assemble_tiles(out, t_run, H // ds, W // ds, acfg)
    else:
        color, t_img = assemble_tiles(out, t_run, H, W, config)
    radii = prep.radius.astype(jnp.int32)
    if return_extra:
        return color, radii, {"final_T": t_img, "dup_overflow": overflow,
                              "win_drop": win_drop}
    return color, radii
