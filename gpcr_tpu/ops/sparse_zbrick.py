"""Z-brick sparse convolution: dense (1,1,Z) z-runs over the voxel engine.

The direct 27-offset gather conv (ops/sparse.py) is INDEX-rate bound:
~460M gather-rows/s at the 800K-point L0 shape -> ~46 ms per conv
(scripts/profile_learned.py), and the per-row cost is fixed, so narrow
C=32 rows waste most of each access. This module replaces the voxel
gather with a layout XLA can move in BULK:

- Voxels are grouped into (1, 1, Z) bricks at fixed z boundaries
  (zb = z // Z). Surface clouds fill such bricks ~30-46% (Z=4, measured
  on the bench cloud at L0/L1) — dense enough that the waste FLOPs are
  cheap on the MXU, sparse enough that brick count is ~3-4x below the
  voxel count.
- Features live as (B, Z, C) with zeros in empty slots. Missing
  neighbors contribute w @ 0 = 0, so dense-with-zeros is EXACT for the
  linear conv; outputs are re-masked to occupied slots afterwards
  (MinkowskiEngine computes outputs only at occupied voxels —
  models/model_v2.py:21-65 semantics are preserved bit-for-bit in f32).
- A 3³ conv needs, per output brick, the z rows [-1 .. Z] of the 9
  (dx, dy) neighbor columns. Those are served from a Z-DILATED ext
  table: the brick set dilated by +-1 in zb (ghost bricks carry only
  the boundary rows of their z-neighbors — without them a (dx, dy)
  fetch would silently miss boundary voxels whenever the neighbor
  column's own zb brick is empty; ~2.45x more table rows on the bench
  cloud, same 9 gathers). In sorted brick order the z-adjacent entry is
  the IMMEDIATE neighbor row whenever it exists, so the ext assembly is
  pure static shifts + masks — no extra gathers.
- Per conv: ONE near-monotone wide gather lifts real-brick features
  into dilated space (fused with ext assembly), then 9 wide (Z+2)·C-row
  gathers fetch neighbor columns: ~10 B_real + D gather rows per conv
  instead of 27 N (~3x fewer, each 4-6x wider).
- The z taps are STATIC strided slices of the gathered (blk, Z+2, C)
  buffer feeding MXU matmuls — no per-voxel dz indices at all.

Weight layout is identical to ops/sparse.conv: (27, Cin, Cout) in the ME
HYPER_CUBE order (x fastest; sparse._offsets_cube), so checkpoints and
the torch converter are untouched.
"""

from __future__ import annotations

import typing as T

import flax.struct
import jax
import jax.numpy as jnp

from . import sparse
from .sparse import GRID_BITS, GRID_MAX, SENTINEL

Z_DEFAULT = 4

# Blocked-window gather tuning for BRICK tables. Neighbor deltas in
# dilated-brick index space are ~2x(bricks per x-slab) (~6K at the 800K
# L0 shape) — far below the voxel engine's 16384-row window; and brick
# rows are 4-6x WIDER than voxel rows, so the window slice must be sized
# in BYTES: past ~60-70 MB (the gather-rate cliff, scripts/
# microbench_cliff.py) gather throughput collapses 3-6x. ``block="auto"``
# picks the largest block whose window slice stays inside the fast
# region.
BRICK_WINDOW = 8192
_WIN_BYTES_TARGET = 48 << 20
_WIN_ROWS_MAX = 131_072


def _auto_block(row_bytes: int, window: int, num: int, den: int) -> int:
    """Largest output-block size whose window slice (block*num/den +
    2*window rows of ``row_bytes``) stays under the gather cliff."""
    win_rows = min(_WIN_BYTES_TARGET // max(row_bytes, 1), _WIN_ROWS_MAX)
    blk = max(win_rows - 2 * window, 4096) * den // num
    return max(4096, (blk // 4096) * 4096)


@flax.struct.dataclass
class BrickPlan:
    """Geometry-only brick structure for ONE SparseGrid level.

    Built once per coordinate set (plan time) and shared by every conv at
    the level. Real bricks (outputs) index [0, Bcap); the z-dilated ext
    space indexes [0, Dcap); each table's capacity row is the miss/zero
    row.
    """

    bcodes: jnp.ndarray  # (Bcap,) i32 real brick codes (vox code & ~(Z-1))
    nb: jnp.ndarray  # () i32 valid real brick count
    brick_src: jnp.ndarray  # (Bcap, Z) i32 voxel row per slot; Nmax = empty
    vox_slot: jnp.ndarray  # (Nmax,) i32 flat real slot (bi*Z + r) per voxel
    occ: jnp.ndarray  # (Bcap, Z) f32 occupancy mask
    dcodes: jnp.ndarray  # (Dcap,) i32 dilated brick codes, sorted
    nd: jnp.ndarray  # () i32 valid dilated count
    d2r: jnp.ndarray  # (Dcap,) i32 real index of dilated brick; Bcap = ghost
    r2d: jnp.ndarray  # (Bcap,) i32 dilated index of real brick (always hits)
    zdn_ok: jnp.ndarray  # (Dcap,) f32 1.0 iff dcodes[j-1] == dcodes[j] - Z
    zup_ok: jnp.ndarray  # (Dcap,) f32 1.0 iff dcodes[j+1] == dcodes[j] + Z
    bkmap9: jnp.ndarray  # (Bcap, 9) i32 (dx,dy) neighbor in DILATED space
    z: int = flax.struct.field(pytree_node=False, default=Z_DEFAULT)

    @property
    def capacity(self) -> int:
        return self.bcodes.shape[0]

    @property
    def dcapacity(self) -> int:
        return self.dcodes.shape[0]


def plan_brick_capacities(coords_np, z: int = Z_DEFAULT, levels: int = 2,
                          margin: float = 1.05, bucket: int = 65536):
    """Host-side (real, dilated) brick-count planning per level.

    sort+diff dedup throughout (np.unique re-sorts internally; the
    chained-unique version cost ~9 s at 800K points, this one ~0.4 s).
    """
    import numpy as np

    def dedup_sorted(a):
        if not len(a):
            return a
        keep = np.empty(len(a), bool)
        keep[0] = True
        np.not_equal(a[1:], a[:-1], out=keep[1:])
        return a[keep]

    def missing(sorted_ref, q):
        """Count of q entries NOT present in sorted_ref (q sorted)."""
        pos = np.searchsorted(sorted_ref, q)
        pos_c = np.minimum(pos, len(sorted_ref) - 1)
        return int(np.sum(sorted_ref[pos_c] != q))

    c = np.asarray(coords_np)
    c = np.clip(np.rint(c), 0, GRID_MAX - 1).astype(np.int64)
    codes = dedup_sorted(np.sort(
        (c[:, 0] << (2 * GRID_BITS)) | (c[:, 1] << GRID_BITS) | c[:, 2]
    ))
    fmask = ((GRID_MAX // 2 - 1) << (2 * GRID_BITS)) | (
        (GRID_MAX // 2 - 1) << GRID_BITS
    ) | (GRID_MAX // 2 - 1)

    def cap(n):
        return int(-(-int(n * margin) // bucket)) * bucket

    caps = []
    for lvl in range(levels):
        bk = dedup_sorted(codes & ~np.int64(z - 1))  # sorted order kept
        # |bk u (bk-z) u (bk+z)| without sorting the 3x union (this
        # host's numpy sorts are the bottleneck): bk+-z are sorted too,
        # and (bk-z) n (bk+z) ghosts double-count only codes missing
        # from bk with BOTH z-neighbors present
        lo, hi = bk - z, bk + z
        n_lo = missing(bk, lo)
        n_hi = missing(bk, hi)
        # upper bound (a code missing from bk whose BOTH z-neighbors are
        # bricks is counted twice) — capacity over-sizing is safe and the
        # bucket rounding absorbs it
        nd = len(bk) + n_lo + n_hi
        caps.append((cap(len(bk)), cap(nd)))
        codes = dedup_sorted(np.sort((codes >> 1) & fmask))
    return tuple(caps)


def build_brick_plan(grid: sparse.SparseGrid, capacity: int,
                     dilated_capacity: T.Optional[int] = None,
                     z: int = Z_DEFAULT) -> BrickPlan:
    """Brick structure for one level's sorted voxel codes.

    Costs one pass of vector ops + two sorts over ~3 rows per brick +
    one lookup_merge over ~10 queries per BRICK (vs 27 per voxel for the
    direct kernel map), so plan time shrinks alongside conv time.
    """
    assert z & (z - 1) == 0, "Z must be a power of two"
    codes = grid.codes  # (Nmax,) sorted, SENTINEL padding
    nmax = codes.shape[0]
    bcap = capacity
    dcap = dilated_capacity or 3 * capacity

    bkey = jnp.where(codes == SENTINEL, SENTINEL, codes & ~(z - 1))
    isnew = jnp.concatenate(
        [jnp.ones((1,), jnp.int32),
         (bkey[1:] != bkey[:-1]).astype(jnp.int32)]
    )
    isnew = jnp.where(bkey == SENTINEL, 0, isnew)
    bi = jnp.cumsum(isnew) - 1  # brick id per voxel
    nb = jnp.maximum(jnp.max(jnp.where(bkey == SENTINEL, -1, bi)) + 1, 0)
    bi_c = jnp.clip(bi, 0, bcap - 1)
    r = codes & (z - 1)
    valid_vox = (codes != SENTINEL) & (bi < bcap)

    # real brick codes: every voxel writes its brick key to slot bi
    write_b = jnp.where(valid_vox, bi_c, bcap)
    bcodes = jnp.full((bcap + 1,), SENTINEL, jnp.int32)
    bcodes = bcodes.at[write_b].set(bkey)[:bcap]

    # slot -> voxel row (element scatter; empty slots stay at nmax)
    flat = jnp.where(valid_vox, bi_c * z + r, bcap * z)
    brick_src = jnp.full((bcap * z + 1,), nmax, jnp.int32)
    brick_src = brick_src.at[flat].set(
        jnp.arange(nmax, dtype=jnp.int32)
    )[: bcap * z].reshape(bcap, z)
    vox_slot = jnp.where(valid_vox, bi_c * z + r, bcap * z)
    occ = (brick_src < nmax).astype(jnp.float32)

    # ---- z-dilated brick set: real u (real +- Z) ------------------------
    bvalid = bcodes != SENTINEL
    zbs = bcodes & (GRID_MAX - 1)
    cand = jnp.concatenate([
        bcodes,
        jnp.where(bvalid & (zbs >= z), bcodes - z, SENTINEL),
        jnp.where(bvalid & (zbs + z < GRID_MAX), bcodes + z, SENTINEL),
    ])
    scand = jnp.sort(cand)
    dnew = jnp.concatenate(
        [jnp.ones((1,), jnp.int32),
         (scand[1:] != scand[:-1]).astype(jnp.int32)]
    )
    dnew = jnp.where(scand == SENTINEL, 0, dnew)
    di = jnp.cumsum(dnew) - 1
    nd = jnp.maximum(jnp.max(jnp.where(scand == SENTINEL, -1, di)) + 1, 0)
    dvalid = (scand != SENTINEL) & (di < dcap)
    dwrite = jnp.where(dvalid, jnp.clip(di, 0, dcap - 1), dcap)
    dcodes = jnp.full((dcap + 1,), SENTINEL, jnp.int32)
    dcodes = dcodes.at[dwrite].set(scand)[:dcap]

    # z-adjacency masks: in sorted order the z-neighbor, when present,
    # is the IMMEDIATE neighbor entry (no code fits between (x,y,zb)
    # and (x,y,zb +- 1))
    zdn_ok = jnp.concatenate(
        [jnp.zeros((1,)), (dcodes[:-1] == dcodes[1:] - z).astype(
            jnp.float32)]
    ) * (dcodes != SENTINEL)
    zup_ok = jnp.concatenate(
        [(dcodes[1:] == dcodes[:-1] + z).astype(jnp.float32),
         jnp.zeros((1,))]
    ) * (dcodes != SENTINEL)

    # ---- lookups --------------------------------------------------------
    # one merge serves r2d + the 9 (dx,dy) columns (queries into dcodes);
    # a second small merge serves d2r (queries into bcodes)
    xs = bcodes >> (2 * GRID_BITS)
    ys = (bcodes >> GRID_BITS) & (GRID_MAX - 1)
    qs = [jnp.where(bvalid, bcodes, SENTINEL)]  # r2d (center column)
    for dy in (-1, 0, 1):
        for dx in (-1, 0, 1):
            if dx == 0 and dy == 0:
                continue
            nx, ny = xs + dx, ys + dy
            ok = bvalid & (nx >= 0) & (nx < GRID_MAX) & (ny >= 0) & (
                ny < GRID_MAX)
            qs.append(jnp.where(
                ok, bcodes + (dx << (2 * GRID_BITS)) + (dy << GRID_BITS),
                SENTINEL))
    q = jnp.stack(qs, axis=1)  # (Bcap, 9)
    idx, _ = sparse.lookup_merge(dcodes, nd, q.reshape(-1), max_run=16)
    idx = idx.reshape(bcap, 9)
    r2d = idx[:, 0]
    # bkmap9 in the ME (dx fastest, dy next) 9-column order incl. center
    bk_cols = [None] * 9
    k = 1
    for j, (dy, dx) in enumerate(
            [(dy, dx) for dy in (-1, 0, 1) for dx in (-1, 0, 1)]):
        if dx == 0 and dy == 0:
            bk_cols[j] = r2d
        else:
            bk_cols[j] = idx[:, k]
            k += 1
    bkmap9 = jnp.stack(bk_cols, axis=1)

    d2r, _ = sparse.lookup_merge(bcodes, nb, dcodes, max_run=4)

    return BrickPlan(
        bcodes=bcodes, nb=nb.astype(jnp.int32), brick_src=brick_src,
        vox_slot=vox_slot, occ=occ, dcodes=dcodes, nd=nd.astype(jnp.int32),
        d2r=d2r, r2d=r2d, zdn_ok=zdn_ok, zup_ok=zup_ok, bkmap9=bkmap9, z=z,
    )


def brick_max_delta(plan: BrickPlan) -> jnp.ndarray:
    """Largest |dilated neighbor index - own dilated index| over the
    9-column map — the blocked-window gather must cover this (same
    contract as sparse.kmap_max_delta)."""
    dcap = plan.dcapacity
    own = plan.r2d[:, None]
    hit = (plan.bkmap9 < dcap) & (own < dcap)
    return jnp.max(jnp.where(hit, jnp.abs(plan.bkmap9 - own), 0))


def to_bricks(feats_vox: jnp.ndarray, plan: BrickPlan) -> jnp.ndarray:
    """(Nmax, C) voxel features -> (Bcap, Z, C) real-brick layout.
    (_wide_gather: sub-64-lane row gathers are 6x slower.)"""
    c = feats_vox.shape[1]
    fpad = jnp.concatenate(
        [feats_vox, jnp.zeros((1, c), feats_vox.dtype)], axis=0)
    z = plan.z
    return _wide_gather(
        fpad, plan.brick_src.reshape(-1)).reshape(plan.capacity, z, c)


def to_voxels(feats_b: jnp.ndarray, plan: BrickPlan,
              nmax: int) -> jnp.ndarray:
    """(Bcap, Z, C) brick features -> (Nmax, C) voxel layout."""
    bcap, z, c = feats_b.shape
    flat = jnp.concatenate(
        [feats_b.reshape(bcap * z, c), jnp.zeros((1, c), feats_b.dtype)],
        axis=0)
    return _wide_gather(flat, jnp.clip(plan.vox_slot[:nmax], 0, bcap * z))


def _to_dilated(feats_b: jnp.ndarray, plan: BrickPlan,
                block, window: int) -> jnp.ndarray:
    """Lift (Bcap, Z, C) real features to (Dcap, Z*C) dilated rows
    (ghost bricks zero). d2r is monotone, so the blocked-window gather's
    per-block window (anchored by block_lo = d2r at block starts)
    applies even though real/dilated densities differ."""
    bcap, z, c = feats_b.shape
    flat = jnp.concatenate(
        [feats_b.reshape(bcap, z * c),
         jnp.zeros((1, z * c), feats_b.dtype)], axis=0)
    dcap = plan.dcapacity
    if block == "auto":
        block = _auto_block(z * c * 4, window, bcap, dcap)
    if block is None or dcap <= block:
        return flat[plan.d2r]
    nbk = -(-dcap // block)
    # d2r at GHOST rows is the miss sentinel (bcap) — anchor each block
    # at the last REAL index at-or-before its start (monotone cummax)
    d2r_fill = jax.lax.cummax(
        jnp.where(plan.d2r < bcap, plan.d2r, -1), axis=0)
    block_lo = jnp.clip(
        d2r_fill[jnp.minimum(jnp.arange(nbk) * block, dcap - 1)], 0, bcap)
    # a dilated block of `block` rows maps to ~block*bcap/dcap real rows;
    # the stride ratio sizes the static window slice accordingly (the
    # `window` margin absorbs local density drift around the average)
    (out,) = sparse._gather_conv_blocked(
        flat, plan.d2r[:, None], [lambda g, i: g], [z * c],
        block, window, stride_num=bcap, stride_den=dcap,
        block_lo=block_lo, unroll=True,
    )
    return out


def _build_ext(feats_d: jnp.ndarray, plan: BrickPlan) -> jnp.ndarray:
    """(Dcap, Z*C) dilated rows -> (Dcap, (Z+2)*C) z-extended rows:
    [below_topmost | own Z rows | above_bottom]. Pure shifts + masks —
    the z-adjacent brick, when present, is the adjacent sorted entry."""
    dcap = feats_d.shape[0]
    zc = feats_d.shape[1]
    z = plan.z
    c = zc // z
    top = feats_d[:, (z - 1) * c:]  # (Dcap, C) topmost z row
    bot = feats_d[:, :c]  # bottom z row
    below = jnp.concatenate(
        [jnp.zeros((1, c), feats_d.dtype), top[:-1]], axis=0
    ) * plan.zdn_ok[:, None].astype(feats_d.dtype)
    above = jnp.concatenate(
        [bot[1:], jnp.zeros((1, c), feats_d.dtype)], axis=0
    ) * plan.zup_ok[:, None].astype(feats_d.dtype)
    return jnp.concatenate([below, feats_d, above], axis=1)


def _me_widx(dx: int, dy: int, dz: int) -> int:
    """Index of offset (dx,dy,dz) in the ME HYPER_CUBE (x-fastest) order
    used by sparse._offsets_cube / the checkpoint converter."""
    return (dz + 1) * 9 + (dy + 1) * 3 + (dx + 1)


def brick_conv_multi(
    feats_list: T.Sequence[jnp.ndarray],  # (Bcap, Z, C_i) sharing the plan
    weights: T.Sequence[jnp.ndarray],  # (27, C_i, Cout_i)
    biases: T.Sequence[T.Optional[jnp.ndarray]],
    plan: BrickPlan,
    compute_dtype=None,
    block="auto",
    window: int = BRICK_WINDOW,
) -> T.List[jnp.ndarray]:
    """Several 3³ stride-1 convs over the same brick plan with ONE wide
    gather per (dx, dy) column (channel-packed, like sparse.conv_multi).

    ``block``: "auto" sizes the blocked-window gather from the ext row
    width (see _auto_block); an int forces that block; None forces the
    global gather (exact for any coordinate distribution). Callers using
    windowed gathers must validate brick_max_delta(plan) <= window.

    Returns [(Bcap, Z, Cout_i)] float32, masked to occupied slots.
    """
    z = plan.z
    bcap = plan.capacity
    dcap = plan.dcapacity
    packed = jnp.concatenate(list(feats_list), axis=-1)
    if compute_dtype is not None:
        packed = packed.astype(compute_dtype)
    ws = [w if compute_dtype is None else w.astype(compute_dtype)
          for w in weights]
    splits = [f.shape[2] for f in feats_list]
    ctot = packed.shape[2]

    elem = 2 if compute_dtype in (jnp.bfloat16, "bfloat16") else 4
    if block == "auto":
        block = _auto_block((z + 2) * ctot * elem, window, dcap, bcap)
    feats_d = _to_dilated(packed, plan, "auto" if block else None, window)
    ext = _build_ext(feats_d, plan)  # (Dcap, (Z+2)*ctot)
    ext_pad = jnp.concatenate(
        [ext, jnp.zeros((1, ext.shape[1]), ext.dtype)], axis=0)
    # ext MUST be materialized before the 9 column gathers: without the
    # barrier XLA fuses its producer chain (a gather + shifts) into each
    # consumer gather, re-evaluating to_dilated PER COLUMN — measured 6x
    # slower (356 vs ~60 ms/conv at L0; the probe with a materialized
    # ext argument runs the same gathers+matmuls in 12.6 ms)
    ext_pad = jax.lax.optimization_barrier(ext_pad)

    offs9 = [(dx, dy) for dy in (-1, 0, 1) for dx in (-1, 0, 1)]
    couts = [w.shape[2] for w in ws]
    cout_tot = sum(couts)

    # Fold the 3 z-taps into ONE block-banded weight per (dx, dy): for
    # output z-row r, tap dz reads ext row r+dz+1 through w[(dx,dy,dz)]
    # — a ((Z+2)*ctot, Z*cout_tot) banded matrix per offset (convs
    # concatenated along the output columns). Each offset is then a
    # single dense MXU matmul on the gathered ext rows. The obvious
    # 27-strided-slice formulation measured ~104 ms at the L0 shape —
    # XLA materializes every (B, Z, C) slice — while the dense band
    # wastes ~2x FLOPs and runs the MXU at K=(Z+2)*ctot. Bands are
    # built at trace time from the (27, Cin, Cout) ME-layout weights,
    # so checkpoints are untouched.
    # concat-only construction (no tiny scatters — dozens of small
    # .at[].set updates measured milliseconds per conv): row-block zr of
    # the band holds, for output row r, w[dz=zr-r-1] at the conv's
    # channel rows, zeros elsewhere
    def band(o):
        dx, dy = offs9[o]
        col_pre = [0]
        for co in couts:
            col_pre.append(col_pre[-1] + z * co)
        zr_rows = []
        for zr in range(z + 2):
            conv_rows = []
            for w, ci, co in zip(ws, splits, couts):
                tiles = []
                for r in range(z):
                    dz = zr - r - 1
                    if -1 <= dz <= 1:
                        tiles.append(w[_me_widx(dx, dy, dz)])
                    else:
                        tiles.append(jnp.zeros((ci, co), w.dtype))
                conv_rows.append(jnp.concatenate(tiles, axis=1))
            # rows: channels stacked per conv; columns: per-conv groups
            row_blocks = []
            for j, cr in enumerate(conv_rows):
                lead = col_pre[j]
                trail = col_pre[-1] - col_pre[j + 1]
                row_blocks.append(jnp.pad(cr, ((0, 0), (lead, trail))))
            zr_rows.append(jnp.concatenate(row_blocks, axis=0))
        return jnp.concatenate(zr_rows, axis=0)

    bands = jnp.stack([band(o) for o in range(9)])

    def combined(g, i):
        return jax.lax.dot_general(
            g, bands[i], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

    # GLOBAL gather+matmul per column: wide ((Z+2)ctot-lane) rows gather
    # from the full dilated table at ~420M rows/s and XLA overlaps the
    # fused banded matmul almost completely (scripts/ablate_brick.py
    # barrier probe: 9x(gather+matmul) 12.6 ms vs gather-alone 12.6 /
    # matmuls-alone 13.3). The blocked-window machinery measured 3x
    # SLOWER here — the round-2 gather cliff applies to NARROW (<=512B)
    # rows, not these.
    (out_flat,) = sparse._gather_conv_blocked(
        ext_pad, plan.bkmap9, [combined], [z * cout_tot],
        dcap + 1, window, unroll=True,
    )
    out_flat = out_flat.reshape(bcap, -1)
    result = []
    off = 0
    for j, (w, co) in enumerate(zip(ws, couts)):
        blockj = out_flat[:, off: off + z * co].reshape(bcap, z, co)
        if biases[j] is not None:
            blockj = blockj + biases[j]
        result.append(blockj * plan.occ[:, :, None])
        off += z * co
    return result


def brick_conv(
    feats_b: jnp.ndarray,  # (Bcap, Z, Cin)
    weight: jnp.ndarray,  # (27, Cin, Cout)
    bias: T.Optional[jnp.ndarray],
    plan: BrickPlan,
    compute_dtype=None,
    block="auto",
    window: int = BRICK_WINDOW,
) -> jnp.ndarray:
    """3³ stride-1 sparse conv in brick layout. Exact vs sparse.conv."""
    (out,) = brick_conv_multi(
        [feats_b], [weight], [bias], plan, compute_dtype, block, window)
    return out


def _wide_gather(table: jnp.ndarray, idx: jnp.ndarray,
                 min_lanes: int = 64) -> jnp.ndarray:
    """Row-gather with the table lane-padded to >= min_lanes.

    The measured gather width law (round 4, microbench_gather_modes.py):
    rows narrower than 64 f32 lanes gather at ~43 M rows/s vs ~250 M at
    64/128 lanes — a 6x cliff. Zero-padding the source lanes is ~free
    (one fused pad) and the output slices back to the real width.
    """
    cols = table.shape[-1]
    if cols >= min_lanes:
        return table[idx]
    wide = jnp.pad(table, ((0, 0), (0, min_lanes - cols)))
    return wide[idx][..., :cols]


def build_kernel_map_bricks(grid: sparse.SparseGrid,
                            plan: BrickPlan) -> jnp.ndarray:
    """EXACT replacement for sparse.build_kernel_map(grid, 3) built from
    a BrickPlan: instead of 27 merge-lookups per VOXEL (the plan-time
    hog — two ~22M-element sorts per level at 800K), reuse the brick
    plan's 9 per-BRICK column lookups and derive the 27 voxel indices
    from brick_src with shifts and static slices.

    For voxel (x,y,z) = slot (b, r) and offset (dx,dy,dz): the neighbor
    lives in the (dx,dy) column's z-extended slot row r+dz+1 — rows of
    ``ext_src`` (the brick_src analogue of _build_ext, where the
    z-adjacent brick is the adjacent dilated entry when present). Misses
    everywhere are grid.capacity, matching build_kernel_map.
    """
    bcap, z = plan.brick_src.shape
    nmax = grid.capacity
    dcap = plan.dcapacity

    # brick_src lifted to dilated space (ghost bricks -> all-miss rows);
    # _wide_gather: these tables are 4/6/27 lanes — far under the 64-lane
    # gather cliff (6x slower rows) without padding
    flat = jnp.concatenate(
        [plan.brick_src, jnp.full((1, z), nmax, jnp.int32)], axis=0)
    src_d = _wide_gather(flat, jnp.minimum(plan.d2r, bcap))  # (Dcap, Z)
    top = src_d[:, z - 1:]
    bot = src_d[:, :1]
    below = jnp.where(
        plan.zdn_ok[:, None] > 0,
        jnp.concatenate([jnp.full((1, 1), nmax, jnp.int32), top[:-1]]),
        nmax)
    above = jnp.where(
        plan.zup_ok[:, None] > 0,
        jnp.concatenate([bot[1:], jnp.full((1, 1), nmax, jnp.int32)]),
        nmax)
    ext_src = jnp.concatenate([below, src_d, above], axis=1)  # (Dcap, Z+2)
    ext_src = jnp.concatenate(
        [ext_src, jnp.full((1, z + 2), nmax, jnp.int32)], axis=0)

    # per (brick, column) z-extended source rows: (Bcap, 9, Z+2)
    g9 = _wide_gather(ext_src, plan.bkmap9)

    # slot-level kmap: for z-row r the dz in {-1,0,1} taps read ext rows
    # r..r+2 (static slices); axis order must be ME HYPER_CUBE x-fastest
    # = index (dz+1)*9 + (dy+1)*3 + (dx+1), and bkmap9's columns are
    # already (dy,dx) row-major -> transpose (col, dz) -> (dz, col)
    per_r = []
    for r in range(z):
        s = jax.lax.slice(g9, (0, 0, r), (bcap, 9, r + 3))  # (B, 9, 3)
        per_r.append(jnp.transpose(s, (0, 2, 1)).reshape(bcap, 27))
    kmap_slots = jnp.stack(per_r, axis=1).reshape(bcap * z, 27)
    kmap_slots = jnp.concatenate(
        [kmap_slots, jnp.full((1, 27), nmax, jnp.int32)], axis=0)

    vs = jnp.minimum(plan.vox_slot, bcap * z)
    return _wide_gather(kmap_slots, vs)  # (Nmax, 27)
