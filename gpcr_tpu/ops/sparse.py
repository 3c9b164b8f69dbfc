"""TPU-native sparse voxel convolution engine.

Replaces MinkowskiEngine (the reference L2 network's sparse-conv backend,
models/model_v2.py:4,21-271) with a design XLA can tile onto the MXU:

- Coordinates are non-negative integer voxels (PCGC grids: offset 512, scale
  256/448 — simple_raw_render.py:73-77), packed into one int32 code
  ``(x << 20) | (y << 10) | z`` (grid <= 1024 per axis) and kept SORTED. A
  sorted code list is the hash table: neighbor lookup = binary search
  (jnp.searchsorted) + equality check.
- A ``kernel map`` is a (N, K) int32 gather table built once per coordinate
  set and reused by every convolution at that level (the reference network
  runs 3 InceptionResNet blocks + 2 convs per level on the same coords).
- conv k3s1: for each of 27 offsets, gather neighbor features and accumulate
  ``feat @ W_o`` — 27 dense (N, Cin)x(Cin, Cout) matmuls, never a 27x
  materialized im2col.
- downsample conv k2s2 (model_v2.py:77-121): output coords = unique parent
  voxels (coord >> 1); gather the 8 children per parent.
- generative transposed conv k2s2 (MinkowskiGenerativeConvolutionTranspose
  targeting the encoder's coordinate_map_key, model_v2.py:137-220): output
  coordinate set is the CACHED finer-level list; each output voxel gathers
  its unique parent and selects the weight by its octant (coord & 1 bits).
- everything is static-shape: each level carries a padded capacity and a
  valid count; padding rows are zero-features with sentinel codes that sort
  to the end.

Batch handling: one ``SparseGrid`` per batch item, vmap-able since every op
is static-shape. (MinkowskiEngine folds batch into a 4th coordinate; keeping
it as a leading axis is the vmap-native equivalent.)
"""

from __future__ import annotations

import typing as T

import flax.struct
import jax
import jax.numpy as jnp

from . import segment

GRID_BITS = 10  # coordinates < 1024 per axis
GRID_MAX = 1 << GRID_BITS
SENTINEL = jnp.iinfo(jnp.int32).max  # sorts to the end

# Blocked-window gather defaults (see _gather_conv_blocked). GATHER_WINDOW
# is the correctness contract shared with every caller's safety check
# (renderer/trainer verify plan['max_delta'] <= GATHER_WINDOW); keep the
# conv defaults and those checks pointing at this single constant.
GATHER_BLOCK = 65_536
GATHER_WINDOW = 16_384

# opt-in runtime invariant checks (host-callback asserts inside jit)
import os as _os

_DEBUG_CHECKS = bool(_os.environ.get("GPCR_DEBUG_CHECKS", ""))


def plan_capacities(
    coords_np, levels: int = 4, margin: float = 1.05, bucket: int = 65536,
):
    """Host-side capacity planning: count unique voxels per level and round
    up to a bucket so jit caches stay small.

    Static shapes are mandatory under XLA, but oversizing level capacities
    multiplies every conv's gather traffic — at 800K points the true
    level-1..3 occupancies are ~0.36/0.11/0.03 of the input, so planning
    from real counts (vs conservative /2 halving) is a ~3-7x saving on the
    U-Net's dominant cost. Returns a tuple of per-level capacities.
    """
    import numpy as np

    c = np.asarray(coords_np)
    c = np.clip(np.round(c), 0, GRID_MAX - 1).astype(np.int64)
    codes = (c[:, 0] << (2 * GRID_BITS)) | (c[:, 1] << GRID_BITS) | c[:, 2]
    # sort + diff replaces np.unique (was 4 unique calls, ~3 s at 800K);
    # each level deduplicates before the next (shrinking) sort. The parent
    # code is (code >> 1) with the bits that crossed the two field
    # boundaries cleared — exactly pack(x>>1, y>>1, z>>1) — but NOT
    # order-preserving, hence the per-level re-sort.
    codes = np.sort(codes)
    fmask = ((GRID_MAX // 2 - 1) << (2 * GRID_BITS)) | (
        (GRID_MAX // 2 - 1) << GRID_BITS
    ) | (GRID_MAX // 2 - 1)
    caps = []
    for lvl in range(levels):
        if len(codes):
            new = np.empty(len(codes), bool)
            new[0] = True
            np.not_equal(codes[1:], codes[:-1], out=new[1:])
            codes = codes[new]  # dedup
        n = len(codes)
        caps.append(int(-(-int(n * margin) // bucket)) * bucket)
        codes = np.sort((codes >> 1) & fmask)
    return tuple(caps)


def pack_coords(coords: jnp.ndarray) -> jnp.ndarray:
    """(N, 3) int -> (N,) int32 lexicographic code."""
    c = coords.astype(jnp.int32)
    return (c[:, 0] << (2 * GRID_BITS)) | (c[:, 1] << GRID_BITS) | c[:, 2]


def unpack_coords(codes: jnp.ndarray) -> jnp.ndarray:
    mask = GRID_MAX - 1
    x = (codes >> (2 * GRID_BITS)) & mask
    y = (codes >> GRID_BITS) & mask
    z = codes & mask
    return jnp.stack([x, y, z], axis=-1)


@flax.struct.dataclass
class SparseGrid:
    """A sorted sparse voxel tensor at one resolution level.

    coords are NORMALIZED by the level stride (so kernel offsets are always
    unit steps; the world stride is tracked separately).
    """

    codes: jnp.ndarray  # (Nmax,) int32 sorted ascending, SENTINEL padding
    feats: jnp.ndarray  # (Nmax, C) float, zero padding
    num: jnp.ndarray  # () int32 valid count
    stride: int = flax.struct.field(pytree_node=False, default=1)

    @property
    def capacity(self) -> int:
        return self.codes.shape[0]

    @property
    def valid(self) -> jnp.ndarray:
        return jnp.arange(self.capacity) < self.num

    def coords(self) -> jnp.ndarray:
        return unpack_coords(jnp.where(self.valid, self.codes, 0))

    def world_coords(self) -> jnp.ndarray:
        """Coordinates in the original (stride-1) grid units."""
        return self.coords() * self.stride


# --------------------------------------------------------------------------
# construction / quantization
# --------------------------------------------------------------------------


def quantize_average(
    coords_f: jnp.ndarray,  # (N, 3) float, will be rounded
    feats: jnp.ndarray,  # (N, C)
    valid: T.Optional[jnp.ndarray] = None,  # (N,)
    capacity: T.Optional[int] = None,
) -> SparseGrid:
    """Round to integer voxels and average features of duplicates.

    Equivalent of ME.utils.sparse_collate + SparseTensor with
    UNWEIGHTED_AVERAGE quantization (simple_raw_render.py:335-338). ME floors
    float coordinates; the reference feeds already-integer (or
    round-intended) grids, and its quantization-offset features use
    ``xyz - round(xyz)`` — we round, matching that intent.
    """
    n = coords_f.shape[0]
    capacity = capacity or n
    coords = jnp.clip(jnp.round(coords_f), 0, GRID_MAX - 1).astype(jnp.int32)
    codes = pack_coords(coords)
    if valid is not None:
        codes = jnp.where(valid.astype(bool), codes, SENTINEL)

    order = jnp.argsort(codes)
    sc = codes[order]
    sf = feats[order]
    isnew = jnp.concatenate(
        [jnp.ones((1,), jnp.int32), (sc[1:] != sc[:-1]).astype(jnp.int32)]
    )
    isnew = jnp.where(sc == SENTINEL, 0, isnew)
    seg = jnp.cumsum(isnew) - 1  # unique slot per sorted element; -1 for lead pad
    seg = jnp.clip(seg, 0, capacity - 1)
    n_unique = jnp.maximum(jnp.max(jnp.where(sc == SENTINEL, -1, seg)) + 1, 0)

    ok = (sc != SENTINEL).astype(sf.dtype)[:, None]
    fsum = segment.segment_sum(sf * ok, seg, capacity)
    cnt = segment.segment_sum(ok[:, 0], seg, capacity)
    fmean = fsum / jnp.maximum(cnt, 1.0)[:, None]

    # sentinel rows inherit the running segment id; scatter them into an
    # overflow slot so they cannot clobber the last real slot
    seg_write = jnp.where(sc == SENTINEL, capacity, seg)
    out_codes = jnp.full((capacity + 1,), SENTINEL, jnp.int32)
    out_codes = out_codes.at[seg_write].set(sc)[:capacity]
    slot_valid = jnp.arange(capacity) < n_unique
    return SparseGrid(
        codes=jnp.where(slot_valid, out_codes, SENTINEL),
        feats=fmean * slot_valid[:, None],
        num=n_unique.astype(jnp.int32),
        stride=1,
    )


# --------------------------------------------------------------------------
# kernel maps
# --------------------------------------------------------------------------


def _offsets_cube(k: int) -> jnp.ndarray:
    """K³ integer offsets, ME HYPER_CUBE order: axis-0 fastest.

    MinkowskiEngine enumerates kernel regions with the FIRST coordinate
    varying fastest; for k=3 the offsets per axis follow 0, 1, -1 pattern
    ME uses for odd kernels ([0, 1, 2] - k//2 order is 0,1,-1... ME's
    RegionIterator yields offsets in order (-1, 0, 1) after centering for
    odd kernels and (0, 1) for even kernels). We fix: odd kernels use
    (-(k//2) .. k//2) ascending; even kernels use (0 .. k-1). The checkpoint
    converter permutes torch weights into this order.
    """
    if k % 2 == 1:
        rng = jnp.arange(-(k // 2), k // 2 + 1)
    else:
        rng = jnp.arange(0, k)
    # first axis fastest (ME convention)
    ox = jnp.tile(rng, k * k)
    oy = jnp.tile(jnp.repeat(rng, k), k)
    oz = jnp.repeat(rng, k * k)
    return jnp.stack([ox, oy, oz], axis=-1)  # (k³, 3) with x fastest


def lookup(codes_sorted: jnp.ndarray, num: jnp.ndarray, queries: jnp.ndarray):
    """Find query codes in a sorted code list.

    Returns (idx, found): idx in [0, capacity), found bool. Misses get
    idx == capacity (caller pads feature rows with a zero row at idx
    capacity).
    """
    cap = codes_sorted.shape[0]
    # method='sort' (merge-based) is ~8x faster than the default binary
    # search on TPU at these sizes (random gathers cost ~9ns/element)
    pos = jnp.searchsorted(codes_sorted, queries, method="sort")
    pos_c = jnp.clip(pos, 0, cap - 1)
    found = (codes_sorted[pos_c] == queries) & (pos_c < num) & (queries != SENTINEL)
    return jnp.where(found, pos_c, cap), found


def _check_merge_runs(sv, st, max_run):
    """Debug guard for lookup_merge's precondition (enable with
    GPCR_DEBUG_CHECKS=1): every equal-value run in the merged
    (codes + queries) stream must fit in ``max_run`` — i.e. every query
    VALUE occurs fewer than max_run times (codes are unique, so a run can
    be at most 1 code + (max_run - 1) queries). A violation would
    otherwise yield silent false misses."""
    nonsent = sv[max_run:] != SENTINEL
    bad = jnp.any((sv[max_run:] == sv[:-max_run]) & nonsent)

    def _raise(bad_val):
        if bool(bad_val):
            raise RuntimeError(
                f"lookup_merge: an equal-value run exceeds max_run="
                f"{max_run}; results would contain silent false misses. "
                f"Raise max_run (must exceed the query-value multiplicity)."
            )

    jax.debug.callback(_raise, bad)


def lookup_merge(
    codes_sorted: jnp.ndarray, num: jnp.ndarray, queries: jnp.ndarray,
    max_run: int = 64,
):
    """``lookup`` via two explicit merges — no post-search verification
    gather (that gather hits the gather-rate cliff: at 23M queries over an
    852K table it alone costs ~250 ms) and no jnp.searchsorted lowering
    (which dominated the plan's 4-minute compile).

    Requires every query VALUE to occur fewer than ``max_run`` times
    (true for kernel maps: a voxel is queried once per (source, offset),
    <= 27 + its own code row; and for parent lookups: <= 8 children).
    Returns (idx, found) with the same semantics as ``lookup``.
    """
    cap = codes_sorted.shape[0]
    m = queries.shape[0]
    val = jnp.concatenate([codes_sorted, queries])
    tag = jnp.concatenate(
        [jnp.zeros((cap,), jnp.int32), jnp.ones((m,), jnp.int32)]
    )
    pay = jnp.concatenate(
        [jnp.zeros((cap,), jnp.int32), jnp.arange(m, dtype=jnp.int32)]
    )
    # merge 1: by (value, tag) — a code sorts before its equal queries
    sv, st, sp = jax.lax.sort((val, tag, pay), num_keys=2)
    if _DEBUG_CHECKS:
        _check_merge_runs(sv, st, max_run)

    idx = jnp.cumsum(1 - st) - 1  # last code position at/before each entry
    # "this equal-value run starts with a code": propagate the code flag
    # down runs with doubling shifts (runs are < max_run by contract)
    f = (1 - st).astype(jnp.int32)
    k = 1
    while k < max_run:
        same = jnp.concatenate(
            [jnp.zeros((k,), bool), sv[k:] == sv[:-k]]
        )
        fk = jnp.concatenate([jnp.zeros((k,), jnp.int32), f[:-k]])
        f = jnp.maximum(f, jnp.where(same, fk, 0))
        k *= 2
    enc = jnp.where(
        (st == 1) & (f == 1), jnp.clip(idx, 0, cap), cap
    ).astype(jnp.int32)

    # merge 2: unsort by (tag, payload) — queries land at the tail in
    # their original order
    _, _, enc_u = jax.lax.sort((st, sp, enc), num_keys=2)
    q_enc = enc_u[cap:]
    found = (q_enc < num) & (queries != SENTINEL)
    return jnp.where(found, q_enc, cap), found


def build_kernel_map(grid: SparseGrid, kernel_size: int) -> jnp.ndarray:
    """(Nmax, K³) gather indices into grid.feats (misses -> capacity).

    Built once per coordinate set; shared by every same-level conv
    (the ME kernel-map analogue, but as a dense gather table).
    """
    offs = _offsets_cube(kernel_size)  # (K, 3)
    coords = unpack_coords(grid.codes)  # sentinel rows give garbage; masked below
    nbr = coords[:, None, :] + offs[None, :, :]  # (N, K, 3)
    in_range = jnp.all((nbr >= 0) & (nbr < GRID_MAX), axis=-1)
    q = jnp.where(in_range, pack_coords(nbr.reshape(-1, 3)).reshape(nbr.shape[:2]),
                  SENTINEL)
    q = jnp.where(grid.valid[:, None], q, SENTINEL)
    idx, _ = lookup_merge(grid.codes, grid.num, q.reshape(-1))
    return idx.reshape(q.shape)  # (Nmax, K³)


def build_kernel_map9(grid: SparseGrid):
    """Augmented z-packed kernel map for k3s1 — 9 gathers instead of 27.

    The lex-sorted code order makes (0, 0, ±1) neighbors row-adjacent, so a
    27-tap conv can read z-triples [f(c-1), f(c), f(c+1)] from a 3C-wide
    table with only the 9 (dx, dy) gathers. Plain z-packing has an orphan
    hole (the (dx, dy, 0) voxel may be absent while (dx, dy, ±1) exist); the
    fix is an AUGMENTED code set A = {c-1, c, c+1 : c occupied} — every
    query with ANY occupied z-triple member lands on an A row, and occupied
    z-neighbors of an A row are exactly its adjacent A rows (integers
    between differ by 1).

    Returns dict(acodes (capA,) sorted SENTINEL-padded, anum, aidx (capA,)
    -> original row or cap (ghost), adjm/adjp (capA,) bool, kmapT9
    (capA-index per (voxel, 9 offsets): (Nmax, 9) i32, capA = miss),
    max_delta for the blocked-gather window check).
    """
    cap = grid.capacity
    capA = 3 * cap
    valid = grid.valid

    # augmented code set (z +- 1 in-range; codes unique -> dedup by sort)
    z = grid.codes & (GRID_MAX - 1)
    cm = jnp.where(valid & (z > 0), grid.codes - 1, SENTINEL)
    cp = jnp.where(valid & (z < GRID_MAX - 1), grid.codes + 1, SENTINEL)
    c0 = jnp.where(valid, grid.codes, SENTINEL)
    allc = jnp.sort(jnp.concatenate([cm, c0, cp]))
    isnew = jnp.concatenate(
        [jnp.ones((1,), bool), allc[1:] != allc[:-1]]
    ) & (allc != SENTINEL)
    # compact unique codes to the front (order-preserving via sort on key)
    acodes = jnp.sort(jnp.where(isnew, allc, SENTINEL))
    anum = jnp.sum(isnew).astype(jnp.int32)

    # map A rows -> original rows (ghost rows miss); runs <= 3+1
    aidx, _ = lookup_merge(grid.codes, grid.num, acodes, max_run=8)
    # inverse: each occupied code's A row (strictly increasing over valid
    # rows) — the feature expansion is a sorted-unique scatter with this
    a_of_orig, _ = lookup_merge(acodes, anum, c0, max_run=4)

    # occupied z-neighbors of an A row sit at the adjacent A rows
    nxt = jnp.concatenate([acodes[1:], jnp.full((1,), SENTINEL, jnp.int32)])
    prv = jnp.concatenate([jnp.full((1,), SENTINEL, jnp.int32), acodes[:-1]])
    avalid = jnp.arange(capA) < anum
    az = acodes & (GRID_MAX - 1)
    adjp = (nxt == acodes + 1) & (az < GRID_MAX - 1) & avalid
    adjm = (prv == acodes - 1) & (az > 0) & avalid

    # 9 (dx, dy, 0) queries per voxel into A; a miss means the whole
    # z-triple is unoccupied (correct zero contribution)
    offs = _offsets_cube(3)  # (27, 3); dz == 0 block is offs[9 + j]
    coords = unpack_coords(grid.codes)
    own = jnp.arange(cap, dtype=jnp.int32)
    kms = []
    deltas = []
    for j in range(9):
        off = offs[9 + j]
        nbr = coords + off[None, :]
        in_range = jnp.all((nbr >= 0) & (nbr < GRID_MAX), axis=-1)
        q = jnp.where(in_range & valid, pack_coords(nbr), SENTINEL)
        idx, found = lookup_merge(acodes, anum, q, max_run=16)
        kms.append(idx)
        # window check: deviation of each query's A position from its OWN
        # voxel's A position (the blocked gather centers block windows on
        # a_of_orig, so only this local deviation must fit the window)
        own_a = jnp.clip(a_of_orig, 0, capA - 1)
        deltas.append(jnp.max(jnp.where(found, jnp.abs(idx - own_a), 0)))
    kmap9 = jnp.stack(kms, axis=1)  # (Nmax, 9)
    return {
        "acodes": acodes,
        "anum": anum,
        "aidx": aidx,
        "a_of_orig": a_of_orig,
        "adjm": adjm,
        "adjp": adjp,
        "kmap9": kmap9,
        "max_delta": jnp.max(jnp.stack(deltas)),
    }


def _augment_feats(feats: jnp.ndarray, km9: dict) -> jnp.ndarray:
    """(cap, C) -> (capA, 3C) z-triple rows on the augmented code set.

    Expansion is a sorted-unique scatter of the compact features into their
    A positions (strictly increasing indices — XLA takes the fast scatter
    path); the z-neighbor thirds are row shifts gated by the A adjacency
    masks."""
    cap, c = feats.shape
    capA = km9["aidx"].shape[0]
    g0 = jnp.zeros((capA + 1, c), feats.dtype).at[km9["a_of_orig"]].set(
        feats, indices_are_sorted=True, unique_indices=True, mode="drop"
    )[:capA]
    zm = km9["adjm"][:, None].astype(feats.dtype)
    zp = km9["adjp"][:, None].astype(feats.dtype)
    down = jnp.concatenate(
        [jnp.zeros((1, c), feats.dtype), g0[:-1]], axis=0
    ) * zm
    up = jnp.concatenate(
        [g0[1:], jnp.zeros((1, c), feats.dtype)], axis=0
    ) * zp
    return jnp.concatenate([down, g0, up], axis=-1)


def _w9(weight: jnp.ndarray) -> jnp.ndarray:
    """(27, Cin, Cout) -> (9, 3*Cin, Cout): the dz = -1/0/+1 taps of each
    (dx, dy) stacked along Cin, matching the _augment_feats row layout."""
    kk = weight.shape[0]
    assert kk == 27, kk
    return jnp.stack(
        [
            jnp.concatenate(
                [weight[j], weight[9 + j], weight[18 + j]], axis=0
            )
            for j in range(9)
        ]
    )


def conv9(
    grid: SparseGrid,
    km9: dict,  # from build_kernel_map9
    weight: jnp.ndarray,  # (27, Cin, Cout)
    bias: T.Optional[jnp.ndarray] = None,
    compute_dtype=None,
    block: T.Optional[int] = 32_768,
    window: int = GATHER_WINDOW,
) -> jnp.ndarray:
    """k3s1 sparse conv with 9 z-packed gathers (exact; see
    build_kernel_map9). Equals ``conv`` up to f32 reassociation (the dz
    triple sums inside one matmul)."""
    return conv9_multi(
        grid, km9, [grid.feats], [weight], [bias], compute_dtype,
        block, window,
    )[0]


def conv9_multi(
    grid: SparseGrid,
    km9: dict,
    feats_list: T.Sequence[jnp.ndarray],
    weights: T.Sequence[jnp.ndarray],  # (27, C_i, Cout_i)
    biases: T.Sequence[T.Optional[jnp.ndarray]],
    compute_dtype=None,
    block: T.Optional[int] = 32_768,
    window: int = GATHER_WINDOW,
) -> T.List[jnp.ndarray]:
    """Several k3 convs sharing ONE set of 9 augmented z-packed gathers;
    each consumer reads a contiguous 3C_i column slice of the shared row."""
    ws = [w if compute_dtype is None else w.astype(compute_dtype)
          for w in weights]
    wides = []
    col_slices = []
    off = 0
    for f in feats_list:
        if compute_dtype is not None:
            f = f.astype(compute_dtype)
        wides.append(_augment_feats(f, km9))
        col_slices.append((off, off + 3 * f.shape[1]))
        off += 3 * f.shape[1]
    wide = jnp.concatenate(wides, axis=-1)
    wide = jnp.concatenate(
        [wide, jnp.zeros((1, wide.shape[1]), wide.dtype)], axis=0
    )
    w9s = [_w9(w) for w in ws]

    dot_fns = []
    for w9, (lo, hi) in zip(w9s, col_slices):
        def make(w9=w9, lo=lo, hi=hi):
            def dot(g, i):
                return jnp.dot(g[:, lo:hi], w9[i],
                               preferred_element_type=jnp.float32)
            return dot
        dot_fns.append(make())

    blk = block or grid.capacity
    nb = -(-grid.capacity // blk)
    block_lo = jnp.clip(
        km9["a_of_orig"][jnp.arange(nb) * blk], 0,
        km9["aidx"].shape[0] - 1,
    )
    outs = _gather_conv_blocked(
        wide, km9["kmap9"], dot_fns, [w.shape[2] for w in ws],
        blk, window, stride_num=3, block_lo=block_lo,
    )
    result = []
    for j, out in enumerate(outs):
        if biases[j] is not None:
            out = out + biases[j]
        result.append(out * grid.valid[:, None])
    return result


def kmap_max_delta(kmap: jnp.ndarray) -> jnp.ndarray:
    """Largest |gather index - own row| over kernel-map hits — the
    blocked-gather window must cover this (see ``conv``'s window path)."""
    cap = kmap.shape[0]
    own = jnp.arange(cap, dtype=jnp.int32)[:, None]
    hit = kmap < cap
    return jnp.max(jnp.where(hit, jnp.abs(kmap - own), 0))


def _gather_conv_blocked(
    feats_pad: jnp.ndarray,  # (table + 1, C) zero sentinel at row `table`
    kmap: jnp.ndarray,  # (n_out, K) indices into [0, table], table = miss
    dot_fns: T.Sequence[T.Callable],  # g (rows, C), i -> (rows, Cout_j)
    couts: T.Sequence[int],
    block: int,
    window: int,
    stride_num: int = 1,
    stride_den: int = 1,
    block_lo: T.Optional[jnp.ndarray] = None,
    unroll: T.Optional[bool] = None,
):
    """Core of the blocked-window gather conv: output rows processed in
    blocks of ``block``, each gathering from a table slice around the
    expected index position. Gather sources under ~130K rows run ~6x
    faster than full-table gathers on this chip (the gather-rate cliff —
    scripts/microbench_cliff.py: 89M vs 508M rows/s at the L0 shape), and
    sorted voxel codes make neighbor indices local, so a modest window
    covers them (callers check the kmap's max deviation against
    ``window``).

    The slice for block b starts at ``block_lo[b] - window`` when given
    (callers with a non-uniform output->table density, e.g. the augmented
    z-packed table, precompute exact block starts at plan time), else at
    ``b * block * stride_num / stride_den - window``; its length is
    ``block * stride_num / stride_den + 2 * window`` rows.

    Out-of-window hits are clamped (callers must validate the window);
    misses (index == table) read the per-window zero sentinel row.
    """
    capp, c = feats_pad.shape
    table = capp - 1
    n_out, kk = kmap.shape
    if unroll is None:
        # default: unroll small graphs (small offset count or small row
        # count) — XLA then overlaps the independent per-offset gathers,
        # ~2x at the 28K-row L3 shape. Big-level 27-offset graphs keep
        # the fori to bound compile time, and CPU (the test platform)
        # always does: unrolling inflated the CPU suite from ~10 to
        # ~60 minutes of compile for zero coverage benefit (both
        # branches compute identical math).
        unroll = (kk <= 9 or n_out <= 262_144) and (
            jax.default_backend() != "cpu")

    def accumulate(rows_of, km_rows, nrows, unroll):
        accs = tuple(jnp.zeros((nrows, co), jnp.float32) for co in couts)
        if unroll:
            # static python loop over the K³ offsets: XLA can overlap the
            # independent per-offset gathers, which a fori_loop serializes
            # (small levels measured well below the large-level gather
            # rate under the fori — see scripts/profile_learned.py).
            # Only for small tables: unrolling also multiplies compile
            # time, which the big-level graphs can't afford.
            for i in range(kk):
                g = rows_of(km_rows, i)
                accs = tuple(
                    acc + fn(g, i) for acc, fn in zip(accs, dot_fns)
                )
            return accs

        def body(i, accs):
            g = rows_of(km_rows, i)
            return tuple(
                acc + fn(g, i) for acc, fn in zip(accs, dot_fns)
            )

        return jax.lax.fori_loop(0, kk, body, accs)

    win_rows = block * stride_num // stride_den + 2 * window
    if table <= win_rows or block >= n_out:
        def rows(km, i):
            return feats_pad[km[:, i]]

        return accumulate(rows, kmap, n_out, unroll)

    nb = -(-n_out // block)
    npad = nb * block
    km_pad = jnp.pad(
        kmap, ((0, npad - n_out), (0, 0)), constant_values=table
    )
    km_blocks = km_pad.reshape(nb, block, kk)
    if block_lo is not None:
        base = block_lo[jnp.minimum(
            jnp.arange(nb), block_lo.shape[0] - 1)]
    else:
        base = jnp.arange(nb) * block * stride_num // stride_den

    # scan with per-step OUTPUTS (ys), not a fori_loop updating a big
    # carry: XLA materializes a copy of a dynamic_update_slice'd carry
    # on every iteration (~npad*co*4 bytes each), which dominated wide-
    # output gathers (the brick engine's to_dilated measured 10.9 ms of
    # which ~8 were carry copies); scan ys append in place.
    def step(_, xs):
        km_blk, b0 = xs
        lo = jnp.clip(b0 - window, 0, capp - win_rows)
        win = jax.lax.dynamic_slice(feats_pad, (lo, 0), (win_rows, c))
        win = jnp.concatenate(
            [win, jnp.zeros((1, c), feats_pad.dtype)], axis=0
        )

        def rows(km, i):
            gidx = km[:, i]
            local = jnp.where(
                gidx >= table, win_rows,
                jnp.clip(gidx - lo, 0, win_rows - 1),
            )
            return win[local]

        return None, accumulate(rows, km_blk, block, unroll)

    _, outs = jax.lax.scan(step, None, (km_blocks, base))
    return tuple(
        o.reshape(npad, co)[:n_out] for o, co in zip(outs, couts)
    )


# --------------------------------------------------------------------------
# convolutions
# --------------------------------------------------------------------------


def conv(
    grid: SparseGrid,
    kmap: jnp.ndarray,  # (Nmax, K³) from build_kernel_map
    weight: jnp.ndarray,  # (K³, Cin, Cout)
    bias: T.Optional[jnp.ndarray] = None,  # (Cout,)
    compute_dtype=None,
    block: T.Optional[int] = GATHER_BLOCK,
    window: int = GATHER_WINDOW,
) -> jnp.ndarray:
    """Stride-1 sparse conv on a fixed coordinate set. Returns (Nmax, Cout)
    float32.

    Per-offset gather + matmul accumulation — K³ MXU matmuls, no im2col
    materialization. Large tables use the blocked-window gather
    (_gather_conv_blocked, ~6x faster past the gather-rate cliff);
    ``block=None`` forces the global path (exact regardless of window).
    Callers with nonstandard coordinate distributions should check
    ``kmap_max_delta(kmap) <= window`` once per plan.
    """
    feats = grid.feats if compute_dtype is None else grid.feats.astype(compute_dtype)
    w = weight if compute_dtype is None else weight.astype(compute_dtype)
    feats_pad = jnp.concatenate(
        [feats, jnp.zeros((1, feats.shape[1]), feats.dtype)], axis=0
    )

    def dot(g, i):
        return jnp.dot(g, w[i], preferred_element_type=jnp.float32)

    (out,) = _gather_conv_blocked(
        feats_pad, kmap, [dot], [weight.shape[2]],
        block or grid.capacity, window,
    )
    if bias is not None:
        out = out + bias
    return out * grid.valid[:, None]


def conv_multi(
    grid: SparseGrid,
    kmap: jnp.ndarray,  # (Nmax, K³)
    feats_list: T.Sequence[jnp.ndarray],  # inputs (Nmax, C_i) sharing coords
    weights: T.Sequence[jnp.ndarray],  # (K³, C_i, Cout_i) per input
    biases: T.Sequence[T.Optional[jnp.ndarray]],
    compute_dtype=None,
    block: T.Optional[int] = GATHER_BLOCK,
    window: int = GATHER_WINDOW,
) -> T.List[jnp.ndarray]:
    """Several stride-1 convs over the SAME kernel map with ONE gather per
    offset: the inputs are channel-concatenated so the (index-throughput-
    bound) neighbor gather is shared, and the blocked-window path applies
    (see conv)."""
    packed = jnp.concatenate(list(feats_list), axis=-1)
    if compute_dtype is not None:
        packed = packed.astype(compute_dtype)
    ws = [w if compute_dtype is None else w.astype(compute_dtype)
          for w in weights]
    splits = [f.shape[1] for f in feats_list]
    packed_pad = jnp.concatenate(
        [packed, jnp.zeros((1, packed.shape[1]), packed.dtype)], axis=0
    )

    dot_fns = []
    off = 0
    for w, c in zip(ws, splits):
        def make(w=w, lo=off, hi=off + c):
            def dot(g, i):
                return jnp.dot(g[:, lo:hi], w[i],
                               preferred_element_type=jnp.float32)
            return dot
        dot_fns.append(make())
        off += c

    outs = _gather_conv_blocked(
        packed_pad, kmap, dot_fns, [w.shape[2] for w in weights],
        block or grid.capacity, window,
    )
    result = []
    for j, out in enumerate(outs):
        if biases[j] is not None:
            out = out + biases[j]
        result.append(out * grid.valid[:, None])
    return result


def downsample_coords(grid: SparseGrid, capacity: T.Optional[int] = None):
    """Unique parent voxels (coord >> 1). Returns a SparseGrid skeleton
    (codes/num only; feats zeros) at 2x stride, plus each input voxel's
    parent slot and octant.

    Returns (parent_grid, parent_slot (Nmax,), octant (Nmax,))."""
    capacity = capacity or grid.capacity
    coords = unpack_coords(grid.codes)
    parent = coords >> 1
    octant = (
        (coords[:, 0] & 1) * 4 + (coords[:, 1] & 1) * 2 + (coords[:, 2] & 1)
    ).astype(jnp.int32)
    pcodes = jnp.where(grid.valid, pack_coords(parent), SENTINEL)

    order = jnp.argsort(pcodes)
    sc = pcodes[order]
    isnew = jnp.concatenate(
        [jnp.ones((1,), jnp.int32), (sc[1:] != sc[:-1]).astype(jnp.int32)]
    )
    isnew = jnp.where(sc == SENTINEL, 0, isnew)
    seg = jnp.cumsum(isnew) - 1
    n_unique = jnp.maximum(jnp.max(jnp.where(sc == SENTINEL, -1, seg)) + 1, 0)
    seg = jnp.clip(seg, 0, capacity - 1)

    seg_write = jnp.where(sc == SENTINEL, capacity, seg)
    out_codes = jnp.full((capacity + 1,), SENTINEL, jnp.int32)
    out_codes = out_codes.at[seg_write].set(sc)[:capacity]
    slot_valid = jnp.arange(capacity) < n_unique
    out_codes = jnp.where(slot_valid, out_codes, SENTINEL)

    # map each input voxel -> its parent slot
    parent_slot = jnp.zeros((grid.capacity,), jnp.int32)
    parent_slot = parent_slot.at[order].set(seg)
    parent_slot = jnp.where(grid.valid, parent_slot, capacity)

    pgrid = SparseGrid(
        codes=out_codes,
        feats=jnp.zeros((capacity, grid.feats.shape[1]), grid.feats.dtype),
        num=n_unique.astype(jnp.int32),
        stride=grid.stride * 2,
    )
    return pgrid, parent_slot, octant


def conv_down(
    grid: SparseGrid,
    parent_grid: SparseGrid,
    parent_slot: jnp.ndarray,  # (Nmax,) from downsample_coords
    octant: jnp.ndarray,  # (Nmax,)
    weight: jnp.ndarray,  # (8, Cin, Cout) kernel-2 stride-2
    bias: T.Optional[jnp.ndarray] = None,
    compute_dtype=None,
) -> jnp.ndarray:
    """k2s2 downsampling conv (model_v2.py:77-83 down0/1/2).

    Each output (parent) voxel sums W_octant @ child_feat over its children.
    Scatter formulation: transform every input by its own octant weight,
    segment-sum into parents.
    """
    cin, cout = weight.shape[1], weight.shape[2]
    feats = grid.feats if compute_dtype is None else grid.feats.astype(compute_dtype)
    w = weight if compute_dtype is None else weight.astype(compute_dtype)
    # per-input transform: x_i @ W_{oct(i)} — do 8 masked matmuls
    out_i = jnp.zeros((grid.capacity, cout), jnp.float32)
    for o in range(8):
        m = (octant == o) & grid.valid
        out_i = out_i + jnp.where(
            m[:, None],
            jnp.dot(feats, w[o], preferred_element_type=jnp.float32),
            0.0,
        )
    out = segment.segment_sum(out_i, parent_slot, parent_grid.capacity + 1)[:-1]
    if bias is not None:
        out = out + bias
    return out * parent_grid.valid[:, None]


def conv_up_generative(
    coarse: SparseGrid,
    fine_codes: jnp.ndarray,  # (Mmax,) target coords (cached encoder level)
    fine_num: jnp.ndarray,
    fine_stride: int,
    weight: jnp.ndarray,  # (8, Cin, Cout)
    bias: T.Optional[jnp.ndarray] = None,
    compute_dtype=None,
) -> jnp.ndarray:
    """Generative transposed conv k2s2 restoring a cached coordinate set
    (MinkowskiGenerativeConvolutionTranspose + coordinate_map_key target,
    model_v2.py:137-143,212-220). Returns (Mmax, Cout) on the fine coords.
    """
    fine_valid = jnp.arange(fine_codes.shape[0]) < fine_num
    fcoords = unpack_coords(fine_codes)
    parent = fcoords >> 1
    octant = (
        (fcoords[:, 0] & 1) * 4 + (fcoords[:, 1] & 1) * 2 + (fcoords[:, 2] & 1)
    ).astype(jnp.int32)
    q = jnp.where(fine_valid, pack_coords(parent), SENTINEL)
    pidx, _ = lookup_merge(coarse.codes, coarse.num, q, max_run=16)
    cfeats = (coarse.feats if compute_dtype is None
              else coarse.feats.astype(compute_dtype))
    w = weight if compute_dtype is None else weight.astype(compute_dtype)
    feats_pad = jnp.concatenate(
        [cfeats, jnp.zeros((1, cfeats.shape[1]), cfeats.dtype)], axis=0
    )
    pf = feats_pad[pidx]  # (Mmax, Cin)
    out = jnp.zeros((fine_codes.shape[0], weight.shape[2]), jnp.float32)
    for o in range(8):
        m = octant == o
        out = out + jnp.where(
            m[:, None],
            jnp.dot(pf, w[o], preferred_element_type=jnp.float32),
            0.0,
        )
    if bias is not None:
        out = out + bias
    return out * fine_valid[:, None]


def interpolate_trilinear(grid: SparseGrid, points: jnp.ndarray) -> jnp.ndarray:
    """Trilinear interpolation of sparse features at continuous points
    (MinkowskiInterpolation equivalent, model_v2.py:270). points in the
    grid's normalized coordinates. Returns (P, C)."""
    base = jnp.floor(points).astype(jnp.int32)
    frac = points - base
    feats_pad = jnp.concatenate(
        [grid.feats, jnp.zeros((1, grid.feats.shape[1]), grid.feats.dtype)], axis=0
    )
    out = jnp.zeros((points.shape[0], grid.feats.shape[1]), jnp.float32)
    for dx in range(2):
        for dy in range(2):
            for dz in range(2):
                c = base + jnp.array([dx, dy, dz])
                w = (
                    jnp.where(dx, frac[:, 0], 1 - frac[:, 0])
                    * jnp.where(dy, frac[:, 1], 1 - frac[:, 1])
                    * jnp.where(dz, frac[:, 2], 1 - frac[:, 2])
                )
                in_range = jnp.all((c >= 0) & (c < GRID_MAX), axis=-1)
                q = jnp.where(in_range, pack_coords(c), SENTINEL)
                idx, found = lookup(grid.codes, grid.num, q)
                out = out + w[:, None] * feats_pad[idx] * found[:, None]
    return out


def prune(grid: SparseGrid, keep: jnp.ndarray) -> SparseGrid:
    """Drop voxels where keep is False (MinkowskiPruning equivalent,
    model_v2.py:271). Static-shape: compact survivors to the front."""
    keep = keep & grid.valid
    order = jnp.argsort(jnp.where(keep, grid.codes, SENTINEL))
    return SparseGrid(
        codes=jnp.where(keep[order], grid.codes[order], SENTINEL),
        feats=grid.feats[order] * keep[order][:, None],
        num=keep.sum().astype(jnp.int32),
        stride=grid.stride,
    )
