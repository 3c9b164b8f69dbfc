"""Differentiable tile-based Gaussian rasterizer — TPU-native jnp reference.

Re-derives the reference CUDA pipeline (``cuda_rasterizer/``) with XLA-native
building blocks and static shapes:

- per-Gaussian preprocessing: vectorized jnp (see ``ops/splat.py``);
- tile binning: static-capacity duplication (``max_dup_per_gaussian`` tiles
  per splat) + one global ``lax.sort`` by (tile, depth) — replaces the CUB
  prefix-scan + 64-bit radix sort (rasterizer_impl.cu:70-138,275-318) and its
  forced device-to-host ``num_rendered`` sync (rasterizer_impl.cu:281);
- blending: per-tile chunked front-to-back alpha compositing with the exact
  CUDA semantics (forward.cu:264-377): α = min(0.99, op·exp(power)), skip
  α < 1/255 or power > 0, terminate the pixel when T·(1−α) < 1e-4 WITHOUT
  compositing the crossing Gaussian. The sequential per-pixel loop becomes a
  cumulative-product over a chunk axis plus one (chunk × pixels)·(chunk ×
  channels) matmul — MXU-friendly;
- channels are generic: the reference's four full pipeline passes
  (xyz/rgb/hit/normal, simple_raw_render.py:419-522) fuse into ONE pass with
  concatenated feature channels;
- gradients: plain JAX autodiff through a statically-bounded scan
  (``differentiable=True``) replaces the hand-written ``backward.cu``;
  inference uses an early-exiting while_loop.

Shapes are fully static (N padded, K = N·max_dup keys), so the whole pipeline
jits once per (N, resolution) bucket.
"""

from __future__ import annotations

import typing as T

import jax
import jax.numpy as jnp

from ..utils import sh as sh_utils
from . import splat


class RasterizeConfig(T.NamedTuple):
    """Static rasterizer configuration (hashable — safe as a jit static arg).

    tile 16x16 matches the reference BLOCK_X/Y (config.h:16-17) so that the
    tile->Gaussian assignment (and therefore which sub-1/255 tails each pixel
    sees) is bit-identical.
    """

    tile_x: int = 16
    tile_y: int = 16
    max_dup_per_gaussian: int = 32  # tile-rect cap per splat
    chunk_size: int = 128  # Gaussians blended per inner step (sweep optimum)
    tile_batch: int = 256  # tiles processed per lax.map step
    max_chunks: int = 64  # static bound for the differentiable scan
    differentiable: bool = False
    scan_impl: str = "cumprod"  # or "trimatmul": MXU tri-matmul in log space
    # flat/pallas-path static budgets (overflow is detected and reported):
    # k_budget: cap on sorted entries laid out. -1 = AUTO at the renderer
    # level only (render/renderer.py sizes it to the scene's exact
    # per-view entry count, bucketed to 256K): the rasterize ops
    # themselves need a concrete budget.
    k_budget: T.Optional[int] = None  # cap on sorted entries laid out
    max_active_tiles: T.Optional[int] = None  # cap on non-empty tiles
    # forward-path implementation: "xla" (exact reference semantics via
    # vmapped while_loops) or "stream" (Pallas active-tile streaming kernel,
    # ops/rasterize_stream.py — same semantics, per-tile exact cost)
    impl: str = "xla"
    # stream-path only: 2 folds the x2-supersampling 2x2-mean downscale into
    # the kernel's tile write (renders at H x W, emits H/2 x W/2 — saves the
    # full-res image round-trip + the separate resize pass). Requires
    # H, W and tile dims even.
    downscale: int = 1
    # stream-path only: tiles composited per kernel grid step. Each grid
    # step carries ~1 us of fixed cost (launch + output-block DMA), so
    # grouping 4 tiles per step cuts that overhead 4x on the ~6K-step
    # deployed grids; the tiles still run sequentially inside the step.
    tiles_per_step: int = 4
    # stream-kernel feature-contraction precision: "env" defers to
    # GPCR_FEAT_PRECISION (default "highest" = f32-exact 6-pass MXU).
    # "default" = 1-pass bf16: ~4e-3 relative error on the composited
    # features — BELOW one uint8 step (1/255 = 3.9e-3), so for uint8
    # output pipelines (the CLI's save_pic protocol and the reference's
    # own PNG scoring, pic_psnr.py:44) it is quantization-invisible
    # almost everywhere; measured 47.3 -> 44.1 ms/frame (round 4).
    # Golden SHA/50 dB oracle parity requires "highest".
    feat_precision: str = "env"
    # stream-kernel transmittance scan: "env" defers to GPCR_SCAN
    # (default "flat"). See rasterize_stream.py for the measured
    # flat/two/mxu record.
    scan: str = "env"
    # opacity-aware tile rects: bin each splat with the TIGHT radius
    # r = ceil(sqrt(min(9, 2*ln(255*op)) * lambda_max)) instead of the
    # blanket 3-sigma (forward.cu:232-235). BIT-EXACT images — every
    # dropped (splat, tile) pair fails the blend's own alpha >= 1/255
    # skip (forward.cu:318-320) at all its pixels — while shrinking the
    # entry stream for low-opacity (learned) splats and culling
    # op <= 1/255 splats outright. The returned radii keep the
    # reference's 3-sigma values for API parity.
    opacity_radius: bool = False


class GaussianRasterizationSettings(T.NamedTuple):
    """Mirror of the reference settings tuple
    (diff_gaussian_rasterization/__init__.py:157-169)."""

    image_height: int
    image_width: int
    tanfovx: float
    tanfovy: float
    bg: jnp.ndarray  # (C,)
    scale_modifier: float
    viewmatrix: jnp.ndarray  # (4, 4) transposed w2c (torch layout)
    projmatrix: jnp.ndarray  # (4, 4) transposed full view·proj
    sh_degree: int
    campos: jnp.ndarray  # (3,)
    prefiltered: bool = False
    debug: bool = False


class Preprocessed(T.NamedTuple):
    valid: jnp.ndarray  # (N,) bool
    depth: jnp.ndarray  # (N,)
    mean2d: jnp.ndarray  # (N, 2) pixel coords
    conic: jnp.ndarray  # (N, 3)
    radius: jnp.ndarray  # (N,)
    rect: jnp.ndarray  # (N, 4) int32: min_x, min_y, max_x, max_y (tiles)
    features: jnp.ndarray  # (N, C)
    opacity: jnp.ndarray  # (N,)


# --------------------------------------------------------------------------
# preprocessing (forward.cu:157-259)
# --------------------------------------------------------------------------


def preprocess(
    means3d: jnp.ndarray,  # (N, 3)
    opacities: jnp.ndarray,  # (N,) or (N, 1)
    settings: GaussianRasterizationSettings,
    config: RasterizeConfig,
    scales: T.Optional[jnp.ndarray] = None,  # (N, 3)
    rotations: T.Optional[jnp.ndarray] = None,  # (N, 4) wxyz, unnormalized ok
    cov3d_precomp: T.Optional[jnp.ndarray] = None,  # (N, 6)
    shs: T.Optional[jnp.ndarray] = None,  # (N, K, 3)
    colors_precomp: T.Optional[jnp.ndarray] = None,  # (N, C)
    valid_mask: T.Optional[jnp.ndarray] = None,  # (N,) padding mask
) -> Preprocessed:
    H, W = settings.image_height, settings.image_width
    focal_y = H / (2.0 * settings.tanfovy)
    focal_x = W / (2.0 * settings.tanfovx)
    grid_x = -(-W // config.tile_x)
    grid_y = -(-H // config.tile_y)

    p_view, vis = splat.in_frustum(means3d, settings.viewmatrix)
    p_proj = splat.project_points(means3d, settings.projmatrix)

    if cov3d_precomp is None:
        cov3d = splat.compute_cov3d(scales, settings.scale_modifier, rotations)
    else:
        cov3d = cov3d_precomp
    cov2d = splat.compute_cov2d(
        means3d, focal_x, focal_y, settings.tanfovx, settings.tanfovy,
        cov3d, settings.viewmatrix,
    )
    if config.opacity_radius:
        conic, radius, det_ok, r_bin = splat.conic_and_radius(
            cov2d, opacity=opacities.reshape(-1))
    else:
        conic, radius, det_ok = splat.conic_and_radius(cov2d)
        r_bin = radius
    mean2d = jnp.stack(
        [splat.ndc2pix(p_proj[..., 0], W), splat.ndc2pix(p_proj[..., 1], H)], axis=-1
    )
    rmin_x, rmin_y, rmax_x, rmax_y = splat.get_rect(
        mean2d, r_bin, grid_x, grid_y, config.tile_x, config.tile_y
    )
    tiles_touched = (rmax_x - rmin_x) * (rmax_y - rmin_y)

    valid = vis & det_ok & (tiles_touched > 0)
    if valid_mask is not None:
        valid = valid & valid_mask.astype(bool)
    valid_report = valid  # reference-semantics validity for radii output
    if config.opacity_radius:
        # r_bin == 0 <=> op <= 1/255: no pixel can clear the blend's
        # alpha skip — cull from BINNING only. The radii output keeps
        # reference semantics: reference-rect tiles_touched (a tight
        # rect can clip to empty at the screen edge where the
        # reference's does not).
        valid = valid & (r_bin > 0)
        rx0, ry0, rx1, ry1 = splat.get_rect(
            mean2d, radius, grid_x, grid_y, config.tile_x, config.tile_y
        )
        valid_report = vis & det_ok & ((rx1 - rx0) * (ry1 - ry0) > 0)
        if valid_mask is not None:
            valid_report = valid_report & valid_mask.astype(bool)

    if colors_precomp is None:
        features = sh_utils.eval_sh_color(
            settings.sh_degree, shs, means3d, settings.campos
        )
    else:
        features = colors_precomp

    return Preprocessed(
        valid=valid,
        depth=p_view[..., 2],
        mean2d=mean2d,
        conic=conic,
        radius=jnp.where(valid_report, radius, 0.0),
        rect=jnp.stack([rmin_x, rmin_y, rmax_x, rmax_y], axis=-1),
        features=features,
        opacity=opacities.reshape(-1),
    )


# --------------------------------------------------------------------------
# binning (rasterizer_impl.cu:70-138, replaced by one lax.sort)
# --------------------------------------------------------------------------


def entry_count(prep: Preprocessed, config: RasterizeConfig):
    """EXACT number of (splat, tile) entries the emit will produce for this
    view — the k_budget sizing quantity (same cap-clamped rects, same
    opacity_radius validity as tile_bin). Gather + sort are linear in
    k_budget (PERFORMANCE.md), so sizing the budget to the scene instead
    of a blanket default removes dead stream rows; a budget == this count
    drops nothing (it is a count, not an estimate)."""
    area_raw = (prep.rect[:, 2] - prep.rect[:, 0]) * (
        prep.rect[:, 3] - prep.rect[:, 1])
    cap = config.max_dup_per_gaussian
    return jnp.sum(jnp.where(prep.valid, jnp.minimum(area_raw, cap), 0))


def tile_bin(prep: Preprocessed, num_tiles: int, grid_x: int, config: RasterizeConfig,
             tile_window=None):
    """Duplicate each Gaussian into its tile rect (capped at
    max_dup_per_gaussian, row-major like duplicateWithKeys,
    rasterizer_impl.cu:70-111), then sort all (tile, depth) keys.

    With ``config.k_budget`` set, the duplication list is COMPACTED to the
    budget before sorting (real entries typically fill ~25% of N·cap — the
    lax.sort over sentinels was the single largest binning cost). Budget
    overruns are counted in the returned overflow.

    ``tile_window=(base, count)`` bins only tiles [base, base+count) in
    LOCAL tile coordinates (entry tiles are remapped to tile-base; starts
    has count+1 rows) — the per-shard binning of the tile-sharded
    multi-chip path (parallel/render.py): every shard runs the same
    elementwise emit over all gaussians but sorts/gathers only its own
    slice of the entry list. ``base`` may be traced (shard_map axis
    index); ``count`` must be static.

    Returns (sorted_gidx (K+chunk,), tile_starts (num_tiles+1,),
             overflow (scalar — duplications dropped by cap/budget)).
    """
    n = prep.depth.shape[0]
    cap = config.max_dup_per_gaussian
    if tile_window is not None:
        win_base, win_count = tile_window
        num_tiles_out = win_count
    else:
        win_base, num_tiles_out = None, num_tiles

    rmin_x, rmin_y = prep.rect[:, 0], prep.rect[:, 1]
    rw = jnp.maximum(prep.rect[:, 2] - rmin_x, 1)
    area_raw = (prep.rect[:, 2] - rmin_x) * (prep.rect[:, 3] - rmin_y)
    area = jnp.where(prep.valid, jnp.minimum(area_raw, cap), 0)
    overflow = jnp.sum(jnp.where(prep.valid, jnp.maximum(area_raw - cap, 0), 0))

    if config.k_budget is not None:
        # compact: dup slot s belongs to gaussian g with
        # cumstart[g] <= s < cumstart[g+1]; k = s - cumstart[g]
        kb = config.k_budget
        cumstart = jnp.concatenate(
            [jnp.zeros((1,), jnp.int32), jnp.cumsum(area).astype(jnp.int32)]
        )
        total = cumstart[-1]
        overflow = overflow + jnp.maximum(total - kb, 0)
        marks = jnp.zeros((kb + 1,), jnp.int32).at[
            jnp.minimum(cumstart[:-1], kb)
        ].add(jnp.where(area > 0, 1, 0))
        g_of_slot = jnp.cumsum(marks[:kb]) - 1
        # slots before the first non-empty gaussian / past total are invalid
        slot = jnp.arange(kb, dtype=jnp.int32)
        slot_valid = (g_of_slot >= 0) & (slot < total)
        g_of_slot = jnp.clip(g_of_slot, 0, n - 1)
        k = slot - cumstart[g_of_slot]
        ty = rmin_y[g_of_slot] + k // rw[g_of_slot]
        tx = rmin_x[g_of_slot] + k % rw[g_of_slot]
        tile_flat = jnp.where(
            slot_valid, ty * grid_x + tx, num_tiles
        ).astype(jnp.int32)
        depth_flat = prep.depth[g_of_slot]
        gidx_flat = g_of_slot.astype(jnp.int32)
        if win_base is not None:
            local = (tile_flat >= win_base) & (
                tile_flat < win_base + num_tiles_out)
            tile_flat = jnp.where(
                local, tile_flat - win_base, num_tiles_out
            ).astype(jnp.int32)
    else:
        k = jnp.arange(cap, dtype=jnp.int32)
        ty = rmin_y[:, None] + k[None, :] // rw[:, None]
        tx = rmin_x[:, None] + k[None, :] % rw[:, None]
        dup_valid = prep.valid[:, None] & (k[None, :] < area[:, None])
        tile_id = jnp.where(
            dup_valid, ty * grid_x + tx, num_tiles
        ).astype(jnp.int32)
        tile_flat = tile_id.reshape(-1)
        if win_base is not None:
            local = (tile_flat >= win_base) & (
                tile_flat < win_base + num_tiles_out)
            tile_flat = jnp.where(
                local, tile_flat - win_base, num_tiles_out
            ).astype(jnp.int32)
        depth_flat = jnp.broadcast_to(prep.depth[:, None], (n, cap)).reshape(-1)
        gidx_flat = jnp.broadcast_to(
            jnp.arange(n, dtype=jnp.int32)[:, None], (n, cap)
        ).reshape(-1)

    sorted_tile, _, sorted_gidx = jax.lax.sort(
        (tile_flat, depth_flat, gidx_flat), num_keys=2
    )
    starts = jnp.searchsorted(
        sorted_tile, jnp.arange(num_tiles_out + 1), side="left")
    # pad so dynamic_slice in the blend never clamps
    sorted_gidx = jnp.concatenate(
        [sorted_gidx, jnp.full((config.chunk_size,), n, jnp.int32)]
    )
    return sorted_gidx, starts.astype(jnp.int32), overflow


# --------------------------------------------------------------------------
# blending (forward.cu:264-377)
# --------------------------------------------------------------------------


def _blend_chunk(carry, ids, in_range, packed_all, px, py, channels,
                 scan_impl="cumprod"):
    """Composite one chunk of Gaussians into one tile's pixels.

    Exact-semantics vectorization of the renderCUDA inner loop:
    transmittance via cumulative product over the chunk axis; the 1e-4
    early-termination emulated with a crossing mask (the crossing Gaussian is
    NOT composited and T is NOT updated past it — forward.cu:349-354).
    ``packed_all`` holds all per-gaussian data as one row — a single gather
    per chunk instead of four.
    """
    T_run, acc, dead = carry  # (P,), (P, C), (P,) bool

    rows = packed_all[ids]  # (G, 6 + C)
    xy = rows[:, 0:2]
    con = rows[:, 2:5]
    op = rows[:, 5]
    feat = rows[:, 6 : 6 + channels]

    dx = xy[:, 0:1] - px[None, :]  # (G, P)
    dy = xy[:, 1:2] - py[None, :]
    power = (
        -0.5 * (con[:, 0:1] * dx * dx + con[:, 2:3] * dy * dy)
        - con[:, 1:2] * dx * dy
    )
    alpha = jnp.minimum(0.99, op[:, None] * jnp.exp(power))
    a = jnp.where(
        (power > 0.0) | (alpha < (1.0 / 255.0)) | (~in_range)[:, None], 0.0, alpha
    )

    om = 1.0 - a  # >= 0.01 wherever a > 0
    if scan_impl == "trimatmul":
        # inclusive product via exp(tri @ log): one MXU matmul instead of a
        # log2(G)-pass associative scan
        g = om.shape[0]
        gi = jax.lax.broadcasted_iota(jnp.int32, (g, g), 0)
        gj = jax.lax.broadcasted_iota(jnp.int32, (g, g), 1)
        tri = (gj <= gi).astype(jnp.float32)
        cum = jnp.exp(
            jnp.matmul(tri, jnp.log(om),
                       precision=jax.lax.Precision.HIGHEST)
        )
    else:
        cum = jnp.cumprod(om, axis=0)  # (G, P) inclusive
    T_incl = T_run[None, :] * cum
    T_excl = T_incl / om  # exclusive (om bounded away from 0)
    crossed = T_incl < 1e-4
    crossed_before = (jnp.cumsum(crossed.astype(jnp.int32), axis=0) - crossed) > 0
    live = (~dead[None, :]) & (~crossed_before)
    applied = live & (~crossed)

    w = a * T_excl * applied  # (G, P)
    acc = acc + jnp.matmul(w.T, feat, precision=jax.lax.Precision.HIGHEST)  # (P, C)
    T_run = T_run * jnp.prod(jnp.where(applied, om, 1.0), axis=0)
    dead = dead | jnp.any(crossed & live, axis=0)
    return (T_run, acc, dead)


def _blend_one_tile(
    tile_idx, start, end, sorted_gidx, packed_all,
    grid_x, config: RasterizeConfig, channels: int,
):
    cx = config.chunk_size
    p = config.tile_x * config.tile_y
    ty = tile_idx // grid_x
    tx = tile_idx % grid_x
    px = (
        tx * config.tile_x
        + jnp.tile(jnp.arange(config.tile_x, dtype=jnp.float32), config.tile_y)
    )
    py = (
        ty * config.tile_y
        + jnp.repeat(jnp.arange(config.tile_y, dtype=jnp.float32), config.tile_x)
    )

    count = end - start
    nchunks = (count + cx - 1) // cx

    def chunk_step(c, carry):
        ids = jax.lax.dynamic_slice(sorted_gidx, (start + c * cx,), (cx,))
        in_range = (start + c * cx + jnp.arange(cx)) < end
        return _blend_chunk(carry, ids, in_range, packed_all, px, py,
                            channels, config.scan_impl)

    dt = packed_all.dtype
    init = (
        jnp.ones((p,), dt),
        jnp.zeros((p, channels), dt),
        jnp.zeros((p,), bool),
    )

    if config.differentiable:
        def scan_body(carry, c):
            do = (c < nchunks) & (~jnp.all(carry[2]))
            new = chunk_step(c, carry)
            carry = jax.tree_util.tree_map(
                lambda a, b: jnp.where(
                    do.reshape((-1,) + (1,) * (a.ndim - 1)) if a.ndim else do, b, a
                ),
                carry, new,
            )
            return carry, None

        carry, _ = jax.lax.scan(
            scan_body, init, jnp.arange(config.max_chunks), unroll=1
        )
    else:
        def cond(state):
            c, carry = state
            return (c < nchunks) & (~jnp.all(carry[2]))

        def body(state):
            c, carry = state
            return c + 1, chunk_step(c, carry)

        _, carry = jax.lax.while_loop(cond, body, (jnp.int32(0), init))

    T_run, acc, _ = carry
    return acc, T_run  # (P, C), (P,)


def blend(
    prep: Preprocessed,
    sorted_gidx,
    starts,
    settings: GaussianRasterizationSettings,
    config: RasterizeConfig,
):
    """Blend all tiles, assemble (C, H, W) plus final transmittance (H, W)."""
    H, W = settings.image_height, settings.image_width
    grid_x = -(-W // config.tile_x)
    grid_y = -(-H // config.tile_y)
    num_tiles = grid_x * grid_y
    channels = prep.features.shape[-1]

    # all per-gaussian data in one packed row (single gather per chunk);
    # one zero sentinel row so sentinel gidx == N is inert
    packed_all = jnp.concatenate(
        [prep.mean2d, prep.conic, prep.opacity[:, None], prep.features],
        axis=-1,
    )
    packed_all = jnp.concatenate(
        [packed_all, jnp.zeros((1, 6 + channels), packed_all.dtype)], axis=0
    )

    def one(tile_idx):
        return _blend_one_tile(
            tile_idx, starts[tile_idx], starts[tile_idx + 1],
            sorted_gidx, packed_all, grid_x, config, channels,
        )

    # Process tiles in descending-count order: the chunk loop inside a
    # vmapped batch runs in lockstep until every lane is done, so mixing a
    # heavy tile with empty ones multiplies wasted work ~10x. Sorting makes
    # batches homogeneous; results are scattered back afterwards.
    counts = starts[1:] - starts[:-1]
    order = jnp.argsort(-counts)
    tiles = order.astype(jnp.int32)
    nb = max(1, num_tiles // config.tile_batch)
    if num_tiles % config.tile_batch == 0 and num_tiles >= config.tile_batch:
        batched = tiles.reshape(nb, config.tile_batch)
        acc, T_run = jax.lax.map(jax.vmap(one), batched)
        acc = acc.reshape(num_tiles, *acc.shape[2:])
        T_run = T_run.reshape(num_tiles, *T_run.shape[2:])
    else:
        acc, T_run = jax.vmap(one)(tiles)
    inv = jnp.zeros((num_tiles,), jnp.int32).at[order].set(
        jnp.arange(num_tiles, dtype=jnp.int32)
    )
    acc = acc[inv]
    T_run = T_run[inv]

    out = acc + T_run[..., None] * settings.bg[None, None, :]
    # (num_tiles, P, C) -> (C, H, W)
    out = out.reshape(grid_y, grid_x, config.tile_y, config.tile_x, channels)
    out = out.transpose(4, 0, 2, 1, 3).reshape(
        channels, grid_y * config.tile_y, grid_x * config.tile_x
    )[:, :H, :W]
    T_img = T_run.reshape(grid_y, grid_x, config.tile_y, config.tile_x)
    T_img = T_img.transpose(0, 2, 1, 3).reshape(
        grid_y * config.tile_y, grid_x * config.tile_x
    )[:H, :W]
    return out, T_img


# --------------------------------------------------------------------------
# public API (mirrors diff_gaussian_rasterization/__init__.py)
# --------------------------------------------------------------------------


def rasterize_gaussians(
    means3d,
    opacities,
    settings: GaussianRasterizationSettings,
    scales=None,
    rotations=None,
    cov3d_precomp=None,
    shs=None,
    colors_precomp=None,
    valid_mask=None,
    config: RasterizeConfig = RasterizeConfig(),
    return_extra: bool = False,
):
    """Full rasterization: (color (C, H, W), radii (N,)).

    Exactly one of (shs, colors_precomp) and one of (scales+rotations,
    cov3d_precomp) must be provided (ref __init__.py:191-195).
    """
    if (shs is None) == (colors_precomp is None):
        raise ValueError(
            "Please provide exactly one of either SHs or precomputed colors!"
        )
    if (scales is None or rotations is None) == (cov3d_precomp is None):
        raise ValueError(
            "Please provide exactly one of either scale/rotation pair or "
            "precomputed 3D covariance!"
        )

    if config.impl == "stream":
        if jax.default_backend() == "cpu":
            # the Mosaic kernels only compile for TPU; CPU (tests, dev
            # boxes) silently uses the exact XLA path — identical
            # semantics, parity-tested in tests/test_stream.py and
            # tests/test_stream_vjp.py
            config = config._replace(impl="xla")
        elif config.differentiable:
            # training fast path: stream forward + back-to-front replay
            # backward (custom_vjp), replacing the statically-bounded
            # XLA scan — no max_chunks truncation, kernel-rate gradients
            from .rasterize_stream_vjp import (
                rasterize_gaussians_stream_diff,
            )

            return rasterize_gaussians_stream_diff(
                means3d, opacities, settings,
                scales=scales, rotations=rotations,
                cov3d_precomp=cov3d_precomp,
                shs=shs, colors_precomp=colors_precomp,
                valid_mask=valid_mask,
                config=config._replace(downscale=1),
                return_extra=return_extra,
            )
        else:
            from .rasterize_stream import rasterize_gaussians_stream

            return rasterize_gaussians_stream(
                means3d, opacities, settings,
                scales=scales, rotations=rotations,
                cov3d_precomp=cov3d_precomp,
                shs=shs, colors_precomp=colors_precomp,
                valid_mask=valid_mask,
                config=config, return_extra=return_extra,
            )

    H, W = settings.image_height, settings.image_width
    grid_x = -(-W // config.tile_x)
    grid_y = -(-H // config.tile_y)
    num_tiles = grid_x * grid_y

    prep = preprocess(
        means3d, opacities, settings, config,
        scales=scales, rotations=rotations, cov3d_precomp=cov3d_precomp,
        shs=shs, colors_precomp=colors_precomp, valid_mask=valid_mask,
    )
    sorted_gidx, starts, overflow = tile_bin(prep, num_tiles, grid_x, config)
    color, T_img = blend(prep, sorted_gidx, starts, settings, config)
    radii = prep.radius.astype(jnp.int32)
    if settings.debug:
        # reference debug mode: per-stage sync + invariant checks
        # (CHECK_CUDA / snapshot, auxiliary.h:166-173, dgr/__init__.py:83-90)
        from ..utils.debug import check_finite

        check_finite((prep.mean2d, prep.conic, color), name="rasterize")
    if return_extra:
        extra = {"final_T": T_img, "dup_overflow": overflow}
        if config.differentiable:
            # entries beyond the static scan bound are never blended and
            # never contribute gradients — report the truncation the same
            # way dup_overflow is reported (conservative: early-terminated
            # pixels may not have needed the tail anyway)
            counts = starts[1:] - starts[:-1]
            budget = config.max_chunks * config.chunk_size
            extra["grad_trunc"] = jnp.sum(jnp.maximum(counts - budget, 0))
        return color, radii, extra
    return color, radii


def mark_visible(means3d, viewmatrix, projmatrix):
    """Frustum visibility query (ref __init__.py:176-185)."""
    _, vis = splat.in_frustum(means3d, viewmatrix)
    return vis


class GaussianRasterizer:
    """Thin API-parity wrapper over ``rasterize_gaussians``
    (ref diff_gaussian_rasterization/__init__.py:171-220). ``means2D`` is
    accepted and ignored — JAX autodiff differentiates through the projected
    means directly, no gradient-carrier dummy is needed."""

    def __init__(self, raster_settings: GaussianRasterizationSettings,
                 config: RasterizeConfig = RasterizeConfig()):
        self.raster_settings = raster_settings
        self.config = config

    def markVisible(self, positions):
        s = self.raster_settings
        return mark_visible(positions, s.viewmatrix, s.projmatrix)

    def __call__(
        self, means3D, means2D=None, opacities=None, shs=None,
        colors_precomp=None, scales=None, rotations=None, cov3D_precomp=None,
        valid_mask=None,
    ):
        return rasterize_gaussians(
            means3D, opacities, self.raster_settings,
            scales=scales, rotations=rotations, cov3d_precomp=cov3D_precomp,
            shs=shs, colors_precomp=colors_precomp, valid_mask=valid_mask,
            config=self.config,
        )

    forward = __call__
