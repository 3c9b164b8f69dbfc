"""Pallas TPU blend kernel — the fast path for tile compositing.

The XLA blend (ops/rasterize.py) vectorizes tiles with vmapped while_loops,
which run in lockstep across a tile batch: a batch's cost is its HEAVIEST
tile times the whole batch. This kernel walks tiles with a Pallas grid, so
every tile pays exactly its own chunk count, and all state (T, accumulator,
dead mask) stays in VMEM for the tile's lifetime.

Semantics are identical to the reference CUDA renderCUDA (forward.cu:264-377)
and to ops/rasterize._blend_chunk. The sequential per-pixel transmittance
recurrence is evaluated as a lower-triangular matmul cumulative-sum in log
space (an MXU-friendly closed form of the scan).

Memory layout (chosen for Mosaic's tiling rules — no narrow lane slices):
- binning produces CHUNK-ALIGNED per-tile ranges (``tile_bin_aligned``):
  each tile's entries start at a multiple of the chunk size, so every
  kernel read is a full aligned block;
- per-entry scalars are stacked as ``scal6 (6, Kc, CH)`` (x, y, conic_x,
  conic_y, conic_z, opacity) and features as ``featT (Cpad, Kc, CH)`` —
  leading-dim indexing only, (…, CH) lanes dense;
- the per-chunk math runs in the (P pixels = sublanes, CH gaussians =
  lanes) orientation, ending in one (P, CH)x(Cpad, CH) contraction.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import rasterize as R


def _round_up(x, m):
    return -(-x // m) * m


# --------------------------------------------------------------------------
# chunk-aligned binning
# --------------------------------------------------------------------------


def tile_bin_aligned(prep: R.Preprocessed, num_tiles: int, grid_x: int,
                     config: R.RasterizeConfig, c_pad: int):
    """Sort duplications by (tile, depth) and lay them out chunk-aligned.

    Returns (scal6 (6, Kc, CH), featT (c_pad, Kc, CH),
             chunk_starts (num_tiles+1,) int32 in chunk units, overflow).
    """
    ch = config.chunk_size
    n = prep.depth.shape[0]
    # tile_bin applies config.k_budget itself (compacted binning)
    sorted_gidx, starts, overflow = R.tile_bin(prep, num_tiles, grid_x, config)
    k_sorted = sorted_gidx.shape[0] - config.chunk_size

    counts = starts[1:] - starts[:-1]
    cpad = ((counts + ch - 1) // ch) * ch
    astarts = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32), jnp.cumsum(cpad).astype(jnp.int32)]
    )
    max_active = (
        num_tiles if config.max_active_tiles is None else config.max_active_tiles
    )
    k_static = _round_up(k_sorted + max_active * ch, ch)
    overflow = overflow + jnp.maximum(astarts[-1] - k_static, 0)
    astarts = jnp.minimum(astarts, k_static)

    # tile id of every aligned slot: scatter tile-start markers, cumsum
    marks = jnp.zeros((k_static + 1,), jnp.int32).at[astarts[:-1]].add(1)
    tile_of_slot = jnp.cumsum(marks[:k_static]) - 1
    tile_of_slot = jnp.clip(tile_of_slot, 0, num_tiles - 1)
    slot = jnp.arange(k_static, dtype=jnp.int32)
    j = slot - astarts[tile_of_slot]
    src = jnp.clip(starts[tile_of_slot] + j, 0, k_sorted - 1)
    slot_valid = j < counts[tile_of_slot]
    entry = jnp.where(slot_valid, sorted_gidx[src], n)  # n = sentinel row

    scal_src = jnp.stack(
        [
            prep.mean2d[:, 0], prep.mean2d[:, 1],
            prep.conic[:, 0], prep.conic[:, 1], prep.conic[:, 2],
            prep.opacity,
        ],
        axis=0,
    )
    scal_src = jnp.concatenate([scal_src, jnp.zeros((6, 1))], axis=1)
    # chunk index leading; field dim padded to 8 (Mosaic DMA tiling)
    scal6 = scal_src[:, entry].reshape(6, k_static // ch, ch)
    scal6 = jnp.concatenate(
        [scal6, jnp.zeros((2, k_static // ch, ch))], axis=0
    ).transpose(1, 0, 2)

    channels = prep.features.shape[-1]
    feat_pad = jnp.concatenate(
        [prep.features, jnp.zeros((1, channels))], axis=0
    )
    featT = feat_pad[entry].T  # (C, k_static)
    if c_pad > channels:
        featT = jnp.concatenate(
            [featT, jnp.zeros((c_pad - channels, k_static))], axis=0
        )
    featT = featT.reshape(c_pad, k_static // ch, ch).transpose(1, 0, 2)

    chunk_starts = (astarts // ch).astype(jnp.int32)
    return scal6, featT, chunk_starts, overflow


# --------------------------------------------------------------------------
# kernel
# --------------------------------------------------------------------------


def _blend_kernel(
    cstarts_ref,  # scalar prefetch: (num_tiles+1,) int32 (chunk units)
    scal_hbm,  # (Kc, 6, CH) f32 in ANY
    feat_hbm,  # (Kc, Cpad, CH) f32 in ANY
    out_ref,  # (1, P, Cpad) f32 VMEM
    t_ref,  # (1, 8, P) f32 VMEM (row 0 meaningful)
    scal_buf,  # VMEM scratch (1, 8, CH)
    feat_buf,  # VMEM scratch (1, Cpad, CH)
    sems,  # DMA semaphores (2,)
    *,
    grid_x: int,
    tile_x: int,
    tile_y: int,
    chunk: int,
    c_pad: int,
):
    i = pl.program_id(0)
    p = tile_x * tile_y
    c0 = cstarts_ref[i]
    c1 = cstarts_ref[i + 1]

    tx = (i % grid_x).astype(jnp.float32)
    ty = (i // grid_x).astype(jnp.float32)
    rowp = jax.lax.broadcasted_iota(jnp.int32, (p, 1), 0)
    px = tx * tile_x + jnp.mod(rowp, tile_x).astype(jnp.float32)  # (P, 1)
    py = ty * tile_y + (rowp // tile_x).astype(jnp.float32)

    lane = jax.lax.broadcasted_iota(jnp.int32, (p, chunk), 1)

    def cumsum_lanes(x):
        """Inclusive cumulative sum along the lane (gaussian) axis via
        log2(chunk) shift-add passes — exact f32, no MXU involvement."""
        shift = 1
        while shift < chunk:
            rolled = pltpu.roll(x, shift, 1)
            x = x + jnp.where(lane >= shift, rolled, 0.0)
            shift *= 2
        return x

    def body(c, state):
        T_run, acc, dead = state  # (P,1), (P,Cpad), (P,1)

        def live_fn(state):
            T_run, acc, dead = state
            d1 = pltpu.make_async_copy(
                scal_hbm.at[pl.ds(c0 + c, 1)], scal_buf, sems.at[0]
            )
            d2 = pltpu.make_async_copy(
                feat_hbm.at[pl.ds(c0 + c, 1)], feat_buf, sems.at[1]
            )
            d1.start()
            d2.start()
            d1.wait()
            d2.wait()

            xy_x = scal_buf[0, 0:1, :]  # (1, CH)
            xy_y = scal_buf[0, 1:2, :]
            con_x = scal_buf[0, 2:3, :]
            con_y = scal_buf[0, 3:4, :]
            con_z = scal_buf[0, 4:5, :]
            op = scal_buf[0, 5:6, :]

            dx = xy_x - px  # (P, CH)
            dy = xy_y - py
            power = -0.5 * (con_x * dx * dx + con_z * dy * dy) - con_y * dx * dy
            alpha = jnp.minimum(0.99, op * jnp.exp(power))
            # sentinel entries carry opacity 0 -> alpha 0
            a = jnp.where((power > 0.0) | (alpha < (1.0 / 255.0)), 0.0, alpha)
            om = 1.0 - a
            logom = jnp.log(om)  # om >= 0.01
            cum_incl = cumsum_lanes(logom)
            T_incl = T_run * jnp.exp(cum_incl)
            T_excl = T_incl / om
            crossed = (T_incl < 1e-4).astype(jnp.float32)
            crossed_before = cumsum_lanes(crossed) - crossed
            applied = (
                (dead == 0.0) & (crossed_before == 0.0) & (crossed == 0.0)
            )
            w = a * T_excl * applied  # (P, CH)
            feat = feat_buf[0]  # (Cpad, CH)
            acc = acc + jax.lax.dot_general(
                w, feat, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST,
            )  # (P, Cpad)
            T_run = T_run * jnp.exp(
                jnp.sum(jnp.where(applied, logom, 0.0), axis=1, keepdims=True)
            )
            any_crossed = (
                jnp.max(crossed + crossed_before, axis=1, keepdims=True) > 0
            ).astype(jnp.float32)
            dead = jnp.maximum(dead, any_crossed)
            return (T_run, acc, dead)

        alive = jnp.sum(1.0 - state[2]) > 0
        return jax.lax.cond(alive, live_fn, lambda s: s, state)

    out_ref[0] = jnp.zeros((p, c_pad), jnp.float32)
    t_ref[0] = jnp.ones((1, 8, p), jnp.float32)[0]

    @pl.when(c1 > c0)
    def _():
        T0 = jnp.ones((p, 1), jnp.float32)
        acc0 = jnp.zeros((p, c_pad), jnp.float32)
        dead0 = jnp.zeros((p, 1), jnp.float32)
        T_run, acc, _ = jax.lax.fori_loop(
            0, c1 - c0, body, (T0, acc0, dead0)
        )
        out_ref[0] = acc
        t_ref[0] = jnp.broadcast_to(T_run[:, 0][None, :], (8, p))


# --------------------------------------------------------------------------
# host-side wrappers
# --------------------------------------------------------------------------


@functools.partial(
    jax.jit,
    static_argnames=("num_tiles", "grid_x", "config", "channels", "interpret"),
)
def blend_pallas(
    prep: R.Preprocessed,
    bg: jnp.ndarray,  # (C,)
    num_tiles: int,
    grid_x: int,
    config: R.RasterizeConfig,
    channels: int,
    interpret: bool = False,
):
    """Bin (chunk-aligned) + blend all tiles with the Pallas kernel.

    Returns (out (num_tiles, P, C), final_T (num_tiles, P)).
    """
    p = config.tile_x * config.tile_y
    ch = config.chunk_size
    c_pad = max(8, _round_up(channels, 8))

    scal6, featT, chunk_starts, _ = tile_bin_aligned(
        prep, num_tiles, grid_x, config, c_pad
    )

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(num_tiles,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=[
            pl.BlockSpec((1, p, c_pad), lambda i, *_: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, p), lambda i, *_: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[
            pltpu.VMEM((1, 8, ch), jnp.float32),
            pltpu.VMEM((1, c_pad, ch), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    kernel = functools.partial(
        _blend_kernel,
        grid_x=grid_x,
        tile_x=config.tile_x,
        tile_y=config.tile_y,
        chunk=ch,
        c_pad=c_pad,
    )
    out, t_run = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((num_tiles, p, c_pad), jnp.float32),
            jax.ShapeDtypeStruct((num_tiles, 8, p), jnp.float32),
        ],
        interpret=interpret,
    )(chunk_starts, scal6, featT)
    t_run = t_run[:, 0, :]
    out = out[..., :channels] + t_run[..., None] * bg[None, None, :]
    return out, t_run


def assemble_tiles(out, t_run, H, W, config: R.RasterizeConfig):
    """(num_tiles, P, C) -> (C, H, W), (H, W)."""
    grid_x = -(-W // config.tile_x)
    grid_y = -(-H // config.tile_y)
    channels = out.shape[-1]
    img = out.reshape(grid_y, grid_x, config.tile_y, config.tile_x, channels)
    img = img.transpose(4, 0, 2, 1, 3).reshape(
        channels, grid_y * config.tile_y, grid_x * config.tile_x
    )[:, :H, :W]
    t = t_run.reshape(grid_y, grid_x, config.tile_y, config.tile_x)
    t = t.transpose(0, 2, 1, 3).reshape(
        grid_y * config.tile_y, grid_x * config.tile_x
    )[:H, :W]
    return img, t


def rasterize_gaussians_pallas(
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
    out, t_run = blend_pallas(
        prep, settings.bg, num_tiles, grid_x, config, channels,
        interpret=interpret,
    )
    color, _ = assemble_tiles(out, t_run, H, W, config)
    return color, prep.radius.astype(jnp.int32)


# --------------------------------------------------------------------------
# flat-chunk two-phase blend (XLA fast path, no pallas)
# --------------------------------------------------------------------------


def blend_flat(
    prep: R.Preprocessed,
    bg: jnp.ndarray,
    num_tiles: int,
    grid_x: int,
    config: R.RasterizeConfig,
    channels: int,
):
    """Two-phase compositing over the chunk-aligned layout.

    Phase 1 evaluates every chunk INDEPENDENTLY (local exclusive
    transmittance via a lower-triangular matmul, weights x features on the
    MXU) — perfectly parallel, no per-tile sequential loop, no lockstep
    waste. Phase 2 stitches chunks per tile: the true incoming transmittance
    scales each chunk's color linearly, computed with a per-tile prefix sum
    of the chunks' log-transmittance totals.

    Semantics: identical to the exact path EXCEPT the T<1e-4 early
    termination applies at chunk granularity (the chunk containing the
    crossing composites fully). The deviation is bounded by the remaining
    transmittance (<1e-4 of feature scale) — negligible against the 0.05 dB
    parity budget, but use ops.rasterize.blend when bit-level CUDA-ordering
    equivalence matters.

    Returns (out (num_tiles, P, C), final_T (num_tiles, P)).
    """
    p = config.tile_x * config.tile_y
    ch = config.chunk_size
    c_pad = max(8, _round_up(channels, 8))

    scal6, featT, chunk_starts, _ = tile_bin_aligned(
        prep, num_tiles, grid_x, config, c_pad
    )
    kc = scal6.shape[0]  # number of chunk blocks (static)

    # block -> tile mapping (chunk_starts are in chunk units, ascending)
    marks = jnp.zeros((kc + 1,), jnp.int32).at[chunk_starts[:-1]].add(1)
    tile_of_block = jnp.clip(jnp.cumsum(marks[:kc]) - 1, 0, num_tiles - 1)
    block_valid = (
        jnp.arange(kc, dtype=jnp.int32) < chunk_starts[-1]
    )

    # pixel coordinates per block
    tx = (tile_of_block % grid_x).astype(jnp.float32)
    ty = (tile_of_block // grid_x).astype(jnp.float32)
    lane = jnp.arange(p, dtype=jnp.float32)
    px = tx[:, None] * config.tile_x + jnp.mod(lane, config.tile_x)[None, :]
    py = ty[:, None] * config.tile_y + jnp.floor(
        lane / config.tile_x
    )[None, :]

    # phase 1: per-block local compositing (all blocks in parallel)
    xy_x = scal6[:, 0, :, None]  # (Kc, CH, 1)
    xy_y = scal6[:, 1, :, None]
    con_x = scal6[:, 2, :, None]
    con_y = scal6[:, 3, :, None]
    con_z = scal6[:, 4, :, None]
    op = scal6[:, 5, :, None]

    dx = xy_x - px[:, None, :]  # (Kc, CH, P)
    dy = xy_y - py[:, None, :]
    power = -0.5 * (con_x * dx * dx + con_z * dy * dy) - con_y * dx * dy
    alpha = jnp.minimum(0.99, op * jnp.exp(power))
    a = jnp.where((power > 0.0) | (alpha < (1.0 / 255.0)), 0.0, alpha)
    logom = jnp.log1p(-a)  # om >= 0.01

    # exclusive local cumsum along the gaussian axis: strictly-lower tri
    gi = jax.lax.broadcasted_iota(jnp.int32, (ch, ch), 0)
    gj = jax.lax.broadcasted_iota(jnp.int32, (ch, ch), 1)
    # cum_excl[k, g, p] = sum_{g' < g} logom[k, g', p]
    cum_excl = jnp.einsum(
        "gh,khp->kgp", (gj < gi).astype(jnp.float32), logom,
        precision=jax.lax.Precision.HIGHEST,
    )
    w_local = a * jnp.exp(cum_excl)  # (Kc, CH, P) local exclusive weights
    cc = jnp.einsum(
        "kgp,kgc->kpc", w_local, featT.transpose(0, 2, 1)[..., :channels],
        precision=jax.lax.Precision.HIGHEST,
    )  # (Kc, P, C)
    lc = jnp.sum(logom, axis=1)  # (Kc, P) log-transmittance of the block

    # phase 2: per-tile prefix of log-transmittance over blocks
    lc_m = jnp.where(block_valid[:, None], lc, 0.0)
    cumsum_incl = jnp.cumsum(lc_m, axis=0)
    cumsum_excl = cumsum_incl - lc_m
    base = jnp.concatenate(
        [jnp.zeros((1, p)), cumsum_incl], axis=0
    )[chunk_starts[:-1]]  # (num_tiles, P) cumsum before each tile's blocks
    log_t_in = cumsum_excl - base[tile_of_block]  # (Kc, P)
    t_in = jnp.exp(log_t_in)
    include = block_valid[:, None] & (t_in >= 1e-4)
    contrib = jnp.where(include[..., None], t_in[..., None] * cc, 0.0)
    out = jax.ops.segment_sum(contrib, tile_of_block, num_segments=num_tiles)
    t_total = jax.ops.segment_sum(
        jnp.where(include, lc_m, 0.0), tile_of_block, num_segments=num_tiles
    )
    t_run = jnp.exp(t_total)
    out = out + t_run[..., None] * bg[None, None, :]
    return out, t_run


def rasterize_gaussians_flat(
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
):
    """Fast-path rasterization with the flat-chunk blend."""
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
    out, t_run = blend_flat(
        prep, settings.bg, num_tiles, grid_x, config, channels
    )
    color, _ = assemble_tiles(out, t_run, H, W, config)
    return color, prep.radius.astype(jnp.int32)
