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


def _round_up(x, m):
    return -(-x // m) * m


# --------------------------------------------------------------------------
# binning: sort + one packed gather
# --------------------------------------------------------------------------


def bin_sorted_stream(
    prep: R.Preprocessed,
    num_tiles: int,
    grid_x: int,
    config: R.RasterizeConfig,
):
    """Duplicate -> (tile, depth) sort -> pack one row-major entry stream.

    Returns (stream (kb + chunk, ncols) f32, starts (num_tiles+1,) i32,
    overflow scalar i32). ``ncols`` = 8 scalar slots + channels padded to 8.
    Entry rows: [x, y, conic_x, conic_y, conic_z, opacity, 0, 0, feat...].
    """
    n = prep.depth.shape[0]
    cap = config.max_dup_per_gaussian
    ch = config.chunk_size
    k_full = n * cap
    kb = config.k_budget or k_full
    kb = min(_round_up(kb, ch), k_full)

    rmin_x, rmin_y = prep.rect[:, 0], prep.rect[:, 1]
    rw = jnp.maximum(prep.rect[:, 2] - rmin_x, 1)
    area_raw = (prep.rect[:, 2] - rmin_x) * (prep.rect[:, 3] - rmin_y)
    area = jnp.where(prep.valid, jnp.minimum(area_raw, cap), 0)
    overflow = jnp.sum(
        jnp.where(prep.valid, jnp.maximum(area_raw - cap, 0), 0)
    )

    # broadcast emission (no gathers): slot (g, k) -> tile id or sentinel
    k = jnp.arange(cap, dtype=jnp.int32)
    ty = rmin_y[:, None] + k[None, :] // rw[:, None]
    tx = rmin_x[:, None] + k[None, :] % rw[:, None]
    dup_valid = prep.valid[:, None] & (k[None, :] < area[:, None])
    tile_flat = jnp.where(
        dup_valid, ty * grid_x + tx, num_tiles
    ).astype(jnp.int32).reshape(-1)
    depth_flat = jnp.broadcast_to(prep.depth[:, None], (n, cap)).reshape(-1)
    gidx_flat = jnp.broadcast_to(
        jnp.arange(n, dtype=jnp.int32)[:, None], (n, cap)
    ).reshape(-1)

    sorted_tile, _, sorted_gidx = jax.lax.sort(
        (tile_flat, depth_flat, gidx_flat), num_keys=2
    )
    total = jnp.sum(area)
    overflow = overflow + jnp.maximum(total - kb, 0)

    starts = jnp.searchsorted(
        sorted_tile[:kb], jnp.arange(num_tiles + 1, dtype=jnp.int32),
        side="left",
    ).astype(jnp.int32)

    # ONE packed gather: every per-entry field the blend reads, row-major.
    # Rows are padded to 128 lanes — XLA pads HBM arrays handed to Pallas to
    # the (·,128) tiling anyway, and Mosaic requires DMA slices along the
    # lane dim to be 128-aligned.
    channels = prep.features.shape[-1]
    packed = jnp.concatenate(
        [
            prep.mean2d,
            prep.conic,
            prep.opacity[:, None],
            jnp.zeros((n, 2)),
            prep.features,
            jnp.zeros((n, 128 - 8 - channels)),
        ],
        axis=-1,
    ).astype(jnp.float32)
    packed = jnp.concatenate(
        [packed, jnp.zeros((1, packed.shape[1]), jnp.float32)], axis=0
    )  # sentinel row (opacity 0 -> inert)
    safe_gidx = jnp.where(
        jnp.arange(kb) < total, sorted_gidx[:kb], n
    ).astype(jnp.int32)
    stream = packed[safe_gidx]  # (kb, ncols) — THE gather
    stream = jnp.concatenate(
        [stream, jnp.zeros((ch, packed.shape[1]), jnp.float32)], axis=0
    )  # chunk of slack so kernel windows never run off the end
    return stream, starts, overflow


# --------------------------------------------------------------------------
# kernel
# --------------------------------------------------------------------------


def _stream_kernel(
    order_ref,  # scalar prefetch: (G,) i32 tile ids, actives first
    starts_ref,  # scalar prefetch: (num_tiles+1,) i32 entry offsets
    stream_hbm,  # (kb + chunk, ncols) f32, ANY (stays in HBM)
    out_ref,  # (1, c_out, P) f32 VMEM — rows [:C]=acc, row c_out-1 = T
    buf,  # VMEM scratch (2, chunk, ncols) — double buffer
    sems,  # DMA semaphores (2,)
    *,
    grid_x: int,
    tile_x: int,
    tile_y: int,
    chunk: int,
    ncols: int,
    c_out: int,
    channels: int,
):
    i = pl.program_id(0)
    p = tile_x * tile_y
    t = order_ref[i]
    s = starts_ref[t]
    e = starts_ref[t + 1]
    nch = (e - s + chunk - 1) // chunk

    colp = jax.lax.broadcasted_iota(jnp.int32, (1, p), 1)
    px = ((t % grid_x) * tile_x + colp % tile_x).astype(jnp.float32)
    py = ((t // grid_x) * tile_y + colp // tile_x).astype(jnp.float32)

    row = jax.lax.broadcasted_iota(jnp.int32, (chunk, 1), 0)
    sub = jax.lax.broadcasted_iota(jnp.int32, (chunk, 1), 0)

    def cumsum_sublanes(x):
        """Inclusive cumulative sum along the (gaussian) sublane axis via
        log2(chunk) shift-add passes — exact f32."""
        shift = 1
        while shift < chunk:
            rolled = pltpu.roll(x, shift, 0)
            x = x + jnp.where(sub >= shift, rolled, 0.0)
            shift *= 2
        return x

    def dma(slot, c):
        return pltpu.make_async_copy(
            stream_hbm.at[pl.ds(s + c * chunk, chunk), :],
            buf.at[slot],
            sems.at[slot],
        )

    @pl.when(nch > 0)
    def _():
        dma(0, 0).start()

    def body(c, state):
        T_run, acc, dead = state  # (1,P), (c_out,P), (1,P)
        slot = jax.lax.rem(c, 2)

        @pl.when(c + 1 < nch)
        def _():
            dma(jax.lax.rem(c + 1, 2), c + 1).start()

        dma(slot, c).wait()

        def live_fn(state):
            T_run, acc, dead = state
            b = buf[slot]  # (chunk, ncols)
            x = b[:, 0:1]
            y = b[:, 1:2]
            con_x = b[:, 2:3]
            con_y = b[:, 3:4]
            con_z = b[:, 4:5]
            op = b[:, 5:6]

            in_r = (s + c * chunk + row) < e  # rows past e: other tiles
            dx = x - px  # (chunk, P)
            dy = y - py
            power = (
                -0.5 * (con_x * dx * dx + con_z * dy * dy) - con_y * dx * dy
            )
            alpha = jnp.minimum(0.99, op * jnp.exp(power))
            a = jnp.where(
                (power > 0.0) | (alpha < (1.0 / 255.0)) | (~in_r), 0.0, alpha
            )
            logom = jnp.log1p(-a)  # 1-a >= 0.01
            cum = cumsum_sublanes(logom)
            T_incl = T_run * jnp.exp(cum)  # (chunk, P)
            T_excl = T_run * jnp.exp(cum - logom)
            crossed = (T_incl < 1e-4).astype(jnp.float32)
            crossed_before = cumsum_sublanes(crossed) - crossed
            applied = (
                (dead == 0.0) & (crossed_before == 0.0) & (crossed == 0.0)
            )
            w = a * T_excl * applied  # (chunk, P)
            feat = b[:, 8 : 8 + c_out]  # (chunk, c_out); pad cols are zero
            acc = acc + jax.lax.dot_general(
                feat, w, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST,
            )  # (c_out, P)
            T_run = T_run * jnp.exp(
                jnp.sum(jnp.where(applied, logom, 0.0), axis=0, keepdims=True)
            )
            any_crossed = (
                jnp.max(
                    crossed + crossed_before, axis=0, keepdims=True
                ) > 0
            ).astype(jnp.float32)
            dead = jnp.maximum(dead, any_crossed)
            return (T_run, acc, dead)

        alive = jnp.sum(1.0 - dead) > 0
        return jax.lax.cond(alive, live_fn, lambda st: st, state)

    T0 = jnp.ones((1, p), jnp.float32)
    acc0 = jnp.zeros((c_out, p), jnp.float32)
    dead0 = jnp.zeros((1, p), jnp.float32)
    T_run, acc, _ = jax.lax.fori_loop(0, nch, body, (T0, acc0, dead0))
    out_ref[0] = acc
    out_ref[0, c_out - 1 : c_out, :] = T_run


# --------------------------------------------------------------------------
# host-side wrapper
# --------------------------------------------------------------------------


@functools.partial(
    jax.jit,
    static_argnames=("num_tiles", "grid_x", "config", "channels", "interpret"),
)
def blend_stream(
    prep: R.Preprocessed,
    bg: jnp.ndarray,  # (C,)
    num_tiles: int,
    grid_x: int,
    config: R.RasterizeConfig,
    channels: int,
    interpret: bool = False,
):
    """Bin + blend with the streaming kernel.

    Returns (out (num_tiles, P, C), final_T (num_tiles, P), overflow).
    """
    p = config.tile_x * config.tile_y
    ch = config.chunk_size
    c_out = _round_up(channels + 1, 8)  # acc channels + final-T row

    stream, starts, overflow = bin_sorted_stream(
        prep, num_tiles, grid_x, config
    )
    ncols = stream.shape[1]

    counts = starts[1:] - starts[:-1]
    order = jnp.argsort(-counts).astype(jnp.int32)
    n_grid = min(config.max_active_tiles or num_tiles, num_tiles)
    if n_grid < num_tiles:
        # tiles beyond the grid budget never render: count as overflow
        overflow = overflow + jnp.sum(counts[order[n_grid:]])
    order_g = order[:n_grid]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(n_grid,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=pl.BlockSpec(
            (1, c_out, p), lambda i, *_: (i, 0, 0), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[
            pltpu.VMEM((2, ch, ncols), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
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
    )
    out_o = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_grid, c_out, p), jnp.float32),
        interpret=interpret,
    )(order_g, starts, stream)

    # order space -> tile space; uncovered tiles get acc=0, T=1
    if n_grid < num_tiles:
        base = jnp.zeros((num_tiles, c_out, p), jnp.float32)
        base = base.at[:, c_out - 1, :].set(1.0)
        out_t = base.at[order_g].set(out_o)
    else:
        out_t = jnp.zeros((num_tiles, c_out, p), jnp.float32).at[order_g].set(
            out_o
        )
    t_run = out_t[:, c_out - 1, :]  # (num_tiles, P)
    acc = out_t[:, :channels, :].transpose(0, 2, 1)  # (num_tiles, P, C)
    out = acc + t_run[..., None] * bg[None, None, :]
    return out, t_run, overflow


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
    out, t_run, overflow = blend_stream(
        prep, settings.bg, num_tiles, grid_x, config, channels,
        interpret=interpret,
    )
    from .rasterize_pallas import assemble_tiles

    color, t_img = assemble_tiles(out, t_run, H, W, config)
    radii = prep.radius.astype(jnp.int32)
    if return_extra:
        return color, radii, {"final_T": t_img, "dup_overflow": overflow}
    return color, radii
