"""custom_vjp fast backward for the streaming rasterizer.

The reference trains through a hand-written CUDA backward that replays
each tile's sorted entry range BACK-TO-FRONT from the stored final
transmittance (diff-gaussian-rasterization/cuda_rasterizer/backward.cu:
399-557), instead of storing per-entry forward state. This module is the
TPU-native equivalent:

- forward = the production streaming kernel (ops/rasterize_stream.py)
  extended with a per-pixel contributor count (the reference's
  ``last_contributor``, forward.cu:338,358; backward.cu:431), wrapped in
  ``jax.custom_vjp`` at the bin+blend boundary so JAX autodiff handles
  preprocess (EWA/SH/quat) on both sides for free;
- backward = a second Pallas kernel over the SAME sorted stream that
  walks each tile's chunks in reverse, rebuilding per-entry
  transmittance T_excl_i = T_below * suffixprod(1/om) via shift scans
  (backward.cu:442-460 does the same divides serially) and the
  behind-color inner product B_i as a suffix sum (accum_rec,
  backward.cu:469-480), then writes one packed GRADIENT ROW per entry:

      [dmean2d.x, dmean2d.y, dconic.x, dconic.y, dconic.z, dopacity,
       0, 0, dfeat..., 0-pad]

  Chunks are written back FULL-WIDTH; rows past a tile's range compute
  exactly zero (their replay mask forces a=0), and tiles are processed
  in ascending entry order so any zero spill into a later tile's range
  is overwritten by that tile's own step. Rows belonging to no rendered
  tile are masked in the epilogue (Pallas output HBM is uninitialized).
- epilogue = one masked scatter-add reduces entry-gradient rows to
  per-gaussian gradients (the reference's atomicAdd per thread,
  backward.cu:482-528, batched into a single XLA scatter).

Gradient semantics match the in-repo XLA autodiff path exactly (and the
reference except one knowingly-different case): no gradient through the
1/255 skip, the power>0 skip, entries past the per-pixel contributor
count, or the depth ordering (zero a.e.). At the 0.99 alpha clamp this
implementation follows jnp.minimum (zero gradient on the clamped
branch, matching our XLA/autodiff oracle); the reference's backward.cu
ignores the clamp when computing dG — a gradient the forward value
provably does not have.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import rasterize as R
from . import rasterize_stream as S


def _round_up(x, m):
    return -(-x // m) * m


# --------------------------------------------------------------------------
# backward kernel
# --------------------------------------------------------------------------


def _bwd_kernel(
    order_ref,   # scalar prefetch: (G,) i32 rendered tiles, ASCENDING id
    starts_ref,  # scalar prefetch: (num_tiles+2,) i32 entry offsets
    stream_hbm,  # (kb + chunk, ncols) f32 — the forward entry stream
    dout_ref,    # (tps, cpad, P) f32 VMEM — per-tile upstream block:
                 #   rows [0:C] dL/dout, [C] n_contrib, [C+1] dT_tot,
                 #   [C+2] final_T
    grads_hbm,   # OUT (kb + chunk, ncols) f32 — per-entry grad rows
    buf,         # VMEM scratch (2, chunk, ncols) in-stream double buffer
    gbuf,        # VMEM scratch (chunk, ncols) grad staging
    sems,        # DMA semaphores (2,)
    osem,        # DMA semaphore for grad writes
    *,
    grid_x: int,
    tile_x: int,
    tile_y: int,
    chunk: int,
    ncols: int,
    channels: int,
    tps: int,
):
    i = pl.program_id(0)
    p = tile_x * tile_y

    row = jax.lax.broadcasted_iota(jnp.int32, (chunk, 1), 0)
    sub = jax.lax.broadcasted_iota(jnp.int32, (chunk, 1), 0)
    colp = jax.lax.broadcasted_iota(jnp.int32, (1, p), 1)
    colc = jax.lax.broadcasted_iota(jnp.int32, (chunk, ncols), 1)

    two_level = S._SCAN_MODE == "two" and chunk % 8 == 0 and chunk >= 16

    def _suffix_scan(x, combine, unit):
        """Inclusive suffix scan along sublanes: s_i = ⊕_{k>=i} x_k.

        Two-level mode mirrors the forward kernel's cumprod_sublanes:
        in-vreg 8-sublane suffix scan (3 steps), then a suffix scan of
        the per-group totals on a (chunk/8, P) array, broadcast back as
        exclusive group suffixes — ~13 VPU ops/element vs ~24 flat.
        """
        if two_level:
            G = chunk // 8
            x3 = x.reshape(G, 8, p)
            s8 = jax.lax.broadcasted_iota(jnp.int32, (1, 8, 1), 1)
            for sh in (1, 2, 4):
                x3 = combine(
                    x3,
                    jnp.where(s8 < 8 - sh, pltpu.roll(x3, 8 - sh, 1), unit),
                )
            g = x3[:, 0, :]  # (G, P) per-group totals (suffix from row 0)
            gi = jax.lax.broadcasted_iota(jnp.int32, (G, 1), 0)
            sh = 1
            while sh < G:
                g = combine(
                    g, jnp.where(gi < G - sh, pltpu.roll(g, G - sh, 0), unit)
                )
                sh *= 2
            # exclusive group suffix (groups strictly after gi)
            ge = jnp.where(gi < G - 1, pltpu.roll(g, G - 1, 0), unit)
            return combine(x3, ge[:, None, :]).reshape(chunk, p)
        shift = 1
        while shift < chunk:
            rolled = pltpu.roll(x, chunk - shift, 0)
            x = combine(x, jnp.where(sub < chunk - shift, rolled, unit))
            shift *= 2
        return x

    def suffix_prod(x):
        """Inclusive suffix product along sublanes: sp_i = prod_{k>=i}."""
        return _suffix_scan(x, jnp.multiply, 1.0)

    def suffix_sum_excl(x):
        """Exclusive suffix sum along sublanes: s_i = sum_{k>i}."""
        x = jnp.where(sub < chunk - 1, pltpu.roll(x, chunk - 1, 0), 0.0)
        return _suffix_scan(x, jnp.add, 0.0)

    for j in range(tps):
        t = order_ref[i * tps + j]
        s = starts_ref[t]
        e = starts_ref[t + 1]

        px = ((t % grid_x) * tile_x + colp % tile_x).astype(jnp.float32)
        py = ((t // grid_x) * tile_y + colp // tile_x).astype(jnp.float32)

        dL = dout_ref[j, :channels, :]                       # (C, P)
        nc = dout_ref[j, channels : channels + 1, :]         # (1, P)
        dT_tot = dout_ref[j, channels + 1 : channels + 2, :]
        T_fin = dout_ref[j, channels + 2 : channels + 3, :]

        # entries past every pixel's contributor count have a == 0 and
        # leave the replay state unchanged — clamp the chunk walk to the
        # furthest contributor (the early-termination saving, mirrored)
        nch = (e - s + chunk - 1) // chunk
        nch_c = (jnp.max(nc).astype(jnp.int32) + chunk - 1) // chunk
        nch = jnp.minimum(nch, nch_c)

        def dma_in(slot, c, s=s):
            return pltpu.make_async_copy(
                stream_hbm.at[pl.ds(s + c * chunk, chunk), :],
                buf.at[slot],
                sems.at[slot],
            )

        @pl.when(nch > 0)
        def _():
            dma_in(0, jnp.maximum(nch - 1, 0)).start()

        def body(cc, state, s=s, e=e, nch=nch, dma_in=dma_in,
                 dL=dL, nc=nc, dT_tot=dT_tot, px=px, py=py):
            # carried suffix state across chunks (walking back-to-front):
            #   T_out (1,P): T_excl of the entry just AFTER this chunk
            #   B_out (1,P): suffix sum of a*T_excl*G after this chunk
            T_out, B_out = state
            c = nch - 1 - cc
            slot = jax.lax.rem(cc, 2)

            @pl.when(cc + 1 < nch)
            def _():
                dma_in(jax.lax.rem(cc + 1, 2), c - 1).start()

            dma_in(slot, c).wait()

            b = buf[slot]  # (chunk, ncols)
            x = b[:, 0:1]
            y = b[:, 1:2]
            con_x = b[:, 2:3]
            con_y = b[:, 3:4]
            con_z = b[:, 4:5]
            op = b[:, 5:6]

            pos = s + c * chunk + row
            in_r = pos < e
            dx = x - px
            dy = y - py
            power = (
                -0.5 * (con_x * dx * dx + con_z * dy * dy)
                - con_y * dx * dy
            )
            gauss = jnp.exp(power)
            alpha_raw = op * gauss
            alpha = jnp.minimum(0.99, alpha_raw)
            # replay mask: entry index within the tile must be below the
            # pixel's contributor count (termination replay) and in range
            contrib = ((pos - s).astype(jnp.float32) < nc) & in_r
            a = jnp.where(
                (power > 0.0) | (alpha < (1.0 / 255.0)) | (~contrib),
                0.0, alpha,
            )
            om = 1.0 - a
            r_om = 1.0 / om                   # om >= 0.01 where a > 0
            # T_excl_i = T_out * prod_{k>=i in chunk} (1/om_k)
            sp = suffix_prod(r_om)
            T_excl = T_out * sp               # (chunk, P)

            feat = b[:, 8 : 8 + channels]     # (chunk, C)
            G = jax.lax.dot_general(
                feat, dL, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST,
            )                                 # (chunk, P)

            contr = a * T_excl * G
            B = B_out + suffix_sum_excl(contr)  # (chunk, P)

            live = a > 0.0
            dL_da = jnp.where(live, T_excl * G - B * r_om, 0.0)
            # jnp.minimum semantics: clamped entries get no power/op grad
            unclamped = live & (alpha_raw < 0.99)
            dpow = jnp.where(unclamped, dL_da * a, 0.0)
            dop_px = jnp.where(unclamped, dL_da * gauss, 0.0)

            dmx = jnp.sum(-dpow * (con_x * dx + con_y * dy),
                          axis=1, keepdims=True)
            dmy = jnp.sum(-dpow * (con_z * dy + con_y * dx),
                          axis=1, keepdims=True)
            dcx = jnp.sum(-0.5 * dpow * dx * dx, axis=1, keepdims=True)
            dcy = jnp.sum(-dpow * dx * dy, axis=1, keepdims=True)
            dcz = jnp.sum(-0.5 * dpow * dy * dy, axis=1, keepdims=True)
            dop = jnp.sum(dop_px, axis=1, keepdims=True)

            w = a * T_excl
            dfeat = jax.lax.dot_general(
                w, dL, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST,
            )                                 # (chunk, C)

            grow = jnp.where(colc == 0, dmx, 0.0)
            grow = jnp.where(colc == 1, dmy, grow)
            grow = jnp.where(colc == 2, dcx, grow)
            grow = jnp.where(colc == 3, dcy, grow)
            grow = jnp.where(colc == 4, dcz, grow)
            grow = jnp.where(colc == 5, dop, grow)
            fpad = jnp.pad(dfeat, ((0, 0), (8, ncols - 8 - channels)))
            grow = grow + jnp.where(
                (colc >= 8) & (colc < 8 + channels), fpad, 0.0)
            gbuf[:, :] = grow

            # full-chunk write: rows past e computed a=0 -> zero rows;
            # ascending tile order makes later tiles overwrite any spill
            cp = pltpu.make_async_copy(
                gbuf, grads_hbm.at[pl.ds(s + c * chunk, chunk), :], osem)
            cp.start()
            cp.wait()

            T_out = T_out * sp[0:1, :]
            B_out = B_out + jnp.sum(contr, axis=0, keepdims=True)
            return (T_out, B_out)

        jax.lax.fori_loop(0, nch, body, (T_fin, T_fin * dT_tot))


# --------------------------------------------------------------------------
# custom_vjp core (bin + blend; preprocess stays autodiff)
# --------------------------------------------------------------------------


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1, 2, 3, 4))
def _blend_core(num_tiles, grid_x, config, channels, interpret, diff, aux):
    """diff: dict(mean2d, conic, opacity, features, bg) — differentiable.
    aux: dict(depth, rect_f, valid_f) — float-cast, zero-gradient.
    Returns (out (num_tiles, P, C), t_run (num_tiles, P), overflow)."""
    out, t_run, ovf, _ = _fwd_impl(
        num_tiles, grid_x, config, channels, interpret, diff, aux)
    return out, t_run, ovf


def _make_prep(diff, aux):
    mean2d = diff["mean2d"]
    n = mean2d.shape[0]
    return R.Preprocessed(
        valid=aux["valid_f"] > 0.5,
        depth=aux["depth"],
        mean2d=mean2d,
        conic=diff["conic"],
        radius=jnp.zeros((n,), jnp.float32),
        rect=aux["rect_f"].astype(jnp.int32),
        features=diff["features"].astype(jnp.float32),
        opacity=diff["opacity"],
    )


def _fwd_impl(num_tiles, grid_x, config, channels, interpret, diff, aux):
    if config.downscale != 1:
        raise NotImplementedError(
            "the training path renders at native resolution (downscale=1) "
            "like the reference; resize outside the rasterizer")
    p = config.tile_x * config.tile_y
    ch = config.chunk_size
    c_out = _round_up(channels + 2, 8)  # acc + n_contrib + final-T rows

    prep = _make_prep(diff, aux)
    stream, starts, overflow, win_drop, sorted_g, g_map = S.bin_sorted_stream(
        prep, num_tiles, grid_x, config, return_entries=True)
    overflow = overflow + win_drop  # training path: conservative combined count
    ncols = stream.shape[1]

    counts = starts[1:] - starts[:-1]
    order = jnp.argsort(-counts).astype(jnp.int32)
    n_grid = min(config.max_active_tiles or num_tiles, num_tiles)
    if n_grid < num_tiles:
        overflow = overflow + jnp.sum(counts[order[n_grid:]])
    tps = max(1, config.tiles_per_step)
    n_pad = _round_up(n_grid, tps)
    order_g = jnp.concatenate(
        [order[:n_grid],
         jnp.full((n_pad - n_grid,), num_tiles, jnp.int32)])
    starts_k = jnp.concatenate([starts, starts[-1:]])

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(n_pad // tps,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(
            (tps, c_out, p), lambda i, *_: (i, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=[
            pltpu.VMEM((tps, 2, ch, ncols), jnp.float32),
            pltpu.SemaphoreType.DMA((tps, 2)),
        ],
    )
    kernel = functools.partial(
        S._stream_kernel,
        grid_x=grid_x, tile_x=config.tile_x, tile_y=config.tile_y,
        chunk=ch, ncols=ncols, c_out=c_out, channels=channels,
        downscale=1, tps=tps, with_contrib=True,
    )
    out_o = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_pad, c_out, p), jnp.float32),
        interpret=interpret,
    )(order_g, starts_k, jnp.zeros((1,), jnp.int32), stream)[:n_grid]

    sentinel = jnp.zeros((1, c_out, p), jnp.float32)
    sentinel = sentinel.at[:, c_out - 1, :].set(1.0)
    inv = jnp.full((num_tiles,), n_grid, jnp.int32).at[
        order_g[:n_grid]].set(jnp.arange(n_grid, dtype=jnp.int32))
    out_t = jnp.concatenate([out_o, sentinel], axis=0)[inv]
    t_run = out_t[:, c_out - 1, :]
    n_contrib = out_t[:, c_out - 2, :]
    acc = out_t[:, :channels, :].transpose(0, 2, 1)
    out = acc + t_run[..., None] * diff["bg"][None, None, :]
    res = dict(stream=stream, starts=starts, order_g=order_g,
               sorted_g=sorted_g, g_map=g_map, t_run=t_run,
               n_contrib=n_contrib, bg=diff["bg"],
               feat_proto=jnp.zeros((diff["mean2d"].shape[0], 0),
                                    diff["features"].dtype))
    return out, t_run, overflow, res


def _blend_core_fwd(num_tiles, grid_x, config, channels, interpret,
                    diff, aux):
    out, t_run, ovf, res = _fwd_impl(
        num_tiles, grid_x, config, channels, interpret, diff, aux)
    return (out, t_run, ovf), res


def _blend_core_bwd(num_tiles, grid_x, config, channels, interpret,
                    res, cts):
    g_out, g_t, _ = cts  # (num_tiles, P, C), (num_tiles, P), unused
    p = config.tile_x * config.tile_y
    ch = config.chunk_size
    stream = res["stream"]
    starts = res["starts"]
    sorted_g = res["sorted_g"]
    n = res["feat_proto"].shape[0]
    kbp, ncols = stream.shape
    tps = max(1, config.tiles_per_step)
    n_grid = min(config.max_active_tiles or num_tiles, num_tiles)
    n_pad = _round_up(n_grid, tps)

    # ascending-entry-order rendered tile list (spill-overwrite argument
    # in the kernel docstring); padding points at the empty sentinel tile
    order_b = jnp.sort(res["order_g"][:n_grid])
    order_bp = jnp.concatenate(
        [order_b, jnp.full((n_pad - n_grid,), num_tiles, jnp.int32)])

    cpad = _round_up(channels + 3, 8)
    dT_tot = g_t + jnp.einsum("tpc,c->tp", g_out, res["bg"])
    dout_t = jnp.concatenate(
        [
            g_out.transpose(0, 2, 1),                    # (T, C, P)
            res["n_contrib"][:, None, :],
            dT_tot[:, None, :],
            res["t_run"][:, None, :],
            jnp.zeros((num_tiles, cpad - channels - 3, p), jnp.float32),
        ],
        axis=1,
    )
    dout_b = jnp.concatenate(
        [dout_t, jnp.zeros((1, cpad, p), jnp.float32)], axis=0
    )[order_bp]

    starts_k = jnp.concatenate([starts, starts[-1:]])
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(n_pad // tps,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(
                (tps, cpad, p), lambda i, *_: (i, 0, 0),
                memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[
            pltpu.VMEM((2, ch, ncols), jnp.float32),
            pltpu.VMEM((ch, ncols), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA(()),
        ],
    )
    kernel = functools.partial(
        _bwd_kernel,
        grid_x=grid_x, tile_x=config.tile_x, tile_y=config.tile_y,
        chunk=ch, ncols=ncols, channels=channels, tps=tps,
    )
    grads = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((kbp, ncols), jnp.float32),
        interpret=interpret,
    )(order_bp, starts_k, stream, dout_b)

    # ---- epilogue: mask never-written rows, reduce entries->gaussians --
    # a row was written by the kernel iff its tile was rendered AND its
    # in-tile position is below the tile's chunk-granular contributor
    # ceiling (the kernel clamps its walk to ceil(max n_contrib / chunk)
    # chunks); everything else is uninitialized HBM and must be zeroed
    pos = jnp.arange(kbp, dtype=jnp.int32)
    tile_flag = jnp.zeros((num_tiles,), jnp.int32).at[order_b].set(1)
    counts_t = starts[1:] - starts[:-1]
    mx_nc = jnp.max(res["n_contrib"], axis=1).astype(jnp.int32)
    rows_t = jnp.minimum(
        -(-counts_t // ch), -(-mx_nc // ch)) * ch * tile_flag
    ends_t = starts[:-1] + rows_t
    dflag = jnp.zeros((kbp + 1,), jnp.int32)
    dflag = dflag.at[jnp.minimum(starts[:-1], kbp)].add(tile_flag)
    dflag = dflag.at[jnp.minimum(ends_t, kbp)].add(-tile_flag)
    written = (jnp.cumsum(dflag[:kbp]) > 0)
    gsafe = jnp.where(written & (sorted_g < n), sorted_g, n)
    cols = 8 + channels
    grows = jnp.where(written[:, None], grads[:, :cols], 0.0)

    per_g = jnp.zeros((n + 1, cols), jnp.float32).at[gsafe].add(grows)
    per_g = per_g[:n]
    if res.get("g_map") is not None:
        # rank-keyed binning: rows are per-RANK; permute back to the
        # original gaussian order (rank r belongs to gaussian g_map[r])
        rank_of = jnp.zeros((n,), jnp.int32).at[res["g_map"]].set(
            jnp.arange(n, dtype=jnp.int32))
        per_g = per_g[rank_of]
    d_diff = dict(
        mean2d=per_g[:, 0:2],
        conic=per_g[:, 2:5],
        opacity=per_g[:, 5],
        features=per_g[:, 8 : 8 + channels].astype(
            res["feat_proto"].dtype),
        bg=jnp.einsum("tp,tpc->c", res["t_run"], g_out),
    )
    d_aux = dict(
        depth=jnp.zeros((n,), jnp.float32),
        rect_f=jnp.zeros((n, 4), jnp.float32),
        valid_f=jnp.zeros((n,), jnp.float32),
    )
    return (d_diff, d_aux)


_blend_core.defvjp(_blend_core_fwd, _blend_core_bwd)


# --------------------------------------------------------------------------
# public entry
# --------------------------------------------------------------------------


def rasterize_gaussians_stream_diff(
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
    """Differentiable fast-path rasterization: forward = streaming
    kernel, backward = back-to-front replay kernel (custom_vjp). Drop-in
    for ops.rasterize.rasterize_gaussians with differentiable=True;
    preprocess gradients (means3d/scales/rotations/shs) flow through JAX
    autodiff outside the custom_vjp boundary."""
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
    diff = dict(mean2d=prep.mean2d, conic=prep.conic,
                opacity=prep.opacity, features=prep.features,
                bg=settings.bg)
    # int/bool fields ride as float arrays so every aux leaf has a plain
    # zero cotangent (int->float casts have zero gradient in the outer
    # graph, so nothing leaks)
    aux = dict(depth=prep.depth,
               rect_f=prep.rect.astype(jnp.float32),
               valid_f=prep.valid.astype(jnp.float32))
    cfg = config._replace(downscale=1)
    out, t_run, overflow = _blend_core(
        num_tiles, grid_x, cfg, channels, interpret, diff, aux)

    from .rasterize_pallas import assemble_tiles

    color, t_img = assemble_tiles(out, t_run, H, W, cfg)
    radii = prep.radius.astype(jnp.int32)
    if return_extra:
        return color, radii, {"final_T": t_img, "dup_overflow": overflow}
    return color, radii
