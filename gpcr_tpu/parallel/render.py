"""Multi-chip rendering: tile-space sharding over the device mesh.

The workload's scaling axes are points/tiles/views (SURVEY.md §5 — there is
no sequence axis). For a SINGLE frame too large or too slow for one chip,
the natural decomposition is tile-space: every device holds the (small)
per-gaussian arrays replicated, blends a contiguous slice of the tile grid,
and the image is assembled from the tile shards — one all_gather over ICI,
no collectives inside the blend loop.

View-level parallelism (different devices render different views) is just
``jax.sharding`` on the view axis of ``render_views_fused`` inputs; this
module covers the harder intra-frame case.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from ..ops import rasterize as R
from ..ops import rasterize_stream as S


def rasterize_tile_sharded(
    means3d,
    opacities,
    settings: R.GaussianRasterizationSettings,
    mesh: Mesh,
    axis: str = "sp",
    scales=None,
    rotations=None,
    cov3d_precomp=None,
    shs=None,
    colors_precomp=None,
    valid_mask=None,
    config: R.RasterizeConfig = R.RasterizeConfig(),
):
    """Single-frame rasterization with tiles sharded over ``axis``.

    Work distribution (measured shares of the single-chip frame in
    PERFORMANCE.md round 4 — binning is ~2/3, so sharding it is what
    makes tile-sharding scale):
    - preprocess runs replicated: elementwise over N, ~2 ms of a ~50 ms
      frame — not worth a collective;
    - BINNING runs PER SHARD: every device executes the same elementwise
      emit over all gaussians but keeps only entries whose tile falls in
      its contiguous tile slice (R.tile_bin(tile_window=...)), so the
      sort payload movement, the entry gather, and the starts table are
      all local. No cross-device traffic: a tile's entries are fully
      determined by the replicated preprocess;
    - each device blends its num_tiles / axis_size tiles — through the
      production Pallas stream kernel when config.impl == 'stream'
      (blend_stream tile_window, round 5; interpret-mode on CPU meshes)
      or the XLA blend otherwise; the (C, H, W) image is reassembled
      from the gathered tile shards (one all_gather over ICI at
      assembly).

    Measured vs projected: per-shard binning + kernel costs are
    MEASURED single-chip (PERFORMANCE.md); multi-chip scaling is a
    PROJECTION from those shares (no multi-chip hardware in this
    environment — correctness is CPU-mesh parity-tested, including the
    stream-kernel path in interpret mode).
    """
    H, W = settings.image_height, settings.image_width
    grid_x = -(-W // config.tile_x)
    grid_y = -(-H // config.tile_y)
    num_tiles = grid_x * grid_y
    n_shards = mesh.shape[axis]
    # pad the tile range so any device count works (e.g. 4096 tiles on 3
    # devices): trailing shards bin+blend past-the-end tile ids that no
    # entry matches (empty output rows, sliced away at assembly)
    tiles_local = -(-num_tiles // n_shards)

    prep = R.preprocess(
        means3d, opacities, settings, config,
        scales=scales, rotations=rotations, cov3d_precomp=cov3d_precomp,
        shs=shs, colors_precomp=colors_precomp, valid_mask=valid_mask,
    )
    channels = prep.features.shape[-1]

    packed_all = jnp.concatenate(
        [prep.mean2d, prep.conic, prep.opacity[:, None], prep.features],
        axis=-1,
    )
    packed_all = jnp.concatenate(
        [packed_all, jnp.zeros((1, 6 + channels))], axis=0
    )

    use_stream = config.impl == "stream"
    if use_stream:
        # the production Pallas path needs a Mosaic target; on CPU
        # meshes (the dryrun/test harness) run it in interpret mode
        interpret = jax.devices()[0].platform != "tpu"

    def shard_fn(packed_all, prep):
        d = jax.lax.axis_index(axis)
        base = d * tiles_local
        if use_stream:
            # round-5: the per-shard binning AND the production stream
            # kernel both run windowed — each shard sorts, gathers, and
            # blends only its own tile slice (blend_stream tile_window;
            # pixel coords stay global via the kernel's base offset).
            # Replaces the round-4 XLA _blend_one_tile vmap, which was
            # ~3x the stream kernel's cost (PERFORMANCE.md).
            out_l, t_run, ovf, _wd = S.blend_stream(
                prep, settings.bg, num_tiles, grid_x, config, channels,
                interpret=interpret, tile_base=base,
                tile_count=tiles_local,
            )
            # blend_stream composites bg itself; strip it back out so
            # the assembly below stays shared with the XLA branch
            acc = out_l - t_run[..., None] * settings.bg[None, None, :]
            return acc, t_run, ovf[None]
        # per-shard binning: local sort slice, local starts table
        sorted_gidx, starts, ovf = R.tile_bin(
            prep, num_tiles, grid_x, config,
            tile_window=(base, tiles_local),
        )

        def one(j):
            return R._blend_one_tile(
                base + j, starts[j], starts[j + 1],
                sorted_gidx, packed_all, grid_x, config, channels,
            )

        acc, t_run = jax.vmap(one)(jnp.arange(tiles_local))
        # cap overflow is computed from replicated inputs (identical on
        # every shard); k_budget overflow is per-shard. Report the max:
        # exact for the cap term, conservative for per-shard budgets.
        return acc, t_run, ovf[None]

    in_spec = P()
    acc, t_run, ovf = shard_map(
        shard_fn,
        mesh=mesh,
        in_specs=(in_spec, in_spec),
        out_specs=(P(axis), P(axis), P(axis)),
        check_vma=False,
    )(packed_all, prep)
    overflow = jnp.max(ovf)

    # assemble (num_tiles, P, C) -> (C, H, W); drop clamp-padded tiles
    acc = acc[:num_tiles]
    t_run = t_run[:num_tiles]
    p = config.tile_x * config.tile_y
    out = acc + t_run[..., None] * settings.bg[None, None, :]
    out = out.reshape(grid_y, grid_x, config.tile_y, config.tile_x, channels)
    out = out.transpose(4, 0, 2, 1, 3).reshape(
        channels, grid_y * config.tile_y, grid_x * config.tile_x
    )[:, :H, :W]
    t_img = t_run.reshape(grid_y, grid_x, config.tile_y, config.tile_x)
    t_img = t_img.transpose(0, 2, 1, 3).reshape(
        grid_y * config.tile_y, grid_x * config.tile_x
    )[:H, :W]
    return out, prep.radius.astype(jnp.int32), t_img, overflow


def render_views_sharded(
    mesh: Mesh,
    mode: str,  # 'views' | 'tiles'
    view_ts, full_ts, camposes,  # (q, 4, 4), (q, 4, 4), (q, 3)
    means3d, scales, rotations, opacity, shs, normal, valid,
    bg3, tanfov,
    height: int, width: int, out_h: int, out_w: int, sh_degree: int,
    config: R.RasterizeConfig, with_normal: bool,
    axis: str = "sp",
):
    """Multi-chip version of ``render.renderer.render_views_fused`` — the
    user-facing entry the benchmark CLI's ``--shard views|tiles`` reaches.

    - ``'views'``: each device renders q/n of the views (per-gaussian
      arrays replicated; one all_gather of the finished images). Scales
      throughput for multi-view dispatches.
    - ``'tiles'``: every view is rendered cooperatively — preprocess +
      binning replicated, each device blends a slice of the tile grid
      (``rasterize_tile_sharded``). Scales latency for single frames.

    Returns the same dict as render_views_fused.
    """
    import functools

    from ..render import renderer as RR

    n = mesh.shape[axis]
    if mode == "views":
        q = view_ts.shape[0]
        qp = -(-q // n) * n

        def padv(x):
            if qp == q:
                return x
            return jnp.concatenate(
                [x] + [x[-1:]] * (qp - q), axis=0
            )

        fused = functools.partial(
            RR.render_views_fused,
            height=height, width=width, out_h=out_h, out_w=out_w,
            sh_degree=sh_degree, config=config, with_normal=with_normal,
        )

        def local(vt, ft, cp, means3d, scales, rotations, opacity, shs,
                  normal, valid, bg3, tanfov):
            out = fused(vt, ft, cp, means3d, scales, rotations, opacity,
                        shs, normal, valid, bg3, tanfov)
            if not with_normal:
                out.pop("normal")
            return out

        rep = P()
        out = shard_map(
            local, mesh=mesh,
            in_specs=(P(axis), P(axis), P(axis)) + (rep,) * 9,
            out_specs={
                k: P(axis)
                for k in (
                    ["rgb", "xyz_w", "hitmap", "dup_overflow"]
                    + (["normal"] if with_normal else [])
                )
            },
            check_vma=False,
        )(
            padv(view_ts), padv(full_ts), padv(camposes),
            means3d, scales, rotations, opacity, shs, normal, valid,
            bg3, jnp.asarray(tanfov),
        )
        out = {k: v[:q] for k, v in out.items()}
        if not with_normal:
            out["normal"] = None
        return out

    if mode != "tiles":
        raise ValueError(f"unknown shard mode {mode!r}")

    colors, overflows = [], []
    for i in range(view_ts.shape[0]):
        features, bg = RR.fuse_view_features(
            camposes[i], means3d, shs, normal, bg3, sh_degree, with_normal
        )
        settings = R.GaussianRasterizationSettings(
            image_height=height, image_width=width,
            tanfovx=tanfov, tanfovy=tanfov, bg=bg, scale_modifier=1.0,
            viewmatrix=view_ts[i], projmatrix=full_ts[i],
            sh_degree=sh_degree, campos=camposes[i],
        )
        color, _radii, _t, ovf = rasterize_tile_sharded(
            means3d, opacity, settings, mesh, axis=axis,
            scales=scales, rotations=rotations, colors_precomp=features,
            valid_mask=valid, config=config,
        )
        colors.append(color)
        overflows.append(ovf)
    colors = RR.bilinear_resize(jnp.stack(colors), out_h, out_w)
    out = {
        "rgb": colors[:, 0:3].transpose(0, 2, 3, 1),
        "xyz_w": colors[:, 3:6].transpose(0, 2, 3, 1),
        "hitmap": colors[:, 6:9].transpose(0, 2, 3, 1),
        "normal": (
            colors[:, 9:12].transpose(0, 2, 3, 1) if with_normal else None
        ),
        "dup_overflow": jnp.stack(overflows),
    }
    return out
