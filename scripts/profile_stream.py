"""Stage-level timing of the stream rasterizer at the bench config.

Each stage is jitted separately with RUNTIME arguments (no constant
folding) and timed with D2H sync; subtract the ~30 ms dispatch floor
mentally when comparing (measured by the noop row).
"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax

from gpcr_tpu.utils.cache import enable_persistent_cache

enable_persistent_cache()
import jax.numpy as jnp

from gpcr_tpu.ops import rasterize as R
from gpcr_tpu.ops import rasterize_stream as S
from gpcr_tpu.render.renderer import (
    get_rasterize_param_from_camera, pcgc_rescale,
)
from gpcr_tpu.structures.trajectory import CameraTrajectory
from gpcr_tpu.utils import sh as sh_utils
from gpcr_tpu.utils.timing import sync


def timeit(fn, *args, reps=4):
    out = fn(*args)
    sync(out)
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        sync(out)
        ts.append((time.perf_counter() - t0) * 1e3)
    return float(np.median(ts)), out


def main():
    rng = np.random.RandomState(0)
    n = 800_000
    res, ssrate, sf, fov = 1024, 2, 448, 45.0
    v = rng.randn(n, 3)
    v /= np.linalg.norm(v, axis=1, keepdims=True)
    v[:, 1] *= 1.6
    v *= 0.55
    xyz_world = v + rng.randn(n, 3) * 0.01
    rgb = rng.rand(n, 3).astype(np.float32)
    coords = (xyz_world * sf + 512).astype(np.float32)

    traj = CameraTrajectory(
        mode="circle", n_imgs=4, total=1,
        params={"d": 0, "r": 3, "center_angles": [90, 0]},
    )
    cam = traj.get_camera(fov=fov, width_px=res, height_px=res)
    rp = get_rasterize_param_from_camera(
        cam, fov, bg=jnp.ones(3), sh_degree=1, super_sample_rate=ssrate
    )
    means = pcgc_rescale(jnp.asarray(coords), 512, sf)
    shs = jnp.concatenate(
        [sh_utils.RGB2SH(jnp.asarray(rgb))[:, None, :], jnp.zeros((n, 12, 3))],
        axis=1,
    )
    scales = jnp.ones((n, 3)) * (1.0 / sf)
    rotations = jnp.broadcast_to(jnp.array([1.0, 0, 0, 0]), (n, 4))
    opacity = jnp.ones((n,))

    config = R.RasterizeConfig(
        max_dup_per_gaussian=4, chunk_size=128,
        k_budget=1_800_000, max_active_tiles=8192, impl="stream",
    )
    H = W = res * ssrate
    grid_x = -(-W // config.tile_x)
    num_tiles = grid_x * (-(-H // config.tile_y))
    settings = R.GaussianRasterizationSettings(
        image_height=H, image_width=W, tanfovx=rp["tanfov"],
        tanfovy=rp["tanfov"], bg=jnp.ones(12), scale_modifier=1.0,
        viewmatrix=rp["view_t"][0], projmatrix=rp["full_t"][0],
        sh_degree=1, campos=rp["campos"][0],
    )

    ms, _ = timeit(jax.jit(lambda x: x + 1.0), jnp.ones(8))
    print(f"noop dispatch floor:      {ms:8.1f} ms")

    feats = jnp.concatenate(
        [sh_utils.eval_sh_color(1, shs, means, settings.campos),
         means, jnp.ones_like(means), jnp.zeros_like(means)], axis=-1
    )

    pre = jax.jit(functools.partial(
        R.preprocess, settings=settings, config=config))
    ms, prep = timeit(
        lambda m, o, s, r, f: pre(m, o, scales=s, rotations=r,
                                  colors_precomp=f),
        means, opacity, scales, rotations, feats,
    )
    print(f"preprocess:               {ms:8.1f} ms")

    binf = jax.jit(functools.partial(
        S.bin_sorted_stream, num_tiles=num_tiles, grid_x=grid_x,
        config=config))
    ms, (stream, starts, ovf, _wd) = timeit(binf, prep)
    print(f"bin (sort+gather):        {ms:8.1f} ms  "
          f"overflow={int(ovf)}")

    # --- stage-level breakdown of the v3 binning -------------------------
    nn = prep.depth.shape[0]
    cap = config.max_dup_per_gaussian
    kb = min(-(-(config.k_budget or nn * cap) // 128) * 128, nn * cap)

    def presort(prep):
        depth_key = jnp.where(prep.valid, prep.depth, jnp.inf)
        return jax.lax.sort(
            (depth_key, jnp.arange(nn, dtype=jnp.int32),
             prep.valid.astype(jnp.int32), prep.rect[:, 0], prep.rect[:, 1],
             prep.rect[:, 2], prep.rect[:, 3]), num_keys=2,
        )

    ms, psort = timeit(jax.jit(presort), prep)
    print(f"  presort 800K (7 ops):   {ms:8.1f} ms")
    _, gidx_s, valid_si, rminx_s, rminy_s, rmaxx_s, rmaxy_s = psort

    def build_packed(prep):
        rect_f = prep.rect.astype(jnp.float32)
        p = jnp.concatenate(
            [prep.mean2d, prep.conic, prep.opacity[:, None],
             prep.depth[:, None], jnp.zeros((nn, 1)), prep.features,
             rect_f], axis=-1,
        ).astype(jnp.float32)
        return jnp.pad(p, ((0, 1), (0, 128 - p.shape[1])))

    ms, packed = timeit(jax.jit(build_packed), prep)
    print(f"  build packed table:     {ms:8.1f} ms")

    def emit_sort(valid_si, rminx_s, rminy_s, rmaxx_s, rmaxy_s, gidx_s):
        valid_s = valid_si.astype(bool)
        rw = jnp.maximum(rmaxx_s - rminx_s, 1)
        area_raw = (rmaxx_s - rminx_s) * (rmaxy_s - rminy_s)
        area = jnp.where(valid_s, jnp.minimum(area_raw, cap), 0)
        k = jnp.arange(cap, dtype=jnp.int32)
        kdiv = jnp.zeros((nn, cap), jnp.int32)
        for j in range(1, cap):
            kdiv = kdiv + (k[None, :] >= j * rw[:, None]).astype(jnp.int32)
        kmod = k[None, :] - kdiv * rw[:, None]
        ty = rminy_s[:, None] + kdiv
        tx = rminx_s[:, None] + kmod
        dup_valid = valid_s[:, None] & (k[None, :] < area[:, None])
        tile_flat = jnp.where(
            dup_valid, ty * grid_x + tx, num_tiles
        ).astype(jnp.int32).reshape(-1)
        g_flat = jnp.where(dup_valid, gidx_s[:, None], nn).reshape(-1)
        return jax.lax.sort((tile_flat, g_flat), num_keys=1, is_stable=True)

    ms, (sorted_tile, sorted_g) = timeit(
        jax.jit(emit_sort), valid_si, rminx_s, rminy_s, rmaxx_s, rmaxy_s,
        gidx_s)
    print(f"  emit + stable 1-key:    {ms:8.1f} ms")

    def starts_fn(sorted_tile):
        return jnp.searchsorted(
            sorted_tile[:kb], jnp.arange(num_tiles + 1, dtype=jnp.int32),
            side="left").astype(jnp.int32)

    ms, _ = timeit(jax.jit(starts_fn), sorted_tile)
    print(f"  searchsorted starts:    {ms:8.1f} ms")

    def gather_stream(packed, sorted_g):
        return packed[sorted_g[:kb]]

    ms, _ = timeit(jax.jit(gather_stream), packed, sorted_g)
    print(f"  stream gather {kb/1e6:.1f}M:     {ms:8.1f} ms")

    counts = starts[1:] - starts[:-1]
    print(f"  entries={int(starts[-1])} active_tiles="
          f"{int(jnp.sum(counts > 0))} max_count={int(jnp.max(counts))}")

    kern = jax.jit(functools.partial(
        S.blend_stream, num_tiles=num_tiles, grid_x=grid_x, config=config,
        channels=12))
    ms, _ = timeit(lambda p, b: kern(p, b), prep, jnp.ones(12))
    print(f"bin+kernel+unperm:        {ms:8.1f} ms")

    # kernel alone on prebuilt stream
    p = config.tile_x * config.tile_y
    c_out = 16
    order = jnp.argsort(-counts).astype(jnp.int32)

    def kernel_only(order, starts, stream):
        grid_spec = S.pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(num_tiles,),
            in_specs=[S.pl.BlockSpec(memory_space=S.pltpu.ANY)],
            out_specs=S.pl.BlockSpec(
                (1, c_out, p), lambda i, *_: (i, 0, 0),
                memory_space=S.pltpu.VMEM),
            scratch_shapes=[
                S.pltpu.VMEM((2, config.chunk_size, stream.shape[1]),
                             jnp.float32),
                S.pltpu.SemaphoreType.DMA((2,)),
            ],
        )
        kfn = functools.partial(
            S._stream_kernel, grid_x=grid_x, tile_x=16, tile_y=16,
            chunk=config.chunk_size, ncols=stream.shape[1], c_out=c_out,
            channels=12)
        return S.pl.pallas_call(
            kfn, grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct(
                (num_tiles, c_out, p), jnp.float32),
        )(order, starts, stream)

    ms, _ = timeit(jax.jit(kernel_only), order, starts, stream)
    print(f"kernel only:              {ms:8.1f} ms")

    full = jax.jit(functools.partial(
        S.rasterize_gaussians_stream, settings=settings, config=config))
    ms, _ = timeit(
        lambda m, o, s, r, f: full(m, o, scales=s, rotations=r,
                                   colors_precomp=f),
        means, opacity, scales, rotations, feats,
    )
    print(f"full rasterize_stream:    {ms:8.1f} ms")

    # whole bench frame: fused features + SH + render + downscale
    from gpcr_tpu.render.renderer import render_views_fused

    normal = jnp.zeros((n, 3))
    valid = jnp.ones((n,), bool)
    opac = jnp.ones((n,))

    def frame(vt, ft, cp, means, scales, rotations, opac, shs, normal):
        return render_views_fused(
            vt[None], ft[None], cp[None], means, scales, rotations, opac,
            shs, normal, valid, jnp.ones(3), rp["tanfov"],
            height=H, width=W, out_h=res, out_w=res, sh_degree=1,
            config=config, with_normal=False,
        )

    ms, _ = timeit(
        jax.jit(frame), rp["view_t"][0], rp["full_t"][0], rp["campos"][0],
        means, scales, rotations, opac, shs, normal,
    )
    print(f"bench frame (fused):      {ms:8.1f} ms")


if __name__ == "__main__":
    main()
