"""Attribute fused-frame extras beyond rasterize_stream (TPU)."""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from gpcr_tpu.ops import rasterize as R
from gpcr_tpu.ops import rasterize_stream as S
from gpcr_tpu.render.renderer import (
    bilinear_resize, get_rasterize_param_from_camera, pcgc_rescale,
    render_views_fused,
)
from gpcr_tpu.structures.trajectory import CameraTrajectory
from gpcr_tpu.utils import sh as sh_utils
from gpcr_tpu.utils.timing import sync


def timeit(fn, *args, reps=5):
    out = fn(*args)
    sync(out)
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        sync(out)
        ts.append((time.perf_counter() - t0) * 1e3)
    return float(np.median(ts))


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

    traj = CameraTrajectory(mode="circle", n_imgs=8, total=1,
                            params={"d": 0, "r": 3, "center_angles": [90, 0]})
    cam = traj.get_camera(fov=fov, width_px=res, height_px=res)
    rp = get_rasterize_param_from_camera(cam, fov, bg=jnp.ones(3),
                                         sh_degree=1, super_sample_rate=ssrate)
    means = pcgc_rescale(jnp.asarray(coords), 512, sf)
    shs = jnp.concatenate(
        [sh_utils.RGB2SH(jnp.asarray(rgb))[:, None, :], jnp.zeros((n, 12, 3))],
        axis=1)
    scales = jnp.ones((n, 3)) * (1.0 / sf)
    rotations = jnp.broadcast_to(jnp.array([1.0, 0, 0, 0]), (n, 4))
    opacity = jnp.ones((n,))
    valid = jnp.ones((n,), bool)
    normal = jnp.zeros((n, 3))

    config = R.RasterizeConfig(
        max_dup_per_gaussian=4, chunk_size=128,
        k_budget=1_800_000, max_active_tiles=8192, impl="stream")
    H = W = res * ssrate

    print(f"floor: {timeit(jax.jit(lambda x: x + 1), jnp.ones(8)):6.1f} ms")

    def frame(q):
        f = jax.jit(functools.partial(
            render_views_fused,
            bg3=jnp.ones(3), tanfov=rp["tanfov"], height=H, width=W,
            out_h=res, out_w=res, sh_degree=1, config=config,
            with_normal=False),
            static_argnames=())
        def g(vt, ft, cp):
            return f(vt, ft, cp, means3d=means, scales=scales,
                     rotations=rotations, opacity=opacity, shs=shs,
                     normal=normal, valid=valid)
        ms = timeit(g, rp["view_t"][:q], rp["full_t"][:q], rp["campos"][:q])
        print(f"frame q={q}: {ms:7.1f} ms total, {ms/q:6.1f} ms/view")

    for q in (1, 2, 4, 8):
        try:
            frame(q)
        except Exception as e:
            print(f"frame q={q}: FAILED {type(e).__name__}: {str(e)[:200]}")

    # rasterize only (colors_precomp), then + resize, then + transposes
    feats = jnp.concatenate(
        [sh_utils.eval_sh_color(1, shs, means, rp["campos"][0]),
         means, jnp.ones_like(means), jnp.zeros_like(means)], axis=-1)
    settings = R.GaussianRasterizationSettings(
        H, W, rp["tanfov"], rp["tanfov"], jnp.ones(12), 1.0,
        rp["view_t"][0], rp["full_t"][0], 1, rp["campos"][0])

    raster = jax.jit(functools.partial(
        S.rasterize_gaussians_stream, settings=settings, config=config))

    def r_only(m, o, s, rot, f):
        c, _ = raster(m, o, scales=s, rotations=rot, colors_precomp=f)
        return c

    ms = timeit(jax.jit(r_only), means, opacity, scales, rotations, feats)
    print(f"raster only:          {ms:7.1f} ms")

    def r_resize(m, o, s, rot, f):
        c, _ = raster(m, o, scales=s, rotations=rot, colors_precomp=f)
        return bilinear_resize(c[None], res, res)

    ms = timeit(jax.jit(r_resize), means, opacity, scales, rotations, feats)
    print(f"raster + resize:      {ms:7.1f} ms")

    def r_sh(m, o, s, rot, sh):
        f = jnp.concatenate(
            [sh_utils.eval_sh_color(1, sh, m, rp["campos"][0]),
             m, jnp.ones_like(m), jnp.zeros_like(m)], axis=-1)
        c, _ = raster(m, o, scales=s, rotations=rot, colors_precomp=f)
        return bilinear_resize(c[None], res, res)

    ms = timeit(jax.jit(r_sh), means, opacity, scales, rotations, shs)
    print(f"raster + resize + sh: {ms:7.1f} ms")


if __name__ == "__main__":
    main()
