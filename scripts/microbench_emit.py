"""Isolate emit vs stable-sort cost; cap / chunk variants (TPU)."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from gpcr_tpu.ops import rasterize as R
from gpcr_tpu.render.renderer import (
    get_rasterize_param_from_camera, pcgc_rescale,
)
from gpcr_tpu.structures.trajectory import CameraTrajectory
from gpcr_tpu.utils import sh as sh_utils


def timeit(fn, *args, reps=5):
    out = jax.jit(fn)(*args)
    np.asarray(jax.tree_util.tree_leaves(out)[0].ravel()[:1])
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = jax.jit(fn)(*args)
        np.asarray(jax.tree_util.tree_leaves(out)[0].ravel()[:1])
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
    coords = (xyz_world * sf + 512).astype(np.float32)

    traj = CameraTrajectory(mode="circle", n_imgs=4, total=1,
                            params={"d": 0, "r": 3, "center_angles": [90, 0]})
    cam = traj.get_camera(fov=fov, width_px=res, height_px=res)
    rp = get_rasterize_param_from_camera(cam, fov, bg=jnp.ones(3),
                                         sh_degree=1, super_sample_rate=ssrate)
    means = pcgc_rescale(jnp.asarray(coords), 512, sf)
    scales = jnp.ones((n, 3)) * (1.0 / sf)
    rotations = jnp.broadcast_to(jnp.array([1.0, 0, 0, 0]), (n, 4))
    opacity = jnp.ones((n,))
    feats = jnp.asarray(rng.rand(n, 12), jnp.float32)

    H = W = res * ssrate
    config = R.RasterizeConfig(max_dup_per_gaussian=8)
    grid_x = -(-W // 16)
    num_tiles = grid_x * (-(-H // 16))
    settings = R.GaussianRasterizationSettings(
        H, W, rp["tanfov"], rp["tanfov"], jnp.ones(12), 1.0,
        rp["view_t"][0], rp["full_t"][0], 1, rp["campos"][0])

    prep = jax.jit(lambda m, o, s, r, f: R.preprocess(
        m, o, settings, config, scales=s, rotations=r, colors_precomp=f))(
        means, opacity, scales, rotations, feats)

    # area histogram (host)
    rect = np.asarray(prep.rect)
    valid = np.asarray(prep.valid)
    area = (rect[:, 2] - rect[:, 0]) * (rect[:, 3] - rect[:, 1])
    area = np.where(valid, area, 0)
    hist = np.bincount(np.clip(area, 0, 12), minlength=13)
    print("area histogram 0..12+:", hist.tolist())
    print("entries:", int(area.sum()),
          "| dropped at cap6:", int(np.maximum(area - 6, 0).sum()),
          "| at cap4:", int(np.maximum(area - 4, 0).sum()))

    # presort payloads
    depth_key = jnp.where(prep.valid, prep.depth, jnp.inf)
    _, gidx_s, valid_si, rminx_s, rminy_s, rmaxx_s, rmaxy_s = jax.lax.sort(
        (depth_key, jnp.arange(n, dtype=jnp.int32),
         prep.valid.astype(jnp.int32), prep.rect[:, 0], prep.rect[:, 1],
         prep.rect[:, 2], prep.rect[:, 3]), num_keys=2)

    print(f"floor: {timeit(lambda x: x + 1, jnp.ones(8)):6.1f} ms")

    def emit(cap, valid_si, rminx_s, rminy_s, rmaxx_s, rmaxy_s, gidx_s):
        valid_s = valid_si.astype(bool)
        rw = jnp.maximum(rmaxx_s - rminx_s, 1)
        area_raw = (rmaxx_s - rminx_s) * (rmaxy_s - rminy_s)
        area = jnp.where(valid_s, jnp.minimum(area_raw, cap), 0)
        k = jnp.arange(cap, dtype=jnp.int32)
        kdiv = jnp.zeros((n, cap), jnp.int32)
        for j in range(1, cap):
            kdiv = kdiv + (k[None, :] >= j * rw[:, None]).astype(jnp.int32)
        kmod = k[None, :] - kdiv * rw[:, None]
        ty = rminy_s[:, None] + kdiv
        tx = rminx_s[:, None] + kmod
        dup_valid = valid_s[:, None] & (k[None, :] < area[:, None])
        tile_flat = jnp.where(dup_valid, ty * grid_x + tx,
                              num_tiles).astype(jnp.int32).reshape(-1)
        g_flat = jnp.where(dup_valid, gidx_s[:, None], n).reshape(-1)
        return tile_flat, g_flat

    import functools

    for cap in (8, 6):
        e = functools.partial(emit, cap)
        ms = timeit(e, valid_si, rminx_s, rminy_s, rmaxx_s, rmaxy_s, gidx_s)
        print(f"emit only (cap {cap}):         {ms:6.1f} ms")
        tile_flat, g_flat = jax.jit(e)(
            valid_si, rminx_s, rminy_s, rmaxx_s, rmaxy_s, gidx_s)
        ms = timeit(lambda t, g: jax.lax.sort((t, g), num_keys=1,
                                              is_stable=True),
                    tile_flat, g_flat)
        print(f"stable sort ({n*cap/1e6:.1f}M):      {ms:6.1f} ms")
        ms = timeit(lambda t, g: jax.lax.sort((t, g), num_keys=1,
                                              is_stable=False),
                    tile_flat, g_flat)
        print(f"unstable sort ({n*cap/1e6:.1f}M):    {ms:6.1f} ms")

    # emit+sort fused (XLA may fuse emit into sort copy)
    def emit_sort(valid_si, rminx_s, rminy_s, rmaxx_s, rmaxy_s, gidx_s):
        t, g = emit(8, valid_si, rminx_s, rminy_s, rmaxx_s, rmaxy_s, gidx_s)
        return jax.lax.sort((t, g), num_keys=1, is_stable=True)

    ms = timeit(emit_sort, valid_si, rminx_s, rminy_s, rmaxx_s, rmaxy_s,
                gidx_s)
    print(f"emit+sort fused (6.4M):     {ms:6.1f} ms")


if __name__ == "__main__":
    main()
