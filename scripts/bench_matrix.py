"""BASELINE.md benchmark matrix — all analytic-path configs in one run.

Configs (BASELINE.md "Configs to benchmark"):
  c1  simple render, quantized ~290K cloud (sf 256), 512² x2ss, 12-view circle
  c3a simple render, 800K cloud (sf 448), 1024² x2ss (the headline config)
  c4  1.5M-point cloud, multi-view orbit, 512² x2ss
  c5  30-frame animated sequence at 1080p (1920x1080) x2ss, 800K cloud

Learned-path (pcrender) configs are timed by scripts/profile_learned.py.
Prints one JSON line per config; paste into PERFORMANCE.md.
"""

import functools
import json
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
from gpcr_tpu.render.renderer import (
    get_rasterize_param_from_camera, pcgc_rescale, render_views_fused,
)
from gpcr_tpu.structures.trajectory import CameraTrajectory
from gpcr_tpu.utils import sh as sh_utils
from gpcr_tpu.utils.timing import sync


def make_cloud(n, sf, seed=0, quantize=False):
    rng = np.random.RandomState(seed)
    v = rng.randn(n, 3)
    v /= np.linalg.norm(v, axis=1, keepdims=True)
    v[:, 1] *= 1.6
    v *= 0.55
    xyz = v + rng.randn(n, 3) * 0.01
    rgb = rng.rand(n, 3).astype(np.float32)
    coords = xyz * sf + 512
    if quantize:
        q = np.round(coords).astype(np.int64)
        key = (q[:, 0] * 2048 + q[:, 1]) * 2048 + q[:, 2]
        _, idx = np.unique(key, return_index=True)
        coords, rgb = q[idx].astype(np.float32), rgb[idx]
    return coords.astype(np.float32), rgb


def run_config(name, n_pts, sf, res_w, res_h, n_views, vpd, seed=0,
               quantize=False, dup_cap=4, k_budget=2_000_000,
               max_active=8192, sigma=1.0, fov=45.0, ssrate=2, frames=None):
    coords, rgb = make_cloud(n_pts, sf, seed, quantize)
    n = len(coords)
    traj = CameraTrajectory(
        mode="circle", n_imgs=n_views, total=1,
        params={"d": 0, "r": 3, "center_angles": [90, 0]},
    )
    cam = traj.get_camera(fov=fov, width_px=res_w, height_px=res_h)
    rp = get_rasterize_param_from_camera(
        cam, fov, bg=jnp.ones(3), sh_degree=1, super_sample_rate=ssrate)

    means = pcgc_rescale(jnp.asarray(coords), 512, sf)
    shs = jnp.concatenate(
        [sh_utils.RGB2SH(jnp.asarray(rgb))[:, None, :],
         jnp.zeros((n, 12, 3))], axis=1)
    scales = jnp.ones((n, 3)) * (sigma / sf)
    rotations = jnp.broadcast_to(jnp.array([1.0, 0, 0, 0]), (n, 4))
    opacity = jnp.ones((n,))
    valid = jnp.ones((n,), bool)
    normal = jnp.zeros((n, 3))

    # round-5 kernel defaults: 256-row chunks (halved per-chunk fixed
    # costs, round 3) and the 1-pass bf16 feature contraction (uint8
    # protocol, ~4e-3 < 1/255 — see RasterizeConfig.feat_precision)
    config = R.RasterizeConfig(
        max_dup_per_gaussian=dup_cap, chunk_size=256,
        k_budget=k_budget, max_active_tiles=max_active, impl="stream",
        feat_precision="default")

    def render(vt, ft, cp):
        return render_views_fused(
            vt, ft, cp, means, scales, rotations, opacity, shs, normal,
            valid, jnp.ones(3), rp["tanfov"],
            height=rp["height"], width=rp["width"],
            out_h=res_h, out_w=res_w, sh_degree=1,
            config=config, with_normal=False)

    total_frames = frames or n_views
    out = render(rp["view_t"][:vpd], rp["full_t"][:vpd], rp["campos"][:vpd])
    sync(out)

    times = []
    done = 0
    while done < total_frames:
        idx = np.array([(done + j) % n_views for j in range(vpd)])
        t0 = time.perf_counter()
        out = render(rp["view_t"][idx], rp["full_t"][idx], rp["campos"][idx])
        sync(out)
        times.append((time.perf_counter() - t0) * 1e3 / vpd)
        done += vpd

    # overflow sanity
    settings = R.GaussianRasterizationSettings(
        rp["height"], rp["width"], rp["tanfov"], rp["tanfov"], jnp.ones(12),
        1.0, rp["view_t"][0], rp["full_t"][0], 1, rp["campos"][0])
    prep = R.preprocess(
        means, opacity, settings, config, scales=scales, rotations=rotations,
        colors_precomp=jnp.zeros((n, 12)))
    gx = -(-rp["width"] // 16)
    nt = gx * (-(-rp["height"] // 16))
    _, _, ovf = R.tile_bin(prep, nt, gx, config)

    ms = float(np.median(times))
    print(json.dumps({
        "config": name, "points": int(n), "res": f"{res_w}x{res_h}",
        "ssrate": ssrate, "views_per_dispatch": vpd,
        "ms_per_frame": round(ms, 1), "fps": round(1000.0 / ms, 1),
        "frames_timed": len(times) * vpd,
        "dup_overflow": int(np.asarray(ovf)),
    }))
    return ms


def main():
    which = sys.argv[1:] or ["c1", "c3a", "c4", "c5"]
    if "c1" in which:
        run_config("c1_simple_quant256_512p", 800_000, 256, 512, 512,
                   n_views=12, vpd=4, quantize=True, dup_cap=8,
                   k_budget=2_200_000, max_active=4096)
    if "c3a" in which:
        run_config("c3a_simple_800k_1024p", 800_000, 448, 1024, 1024,
                   n_views=12, vpd=4, k_budget=1_800_000)
    if "c4" in which:
        run_config("c4_simple_1p5m_512p_orbit", 1_500_000, 448, 512, 512,
                   n_views=12, vpd=4, dup_cap=8, k_budget=3_600_000,
                   max_active=4096)
    if "c5" in which:
        run_config("c5_seq_1080p_30f", 800_000, 448, 1920, 1080,
                   n_views=30, vpd=2, frames=30, dup_cap=8,
                   k_budget=4_500_000, max_active=16384)


if __name__ == "__main__":
    main()
