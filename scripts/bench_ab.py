"""In-process A/B of bench configs — the only valid comparison on this
stack (the stream gather is BIMODAL ACROSS PROCESSES, ±10 ms of
allocation luck for identical ops; PERFORMANCE.md round 4). All configs
run in ONE process so they share the same luck; deltas are real.

Run on TPU: python scripts/bench_ab.py [name=...] ...
Default set: base, bf16 (feat_precision=default), mxu scan, kb1.6M.
"""

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

N = 800_000
RES, SS, SF, FOV = 1024, 2, 448, 45.0
VPD = 16
FRAMES = 4


def build_scene():
    rng = np.random.RandomState(0)
    v = rng.randn(N, 3)
    v /= np.linalg.norm(v, axis=1, keepdims=True)
    v[:, 1] *= 1.6
    v *= 0.55
    xyz_world = v + rng.randn(N, 3) * 0.01
    rgb = rng.rand(N, 3).astype(np.float32)
    coords = (xyz_world * SF + 512).astype(np.float32)
    traj = CameraTrajectory(
        mode="circle", n_imgs=FRAMES, total=1,
        params={"d": 0, "r": 3, "center_angles": [90, 0]},
    )
    cam = traj.get_camera(fov=FOV, width_px=RES, height_px=RES)
    rp = get_rasterize_param_from_camera(
        cam, FOV, bg=jnp.ones(3), sh_degree=1, super_sample_rate=SS,
    )
    means = pcgc_rescale(jnp.asarray(coords), 512, SF)
    shs = jnp.concatenate(
        [sh_utils.RGB2SH(jnp.asarray(rgb))[:, None, :],
         jnp.zeros((N, 12, 3))], axis=1,
    )
    scales = jnp.ones((N, 3)) * (1.0 / SF)
    rotations = jnp.broadcast_to(jnp.array([1.0, 0, 0, 0]), (N, 4))
    opacity = jnp.ones((N,))
    valid = jnp.ones((N,), bool)
    normal = jnp.zeros((N, 3))
    return rp, means, scales, rotations, opacity, shs, normal, valid


def run_config(name, config, scene, reps=FRAMES):
    rp, means, scales, rotations, opacity, shs, normal, valid = scene

    def render_frame(view_t, full_t, campos):
        return render_views_fused(
            view_t, full_t, campos,
            means, scales, rotations, opacity, shs, normal, valid,
            jnp.ones(3), rp["tanfov"],
            height=rp["height"], width=rp["width"],
            out_h=RES, out_w=RES, sh_degree=1,
            config=config, with_normal=False,
        )

    def views(i):
        idx = np.array([(i + j) % FRAMES for j in range(VPD)])
        return rp["view_t"][idx], rp["full_t"][idx], rp["campos"][idx]

    out = render_frame(*views(0))
    sync(out)
    times = []
    for i in range(reps):
        t0 = time.perf_counter()
        out = render_frame(*views(i))
        sync(out)
        times.append((time.perf_counter() - t0) * 1000.0 / VPD)
    ms = float(np.median(times))
    print(f"{name:16s}: {ms:7.2f} ms/frame  "
          f"{[round(t, 1) for t in times]}", flush=True)
    return ms


def main():
    base = R.RasterizeConfig(
        max_dup_per_gaussian=4, chunk_size=256, tile_batch=256,
        k_budget=1_800_000, max_active_tiles=6144, impl="stream",
        tiles_per_step=4, feat_precision="highest", scan="flat",
    )
    named = {
        "base": base,
        "bf16": base._replace(feat_precision="default"),
        "mxu": base._replace(scan="mxu"),
        "bf16+mxu": base._replace(feat_precision="default", scan="mxu"),
        "kb1.6M": base._replace(k_budget=1_600_000),
        "kb1.7M": base._replace(k_budget=1_700_096),
        "bf16+kb1.7M": base._replace(k_budget=1_700_096,
                                     feat_precision="default"),
    }
    sel = sys.argv[1:] or ["base", "bf16", "kb1.6M", "base"]
    scene = build_scene()
    results = {}
    for name in sel:
        if name.startswith("kb="):
            cfg = base._replace(k_budget=int(name[3:]))
        else:
            cfg = named[name]
        results[name] = run_config(name, cfg, scene)
    b = results.get("base")
    if b:
        for name, ms in results.items():
            print(f"# {name}: {ms - b:+.2f} ms vs base")


if __name__ == "__main__":
    main()
