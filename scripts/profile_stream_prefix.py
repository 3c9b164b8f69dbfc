"""IN-GRAPH prefix ablation of blend_stream at the bench shape.

Isolated per-stage timings (scripts/ablate_stream.py) sum to ~27 ms while
the real bin_sorted_stream graph measures ~43 ms — fusion/scheduling
interactions make isolated numbers lie. This measures PREFIXES of the
actual graph (blend_stream stage cuts) with the K-chained harness; the
cost of stage k is the delta between consecutive prefixes, fusion
included.

Run on TPU: python scripts/profile_stream_prefix.py [--chunk 256]
"""

import argparse
import functools
import os
import sys

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
from scripts.ablate_stream import devtime


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--chunk", type=int, default=256)
    ap.add_argument("--max_active", type=int, default=6144)
    ap.add_argument("--shape", default="bench", choices=["bench", "learned"],
                    help="'learned' = the pcrender CLI shape: 512^2 out "
                    "x2SS (1024^2 internal), dup_cap 16, k_budget 7.5M, "
                    "anisotropic low-opacity splats (the deployed "
                    "clamp(0,1) opacities)")
    ap.add_argument("--opacity_radius", type=int, default=-1,
                    help="-1 = shape default (bench: off, learned: on)")
    ap.add_argument("--stages", default="presort,packed,emit,sort,starts,"
                    "bin,kernel,full",
                    help="comma list (one process compiles each; split "
                    "across runs if compiles exceed the timeout)")
    args = ap.parse_args()

    rng = np.random.RandomState(0)
    n = 800_000
    learned = args.shape == "learned"
    res, ssrate, sf, fov = (512 if learned else 1024), 2, 448, 45.0
    v = rng.randn(n, 3)
    v /= np.linalg.norm(v, axis=1, keepdims=True)
    v[:, 1] *= 1.6
    v *= 0.55
    coords = ((v + rng.randn(n, 3) * 0.01) * sf + 512).astype(np.float32)
    rgb = rng.rand(n, 3).astype(np.float32)

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
    opr = (learned if args.opacity_radius < 0 else bool(args.opacity_radius))
    config = R.RasterizeConfig(
        max_dup_per_gaussian=16 if learned else 4, chunk_size=args.chunk,
        k_budget=7_500_000 if learned else 1_800_000,
        max_active_tiles=args.max_active, impl="stream",
        opacity_radius=opr,
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
    feats = jnp.concatenate(
        [sh_utils.eval_sh_color(1, shs, means, settings.campos),
         means, jnp.ones_like(means), jnp.zeros_like(means)], axis=-1
    )
    if learned:
        # learned-splat-like params: anisotropic scales around the
        # voxel pitch, random rotations, clamp(0,1)-style opacities
        ops = jnp.asarray(rng.uniform(0.0, 1.0, (n,)), jnp.float32)
        scales_ = jnp.asarray(
            rng.uniform(0.5, 2.5, (n, 3)), jnp.float32) * (1.0 / sf)
        rots_ = jnp.asarray(rng.randn(n, 4), jnp.float32)
        rots_ = rots_.at[:, 0].add(2.0)
    else:
        ops = jnp.ones((n,))
        scales_ = jnp.ones((n, 3)) * (1.0 / sf)
        rots_ = jnp.broadcast_to(jnp.array([1.0, 0, 0, 0]), (n, 4))
    prep = jax.jit(functools.partial(
        R.preprocess, settings=settings, config=config))(
        means, ops, scales=scales_, rotations=rots_,
        colors_precomp=feats)
    area = (prep.rect[:, 2] - prep.rect[:, 0]) * (
        prep.rect[:, 3] - prep.rect[:, 1])
    tot = int(jnp.sum(jnp.where(prep.valid, area, 0)))
    print(f"shape={args.shape} opacity_radius={opr} entries={tot} "
          f"k_budget={config.k_budget}")

    stages = [s for s in args.stages.split(",") if s]
    prev = 0.0
    print(f"chunk={args.chunk} max_active={args.max_active} "
          f"tps={config.tiles_per_step} cap={config.max_dup_per_gaussian}")
    for st in stages:
        def step(s, pr, st=st):
            p2 = pr._replace(depth=pr.depth + s * 1e-20)
            out, t_run, ovf, _wd = S.blend_stream(
                p2, jnp.ones(12), num_tiles, grid_x, config, 12, stage=st)
            return (out.reshape(-1)[0] * 0 + t_run.reshape(-1)[0] * 0
                    + s + 1)

        ms = devtime(step, args=(prep,))
        print(f"prefix {st:8s}: {ms:7.2f} ms   (+{ms - prev:6.2f})")
        prev = ms


if __name__ == "__main__":
    main()
