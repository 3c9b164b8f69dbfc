"""Train-step latency at deployment scale: forward+backward through the
rasterizer at 800K points / 512^2 output x2 supersampling (1024^2
internal), the reference's training resolution class.

Compares the round-4 custom_vjp replay-kernel path (impl="stream",
ops/rasterize_stream_vjp.py) against the XLA differentiable-scan path
(impl="xla", bounded by max_chunks) — the VERDICT r3 "fast-path
backward" done-criterion: one step in seconds, not minutes.

Run on TPU: python scripts/bench_train_step.py [--impl stream|xla]
"""

import argparse
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
    get_rasterize_param_from_camera, pcgc_rescale,
)
from gpcr_tpu.structures.trajectory import CameraTrajectory
from gpcr_tpu.utils.timing import sync


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--impl", default="stream", choices=["stream", "xla"])
    ap.add_argument("--points", type=int, default=800_000)
    ap.add_argument("--res", type=int, default=512)
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--chunk", type=int, default=128)
    ap.add_argument("--k_budget", type=int, default=6_000_000)
    ap.add_argument("--max_active", type=int, default=4096)
    ap.add_argument("--dup_cap", type=int, default=8)
    args = ap.parse_args()

    rng = np.random.RandomState(0)
    n = args.points
    sf, fov, ssrate = 448, 45.0, 2
    v = rng.randn(n, 3)
    v /= np.linalg.norm(v, axis=1, keepdims=True)
    v[:, 1] *= 1.6
    v *= 0.55
    coords = ((v + rng.randn(n, 3) * 0.01) * sf + 512).astype(np.float32)
    feats = rng.rand(n, 3).astype(np.float32)

    traj = CameraTrajectory(
        mode="circle", n_imgs=2, total=1,
        params={"d": 0, "r": 3, "center_angles": [90, 0]},
    )
    cam = traj.get_camera(fov=fov, width_px=args.res, height_px=args.res)
    rp = get_rasterize_param_from_camera(
        cam, fov, bg=jnp.ones(3), sh_degree=0, super_sample_rate=ssrate)
    means0 = pcgc_rescale(jnp.asarray(coords), 512, sf)
    H = W = args.res * ssrate

    config = R.RasterizeConfig(
        max_dup_per_gaussian=args.dup_cap, chunk_size=args.chunk,
        k_budget=args.k_budget, max_active_tiles=args.max_active,
        impl=args.impl, differentiable=True,
        max_chunks=64,
    )
    settings = R.GaussianRasterizationSettings(
        image_height=H, image_width=W, tanfovx=rp["tanfov"],
        tanfovy=rp["tanfov"], bg=jnp.ones(3), scale_modifier=1.0,
        viewmatrix=rp["view_t"][0], projmatrix=rp["full_t"][0],
        sh_degree=0, campos=rp["campos"][0],
    )
    target = jnp.zeros((3, H, W)) + 0.5

    def loss(m, s, q, o, f):
        color, _ = R.rasterize_gaussians(
            m, o, settings, scales=s, rotations=q, colors_precomp=f,
            config=config)
        return jnp.mean((color - target) ** 2)

    grad = jax.jit(jax.value_and_grad(loss, argnums=(0, 1, 3, 4)))
    argvals = (
        means0,
        jnp.ones((n, 3)) * (1.0 / sf),
        jnp.broadcast_to(jnp.array([1.0, 0, 0, 0]), (n, 4)),
        jnp.full((n,), 0.9),
        jnp.asarray(feats),
    )

    t0 = time.perf_counter()
    val, g = grad(*argvals)
    sync(val)
    compile_s = time.perf_counter() - t0
    gn = [float(jnp.abs(x).max()) for x in jax.tree_util.tree_leaves(g)]
    ts = []
    for _ in range(args.reps):
        t0 = time.perf_counter()
        val, g = grad(*argvals)
        sync((val, g[0]))
        ts.append(time.perf_counter() - t0)
    med = float(np.median(ts)) * 1e3
    print(f"impl={args.impl} fwd+bwd {args.points/1e3:.0f}K/"
          f"{args.res}^2x{ssrate}ss: {med:.1f} ms/step "
          f"(compile {compile_s:.0f}s, loss {float(val):.5f}, "
          f"max|g| {max(gn):.3e}, reps {[round(t*1e3) for t in ts]})")


if __name__ == "__main__":
    main()
