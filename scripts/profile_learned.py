"""Learned-path (PCEncoder) stage timing on the TPU at the deployed config.

Stages: quantize | plan (coord hierarchy + kmaps) | U-Net apply; plus a
per-piece breakdown of apply (conv0 / blocks per level / up path) to find
the gap vs the measured gather law (conv-fori runs 286-460M rows/s on this
chip — apply should be ~0.5 s at the deployed row count, round 1 saw 2.26 s).
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


def timeit(fn, *args, reps=3, **kw):
    out = fn(*args, **kw)
    np.asarray(jax.tree_util.tree_leaves(out)[0].ravel()[:1])
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args, **kw)
        np.asarray(jax.tree_util.tree_leaves(out)[0].ravel()[:1])
        ts.append((time.perf_counter() - t0) * 1e3)
    return float(np.median(ts)), out


def main():
    from gpcr_tpu.models.encoder import (
        PCEncoder, PCMLInfo, assemble_input_features,
    )
    from gpcr_tpu.ops import sparse

    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--jitter", type=float, default=0.002,
                    help="surface noise in world units; 0.002 (~1 voxel at "
                         "sf448) gives THuman-like level occupancy "
                         "(~0.36/0.11/0.03 per level); 0.01 is a thick fuzz "
                         "shell that stresses the engine")
    ap.add_argument("--bricks", action="store_true",
                    help="z-brick conv engine at levels 0-1")
    ap.add_argument("--dtype", choices=["f32", "bf16"], default="f32",
                    help="conv compute dtype (gather tables + MXU inputs); "
                         "bf16 halves table bytes, crossing the L0/L1 "
                         "feature tables under the ~64 MB gather-rate "
                         "cliff")
    args = ap.parse_args()

    rng = np.random.RandomState(0)
    n = 800_000
    sf = 448
    v = rng.randn(n, 3)
    v /= np.linalg.norm(v, axis=1, keepdims=True)
    v[:, 1] *= 1.6
    v *= 0.55
    xyz = v + rng.randn(n, 3) * args.jitter
    coords = np.clip(xyz * sf + 512, 0, 1023).astype(np.float32)
    rgb = rng.rand(n, 3).astype(np.float32)

    info = PCMLInfo(
        clr_encoder_channels="9 32 64 128 256 128", scale_factor=sf,
        sh_deg=1, sh_feat_deg=0,
    )
    cdt = jnp.bfloat16 if args.dtype == "bf16" else None
    model = PCEncoder(info, compute_dtype=cdt,
                      brick_levels=(0, 1) if args.bricks else ())
    params = model.init(jax.random.PRNGKey(0))

    t0 = time.perf_counter()
    caps = sparse.plan_capacities(coords)
    # brick plans always built (they also build the L0/L1 kernel maps
    # ~2x cheaper); --bricks switches the CONV engine
    from gpcr_tpu.ops import sparse_zbrick as zbrick
    bcaps = zbrick.plan_brick_capacities(coords, levels=2)
    brick_capacity = {0: bcaps[0], 1: bcaps[1]}
    print(f"plan_capacities (host): {(time.perf_counter()-t0)*1e3:7.1f} ms "
          f"caps={caps} bricks={brick_capacity}")

    feats = assemble_input_features(info, jnp.asarray(coords), jnp.asarray(rgb))

    quant = jax.jit(functools.partial(
        sparse.quantize_average, capacity=caps[0]))
    ms, grid = timeit(quant, jnp.asarray(coords), feats)
    print(f"quantize:               {ms:7.1f} ms  (N0={int(grid.num)})")

    t0 = time.perf_counter()
    plan_fn = jax.jit(functools.partial(
        model.build_plan, level_capacity=caps,
        brick_capacity=brick_capacity))
    plan = plan_fn(grid)
    lead = [k for k in plan["kmaps"] if k is not None]
    probe = lead[0] if lead else plan["bricks"][0].bkmap9
    np.asarray(probe.ravel()[:1])
    print(f"plan compile+run 1st:   {(time.perf_counter()-t0)*1e3:7.1f} ms")
    ms, plan = timeit(plan_fn, grid)
    for i, g in enumerate(plan["grids"]):
        print(f"  level {i}: num={int(g.num)} cap={g.capacity}")
    print(f"plan steady:            {ms:7.1f} ms")

    t0 = time.perf_counter()
    apply_fn = jax.jit(model.apply)
    out = apply_fn(params, grid, plan)
    np.asarray(out.primitives.ravel()[:1])
    print(f"apply compile+run 1st:  {(time.perf_counter()-t0)*1e3:7.1f} ms")
    ms, _ = timeit(apply_fn, params, grid, plan)
    print(f"apply steady:           {ms:7.1f} ms")

    # ---- apply sub-stages --------------------------------------------------
    unet = model.unet
    up = params["color_encoder"]
    grids, kmaps = plan["grids"], plan["kmaps"]

    bricks = plan.get("bricks", {})

    def conv_at(lvl, cin, cout, reps=1):
        g = grids[lvl]
        w = jnp.asarray(rng.rand(27, cin, cout), jnp.float32) * 0.01
        if lvl in bricks:
            from gpcr_tpu.ops import sparse_zbrick as zbrick
            bplan = bricks[lvl]
            fb = jnp.asarray(rng.rand(
                bplan.capacity, bplan.z, cin), jnp.float32)

            def fn(f, w):
                return zbrick.brick_conv(f, w, None, bplan)

            ms, _ = timeit(jax.jit(fn), fb, w)
            rows = 10 * bplan.capacity + bplan.dcapacity
            print(f"  BRICK conv L{lvl} C{cin}->{cout}: {ms:7.1f} ms "
                  f"({rows/1e6:.1f}M wide rows, B={bplan.capacity} "
                  f"D={bplan.dcapacity})")
            return

        def fn(f, w):
            return sparse.conv(g.replace(feats=f), kmaps[lvl], w, None,
                               compute_dtype=cdt)

        f = jnp.asarray(rng.rand(g.capacity, cin), jnp.float32)
        ms, _ = timeit(jax.jit(fn), f, w)
        rows = 27 * g.capacity
        print(f"  conv k3 L{lvl} C{cin}->{cout}: {ms:7.1f} ms "
              f"({rows/1e6:.1f}M rows)")

    conv_at(0, 9, 32)
    conv_at(0, 32, 32)
    conv_at(1, 64, 64)
    conv_at(2, 128, 128)
    conv_at(3, 256, 256)


if __name__ == "__main__":
    main()
