"""Per-stage breakdown of SparseUNet.build_plan at the deployed 800K shape.

The plan is on the per-frame path for ANIMATED clouds (BASELINE config 5:
a new point cloud every frame -> geometry cache misses every frame), so
its 355 ms steady cost matters beyond first-frame latency. Stages timed
as separate jits (same shapes as scripts/profile_learned.py):

  downsample L0->1->2->3 | brick plan L0/L1 | kmap-from-bricks L0/L1 |
  direct kmap L2/L3 | max_delta

Run on TPU: PYTHONPATH=/root/repo:/root/.axon_site python
scripts/profile_plan.py
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


def timeit(fn, *args, reps=3):
    out = fn(*args)
    np.asarray(jax.tree_util.tree_leaves(out)[0].ravel()[:1])
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        np.asarray(jax.tree_util.tree_leaves(out)[0].ravel()[:1])
        ts.append((time.perf_counter() - t0) * 1e3)
    return float(np.median(ts)), out


def main():
    from gpcr_tpu.ops import sparse
    from gpcr_tpu.ops import sparse_zbrick as zbrick

    rng = np.random.RandomState(0)
    n = 800_000
    sf = 448
    v = rng.randn(n, 3)
    v /= np.linalg.norm(v, axis=1, keepdims=True)
    v[:, 1] *= 1.6
    v += rng.randn(n, 3) * 0.002
    coords = (v * 0.45 + 0.5) * sf * 2
    coords = np.clip(coords, 0, 1023).astype(np.float32)
    feats = rng.rand(n, 9).astype(np.float32)

    caps = sparse.plan_capacities(coords)
    bcaps = zbrick.plan_brick_capacities(coords, levels=2)
    print(f"caps={caps} bcaps={bcaps}")

    g0 = jax.jit(functools.partial(sparse.quantize_average,
                                   capacity=caps[0]))(
        jnp.asarray(coords), jnp.asarray(feats))
    jax.block_until_ready(g0.codes)

    grids = [g0]
    for lvl in range(3):
        ms, (pg, ps, oc) = timeit(
            jax.jit(functools.partial(sparse.downsample_coords,
                                      capacity=caps[lvl + 1])), grids[-1])
        print(f"downsample L{lvl}->L{lvl+1}: {ms:7.1f} ms "
              f"(num={int(pg.num)} cap={pg.capacity})")
        grids.append(pg)

    bricks = {}
    for lvl in (0, 1):
        bcap, dcap = bcaps[lvl]
        ms, bp = timeit(
            jax.jit(functools.partial(zbrick.build_brick_plan,
                                      capacity=bcap,
                                      dilated_capacity=dcap)), grids[lvl])
        print(f"brick plan L{lvl}:      {ms:7.1f} ms (B={bcap} D={dcap})")
        bricks[lvl] = bp

    for lvl in (0, 1):
        ms, km = timeit(jax.jit(zbrick.build_kernel_map_bricks),
                        grids[lvl], bricks[lvl])
        print(f"kmap-from-bricks L{lvl}: {ms:6.1f} ms")
        ms, md = timeit(jax.jit(sparse.kmap_max_delta), km)
        print(f"  max_delta:          {ms:7.1f} ms")

    for lvl in (2, 3):
        ms, km = timeit(
            jax.jit(functools.partial(sparse.build_kernel_map,
                                      kernel_size=3)), grids[lvl])
        print(f"direct kmap L{lvl}:     {ms:7.1f} ms (cap={grids[lvl].capacity})")
        ms, md = timeit(jax.jit(sparse.kmap_max_delta), km)
        print(f"  max_delta:          {ms:7.1f} ms")


if __name__ == "__main__":
    main()
