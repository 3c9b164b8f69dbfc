"""conv (27-gather blocked) vs conv9 (augmented z-packed, 9 gathers) at the
real level shapes — decide the default k3 engine."""

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

from gpcr_tpu.ops import sparse


def timeit(fn, *args, reps=3):
    out = fn(*args)
    np.asarray(jax.tree_util.tree_leaves(out)[0].ravel()[:1])
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        np.asarray(jax.tree_util.tree_leaves(out)[0].ravel()[:1])
        ts.append((time.perf_counter() - t0) * 1e3)
    return float(np.median(ts))


def main():
    rng = np.random.RandomState(0)
    n = 800_000
    sf = 448
    v = rng.randn(n, 3)
    v /= np.linalg.norm(v, axis=1, keepdims=True)
    v[:, 1] *= 1.6
    v *= 0.55
    xyz = v + rng.randn(n, 3) * 0.002
    coords = np.clip(xyz * sf + 512, 0, 1023).astype(np.float32)

    caps = sparse.plan_capacities(coords)
    print("caps", caps)
    grid = jax.jit(functools.partial(
        sparse.quantize_average, capacity=caps[0]))(
        jnp.asarray(coords), jnp.asarray(rng.rand(n, 9), jnp.float32))

    grids = [grid]
    g = grid
    for lvl in range(3):
        pg, _, _ = sparse.downsample_coords(g, capacity=caps[lvl + 1])
        grids.append(pg)
        g = pg

    floor = timeit(jax.jit(lambda x: x + 1), jnp.ones(8))
    print(f"floor: {floor:6.1f} ms")

    for lvl, cin in [(0, 32), (1, 64), (2, 128)]:
        g = grids[lvl].replace(
            feats=jnp.asarray(
                rng.rand(grids[lvl].capacity, cin), jnp.float32))
        kmap = jax.jit(functools.partial(
            sparse.build_kernel_map, kernel_size=3))(g)
        km9 = jax.jit(sparse.build_kernel_map9)(g)
        print(f"L{lvl} cap={g.capacity} anum={int(km9['anum'])} "
              f"max_dev={int(km9['max_delta'])}")
        w = jnp.asarray(rng.rand(27, cin, cin), jnp.float32)

        ms = timeit(jax.jit(functools.partial(sparse.conv)), g, kmap, w)
        print(f"  conv27 blocked:  {ms:7.1f} ms")
        ms = timeit(jax.jit(functools.partial(sparse.conv9)), g, km9, w)
        print(f"  conv9 augmented: {ms:7.1f} ms")
        for blk, win in ((16_384, 8_192), (32_768, 8_192)):
            ms = timeit(jax.jit(functools.partial(
                sparse.conv9, block=blk, window=win)), g, km9, w)
            print(f"  conv9 B{blk//1024}K W{win//1024}K: {ms:7.1f} ms")


if __name__ == "__main__":
    main()
