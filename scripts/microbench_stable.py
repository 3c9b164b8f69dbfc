"""Stable 1-key sort cost (binning v3: depth-presorted gaussians + stable
tile sort == exact (tile, depth, gidx) ordering)."""

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp


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
    m = 6_400_000
    num_tiles = 16384
    tile = rng.randint(0, num_tiles, m).astype(np.int32)
    tile = np.where(rng.rand(m) < 0.74, num_tiles, tile).astype(np.int32)
    payload = np.arange(m, dtype=np.int32)
    t_j, p_j = jnp.asarray(tile), jnp.asarray(payload)

    print(f"floor: {timeit(lambda x: x + 1, jnp.ones(8)):6.1f} ms")
    print(f"1-key unstable 6.4M: "
          f"{timeit(lambda t, p: jax.lax.sort((t, p), num_keys=1), t_j, p_j):6.1f} ms")
    print(f"1-key stable 6.4M:   "
          f"{timeit(lambda t, p: jax.lax.sort((t, p), num_keys=1, is_stable=True), t_j, p_j):6.1f} ms")
    m2 = 3_200_000
    print(f"1-key stable 3.2M:   "
          f"{timeit(lambda t, p: jax.lax.sort((t[:m2], p[:m2]), num_keys=1, is_stable=True), t_j, p_j):6.1f} ms")
    # unique-key trick: pack (tile, slot) in i64 — unstable sort, exact order
    def packed(t, p):
        key = t.astype(jnp.float64)  # placeholder won't use
        return key

    # 2-key with slot as 2nd key (i32,i32) — equivalent to stable
    print(f"2-key (tile,slot) 6.4M: "
          f"{timeit(lambda t, p: jax.lax.sort((t, p, p), num_keys=2), t_j, p_j):6.1f} ms")
    # presort of 800K gaussians 2-key
    d = jnp.asarray(rng.rand(800_000).astype(np.float32))
    g = jnp.arange(800_000, dtype=jnp.int32)
    print(f"gaussian (depth,gidx) presort 800K: "
          f"{timeit(lambda d, g: jax.lax.sort((d, g), num_keys=1), d, g):6.1f} ms")
    # permute a 800K x 128 table by the presort
    rows = jnp.asarray(rng.rand(800_001, 128), np.float32)
    perm = jnp.asarray(rng.permutation(800_000).astype(np.int32))
    print(f"permute 800K x128 rows: "
          f"{timeit(lambda r, i: r[i], rows, perm):6.1f} ms")


if __name__ == "__main__":
    main()
