"""Feasibility numbers for the rank-keyed binning redesign:

  current: emit g-major (transpose OR lane-waste ~10 ms) +
           stable 1-key sort (tile, g) ~5-8 ms             => ~15.5 ms
  proposed: emit (tile, rank) slot-major (both flattens free) +
           2-key sort of the pair (rank breaks ties = depth order) +
           one 800Kx128 permute gather (packed -> rank order)

Measures the two unknowns with honest D2H timing.

Run on TPU: python scripts/microbench_rank_sort.py
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

from gpcr_tpu.utils.timing import sync


def d2h_time(fn, *args, reps=8):
    out = fn(*args)
    sync(out)
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        sync(fn(*args))
        ts.append((time.perf_counter() - t0) * 1e3)
    return float(np.median(ts)) - 27.0


def main():
    rng = np.random.RandomState(0)
    n, m = 800_000, 3_200_000
    tiles = jnp.asarray(rng.randint(0, 16385, size=(m,)), jnp.int32)
    ranks = jnp.asarray(rng.randint(0, n, size=(m,)), jnp.int32)

    @jax.jit
    def s2key(t, r):
        return jax.lax.sort((t, r), num_keys=2)

    print(f"2-key 2-arr sort 3.2M      : {d2h_time(s2key, tiles, ranks):7.2f} ms")

    @jax.jit
    def s1key_stable(t, r):
        return jax.lax.sort((t, r), num_keys=1, is_stable=True)

    print(f"1-key stable 2-arr (ref)   : "
          f"{d2h_time(s1key_stable, tiles, ranks):7.2f} ms")

    tbl = jnp.asarray(rng.randn(n + 1, 128), jnp.float32)
    perm = jnp.asarray(rng.permutation(n + 1), jnp.int32)

    @jax.jit
    def permute(tb, pm):
        return tb[pm]

    print(f"800Kx128 permute gather    : {d2h_time(permute, tbl, perm):7.2f} ms")

    # emit slot-major with rank keys + 2-key sort, full composition
    rminx = jnp.asarray(rng.randint(0, 126, size=(n,)), jnp.int32)
    rminy = jnp.asarray(rng.randint(0, 126, size=(n,)), jnp.int32)
    rw = jnp.asarray(rng.randint(1, 3, size=(n,)), jnp.int32)
    rh = jnp.asarray(rng.randint(1, 3, size=(n,)), jnp.int32)
    valid = jnp.asarray((rng.rand(n) < 0.95).astype(np.int32))
    cap, grid_x, num_tiles = 4, 128, 16384

    @jax.jit
    def emit_rank_sort(rx, ry, w, h, vl):
        valid_s = vl.astype(bool)[None, :]
        rw_ = jnp.maximum(w, 1)[None, :]
        area = jnp.where(valid_s, jnp.minimum((w * h)[None, :], cap), 0)
        k = jax.lax.broadcasted_iota(jnp.int32, (cap, n), 0)
        kdiv = jnp.zeros((cap, n), jnp.int32)
        for j in range(1, cap):
            kdiv = kdiv + (k >= j * rw_).astype(jnp.int32)
        kmod = k - kdiv * rw_
        ty = ry[None, :] + kdiv
        tx = rx[None, :] + kmod
        dup_valid = valid_s & (k < area)
        tile = jnp.where(dup_valid, ty * grid_x + tx, num_tiles)
        rank = jax.lax.broadcasted_iota(jnp.int32, (cap, n), 1)
        rank = jnp.where(dup_valid, rank, n)
        return jax.lax.sort(
            (tile.reshape(-1), rank.reshape(-1)), num_keys=2)

    print(f"emit slot-major + 2-key    : "
          f"{d2h_time(emit_rank_sort, rminx, rminy, rw, rh, valid):7.2f} ms")


if __name__ == "__main__":
    main()
