"""Microbenchmark the TPU primitives that bound the rasterizer binning:
lax.sort variants, row/column gathers, scatter-add, searchsorted, cumsum.

Run on the real chip. All timings use runtime arguments (no constant
folding) and D2H sync (block_until_ready is a no-op on axon).
"""

import functools
import time

import jax
import jax.numpy as jnp
import numpy as np

from gpcr_tpu.utils.timing import sync


def timeit(fn, *args, reps=5):
    out = fn(*args)
    sync(out)
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        sync(out)
        ts.append((time.perf_counter() - t0) * 1e3)
    return float(np.median(ts))


def main():
    rng = np.random.RandomState(0)
    results = {}

    for k in (2_000_000, 6_400_000):
        tile = jnp.asarray(rng.randint(0, 16384, k).astype(np.int32))
        depth = jnp.asarray(rng.rand(k).astype(np.float32))
        gidx = jnp.asarray(rng.randint(0, 800_000, k).astype(np.int32))

        f2 = jax.jit(lambda a, b, c: jax.lax.sort((a, b, c), num_keys=2))
        results[f"sort2key_{k}"] = timeit(f2, tile, depth, gidx)

        f1 = jax.jit(
            lambda a, c: jax.lax.sort((a, c), num_keys=1, is_stable=True)
        )
        results[f"sort1key_stable_{k}"] = timeit(f1, tile, gidx)

        f1u = jax.jit(lambda a, c: jax.lax.sort((a, c), num_keys=1))
        results[f"sort1key_{k}"] = timeit(f1u, tile, gidx)

    # gaussian-level depth sort
    d800 = jnp.asarray(rng.rand(800_000).astype(np.float32))
    i800 = jnp.arange(800_000, dtype=jnp.int32)
    results["sort_800k_depth"] = timeit(
        jax.jit(lambda a, b: jax.lax.sort((a, b), num_keys=1)), d800, i800
    )

    # gathers
    tblN = jnp.asarray(rng.rand(800_001, 24).astype(np.float32))
    idx2m = jnp.asarray(rng.randint(0, 800_000, 2_000_000).astype(np.int32))
    results["gather_rows_2M_w24"] = timeit(
        jax.jit(lambda t, i: t[i]), tblN, idx2m
    )
    tbl8 = jnp.asarray(rng.rand(800_001, 8).astype(np.float32))
    results["gather_rows_2M_w8"] = timeit(
        jax.jit(lambda t, i: t[i]), tbl8, idx2m
    )
    tblT = jnp.asarray(rng.rand(24, 800_001).astype(np.float32))
    results["gather_cols_2M_w24"] = timeit(
        jax.jit(lambda t, i: t[:, i]), tblT, idx2m
    )
    # gather from small table (16K rows)
    tblS = jnp.asarray(rng.rand(16384, 4).astype(np.float32))
    idxs = jnp.asarray(rng.randint(0, 16384, 2_300_000).astype(np.int32))
    results["gather_small_2.3M_w4"] = timeit(
        jax.jit(lambda t, i: t[i]), tblS, idxs
    )

    # scatter-add 800K marks into 2M
    upd = jnp.ones((800_000,), jnp.int32)
    tgt_idx = jnp.asarray(
        np.sort(rng.randint(0, 2_000_000, 800_000)).astype(np.int32)
    )
    results["scatter_add_800k_into_2M"] = timeit(
        jax.jit(
            lambda i, u: jnp.zeros((2_000_001,), jnp.int32).at[i].add(u)
        ),
        tgt_idx, upd,
    )
    # scatter-add 16K marks into 2.3M
    upd16 = jnp.ones((16384,), jnp.int32)
    t16 = jnp.asarray(
        np.sort(rng.randint(0, 2_300_000, 16384)).astype(np.int32)
    )
    results["scatter_add_16k_into_2.3M"] = timeit(
        jax.jit(
            lambda i, u: jnp.zeros((2_300_001,), jnp.int32).at[i].add(u)
        ),
        t16, upd16,
    )

    # cumsums
    x2m = jnp.asarray(rng.rand(2_300_000).astype(np.float32))
    results["cumsum_2.3M_f32"] = timeit(jax.jit(jnp.cumsum), x2m)
    xi = x2m.astype(jnp.int32)
    results["cumsum_2.3M_i32"] = timeit(jax.jit(jnp.cumsum), xi)

    # searchsorted 16K queries in 2M sorted
    srt = jnp.sort(tile[:2_000_000])
    q = jnp.arange(16385, dtype=jnp.int32)
    results["searchsorted_16k_in_2M"] = timeit(
        jax.jit(lambda s, q: jnp.searchsorted(s, q)), srt, q
    )

    # argsort 16K (active-tile ordering)
    c16 = jnp.asarray(rng.randint(0, 4000, 16384).astype(np.int32))
    results["argsort_16k"] = timeit(jax.jit(lambda c: jnp.argsort(-c)), c16)

    # big transpose (Kc, CH, 24) -> (Kc, 24, CH)
    big = jnp.asarray(rng.rand(18000, 128, 24).astype(np.float32))
    results["transpose_18k_128_24"] = timeit(
        jax.jit(lambda b: b.transpose(0, 2, 1).copy()), big
    )

    for name, ms in results.items():
        print(f"{name:32s} {ms:8.2f} ms")


if __name__ == "__main__":
    main()
