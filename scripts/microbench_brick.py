"""Validate the (1,1,8) z-brick sparse-conv redesign's two assumptions.

Direct 27-offset gather conv is index-rate bound (~460M rows/s at the L0
shape -> 46 ms/conv). The brick scheme reshapes features to
(nbricks, 8, C) dense z-runs so that:
  - (dx,dy) neighbor fetch = 9 gathers of WIDE rows (8C + 2C boundary)
    from an nbricks-row table (4-8x fewer index rows), and
  - the z-taps are static strided slices feeding MXU matmuls (no per-
    voxel dz gathers at all).

Assumption A: wide-row gathers (1-2.5 KB) from ~120-250K-row tables run
at >= the 512B rate (bytes-bound, not index-bound).
Assumption B: the strided (nbr, 8, C) slice of a (nbr, 10, C) gather
output feeds dot_general without a materialized copy (tap matmuls ~3 ms
at the L0 shape, not ~30).

Run on TPU: python scripts/microbench_brick.py
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
    return float(np.median(ts)), out


def main():
    print("devices:", jax.devices())
    rng = np.random.RandomState(0)

    # ---- A: wide-row gather rates --------------------------------------
    print("A. wide-row gathers (rows/s should be bytes-bound):")
    for (tbl, width) in [(250_000, 256), (250_000, 320), (125_000, 320),
                         (250_000, 512), (125_000, 512), (64_000, 1024)]:
        src = jnp.asarray(rng.randn(tbl, width), jnp.float32)
        # locality like lex-sorted brick codes: index = own +- small
        base = np.arange(tbl)
        idx = np.clip(base + rng.randint(-2000, 2000, tbl), 0, tbl - 1)
        idx = jnp.asarray(idx, jnp.int32)

        f = jax.jit(lambda s, i: s[i])
        ms, _ = timeit(f, src, idx)
        dev = ms - 28.0
        rate = tbl / max(dev, 0.1) / 1e3
        gbs = tbl * width * 4 / max(dev, 0.1) / 1e6
        print(f"  tbl={tbl:7d} w={width:5d} ({width*4:5d}B rows): "
              f"{ms:7.1f} ms ({dev:6.1f} dev)  {rate:7.1f} M rows/s  "
              f"{gbs:6.1f} GB/s")

    # ---- B: strided z-tap matmuls --------------------------------------
    print("B. z-tap matmuls on (nbr, 10, C) slices:")
    nbr, C, Cout = 250_000, 32, 32
    gathered = jnp.asarray(rng.randn(nbr, 10, C), jnp.float32)
    w = jnp.asarray(rng.randn(3, C, Cout), jnp.float32) * 0.1

    def taps_sliced(g, w):
        out = jnp.zeros((nbr, 8, Cout), jnp.float32)
        for dz in range(3):
            out = out + jax.lax.dot_general(
                jax.lax.slice_in_dim(g, dz, dz + 8, axis=1), w[dz],
                (((2,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
        return out

    ms, _ = timeit(jax.jit(taps_sliced), gathered, w)
    fl = 3 * nbr * 8 * C * Cout * 2 / 1e9
    print(f"  sliced 3-tap: {ms:7.1f} ms  ({fl:.1f} GFLOP)")

    def taps_bf16(g, w):
        g = g.astype(jnp.bfloat16)
        w = w.astype(jnp.bfloat16)
        out = jnp.zeros((nbr, 8, Cout), jnp.float32)
        for dz in range(3):
            out = out + jax.lax.dot_general(
                jax.lax.slice_in_dim(g, dz, dz + 8, axis=1), w[dz],
                (((2,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
        return out

    ms, _ = timeit(jax.jit(taps_bf16), gathered, w)
    print(f"  bf16   3-tap: {ms:7.1f} ms")

    # ---- C: full simulated brick conv at the L0 shape ------------------
    # 9 offsets x (gather (nbr, 10C) + 3 tap matmuls) vs the measured
    # 46 ms direct conv (C9->32 / C32->32, 21.2M gather rows).
    print("C. simulated full brick conv (L0: nbr=250K, C=32->32):")
    feats = jnp.asarray(rng.randn(nbr, 10 * C), jnp.float32)  # z rows -1..8
    base = np.arange(nbr)
    bk = np.stack([np.clip(base + rng.randint(-2000, 2000, nbr), 0, nbr - 1)
                   for _ in range(9)], axis=1)
    bkmap = jnp.asarray(bk, jnp.int32)
    w27 = jnp.asarray(rng.randn(9, 3, C, Cout), jnp.float32) * 0.1

    def brick_conv(feats, bkmap, w27):
        out = jnp.zeros((nbr, 8, Cout), jnp.float32)
        for o in range(9):
            nb = feats[bkmap[:, o]].reshape(nbr, 10, C)
            for dz in range(3):
                out = out + jax.lax.dot_general(
                    jax.lax.slice_in_dim(nb, dz, dz + 8, axis=1),
                    w27[o, dz], (((2,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
        return out

    ms, _ = timeit(jax.jit(brick_conv), feats, bkmap, w27)
    print(f"  9x(gather 1.25KB + 3 taps): {ms:7.1f} ms "
          f"(vs 46 ms direct conv at this occupancy)")

    def brick_conv_bf16(feats, bkmap, w27):
        feats = feats.astype(jnp.bfloat16)
        w27 = w27.astype(jnp.bfloat16)
        out = jnp.zeros((nbr, 8, Cout), jnp.float32)
        for o in range(9):
            nb = feats[bkmap[:, o]].reshape(nbr, 10, C)
            for dz in range(3):
                out = out + jax.lax.dot_general(
                    jax.lax.slice_in_dim(nb, dz, dz + 8, axis=1),
                    w27[o, dz], (((2,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
        return out

    ms, _ = timeit(jax.jit(brick_conv_bf16), feats, bkmap, w27)
    print(f"  same, bf16 gather table:    {ms:7.1f} ms")

    # C=64 (L1 shape): nbr ~ 150K
    nbr2, C2 = 150_000, 64
    feats2 = jnp.asarray(rng.randn(nbr2, 10 * C2), jnp.float32)
    bk2 = np.stack([np.clip(np.arange(nbr2) +
                            rng.randint(-2000, 2000, nbr2), 0, nbr2 - 1)
                    for _ in range(9)], axis=1)
    bkmap2 = jnp.asarray(bk2, jnp.int32)
    w27_2 = jnp.asarray(rng.randn(9, 3, C2, C2), jnp.float32) * 0.1

    def brick_conv2(feats, bkmap, w27):
        out = jnp.zeros((nbr2, 8, C2), jnp.float32)
        for o in range(9):
            nb = feats[bkmap[:, o]].reshape(nbr2, 10, C2)
            for dz in range(3):
                out = out + jax.lax.dot_general(
                    jax.lax.slice_in_dim(nb, dz, dz + 8, axis=1),
                    w27[o, dz], (((2,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
        return out

    ms, _ = timeit(jax.jit(brick_conv2), feats2, bkmap2, w27_2)
    print(f"  L1-ish nbr=150K C=64:       {ms:7.1f} ms "
          f"(vs ~28 ms direct)")


if __name__ == "__main__":
    main()
