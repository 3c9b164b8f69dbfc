"""Measure lax.sort strategies for tile binning on the TPU.

The binning sort is the largest single cost in the stream rasterizer
(~40 ms device time for 6.4M 2-key entries at the bench config). Candidates:

  a) current: sort (tile i32, depth f32, gidx i32) num_keys=2
  b) packed64: key = tile<<32 | depth_bits, payload gidx — 1 key, 2 operands
  c) presort: sort gaussians by depth first (800K), then duplicate in depth
     order and sort (tile i32, slot i32) num_keys=1 (unique-ish ordering via
     stability not needed: slot asc within tile = depth order) — needs the
     slot as payload anyway, so sort (tile, slot) with slot as SECOND KEY:
     equivalent ordering, but both keys i32
  d) presort+pack: key = tile*2^23 + slot packed in i64, payload gidx
  e) cap effect: same as (a) with cap 4 (half the entries)
"""

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax

jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp


def timeit(fn, *args, reps=5):
    out = jax.jit(fn)(*args)
    np.asarray(jax.tree_util.tree_leaves(out)[0][:1])  # sync
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = jax.jit(fn)(*args)
        np.asarray(jax.tree_util.tree_leaves(out)[0][:1])
        ts.append((time.perf_counter() - t0) * 1e3)
    return float(np.median(ts))


def main():
    rng = np.random.RandomState(0)
    n = 800_000
    cap = 8
    num_tiles = 16384

    # realistic: ~20% of slots valid, tiles clustered
    tile = rng.randint(0, num_tiles, size=n * cap).astype(np.int32)
    valid = rng.rand(n * cap) < 0.26
    tile = np.where(valid, tile, num_tiles).astype(np.int32)
    depth = rng.rand(n * cap).astype(np.float32) * 4 + 0.2
    gidx = np.repeat(np.arange(n, dtype=np.int32), cap)

    tile_j = jnp.asarray(tile)
    depth_j = jnp.asarray(depth)
    gidx_j = jnp.asarray(gidx)

    ms = timeit(lambda x: x + 1, jnp.ones(8))
    print(f"dispatch floor:                     {ms:7.1f} ms")

    def a(t, d, g):
        return jax.lax.sort((t, d, g), num_keys=2)

    print(f"a) 2-key (tile,depth)+gidx 6.4M:    {timeit(a, tile_j, depth_j, gidx_j):7.1f} ms")

    def b(t, d, g):
        # depth > 0 so its f32 bits are a positive i32: order-preserving
        dbits = jax.lax.bitcast_convert_type(d, jnp.int32).astype(jnp.int64)
        key = (t.astype(jnp.int64) << 32) | dbits
        return jax.lax.sort((key, g), num_keys=1)

    print(f"b) packed i64 key + gidx 6.4M:      {timeit(b, tile_j, depth_j, gidx_j):7.1f} ms")

    def c_pre(d):
        g = jnp.arange(n, dtype=jnp.int32)
        return jax.lax.sort((d[:n], g), num_keys=1)

    print(f"c0) gaussian depth presort 800K:    {timeit(c_pre, depth_j):7.1f} ms")

    slot = jnp.arange(n * cap, dtype=jnp.int32)

    def c(t, s, g):
        return jax.lax.sort((t, s, g), num_keys=2)

    print(f"c) 2-key (tile,slot i32)+gidx 6.4M: {timeit(c, tile_j, slot, gidx_j):7.1f} ms")

    def d(t, s, g):
        key = t.astype(jnp.int64) * (1 << 23) + s.astype(jnp.int64)
        return jax.lax.sort((key, g), num_keys=1)

    print(f"d) packed i64 (tile,slot) 6.4M:     {timeit(d, tile_j, slot, gidx_j):7.1f} ms")

    # d2: i32 packing — tile(14b) * 2^18 + slot-within-block? slot needs 23
    # bits globally, BUT if we sort in S independent shards and merge by
    # concatenation... not order-preserving across shards. skip.

    def e(t, d, g):
        m = n * 4
        return jax.lax.sort((t[:m], d[:m], g[:m]), num_keys=2)

    print(f"e) 2-key at cap=4 (3.2M):           {timeit(e, tile_j, depth_j, gidx_j):7.1f} ms")

    def f(t, d, g):
        dbits = jax.lax.bitcast_convert_type(d, jnp.int32).astype(jnp.int64)
        key = (t.astype(jnp.int64) << 32) | dbits
        m = n * 4
        return jax.lax.sort((key[:m], g[:m]), num_keys=1)

    print(f"f) packed i64 at cap=4 (3.2M):      {timeit(f, tile_j, depth_j, gidx_j):7.1f} ms")

    # g) segmented: reshape to (64, 100K) and vmap-sort rows independently
    # (NOT a correct global sort — measures the pass-count effect only)
    def g_seg(t, d, g):
        tt = t.reshape(64, -1)
        dd = d.reshape(64, -1)
        gg = g.reshape(64, -1)
        return jax.vmap(lambda a_, b_, c_: jax.lax.sort((a_, b_, c_), num_keys=2))(tt, dd, gg)

    print(f"g) 64x100K vmapped sorts (shape):   {timeit(g_seg, tile_j, depth_j, gidx_j):7.1f} ms")

    # h) sort keys only, no payload (lower bound for data movement)
    def h(t, d):
        return jax.lax.sort((t, d), num_keys=2)

    print(f"h) 2-key, no payload 6.4M:          {timeit(h, tile_j, depth_j):7.1f} ms")

    # i) single i32 key + payload (what a quantized-depth key would cost)
    def i_fn(t, g):
        return jax.lax.sort((t, g), num_keys=1)

    print(f"i) 1-key i32 + gidx 6.4M:           {timeit(i_fn, tile_j, gidx_j):7.1f} ms")


if __name__ == "__main__":
    main()
