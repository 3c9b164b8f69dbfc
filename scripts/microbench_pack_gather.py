"""Probe: is the gather-rate cliff row-count or byte driven at the stream
shapes? Compares the round-3 layout (1.8M-row gather from an (800K, 128)
table) against k-packed variants that shrink the ROW COUNT of the source
table by packing k gaussians' 32-col slots into one wide row:

    pack4:  (200K, 128) table, idx = g >> 2, then select slot g & 3
    pack8:  (100K, 256) table, idx = g >> 3, then select slot g & 7

Table BYTES are identical (102 MB) in all three, so a speedup isolates
the row-count term of the cliff law (PERFORMANCE.md round-2 facts).
Also times the slot-select pass (with the pitfall-7 barrier) separately
and fused, since that is the price of packing.

Run on TPU: python scripts/microbench_pack_gather.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from gpcr_tpu.utils.cache import enable_persistent_cache

enable_persistent_cache()

from scripts.ablate_stream import devtime  # noqa: E402


def main():
    rng = np.random.RandomState(0)
    n, kb = 800_000, 1_800_064
    npad = -(-(n + 1) // 8) * 8
    idx = jnp.asarray(rng.randint(0, n, size=(kb,)), jnp.int32)
    base32 = jnp.asarray(rng.randn(npad, 32), jnp.float32)
    tbl128 = jnp.asarray(rng.randn(n + 1, 128), jnp.float32)
    tbl4 = base32.reshape(npad // 4, 128)
    tbl8 = base32.reshape(npad // 8, 256)

    def g128(s, tbl, ii):
        return tbl[ii + s.astype(jnp.int32) * 0][0, 0] * 0 + s + 1

    ms = devtime(g128, args=(tbl128, idx))
    print(f"baseline (800K,128) gather {kb/1e6:.1f}M: {ms:7.2f} ms "
          f"({kb/max(ms,.01)/1e3:5.0f} M rows/s)")

    def g4(s, tbl, ii):
        return tbl[(ii >> 2) + s.astype(jnp.int32) * 0][0, 0] * 0 + s + 1

    ms = devtime(g4, args=(tbl4, idx))
    print(f"pack4    (200K,128) gather {kb/1e6:.1f}M: {ms:7.2f} ms "
          f"({kb/max(ms,.01)/1e3:5.0f} M rows/s)")

    def g8(s, tbl, ii):
        return tbl[(ii >> 3) + s.astype(jnp.int32) * 0][0, 0] * 0 + s + 1

    ms = devtime(g8, args=(tbl8, idx))
    print(f"pack8    (100K,256) gather {kb/1e6:.1f}M: {ms:7.2f} ms "
          f"({kb/max(ms,.01)/1e3:5.0f} M rows/s)")

    def g4sel(s, tbl, ii):
        wide = tbl[(ii >> 2) + s.astype(jnp.int32) * 0]
        wide = jax.lax.optimization_barrier(wide)
        m = (ii & 3)[:, None]
        out = (
            jnp.where(m == 0, wide[:, 0:32], 0.0)
            + jnp.where(m == 1, wide[:, 32:64], 0.0)
            + jnp.where(m == 2, wide[:, 64:96], 0.0)
            + jnp.where(m == 3, wide[:, 96:128], 0.0)
        )
        return out[0, 0] * 0 + s + 1

    ms = devtime(g4sel, args=(tbl4, idx))
    print(f"pack4 + barrier + slot-select -> (kb,32): {ms:7.2f} ms")

    def g4sel_nb(s, tbl, ii):
        wide = tbl[(ii >> 2) + s.astype(jnp.int32) * 0]
        m = (ii & 3)[:, None]
        out = (
            jnp.where(m == 0, wide[:, 0:32], 0.0)
            + jnp.where(m == 1, wide[:, 32:64], 0.0)
            + jnp.where(m == 2, wide[:, 64:96], 0.0)
            + jnp.where(m == 3, wide[:, 96:128], 0.0)
        )
        return out[0, 0] * 0 + s + 1

    ms = devtime(g4sel_nb, args=(tbl4, idx))
    print(f"pack4 + slot-select, NO barrier (fusion risk): {ms:7.2f} ms")

    def g8sel(s, tbl, ii):
        wide = tbl[(ii >> 3) + s.astype(jnp.int32) * 0]
        wide = jax.lax.optimization_barrier(wide)
        m = (ii & 7)[:, None]
        out = jnp.zeros((kb, 32), jnp.float32)
        for j in range(8):
            out = out + jnp.where(m == j, wide[:, j * 32:(j + 1) * 32], 0.0)
        return out[0, 0] * 0 + s + 1

    ms = devtime(g8sel, args=(tbl8, idx))
    print(f"pack8 + barrier + slot-select -> (kb,32): {ms:7.2f} ms")

    # sorted-ish indices (the real sorted_g has ~20% sentinel + tile
    # locality structure; pure random is the pessimistic case) — also try
    # the real-ish mix with sentinels spread across the last rows
    mask = rng.rand(kb) < 0.2
    real = np.where(mask, n, rng.randint(0, n, size=(kb,)))
    idx_s = jnp.asarray(real, jnp.int32)
    ms = devtime(g4sel, args=(tbl4, idx_s))
    print(f"pack4 + select, 20% sentinel idx: {ms:7.2f} ms")


if __name__ == "__main__":
    main()
