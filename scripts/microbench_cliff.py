"""Find the gather-rate cliff vs source-table size, and test the blocked-
window gather (slice a small window per block, gather locally)."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp


def timeit(fn, *args, reps=3):
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
    floor = timeit(lambda x: x + 1, jnp.ones(8))
    print(f"floor: {floor:6.1f} ms")

    m = 8_000_000  # gather count fixed
    for n, c in [(65_536, 32), (131_072, 32), (262_144, 32), (524_288, 32),
                 (1_048_576, 32), (262_144, 128), (524_288, 128)]:
        mb = n * c * 4 / 1e6
        feats = jnp.asarray(rng.rand(n, c), jnp.float32)
        idx = jnp.asarray(rng.randint(0, n, m).astype(np.int32))

        def g(feats, idx):
            return feats[idx].sum(axis=0)

        ms = timeit(g, feats, idx)
        print(f"table {n:8d}x{c:3d} ({mb:6.0f} MB): "
              f"{m/1e6/((ms-floor)*1e-3):5.0f}M r/s")

    # blocked-window conv-style gather: 852K x 96 table, indices local
    n = 851_968
    c = 96
    feats = jnp.asarray(rng.rand(n + 1, c), jnp.float32)
    kk = 9
    base = np.arange(n)[:, None] + rng.randint(-4000, 4000, (n, kk))
    kmap = np.clip(base, 0, n - 1)
    miss = rng.rand(n, kk) < 0.3
    kmapT = jnp.asarray(np.where(miss, n, kmap).astype(np.int32).T.copy())
    w = jnp.asarray(rng.rand(kk, c, 64), jnp.float32)

    def conv_global(feats, w, kmapT):
        def body(i, acc):
            return acc + jnp.dot(feats[kmapT[i]], w[i],
                                 preferred_element_type=jnp.float32)
        return jax.lax.fori_loop(
            0, kk, body, jnp.zeros((n, 64), jnp.float32))

    ms = timeit(conv_global, feats, w, kmapT)
    print(f"conv9 global 852Kx96:    {ms:7.1f} ms "
          f"({kk*n/1e6/((ms-floor)*1e-3):5.0f}M r/s)")

    B = 65_536
    W = 16_384
    nb = -(-n // B)
    npad = nb * B
    kmapT_pad = jnp.asarray(np.pad(
        np.asarray(kmapT), ((0, 0), (0, npad - n)), constant_values=n))

    def conv_blocked(feats, w, kmapT_pad):
        # window [b*B - W, b*B + B + W) sliced per block; miss sentinel n
        # mapped into the window's last row (feats[n] is the zero row — we
        # append it to each window instead)
        def block(b, acc):
            lo = jnp.maximum(b * B - W, 0)
            lo = jnp.minimum(lo, n + 1 + W - (B + 2 * W))  # keep in bounds
            win = jax.lax.dynamic_slice(feats, (lo, 0), (B + 2 * W, c))
            win = jnp.concatenate(
                [win, jnp.zeros((1, c), jnp.float32)], axis=0)

            def body(i, accb):
                gidx = jax.lax.dynamic_slice(kmapT_pad, (i, b * B), (1, B))[0]
                local = jnp.where(
                    gidx >= n, B + 2 * W, jnp.clip(gidx - lo, 0, B + 2 * W))
                return accb + jnp.dot(win[local], w[i],
                                      preferred_element_type=jnp.float32)

            accb = jax.lax.fori_loop(
                0, kk, body, jnp.zeros((B, 64), jnp.float32))
            return jax.lax.dynamic_update_slice(acc, accb, (b * B, 0))

        return jax.lax.fori_loop(
            0, nb, block, jnp.zeros((npad, 64), jnp.float32))

    ms = timeit(conv_blocked, feats, w, kmapT_pad)
    print(f"conv9 blocked B64K W16K: {ms:7.1f} ms "
          f"({kk*n/1e6/((ms-floor)*1e-3):5.0f}M r/s)")


if __name__ == "__main__":
    main()
