"""Why is the real conv 5x slower than the conv microbench?
Hypotheses: (a) kmap column slicing (N,27)[:, i] is strided; (b) table size;
(c) gather-index distribution. Measure conv variants at the L0 shape."""

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


def conv_cols(feats, w, kmap):
    kk = w.shape[0]

    def body(i, acc):
        g = feats[kmap[:, i]]
        return acc + jnp.dot(g, w[i], preferred_element_type=jnp.float32)

    return jax.lax.fori_loop(
        0, kk, body, jnp.zeros((kmap.shape[0], w.shape[2]), jnp.float32))


def conv_rows(feats, w, kmapT):
    kk = w.shape[0]

    def body(i, acc):
        g = feats[kmapT[i]]
        return acc + jnp.dot(g, w[i], preferred_element_type=jnp.float32)

    return jax.lax.fori_loop(
        0, kk, body, jnp.zeros((kmapT.shape[1], w.shape[2]), jnp.float32))


def conv_unrolled(feats, w, kmapT):
    acc = jnp.zeros((kmapT.shape[1], w.shape[2]), jnp.float32)
    for i in range(w.shape[0]):
        acc = acc + jnp.dot(feats[kmapT[i]], w[i],
                            preferred_element_type=jnp.float32)
    return acc


def main():
    rng = np.random.RandomState(0)
    floor = timeit(lambda x: x + 1, jnp.ones(8))
    print(f"floor: {floor:6.1f} ms")

    for n in (290_000, 852_000):
        c = 32
        base = np.arange(n)[:, None] + rng.randint(-3000, 3000, (n, 27))
        kmap = np.clip(base, 0, n - 1)
        miss = rng.rand(n, 27) < 0.3
        kmap = np.where(miss, n, kmap).astype(np.int32)
        feats = jnp.asarray(rng.rand(n + 1, c), jnp.float32)
        w = jnp.asarray(rng.rand(27, c, c), jnp.float32)
        km = jnp.asarray(kmap)
        kmT = jnp.asarray(kmap.T.copy())

        ms = timeit(conv_cols, feats, w, km)
        print(f"n={n} conv kmap[:, i] cols: {ms:7.1f} ms "
              f"({27*n/1e6/((ms-floor)*1e-3):5.0f}M r/s)")
        ms = timeit(conv_rows, feats, w, kmT)
        print(f"n={n} conv kmapT[i] rows:  {ms:7.1f} ms "
              f"({27*n/1e6/((ms-floor)*1e-3):5.0f}M r/s)")
        ms = timeit(conv_unrolled, feats, w, kmT)
        print(f"n={n} conv unrolled rows:  {ms:7.1f} ms "
              f"({27*n/1e6/((ms-floor)*1e-3):5.0f}M r/s)")

    # the REAL kmap from the engine at L0 852K for comparison
    from gpcr_tpu.ops import sparse

    v = rng.randn(800_000, 3)
    v /= np.linalg.norm(v, axis=1, keepdims=True)
    v[:, 1] *= 1.6
    v *= 0.55
    coords = np.clip((v + rng.randn(800_000, 3) * 0.01) * 448 + 512, 0, 1023)
    feats_in = jnp.asarray(rng.rand(800_000, 9), jnp.float32)
    grid = sparse.quantize_average(
        jnp.asarray(coords, jnp.float32), feats_in, capacity=851_968)
    kmap_real = sparse.build_kernel_map(grid, 3)
    n2 = grid.capacity
    feats = jnp.asarray(rng.rand(n2 + 1, 32), jnp.float32)
    w = jnp.asarray(rng.rand(27, 32, 32), jnp.float32)
    ms = timeit(conv_cols, feats, w, kmap_real)
    print(f"real kmap cols:          {ms:7.1f} ms "
          f"({27*n2/1e6/((ms-floor)*1e-3):5.0f}M r/s)")
    kmT_real = jnp.asarray(np.asarray(kmap_real).T.copy())
    ms = timeit(conv_rows, feats, w, kmT_real)
    print(f"real kmap rows:          {ms:7.1f} ms "
          f"({27*n2/1e6/((ms-floor)*1e-3):5.0f}M r/s)")


if __name__ == "__main__":
    main()
