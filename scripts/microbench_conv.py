"""Conv-shaped gather + matmul rates on the TPU (drives the sparse U-Net
redesign). Questions:
  - rows/s for kmap-style gathers at C in {32, 64, 128, 256}, f32 vs bf16
  - gather+matmul fori-loop (the current conv) vs one big batched gather
  - does the ~30% miss fraction (all pointing at one zero row) matter
"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
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
    n = 290_000
    kk = 27

    # realistic kmap: neighbors are nearby in sorted order (+-3000), ~30%
    # misses pointing at the zero row n
    base = np.arange(n)[:, None] + rng.randint(-3000, 3000, (n, kk))
    kmap = np.clip(base, 0, n - 1)
    miss = rng.rand(n, kk) < 0.3
    kmap = np.where(miss, n, kmap).astype(np.int32)
    kmap_j = jnp.asarray(kmap)

    floor = timeit(lambda x: x + 1, jnp.ones(8))
    print(f"floor: {floor:6.1f} ms")

    for c in (32, 64, 128, 256):
        for dt, tag in ((jnp.float32, "f32"), (jnp.bfloat16, "bf16")):
            feats = jnp.asarray(rng.rand(n + 1, c), dt)
            w = jnp.asarray(rng.rand(kk, c, c), dt)

            def conv_loop(feats, w, kmap):
                def body(i, acc):
                    g = feats[kmap[:, i]]
                    return acc + jnp.dot(
                        g, w[i], preferred_element_type=jnp.float32)
                return jax.lax.fori_loop(
                    0, kk, body, jnp.zeros((n, c), jnp.float32))

            ms = timeit(conv_loop, feats, w, kmap_j)
            rate = n * kk / ((ms - floor) * 1e-3) / 1e6
            print(f"conv fori C={c:3d} {tag}:  {ms:7.1f} ms "
                  f"({rate:5.0f}M rows/s)")

        feats = jnp.asarray(rng.rand(n + 1, c), jnp.float32)

        def gather_only(feats, kmap):
            return feats[kmap.reshape(-1)].sum()  # one big 7.8M gather

        ms = timeit(gather_only, feats, kmap_j)
        rate = n * kk / ((ms - floor) * 1e-3) / 1e6
        print(f"gather 7.8M C={c:3d} f32:  {ms:7.1f} ms ({rate:5.0f}M rows/s)")

    # no-miss variant at C=64
    c = 64
    kmap_h = jnp.asarray(np.clip(base, 0, n - 1).astype(np.int32))
    feats = jnp.asarray(rng.rand(n + 1, c), jnp.float32)

    def gather_only(feats, km):
        return feats[km.reshape(-1)].sum()

    ms = timeit(gather_only, feats, kmap_h)
    rate = n * kk / ((ms - floor) * 1e-3) / 1e6
    print(f"gather no-miss C=64:     {ms:7.1f} ms ({rate:5.0f}M rows/s)")

    # fully random (no locality)
    kmap_r = jnp.asarray(rng.randint(0, n, (n, kk)).astype(np.int32))
    ms = timeit(gather_only, feats, kmap_r)
    rate = n * kk / ((ms - floor) * 1e-3) / 1e6
    print(f"gather random C=64:      {ms:7.1f} ms ({rate:5.0f}M rows/s)")

    # one-hot MXU "gather": blocks of 512 rows gathering from a 4096 window
    c = 64
    B = 512
    W = 4096
    nb = n // B
    loc = jnp.asarray(rng.randint(0, W, (nb, B * kk)).astype(np.int32))
    featsb = jnp.asarray(rng.rand(nb, W, c), jnp.bfloat16)

    def onehot_gather(featsb, loc):
        oh = jax.nn.one_hot(loc, W, dtype=jnp.bfloat16)  # (nb, B*kk, W)
        return jnp.einsum(
            "bkw,bwc->bkc", oh, featsb,
            preferred_element_type=jnp.float32)

    ms = timeit(onehot_gather, featsb, loc)
    rate = nb * B * kk / ((ms - floor) * 1e-3) / 1e6
    print(f"one-hot MXU gather C=64: {ms:7.1f} ms ({rate:5.0f}M rows/s)")


if __name__ == "__main__":
    main()
