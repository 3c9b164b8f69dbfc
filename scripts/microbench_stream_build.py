"""Stream materialization variants (TPU): the (kb, 128) layout costs ~12 ms
in zero-fill concat; candidates: narrow 24-wide build + widen, transposed
(24, kb) layout (Mosaic allows 8-aligned sublane slices)."""

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
    n = 800_000
    kb = 2_000_000
    cols = {
        "mean2d": jnp.asarray(rng.rand(n, 2), jnp.float32),
        "conic": jnp.asarray(rng.rand(n, 3), jnp.float32),
        "op": jnp.asarray(rng.rand(n, 1), jnp.float32),
        "depth": jnp.asarray(rng.rand(n, 1), jnp.float32),
        "feat": jnp.asarray(rng.rand(n, 12), jnp.float32),
        "rect": jnp.asarray(rng.rand(n, 4), jnp.float32),
    }
    idx = jnp.asarray(rng.randint(0, n, kb), jnp.int32)

    print(f"floor: {timeit(lambda x: x + 1, jnp.ones(8)):6.1f} ms")

    def build128(c):
        p = jnp.concatenate(
            [c["mean2d"], c["conic"], c["op"], c["depth"],
             jnp.zeros((n, 1)), c["feat"], jnp.zeros((n, 104)), c["rect"]],
            axis=-1)
        return p

    print(f"a) concat 128-wide:            {timeit(build128, cols):6.1f} ms")

    def build24(c):
        return jnp.concatenate(
            [c["mean2d"], c["conic"], c["op"], c["depth"],
             jnp.zeros((n, 1)), c["feat"], c["rect"]], axis=-1)

    print(f"b) concat 24-wide:             {timeit(build24, cols):6.1f} ms")

    p24 = build24(cols)

    def widen(p24):
        return jnp.zeros((n, 128), jnp.float32).at[:, :24].set(p24)

    print(f"c) widen 24->128 via set:      {timeit(widen, p24):6.1f} ms")

    def pad(p24):
        return jnp.pad(p24, ((0, 0), (0, 104)))

    print(f"d) widen 24->128 via pad:      {timeit(pad, p24):6.1f} ms")

    def gather24(p24, idx):
        return p24[idx]

    print(f"e) gather 2.0M rows of 24:     {timeit(gather24, p24, idx):6.1f} ms")

    p128 = build128(cols)
    print(f"f) gather 2.0M rows of 128:    {timeit(gather24, p128, idx):6.1f} ms")

    def gather_t(p24, idx):
        return p24[idx].T  # (24, kb) for the transposed kernel layout

    print(f"g) gather 2.0M x24 + transpose:{timeit(gather_t, p24, idx):6.1f} ms")

    def gather_cols(p24T, idx):
        return p24T[:, idx]

    p24T = jnp.asarray(np.asarray(p24).T)
    print(f"h) lane-gather from (24, n):   {timeit(gather_cols, p24T, idx):6.1f} ms")

    # full-chain alternatives: build + permute + gather (+ transpose)
    perm = jnp.asarray(rng.permutation(n).astype(np.int32))

    def chain128(c, perm, idx):
        p = build128(c)
        ps = p[perm]
        return ps[idx]

    print(f"A) 128: build+permute+gather:  {timeit(chain128, cols, perm, idx):6.1f} ms")

    def chain24T(c, perm, idx):
        p = build24(c)
        ps = p[perm]
        return ps[idx].T

    print(f"B) 24T: build+permute+gather+T:{timeit(chain24T, cols, perm, idx):6.1f} ms")


if __name__ == "__main__":
    main()
