"""Round-5 bimodality probe: does the stream gather's speed depend on
the OUTPUT buffer size (k_budget)? In-process frame A/Bs showed
kb=1.8M -> 46 ms/frame but kb=1.6M -> 62 and kb=1.5M -> 70 — a SMALLER
gather measuring 16-24 ms slower, which can only be allocation/placement.

Sweeps kb for the same (800K+1, 128) f32 source table in ONE process,
plus repeats to test stability, plus a fresh-table variant.

Run on TPU: python scripts/microbench_gather_kb.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from gpcr_tpu.utils.cache import enable_persistent_cache

enable_persistent_cache()
from gpcr_tpu.utils.timing import sync

K = 8


def devtime(step, args, reps=4):
    @jax.jit
    def run(s0, *arrs):
        def body(c, _):
            return step(c, *arrs), None

        out, _ = jax.lax.scan(body, s0, None, length=K)
        return out

    out = run(jnp.float32(0.0), *args)
    sync(out)
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = run(jnp.float32(0.0), *args)
        sync(out)
        ts.append((time.perf_counter() - t0) * 1e3)
    return float(np.median(np.asarray(ts))) / K


def main():
    n = 800_000
    rng = np.random.RandomState(0)
    tbl = jnp.asarray(rng.randn(n + 1, 128), jnp.float32)

    def base(s, tbl_a, jj):
        t = tbl_a + s * 1e-20
        return t[0, 0] * 1e-30 + s + 1.0

    kbs = [1_200_064, 1_499_904, 1_599_744, 1_700_096, 1_802_240,
           1_900_160, 2_097_152]
    idx_full = jnp.asarray(
        rng.randint(0, n, size=(max(kbs),)), jnp.int32)

    b = devtime(base, (tbl, idx_full[:1024]))
    print(f"base(perturb) = {b:.2f} ms")
    for rep in range(2):
        for kb in kbs:
            jj = idx_full[:kb]

            def g(s, tbl_a, jj):
                t = tbl_a + s * 1e-20
                out = t[jj]
                return out[0, 0] * 1e-30 + s + 1.0

            ms = devtime(g, (tbl, jj)) - b
            print(f"rep{rep} kb={kb:9d} ({kb*512/1e6:6.0f} MB out): "
                  f"{ms:7.2f} ms  {kb/max(ms,.01)/1e3:5.0f} M rows/s",
                  flush=True)


if __name__ == "__main__":
    main()
