"""Cross-check the in-jit chained gather timings against plain D2H
timings (PERFORMANCE.md pitfall 6: `idx + s*0` folds, so chained steps
whose only s-dependence is through a folded expression can be hoisted
and report ~true/K). Two formulations:

  chained-hoistable:  idx + s*0          (the suspect pattern)
  chained-dependent:  table + s*1e-20    (genuine value dependence)
  plain D2H:          K calls, each synchronized, minus the ~27 ms RTT

Run on TPU: python scripts/microbench_gather_d2h.py
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
from scripts.ablate_stream import devtime


def main():
    rng = np.random.RandomState(0)
    n, kb = 800_000, 1_800_064
    idx = jnp.asarray(rng.randint(0, n, size=(kb,)), jnp.int32)
    tbl = jnp.asarray(rng.randn(n + 1, 128), jnp.float32)

    def hoistable(s, tbl_a, ii):
        return tbl_a[ii + s.astype(jnp.int32) * 0][0, 0] * 0 + s + 1

    ms = devtime(hoistable, args=(tbl, idx))
    print(f"chained idx+s*0 (hoistable):   {ms:7.2f} ms")

    def dependent(s, tbl_a, ii):
        return (tbl_a + s * 1e-20)[ii][0, 0] * 0 + s + 1

    ms = devtime(dependent, args=(tbl, idx))
    print(f"chained tbl+s*1e-20 (dep):     {ms:7.2f} ms  "
          f"(includes a 102 MB elementwise add)")

    @jax.jit
    def one(tbl_a, ii):
        return tbl_a[ii]

    out = one(tbl, idx)
    sync(out)
    ts = []
    for _ in range(10):
        t0 = time.perf_counter()
        sync(one(tbl, idx))
        ts.append((time.perf_counter() - t0) * 1e3)
    med = float(np.median(ts))
    print(f"plain D2H single gather:       {med:7.2f} ms raw, "
          f"~{med - 27:.2f} ms device (RTT-corrected)")

    # the elementwise-add cost alone, for subtraction
    def addonly(s, tbl_a):
        return (tbl_a + s * 1e-20)[0, 0] * 0 + s + 1

    ms = devtime(addonly, args=(tbl,))
    print(f"chained 102MB add alone:       {ms:7.2f} ms")

    # the production concat+slice index glue, with and without a barrier
    # on the final index array (microbench_real_gather.py F measured the
    # glue at 18.45 vs 8.25 ms bare — suspected index-producer fusion)
    ch = 128
    def glue(s, tbl_a, ii):
        sg2 = jnp.concatenate(
            [ii + s.astype(jnp.int32) * 0, jnp.full((ch,), n, jnp.int32)],
            axis=0)
        return tbl_a[sg2[: kb + ch]][0, 0] * 0 + s + 1

    ms = devtime(glue, args=(tbl, idx))
    print(f"concat+slice glue, no barrier: {ms:7.2f} ms")

    def glue_b(s, tbl_a, ii):
        sg2 = jnp.concatenate(
            [ii + s.astype(jnp.int32) * 0, jnp.full((ch,), n, jnp.int32)],
            axis=0)
        sg2 = jax.lax.optimization_barrier(sg2[: kb + ch])
        return tbl_a[sg2][0, 0] * 0 + s + 1

    ms = devtime(glue_b, args=(tbl, idx))
    print(f"concat+slice glue + BARRIER:   {ms:7.2f} ms")


if __name__ == "__main__":
    main()
