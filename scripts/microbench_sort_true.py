"""TRUE isolated sort costs via plain D2H timing (the round-3 chained
numbers used the foldable `+ si*0` perturbation — pitfall 6 — and could
be hoisted: 'stable 1-key (2 arr): 1.9 ms' is suspect). Materialized
random inputs, K reps, median minus the ~27 ms RTT.

Run on TPU: python scripts/microbench_sort_true.py
"""

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


def d2h_time(fn, *args, reps=8):
    out = fn(*args)
    sync(out)
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        sync(fn(*args))
        ts.append((time.perf_counter() - t0) * 1e3)
    return float(np.median(ts)) - 27.0


def main():
    rng = np.random.RandomState(0)
    for m in (1_800_064, 3_200_000, 6_400_000):
        keys = jnp.asarray(rng.randint(0, 16385, size=(m,)), jnp.int32)
        pay = jnp.asarray(rng.randint(0, 800_001, size=(m,)), jnp.int32)

        @jax.jit
        def s2(k, p):
            return jax.lax.sort((k, p), num_keys=1, is_stable=True)

        ms = d2h_time(s2, keys, pay)
        print(f"stable 1-key 2-arr sort {m/1e6:.1f}M: {ms:7.2f} ms")

        @jax.jit
        def s2u(k, p):
            return jax.lax.sort((k, p), num_keys=1, is_stable=False)

        ms = d2h_time(s2u, keys, pay)
        print(f"UNstable 1-key 2-arr    {m/1e6:.1f}M: {ms:7.2f} ms")

    # presorted-ish keys (the real case: most entries already clustered)
    m = 3_200_000
    keys = jnp.asarray(np.sort(rng.randint(0, 16385, size=(m,))), jnp.int32)
    pay = jnp.asarray(rng.randint(0, 800_001, size=(m,)), jnp.int32)

    @jax.jit
    def s2(k, p):
        return jax.lax.sort((k, p), num_keys=1, is_stable=True)

    ms = d2h_time(s2, keys, pay)
    print(f"stable, ALREADY-SORTED keys 3.2M: {ms:7.2f} ms")


if __name__ == "__main__":
    main()
