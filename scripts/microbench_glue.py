"""Pin down which part of the stream-gather index glue costs ~10 ms
(microbench_gather_d2h.py: bare gather 7.0 ms, concat+slice glue 17.6 ms,
barrier does NOT help — so it is not producer fusion):

  g1: materialized (kb+128,) index input          -> gather
  g2: slice of a materialized (3.2M,) index input -> gather
  g3: concat(ii, 128 sentinels), no slice          -> gather
  g4: concat + slice (the production glue)         -> gather
  g5: pad-via-scatter: ii materialized at kb+128 with the tail set by
      .at[kb:].set(n)                              -> gather

Run on TPU: python scripts/microbench_glue.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from gpcr_tpu.utils.cache import enable_persistent_cache

enable_persistent_cache()

from scripts.ablate_stream import devtime


def main():
    rng = np.random.RandomState(0)
    n, kb, ch = 800_000, 1_800_064, 128
    tbl = jnp.asarray(rng.randn(n + 1, 128), jnp.float32)
    ii = jnp.asarray(rng.randint(0, n, size=(kb,)), jnp.int32)
    ii_full = jnp.concatenate([ii, jnp.full((ch,), n, jnp.int32)])
    ii_big = jnp.asarray(
        np.concatenate([np.asarray(ii), rng.randint(0, n, size=(kb,))]),
        jnp.int32)  # 3.6M source to slice from

    def g1(s, tbl_a, jj):
        return tbl_a[jj + s.astype(jnp.int32) * 0][0, 0] * 0 + s + 1

    print(f"g1 materialized kb+128:  {devtime(g1, args=(tbl, ii_full)):7.2f} ms")

    def g2(s, tbl_a, jj):
        return tbl_a[(jj + s.astype(jnp.int32) * 0)[: kb + ch]][0, 0] * 0 + s + 1

    print(f"g2 slice of 3.6M input:  {devtime(g2, args=(tbl, ii_big)):7.2f} ms")

    def g3(s, tbl_a, jj):
        jj2 = jnp.concatenate(
            [jj + s.astype(jnp.int32) * 0, jnp.full((ch,), n, jnp.int32)])
        return tbl_a[jj2][0, 0] * 0 + s + 1

    print(f"g3 concat, no slice:     {devtime(g3, args=(tbl, ii)):7.2f} ms")

    def g4(s, tbl_a, jj):
        jj2 = jnp.concatenate(
            [jj + s.astype(jnp.int32) * 0, jnp.full((ch,), n, jnp.int32)])
        return tbl_a[jj2[: kb + ch]][0, 0] * 0 + s + 1

    print(f"g4 concat + slice:       {devtime(g4, args=(tbl, ii)):7.2f} ms")

    def g5(s, tbl_a, jj):
        jj2 = jnp.full((kb + ch,), n, jnp.int32).at[:kb].set(
            jj + s.astype(jnp.int32) * 0)
        return tbl_a[jj2][0, 0] * 0 + s + 1

    print(f"g5 pad via dus:          {devtime(g5, args=(tbl, ii)):7.2f} ms")


if __name__ == "__main__":
    main()
