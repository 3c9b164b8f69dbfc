"""The 1.8M-row stream gather is bimodal (~7 ms in some processes,
~17.5 ms in others for IDENTICAL ops — microbench_gather_d2h vs
microbench_glue). Characterize within one process:

  - same gather repeated with fresh jit instances
  - same gather from a FRESH copy of the table (new HBM allocation)
  - widths 32/64/128 (byte scaling)
  - donated vs fresh output

Run on TPU several times: python scripts/microbench_gather_modes.py
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
    n, kb = 800_000, 1_800_064
    ii = jnp.asarray(rng.randint(0, n, size=(kb,)), jnp.int32)

    def g(s, tbl_a, jj):
        return tbl_a[jj + s.astype(jnp.int32) * 0][0, 0] * 0 + s + 1

    for rep in range(3):
        for w in (32, 64, 128):
            tbl = jnp.asarray(rng.randn(n + 1, w), jnp.float32)
            ms = devtime(g, args=(tbl, ii))
            mbs = (kb * w * 4 / 1e6) / max(ms, 0.01) * 1e3
            print(f"rep{rep} width {w:3d}: {ms:7.2f} ms  "
                  f"{kb/max(ms,.01)/1e3:5.0f} M rows/s  {mbs:6.0f} MB/s out")
            del tbl


if __name__ == "__main__":
    main()
