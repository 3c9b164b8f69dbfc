"""Does a bf16 gather table beat f32 at the sparse-conv shapes?

The U-Net apply is at the measured gather-law floor (~616M gather rows,
PERFORMANCE.md). Rows/s is width-insensitive from 64 lanes up, but the
round-4 pack test suggested the big-table cliff is BYTE-driven — a bf16
table halves the bytes, so it may gather faster (and the MXU natively
eats bf16, matching the reference's effective TF32 conv precision on
CUDA, models/model_v2.py conv stacks).

Shapes: L0-like (717K rows x 32ch padded to 64/128 lanes, 27-tap index
load ~6.4M rows per conv) and L1-like (422K x 64ch).

Run on TPU: python scripts/microbench_bf16_gather.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax.numpy as jnp

from gpcr_tpu.utils.cache import enable_persistent_cache

enable_persistent_cache()

from scripts.ablate_stream import devtime


def main():
    rng = np.random.RandomState(0)
    for name, n, w, k in (
        ("L0 32ch pad64", 717_000, 64, 6_400_000),
        ("L0 32ch pad128", 717_000, 128, 6_400_000),
        ("L1 64ch pad64", 422_000, 64, 3_800_000),
    ):
        ii = jnp.asarray(rng.randint(0, n, size=(k,)), jnp.int32)

        def g(s, tbl_a, jj):
            return tbl_a[jj + s.astype(jnp.int32) * 0][0, 0].astype(
                jnp.float32) * 0 + s + 1

        for dt in (jnp.float32, jnp.bfloat16):
            tbl = jnp.asarray(rng.randn(n + 1, w), jnp.float32).astype(dt)
            ms = devtime(g, args=(tbl, ii))
            by = np.dtype(dt).itemsize if dt != jnp.bfloat16 else 2
            print(f"{name:16s} {np.dtype(dt).name if dt != jnp.bfloat16 else 'bfloat16':8s}"
                  f" table {n*w*by/1e6:5.0f} MB: {ms:7.2f} ms  "
                  f"{k/max(ms,.01)/1e3:5.0f} M rows/s")
            del tbl
        del ii


if __name__ == "__main__":
    main()
