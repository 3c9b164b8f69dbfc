"""On-chip probe of the blocked-window stream gather vs the global one.

Times ONLY bin_sorted_stream (single view, bench shape) under
GPCR_STREAM_GATHER=global / blocked — set the env before running; the
full-frame A/B hung in compile (see PERFORMANCE.md round-4 notes), so
this isolates whether the scan-of-dynamic-slice gather graph itself
compiles/executes sanely through the axon stack.

Run: GPCR_STREAM_GATHER=blocked python scripts/microbench_blocked_gather.py
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

from gpcr_tpu.ops import rasterize as R
from gpcr_tpu.ops import rasterize_stream as RS
from gpcr_tpu.utils.timing import sync


def main():
    n = 800_000
    rng = np.random.RandomState(0)
    v = rng.randn(n, 3)
    v /= np.linalg.norm(v, axis=1, keepdims=True)
    v[:, 1] *= 1.6
    v *= 0.55
    xyz = jnp.asarray(v + rng.randn(n, 3) * 0.01, jnp.float32)

    H = W = 2048
    grid_x = W // 16
    num_tiles = grid_x * (H // 16)
    config = R.RasterizeConfig(
        max_dup_per_gaussian=4, chunk_size=256,
        k_budget=1_800_000, max_active_tiles=6144, impl="stream")

    P = np.zeros((4, 4), np.float32)
    P[0, 0] = P[1, 1] = 1.0
    P[3, 2] = 1.0
    P[2, 2] = 100.0 / (100.0 - 0.01)
    P[2, 3] = -(100.0 * 0.01) / (100.0 - 0.01)
    settings = R.GaussianRasterizationSettings(
        image_height=H, image_width=W, tanfovx=0.414, tanfovy=0.414,
        bg=jnp.zeros(12), scale_modifier=1.0,
        viewmatrix=jnp.eye(4).at[3, 2].set(3.0),
        projmatrix=jnp.asarray(P.T), sh_degree=0, campos=jnp.zeros(3))

    feats = jnp.asarray(rng.rand(n, 12), jnp.float32)
    scales = jnp.full((n, 3), 1.0 / 448)
    rots = jnp.broadcast_to(jnp.array([1.0, 0, 0, 0]), (n, 4))
    op = jnp.ones((n,))

    @jax.jit
    def bin_fn(xyz):
        prep = R.preprocess(
            xyz, op, settings, config, scales=scales, rotations=rots,
            colors_precomp=feats)
        s, st, ovf, _wd = RS.bin_sorted_stream(prep, num_tiles, grid_x, config)
        return s.sum(), st[-1], ovf

    mode = os.environ.get("GPCR_STREAM_GATHER", "global")
    t0 = time.perf_counter()
    out = bin_fn(xyz)
    sync(out)
    print(f"[{mode}] compile+first: {time.perf_counter() - t0:.1f} s "
          f"entries={int(out[1])} overflow={int(out[2])}")
    for _ in range(3):
        t0 = time.perf_counter()
        out = bin_fn(xyz + 1e-6)
        sync(out)
        print(f"[{mode}] bin: {(time.perf_counter() - t0) * 1e3:.1f} ms")


if __name__ == "__main__":
    main()
