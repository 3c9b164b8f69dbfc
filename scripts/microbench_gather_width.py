"""Row-gather rate vs TABLE WIDTH at fixed row count.

Hypothesis (round 5): the stream gather's rate is set by the SOURCE
TABLE'S BYTE SIZE (the ~64 MB cliff documented for the blocked-window
design, PERFORMANCE.md), not by the 128-lane row granule. The packed
table only uses 12+C of its 128 lanes (rasterize_stream.py row layout:
[x y conic3 op depth 0 | feat(C) | rect4]) — a C=3 render needs 15
lanes, the fused 12-channel render 24. If a (800K, 16) table (51 MB,
under the cliff) gathers materially faster per row than the 409 MB
128-lane table's lottery band (95-210 M rows/s), narrowing the table
removes most of the 7-17 ms gather stage AND its allocator-lottery
variance.

Timing protocol copied from microbench_gather_kb.py: gather inside a
lax.scan with a carry-perturbed table (defeats CSE/hoisting), scalar
reduction out, median over reps / K iterations.

Run on TPU: python scripts/microbench_gather_width.py
"""
import argparse
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
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=800_000)
    ap.add_argument("--k", type=int, default=1_802_240)
    ap.add_argument("--widths", default="8,16,24,32,48,64,128")
    args = ap.parse_args()

    rng = np.random.RandomState(0)
    idx = jnp.asarray(rng.randint(0, args.rows, size=(args.k,)), jnp.int32)

    def g(s, tbl_a, jj):
        t = tbl_a + s * 1e-20
        out = t[jj]
        return out[0, 0] * 1e-30 + s + 1.0

    def base(s, tbl_a, jj):
        t = tbl_a + s * 1e-20
        return t[0, 0] * 1e-30 + s + 1.0

    for rep in range(2):
        for w in [int(x) for x in args.widths.split(",")]:
            tbl = jnp.asarray(rng.randn(args.rows + 1, w), jnp.float32)
            b = devtime(base, (tbl, idx[:1024]))
            ms = devtime(g, (tbl, idx)) - b
            mb = tbl.size * 4 / 1e6
            print(f"rep{rep} width {w:4d}  table {mb:7.1f} MB  "
                  f"gather {ms:7.2f} ms  {args.k / max(ms, .01) / 1e3:7.1f} "
                  f"M rows/s", flush=True)


if __name__ == "__main__":
    main()
