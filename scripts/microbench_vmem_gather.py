"""Measure Mosaic's `tpu.dynamic_gather` (VMEM-local row/col shuffle).

MEASURED RESULT (round 3, real TPU v5e): every configuration below FAILS
to compile — "Mosaic failed: Not implemented: Multiple source vregs along
gather dimension". tpu.dynamic_gather only addresses ONE vreg along the
gather dim (8 sublanes / 128 lanes), so a VMEM-fused gather+GEMM sparse
conv cannot be written in Pallas on this toolchain; the XLA blocked-window
gather law (~440-500M rows/s) stands as the conv floor.

Mosaic lowers lax.gather ONLY in the take_along_axis form where input,
indices and output all share one shape (jax/_src/pallas/mosaic/
lowering.py:2464-2524): out[i,j] = win[idx[i,j], j] (dim 0, sublane
gather) or out[i,j] = win[i, idx[i,j]] (dim 1, lane gather). So a fused
sparse-conv kernel would gather neighbor rows from a VMEM window the
same size as the (padded) output block.

This benchmark measures the achievable rate: REPS gathers inside one
kernel (varying indices so nothing hoists), rows/s = REPS * R / time.

Run on TPU: python scripts/microbench_vmem_gather.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from gpcr_tpu.utils.timing import sync

REPS = 100


def timeit(fn, *args, reps=5):
    out = fn(*args)
    sync(out)
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        sync(out)
        ts.append((time.perf_counter() - t0) * 1e3)
    return float(np.median(ts))


def make_dim0(r, c):
    """out[i, j] = win[idx[i], j] — sublane gather, idx broadcast over
    lanes."""

    def body(idx_ref, win_ref, out_ref):
        def it(k, acc):
            idx = (idx_ref[:] + k) % r  # (r, 1) i32
            idx2 = jnp.broadcast_to(idx, (r, c))
            return acc + jnp.take_along_axis(win_ref[:], idx2, axis=0)

        out_ref[:] = jax.lax.fori_loop(0, REPS, it, jnp.zeros_like(out_ref))

    return body


def make_dim1(r, c):
    """out[i, j] = win[i, idx[j]] — lane gather (transposed layout:
    features stored (C, N), gathering neighbor columns)."""

    def body(idx_ref, win_ref, out_ref):
        def it(k, acc):
            idx = (idx_ref[:] + k) % c  # (1, c) i32
            idx2 = jnp.broadcast_to(idx, (r, c))
            return acc + jnp.take_along_axis(win_ref[:], idx2, axis=1)

        out_ref[:] = jax.lax.fori_loop(0, REPS, it, jnp.zeros_like(out_ref))

    return body


def build(kernel, r, c, n_in_extra):
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((r, c), jnp.float32),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )


def main():
    print("devices:", jax.devices())
    rng = np.random.RandomState(0)
    print(f"dim0 (sublane) gathers, {REPS} reps in kernel:")
    for (r, c) in [(1024, 128), (8192, 128), (16384, 128), (8192, 64),
                   (32768, 64)]:
        idx = jnp.asarray(rng.randint(0, r, size=(r, 1)), jnp.int32)
        win = jnp.asarray(rng.randn(r, c), jnp.float32)
        try:
            f = jax.jit(build(make_dim0(r, c), r, c, 0))
            got = np.asarray(f(idx, win))
            # check first rep pattern against numpy
            exp = np.zeros((r, c), np.float32)
            wn, ii = np.asarray(win), np.asarray(idx)[:, 0]
            for k in range(REPS):
                exp += wn[(ii + k) % r]
            ok = np.allclose(got, exp, atol=1e-2)
            ms = timeit(f, idx, win)
            rate = REPS * r / (ms * 1e-3) / 1e6
            gbs = rate * c * 4 / 1e3
            print(f"  r={r:6d} c={c:4d} ok={ok}  {ms:8.2f} ms  "
                  f"{rate:8.1f} M rows/s  {gbs:7.1f} GB/s")
        except Exception as e:
            msg = str(e).split(chr(10))[0][:140]
            print(f"  r={r:6d} c={c:4d} FAILED: {msg}")

    print(f"dim1 (lane) gathers, {REPS} reps in kernel:")
    for (r, c) in [(128, 1024), (128, 8192), (64, 16384)]:
        idx = jnp.asarray(rng.randint(0, c, size=(1, c)), jnp.int32)
        win = jnp.asarray(rng.randn(r, c), jnp.float32)
        try:
            f = jax.jit(build(make_dim1(r, c), r, c, 0))
            got = np.asarray(f(idx, win))
            exp = np.zeros((r, c), np.float32)
            wn, ii = np.asarray(win), np.asarray(idx)[0]
            for k in range(REPS):
                exp += wn[:, (ii + k) % c]
            ok = np.allclose(got, exp, atol=1e-2)
            ms = timeit(f, idx, win)
            rate = REPS * c / (ms * 1e-3) / 1e6
            gbs = rate * r * 4 / 1e3
            print(f"  r={r:6d} c={c:6d} ok={ok}  {ms:8.2f} ms  "
                  f"{rate:8.1f} M cols/s  {gbs:7.1f} GB/s")
        except Exception as e:
            msg = str(e).split(chr(10))[0][:140]
            print(f"  r={r:6d} c={c:6d} FAILED: {msg}")


if __name__ == "__main__":
    main()
