"""Round-5 decision microbench: can a Pallas kernel replace the XLA
stream gather (13.6 ms bimodal at the bench shape) by DMAing rows of the
packed table directly, driven by the sorted index list?

The open question is the per-row DMA ISSUE rate: the gather moves
1.8M x 512 B rows. XLA gathers run 130-250 M rows/s above the ~64 MB
table-byte cliff (PERFORMANCE.md). A Pallas row-DMA gather wins iff the
scalar core can issue (and the DMA engines retire) >= ~250M descriptors/s
equivalent; it also dodges the cross-process allocation bimodality.

Variants (all K=8 chained in one jit, table perturbed by the carry so
nothing hoists; 'base' measures the perturbation overhead to subtract):

  base     table perturb + 1-row consume only
  xla      jnp take (the current stream gather)
  pallas1  per-row (1,128) DMA, idx read from an SMEM block per chunk
  pallas1a same, source rows quantized to 8-row alignment (idx & ~7)
  pallas8  per-entry (8,128) aligned group DMA (8x bytes) into a wide
           scratch — the VERDICT's "fetch 8-row-aligned groups" shape
  pallasc  contiguous (chunk,128) block DMA (pure-bandwidth reference)

Run on TPU: python scripts/microbench_dma_gather.py [kb] [nsem]
"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from gpcr_tpu.utils.cache import enable_persistent_cache

enable_persistent_cache()
from gpcr_tpu.utils.timing import sync

K = 8
CHUNK = 1024


def _row_dma_kernel(idx_ref, tbl_hbm, out_ref, scratch, sems, *, nsem,
                    align, group):
    rows = CHUNK

    def issue(i):
        r = idx_ref[i // 128, i % 128]
        if align or group:
            r = (r // 8) * 8
        if group:
            return pltpu.make_async_copy(
                tbl_hbm.at[pl.ds(r, 8), :],
                scratch.at[pl.ds(i * 8, 8), :],
                sems.at[jax.lax.rem(i, nsem)],
            )
        return pltpu.make_async_copy(
            tbl_hbm.at[pl.ds(r, 1), :],
            scratch.at[pl.ds(i, 1), :],
            sems.at[jax.lax.rem(i, nsem)],
        )

    def body(i, c):
        @pl.when(i >= nsem)
        def _():
            issue(i - nsem).wait()

        issue(i).start()
        return c

    jax.lax.fori_loop(0, rows, body, 0)

    def tail(i, c):
        issue(i).wait()
        return c

    jax.lax.fori_loop(max(rows - nsem, 0), rows, tail, 0)
    if group:
        out_ref[:] = scratch[0:CHUNK, :]
    else:
        out_ref[:] = scratch[:]


def _contig_kernel(idx_ref, tbl_hbm, out_ref, scratch, sems):
    i = pl.program_id(0)
    base = (i * CHUNK) % (800_000 - CHUNK)
    dma = pltpu.make_async_copy(
        tbl_hbm.at[pl.ds(base, CHUNK), :], scratch, sems.at[0]
    )
    dma.start()
    dma.wait()
    out_ref[:] = scratch[:]


def make_pallas_gather(kb, nsem, align=False, group=False, contig=False):
    grid = kb // CHUNK

    if contig:
        kernel = _contig_kernel
        scratch_rows = CHUNK
    else:
        kernel = functools.partial(
            _row_dma_kernel, nsem=nsem, align=align, group=group)
        scratch_rows = CHUNK * (8 if group else 1)

    def gather(idx2d, tbl):
        return pl.pallas_call(
            kernel,
            grid=(grid,),
            in_specs=[
                pl.BlockSpec((8, 128), lambda i: (i, 0),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pltpu.ANY),
            ],
            out_specs=pl.BlockSpec((CHUNK, 128), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((kb, 128), jnp.float32),
            scratch_shapes=[
                pltpu.VMEM((scratch_rows, 128), jnp.float32),
                pltpu.SemaphoreType.DMA((max(nsem, 1),)),
            ],
        )(idx2d, tbl)

    return gather


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
    kb = int(sys.argv[1]) if len(sys.argv) > 1 else 1_802_240
    nsem = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    kb = (kb // CHUNK) * CHUNK
    n = 800_000
    rng = np.random.RandomState(0)
    tbl = jnp.asarray(rng.randn(n + 8, 128), jnp.float32)
    ii = jnp.asarray(rng.randint(0, n, size=(kb,)), jnp.int32)
    idx2d = ii.reshape(kb // 128, 128)

    def base(s, tbl_a, jj):
        t = tbl_a + s * 1e-20
        return t[0, 0] * 1e-30 + s + 1.0

    def xla(s, tbl_a, jj):
        t = tbl_a + s * 1e-20
        out = t[jj.reshape(-1)]
        return out[0, 0] * 1e-30 + s + 1.0

    results = {}
    results["base"] = devtime(base, (tbl, idx2d))
    results["xla"] = devtime(xla, (tbl, idx2d))

    for name, kw in (
        ("pallas1", {}),
        ("pallas1a", {"align": True}),
        ("pallas8", {"group": True}),
        ("pallasc", {"contig": True}),
    ):
        g = make_pallas_gather(kb, nsem, **kw)

        def step(s, tbl_a, jj, g=g):
            t = tbl_a + s * 1e-20
            out = g(jj, t)
            return out[0, 0] * 1e-30 + s + 1.0

        try:
            results[name] = devtime(step, (tbl, idx2d))
        except Exception as e:  # noqa: BLE001
            print(f"{name}: FAILED {type(e).__name__}: {str(e)[:300]}")
            results[name] = None

    b = results["base"]
    print(f"kb={kb} nsem={nsem} base={b:.2f} ms")
    for name, ms in results.items():
        if name == "base" or ms is None:
            continue
        net = ms - b
        rate = kb / max(net, 0.01) / 1e3
        print(f"{name:9s}: {ms:7.2f} ms raw  {net:7.2f} ms net  "
              f"{rate:6.0f} M rows/s  "
              f"{kb * 512 / max(net, .01) / 1e6:6.1f} GB/s")


if __name__ == "__main__":
    main()
