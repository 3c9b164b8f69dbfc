"""TRUE isolated emit cost (D2H timing, materialized inputs) — the
in-graph prefix says [emit] ~= 11-12 ms while op counts predict ~0.1 ms.
Times the exact production emit ((cap,n) math + .T.reshape flatten, and
the (n,cap) variant), plus the emit->sort composition, to find where
the time really goes.

Run on TPU: python scripts/microbench_emit_true.py
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
    n, cap, grid_x, num_tiles = 800_000, 4, 128, 16384
    # realistic sorted-payload stand-ins
    gidx_s = jnp.asarray(rng.permutation(n), jnp.int32)
    rminx_s = jnp.asarray(rng.randint(0, 126, size=(n,)), jnp.int32)
    rminy_s = jnp.asarray(rng.randint(0, 126, size=(n,)), jnp.int32)
    rw = jnp.asarray(rng.randint(1, 3, size=(n,)), jnp.int32)
    rh = jnp.asarray(rng.randint(1, 3, size=(n,)), jnp.int32)
    valid = jnp.asarray((rng.rand(n) < 0.95).astype(np.int32))

    def emit_cn(gx, rx, ry, w, h, vl):
        valid_s = vl.astype(bool)[None, :]
        rw_ = jnp.maximum(w, 1)[None, :]
        area_raw = (w * h)[None, :]
        area = jnp.where(valid_s, jnp.minimum(area_raw, cap), 0)
        k = jax.lax.broadcasted_iota(jnp.int32, (cap, n), 0)
        kdiv = jnp.zeros((cap, n), jnp.int32)
        for j in range(1, cap):
            kdiv = kdiv + (k >= j * rw_).astype(jnp.int32)
        kmod = k - kdiv * rw_
        ty = ry[None, :] + kdiv
        tx = rx[None, :] + kmod
        dup_valid = valid_s & (k < area)
        tile = jnp.where(dup_valid, ty * grid_x + tx, num_tiles)
        g = jnp.where(dup_valid, gx[None, :], n)
        return tile, g

    args6 = (gidx_s, rminx_s, rminy_s, rw, rh, valid)

    @jax.jit
    def f_cn_noT(*a):
        t, g = emit_cn(*a)
        return t.reshape(-1), g.reshape(-1)  # slot-major (no transpose)

    print(f"emit (cap,n), reshape only : {d2h_time(f_cn_noT, *args6):7.2f} ms")

    @jax.jit
    def f_cn_T(*a):
        t, g = emit_cn(*a)
        return t.T.reshape(-1), g.T.reshape(-1)  # gaussian-major

    print(f"emit (cap,n) + .T.reshape  : {d2h_time(f_cn_T, *args6):7.2f} ms")

    @jax.jit
    def f_cn_T_sort(*a):
        t, g = emit_cn(*a)
        return jax.lax.sort(
            (t.T.reshape(-1), g.T.reshape(-1)), num_keys=1, is_stable=True)

    print(f"emit cn + T + stable sort  : {d2h_time(f_cn_T_sort, *args6):7.2f} ms")

    @jax.jit
    def f_cn_T_barrier_sort(*a):
        t, g = emit_cn(*a)
        tf, gf = jax.lax.optimization_barrier(
            (t.T.reshape(-1), g.T.reshape(-1)))
        return jax.lax.sort((tf, gf), num_keys=1, is_stable=True)

    print(f"emit cn + T + BARRIER sort : "
          f"{d2h_time(f_cn_T_barrier_sort, *args6):7.2f} ms")

    def emit_nc(gx, rx, ry, w, h, vl):
        valid_v = vl.astype(bool)
        rw_ = jnp.maximum(w, 1)
        area_raw = w * h
        area = jnp.where(valid_v, jnp.minimum(area_raw, cap), 0)
        k = jnp.arange(cap, dtype=jnp.int32)
        kdiv = jnp.zeros((n, cap), jnp.int32)
        for j in range(1, cap):
            kdiv = kdiv + (k[None, :] >= j * rw_[:, None]).astype(jnp.int32)
        kmod = k[None, :] - kdiv * rw_[:, None]
        ty = ry[:, None] + kdiv
        tx = rx[:, None] + kmod
        dup_valid = valid_v[:, None] & (k[None, :] < area[:, None])
        tile = jnp.where(dup_valid, ty * grid_x + tx, num_tiles)
        g = jnp.where(dup_valid, gx[:, None], n)
        return tile.reshape(-1), g.reshape(-1)

    @jax.jit
    def f_nc(*a):
        return emit_nc(*a)

    print(f"emit (n,cap) flat          : {d2h_time(f_nc, *args6):7.2f} ms")

    @jax.jit
    def f_nc_sort(*a):
        t, g = emit_nc(*a)
        return jax.lax.sort((t, g), num_keys=1, is_stable=True)

    print(f"emit nc + stable sort      : {d2h_time(f_nc_sort, *args6):7.2f} ms")


if __name__ == "__main__":
    main()
