"""Device-accurate sub-stage timing of the z-brick conv at the L0 shape.

Stages: to_dilated gather | ext build | 9-column gather (identity dot) |
z-tap matmuls on pre-gathered data | full brick_conv. Uses the chained
in-jit loop harness (see ablate_stream.devtime) to amortize tunnel RTT.

Run on TPU: python scripts/ablate_brick.py
"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax

from gpcr_tpu.utils.cache import enable_persistent_cache

enable_persistent_cache()
import jax.numpy as jnp

from gpcr_tpu.ops import sparse, sparse_zbrick as zb
from gpcr_tpu.utils.timing import sync

K = 8


def devtime(make_step, reps=4, args=()):
    @jax.jit
    def run(s0, *arrs):
        def body(c, _):
            return make_step(c, *arrs), None

        out, _ = jax.lax.scan(body, s0, None, length=K)
        return out

    s0 = jnp.float32(0.0)
    out = run(s0, *args)
    sync(out)
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = run(s0, *args)
        sync(out)
        ts.append((time.perf_counter() - t0) * 1e3)
    return float((np.median(ts) - 27.0) / K)


def main():
    rng = np.random.RandomState(0)
    n = 800_000
    sf = 448
    v = rng.randn(n, 3)
    v /= np.linalg.norm(v, axis=1, keepdims=True)
    v[:, 1] *= 1.6
    v *= 0.55
    xyz = v + rng.randn(n, 3) * 0.002
    coords = np.clip(xyz * sf + 512, 0, 1023).astype(np.float32)

    (b0, d0), _ = zb.plan_brick_capacities(coords, levels=2)
    feats0 = jnp.zeros((n, 1), jnp.float32)
    grid = jax.jit(functools.partial(
        sparse.quantize_average, capacity=786432))(
        jnp.asarray(coords), feats0)
    plan = jax.jit(functools.partial(
        zb.build_brick_plan, capacity=b0, dilated_capacity=d0))(grid)
    md = int(zb.brick_max_delta(plan))
    print(f"B={b0} D={d0} nb={int(plan.nb)} nd={int(plan.nd)} "
          f"max_delta={md}")

    C, Cout = 32, 32
    zd = plan.z
    fb = jnp.asarray(rng.randn(b0, zd, C) * 0.1, jnp.float32)
    w = jnp.asarray(rng.randn(27, C, Cout) * 0.1, jnp.float32)

    # 1. to_dilated
    def s_tod(s, fb_a):
        out = zb._to_dilated(fb_a + s * 0, plan, "auto", zb.BRICK_WINDOW)
        return out[0, 0] * 0 + s + 1

    print(f"to_dilated:        {devtime(s_tod, args=(fb,)):7.2f} ms")

    fd = jax.jit(lambda f: zb._to_dilated(
        f, plan, "auto", zb.BRICK_WINDOW))(fb)

    # 2. ext build
    def s_ext(s, fd_a):
        return zb._build_ext(fd_a + s * 0, plan)[0, 0] * 0 + s + 1

    print(f"ext build:         {devtime(s_ext, args=(fd,)):7.2f} ms")

    ext = jax.jit(lambda f: zb._build_ext(f, plan))(fd)
    ext_pad = jnp.concatenate([ext, jnp.zeros((1, ext.shape[1]))], axis=0)
    row_bytes = ext.shape[1] * 4
    blk = zb._auto_block(row_bytes, zb.BRICK_WINDOW, d0, b0)
    print(f"  (conv block={blk}, win_rows="
          f"{blk * d0 // b0 + 2 * zb.BRICK_WINDOW})")

    nbk = -(-b0 // blk)
    block_lo = jnp.clip(plan.r2d[
        jnp.minimum(jnp.arange(nbk) * blk, b0 - 1)], 0, d0)

    # 3. 9-column gather only (identity accumulate)
    def s_g9(s, ext_a):
        (out,) = sparse._gather_conv_blocked(
            ext_a + s * 0, plan.bkmap9, [lambda g, i: g],
            [ext_a.shape[1]], blk, zb.BRICK_WINDOW,
            stride_num=d0, stride_den=b0, block_lo=block_lo, unroll=True)
        return out[0, 0] * 0 + s + 1

    print(f"9-col gather:      {devtime(s_g9, args=(ext_pad,)):7.2f} ms")

    # 4. taps only: 9 x 3 strided-slice matmuls on a pre-gathered buffer
    g9 = jnp.asarray(rng.randn(b0, (zd + 2) * C) * 0.1, jnp.float32)

    def s_taps(s, g9_a):
        nbr = (g9_a + s * 0).reshape(b0, zd + 2, C)
        out = jnp.zeros((b0, zd, Cout), jnp.float32)
        for o in range(9):
            for dz in (-1, 0, 1):
                tap = jax.lax.slice(
                    nbr, (0, 1 + dz, 0), (b0, 1 + dz + zd, C))
                out = out + jax.lax.dot_general(
                    tap, w[zb._me_widx(o % 3 - 1, o // 3 - 1, dz)],
                    (((2,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
        return out[0, 0, 0] * 0 + s + 1

    print(f"27 taps (9x same): {devtime(s_taps, args=(g9,)):7.2f} ms")

    # 5. full brick conv
    def s_full(s, fb_a):
        out = zb.brick_conv(fb_a + s * 0, w, None, plan)
        return out[0, 0, 0] * 0 + s + 1

    print(f"full brick_conv:   {devtime(s_full, args=(fb,)):7.2f} ms")

    # 6. voxel conv reference at same shape
    kmap = jax.jit(functools.partial(
        sparse.build_kernel_map, kernel_size=3))(grid)
    fv = jnp.asarray(rng.randn(786432, C) * 0.1, jnp.float32)

    def s_vox(s, fv_a):
        g = grid.replace(feats=fv_a + s * 0)
        return sparse.conv(g, kmap, w, None)[0, 0] * 0 + s + 1

    print(f"voxel conv ref:    {devtime(s_vox, args=(fv,)):7.2f} ms")


if __name__ == "__main__" and not os.environ.get("GPCR_GLOBAL_PROBE") and not os.environ.get("GPCR_BARRIER_PROBE"):
    main()


def global_vs_blocked():
    """Is the blocked-window machinery itself the cost? Global 9-col
    gather from the full 1.4M-row ext table vs the blocked path."""
    rng = np.random.RandomState(0)
    n = 800_000
    sf = 448
    v = rng.randn(n, 3)
    v /= np.linalg.norm(v, axis=1, keepdims=True)
    v[:, 1] *= 1.6
    v *= 0.55
    coords = np.clip((v + rng.randn(n, 3) * 0.002) * sf + 512, 0,
                     1023).astype(np.float32)
    (b0, d0), _ = zb.plan_brick_capacities(coords, levels=2)
    grid = jax.jit(functools.partial(
        sparse.quantize_average, capacity=786432))(
        jnp.asarray(coords), jnp.zeros((n, 1), jnp.float32))
    plan = jax.jit(functools.partial(
        zb.build_brick_plan, capacity=b0, dilated_capacity=d0))(grid)
    C = 32
    zd = plan.z
    ext = jnp.asarray(rng.randn(d0 + 1, (zd + 2) * C) * 0.1, jnp.float32)
    w = jnp.asarray(rng.randn(27, C, C) * 0.1, jnp.float32)

    def s_global(s, ext_a):
        acc = jnp.zeros((b0, (zd + 2) * C), jnp.float32)
        for o in range(9):
            acc = acc + ext_a[plan.bkmap9[:, o] + s.astype(jnp.int32) * 0]
        return acc[0, 0] * 0 + s + 1

    print(f"9-col gather GLOBAL: {devtime(s_global, args=(ext,)):7.2f} ms")

    def s_conv_global(s, fb_a):
        out = zb.brick_conv(fb_a + s * 0, w, None, plan, block=None)
        return out[0, 0, 0] * 0 + s + 1

    fb = jnp.asarray(rng.randn(b0, zd, C) * 0.1, jnp.float32)
    print(f"brick_conv GLOBAL:   "
          f"{devtime(s_conv_global, args=(fb,)):7.2f} ms")

    def s_conv_blocked(s, fb_a):
        out = zb.brick_conv(fb_a + s * 0, w, None, plan)
        return out[0, 0, 0] * 0 + s + 1

    print(f"brick_conv AUTO:     "
          f"{devtime(s_conv_blocked, args=(fb,)):7.2f} ms")


if __name__ == "__main__" and os.environ.get("GPCR_GLOBAL_PROBE"):
    global_vs_blocked()
    raise SystemExit


def barrier_probe():
    """Does materializing the gather (optimization_barrier) before the
    matmul fix the fused gather+matmul slowdown?"""
    rng = np.random.RandomState(0)
    n = 800_000
    sf = 448
    v = rng.randn(n, 3)
    v /= np.linalg.norm(v, axis=1, keepdims=True)
    v[:, 1] *= 1.6
    v *= 0.55
    coords = np.clip((v + rng.randn(n, 3) * 0.002) * sf + 512, 0,
                     1023).astype(np.float32)
    (b0, d0), _ = zb.plan_brick_capacities(coords, levels=2)
    grid = jax.jit(functools.partial(
        sparse.quantize_average, capacity=786432))(
        jnp.asarray(coords), jnp.zeros((n, 1), jnp.float32))
    plan = jax.jit(functools.partial(
        zb.build_brick_plan, capacity=b0, dilated_capacity=d0))(grid)
    C = 32
    zd = plan.z
    w6 = (zd + 2) * C
    ext = jnp.asarray(rng.randn(d0 + 1, w6) * 0.1, jnp.float32)
    band = jnp.asarray(rng.randn(9, w6, zd * C) * 0.1, jnp.float32)

    def s_nobar(s, ext_a):
        acc = jnp.zeros((b0, zd * C), jnp.float32)
        for o in range(9):
            g = ext_a[plan.bkmap9[:, o] + s.astype(jnp.int32) * 0]
            acc = acc + jax.lax.dot_general(
                g, band[o], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
        return acc[0, 0] * 0 + s + 1

    print(f"gather+matmul fused:    {devtime(s_nobar, args=(ext,)):7.2f} ms")

    def s_bar(s, ext_a):
        acc = jnp.zeros((b0, zd * C), jnp.float32)
        for o in range(9):
            g = ext_a[plan.bkmap9[:, o] + s.astype(jnp.int32) * 0]
            g = jax.lax.optimization_barrier(g)
            acc = acc + jax.lax.dot_general(
                g, band[o], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
        return acc[0, 0] * 0 + s + 1

    print(f"gather|BARRIER|matmul:  {devtime(s_bar, args=(ext,)):7.2f} ms")

    # matmuls alone on a materialized buffer
    g0 = jnp.asarray(rng.randn(b0, w6) * 0.1, jnp.float32)

    def s_mm(s, g_a):
        acc = jnp.zeros((b0, zd * C), jnp.float32)
        for o in range(9):
            acc = acc + jax.lax.dot_general(
                g_a + s * 0, band[o], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
        return acc[0, 0] * 0 + s + 1

    print(f"9 banded matmuls alone: {devtime(s_mm, args=(g0,)):7.2f} ms")


if __name__ == "__main__" and os.environ.get("GPCR_BARRIER_PROBE"):
    barrier_probe()
    raise SystemExit
