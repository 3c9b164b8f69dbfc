"""Device-accurate stage timing for the stream rasterizer.

Through the axon tunnel every synchronized timing carries ~27 ms of RTT
with +-5 ms jitter, which swamps 5-15 ms stages. This harness times each
stage over K chained iterations INSIDE one jit (a lax.scan whose carry
perturbs an input, so iterations serialize and nothing hoists), then
divides: tunnel cost amortizes to noise.

Run on TPU: python scripts/ablate_stream.py
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

from gpcr_tpu.ops import rasterize as R
from gpcr_tpu.ops import rasterize_stream as S
from gpcr_tpu.render.renderer import (
    get_rasterize_param_from_camera, pcgc_rescale,
)
from gpcr_tpu.structures.trajectory import CameraTrajectory
from gpcr_tpu.utils import sh as sh_utils
from gpcr_tpu.utils.timing import sync

K = 8


def devtime(make_step, reps=4, args=()):
    """make_step(s, *args) -> scalar. Times K chained steps inside one
    jit; ``args`` are passed as jit ARGUMENTS (a closed-over big array
    would be serialized as an HLO constant and blow the tunnel's request
    limit)."""

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
    ts = np.asarray(ts)
    return float((np.median(ts) - 27.0) / K)


def main():
    rng = np.random.RandomState(0)
    n = 800_000
    res, ssrate, sf, fov = 1024, 2, 448, 45.0
    v = rng.randn(n, 3)
    v /= np.linalg.norm(v, axis=1, keepdims=True)
    v[:, 1] *= 1.6
    v *= 0.55
    xyz_world = v + rng.randn(n, 3) * 0.01
    rgb = rng.rand(n, 3).astype(np.float32)
    coords = (xyz_world * sf + 512).astype(np.float32)

    traj = CameraTrajectory(
        mode="circle", n_imgs=4, total=1,
        params={"d": 0, "r": 3, "center_angles": [90, 0]},
    )
    cam = traj.get_camera(fov=fov, width_px=res, height_px=res)
    rp = get_rasterize_param_from_camera(
        cam, fov, bg=jnp.ones(3), sh_degree=1, super_sample_rate=ssrate
    )
    means = pcgc_rescale(jnp.asarray(coords), 512, sf)
    shs = jnp.concatenate(
        [sh_utils.RGB2SH(jnp.asarray(rgb))[:, None, :], jnp.zeros((n, 12, 3))],
        axis=1,
    )
    scales = jnp.ones((n, 3)) * (1.0 / sf)
    rotations = jnp.broadcast_to(jnp.array([1.0, 0, 0, 0]), (n, 4))
    opacity = jnp.ones((n,))

    config = R.RasterizeConfig(
        max_dup_per_gaussian=4, chunk_size=128,
        k_budget=1_800_000, max_active_tiles=8192, impl="stream",
    )
    H = W = res * ssrate
    grid_x = -(-W // config.tile_x)
    num_tiles = grid_x * (-(-H // config.tile_y))
    settings = R.GaussianRasterizationSettings(
        image_height=H, image_width=W, tanfovx=rp["tanfov"],
        tanfovy=rp["tanfov"], bg=jnp.ones(12), scale_modifier=1.0,
        viewmatrix=rp["view_t"][0], projmatrix=rp["full_t"][0],
        sh_degree=1, campos=rp["campos"][0],
    )
    feats = jnp.concatenate(
        [sh_utils.eval_sh_color(1, shs, means, settings.campos),
         means, jnp.ones_like(means), jnp.zeros_like(means)], axis=-1
    )
    prep = jax.jit(functools.partial(
        R.preprocess, settings=settings, config=config))(
        means, opacity, scales=scales, rotations=rotations,
        colors_precomp=feats)

    cap = config.max_dup_per_gaussian
    ch = config.chunk_size
    kb = min(-(-(config.k_budget or n * cap) // ch) * ch, n * cap)

    # ---- stage snapshots (host-built once, stages perturb + recompute) --
    depth_key = jnp.where(prep.valid, prep.depth, jnp.inf)

    def presort_of(s):
        return jax.lax.sort(
            (depth_key + s * 1e-20, jnp.arange(n, dtype=jnp.int32),
             prep.valid.astype(jnp.int32), prep.rect[:, 0],
             prep.rect[:, 1], prep.rect[:, 2], prep.rect[:, 3]),
            num_keys=2)

    ms = devtime(lambda s, dk: jax.lax.sort(
        (dk + s * 1e-20, jnp.arange(n, dtype=jnp.int32),
         prep.valid.astype(jnp.int32), prep.rect[:, 0], prep.rect[:, 1],
         prep.rect[:, 2], prep.rect[:, 3]), num_keys=2,
    )[1].sum().astype(jnp.float32) * 0 + s + 1, args=(depth_key,))
    print(f"presort (7 payloads):   {ms:7.2f} ms")

    _, gidx_s, valid_si, rminx_s, rminy_s, rmaxx_s, rmaxy_s = jax.jit(
        presort_of)(jnp.float32(0))

    def packed_of(s):
        rect_f = prep.rect.astype(jnp.float32)
        p = jnp.concatenate(
            [prep.mean2d + s, prep.conic, prep.opacity[:, None],
             prep.depth[:, None], jnp.zeros((n, 1)), prep.features,
             rect_f], axis=-1).astype(jnp.float32)
        return jnp.pad(p, ((0, 1), (0, 128 - p.shape[1])))

    ms = devtime(lambda s: packed_of(s)[0, 0] * 0 + s + 1)
    print(f"packed table build:     {ms:7.2f} ms")
    packed = jax.jit(packed_of)(jnp.float32(0))

    def emit_of(si):
        valid_s = (valid_si + si).astype(bool)[None, :]
        rw = jnp.maximum(rmaxx_s - rminx_s, 1)[None, :]
        area_raw = ((rmaxx_s - rminx_s) * (rmaxy_s - rminy_s))[None, :]
        area = jnp.where(valid_s, jnp.minimum(area_raw, cap), 0)
        k = jax.lax.broadcasted_iota(jnp.int32, (cap, n), 0)
        kdiv = jnp.zeros((cap, n), jnp.int32)
        for j in range(1, cap):
            kdiv = kdiv + (k >= j * rw).astype(jnp.int32)
        kmod = k - kdiv * rw
        ty = rminy_s[None, :] + kdiv
        tx = rminx_s[None, :] + kmod
        dup_valid = valid_s & (k < area)
        tile_flat = jnp.where(
            dup_valid, ty * grid_x + tx, num_tiles
        ).astype(jnp.int32).reshape(-1)
        pos_flat = jax.lax.broadcasted_iota(
            jnp.int32, (cap, n), 1).reshape(-1)
        g_flat = jnp.where(dup_valid, gidx_s[None, :], n).reshape(-1)
        return tile_flat, pos_flat, g_flat

    ms = devtime(
        lambda s: emit_of(s.astype(jnp.int32))[0][0].astype(jnp.float32)
        * 0 + s + 1)
    print(f"emit (cap,n):           {ms:7.2f} ms")
    tile_flat, pos_flat, g_flat = jax.jit(
        lambda: emit_of(jnp.int32(0)))()

    def sort3_of(si):
        return jax.lax.sort(
            (tile_flat + si, pos_flat, g_flat), num_keys=2)

    ms = devtime(
        lambda s: sort3_of(s.astype(jnp.int32) * 0)[0][0].astype(
            jnp.float32) * 0 + s + 1)
    print(f"2-key sort (3 arrays):  {ms:7.2f} ms")

    def sort2_stable_of(si):
        return jax.lax.sort(
            (tile_flat + si, g_flat), num_keys=1, is_stable=True)

    ms = devtime(
        lambda s: sort2_stable_of(s.astype(jnp.int32) * 0)[0][0].astype(
            jnp.float32) * 0 + s + 1)
    print(f"stable 1-key (2 arr):   {ms:7.2f} ms")

    sorted_tile, _, sorted_g = jax.jit(lambda: sort3_of(jnp.int32(0)))()

    def starts_of(si):
        return jnp.searchsorted(
            sorted_tile[:kb] + si, jnp.arange(num_tiles + 1, dtype=jnp.int32),
            side="left").astype(jnp.int32)

    ms = devtime(
        lambda s: starts_of(s.astype(jnp.int32) * 0)[0].astype(jnp.float32)
        * 0 + s + 1)
    print(f"searchsorted:           {ms:7.2f} ms")

    def gather_of(si):
        sg = jnp.concatenate(
            [sorted_g + si, jnp.full((ch,), n, jnp.int32)], axis=0)
        return packed[sg[: kb + ch]]

    def gather_step(s, packed_a, sorted_g_a):
        sg = jnp.concatenate(
            [sorted_g_a + s.astype(jnp.int32) * 0,
             jnp.full((ch,), n, jnp.int32)], axis=0)
        return packed_a[sg[: kb + ch]][0, 0] * 0 + s + 1

    ms = devtime(gather_step, args=(packed, sorted_g))
    print(f"stream gather {kb/1e6:.1f}M:    {ms:7.2f} ms")

    def ss_sort_step(s, st_a):
        r = jnp.searchsorted(
            st_a[:kb] + s.astype(jnp.int32) * 0,
            jnp.arange(num_tiles + 1, dtype=jnp.int32),
            side="left", method="sort")
        return r[0].astype(jnp.float32) * 0 + s + 1

    ms = devtime(ss_sort_step, args=(sorted_tile,))
    print(f"searchsorted(sort):     {ms:7.2f} ms")

    def bin_of(s, pr):
        p2 = pr._replace(depth=pr.depth + s * 1e-20)
        stream, starts, ovf, _wd = S.bin_sorted_stream(
            p2, num_tiles, grid_x, config)
        return stream[0, 0] * 0 + starts[0].astype(jnp.float32) * 0 + s + 1

    ms = devtime(bin_of, args=(prep,))
    print(f"bin_sorted_stream:      {ms:7.2f} ms")

    def full_of(s, pr):
        p2 = pr._replace(depth=pr.depth + s * 1e-20)
        out, t_run, ovf, _wd = S.blend_stream(
            p2, jnp.ones(12), num_tiles, grid_x, config, 12)
        return out[0, 0, 0] * 0 + s + 1

    ms = devtime(full_of, args=(prep,))
    print(f"full blend_stream:      {ms:7.2f} ms")


if __name__ == "__main__" and not os.environ.get("GPCR_NARROW_PROBE") and not os.environ.get("GPCR_SENTINEL_PROBE"):
    main()


def narrow_gather_probe():
    """Is the gather cliff table-BYTES driven? 1.8M-row gathers from an
    800K-row table at widths 24/32/64/128 f32 lanes."""
    rng = np.random.RandomState(0)
    n, kb = 800_000, 1_800_064
    idx = jnp.asarray(rng.randint(0, n, size=(kb,)), jnp.int32)
    for w in (24, 32, 64, 128):
        tbl = jnp.asarray(rng.randn(n + 1, w), jnp.float32)

        def step(s, tbl_a, idx_a):
            return tbl_a[idx_a + s.astype(jnp.int32) * 0][0, 0] * 0 + s + 1

        ms = devtime(step, args=(tbl, idx))
        rate = kb / max(ms, 0.01) / 1e3
        print(f"  gather (800K,{w:3d})->{kb/1e6:.1f}M: {ms:7.2f} ms  "
              f"{rate:7.0f} M rows/s  table={(n*w*4)>>20} MB")


if __name__ == "__main__" and os.environ.get("GPCR_NARROW_PROBE"):
    narrow_gather_probe()
    raise SystemExit


def sentinel_probe():
    """Isolate why the real sorted_g gather is ~3x slower than random:
    ~20% of entries hit ONE sentinel row. Compare same-row spam vs
    spread sentinels."""
    rng = np.random.RandomState(0)
    n, kb = 800_000, 1_800_064
    tbl = jnp.asarray(rng.randn(n + 128, 128), jnp.float32)
    base = rng.randint(0, n, size=(kb,))
    mask = rng.rand(kb) < 0.2
    same = np.where(mask, n, base)
    spread = np.where(mask, n + (np.arange(kb) % 128), base)
    for name, ii in [("random", base), ("20% same sentinel", same),
                     ("20% spread sentinel", spread)]:
        idx = jnp.asarray(ii, jnp.int32)

        def step(s, tbl_a, idx_a):
            return tbl_a[idx_a + s.astype(jnp.int32) * 0][0, 0] * 0 + s + 1

        ms = devtime(step, args=(tbl, idx))
        print(f"  {name:22s}: {ms:7.2f} ms  {kb/max(ms,.01)/1e3:6.0f} M rows/s")


if __name__ == "__main__" and os.environ.get("GPCR_SENTINEL_PROBE"):
    sentinel_probe()
    raise SystemExit
