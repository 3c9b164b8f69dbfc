"""Why is the REAL stream gather (18.7 ms, scripts/ablate_stream.py) 2.6x
slower than a random-index gather of identical shapes (7.1 ms,
microbench_pack_gather.py)? Reconstructs the exact bench binning state and
ablates one property at a time:

  A. real sorted_g, real packed table     (the production gather)
  B. same indices, randomly SHUFFLED      (same multiset, no tile order)
  C. same indices, globally SORTED        (perfectly monotone)
  D. uniform random indices               (the microbench baseline)
  E. real indices, sentinels remapped to spread rows (n .. n+127)
  F. real indices, gather WITHOUT the in-step concat+slice glue

Run on TPU: python scripts/microbench_real_gather.py
"""

import functools
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from gpcr_tpu.utils.cache import enable_persistent_cache

enable_persistent_cache()

from gpcr_tpu.ops import rasterize as R
from gpcr_tpu.ops import rasterize_stream as S
from gpcr_tpu.render.renderer import (
    get_rasterize_param_from_camera, pcgc_rescale,
)
from gpcr_tpu.structures.trajectory import CameraTrajectory
from gpcr_tpu.utils import sh as sh_utils
from scripts.ablate_stream import devtime


def main():
    rng = np.random.RandomState(0)
    n = 800_000
    res, ssrate, sf, fov = 1024, 2, 448, 45.0
    v = rng.randn(n, 3)
    v /= np.linalg.norm(v, axis=1, keepdims=True)
    v[:, 1] *= 1.6
    v *= 0.55
    coords = ((v + rng.randn(n, 3) * 0.01) * sf + 512).astype(np.float32)
    rgb = rng.rand(n, 3).astype(np.float32)

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
        means, jnp.ones((n,)), scales=jnp.ones((n, 3)) * (1.0 / sf),
        rotations=jnp.broadcast_to(jnp.array([1.0, 0, 0, 0]), (n, 4)),
        colors_precomp=feats)

    cap = config.max_dup_per_gaussian
    ch = config.chunk_size
    kb = min(-(-(config.k_budget or n * cap) // ch) * ch, n * cap)

    # rebuild the exact production binning state (dense emit path)
    depth_key = jnp.where(prep.valid, prep.depth, jnp.inf)
    sorted_ops = jax.jit(lambda: jax.lax.sort(
        (depth_key, jnp.arange(n, dtype=jnp.int32),
         prep.valid.astype(jnp.int32), prep.rect[:, 0], prep.rect[:, 1],
         prep.rect[:, 2], prep.rect[:, 3]), num_keys=2))()
    _, gidx_s, valid_si, rminx_s, rminy_s, rmaxx_s, rmaxy_s = sorted_ops

    def emit():
        valid_s = valid_si.astype(bool)[None, :]
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
        ).astype(jnp.int32).T.reshape(-1)
        g_flat = jnp.where(dup_valid, gidx_s[None, :], n).T.reshape(-1)
        return jax.lax.sort((tile_flat, g_flat), num_keys=1, is_stable=True)

    sorted_tile, sorted_g = jax.jit(emit)()
    packed = jax.jit(lambda: jnp.pad(jnp.concatenate(
        [prep.mean2d, prep.conic, prep.opacity[:, None],
         prep.depth[:, None], jnp.zeros((n, 1)), prep.features,
         prep.rect.astype(jnp.float32)], axis=-1).astype(jnp.float32),
        ((0, 1), (0, 128 - 24))))()

    sg = np.asarray(sorted_g)[:kb]
    frac_sent = float((sg >= n).mean())
    print(f"kb={kb} sentinel_frac={frac_sent:.3f} "
          f"uniq={len(np.unique(sg))}")

    def bare(s, tbl, ii):
        return tbl[ii + s.astype(jnp.int32) * 0][0, 0] * 0 + s + 1

    for name, ii in [
        ("A real tile-sorted", sg),
        ("B shuffled same multiset", np.random.RandomState(1).permutation(sg)),
        ("C globally sorted", np.sort(sg)),
        ("D uniform random", np.random.RandomState(2).randint(0, n, kb)),
        ("E real, sentinels spread",
         np.where(sg >= n, n, sg)),  # packed has only n+1 rows; same row
    ]:
        ms = devtime(bare, args=(packed, jnp.asarray(ii, jnp.int32)))
        print(f"{name:28s}: {ms:7.2f} ms  {kb/max(ms,.01)/1e3:5.0f} M rows/s")

    # F: the production formulation (concat sentinel pad + slice) on A
    def prod(s, tbl, ii):
        sg2 = jnp.concatenate(
            [ii + s.astype(jnp.int32) * 0, jnp.full((ch,), n, jnp.int32)],
            axis=0)
        return tbl[sg2[: kb + ch]][0, 0] * 0 + s + 1

    ms = devtime(prod, args=(packed, jnp.asarray(sg, jnp.int32)))
    print(f"{'F production concat+slice':28s}: {ms:7.2f} ms")


if __name__ == "__main__":
    main()
