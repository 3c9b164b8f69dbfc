"""Span statistics for the round-5 in-kernel merge-gather design.

Design under evaluation: sort the packed table by (primary tile, depth
rank); a tile t's contributors then live in <= 4 contiguous-ish RUNS of
that table (primary tiles t, t-1, t-gx, t-gx-1 for cap-4 rects). The
kernel would DMA, per 256-entry chunk of the depth-sorted entry stream,
one tight window per run and merge rows via an exact MXU 0/1-selection
matmul. Feasibility hinges on the per-chunk per-run SPANS (window rows
needed): spans much larger than the entry count kill both the DMA
traffic and the selection matmul.

CPU analysis on the real bench geometry (no TPU needed).
Run: python scripts/span_stats.py [--points 800000] [--chunk 256]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("JAX_PLATFORMS", "cpu")

import numpy as np
import jax.numpy as jnp

from gpcr_tpu.ops import rasterize as R
from gpcr_tpu.render.renderer import (
    get_rasterize_param_from_camera, pcgc_rescale,
)
from gpcr_tpu.structures.trajectory import CameraTrajectory
from gpcr_tpu.utils import sh as sh_utils


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--points", type=int, default=800_000)
    ap.add_argument("--chunk", type=int, default=256)
    ap.add_argument("--res", type=int, default=1024)
    ap.add_argument("--ssrate", type=int, default=2)
    args = ap.parse_args()

    rng = np.random.RandomState(0)
    n = args.points
    v = rng.randn(n, 3)
    v /= np.linalg.norm(v, axis=1, keepdims=True)
    v[:, 1] *= 1.6
    v *= 0.55
    xyz_world = v + rng.randn(n, 3) * 0.01
    coords = (xyz_world * 448 + 512).astype(np.float32)

    traj = CameraTrajectory(
        mode="circle", n_imgs=4, total=1,
        params={"d": 0, "r": 3, "center_angles": [90, 0]},
    )
    cam = traj.get_camera(fov=45.0, width_px=args.res, height_px=args.res)
    rp = get_rasterize_param_from_camera(
        cam, 45.0, bg=jnp.ones(3), sh_degree=1,
        super_sample_rate=args.ssrate,
    )
    means = pcgc_rescale(jnp.asarray(coords), 512, 448)
    scales = jnp.ones((n, 3)) * (1.0 / 448)
    rotations = jnp.broadcast_to(jnp.array([1.0, 0, 0, 0]), (n, 4))
    opacity = jnp.ones((n,))

    config = R.RasterizeConfig(max_dup_per_gaussian=4, chunk_size=args.chunk)
    settings = R.GaussianRasterizationSettings(
        rp["height"], rp["width"], rp["tanfov"], rp["tanfov"],
        jnp.ones(3), 1.0, rp["view_t"][0], rp["full_t"][0], 0,
        rp["campos"][0],
    )
    prep = R.preprocess(
        means, opacity, settings, config,
        scales=scales, rotations=rotations,
        colors_precomp=jnp.zeros((n, 3)),
    )
    gx = -(-rp["width"] // config.tile_x)
    gy = -(-rp["height"] // config.tile_y)
    nt = gx * gy

    valid = np.asarray(prep.valid)
    rect = np.asarray(prep.rect)
    depth = np.asarray(prep.depth)

    # depth rank (presort (depth, gidx))
    order_d = np.lexsort((np.arange(n), np.where(valid, depth, np.inf)))
    rank = np.empty(n, np.int64)
    rank[order_d] = np.arange(n)

    ptile = np.where(valid, rect[:, 1] * gx + rect[:, 0], nt)
    # spatial order: (ptile, rank)
    order_s = np.lexsort((rank, ptile))
    spos = np.empty(n, np.int64)
    spos[order_s] = np.arange(n)

    # emit entries: (tile, rank, spos)
    tiles, ranks, sposs = [], [], []
    rw = rect[:, 2] - rect[:, 0]
    rh = rect[:, 3] - rect[:, 1]
    for k in range(4):
        kd, km = k // 2, k % 2  # row-major rect enumeration for cap 4
        sel = valid & (rw > km) & (rh > kd) & (rw * rh > k)
        t = (rect[sel, 1] + kd) * gx + (rect[sel, 0] + km)
        tiles.append(t)
        ranks.append(rank[sel])
        sposs.append(spos[sel])
    tiles = np.concatenate(tiles)
    ranks = np.concatenate(ranks)
    sposs = np.concatenate(sposs)
    e_order = np.lexsort((ranks, tiles))
    tiles, ranks, sposs = tiles[e_order], ranks[e_order], sposs[e_order]
    kb = len(tiles)
    print(f"entries={kb} nonempty_tiles={len(np.unique(tiles))}")

    # per-chunk per-run spans
    starts = np.searchsorted(tiles, np.arange(nt + 1))
    pstarts = np.searchsorted(ptile[order_s], np.arange(nt + 1))
    ch = args.chunk
    spans_single = []  # one window for all 4 runs
    spans_pair = []    # two windows: {t-gx-1, t-gx}, {t-1, t}
    spans_run = []     # four per-run windows (sum of spans)
    counts = []
    for t in np.nonzero(starts[1:] - starts[:-1])[0]:
        s, e = starts[t], starts[t + 1]
        for c0 in range(s, e, ch):
            p = sposs[c0:min(c0 + ch, e)]
            counts.append(len(p))
            spans_single.append(p.max() - p.min() + 1)
            run = np.zeros(len(p), np.int64)
            # classify by which neighbor ptile segment the position is in
            for ri, pt in enumerate([t - gx - 1, t - gx, t - 1, t]):
                if 0 <= pt < nt:
                    m = (p >= pstarts[pt]) & (p < pstarts[pt + 1])
                    run[m] = ri
            tot = 0
            for ri in range(4):
                q = p[run == ri]
                if len(q):
                    tot += q.max() - q.min() + 1
            spans_run.append(tot)
            tot2 = 0
            for pair in ((0, 1), (2, 3)):
                m = (run == pair[0]) | (run == pair[1])
                q = p[m]
                if len(q):
                    tot2 += q.max() - q.min() + 1
            spans_pair.append(tot2)

    for name, arr in (("single", spans_single), ("pair", spans_pair),
                      ("run4", spans_run)):
        a = np.asarray(arr)
        print(f"{name:7s}: mean {a.mean():7.1f}  p50 {np.percentile(a,50):7.0f}"
              f"  p90 {np.percentile(a,90):7.0f}  p99 {np.percentile(a,99):7.0f}"
              f"  max {a.max():7d}")
    c = np.asarray(counts)
    print(f"chunks={len(c)} mean_count={c.mean():.1f}")
    # waste ratio: DMA'd rows / contributing entries at p99 static caps
    a = np.asarray(spans_run)
    print(f"run4 span/count mean ratio: {(a / np.maximum(c,1)).mean():.2f}")


if __name__ == "__main__":
    main()
