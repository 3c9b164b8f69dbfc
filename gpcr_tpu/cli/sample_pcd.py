"""Mesh -> point-cloud dataset generation CLI
(``sample_point_cloud_from_mesh.py`` equivalent: mp.Pool over
``<root>/<id>/<id>.obj`` assets, saving ``pcd_0.ply``)."""

from __future__ import annotations

import argparse
import multiprocessing as mp
import os
import sys
import traceback


def sample_mesh(task):
    root, asset_id, num_points, method, out_name = task
    try:
        from gpcr_tpu.structures.mesh import Mesh

        mesh_fn = os.path.join(root, asset_id, f"{asset_id}.obj")
        mesh = Mesh(mesh_fn, scale=1.0)
        pcd = mesh.sample_point_cloud(num_points, method=method)
        out = os.path.join(root, asset_id, out_name)
        pcd.save(out, overwrite=True)
        print(f"[ok] {asset_id}: {int(pcd.get_num_valid_points(0))} points -> {out}")
    except Exception:
        print(f"[error] {asset_id}:", file=sys.stderr)
        traceback.print_exc()


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--dataset_root", type=str, required=True)
    ap.add_argument("--num_points", type=int, default=800_000)
    ap.add_argument("--method", type=str, default="uniform_quantized",
                    choices=["uniform", "uniform_quantized", "poisson_disk",
                             "uniform_camera"])
    ap.add_argument("--out_name", type=str, default="pcd_0.ply")
    ap.add_argument("--workers", type=int, default=8)
    ap.add_argument("--id_list", type=str, default="",
                    help="comma-separated; empty = all subdirs")
    args = ap.parse_args(argv)

    if args.id_list:
        ids = args.id_list.split(",")
    else:
        ids = sorted(
            d for d in os.listdir(args.dataset_root)
            if os.path.isdir(os.path.join(args.dataset_root, d))
        )
    tasks = [
        (args.dataset_root, i, args.num_points, args.method, args.out_name)
        for i in ids
        if os.path.exists(os.path.join(args.dataset_root, i, f"{i}.obj"))
    ]
    if args.workers <= 1 or len(tasks) <= 1:
        for t in tasks:
            sample_mesh(t)
    else:
        ctx = mp.get_context("forkserver")
        with ctx.Pool(args.workers) as pool:
            pool.map(sample_mesh, tasks)


if __name__ == "__main__":
    main()
