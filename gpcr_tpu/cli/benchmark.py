"""Benchmark CLI — the ``simple_benchmark.py`` equivalent.

Tasks and flags mirror the reference (simple_benchmark.py:317-351):
    python -m gpcr_tpu.cli.benchmark pcrender --ckpt ... --id_list 0519 \
        --dataset_root ./example/THuman-256 --scale_factor 256 --fov 45 \
        --voxelized
    python -m gpcr_tpu.cli.benchmark simple --scale_factor 448 --fov 45
    python -m gpcr_tpu.cli.benchmark cam --cam_mode circle ...

Differences by design (TPU-first):
- metric scoring runs in-process (gpcr_tpu.cli.pic_metrics) instead of
  python subprocesses (simple_benchmark.py:27-52) — identical formulas and
  printed lines;
- mesh ground truth uses the native BVH ray tracer instead of Open3D.
"""

from __future__ import annotations

import argparse
import os
import sys

import jax.numpy as jnp
import numpy as np

from ..io.image import save_pic
from ..render.renderer import PCMLRender, SimpleRender, generate_cam
from ..structures.camera import Camera
from ..structures.mesh import Mesh
from ..structures.pointcloud import PointCloud
from ..structures.ray import Ray
from . import pic_metrics

point_light_dict = {
    "longdress": {
        "xyz_w": [
            jnp.asarray([5.0, -5.0, -5.0]),
            jnp.asarray([-5.0, 5.0, -5.0]),
            jnp.asarray([0.0, -5.0, -5.0]),
        ],
        "color": [
            jnp.asarray([1.0, 1.0, 1.0]),
            jnp.asarray([1.0, 1.0, 1.0]),
            jnp.asarray([1.0, 1.0, 1.0]),
        ],
        "light_coeff": [0.7, 0.6, 0.3, 0.1],
    },
}


def get_gt(pth: str, cam: Camera) -> dict:
    """Ray-traced mesh ground truth (simple_raw_render.py:856-865)."""
    mesh = Mesh(pth, scale=1.0)
    o, d = cam.generate_camera_rays(subsample=1, offsets="center")
    return mesh.get_ray_intersection(Ray(origins_w=o, directions_w=d))


def _camera_for(args, task: str):
    if args.cam_mode == "udlrfb":
        cam_info = {"fov": args.fov, "width_px": 512, "height_px": 512,
                    "mode": "udlrfb", "n_imgs": 6}
    elif args.cam_mode == "circle":
        cam_info = {
            "fov": args.fov, "width_px": 512, "height_px": 512,
            "mode": "circle", "n_imgs": 12, "d": 0, "r": 3,
            "center_angles": [90, 0], "alt_yaxis": False,
        }
    else:
        wh = 1024 if task == "pcrender" else 512
        cam_info = {"fov": args.fov, "width_px": wh, "height_px": wh,
                    "mode": args.cam_json, "n_imgs": 12}
    return generate_cam(cam_info), cam_info


def _score(rpth, render_dir, gt_dir):
    pic_metrics.psnr_dirs(render_dir, gt_dir,
                          diff_dir=os.path.join(rpth, "difmap2", "diff"))
    pic_metrics.msssim_dirs(render_dir, gt_dir)
    pic_metrics.lpips_dirs(render_dir, gt_dir)


def _save_mesh_gt(args, id, camera, rpth):
    tm20 = f"{args.dataset_root}/{id}/"
    mesh_gt = get_gt(tm20 + f"{id}.obj", camera)
    bg = jnp.asarray(args.background_color, jnp.float32)
    rgb = jnp.asarray(mesh_gt["ray_rgbs"]) + (
        1 - jnp.asarray(mesh_gt["hit_map"])[..., None]
    ) * bg
    save_pic(np.asarray(rgb), rpth + f"{id}_mesh_gt", "rgb")
    save_pic(
        np.asarray(mesh_gt["surface_normals_w"]), rpth + f"{id}_mesh_gt",
        "normal_w",
        hit_map=np.asarray(mesh_gt["hit_map"])[..., None],
    )


def _save_render_outputs(out, rpth, tag):
    save_pic(np.asarray(out["rgb"]), rpth + tag, type="rgb")
    if out.get("normal") is not None:
        save_pic(np.asarray(out["normal"]), rpth + tag, type="normal_w")
    if out.get("xyz_w") is not None:
        save_pic(np.asarray(out["xyz_w"]), rpth + tag, type="xyz_w")
    if out.get("shaded") is not None:
        save_pic(np.asarray(out["shaded"]), rpth + tag, type="shaded")


def _raster_config(args):
    """Inference raster config: the Pallas stream kernel with a
    tiles-per-splat cap (overflow is counted; raise --dup_cap if a scene
    warns)."""
    from ..ops.rasterize import RasterizeConfig

    return RasterizeConfig(
        impl="stream", max_dup_per_gaussian=args.dup_cap,
        # 256-row chunks halve the stream kernel's per-chunk fixed costs
        # (bench.py sweep: 70.2 -> 60.1 ms/frame vs 128; 512 loses to
        # tile padding waste). The XLA blend path keeps its own 128
        # optimum via the RasterizeConfig default.
        chunk_size=256,
        max_active_tiles=args.max_active_tiles or None,
        k_budget=args.k_budget or None,
        # opacity-aware tile rects: bit-exact contributor sets (see
        # RasterizeConfig.opacity_radius) — a pure entry-count cut for
        # the learned path's mostly-low opacities; a no-op for the
        # analytic simple path (opacity 1)
        opacity_radius=not getattr(args, "no_opacity_radius", False),
        # 1-pass bf16 feature contraction by default: the CLI's output
        # protocol is uint8 PNGs (save_pic, matching the reference's own
        # PNG scoring in pic_psnr.py:44) and the bf16 error (~4e-3 rel)
        # sits below one uint8 step (1/255 = 3.9e-3) — quantization-
        # invisible almost everywhere. Measured 47.3 -> 44.1 ms/frame at
        # the bench shape (round 4). --feat_f32 restores the f32-exact
        # 6-pass MXU contraction for float-output consumers.
        feat_precision=("highest" if getattr(args, "feat_f32", False)
                        else "default"),
    )


def get_pcrender_renders(args):
    rdr = PCMLRender(
        args.ckpt, voxelized=args.voxelized, scale_factor=args.scale_factor,
        offset=args.offset,
        # the reference always runs a warmup inference before its timed one
        # (simple_raw_render.py:372-379); under XLA the first call compiles
        warm_timing=True,
        config=_raster_config(args),
        shard=(args.shard if args.shard != "none" else None),
        kb_sweep=args.kb_sweep,
    )
    camera, cam_info = _camera_for(args, "pcrender")
    input_offset = np.array(args.input_offset.split(","), dtype=np.float32)
    print("[Info] input_offset:", input_offset)
    for id in args.id_list.split(","):
        print("[Info] Processing", id)
        tm20 = f"{args.dataset_root}/{id}/"
        rpth = args.rpth
        if not args.metric_only:
            pcd = PointCloud.from_ply(tm20 + "pcd_0.ply")
            print("[Info] pts_center:", np.asarray(pcd.xyz_w[0]).mean(0))
            if args.down_sample_ratio != 1.0:
                n = pcd.get_num_points()
                keep = np.random.choice(
                    n, int(n * args.down_sample_ratio), replace=False
                )
                pcd = pcd.replace(
                    xyz_w=pcd.xyz_w[:, keep], rgb=pcd.rgb[:, keep],
                    normal_w=(pcd.normal_w[:, keep]
                              if pcd.normal_w is not None else None),
                    valid_mask=None,
                )
            if not args.skip_mesh:
                _save_mesh_gt(args, id, camera, rpth)
            out = rdr.render(
                pcd, scale=None, cam=camera, fov=cam_info["fov"],
                enable_opacity=True, super_sample_rate=args.pcrender_ssrate,
                input_offset=input_offset,
                point_light=point_light_dict.get(id),
                background_color=jnp.asarray(args.background_color, jnp.float32),
            )
            _save_render_outputs(out, rpth, f"{id}_pcrender")
        if not args.skip_mesh:
            _score(rpth, rpth + f"{id}_pcrender", rpth + f"{id}_mesh_gt")


def get_simple_renders(args):
    rdr = SimpleRender(
        voxelized=args.voxelized, scale_factor=args.scale_factor,
        offset=args.offset, config=_raster_config(args),
        warm_timing=True,
        shard=(args.shard if args.shard != "none" else None),
        kb_sweep=args.kb_sweep,
    )
    camera, cam_info = _camera_for(args, "simple")
    input_offset = np.array(args.input_offset.split(","), dtype=np.float32)
    print("[Info] input_offset:", input_offset)
    for id in args.id_list.split(","):
        print("[Info] Processing", id)
        tm20 = f"{args.dataset_root}/{id}/"
        rpth = args.rpth
        tag = f"{id}_simple_sigma_{args.sigma}"
        if not args.metric_only:
            pcd = PointCloud.from_ply(tm20 + "pcd_0.ply")
            if args.down_sample_ratio != 1.0:
                pcd = pcd.voxel_downsampling(cell_width=2.0)
            if pcd.normal_w is None:
                # the reference estimates normals for the simple task
                # (simple_benchmark.py:263-277: kNN avg-distance probe +
                # o3d estimate_normals); the PCA equivalent lives in
                # structures/reconstruct.py
                xyz = np.asarray(pcd.xyz_w[0])
                probe = xyz[:: max(1, len(xyz) // 2000)]
                nn = np.full(len(probe), np.inf)
                for s in range(0, len(xyz), 65536):  # NN dist vs ALL points
                    blk = xyz[s:s + 65536]
                    d2 = ((probe[:, None, :] - blk[None, :, :]) ** 2).sum(-1)
                    d2[d2 == 0] = np.inf  # self-match
                    nn = np.minimum(nn, d2.min(1))
                print("[Info] avg_dist:", float(np.sqrt(nn).mean()))
                pcd = pcd.estimate_normals()
            if not args.skip_mesh:
                _save_mesh_gt(args, id, camera, rpth)
            out = rdr.render(
                pcd, scale=None, cam=camera, fov=cam_info["fov"],
                enable_opacity=False, super_sample_rate=args.pcrender_ssrate,
                input_offset=input_offset,
                point_light=point_light_dict.get(id),
                background_color=float(np.mean(args.background_color)),
                sigma=args.sigma,
            )
            _save_render_outputs(out, rpth, tag)
        if not args.skip_mesh:
            _score(rpth, rpth + tag, rpth + f"{id}_mesh_gt")


def get_camera_info(args):
    """Task 'cam': save a camera trajectory state dict
    (simple_benchmark.py:54-134, incl. the 5-stage 1024² plot1 storyboard)."""
    if args.cam_mode == "plot1":
        base = {
            "fov": args.fov, "width_px": 1024, "height_px": 1024,
            "mode": "circle", "d": 0, "center_angles": [90, 0],
            "alt_yaxis": False,
        }
        cams = [generate_cam({**base, "n_imgs": 150, "r": 3})]
        for r in np.linspace(3, 1.5, 30):  # zoom in
            cams.append(generate_cam({**base, "n_imgs": 1, "r": float(r)}))
        cams += [generate_cam({**base, "n_imgs": 1, "r": 1.5})] * 60  # stay
        for r in np.linspace(1.5, 3, 30):  # zoom out
            cams.append(generate_cam({**base, "n_imgs": 1, "r": float(r)}))
        cams += [generate_cam({**base, "n_imgs": 1, "r": 3})] * 30  # stay
        camera = Camera.cat(cams, dim=1)
    else:
        camera, _ = _camera_for(args, "cam")
    if args.use_t_indices:
        t_idx = np.round(np.arange(0, args.num_frames // 2 - 1, 0.5)).astype(
            np.int32
        )
        np.save(args.t_idx_pth, t_idx)
    os.makedirs(os.path.dirname(args.cam_save_path) or ".", exist_ok=True)
    camera.save(args.cam_save_path)
    print(f"[Info] saved camera trajectory ({camera.H_c2w.shape}) to "
          f"{args.cam_save_path}")


def build_parser():
    p = argparse.ArgumentParser()
    p.add_argument("task", type=str, choices=["pcrender", "simple", "cam"])
    p.add_argument("--ckpt", type=str,
                   default="./models/1-21-2/train/checkpoint/model_epoch39.pth")
    p.add_argument("--id_list", type=str, default="0519")
    p.add_argument("--dataset_root", type=str, default="./example/THuman-256")
    p.add_argument("--rpth", type=str, default="validate/res/render/")
    p.add_argument("--pcrender_ssrate", type=int, default=2)
    p.add_argument("--skip_mesh", action="store_true")
    p.add_argument("--fov", type=int, default=45)
    p.add_argument("--voxelized", action="store_true")
    p.add_argument("--scale_factor", type=int, default=256)
    p.add_argument("--input_offset", type=str, default="0,0,0")
    p.add_argument("--cam_mode", type=str, default="circle")
    p.add_argument("--cam_json", type=str, default="")
    p.add_argument("--background_color", type=str, default="1")
    p.add_argument("--metric_only", action="store_true")
    p.add_argument("--sigma", type=float, default=1.0)
    p.add_argument("--simple_on", action="store_true")
    p.add_argument("--offset", type=int, default=512)
    p.add_argument("--cam_save_path", type=str, default="validate/res/cam/cam.npz")
    p.add_argument("--down_sample_ratio", type=float, default=1.0)
    p.add_argument("--dup_cap", type=int, default=16,
                   help="tiles-per-splat cap for the stream rasterizer")
    p.add_argument("--k_budget", type=int, default=-1,
                   help="sorted-entry stream budget (0 = unbounded, "
                        "-1 = auto: sized to the scene's exact per-view "
                        "entry count, bucketed to 256K — the gather and "
                        "sort are linear in this, so auto beats any "
                        "blanket default); dropped entries are warned "
                        "after the render")
    p.add_argument("--kb_sweep", type=int, default=0,
                   help="try this many extra 256K k_budget size classes "
                        "above the auto/explicit budget and keep the "
                        "fastest (allocator-lottery sweep — adjacent size "
                        "classes differ by up to ~2x stream-gather rate; "
                        "each candidate costs one persistent-cached "
                        "compile, all before the timed pass)")
    p.add_argument("--feat_f32", action="store_true",
                   help="f32-exact 6-pass feature contraction instead of "
                        "the default 1-pass bf16 (whose ~4e-3 error is "
                        "below one uint8 step — see _raster_config)")
    p.add_argument("--no_opacity_radius", action="store_true",
                   help="disable opacity-aware tile rects (exact "
                        "contributor sets either way; the tight rects "
                        "only shrink the entry stream — see "
                        "RasterizeConfig.opacity_radius)")
    p.add_argument("--max_active_tiles", type=int, default=0,
                   help="grid budget on non-empty tiles (0 = all)")
    p.add_argument("--shard", type=str, default="none",
                   choices=["none", "views", "tiles"],
                   help="multi-chip rendering over every local device: "
                        "'views' shards the view axis (throughput), "
                        "'tiles' shards each frame's tile grid (latency); "
                        "parallel/render.py")
    p.add_argument("--num_frames", type=int, default=12)
    p.add_argument("--use_t_indices", action="store_true")
    p.add_argument("--t_idx_pth", type=str, default="t_idx.npy")
    return p


def main(argv=None):
    from ..utils.cache import enable_persistent_cache

    enable_persistent_cache()
    args = build_parser().parse_args(argv)
    bc = args.background_color.split(",")
    if len(bc) == 1:
        args.background_color = np.array([float(bc[0])] * 3)
    else:
        args.background_color = np.array(bc, dtype=np.float32) / 255.0
    if args.task == "pcrender":
        get_pcrender_renders(args)
    elif args.task == "simple":
        get_simple_renders(args)
    elif args.task == "cam":
        get_camera_info(args)


if __name__ == "__main__":
    main(sys.argv[1:])
