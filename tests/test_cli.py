"""End-to-end CLI pipeline on a synthetic textured dataset."""

import os

import numpy as np
import jax.numpy as jnp

from gpcr_tpu.io.image import save_pic, write_png


def make_dataset(root, asset_id="0001"):
    """Textured cube OBJ dataset in the reference layout
    <root>/<id>/<id>.obj."""
    d = os.path.join(root, asset_id)
    os.makedirs(d, exist_ok=True)
    tex = np.zeros((8, 8, 3), np.uint8)
    tex[:4, :, 0] = 255
    tex[4:, :, 1] = 255
    write_png(os.path.join(d, "tex.png"), tex)
    with open(os.path.join(d, "mat.mtl"), "w") as f:
        f.write("newmtl m0\nKd 1 1 1\nmap_Kd tex.png\n")
    # cube corners
    v = [
        (-1, -1, -1), (1, -1, -1), (1, 1, -1), (-1, 1, -1),
        (-1, -1, 1), (1, -1, 1), (1, 1, 1), (-1, 1, 1),
    ]
    quads = [
        (1, 2, 3, 4), (5, 8, 7, 6), (1, 5, 6, 2),
        (2, 6, 7, 3), (3, 7, 8, 4), (5, 1, 4, 8),
    ]
    with open(os.path.join(d, f"{asset_id}.obj"), "w") as f:
        f.write("mtllib mat.mtl\n")
        for x, y, z in v:
            f.write(f"v {x} {y} {z}\n")
        f.write("vt 0.1 0.1\nvt 0.9 0.1\nvt 0.9 0.9\nvt 0.1 0.9\n")
        f.write("usemtl m0\n")
        for a, b, c, e in quads:
            f.write(f"f {a}/1 {b}/2 {c}/3 {e}/4\n")
    return d


def small_camera(wh=32, n=2):
    from gpcr_tpu.render.renderer import generate_cam

    return generate_cam(
        {"fov": 60.0, "width_px": wh, "height_px": wh, "mode": "circle",
         "n_imgs": n, "d": 0, "r": 3, "center_angles": [90, 0]}
    )


def test_sample_pcd_cli(tmp_path):
    from gpcr_tpu.cli import sample_pcd

    root = str(tmp_path)
    make_dataset(root)
    sample_pcd.main([
        "--dataset_root", root, "--num_points", "2000",
        "--method", "uniform_quantized", "--workers", "1",
    ])
    out = os.path.join(root, "0001", "pcd_0.ply")
    assert os.path.exists(out)
    from gpcr_tpu.structures.pointcloud import PointCloud

    pcd = PointCloud.from_ply(out)
    assert pcd.get_num_points() > 300
    assert pcd.rgb is not None


def test_gt_plus_simple_render_plus_metrics(tmp_path):
    from gpcr_tpu.cli.benchmark import get_gt
    from gpcr_tpu.cli import pic_metrics
    from gpcr_tpu.render.renderer import SimpleRender
    from gpcr_tpu.structures.pointcloud import PointCloud

    root = str(tmp_path)
    d = make_dataset(root)
    cam = small_camera(wh=32, n=2)
    gt = get_gt(os.path.join(d, "0001.obj"), cam)
    bg = 1.0
    gt_rgb = np.asarray(gt["ray_rgbs"]) + (
        1 - np.asarray(gt["hit_map"])[..., None]
    ) * bg
    gt_dir = os.path.join(root, "gt")
    save_pic(gt_rgb, gt_dir, "rgb")

    # sample + render the same asset
    from gpcr_tpu.structures.mesh import Mesh

    mesh = Mesh(os.path.join(d, "0001.obj"), scale=1.0)
    pcd = mesh.sample_point_cloud(4000, method="uniform_quantized",
                                  quantize_scale=96.0)
    rdr = SimpleRender(voxelized=True, scale_factor=96)
    out = rdr.render(pcd, scale=None, cam=cam, fov=60.0,
                     background_color=bg, sigma=1.0)
    rd = os.path.join(root, "render")
    save_pic(np.asarray(out["rgb"]), rd, "rgb")

    psnr = pic_metrics.psnr_dirs(rd, gt_dir,
                                 diff_dir=os.path.join(root, "diff"))
    mss = pic_metrics.msssim_dirs(rd, gt_dir)
    assert np.isfinite(psnr) and psnr > 8.0, psnr
    assert 0.0 <= mss <= 1.0
    assert os.path.exists(os.path.join(root, "diff", "rgb_0.png"))
    # lpips degrades gracefully without weights
    assert pic_metrics.lpips_dirs(rd, gt_dir) is None or True


def test_cam_task(tmp_path):
    from gpcr_tpu.cli import benchmark as B
    from gpcr_tpu.structures.camera import Camera

    out = str(tmp_path / "cam.npz")
    B.main(["cam", "--cam_mode", "circle", "--cam_save_path", out,
            "--num_frames", "4"])
    cam = Camera.load(out)
    assert cam.H_c2w.shape == (1, 12, 4, 4)


def test_rescale_ply_roundtrip(tmp_path):
    from gpcr_tpu.cli import rescale_ply
    from gpcr_tpu.io.ply import read_ply, write_ply

    rng = np.random.RandomState(0)
    xyz = rng.randint(0, 1024, (100, 3)).astype(np.float32)
    rgb = rng.rand(100, 3).astype(np.float32)
    p1 = str(tmp_path / "a.ply")
    p2 = str(tmp_path / "b.ply")
    p3 = str(tmp_path / "c.ply")
    write_ply(p1, xyz, rgb=rgb)
    rescale_ply.main([p1, p2, "--factor", "256"])
    rescale_ply.main([p2, p3, "--factor", "256", "--inverse"])
    d3 = read_ply(p3)
    np.testing.assert_allclose(d3["xyz"], xyz, atol=1e-3)


def test_native_ply_parser_matches_python(tmp_path):
    """The C++ fast parser and the python fallback agree."""
    import pytest

    from gpcr_tpu.io import ply as plyio
    from gpcr_tpu import native_bindings as nb

    if nb.get_raytracer() is None:  # no toolchain -> skip
        pytest.skip("no C++ toolchain")
    rng = np.random.RandomState(0)
    xyz = rng.randn(5000, 3).astype(np.float32)
    rgb = rng.rand(5000, 3).astype(np.float32)
    nrm = rng.randn(5000, 3).astype(np.float32)
    p = str(tmp_path / "t.ply")
    plyio.write_ply(p, xyz, rgb=rgb, normal=nrm)

    from gpcr_tpu.native_bindings import ply as nply

    fast = nply.read_ply(p)
    assert fast is not None
    np.testing.assert_allclose(fast["xyz"], xyz, rtol=1e-6)
    np.testing.assert_allclose(fast["normal"], nrm, rtol=1e-6)
    # rgb went through uint8 quantization on write
    assert np.abs(fast["rgb"] - rgb).max() < 1.0 / 255.0 + 1e-6
    # the module-level read_ply uses the native path transparently
    via_module = plyio.read_ply(p)
    np.testing.assert_allclose(via_module["xyz"], xyz, rtol=1e-6)
