"""End-to-end renderer tests: SimpleRender / PCMLRender on synthetic clouds."""

import jax
import jax.numpy as jnp
import numpy as np

from gpcr_tpu.render import renderer as RD
from gpcr_tpu.structures.pointcloud import PointCloud
from gpcr_tpu.structures.trajectory import CameraTrajectory


def synthetic_cloud(n=600, seed=0, voxel=True, grid=128):
    """Random points on a sphere surface, colored by position."""
    rng = np.random.RandomState(seed)
    v = rng.randn(n, 3)
    v /= np.linalg.norm(v, axis=1, keepdims=True)
    xyz = v * 0.8  # world coords in [-1, 1]
    rgb = (v * 0.5 + 0.5).astype(np.float32)
    if voxel:
        xyz_q = np.round(xyz * (grid // 2) + 512).astype(np.float32)
        return PointCloud.from_numpy(xyz_q, rgb), grid // 2
    return PointCloud.from_numpy(xyz.astype(np.float32), rgb), None


def circle_cam(n_imgs=2, wh=64, fov=60.0):
    traj = CameraTrajectory(
        mode="circle", n_imgs=n_imgs, total=1,
        params={"d": 0, "r": 3, "center_angles": [90, 0]},
    )
    return traj.get_camera(fov=fov, width_px=wh, height_px=wh)


def test_simple_render_end_to_end():
    pcd, sf = synthetic_cloud(voxel=True)
    cam = circle_cam(n_imgs=2, wh=64)
    rdr = RD.SimpleRender(voxelized=True, scale_factor=sf)
    timing = {}
    out = rdr.render(
        pcd, scale=None, cam=cam, fov=60.0, super_sample_rate=2,
        background_color=0.0, sigma=1.0, timing=timing,
    )
    rgb = np.asarray(out["rgb"])
    assert rgb.shape == (1, 2, 64, 64, 3)
    assert np.all(np.isfinite(rgb))
    # with bg=0 the hitmap is raw coverage
    hit = np.asarray(out["hitmap"])[0, 0, :, :, 0]
    assert hit.max() > 0.5  # the sphere is visible
    corners = rgb[0, 0, 0, 0], rgb[0, 0, -1, -1]
    for c in corners:
        np.testing.assert_allclose(c, 0.0, atol=1e-5)
    # xyz render: on-sphere pixels should read back approximately the
    # world position (|xyz| ~ 0.8 where fully hit)
    xyz = np.asarray(out["xyz_w"])[0, 0]
    strong = hit > 0.99
    if strong.any():
        norms = np.linalg.norm(xyz[strong], axis=-1)
        assert np.abs(np.median(norms) - 0.8) < 0.1


def test_pcml_render_end_to_end_random_weights():
    pcd, sf = synthetic_cloud(n=400, voxel=True)
    cam = circle_cam(n_imgs=1, wh=48)
    info = {
        "clr_encoder_channels": "9 8 8 8 8 8",
        "sh_deg": 1, "sh_feat_deg": 0,
        "use_rotation": True, "use_scale": True, "use_offset": True,
        "use_dc_offset": False, "use_opacity": False, "est_normal": True,
        "normalize_normal": True, "enable_opacity": True,
        "scale_factor": sf, "model_type": "unet",
    }
    rdr = RD.PCMLRender(info=info, voxelized=True, scale_factor=sf)
    out = rdr.render(pcd, scale=None, cam=cam, fov=60.0, background_color=0.0)
    for k in ("rgb", "xyz_w", "hitmap", "normal"):
        assert out[k] is not None, k
        assert out[k].shape == (1, 1, 48, 48, 3)
        assert np.all(np.isfinite(np.asarray(out[k])))


def test_point_light_shading_shape():
    pcd, sf = synthetic_cloud(n=300, voxel=True)
    cam = circle_cam(n_imgs=1, wh=32)
    info = {
        "clr_encoder_channels": "9 8 8 8 8 8",
        "sh_deg": 1, "sh_feat_deg": 0,
        "use_rotation": True, "use_scale": True, "use_offset": True,
        "use_dc_offset": False, "use_opacity": False, "est_normal": True,
        "normalize_normal": True, "enable_opacity": True,
        "scale_factor": sf, "model_type": "unet",
    }
    light = {
        "xyz_w": [jnp.asarray([5.0, -5.0, -5.0])],
        "color": [jnp.asarray([1.0, 1.0, 1.0])],
        "light_coeff": [0.7, 0.3],
    }
    rdr = RD.PCMLRender(info=info, voxelized=True, scale_factor=sf)
    out = rdr.render(
        pcd, scale=None, cam=cam, fov=60.0, point_light=light,
    )
    assert out["shaded"].shape == (1, 1, 32, 32, 3)


def test_bilinear_resize_matches_torch():
    import torch
    import torch.nn.functional as F

    rng = np.random.RandomState(0)
    img = rng.rand(2, 3, 32, 32).astype(np.float32)
    ref = F.interpolate(
        torch.from_numpy(img), size=(16, 16), mode="bilinear",
        align_corners=False,
    ).numpy()
    got = np.asarray(RD.bilinear_resize(jnp.asarray(img), 16, 16))
    np.testing.assert_allclose(got, ref, atol=1e-6)
    # non-integer ratio
    ref2 = F.interpolate(
        torch.from_numpy(img), size=(20, 24), mode="bilinear",
        align_corners=False,
    ).numpy()
    got2 = np.asarray(RD.bilinear_resize(jnp.asarray(img), 20, 24))
    np.testing.assert_allclose(got2, ref2, atol=1e-5)


def test_checkpoint_roundtrip(tmp_path):
    from gpcr_tpu.models.encoder import PCEncoder, PCMLInfo
    from gpcr_tpu.render import checkpoint as CK

    info = PCMLInfo(clr_encoder_channels="9 8 8 8 8 8")
    enc = PCEncoder(info)
    params = enc.init(jax.random.PRNGKey(0))
    p = str(tmp_path / "ck.npz")
    CK.save_params(p, params)
    loaded = CK.load_params(p)
    flat_a = CK._flatten(params)
    flat_b = CK._flatten(loaded)
    assert set(flat_a) == set(flat_b)
    for k in flat_a:
        np.testing.assert_array_equal(flat_a[k], flat_b[k])


def test_torch_state_dict_conversion():
    import torch

    from gpcr_tpu.render import checkpoint as CK

    state = {
        "color_encoder.conv0.kernel": torch.randn(27, 9, 8),
        "color_encoder.conv0.bias": torch.randn(8),
        "color_encoder.block0.0.conv1_0.kernel": torch.randn(8, 2),  # 1³ conv
        "default_quaternion": torch.tensor([[1.0, 0, 0, 0]]),
    }
    params = CK.convert_torch_state_dict(state)
    assert params["color_encoder"]["conv0"]["kernel"].shape == (27, 9, 8)
    assert params["color_encoder"]["block0"]["0"]["conv1_0"]["kernel"].shape == (
        1, 8, 2,
    )
    assert "default_quaternion" not in params


def test_pcml_checkpoint_roundtrip_render(tmp_path):
    """Full load_pcml path: options.yaml + saved checkpoint -> PCMLRender."""
    import os
    import yaml

    from gpcr_tpu.models.encoder import PCEncoder, PCMLInfo
    from gpcr_tpu.render import checkpoint as CK

    info_dict = {
        "clr_encoder_channels": "9 8 8 8 8 8",
        "sh_deg": 1, "sh_feat_deg": 0,
        "use_rotation": True, "use_scale": True, "use_offset": True,
        "use_dc_offset": False, "use_opacity": False, "est_normal": True,
        "normalize_normal": True, "enable_opacity": True,
        "scale_factor": 64, "model_type": "unet",
    }
    root = tmp_path / "run" / "train"
    (root / "option").mkdir(parents=True)
    (root / "checkpoint").mkdir(parents=True)
    with open(root / "option" / "options.yaml", "w") as f:
        yaml.safe_dump({"pcml_info": info_dict}, f)

    enc = PCEncoder(PCMLInfo.from_dict(info_dict))
    import jax

    params = enc.init(jax.random.PRNGKey(3))
    ckpt = str(root / "checkpoint" / "model_epoch1.npz")
    CK.save_params(ckpt, params)

    rdr = RD.PCMLRender(ckpt=ckpt, voxelized=True, scale_factor=64)
    assert rdr.info.scale_factor == 64
    pcd, sf = synthetic_cloud(n=300, voxel=True, grid=128)
    cam = circle_cam(n_imgs=1, wh=32)
    out = rdr.render(pcd, scale=None, cam=cam, fov=60.0)
    assert out["rgb"].shape == (1, 1, 32, 32, 3)
    assert np.all(np.isfinite(np.asarray(out["rgb"])))


def test_simple_render_batched():
    pcd1, sf = synthetic_cloud(n=200, seed=1)
    pcd2, _ = synthetic_cloud(n=200, seed=2)
    both = PointCloud.cat([pcd1, pcd2], dim=0)
    cam1 = circle_cam(n_imgs=1, wh=24)
    from gpcr_tpu.structures.camera import Camera

    cam = Camera.cat([cam1, cam1], dim=0)
    rdr = RD.SimpleRender(voxelized=True, scale_factor=sf)
    out = rdr.render(both, scale=None, cam=cam, fov=60.0, background_color=0.0)
    assert out["rgb"].shape == (2, 1, 24, 24, 3)
    # each item matches its solo render
    solo = rdr.render(pcd1, scale=None, cam=cam1, fov=60.0,
                      background_color=0.0)
    np.testing.assert_allclose(
        np.asarray(out["rgb"][0]), np.asarray(solo["rgb"][0]), atol=1e-6
    )


def test_kb_sweep_picks_fastest_candidate(capsys):
    """_sweep_k_budget tries kb0 + i*bucket for i in [0, sweep], times the
    real run callable, and returns the fastest candidate (the allocator-
    lottery sweep; PERFORMANCE.md round-5 root-cause)."""
    import time as _time

    from gpcr_tpu.ops.rasterize import RasterizeConfig
    from gpcr_tpu.render.renderer import _sweep_k_budget

    seen = []
    # second candidate (kb0 + 100) is the fast one
    cost = {1000: 0.01, 1100: 0.0, 1200: 0.02}

    def run_with(cfg):
        seen.append(cfg.k_budget)
        _time.sleep(cost[cfg.k_budget])
        return np.zeros(())

    cfg = RasterizeConfig(k_budget=1000)
    best = _sweep_k_budget(cfg, 1000, run_with, sweep=2, bucket=100)
    assert best == 1100
    # each candidate ran twice: once to compile+warm, once timed
    assert seen == [1000, 1000, 1100, 1100, 1200, 1200]
    assert "kb_sweep" in capsys.readouterr().out
