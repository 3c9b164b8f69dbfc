"""Mesh / ray tracer / RGBD unprojection tests."""

import numpy as np
import jax.numpy as jnp

from gpcr_tpu.structures.camera import Camera, derive_camera_intrinsics
from gpcr_tpu.structures.mesh import Mesh, sample_texture
from gpcr_tpu.structures.ray import Ray
from gpcr_tpu.utils import rigid_motion


def quad_mesh(z=0.0, size=1.0, texture=None):
    """Two-triangle quad in the z=const plane facing -z."""
    s = size
    verts = np.array(
        [[-s, -s, z], [s, -s, z], [s, s, z], [-s, s, z]], np.float32
    )
    tris = np.array([[0, 1, 2], [0, 2, 3]], np.int32)
    uvs = np.array(
        [
            [[0, 0], [1, 0], [1, 1]],
            [[0, 0], [1, 1], [0, 1]],
        ],
        np.float32,
    )
    return {
        "vertices": verts,
        "triangles": tris,
        "triangle_uvs": uvs,
        "textures": [texture] if texture is not None else [],
        "material_ids": np.zeros(2, np.int32),
    }


def test_ray_intersection_hits_and_depth():
    mesh = Mesh(quad_mesh(z=0.0), scale=None, center_w=None)
    # rays from z=-2 toward +z
    n = 5
    origins = np.zeros((1, n, 3), np.float32)
    origins[..., 2] = -2.0
    origins[0, :, 0] = np.linspace(-0.5, 0.5, n)
    dirs = np.zeros((1, n, 3), np.float32)
    dirs[..., 2] = 1.0
    res = mesh.get_ray_intersection(Ray(jnp.asarray(origins), jnp.asarray(dirs)))
    np.testing.assert_allclose(res["ray_ts"][0], 2.0, atol=1e-5)
    np.testing.assert_array_equal(res["hit_map"][0], 1.0)
    # normals flipped toward ray origin => -z
    np.testing.assert_allclose(
        res["surface_normals_w"][0], np.tile([0, 0, -1.0], (n, 1)), atol=1e-5
    )
    # miss
    origins[0, 0, 0] = 5.0
    res = mesh.get_ray_intersection(Ray(jnp.asarray(origins), jnp.asarray(dirs)))
    assert res["hit_map"][0, 0] == 0.0
    assert np.isinf(res["ray_ts"][0, 0])


def test_texture_interpolation_quadrants():
    # texture: 2x2 distinct colors; sample centers of each quadrant
    tex = np.array(
        [[[1, 0, 0], [0, 1, 0]], [[0, 0, 1], [1, 1, 0]]], np.float32
    )
    mesh = Mesh(quad_mesh(z=0.0, texture=tex), scale=None, center_w=None,
                clean=False)
    # uv (0.25, 0.25) is exactly texel (0,0) center
    origins = np.array([[[-0.5, -0.5, -2.0]]], np.float32)  # uv ~ (0.25, 0.25)
    dirs = np.array([[[0.0, 0.0, 1.0]]], np.float32)
    res = mesh.get_ray_intersection(Ray(jnp.asarray(origins), jnp.asarray(dirs)))
    np.testing.assert_allclose(res["ray_rgbs"][0, 0], [1, 0, 0], atol=1e-5)


def test_sample_texture_bilinear_wrap():
    tex = np.zeros((2, 2, 1), np.float32)
    tex[0, 0] = 1.0
    # exact texel center
    assert np.isclose(sample_texture(tex, np.array([0.25, 0.25]))[0], 1.0)
    # halfway between texels horizontally
    assert np.isclose(sample_texture(tex, np.array([0.5, 0.25]))[0], 0.5)
    # wrap: u=0 is halfway between texel -1 (wrapped) and 0
    assert np.isclose(sample_texture(tex, np.array([0.0, 0.25]))[0], 0.5)


def test_native_matches_numpy_cast():
    from gpcr_tpu import native_bindings as nb

    rng = np.random.RandomState(0)
    verts = rng.randn(30, 3).astype(np.float32)
    tris = rng.randint(0, 30, (40, 3)).astype(np.int32)
    origins = rng.randn(100, 3).astype(np.float32) * 2
    dirs = rng.randn(100, 3).astype(np.float32)
    dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
    t_np, p_np, u_np, v_np = nb.numpy_cast(verts, tris, origins, dirs)
    if nb.get_raytracer() is None:
        import pytest

        pytest.skip("no C++ toolchain")
    rc = nb.NativeRaycaster(verts, tris)
    t_c, p_c, u_c, v_c = rc.cast(origins, dirs)
    np.testing.assert_allclose(t_c, t_np, rtol=2e-4, atol=1e-5)
    hit = np.isfinite(t_np)
    # same triangle (or an equally-near duplicate); check hit parity + bary
    np.testing.assert_array_equal(np.isfinite(t_c), hit)
    np.testing.assert_allclose(u_c[hit], u_np[hit], rtol=1e-3, atol=1e-4)


def test_mesh_sampling_methods():
    tex = np.ones((4, 4, 3), np.float32) * 0.5
    mesh = Mesh(quad_mesh(texture=tex), scale=1.0)
    for method in ("uniform", "uniform_quantized", "poisson_disk"):
        pcd = mesh.sample_point_cloud(512, method=method)
        n = int(pcd.get_num_valid_points(0))
        assert n > 100, (method, n)
        assert np.all(np.isfinite(np.asarray(pcd.xyz_w)))
        if method == "uniform_quantized":
            xyz = np.asarray(pcd.xyz_w[0])
            assert np.allclose(xyz, np.round(xyz))  # integer voxels


def test_rgbd_roundtrip_unprojection():
    """Render a quad with ray_cast, unproject, verify points lie on z=0."""
    mesh = Mesh(quad_mesh(z=0.0), scale=None, center_w=None)
    H = rigid_motion.get_H_c2w_lookat(
        jnp.asarray([0.0, 0.0, -2.0]), jnp.zeros(3), jnp.asarray([0.0, 1.0, 0.0])
    )
    K = derive_camera_intrinsics(32, 32, 60.0)
    cam = Camera(
        H_c2w=H[None, None], intrinsic=K[None, None], width_px=32, height_px=32
    )
    rgbd = mesh.get_rgbd_image(cam)
    assert np.asarray(rgbd.hit_map).mean() > 0.5
    pcd = rgbd.get_pcd()
    mask = np.asarray(pcd.get_valid_mask())[0, :, 0]
    xyz = np.asarray(pcd.xyz_w)[0][mask]
    assert len(xyz) > 100
    np.testing.assert_allclose(xyz[:, 2], 0.0, atol=1e-3)
    assert np.abs(xyz[:, :2]).max() <= 1.01


def test_uniform_camera_sampling():
    tex = np.ones((4, 4, 3), np.float32) * 0.7
    mesh = Mesh(quad_mesh(texture=tex), scale=1.0)
    pcd = mesh.sample_point_cloud(500, method="uniform_camera")
    assert int(pcd.get_num_valid_points(0)) > 50


def test_poisson_disk_min_distance():
    """True Poisson-disk sampling (weighted sample elimination): the
    resulting set must be far better separated than a random subset of the
    same candidates — min pairwise distance >= 0.5 * r_max (elimination
    gives a soft guarantee; 0.5 holds with wide margin empirically)."""
    mesh = Mesh(quad_mesh(), scale=1.0)
    n = 256
    pcd = mesh.sample_point_cloud(n, method="poisson_disk", seed=3)
    xyz = np.asarray(pcd.xyz_w[0])[: int(pcd.get_num_valid_points(0))]
    assert len(xyz) == n

    area = 2.0 * 2.0  # quad [-1,1]^2
    r_max = np.sqrt(area / (2 * np.sqrt(3) * n))
    d = np.linalg.norm(xyz[:, None] - xyz[None, :], axis=-1)
    d += np.eye(len(xyz)) * 1e9
    min_d = float(d.min())
    assert min_d >= 0.5 * r_max, (min_d, r_max)

    # blue-noise sanity: random uniform sampling of the same count has a
    # far smaller min distance (expected ~ 1/n vs ~ 1/sqrt(n))
    rnd = mesh.sample_point_cloud(n, method="uniform", seed=3)
    xyz_r = np.asarray(rnd.xyz_w[0])[: int(rnd.get_num_valid_points(0))]
    dr = np.linalg.norm(xyz_r[:, None] - xyz_r[None, :], axis=-1)
    dr += np.eye(len(xyz_r)) * 1e9
    assert min_d > 4.0 * float(dr.min()), (min_d, float(dr.min()))


def test_sample_elimination_fallback_matches_native():
    """The numpy fallback and the C++ implementation agree on the survivor
    set (identical algorithm, identical tie-free weights)."""
    from gpcr_tpu import native_bindings as nb

    rng = np.random.RandomState(0)
    pts = rng.rand(400, 3).astype(np.float32)
    pts[:, 2] = 0.0
    r_max = 0.05
    idx_native = nb.sample_elimination(pts, 100, r_max)
    idx_np = nb._sample_elimination_numpy(pts, 100, r_max, 8.0)
    assert set(map(int, idx_native)) == set(map(int, idx_np))


def test_rasterization_matches_ray_cast():
    """The z-buffer raster GT method (structures.py:3609-3706 analogue)
    must agree with the ray tracer on depth/hit/rgb/normals."""
    rng = np.random.RandomState(0)
    tex = rng.rand(8, 8, 3).astype(np.float32)
    mesh = Mesh(quad_mesh(z=0.0, texture=tex), scale=None, center_w=None)
    H = rigid_motion.get_H_c2w_lookat(
        jnp.asarray([0.3, -0.2, -2.2]), jnp.zeros(3),
        jnp.asarray([0.0, 1.0, 0.0]),
    )
    K = derive_camera_intrinsics(48, 40, 55.0)
    cam = Camera(
        H_c2w=H[None, None], intrinsic=K[None, None], width_px=48,
        height_px=40,
    )
    rc = mesh.get_rgbd_image(cam, render_method="ray_cast")
    rs = mesh.get_rgbd_image(cam, render_method="rasterization")
    hit_rc = np.asarray(rc.hit_map) > 0.5
    hit_rs = np.asarray(rs.hit_map) > 0.5
    # hit masks agree except possibly a 1-px silhouette rim
    disagree = hit_rc ^ hit_rs
    assert disagree.mean() < 0.02, disagree.mean()
    both = hit_rc & hit_rs
    d1, d2 = np.asarray(rc.depth)[both], np.asarray(rs.depth)[both]
    np.testing.assert_allclose(d1, d2, atol=1e-3)
    c1, c2 = np.asarray(rc.rgb)[both], np.asarray(rs.rgb)[both]
    assert np.abs(c1 - c2).max() < 2e-2  # bilinear texture at subpx offsets
    n1, n2 = np.asarray(rc.normal_w)[both], np.asarray(rs.normal_w)[both]
    np.testing.assert_allclose(n1, n2, atol=1e-4)


def test_rasterization_occlusion():
    """Two stacked quads: the raster z-buffer must keep the nearer one."""
    near = quad_mesh(z=-0.5, size=0.4)
    far = quad_mesh(z=0.5, size=1.0)
    merged = {
        "vertices": np.concatenate([near["vertices"], far["vertices"]]),
        "triangles": np.concatenate(
            [near["triangles"], far["triangles"] + 4]
        ),
        "triangle_uvs": np.concatenate(
            [near["triangle_uvs"], far["triangle_uvs"]]
        ),
        "textures": [],
        "material_ids": np.zeros(4, np.int32),
    }
    mesh = Mesh(merged, scale=None, center_w=None)
    H = rigid_motion.get_H_c2w_lookat(
        jnp.asarray([0.0, 0.0, -2.0]), jnp.zeros(3),
        jnp.asarray([0.0, 1.0, 0.0]),
    )
    K = derive_camera_intrinsics(32, 32, 60.0)
    cam = Camera(
        H_c2w=H[None, None], intrinsic=K[None, None], width_px=32,
        height_px=32,
    )
    rs = mesh.get_rgbd_image(cam, render_method="rasterization")
    depth = np.asarray(rs.depth)[0, 0]
    # center pixel sees the near quad (z=-0.5 -> camera depth 1.5)
    np.testing.assert_allclose(depth[16, 16], 1.5, atol=1e-3)
    # and the z-buffer must agree with the ray tracer everywhere: both
    # depth planes (1.5 near, 2.5 far) and the misses
    rc = mesh.get_rgbd_image(cam, render_method="ray_cast")
    drc = np.asarray(rc.depth)[0, 0]
    both = np.isfinite(depth) & np.isfinite(drc)
    assert (np.isfinite(depth) ^ np.isfinite(drc)).mean() < 0.02
    np.testing.assert_allclose(depth[both], drc[both], atol=1e-3)
    assert {1.5, 2.5} <= set(np.round(depth[both], 3).tolist())
