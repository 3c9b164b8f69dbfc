"""Camera.split, outlier removal, surfel rasterization, voxel meshing."""

import numpy as np
import jax.numpy as jnp

from gpcr_tpu.structures.camera import Camera, derive_camera_intrinsics
from gpcr_tpu.structures.pointcloud import PointCloud
from gpcr_tpu.utils import rigid_motion as RM


def lookat_cam(eye, wh=32, fov=60.0, n=1):
    H = RM.get_H_c2w_lookat(
        jnp.asarray(eye, jnp.float32), jnp.zeros(3), jnp.asarray([0.0, 1.0, 0.0])
    )
    K = derive_camera_intrinsics(wh, wh, fov)
    return Camera(
        H_c2w=jnp.broadcast_to(H, (1, n, 4, 4)),
        intrinsic=jnp.broadcast_to(K, (1, n, 3, 3)),
        width_px=wh, height_px=wh,
    )


def test_camera_split():
    cam = lookat_cam([0, 0, -2.0], wh=32, n=7)
    chunks = cam.split(max_pixels=32 * 32 * 2)
    assert [c.H_c2w.shape[1] for c in chunks] == [2, 2, 2, 1]
    recon = Camera.cat(chunks, dim=1)
    np.testing.assert_allclose(np.asarray(recon.H_c2w), np.asarray(cam.H_c2w))


def test_remove_outlier():
    rng = np.random.RandomState(0)
    cluster = rng.randn(50, 3).astype(np.float32) * 0.05
    lonely = np.array([[5.0, 5.0, 5.0], [-6.0, 0.0, 2.0]], np.float32)
    pcd = PointCloud.from_numpy(np.concatenate([cluster, lonely]))
    out = pcd.remove_outlier(radius=0.5, min_neighbors=3)
    mask = np.asarray(out.get_valid_mask()[0, :, 0])
    assert mask[:50].sum() >= 45  # cluster survives
    assert not mask[50:].any()  # lonely points dropped


def test_rasterize_surfel():
    rng = np.random.RandomState(1)
    v = rng.randn(500, 3)
    v /= np.linalg.norm(v, axis=1, keepdims=True)
    pcd = PointCloud.from_numpy(
        (v * 0.5).astype(np.float32), (v * 0.5 + 0.5).astype(np.float32),
        v.astype(np.float32),
    )
    cam = lookat_cam([0, 0, -2.0], wh=48)
    rgbd = pcd.rasterize_surfel(cam, bg_color=1.0)
    assert rgbd.rgb.shape == (1, 1, 48, 48, 3)
    hit = np.asarray(rgbd.hit_map[0, 0])
    assert 0.01 < hit.mean() < 0.9
    # nearer-hemisphere points should win the z-buffer: all visible depths
    # within the sphere's front range
    d = np.asarray(rgbd.depth[0, 0])
    vis = np.isfinite(d)
    assert vis.any()
    assert d[vis].min() > 1.0 and d[vis].max() < 3.0
    # shading variants run
    for mode in ("directional", "half"):
        out = pcd.rasterize_surfel(cam, shading=mode)
        assert np.all(np.isfinite(np.asarray(out.rgb)))


def test_get_mesh_voxel():
    rng = np.random.RandomState(2)
    v = rng.randn(2000, 3)
    v /= np.linalg.norm(v, axis=1, keepdims=True)
    pcd = PointCloud.from_numpy((v * 0.5).astype(np.float32))
    mesh = pcd.get_mesh(method="voxel", cell_width=0.15)
    assert len(mesh.vertices) > 10
    assert len(mesh.triangles) > 10
    # mesh should be renderable by the ray caster
    from gpcr_tpu.structures.ray import Ray

    k = 9
    o = np.zeros((k, 3), np.float32)
    o[:, 0] = np.linspace(-0.2, 0.2, k) + 0.013  # avoid exact cell planes
    o[:, 1] = 0.017
    o[:, 2] = -2.0
    d = np.tile(np.array([[0.0, 0.0, 1.0]], np.float32), (k, 1))
    res = mesh.get_ray_intersection(Ray(jnp.asarray(o[None]), jnp.asarray(d[None])))
    assert np.asarray(res["hit_map"][0]).sum() >= k - 1


def _sphere_cloud(n=2000, r=1.0, seed=0):
    rng = np.random.RandomState(seed)
    v = rng.randn(n, 3)
    v /= np.linalg.norm(v, axis=1, keepdims=True)
    return (v * r).astype(np.float32), v.astype(np.float32)


def test_estimate_normals_sphere():
    xyz, true_n = _sphere_cloud()
    pcd = PointCloud.from_numpy(xyz)
    pcd2 = pcd.estimate_normals(k=16)
    got = np.asarray(pcd2.normal_w[0])
    cos = np.abs((got * true_n).sum(-1))
    assert cos.mean() > 0.99, cos.mean()
    # outward orientation: positive dot with the radial direction
    assert ((got * true_n).sum(-1) > 0).mean() > 0.99


def test_get_mesh_poisson_sphere():
    """Poisson reconstruction of a sphere cloud: vertices lie near r=1."""
    xyz, true_n = _sphere_cloud(4000)
    pcd = PointCloud.from_numpy(xyz, normal=true_n)
    mesh = pcd.get_mesh(method="poisson", depth=5)
    assert len(mesh.vertices) > 200 and len(mesh.triangles) > 200
    rad = np.linalg.norm(mesh.vertices, axis=-1)
    assert abs(float(np.median(rad)) - 1.0) < 0.15, np.median(rad)
    assert float(np.std(rad)) < 0.1
    # reconstructed surface is closed enough to ray-cast
    t, prim, _, _ = mesh._cast(
        np.array([[0, 0, -3.0]], np.float32), np.array([[0, 0, 1.0]], np.float32)
    )
    assert np.isfinite(t[0]) and 1.7 < t[0] < 2.3


def test_get_mesh_alpha_shape_ball():
    """Solid-ball cloud (a pure sphere is degenerate: every Delaunay tet of
    co-spherical points has circumradius exactly 1, so the filter is
    all-or-nothing). The alpha shape must be a closed shell near r=1."""
    rng = np.random.RandomState(0)
    v = rng.randn(3000, 3)
    v /= np.linalg.norm(v, axis=1, keepdims=True)
    r = rng.rand(3000) ** (1 / 3)
    xyz = (v * r[:, None]).astype(np.float32)
    pcd = PointCloud.from_numpy(xyz)
    mesh = pcd.get_mesh(method="alpha", alpha=0.3)
    f = np.asarray(mesh.triangles)
    assert len(f) > 100
    rad = np.linalg.norm(mesh.vertices, axis=-1)
    assert float(np.median(rad)) > 0.9  # boundary points hug the surface
    # every edge of the boundary shell is shared by exactly 2 faces
    edges = np.sort(
        np.concatenate([f[:, [0, 1]], f[:, [1, 2]], f[:, [0, 2]]]), axis=1
    )
    _, counts = np.unique(edges, axis=0, return_counts=True)
    assert (counts == 2).all()
