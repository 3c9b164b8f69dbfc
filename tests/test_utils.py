"""Geometry / sampling / media utility tests."""

import numpy as np
import jax
import jax.numpy as jnp

from gpcr_tpu.utils import geometry as G
from gpcr_tpu.utils import sampling as S
from gpcr_tpu.utils import media as M
from gpcr_tpu.utils import rigid_motion as RM


def test_ray_aabb():
    out = G.ray_aabb_intersection(
        jnp.asarray([0.0, 0, -5]), jnp.asarray([0.0, 0, 1.0]),
        jnp.asarray([-1.0, -1, -1]), jnp.asarray([1.0, 1, 1]),
    )
    assert bool(out["is_intersected"])
    assert np.isclose(float(out["t_near"]), 4.0)
    assert np.isclose(float(out["t_far"]), 6.0)
    out = G.ray_aabb_intersection(
        jnp.asarray([5.0, 0, -5]), jnp.asarray([0.0, 0, 1.0]),
        jnp.asarray([-1.0, -1, -1]), jnp.asarray([1.0, 1, 1]),
    )
    assert not bool(out["is_intersected"])


def test_point_ray_distance_and_knn():
    # points along +z axis; one ray down +z from origin
    pts = jnp.asarray([[0.5, 0, 1.0], [0, 0, 2.0], [3, 0, 3.0]])[None]
    o = jnp.zeros((1, 1, 3))
    d = jnp.asarray([[[0.0, 0, 1.0]]])
    out = G.compute_point_ray_distance(pts, o, d)
    np.testing.assert_allclose(np.asarray(out["ts"][0, 0]), [1, 2, 3], atol=1e-6)
    np.testing.assert_allclose(np.asarray(out["dists"][0, 0]), [0.5, 0, 3],
                               atol=1e-6)
    knn = G.get_k_neighbor_points(pts, o, d, k=2)
    np.testing.assert_array_equal(np.asarray(knn["sorted_idxs"][0, 0]), [1, 0])
    # t window excludes the first point (t=1 < t_min)
    knn = G.get_k_neighbor_points(pts, o, d, k=2, t_min=1.5)
    np.testing.assert_array_equal(np.asarray(knn["sorted_idxs"][0, 0]), [1, 2])
    # with t_max too, only one candidate remains; the filler slot is inf
    knn = G.get_k_neighbor_points(pts, o, d, k=2, t_min=1.5, t_max=2.5)
    assert int(knn["sorted_idxs"][0, 0, 0]) == 1
    assert np.isinf(float(knn["sorted_dists"][0, 0, 1]))


def test_knn_chunked_matches():
    rng = np.random.RandomState(0)
    pts = jnp.asarray(rng.randn(1, 50, 3), jnp.float32)
    o = jnp.asarray(rng.randn(1, 10, 3), jnp.float32)
    d = rng.randn(1, 10, 3)
    d = jnp.asarray(d / np.linalg.norm(d, axis=-1, keepdims=True), jnp.float32)
    a = G.get_k_neighbor_points(pts, o, d, k=4, t_min=-1e10)
    b = G.get_k_neighbor_points_in_chunks(pts, o, d, k=4, chunk_rays=3,
                                          t_min=-1e10)
    np.testing.assert_array_equal(np.asarray(a["sorted_idxs"]),
                                  np.asarray(b["sorted_idxs"]))


def test_pinhole_projection_roundtrip():
    from gpcr_tpu.structures.camera import Camera, derive_camera_intrinsics

    H = RM.get_H_c2w_lookat(
        jnp.asarray([0.0, 0, -3.0]), jnp.zeros(3), jnp.asarray([0.0, 1, 0])
    )
    K = derive_camera_intrinsics(64, 64, 60.0)
    cam = Camera(H_c2w=H[None, None], intrinsic=K[None, None],
                 width_px=64, height_px=64)
    o, d = cam.generate_camera_rays()
    # take the ray through pixel (10, 20), walk 2 units, re-project
    p = o[0, 0, 20, 10] + 2.0 * d[0, 0, 20, 10]
    out = G.pinhole_projection(p[None, None], K[None], H[None])
    uv = np.asarray(out["uv"][0, 0])
    np.testing.assert_allclose(uv, [10.5, 20.5], atol=1e-4)
    assert bool(out["in_front"][0, 0])
    fc = G.find_corresponding_uv(p[None, None], K[None], H[None], 64, 64)
    assert bool(fc["valid"][0, 0])


def test_uv_sampling_bilinear():
    fm = jnp.zeros((4, 4, 1)).at[1, 2, 0].set(1.0)
    # pixel center of (row 1, col 2) is uv = (2.5, 1.5)
    out = G.uv_sampling(fm, jnp.asarray([[2.5, 1.5], [3.0, 1.5]]))
    np.testing.assert_allclose(np.asarray(out[:, 0]), [1.0, 0.5], atol=1e-6)


def test_zdir_dps():
    from gpcr_tpu.structures.camera import derive_camera_intrinsics

    K = derive_camera_intrinsics(32, 32, 90.0)
    H = jnp.eye(4)
    z = jnp.ones((8, 8)) * 2.0
    out = G.compute_3d_zdir_and_dps(z, K, H)
    np.testing.assert_allclose(np.asarray(out["zdir_w"][0, 0]), [0, 0, 1],
                               atol=1e-6)
    f = float(K[0, 0])
    np.testing.assert_allclose(np.asarray(out["dps"][0, 0, 0]), 2.0 / f,
                               rtol=1e-5)


def test_spherical_gaussian():
    sg = S.SphericalGaussian(kappa=100.0)
    mu = jnp.asarray([[0.0, 0.0, 1.0]] * 500)
    samples = sg.sample(jax.random.PRNGKey(0), mu)
    s = np.asarray(samples)
    np.testing.assert_allclose(np.linalg.norm(s, axis=-1), 1.0, atol=1e-5)
    # concentrated around mu
    assert np.mean(s[:, 2]) > 0.97
    # nll smaller at the mean than away from it
    nll_mu = float(sg.nll(mu[:1], mu[:1]).mean())
    nll_away = float(sg.nll(mu[:1], jnp.asarray([[1.0, 0, 0]])).mean())
    assert nll_mu < nll_away


def test_qmc_and_shuffle():
    s = S.get_samples(64, 2, method="latin_hypercube", seed=0)
    assert s.shape == (64, 2) and s.min() >= 0 and s.max() < 1
    a = jnp.arange(12).reshape(3, 4)
    b = S.shuffle_along_axis(jax.random.PRNGKey(0), a, axis=1)
    np.testing.assert_array_equal(np.sort(np.asarray(b), axis=1),
                                  np.asarray(a))


def test_media(tmp_path):
    frames = [np.random.RandomState(i).rand(16, 16, 3) for i in range(4)]
    gif = str(tmp_path / "t.gif")
    M.create_gif(frames, gif, fps=5)
    arr = M.gif_to_nparray(gif)
    assert arr.shape[0] == 4
    tiled = M.tile_images(frames, n_cols=2)
    assert tiled.shape[0] > 16 and tiled.shape[1] > 16
    titled = M.add_title_to_image(frames[0], "TEST 01")
    assert titled.shape[0] > 16
    lin = M.srgb_to_linear(np.array([0.5]))
    np.testing.assert_allclose(M.linear_to_srgb(lin), [0.5], atol=1e-6)


def test_pointersect_record():
    from gpcr_tpu.structures.pointersect_record import PointersectRecord
    from gpcr_tpu.structures.camera import Camera, derive_camera_intrinsics

    b, q, h, w = 1, 1, 4, 4
    m = q * h * w
    rng = np.random.RandomState(0)
    rec = PointersectRecord(
        intersection_xyz_w=jnp.asarray(rng.randn(b, m, 3), jnp.float32),
        intersection_rgb=jnp.asarray(rng.rand(b, m, 3), jnp.float32),
        intersection_surface_normal_w=jnp.asarray(
            rng.randn(b, m, 3), jnp.float32
        ),
        ray_t=jnp.ones((b, m)),
        ray_hit=jnp.ones((b, m)),
    )
    parts = rec.chunk(2, dim=1)
    rec2 = PointersectRecord.cat(parts, dim=1)
    np.testing.assert_allclose(
        np.asarray(rec2.intersection_xyz_w), np.asarray(rec.intersection_xyz_w)
    )
    agg = PointersectRecord.aggregate([rec, rec])
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(agg.intersection_surface_normal_w), axis=-1),
        1.0, atol=1e-5,
    )
    H = RM.get_H_c2w_lookat(jnp.asarray([0.0, 0, -3]), jnp.zeros(3),
                            jnp.asarray([0.0, 1, 0]))
    K = derive_camera_intrinsics(w, h, 60.0)
    cam = Camera(H_c2w=H[None, None], intrinsic=K[None, None],
                 width_px=w, height_px=h)
    rgbd = rec.get_rgbd_image(cam)
    assert rgbd.rgb.shape == (b, q, h, w, 3)
    conf = rec.compute_confidence()
    assert conf.shape == (b, m)


def test_preprocess_obj(tmp_path):
    from gpcr_tpu.utils.preprocess_obj import preprocess_obj

    src = tmp_path / "src"
    src.mkdir()
    (src / "m.mtl").write_text("newmtl red\nKd 1 0 0\n")
    (src / "a.obj").write_text(
        "mtllib m.mtl\nv 0 0 0\nv 1 0 0\nv 0 1 0\nusemtl red\n"
        "f 1 2 3\nf 1 2 3\nf 2 3 1\n"
    )
    dst = str(tmp_path / "dst")
    out = preprocess_obj(str(src / "a.obj"), dst)
    lines = open(out).read().splitlines()
    assert sum(1 for l in lines if l.startswith("f ")) == 1  # dups removed
    mtl = open(tmp_path / "dst" / "m.mtl").read()
    assert "map_Kd" in mtl  # Kd synthesized to texture
    import os

    assert os.path.exists(tmp_path / "dst" / "kd_red.png")


def test_grid_ray_query_matches_brute_force():
    import pytest

    from gpcr_tpu import native_bindings as nb

    if nb.get_raytracer() is None:
        pytest.skip("no C++ toolchain")
    rng = np.random.RandomState(0)
    pts = rng.randn(3000, 3).astype(np.float32)
    o = rng.randn(40, 3).astype(np.float32) * 2
    d = rng.randn(40, 3).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)

    radius = 0.4
    k = 5
    q = nb.GridRayQuery(pts, cell_size=radius)
    idx, dist, ts = q.query(o, d, k=k, t_min=0.0, t_max=100.0, radius=radius)

    brute = G.get_k_neighbor_points(
        jnp.asarray(pts)[None], jnp.asarray(o)[None], jnp.asarray(d)[None],
        k=k, t_min=0.0, t_max=100.0,
    )
    bd = np.asarray(brute["sorted_dists"][0])
    bidx = np.asarray(brute["sorted_idxs"][0])
    # brute force has no radius cutoff: compare where brute dist <= radius
    for r in range(40):
        for j in range(k):
            if bd[r, j] <= radius - 1e-5:
                assert idx[r, j] == bidx[r, j], (r, j)
                assert np.isclose(dist[r, j], bd[r, j], atol=1e-5)
            else:
                assert idx[r, j] == -1 or dist[r, j] > radius - 1e-4


def test_camera_frames_meshes(tmp_path):
    """get_camera_frames poses one RGB-axis frame mesh per camera
    (structures.py:2083-2099 analogue) and save_camera_frames writes an
    OBJ our own loader can read back."""
    import numpy as np

    from gpcr_tpu.structures.camera import (
        Camera, coordinate_frame_mesh, derive_camera_intrinsics,
    )
    from gpcr_tpu.structures.mesh import load_obj

    rng = np.random.RandomState(3)
    H = np.tile(np.eye(4, dtype=np.float32), (1, 3, 1, 1))
    H[0, :, :3, 3] = rng.randn(3, 3)
    # a non-trivial rotation on camera 1 (Rodrigues via scipy-free path)
    th = 0.7
    R = np.array([[np.cos(th), -np.sin(th), 0],
                  [np.sin(th), np.cos(th), 0], [0, 0, 1]], np.float32)
    H[0, 1, :3, :3] = R
    K = derive_camera_intrinsics(64, 64, 60.0)
    cam = Camera(H_c2w=H, intrinsic=np.tile(np.asarray(K), (1, 3, 1, 1)),
                 width_px=64, height_px=64)

    frames = cam.get_camera_frames(camera_frame_size=0.2)
    assert len(frames) == 1 and len(frames[0]) == 3
    for iq, m in enumerate(frames[0]):
        assert m["vertices"].shape == (32, 3)
        assert m["triangles"].shape == (48, 3)
        assert m["colors"].shape == (32, 3)
        # the gray origin block (first 8 verts) is centered on the
        # camera origin
        np.testing.assert_allclose(
            m["vertices"][:8].mean(axis=0), H[0, iq, :3, 3], atol=1e-5)
        # +X shaft tip sits frame_size along the camera x-axis
        tip = m["vertices"][8:16].mean(axis=0)
        expect = H[0, iq, :3, 3] + H[0, iq, :3, 0] * 0.1
        np.testing.assert_allclose(tip, expect, atol=1e-5)

    out = tmp_path / "frames.obj"
    cam.save_camera_frames(str(out), camera_frame_size=0.2,
                           world_frame_size=1.0)
    d = load_obj(str(out))
    assert d["vertices"].shape == (32 * 4, 3)
    assert d["triangles"].shape == (48 * 4, 3)

    # identity-pose frame: origin block centered at the world origin
    m0 = coordinate_frame_mesh(np.eye(4), frame_size=1.0)
    np.testing.assert_allclose(m0["vertices"][:8].mean(axis=0), 0.0,
                               atol=1e-7)
