"""Rasterizer vs sequential numpy oracle + autodiff sanity."""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gpcr_tpu.ops import rasterize as R
from gpcr_tpu.utils import rigid_motion

import oracle


def make_camera_matrices(eye, W, H, fov_deg=60.0):
    """Build torch-layout (transposed) view / full-proj matrices the way the
    reference does (simple_raw_render.py:51-112)."""
    H_c2w = rigid_motion.get_H_c2w_lookat(
        jnp.asarray(eye, jnp.float32), jnp.zeros(3), jnp.array([0.0, 1.0, 0.0])
    )
    H_w2c = rigid_motion.inv_homogeneous(H_c2w)
    view_t = H_w2c.T  # torch layout

    znear, zfar = 0.01, 100.0
    fov = math.radians(fov_deg)
    th = math.tan(fov / 2)
    P = np.zeros((4, 4), np.float32)
    P[0, 0] = 1.0 / th
    P[1, 1] = 1.0 / th
    P[3, 2] = 1.0
    P[2, 2] = zfar / (zfar - znear)
    P[2, 3] = -(zfar * znear) / (zfar - znear)
    proj_t = jnp.asarray(P.T)
    full_t = view_t @ proj_t
    tanfov = math.tan(fov)  # reference quirk: tan(fov) not tan(fov/2)
    campos = H_c2w[:3, 3]
    return view_t, full_t, tanfov, campos


def random_scene(n, seed=0, spread=0.6, scale=0.08):
    rng = np.random.RandomState(seed)
    means = rng.uniform(-spread, spread, (n, 3)).astype(np.float32)
    scales = rng.uniform(0.3, 1.0, (n, 3)).astype(np.float32) * scale
    rots = rng.randn(n, 4).astype(np.float32)  # unnormalized on purpose
    rots[:, 0] += 2.0
    ops = rng.uniform(0.3, 1.0, (n,)).astype(np.float32)
    feats = rng.rand(n, 3).astype(np.float32)
    return means, scales, rots, ops, feats


@pytest.mark.parametrize("n,wh", [(40, 48), (120, 64)])
@pytest.mark.smoke
def test_matches_oracle(n, wh):
    W = H = wh
    means, scales, rots, ops, feats = random_scene(n, seed=n)
    view_t, full_t, tanfov, campos = make_camera_matrices([0.0, 0.0, -2.5], W, H)
    bg = np.array([0.2, 0.3, 0.4], np.float32)

    ref, ref_radii, ref_T = oracle.rasterize_oracle(
        means, scales, rots, ops, feats,
        np.asarray(view_t), np.asarray(full_t), W, H, tanfov, tanfov, bg,
    )

    settings = R.GaussianRasterizationSettings(
        image_height=H, image_width=W, tanfovx=tanfov, tanfovy=tanfov,
        bg=jnp.asarray(bg), scale_modifier=1.0,
        viewmatrix=view_t, projmatrix=full_t, sh_degree=0, campos=campos,
    )
    cfg = R.RasterizeConfig(max_dup_per_gaussian=64, chunk_size=64, tile_batch=4)
    color, radii, extra = R.rasterize_gaussians(
        jnp.asarray(means), jnp.asarray(ops), settings,
        scales=jnp.asarray(scales), rotations=jnp.asarray(rots),
        colors_precomp=jnp.asarray(feats), config=cfg, return_extra=True,
    )
    assert int(extra["dup_overflow"]) == 0
    np.testing.assert_array_equal(np.asarray(radii), ref_radii)
    np.testing.assert_allclose(np.asarray(color), ref, rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(np.asarray(extra["final_T"]), ref_T, rtol=2e-4,
                               atol=2e-5)


def test_dense_overdraw_early_termination():
    """Many opaque gaussians stacked at the same spot — exercises the
    T < 1e-4 termination path."""
    W = H = 32
    n = 64
    rng = np.random.RandomState(3)
    means = (rng.randn(n, 3) * 0.01).astype(np.float32)
    means[:, 2] = np.linspace(-0.3, 0.3, n)
    scales = np.full((n, 3), 0.15, np.float32)
    rots = np.tile(np.array([1, 0, 0, 0], np.float32), (n, 1))
    ops = np.full((n,), 0.95, np.float32)
    feats = rng.rand(n, 3).astype(np.float32)
    view_t, full_t, tanfov, campos = make_camera_matrices([0.0, 0.0, -2.0], W, H)
    bg = np.zeros(3, np.float32)

    ref, _, ref_T = oracle.rasterize_oracle(
        means, scales, rots, ops, feats,
        np.asarray(view_t), np.asarray(full_t), W, H, tanfov, tanfov, bg,
    )
    settings = R.GaussianRasterizationSettings(
        image_height=H, image_width=W, tanfovx=tanfov, tanfovy=tanfov,
        bg=jnp.asarray(bg), scale_modifier=1.0,
        viewmatrix=view_t, projmatrix=full_t, sh_degree=0, campos=campos,
    )
    cfg = R.RasterizeConfig(max_dup_per_gaussian=16, chunk_size=32, tile_batch=4)
    color, _, extra = R.rasterize_gaussians(
        jnp.asarray(means), jnp.asarray(ops), settings,
        scales=jnp.asarray(scales), rotations=jnp.asarray(rots),
        colors_precomp=jnp.asarray(feats), config=cfg, return_extra=True,
    )
    np.testing.assert_allclose(np.asarray(color), ref, rtol=3e-4, atol=3e-5)
    np.testing.assert_allclose(np.asarray(extra["final_T"]), ref_T, rtol=3e-4,
                               atol=1e-6)


def test_differentiable_mode_matches_and_grads():
    W = H = 32
    means, scales, rots, ops, feats = random_scene(24, seed=7, spread=0.4)
    view_t, full_t, tanfov, campos = make_camera_matrices([0.3, 0.2, -2.0], W, H)
    bg = np.zeros(3, np.float32)
    settings = R.GaussianRasterizationSettings(
        image_height=H, image_width=W, tanfovx=tanfov, tanfovy=tanfov,
        bg=jnp.asarray(bg), scale_modifier=1.0,
        viewmatrix=view_t, projmatrix=full_t, sh_degree=0, campos=campos,
    )
    cfg_w = R.RasterizeConfig(max_dup_per_gaussian=32, chunk_size=32, tile_batch=4)
    cfg_d = cfg_w._replace(differentiable=True, max_chunks=8)

    def render(cfg, m, s, q, o, f):
        c, _ = R.rasterize_gaussians(
            m, o, settings, scales=s, rotations=q, colors_precomp=f, config=cfg
        )
        return c

    c_w = render(cfg_w, *map(jnp.asarray, (means, scales, rots, ops, feats)))
    c_d = render(cfg_d, *map(jnp.asarray, (means, scales, rots, ops, feats)))
    np.testing.assert_allclose(np.asarray(c_w), np.asarray(c_d), atol=1e-6)

    def loss(m, s, q, o, f):
        return jnp.sum(render(cfg_d, m, s, q, o, f) ** 2)

    grads = jax.grad(loss, argnums=(0, 1, 2, 3, 4))(
        *map(jnp.asarray, (means, scales, rots, ops, feats))
    )
    for gr in grads:
        assert np.all(np.isfinite(np.asarray(gr)))
    # finite-difference check on opacity of one gaussian
    i = 5
    eps = 1e-3
    op_p = ops.copy(); op_p[i] += eps
    op_m = ops.copy(); op_m[i] -= eps
    f_p = loss(*map(jnp.asarray, (means, scales, rots, op_p, feats)))
    f_m = loss(*map(jnp.asarray, (means, scales, rots, op_m, feats)))
    fd = (f_p - f_m) / (2 * eps)
    an = np.asarray(grads[3])[i]
    assert np.isclose(fd, an, rtol=5e-2, atol=1e-3), (fd, an)


def test_sh_color_path():
    """SH-mode rasterization equals precomputed-color mode fed eval_sh_color."""
    from gpcr_tpu.utils import sh as jsh

    W = H = 32
    means, scales, rots, ops, _ = random_scene(30, seed=11, spread=0.4)
    rng = np.random.RandomState(12)
    K = 9  # sh_deg 1 layout of the reference: 1 DC + 8 AC rows
    shs = (rng.randn(30, K, 3) * 0.3).astype(np.float32)
    view_t, full_t, tanfov, campos = make_camera_matrices([0.0, 0.4, -2.0], W, H)
    settings = R.GaussianRasterizationSettings(
        image_height=H, image_width=W, tanfovx=tanfov, tanfovy=tanfov,
        bg=jnp.zeros(3), scale_modifier=1.0,
        viewmatrix=view_t, projmatrix=full_t, sh_degree=1, campos=campos,
    )
    cfg = R.RasterizeConfig(max_dup_per_gaussian=32, chunk_size=32, tile_batch=4)
    c_sh, _ = R.rasterize_gaussians(
        jnp.asarray(means), jnp.asarray(ops), settings,
        scales=jnp.asarray(scales), rotations=jnp.asarray(rots),
        shs=jnp.asarray(shs), config=cfg,
    )
    colors = jsh.eval_sh_color(1, jnp.asarray(shs), jnp.asarray(means), campos)
    c_pc, _ = R.rasterize_gaussians(
        jnp.asarray(means), jnp.asarray(ops), settings,
        scales=jnp.asarray(scales), rotations=jnp.asarray(rots),
        colors_precomp=colors, config=cfg,
    )
    np.testing.assert_allclose(np.asarray(c_sh), np.asarray(c_pc), atol=1e-6)


def test_input_validation():
    settings = R.GaussianRasterizationSettings(
        image_height=16, image_width=16, tanfovx=1.0, tanfovy=1.0,
        bg=jnp.zeros(3), scale_modifier=1.0,
        viewmatrix=jnp.eye(4), projmatrix=jnp.eye(4), sh_degree=0,
        campos=jnp.zeros(3),
    )
    m = jnp.zeros((4, 3))
    with pytest.raises(ValueError):
        R.rasterize_gaussians(m, jnp.ones(4), settings)


def test_budget_compacted_binning_matches():
    """tile_bin with an ample k_budget produces the identical image."""
    W = H = 48
    means, scales, rots, ops, feats = random_scene(80, seed=9)
    view_t, full_t, tanfov, campos = make_camera_matrices([0.0, 0.1, -2.5], W, H)
    settings = R.GaussianRasterizationSettings(
        image_height=H, image_width=W, tanfovx=tanfov, tanfovy=tanfov,
        bg=jnp.asarray([0.1, 0.5, 0.9]), scale_modifier=1.0,
        viewmatrix=view_t, projmatrix=full_t, sh_degree=0, campos=campos,
    )
    cfg_a = R.RasterizeConfig(max_dup_per_gaussian=64, chunk_size=32,
                              tile_batch=3)
    cfg_b = cfg_a._replace(k_budget=4096)
    args = dict(
        scales=jnp.asarray(scales), rotations=jnp.asarray(rots),
        colors_precomp=jnp.asarray(feats),
    )
    c_a, _ = R.rasterize_gaussians(
        jnp.asarray(means), jnp.asarray(ops), settings, config=cfg_a, **args
    )
    c_b, _, extra = R.rasterize_gaussians(
        jnp.asarray(means), jnp.asarray(ops), settings, config=cfg_b,
        return_extra=True, **args
    )
    assert int(extra["dup_overflow"]) == 0
    np.testing.assert_allclose(np.asarray(c_b), np.asarray(c_a), atol=1e-6)
    # a too-small budget flags overflow
    cfg_c = cfg_a._replace(k_budget=32)
    _, _, extra_c = R.rasterize_gaussians(
        jnp.asarray(means), jnp.asarray(ops), settings, config=cfg_c,
        return_extra=True, **args
    )
    assert int(extra_c["dup_overflow"]) > 0


def test_entry_count_exact():
    """entry_count equals the number of real entries tile_bin emits
    (starts[-1] with an ample budget) — the auto-k_budget sizing
    invariant: a budget == the count drops nothing."""
    W = H = 48
    means, scales, rots, ops, feats = random_scene(80, seed=11)
    view_t, full_t, tanfov, campos = make_camera_matrices([0.0, 0.1, -2.5], W, H)
    settings = R.GaussianRasterizationSettings(
        image_height=H, image_width=W, tanfovx=tanfov, tanfovy=tanfov,
        bg=jnp.zeros(3), scale_modifier=1.0,
        viewmatrix=view_t, projmatrix=full_t, sh_degree=0, campos=campos,
    )
    for opr in (False, True):
        cfg = R.RasterizeConfig(max_dup_per_gaussian=8, chunk_size=32,
                                k_budget=8192, opacity_radius=opr)
        prep = R.preprocess(
            jnp.asarray(means), jnp.asarray(ops), settings, cfg,
            scales=jnp.asarray(scales), rotations=jnp.asarray(rots),
            colors_precomp=jnp.asarray(feats),
        )
        gx = -(-W // cfg.tile_x)
        nt = gx * (-(-H // cfg.tile_y))
        _, starts, ovf = R.tile_bin(prep, nt, gx, cfg)
        cnt = int(R.entry_count(prep, cfg))
        assert cnt == int(starts[-1]), (opr, cnt, int(starts[-1]))
        assert cnt > 0
        # exact-fit budget: the k_budget term of the overflow is zero
        # (tile_bin's counter also includes the independent dup-cap term
        # max(area-cap, 0), so compare against exactly that)
        area_raw = np.asarray(
            (prep.rect[:, 2] - prep.rect[:, 0])
            * (prep.rect[:, 3] - prep.rect[:, 1]))
        cap_ovf = int(np.where(np.asarray(prep.valid),
                               np.maximum(area_raw - 8, 0), 0).sum())
        assert int(ovf) == cap_ovf


def test_fd_gradients_full_surface():
    """Finite-difference checks for every input surface the reference
    hand-derives in backward.cu — means3D (:372-383 projection chain +
    computeCov2D :144-274), scales/rotations (computeCov3D backward
    :278-341, unnormalized-quat semantics), SH coefficients (:20-139) —
    plus the background-color term (:531-534) via a non-zero bg.

    Runs in float64 (the rasterizer is dtype-polymorphic): in f32 the loss
    quantization floor sits at ~5%% of these gradients, which is exactly the
    test tolerance — f64 fd matches autodiff to ~6 digits instead."""
    with jax.enable_x64(True):
        W = H = 32
        n = 16
        means, scales, rots, ops, _ = random_scene(n, seed=13, spread=0.35)
        rng = np.random.RandomState(13)
        shs = (rng.rand(n, 4, 3) - 0.5) * 0.8
        view_t, full_t, tanfov, campos = make_camera_matrices(
            [0.2, -0.3, -2.2], W, H
        )
        f8 = lambda x: jnp.asarray(np.asarray(x), jnp.float64)
        bg = np.array([0.3, 0.5, 0.7])  # exercises the bg grad term
        settings = R.GaussianRasterizationSettings(
            image_height=H, image_width=W, tanfovx=tanfov, tanfovy=tanfov,
            bg=f8(bg), scale_modifier=1.0,
            viewmatrix=f8(view_t), projmatrix=f8(full_t), sh_degree=1,
            campos=f8(campos),
        )
        cfg = R.RasterizeConfig(
            max_dup_per_gaussian=32, chunk_size=32, tile_batch=4,
            differentiable=True, max_chunks=16,
        )

        # fixed weights make the scalar loss sensitive to all pixels
        wimg = f8(rng.rand(3, H, W))

        @jax.jit
        def loss(m, s, q, o, sh):
            c, _ = R.rasterize_gaussians(
                m, o, settings, scales=s, rotations=q, shs=sh, config=cfg
            )
            return jnp.sum(c * wimg)

        args = tuple(map(f8, (means, scales, rots, ops, shs)))
        grads = jax.grad(loss, argnums=(0, 1, 2, 3, 4))(*args)
        base_args = [np.asarray(a).copy() for a in args]
        f0 = float(loss(*args))

        rng_idx = np.random.RandomState(99)

        def fd_check(argnum, coords, eps, name):
            g = np.asarray(grads[argnum])
            checked = 0
            for idx in coords:
                ap = [a.copy() for a in base_args]
                am = [a.copy() for a in base_args]
                ap[argnum][idx] += eps
                am[argnum][idx] -= eps
                fp = float(loss(*map(f8, ap)))
                fm = float(loss(*map(f8, am)))
                fd = (fp - fm) / (2 * eps)
                fd_f = (fp - f0) / eps
                fd_b = (f0 - fm) / eps
                # a perturbation that crosses a DISCRETE boundary (integer
                # tile rect, sort-order swap — structure the reference
                # backward also holds fixed: backward.cu treats binning as
                # given) makes the one-sided differences disagree: skip
                if abs(fd_f - fd_b) > 0.05 * max(abs(fd_f), abs(fd_b), 1e-5):
                    continue
                an = float(g[idx])
                if abs(fd) < 1e-7 and abs(an) < 1e-7:
                    continue  # both ~zero: uninformative
                assert np.isclose(fd, an, rtol=1e-4, atol=1e-7), (
                    name, idx, fd, an,
                )
                checked += 1
            assert checked >= 3, (name, checked)

        picks = lambda k, shape: [
            tuple(rng_idx.randint(0, s) for s in shape) for _ in range(k)
        ]
        fd_check(0, picks(6, (n, 3)), 1e-5, "means3D")
        fd_check(1, picks(6, (n, 3)), 1e-5, "scales")
        fd_check(2, picks(6, (n, 4)), 1e-5, "rotations")
        fd_check(3, [(i,) for i in rng_idx.randint(0, n, 4)], 1e-5,
                 "opacity")
        fd_check(4, picks(6, (n, 4, 3)), 1e-5, "sh")


def test_grad_trunc_reported():
    """The differentiable scan's static bound drops tail entries of heavy
    tiles; the drop must surface in return_extra like dup_overflow does."""
    W = H = 16
    n = 64
    means, scales, rots, ops, feats = random_scene(n, seed=3, spread=0.05)
    view_t, full_t, tanfov, campos = make_camera_matrices([0, 0, -2.0], W, H)
    settings = R.GaussianRasterizationSettings(
        image_height=H, image_width=W, tanfovx=tanfov, tanfovy=tanfov,
        bg=jnp.zeros(3), scale_modifier=1.0,
        viewmatrix=view_t, projmatrix=full_t, sh_degree=0, campos=campos,
    )
    # all 64 gaussians land near the image center: tiles hold ~64 entries;
    # max_chunks*chunk = 2*8 = 16 << 64 -> truncation must be reported
    cfg = R.RasterizeConfig(
        max_dup_per_gaussian=32, chunk_size=8, tile_batch=4,
        differentiable=True, max_chunks=2,
    )
    _, _, extra = R.rasterize_gaussians(
        jnp.asarray(means), jnp.asarray(ops), settings,
        scales=jnp.asarray(scales), rotations=jnp.asarray(rots),
        colors_precomp=jnp.asarray(feats), config=cfg, return_extra=True,
    )
    assert int(extra["grad_trunc"]) > 0
    # with a generous bound there is no truncation
    cfg2 = cfg._replace(max_chunks=64, chunk_size=32)
    _, _, extra2 = R.rasterize_gaussians(
        jnp.asarray(means), jnp.asarray(ops), settings,
        scales=jnp.asarray(scales), rotations=jnp.asarray(rots),
        colors_precomp=jnp.asarray(feats), config=cfg2, return_extra=True,
    )
    assert int(extra2["grad_trunc"]) == 0


def test_oracle_fast_matches_scalar():
    """The pixel-vectorized oracle is bit-identical to the scalar one."""
    W = H = 48
    means, scales, rots, ops, feats = random_scene(60, seed=21, spread=0.5)
    view_t, full_t, tanfov, campos = make_camera_matrices([0.1, 0.2, -2.4], W, H)
    bg = np.array([0.6, 0.1, 0.9], np.float32)
    a_out, a_radii, a_T = oracle.rasterize_oracle(
        means, scales, rots, ops, feats,
        np.asarray(view_t), np.asarray(full_t), W, H, tanfov, tanfov, bg,
    )
    b_out, b_radii, b_T = oracle.rasterize_oracle_fast(
        means, scales, rots, ops, feats,
        np.asarray(view_t), np.asarray(full_t), W, H, tanfov, tanfov, bg,
    )
    np.testing.assert_array_equal(a_radii, b_radii)
    np.testing.assert_allclose(a_out, b_out, atol=2e-6)
    np.testing.assert_allclose(a_T, b_T, atol=2e-6)


def test_opacity_radius_bit_exact_and_tighter():
    """Opacity-aware rects (config.opacity_radius) keep the image
    BIT-IDENTICAL — dropped (splat, tile) pairs fail the blend's own
    alpha >= 1/255 skip at every tile pixel (forward.cu:318-320) — while
    shrinking the entry stream for low-opacity splats and culling
    op <= 1/255 splats outright. Radii output keeps the 3-sigma values."""
    W = H = 64
    means, scales, rots, _, feats = random_scene(150, seed=11, scale=0.15)
    rng = np.random.RandomState(3)
    # mostly low opacities (learned-splat-like) + a few below 1/255
    ops = rng.uniform(0.002, 0.3, (150,)).astype(np.float32)
    ops[:10] = rng.uniform(1e-5, 1.0 / 256.0, (10,))
    view_t, full_t, tanfov, campos = make_camera_matrices([0.0, 0.1, -2.4], W, H)
    settings = R.GaussianRasterizationSettings(
        image_height=H, image_width=W, tanfovx=tanfov, tanfovy=tanfov,
        bg=jnp.asarray([0.1, 0.7, 0.3]), scale_modifier=1.0,
        viewmatrix=view_t, projmatrix=full_t, sh_degree=0, campos=campos,
    )
    cfg = R.RasterizeConfig(max_dup_per_gaussian=64, chunk_size=32,
                            tile_batch=4)
    args = dict(scales=jnp.asarray(scales), rotations=jnp.asarray(rots),
                colors_precomp=jnp.asarray(feats))
    c_ref, radii_ref, ex_ref = R.rasterize_gaussians(
        jnp.asarray(means), jnp.asarray(ops), settings, config=cfg,
        return_extra=True, **args)
    cfg_t = cfg._replace(opacity_radius=True)
    c_t, radii_t, ex_t = R.rasterize_gaussians(
        jnp.asarray(means), jnp.asarray(ops), settings, config=cfg_t,
        return_extra=True, **args)
    # dropped pairs have weight EXACTLY 0 in the blend (alpha < 1/255
    # -> om == 1.0), so the contributor set is identical; the only
    # difference is chunk-boundary summation grouping (ULP-scale)
    np.testing.assert_allclose(np.asarray(c_ref), np.asarray(c_t),
                               atol=1e-6, rtol=0)
    np.testing.assert_allclose(np.asarray(ex_ref["final_T"]),
                               np.asarray(ex_t["final_T"]),
                               atol=1e-6, rtol=0)
    # radii API parity: tight rects must not change the returned radii
    np.testing.assert_array_equal(np.asarray(radii_ref), np.asarray(radii_t))

    def n_entries(c):
        p = R.preprocess(jnp.asarray(means), jnp.asarray(ops), settings, c,
                         **args)
        area = (p.rect[:, 2] - p.rect[:, 0]) * (p.rect[:, 3] - p.rect[:, 1])
        return int(jnp.sum(jnp.where(p.valid, area, 0)))

    ne_ref, ne_t = n_entries(cfg), n_entries(cfg_t)
    assert ne_t < ne_ref, (ne_t, ne_ref)
    # sub-1/255 splats are culled outright
    p_t = R.preprocess(jnp.asarray(means), jnp.asarray(ops), settings, cfg_t,
                       **args)
    assert not bool(np.asarray(p_t.valid)[:10].any())
