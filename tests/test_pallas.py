"""Pallas blend kernel vs the XLA reference blend (interpret mode on CPU)."""

import numpy as np
import jax.numpy as jnp

from gpcr_tpu.ops import rasterize as R
from gpcr_tpu.ops import rasterize_pallas as RP

from test_rasterize import make_camera_matrices, random_scene


def test_pallas_blend_matches_xla_interpret():
    W = H = 48
    means, scales, rots, ops_, feats = random_scene(60, seed=5)
    view_t, full_t, tanfov, campos = make_camera_matrices([0.0, 0.0, -2.5], W, H)
    bg = jnp.asarray([0.1, 0.2, 0.3])
    settings = R.GaussianRasterizationSettings(
        image_height=H, image_width=W, tanfovx=tanfov, tanfovy=tanfov,
        bg=bg, scale_modifier=1.0, viewmatrix=view_t, projmatrix=full_t,
        sh_degree=0, campos=campos,
    )
    cfg = R.RasterizeConfig(max_dup_per_gaussian=32, chunk_size=32,
                            tile_batch=4)
    c_ref, radii_ref = R.rasterize_gaussians(
        jnp.asarray(means), jnp.asarray(ops_), settings,
        scales=jnp.asarray(scales), rotations=jnp.asarray(rots),
        colors_precomp=jnp.asarray(feats), config=cfg,
    )
    c_pl, radii_pl = RP.rasterize_gaussians_pallas(
        jnp.asarray(means), jnp.asarray(ops_), settings,
        scales=jnp.asarray(scales), rotations=jnp.asarray(rots),
        colors_precomp=jnp.asarray(feats), config=cfg, interpret=True,
    )
    np.testing.assert_array_equal(np.asarray(radii_ref), np.asarray(radii_pl))
    np.testing.assert_allclose(
        np.asarray(c_pl), np.asarray(c_ref), atol=2e-4, rtol=1e-3
    )


def test_pallas_blend_overdraw_interpret():
    """Early-termination path through the kernel."""
    W = H = 32
    n = 48
    rng = np.random.RandomState(3)
    means = (rng.randn(n, 3) * 0.01).astype(np.float32)
    means[:, 2] = np.linspace(-0.3, 0.3, n)
    scales = np.full((n, 3), 0.15, np.float32)
    rots = np.tile(np.array([1, 0, 0, 0], np.float32), (n, 1))
    ops_ = np.full((n,), 0.95, np.float32)
    feats = rng.rand(n, 3).astype(np.float32)
    view_t, full_t, tanfov, campos = make_camera_matrices([0.0, 0.0, -2.0], W, H)
    settings = R.GaussianRasterizationSettings(
        image_height=H, image_width=W, tanfovx=tanfov, tanfovy=tanfov,
        bg=jnp.zeros(3), scale_modifier=1.0, viewmatrix=view_t,
        projmatrix=full_t, sh_degree=0, campos=campos,
    )
    cfg = R.RasterizeConfig(max_dup_per_gaussian=16, chunk_size=16,
                            tile_batch=4)
    c_ref, _ = R.rasterize_gaussians(
        jnp.asarray(means), jnp.asarray(ops_), settings,
        scales=jnp.asarray(scales), rotations=jnp.asarray(rots),
        colors_precomp=jnp.asarray(feats), config=cfg,
    )
    c_pl, _ = RP.rasterize_gaussians_pallas(
        jnp.asarray(means), jnp.asarray(ops_), settings,
        scales=jnp.asarray(scales), rotations=jnp.asarray(rots),
        colors_precomp=jnp.asarray(feats), config=cfg, interpret=True,
    )
    np.testing.assert_allclose(
        np.asarray(c_pl), np.asarray(c_ref), atol=3e-4, rtol=1e-3
    )


def test_flat_blend_matches_xla():
    """Two-phase flat-chunk blend vs exact path (chunk-granular termination
    bounds the deviation at ~1e-4)."""
    W = H = 64
    means, scales, rots, ops_, feats = random_scene(120, seed=1)
    view_t, full_t, tanfov, campos = make_camera_matrices([0.0, 0.0, -2.5], W, H)
    bg = jnp.asarray([0.2, 0.3, 0.4])
    settings = R.GaussianRasterizationSettings(
        image_height=H, image_width=W, tanfovx=tanfov, tanfovy=tanfov,
        bg=bg, scale_modifier=1.0, viewmatrix=view_t, projmatrix=full_t,
        sh_degree=0, campos=campos,
    )
    cfg = R.RasterizeConfig(max_dup_per_gaussian=64, chunk_size=64,
                            tile_batch=4)
    c_ref, _ = R.rasterize_gaussians(
        jnp.asarray(means), jnp.asarray(ops_), settings,
        scales=jnp.asarray(scales), rotations=jnp.asarray(rots),
        colors_precomp=jnp.asarray(feats), config=cfg,
    )
    c_fl, _ = RP.rasterize_gaussians_flat(
        jnp.asarray(means), jnp.asarray(ops_), settings,
        scales=jnp.asarray(scales), rotations=jnp.asarray(rots),
        colors_precomp=jnp.asarray(feats), config=cfg,
    )
    np.testing.assert_allclose(
        np.asarray(c_fl), np.asarray(c_ref), atol=5e-4, rtol=1e-3
    )


def test_flat_blend_budget_overflow_flag():
    """k_budget smaller than the real entry count must raise the overflow
    counter (and only then)."""
    W = H = 64
    means, scales, rots, ops_, feats = random_scene(120, seed=1)
    view_t, full_t, tanfov, campos = make_camera_matrices([0.0, 0.0, -2.5], W, H)
    settings = R.GaussianRasterizationSettings(
        image_height=H, image_width=W, tanfovx=tanfov, tanfovy=tanfov,
        bg=jnp.zeros(3), scale_modifier=1.0, viewmatrix=view_t,
        projmatrix=full_t, sh_degree=0, campos=campos,
    )
    cfg_ok = R.RasterizeConfig(max_dup_per_gaussian=64, chunk_size=64,
                               k_budget=int(1e6))
    prep = R.preprocess(
        jnp.asarray(means), jnp.asarray(ops_), settings, cfg_ok,
        scales=jnp.asarray(scales), rotations=jnp.asarray(rots),
        colors_precomp=jnp.asarray(feats),
    )
    num_tiles = 16
    _, _, _, ovf = RP.tile_bin_aligned(prep, num_tiles, 4, cfg_ok, 8)
    assert int(np.asarray(ovf)) == 0
    cfg_small = cfg_ok._replace(k_budget=64)
    _, _, _, ovf2 = RP.tile_bin_aligned(prep, num_tiles, 4, cfg_small, 8)
    assert int(np.asarray(ovf2)) > 0
