"""Tile-sharded multi-device rendering matches the single-device result."""

import numpy as np
import jax
import jax.numpy as jnp

from gpcr_tpu.ops import rasterize as R
from gpcr_tpu.parallel.render import rasterize_tile_sharded
from gpcr_tpu.parallel.sharding import make_mesh

from test_rasterize import make_camera_matrices, random_scene


def test_tile_sharded_matches_single():
    assert len(jax.devices()) == 8
    W = H = 64  # 4x4 tiles = 16 tiles over 8 devices
    means, scales, rots, ops_, feats = random_scene(100, seed=2)
    view_t, full_t, tanfov, campos = make_camera_matrices([0.0, 0.2, -2.5], W, H)
    bg = jnp.asarray([0.3, 0.1, 0.2])
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
    mesh = make_mesh(sp=8)
    with mesh:
        c_sh, radii_sh, t_img = rasterize_tile_sharded(
            jnp.asarray(means), jnp.asarray(ops_), settings, mesh, axis="sp",
            scales=jnp.asarray(scales), rotations=jnp.asarray(rots),
            colors_precomp=jnp.asarray(feats), config=cfg,
        )
    np.testing.assert_array_equal(np.asarray(radii_ref), np.asarray(radii_sh))
    np.testing.assert_allclose(
        np.asarray(c_sh), np.asarray(c_ref), atol=1e-5, rtol=1e-5
    )


def test_tile_sharded_non_divisible():
    """9 tiles over 8 devices: the padded-range path must still be exact."""
    W = H = 48  # 3x3 tiles = 9, not divisible by 8
    means, scales, rots, ops_, feats = random_scene(80, seed=5)
    view_t, full_t, tanfov, campos = make_camera_matrices([0.1, 0.0, -2.2], W, H)
    settings = R.GaussianRasterizationSettings(
        image_height=H, image_width=W, tanfovx=tanfov, tanfovy=tanfov,
        bg=jnp.asarray([0.5, 0.5, 0.0]), scale_modifier=1.0,
        viewmatrix=view_t, projmatrix=full_t, sh_degree=0, campos=campos,
    )
    cfg = R.RasterizeConfig(max_dup_per_gaussian=32, chunk_size=32,
                            tile_batch=4)
    c_ref, _ = R.rasterize_gaussians(
        jnp.asarray(means), jnp.asarray(ops_), settings,
        scales=jnp.asarray(scales), rotations=jnp.asarray(rots),
        colors_precomp=jnp.asarray(feats), config=cfg,
    )
    mesh = make_mesh(sp=8)
    with mesh:
        c_sh, _, _ = rasterize_tile_sharded(
            jnp.asarray(means), jnp.asarray(ops_), settings, mesh, axis="sp",
            scales=jnp.asarray(scales), rotations=jnp.asarray(rots),
            colors_precomp=jnp.asarray(feats), config=cfg,
        )
    np.testing.assert_allclose(
        np.asarray(c_sh), np.asarray(c_ref), atol=1e-5, rtol=1e-5
    )


def test_shard_batch_unknown_key_raises():
    from gpcr_tpu.parallel.sharding import shard_batch

    mesh = make_mesh(dp=2, sp=4)
    batch = {"coords": jnp.zeros((2, 8, 3)), "mystery": jnp.zeros((2, 4))}
    try:
        shard_batch(batch, mesh)
        assert False, "expected ValueError"
    except ValueError as e:
        assert "mystery" in str(e)
    out = shard_batch(batch, mesh, spec={"mystery": "view"})
    assert set(out) == {"coords", "mystery"}


def test_distributed_initialize_single_process_noop():
    from gpcr_tpu.parallel import distributed

    assert distributed.initialize() is False  # single process: no-op
    s = distributed.local_batch_slice(10)
    assert s == slice(0, 10)
