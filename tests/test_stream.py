"""Stream (Pallas) rasterizer vs the exact XLA path — interpret mode on CPU.

Covers the v5 binning (depth presort + stable tile sort + permute-free
stream gather), the active-tile budget, k_budget overflow accounting, and
the fused 2x2 downscale. The TPU-compiled kernel is exercised by
scripts/tpu_smoke.py and bench.py on real hardware.
"""

import numpy as np
import jax.numpy as jnp

from gpcr_tpu.ops import rasterize as R
from gpcr_tpu.ops.rasterize_stream import rasterize_gaussians_stream


def scene(n=400, seed=0, channels=12):
    rng = np.random.RandomState(seed)
    means = jnp.asarray(
        rng.randn(n, 3) * 0.3 + np.array([0, 0, 2.5]), jnp.float32
    )
    scales = jnp.asarray(rng.rand(n, 3) * 0.05 + 0.01, jnp.float32)
    rots = jnp.asarray(rng.randn(n, 4), jnp.float32)
    op = jnp.asarray(rng.rand(n), jnp.float32)
    feats = jnp.asarray(rng.rand(n, channels), jnp.float32)
    valid = jnp.asarray(rng.rand(n) > 0.1)

    P = np.zeros((4, 4), np.float32)
    P[0, 0] = P[1, 1] = 1.0
    P[3, 2] = 1.0
    P[2, 2] = 100.0 / (100.0 - 0.01)
    P[2, 3] = -(100.0 * 0.01) / (100.0 - 0.01)
    settings = R.GaussianRasterizationSettings(
        image_height=64, image_width=64, tanfovx=1.0, tanfovy=1.0,
        bg=jnp.full((channels,), 0.7), scale_modifier=1.0,
        viewmatrix=jnp.eye(4), projmatrix=jnp.asarray(P.T), sh_degree=0,
        campos=jnp.zeros(3),
    )
    return means, scales, rots, op, feats, valid, settings


def test_stream_matches_xla_exact():
    means, scales, rots, op, feats, valid, settings = scene()
    config = R.RasterizeConfig(max_dup_per_gaussian=16, chunk_size=64)
    ref, radii_ref = R.rasterize_gaussians(
        means, op, settings, scales=scales, rotations=rots,
        colors_precomp=feats, valid_mask=valid, config=config,
    )
    out, radii, extra = rasterize_gaussians_stream(
        means, op, settings, scales=scales, rotations=rots,
        colors_precomp=feats, valid_mask=valid, config=config,
        interpret=True, return_extra=True,
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)
    np.testing.assert_array_equal(np.asarray(radii), np.asarray(radii_ref))
    assert int(extra["dup_overflow"]) == 0


def test_stream_active_tile_budget_exact_when_covering():
    means, scales, rots, op, feats, valid, settings = scene(seed=2)
    config = R.RasterizeConfig(
        max_dup_per_gaussian=16, chunk_size=64, max_active_tiles=16,
    )
    ref, _ = R.rasterize_gaussians(
        means, op, settings, scales=scales, rotations=rots,
        colors_precomp=feats, valid_mask=valid,
        config=config._replace(max_active_tiles=None),
    )
    out, _, extra = rasterize_gaussians_stream(
        means, op, settings, scales=scales, rotations=rots,
        colors_precomp=feats, valid_mask=valid, config=config,
        interpret=True, return_extra=True,
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)
    assert int(extra["dup_overflow"]) == 0


def test_stream_k_budget_overflow_reported():
    means, scales, rots, op, feats, valid, settings = scene(seed=3)
    config = R.RasterizeConfig(
        max_dup_per_gaussian=16, chunk_size=64, k_budget=4096,
        max_active_tiles=12,
    )
    _, _, extra = rasterize_gaussians_stream(
        means, op, settings, scales=scales, rotations=rots,
        colors_precomp=feats, valid_mask=valid, config=config,
        interpret=True, return_extra=True,
    )
    assert int(extra["dup_overflow"]) > 0


def test_stream_fused_downscale_matches_mean_pool():
    means, scales, rots, op, feats, valid, settings = scene(seed=4)
    config = R.RasterizeConfig(
        max_dup_per_gaussian=16, chunk_size=64, downscale=2,
    )
    full, _ = R.rasterize_gaussians(
        means, op, settings, scales=scales, rotations=rots,
        colors_precomp=feats, valid_mask=valid,
        config=config._replace(downscale=1),
    )
    ref = np.asarray(full).reshape(12, 32, 2, 32, 2).mean(axis=(2, 4))
    out, _, extra = rasterize_gaussians_stream(
        means, op, settings, scales=scales, rotations=rots,
        colors_precomp=feats, valid_mask=valid, config=config,
        interpret=True, return_extra=True,
    )
    assert out.shape == (12, 32, 32)
    np.testing.assert_allclose(np.asarray(out), ref, atol=1e-5)
    assert extra["final_T"].shape == (32, 32)


def test_tile_cull_is_exact_and_nonvacuous(monkeypatch):
    """The per-tile alpha cull must be output-invariant (the blend skips
    sub-1/255 entries per-pixel anyway) while actually dropping entries
    on an anisotropic scene."""
    import gpcr_tpu.ops.rasterize_stream as RS

    means, scales, rots, op, feats, valid, settings = scene(seed=7)
    # stretch along one axis so rects badly over-cover the ellipses
    scales = scales.at[:, 0].multiply(6.0)
    config = R.RasterizeConfig(max_dup_per_gaussian=32, chunk_size=64)

    outs, counts = {}, {}
    # the cull is implemented on the legacy cn emit layout only
    monkeypatch.setattr(RS, "_EMIT_LAYOUT", "cn")
    for flag in (True, False):
        monkeypatch.setattr(RS, "_TILE_CULL", flag)
        out, _, extra = rasterize_gaussians_stream(
            means, op, settings, scales=scales, rotations=rots,
            colors_precomp=feats, valid_mask=valid, config=config,
            interpret=True, return_extra=True,
        )
        assert int(extra["dup_overflow"]) == 0
        outs[flag] = np.asarray(out)

        prep = R.preprocess(
            means, op, settings, config,
            scales=scales, rotations=rots, colors_precomp=feats,
            valid_mask=valid,
        )
        grid_x = -(-settings.image_width // config.tile_x)
        grid_y = -(-settings.image_height // config.tile_y)
        _, starts, _ = RS.bin_sorted_stream(
            prep, grid_x * grid_y, grid_x, config
        )
        counts[flag] = int(starts[-1])

    np.testing.assert_array_equal(outs[True], outs[False])
    assert counts[True] < counts[False], counts


def test_compact_emit_matches_dense(monkeypatch):
    """The kb-slot compacted emit (boundary scatter + delta cumsums) must
    reproduce the dense (cap, n) emit bit-exactly when total <= k_budget."""
    import gpcr_tpu.ops.rasterize_stream as RS

    means, scales, rots, op, feats, valid, settings = scene(seed=11)
    scales = scales.at[:, 1].multiply(4.0)
    config = R.RasterizeConfig(
        max_dup_per_gaussian=32, chunk_size=64, k_budget=8192,
    )

    outs = {}
    for mode in ("1", "0"):
        monkeypatch.setattr(RS, "_EMIT_COMPACT", mode)
        out, _, extra = rasterize_gaussians_stream(
            means, op, settings, scales=scales, rotations=rots,
            colors_precomp=feats, valid_mask=valid, config=config,
            interpret=True, return_extra=True,
        )
        assert int(extra["dup_overflow"]) == 0, mode
        outs[mode] = np.asarray(out)
    np.testing.assert_array_equal(outs["1"], outs["0"])

    # and against the exact XLA path
    ref, _ = R.rasterize_gaussians(
        means, op, settings, scales=scales, rotations=rots,
        colors_precomp=feats, valid_mask=valid,
        config=config._replace(k_budget=None),
    )
    np.testing.assert_allclose(outs["1"], np.asarray(ref), atol=1e-5)


def test_rank_emit_matches_legacy_layouts(monkeypatch):
    """The rank-keyed binning (slot-major emit + unique 2-key sort +
    rank-permuted table, the round-4 default) must reproduce the legacy
    gaussian-major stable-sort layouts bit-exactly: (tile, rank) order
    == the CUB (tile | depth) order because ranks are presort (depth,
    gidx) positions."""
    import gpcr_tpu.ops.rasterize_stream as RS

    means, scales, rots, op, feats, valid, settings = scene(seed=13)
    scales = scales.at[:, 0].multiply(3.0)
    config = R.RasterizeConfig(
        max_dup_per_gaussian=16, chunk_size=64, k_budget=8192,
    )

    outs = {}
    for layout in ("rank", "cn", "nc"):
        monkeypatch.setattr(RS, "_EMIT_LAYOUT", layout)
        monkeypatch.setattr(RS, "_EMIT_COMPACT", "0")
        out, _, extra = rasterize_gaussians_stream(
            means, op, settings, scales=scales, rotations=rots,
            colors_precomp=feats, valid_mask=valid, config=config,
            interpret=True, return_extra=True,
        )
        assert int(extra["dup_overflow"]) == 0, layout
        outs[layout] = np.asarray(out)
    np.testing.assert_array_equal(outs["rank"], outs["cn"])
    np.testing.assert_array_equal(outs["rank"], outs["nc"])
