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
        _, starts, _, _ = RS.bin_sorted_stream(
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


def test_blocked_row_gather_matches_direct():
    """_blocked_row_gather == table[idx] when indices are window-local;
    out-of-window REAL indices are zeroed and counted."""
    import gpcr_tpu.ops.rasterize_stream as RS

    rng = np.random.RandomState(5)
    n = 300
    table = jnp.asarray(rng.randn(n + 1, 8), jnp.float32)
    table = table.at[n].set(0.0)
    # indices local to their block: block b draws from [b*40, b*40 + 60)
    idx = np.minimum(
        (np.repeat(np.arange(5), 64) * 40
         + rng.randint(0, 60, size=320)), n - 1)
    idx[::17] = n  # sprinkle sentinels
    idx = jnp.asarray(idx, jnp.int32)
    out, drop = RS._blocked_row_gather(table, idx, n, window=128, block=64)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(table[idx]))
    assert int(drop) == 0

    # a far-away index inside a late block drags the window start down,
    # pushing that block's OTHER rows out of the window: they must come
    # back zeroed and counted, never as garbage
    idx_bad = idx.at[300].set(0)
    out2, drop2 = RS._blocked_row_gather(
        table, idx_bad, n, window=64, block=64)
    assert int(drop2) >= 1
    np.testing.assert_array_equal(np.asarray(out2[301]), 0.0)
    np.testing.assert_array_equal(
        np.asarray(out2[300]), np.asarray(table[0]))


def test_blocked_stream_gather_matches_global(monkeypatch):
    """The blocked-window spatial stream gather (GPCR_STREAM_GATHER=
    blocked) must reproduce the global-gather binning bit-exactly —
    same sorted entry order (the (tile, rank) sort is untouched), same
    packed rows via the spatially-permuted table."""
    import gpcr_tpu.ops.rasterize_stream as RS

    means, scales, rots, op, feats, valid, settings = scene(seed=17)
    config = R.RasterizeConfig(
        max_dup_per_gaussian=16, chunk_size=32, k_budget=8192,
    )
    prep = R.preprocess(
        means, op, settings, config,
        scales=scales, rotations=rots, colors_precomp=feats,
        valid_mask=valid,
    )
    grid_x = -(-settings.image_width // config.tile_x)
    grid_y = -(-settings.image_height // config.tile_y)
    num_tiles = grid_x * grid_y

    s_ref, starts_ref, ovf_ref, wd_ref = RS.bin_sorted_stream(
        prep, num_tiles, grid_x, config)

    monkeypatch.setattr(RS, "_STREAM_GATHER", "blocked")
    monkeypatch.setattr(RS, "_STREAM_WINDOW", 384)
    monkeypatch.setattr(RS, "_STREAM_BLOCK", 64)
    s_blk, starts_blk, ovf_blk, wd_blk = RS.bin_sorted_stream(
        prep, num_tiles, grid_x, config)

    assert int(ovf_ref) == 0 and int(ovf_blk) == 0
    assert int(wd_ref) == 0 and int(wd_blk) == 0
    np.testing.assert_array_equal(
        np.asarray(starts_blk), np.asarray(starts_ref))
    np.testing.assert_array_equal(np.asarray(s_blk), np.asarray(s_ref))

    # end-to-end through the (interpret-mode) kernel too — distinct
    # chunk_size keeps this trace out of other tests' jit caches
    ref, _ = R.rasterize_gaussians(
        means, op, settings, scales=scales, rotations=rots,
        colors_precomp=feats, valid_mask=valid,
        config=config._replace(k_budget=None),
    )
    out, _, extra = rasterize_gaussians_stream(
        means, op, settings, scales=scales, rotations=rots,
        colors_precomp=feats, valid_mask=valid, config=config,
        interpret=True, return_extra=True,
    )
    assert int(extra["dup_overflow"]) == 0
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)
