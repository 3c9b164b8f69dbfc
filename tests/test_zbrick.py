"""Parity of the z-brick conv engine vs the direct voxel gather conv.

The brick engine (ops/sparse_zbrick.py) must reproduce sparse.conv /
conv_multi bit-for-bit in f32 on arbitrary sparse voxel sets, including
grid borders and z-brick boundary crossings.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from gpcr_tpu.ops import sparse, sparse_zbrick as zb


def make_grid(rng, n, span=24, base=100, cap=None, c=6):
    coords = rng.randint(base, base + span, size=(n, 3)).astype(np.float32)
    feats = rng.randn(n, c).astype(np.float32)
    g = sparse.quantize_average(
        jnp.asarray(coords), jnp.asarray(feats), capacity=cap or n)
    return g


@pytest.mark.parametrize("z", [4, 8])
def test_brick_conv_matches_voxel_conv(z):
    rng = np.random.RandomState(0)
    g = make_grid(rng, 600, span=20, c=6)
    kmap = sparse.build_kernel_map(g, 3)
    w = jnp.asarray(rng.randn(27, 6, 5), jnp.float32) * 0.3
    b = jnp.asarray(rng.randn(5), jnp.float32)
    ref = sparse.conv(g, kmap, w, b, block=None)

    plan = zb.build_brick_plan(g, capacity=1024, z=z)
    assert int(plan.nb) <= 1024
    fb = zb.to_bricks(g.feats, plan)
    ob = zb.brick_conv(fb, w, b, plan, block=None)
    got = zb.to_voxels(ob, plan, g.capacity) * g.valid[:, None]
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(ref), rtol=1e-5, atol=1e-5)


def test_brick_conv_grid_border():
    """Voxels touching coordinate 0 / GRID_MAX-1 and z-brick edges."""
    rng = np.random.RandomState(1)
    coords = np.concatenate([
        rng.randint(0, 6, size=(200, 3)),
        np.stack([rng.randint(1018, 1024, 200),
                  rng.randint(0, 5, 200),
                  rng.randint(1018, 1024, 200)], axis=1),
    ]).astype(np.float32)
    feats = rng.randn(len(coords), 4).astype(np.float32)
    g = sparse.quantize_average(
        jnp.asarray(coords), jnp.asarray(feats), capacity=512)
    kmap = sparse.build_kernel_map(g, 3)
    w = jnp.asarray(rng.randn(27, 4, 4), jnp.float32) * 0.3
    ref = sparse.conv(g, kmap, w, None, block=None)

    plan = zb.build_brick_plan(g, capacity=512, z=4)
    fb = zb.to_bricks(g.feats, plan)
    got = zb.to_voxels(
        zb.brick_conv(fb, w, None, plan, block=None), plan, g.capacity
    ) * g.valid[:, None]
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(ref), rtol=1e-5, atol=1e-5)


def test_brick_conv_multi_channel_packing():
    rng = np.random.RandomState(2)
    g = make_grid(rng, 500, span=16, c=8)
    kmap = sparse.build_kernel_map(g, 3)
    f2 = jnp.asarray(rng.randn(g.capacity, 3), jnp.float32) * g.valid[:, None]
    w1 = jnp.asarray(rng.randn(27, 8, 4), jnp.float32) * 0.3
    w2 = jnp.asarray(rng.randn(27, 3, 6), jnp.float32) * 0.3
    b1 = jnp.asarray(rng.randn(4), jnp.float32)
    r1, r2 = sparse.conv_multi(
        g, kmap, [g.feats, f2], [w1, w2], [b1, None], block=None)

    plan = zb.build_brick_plan(g, capacity=1024, z=4)
    fb1 = zb.to_bricks(g.feats, plan)
    fb2 = zb.to_bricks(f2, plan)
    o1, o2 = zb.brick_conv_multi(
        [fb1, fb2], [w1, w2], [b1, None], plan, block=None)
    g1 = zb.to_voxels(o1, plan, g.capacity) * g.valid[:, None]
    g2 = zb.to_voxels(o2, plan, g.capacity) * g.valid[:, None]
    np.testing.assert_allclose(np.asarray(g1), np.asarray(r1),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(g2), np.asarray(r2),
                               rtol=1e-5, atol=1e-5)


def test_blocked_window_path_matches_global():
    """The WINDOWED _to_dilated branch (block_lo anchoring, stride-scaled
    slices) must equal the global-gather branch.

    The public entry points never take this branch at test sizes (the
    _auto_block 4096-row floor makes every dilated table <= one block), so
    this drives _to_dilated directly with a small forced block. window =
    bcap makes the window slice provably cover every in-block d2r target
    (exactness is guaranteed by the contract, not by luck), while still
    executing the windowed code path."""
    rng = np.random.RandomState(3)
    g = make_grid(rng, 2000, span=40, c=4, cap=2048)
    plan = zb.build_brick_plan(g, capacity=2048, z=4)
    fb = zb.to_bricks(g.feats, plan)
    packed = fb  # (Bcap, Z, C)
    dcap = plan.dcapacity
    block = 256
    assert dcap > block, "grid too small: windowed branch not exercised"
    ref = zb._to_dilated(packed, plan, None, zb.BRICK_WINDOW)
    got = zb._to_dilated(packed, plan, block, int(plan.bcodes.shape[0]))
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(ref), rtol=0, atol=0)
    # and the full conv with a forced block still matches the global conv
    w = jnp.asarray(rng.randn(27, 4, 4), jnp.float32) * 0.3
    md = int(zb.brick_max_delta(plan))
    refc = zb.brick_conv(fb, w, None, plan, block=None)
    gotc = zb.brick_conv(fb, w, None, plan, block=256, window=max(md, 64))
    np.testing.assert_allclose(
        np.asarray(gotc), np.asarray(refc), rtol=1e-5, atol=1e-5)


def test_roundtrip_layout():
    rng = np.random.RandomState(4)
    g = make_grid(rng, 300, span=12, c=7)
    plan = zb.build_brick_plan(g, capacity=512, z=4)
    fb = zb.to_bricks(g.feats, plan)
    back = zb.to_voxels(fb, plan, g.capacity)
    np.testing.assert_allclose(
        np.asarray(back) * np.asarray(g.valid)[:, None],
        np.asarray(g.feats), rtol=0, atol=0)
    # occupancy count equals valid voxel count
    assert int(plan.occ.sum()) == int(g.num)


def test_unet_brick_levels_match_voxel_engine():
    """Full SparseUNet forward: brick engine at levels 0-1 vs the all-
    voxel engine — identical outputs (both are exact convs)."""
    from gpcr_tpu.models.unet import SparseUNet

    rng = np.random.RandomState(7)
    n = 900
    coords = rng.randint(200, 260, size=(n, 3)).astype(np.float32)
    feats = rng.randn(n, 5).astype(np.float32)
    g = sparse.quantize_average(
        jnp.asarray(coords), jnp.asarray(feats), capacity=1024)

    ch = [5, 4, 4, 8, 8, 4]
    net_v = SparseUNet(ch, feat_dim=6, block_layers=1, conv_block=None)
    net_b = SparseUNet(ch, feat_dim=6, block_layers=1, conv_block=None,
                       brick_levels=(0, 1))
    params = net_v.init(jax.random.PRNGKey(0))

    caps = [1024, 1024, 512, 256]
    plan_v = net_v.build_plan(g, caps)
    bcaps = zb.plan_brick_capacities(
        np.asarray(coords), levels=2, bucket=256)
    plan_b = net_b.build_plan(
        g, caps, brick_capacity={0: bcaps[0], 1: bcaps[1]})
    assert 0 in plan_b["bricks"] and 1 in plan_b["bricks"]

    out_v = np.asarray(net_v.apply(params, g, plan_v))
    out_b = np.asarray(net_b.apply(params, g, plan_b))
    np.testing.assert_allclose(out_b, out_v, rtol=2e-4, atol=2e-4)


def test_kernel_map_from_bricks_matches_direct():
    """build_kernel_map_bricks must reproduce sparse.build_kernel_map
    exactly (same indices incl. misses) on random and border clouds."""
    for seed, base, span in [(11, 100, 24), (12, 0, 8), (13, 1016, 8)]:
        rng = np.random.RandomState(seed)
        coords = rng.randint(base, base + span, size=(800, 3))
        coords = np.clip(coords, 0, 1023).astype(np.float32)
        feats = rng.randn(len(coords), 2).astype(np.float32)
        g = sparse.quantize_average(
            jnp.asarray(coords), jnp.asarray(feats), capacity=1024)
        ref = np.asarray(sparse.build_kernel_map(g, 3))
        plan = zb.build_brick_plan(g, capacity=1024, z=4)
        got = np.asarray(zb.build_kernel_map_bricks(g, plan))
        # rows beyond num are garbage-but-miss in both; compare valid rows
        num = int(g.num)
        np.testing.assert_array_equal(got[:num], ref[:num])


def test_unet_brick_kmaps_voxel_convs_match_direct():
    """brick plans used ONLY for kernel-map construction (voxel convs,
    the production default) must match the all-direct plan exactly."""
    from gpcr_tpu.models.unet import SparseUNet

    rng = np.random.RandomState(21)
    coords = rng.randint(150, 200, size=(700, 3)).astype(np.float32)
    feats = rng.randn(700, 5).astype(np.float32)
    g = sparse.quantize_average(
        jnp.asarray(coords), jnp.asarray(feats), capacity=1024)

    net = SparseUNet([5, 4, 4, 8, 8, 4], feat_dim=6, block_layers=1,
                     conv_block=None)
    params = net.init(jax.random.PRNGKey(0))
    caps = [1024, 1024, 512, 256]
    plan_direct = net.build_plan(g, caps)
    bcaps = zb.plan_brick_capacities(
        np.asarray(coords), levels=2, bucket=256)
    plan_brick = net.build_plan(
        g, caps, brick_capacity={0: bcaps[0], 1: bcaps[1]})
    assert plan_brick["kmaps"][0] is not None  # voxel convs still served
    out_d = np.asarray(net.apply(params, g, plan_direct))
    out_b = np.asarray(net.apply(params, g, plan_brick))
    np.testing.assert_array_equal(out_b, out_d)
