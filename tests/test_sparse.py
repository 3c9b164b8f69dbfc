"""Sparse voxel conv engine vs dense numpy oracles."""

import pytest
import jax
import jax.numpy as jnp
import numpy as np

from gpcr_tpu.ops import sparse


def make_grid(n=50, extent=12, cin=4, seed=0, cap=None):
    rng = np.random.RandomState(seed)
    coords = np.unique(rng.randint(0, extent, (n, 3)), axis=0)
    n = coords.shape[0]
    feats = rng.randn(n, cin).astype(np.float32)
    g = sparse.quantize_average(
        jnp.asarray(coords, jnp.float32), jnp.asarray(feats),
        capacity=cap or n + 7,
    )
    return g, coords, feats


def dense_of(grid):
    """Scatter sparse grid into a dense numpy volume for oracle convs."""
    codes = np.asarray(grid.codes)
    feats = np.asarray(grid.feats)
    num = int(grid.num)
    coords = np.asarray(sparse.unpack_coords(grid.codes[:num]))
    ext = coords.max() + 1 if num else 1
    vol = np.zeros((ext + 4, ext + 4, ext + 4, feats.shape[1]), np.float32)
    occ = np.zeros((ext + 4, ext + 4, ext + 4), bool)
    for i in range(num):
        x, y, z = coords[i]
        vol[x, y, z] = feats[i]
        occ[x, y, z] = True
    return vol, occ, coords


def test_quantize_average_dedups_and_averages():
    coords = np.array([[1, 2, 3], [1, 2, 3], [4, 5, 6]], np.float32)
    feats = np.array([[2.0], [4.0], [10.0]], np.float32)
    g = sparse.quantize_average(jnp.asarray(coords), jnp.asarray(feats), capacity=5)
    assert int(g.num) == 2
    codes = np.asarray(g.codes[:2])
    f = np.asarray(g.feats[:2, 0])
    c123 = int(sparse.pack_coords(jnp.array([[1, 2, 3]]))[0])
    i = list(codes).index(c123)
    assert np.isclose(f[i], 3.0)
    assert np.isclose(f[1 - i], 10.0)
    # sortedness + sentinel padding
    assert np.all(np.diff(np.asarray(g.codes).astype(np.int64)) >= 0)


@pytest.mark.smoke
def test_conv3_matches_dense():
    g, _, _ = make_grid(n=80, cin=4, seed=1)
    kmap = sparse.build_kernel_map(g, 3)
    rng = np.random.RandomState(2)
    w = rng.randn(27, 4, 6).astype(np.float32) * 0.1
    b = rng.randn(6).astype(np.float32)
    out = np.asarray(sparse.conv(g, kmap, jnp.asarray(w), jnp.asarray(b)))

    vol, occ, coords = dense_of(g)
    offs = np.asarray(sparse._offsets_cube(3))
    num = int(g.num)
    for i in range(num):
        acc = b.copy()
        for k in range(27):
            c = coords[i] + offs[k]
            if np.all(c >= 0) and occ[tuple(c)]:
                acc = acc + vol[tuple(c)] @ w[k]
        np.testing.assert_allclose(out[i], acc, rtol=1e-4, atol=1e-5)
    # padding rows zero
    np.testing.assert_array_equal(out[num:], 0)


def test_down_then_up_roundtrip_coords():
    g, _, _ = make_grid(n=60, cin=3, seed=3)
    pgrid, parent_slot, octant = sparse.downsample_coords(g)
    num = int(g.num)
    coords = np.asarray(sparse.unpack_coords(g.codes[:num]))
    pcoords = np.asarray(sparse.unpack_coords(pgrid.codes[: int(pgrid.num)]))
    # every input's parent is present
    expected_parents = np.unique(coords >> 1, axis=0)
    got = pcoords[np.lexsort(pcoords.T[::-1])]
    exp = expected_parents[np.lexsort(expected_parents.T[::-1])]
    np.testing.assert_array_equal(got, exp)
    # parent_slot consistency
    ps = np.asarray(parent_slot[:num])
    for i in range(num):
        np.testing.assert_array_equal(
            np.asarray(sparse.unpack_coords(pgrid.codes[ps[i] : ps[i] + 1]))[0],
            coords[i] >> 1,
        )
    assert pgrid.stride == 2


def test_conv_down_matches_dense():
    g, _, _ = make_grid(n=70, cin=3, seed=4)
    pgrid, parent_slot, octant = sparse.downsample_coords(g)
    rng = np.random.RandomState(5)
    w = rng.randn(8, 3, 5).astype(np.float32) * 0.2
    b = rng.randn(5).astype(np.float32)
    out = np.asarray(
        sparse.conv_down(g, pgrid, parent_slot, octant, jnp.asarray(w), jnp.asarray(b))
    )
    vol, occ, coords = dense_of(g)
    pnum = int(pgrid.num)
    pcoords = np.asarray(sparse.unpack_coords(pgrid.codes[:pnum]))
    for i in range(pnum):
        acc = b.copy()
        for o in range(8):
            child = pcoords[i] * 2 + np.array([o >> 2 & 1, o >> 1 & 1, o & 1])
            if np.all(child < occ.shape[0]) and occ[tuple(child)]:
                acc = acc + vol[tuple(child)] @ w[o]
        np.testing.assert_allclose(out[i], acc, rtol=1e-4, atol=1e-5)


def test_conv_up_generative_restores_fine_coords():
    g, _, _ = make_grid(n=40, cin=3, seed=6)
    pgrid, parent_slot, octant = sparse.downsample_coords(g)
    # coarse features = something known
    rng = np.random.RandomState(7)
    pf = rng.randn(pgrid.capacity, 3).astype(np.float32)
    pf[int(pgrid.num):] = 0
    pgrid = pgrid.replace(feats=jnp.asarray(pf))
    w = rng.randn(8, 3, 4).astype(np.float32)
    b = rng.randn(4).astype(np.float32)
    out = np.asarray(
        sparse.conv_up_generative(
            pgrid, g.codes, g.num, g.stride, jnp.asarray(w), jnp.asarray(b)
        )
    )
    num = int(g.num)
    coords = np.asarray(sparse.unpack_coords(g.codes[:num]))
    pcodes = np.asarray(pgrid.codes)
    for i in range(num):
        parent = coords[i] >> 1
        o = (coords[i][0] & 1) * 4 + (coords[i][1] & 1) * 2 + (coords[i][2] & 1)
        pc = int(sparse.pack_coords(jnp.asarray(parent[None]))[0])
        j = int(np.searchsorted(pcodes, pc))
        assert pcodes[j] == pc
        np.testing.assert_allclose(out[i], pf[j] @ w[o] + b, rtol=1e-4, atol=1e-5)
    np.testing.assert_array_equal(out[num:], 0)


def test_interpolate_trilinear():
    # single occupied voxel at (2,2,2) with feature 1: interp at 2.5 on one
    # axis gives 0.5
    g = sparse.quantize_average(
        jnp.asarray([[2.0, 2.0, 2.0]]), jnp.asarray([[1.0]]), capacity=2
    )
    pts = jnp.asarray([[2.0, 2.0, 2.0], [2.5, 2.0, 2.0], [2.0, 2.5, 2.5]])
    out = np.asarray(sparse.interpolate_trilinear(g, pts))
    np.testing.assert_allclose(out[:, 0], [1.0, 0.5, 0.25], atol=1e-6)


def test_prune():
    g, _, _ = make_grid(n=30, cin=2, seed=8)
    num = int(g.num)
    keep = jnp.arange(g.capacity) % 2 == 0
    pg = sparse.prune(g, keep)
    expected = int(np.sum(np.asarray(keep)[:num]))
    assert int(pg.num) == expected
    kept_codes = np.asarray(g.codes)[np.asarray(keep & g.valid)]
    np.testing.assert_array_equal(np.sort(kept_codes), np.asarray(pg.codes[:expected]))


def test_unet_forward_shapes_and_grad():
    from gpcr_tpu.models.unet import SparseUNet

    g, _, _ = make_grid(n=64, extent=16, cin=4, seed=9, cap=96)
    net = SparseUNet(channels=[4, 8, 8, 8, 8, 8], feat_dim=13, block_layers=1)
    params = net.init(jax.random.PRNGKey(0))
    plan = net.build_plan(g)
    out = net.apply(params, g, plan)
    assert out.shape == (g.capacity, 13)
    assert np.all(np.isfinite(np.asarray(out)))
    # padding rows must stay zero
    np.testing.assert_array_equal(np.asarray(out)[int(g.num):], 0)

    def loss(p):
        return jnp.sum(net.apply(p, g, plan) ** 2)

    grads = jax.grad(loss)(params)
    leaves = jax.tree_util.tree_leaves(grads)
    assert all(np.all(np.isfinite(np.asarray(l))) for l in leaves)
    assert any(np.abs(np.asarray(l)).max() > 0 for l in leaves)


def test_pcencoder_head_deployed_config():
    from gpcr_tpu.models.encoder import PCEncoder, PCMLInfo, assemble_input_features

    info = PCMLInfo(clr_encoder_channels="9 8 8 8 8 8")
    assert info.feat_dim == 13  # rot4 + scale3 + offset3 + normal3
    enc = PCEncoder(info)
    rng = np.random.RandomState(10)
    n = 48
    xyz = rng.randint(0, 16, (n, 3)).astype(np.float32)
    rgb = rng.rand(n, 3).astype(np.float32)
    feats = assemble_input_features(info, jnp.asarray(xyz), jnp.asarray(rgb))
    assert feats.shape == (n, 9)
    g = sparse.quantize_average(jnp.asarray(xyz), feats, capacity=n + 5)
    params = enc.init(jax.random.PRNGKey(1))
    plan = enc.build_plan(g)
    sp = enc.apply(params, g, plan)
    num = int(g.num)
    assert sp.sh.shape == (g.capacity, 13, 3)  # 1 DC + (2^(1+1))*3=12 AC rows
    assert np.all(np.asarray(sp.opacity) == 1.0)  # use_opacity=False
    norms = np.linalg.norm(np.asarray(sp.normal)[:num], axis=-1)
    np.testing.assert_allclose(norms, 1.0, atol=1e-5)
    # sh ac rows are zero (sh_feat_deg=0)
    np.testing.assert_array_equal(np.asarray(sp.sh[:, 1:, :]), 0)
    # primitives = voxel coords + offsets
    np.testing.assert_allclose(
        np.asarray(sp.primitives[:num]),
        np.asarray(sp.center_points[:num] + sp.offsets[:num]),
        rtol=1e-6,
    )


def test_plan_capacities_matches_bruteforce():
    rng = np.random.RandomState(7)
    coords = rng.randint(0, 1024, (20_000, 3)).astype(np.float32)
    caps = sparse.plan_capacities(coords, bucket=1)
    c = np.round(coords).astype(np.int64)
    for lvl in range(4):
        codes = (c[:, 0] << 20) | (c[:, 1] << 10) | c[:, 2]
        want = int(len(np.unique(codes)) * 1.05)
        assert caps[lvl] == want, (lvl, caps[lvl], want)
        c = c >> 1


def _rand_grid(n_pts, cap, cin, seed=0):
    rng = np.random.RandomState(seed)
    coords = rng.randint(0, 40, (n_pts, 3)).astype(np.float32)
    feats = rng.rand(n_pts, cin).astype(np.float32)
    return sparse.quantize_average(
        jnp.asarray(coords), jnp.asarray(feats), capacity=cap)


@pytest.mark.smoke
def test_conv_blocked_matches_global():
    """The blocked-window gather path == the global path (exact)."""
    rng = np.random.RandomState(1)
    grid = _rand_grid(3000, 2048, 8, seed=1)
    kmap = sparse.build_kernel_map(grid, 3)
    w = jnp.asarray(rng.rand(27, 8, 16).astype(np.float32) - 0.5)
    b = jnp.asarray(rng.rand(16).astype(np.float32))

    ref = sparse.conv(grid, kmap, w, b, block=None)
    md = int(sparse.kmap_max_delta(kmap))
    got = sparse.conv(grid, kmap, w, b, block=256, window=max(md, 64))
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-6)


def test_conv_multi_blocked_matches_global():
    rng = np.random.RandomState(2)
    grid = _rand_grid(2500, 2048, 8, seed=2)
    kmap = sparse.build_kernel_map(grid, 3)
    md = int(sparse.kmap_max_delta(kmap))
    f2 = jnp.asarray(rng.rand(grid.capacity, 4).astype(np.float32))
    w1 = jnp.asarray(rng.rand(27, 8, 8).astype(np.float32) - 0.5)
    w2 = jnp.asarray(rng.rand(27, 4, 12).astype(np.float32) - 0.5)
    b2 = jnp.asarray(rng.rand(12).astype(np.float32))

    ref = sparse.conv_multi(grid, kmap, [grid.feats, f2], [w1, w2],
                            [None, b2], block=None)
    got = sparse.conv_multi(grid, kmap, [grid.feats, f2], [w1, w2],
                            [None, b2], block=512, window=max(md, 64))
    for r, g in zip(ref, got):
        np.testing.assert_allclose(np.asarray(g), np.asarray(r),
                                   rtol=1e-5, atol=1e-6)


def test_lookup_merge_matches_lookup():
    rng = np.random.RandomState(3)
    grid = _rand_grid(1500, 1024, 2, seed=3)
    # queries: kernel-map style (each value <= 27 occurrences) + misses +
    # sentinels
    kq = sparse.build_kernel_map(grid, 3)  # uses lookup_merge internally
    coords = sparse.unpack_coords(grid.codes)
    offs = np.asarray(sparse._offsets_cube(3))
    nbr = np.asarray(coords)[:, None, :] + offs[None]
    in_r = np.all((nbr >= 0) & (nbr < 1024), axis=-1)
    q = np.where(
        in_r & np.asarray(grid.valid)[:, None],
        np.asarray(sparse.pack_coords(
            jnp.asarray(nbr.reshape(-1, 3)))).reshape(nbr.shape[:2]),
        sparse.SENTINEL,
    ).reshape(-1)
    i1, f1 = sparse.lookup(grid.codes, grid.num, jnp.asarray(q))
    i2, f2 = sparse.lookup_merge(grid.codes, grid.num, jnp.asarray(q))
    np.testing.assert_array_equal(np.asarray(i1), np.asarray(i2))
    np.testing.assert_array_equal(np.asarray(f1), np.asarray(f2))


def test_conv9_augmented_matches_conv():
    """9-gather augmented z-packed conv == 27-gather conv, including the
    orphan cases (center voxel absent, z+-1 present) that break naive
    z-packing."""
    rng = np.random.RandomState(4)
    grid = _rand_grid(3000, 2048, 8, seed=4)
    kmap = sparse.build_kernel_map(grid, 3)
    km9 = sparse.build_kernel_map9(grid)
    w = jnp.asarray(rng.rand(27, 8, 16).astype(np.float32) - 0.5)
    b = jnp.asarray(rng.rand(16).astype(np.float32))

    ref = sparse.conv(grid, kmap, w, b, block=None)
    got = sparse.conv9(grid, km9, w, b, block=None)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)

    # blocked path with a window covering max_delta
    md = int(km9["max_delta"])
    got_b = sparse.conv9(grid, km9, w, b, block=256, window=max(md, 64))
    np.testing.assert_allclose(np.asarray(got_b), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)

    # per-offset check catches any dz misrouting (each offset in isolation)
    for o in (0, 7, 13, 19, 26):
        w1 = np.zeros((27, 8, 1), np.float32)
        w1[o, :, 0] = np.linspace(0.5, 2.0, 8)
        r1 = sparse.conv(grid, kmap, jnp.asarray(w1), block=None)
        g1 = sparse.conv9(grid, km9, jnp.asarray(w1), block=None)
        np.testing.assert_allclose(np.asarray(g1), np.asarray(r1),
                                   rtol=1e-5, atol=1e-6, err_msg=str(o))


def test_conv9_multi_augmented_matches_conv_multi():
    rng = np.random.RandomState(5)
    grid = _rand_grid(2500, 2048, 8, seed=5)
    kmap = sparse.build_kernel_map(grid, 3)
    km9 = sparse.build_kernel_map9(grid)
    f2 = jnp.asarray(rng.rand(grid.capacity, 4).astype(np.float32))
    f2 = f2 * np.asarray(grid.valid)[:, None]
    w1 = jnp.asarray(rng.rand(27, 8, 8).astype(np.float32) - 0.5)
    w2 = jnp.asarray(rng.rand(27, 4, 12).astype(np.float32) - 0.5)
    b2 = jnp.asarray(rng.rand(12).astype(np.float32))

    ref = sparse.conv_multi(grid, kmap, [grid.feats, f2], [w1, w2],
                            [None, b2], block=None)
    got = sparse.conv9_multi(grid, km9, [grid.feats, f2], [w1, w2],
                             [None, b2], block=None)
    for r, g in zip(ref, got):
        np.testing.assert_allclose(np.asarray(g), np.asarray(r),
                                   rtol=1e-5, atol=1e-5)
