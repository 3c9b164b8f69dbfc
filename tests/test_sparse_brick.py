"""Dense-brick conv vs the gather-GEMM engine."""

import jax
import jax.numpy as jnp
import numpy as np

from gpcr_tpu.ops import sparse
from gpcr_tpu.ops import sparse_brick as SB


def make_grid(n=400, extent=24, cin=8, seed=0):
    rng = np.random.RandomState(seed)
    coords = np.unique(rng.randint(0, extent, (n, 3)), axis=0)
    feats = rng.randn(len(coords), cin).astype(np.float32)
    g = sparse.quantize_average(
        jnp.asarray(coords, jnp.float32), jnp.asarray(feats),
        capacity=len(coords) + 9,
    )
    return g


def test_brick_grid_structure():
    g = make_grid()
    bg = SB.build_brick_grid(g)
    num_b = int(bg.num)
    assert num_b > 0
    # every valid voxel lands in a valid brick at its own coordinates
    coords = np.asarray(sparse.unpack_coords(g.codes))
    valid = np.asarray(g.valid)
    vb = np.asarray(bg.voxel_brick)
    vc = np.asarray(bg.voxel_cell)
    bcodes = np.asarray(bg.brick_codes)
    occ = np.asarray(bg.occ).reshape(bg.capacity, -1)
    feats = np.asarray(bg.feats).reshape(bg.capacity, 64, -1)
    gfeats = np.asarray(g.feats)
    for i in np.where(valid)[0]:
        bcoord = coords[i] >> 2
        code = int((bcoord[0] << 20) | (bcoord[1] << 10) | bcoord[2])
        assert bcodes[vb[i]] == code
        assert occ[vb[i], vc[i]]
        np.testing.assert_allclose(feats[vb[i], vc[i]], gfeats[i])


def test_conv_brick_matches_gather_gemm():
    g = make_grid(n=500, extent=20, cin=8, seed=3)
    kmap = sparse.build_kernel_map(g, 3)
    rng = np.random.RandomState(4)
    w = jnp.asarray(rng.randn(27, 8, 16).astype(np.float32) * 0.2)
    b = jnp.asarray(rng.randn(16).astype(np.float32))

    ref = np.asarray(sparse.conv(g, kmap, w, b))  # (Nmax, 16)

    bg = SB.build_brick_grid(g)
    dense_out = SB.conv_brick(bg, w, b)
    got = np.asarray(SB.brick_to_voxels(bg, dense_out, g.capacity))

    valid = np.asarray(g.valid)
    np.testing.assert_allclose(got[valid], ref[valid], rtol=1e-4, atol=1e-4)
    np.testing.assert_array_equal(got[~valid], 0)


def test_conv_brick_chain():
    """Two chained convs on the same brick grid (feats_dense reuse)."""
    g = make_grid(n=300, extent=16, cin=8, seed=5)
    kmap = sparse.build_kernel_map(g, 3)
    rng = np.random.RandomState(6)
    w1 = jnp.asarray(rng.randn(27, 8, 8).astype(np.float32) * 0.2)
    w2 = jnp.asarray(rng.randn(27, 8, 8).astype(np.float32) * 0.2)

    h_ref = jnp.maximum(sparse.conv(g, kmap, w1), 0.0)
    ref = np.asarray(sparse.conv(g.replace(feats=h_ref), kmap, w2))

    bg = SB.build_brick_grid(g)
    h = jnp.maximum(SB.conv_brick(bg, w1), 0.0)
    out = SB.conv_brick(bg, w2, feats_dense=h)
    got = np.asarray(SB.brick_to_voxels(bg, out, g.capacity))
    valid = np.asarray(g.valid)
    np.testing.assert_allclose(got[valid], ref[valid], rtol=1e-4, atol=1e-4)
