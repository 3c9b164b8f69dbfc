"""Sparse U-Net in functional JAX on the voxel-hash conv engine.

Architecture mirror of the reference ``models/model_v2.py`` (InceptionResNet
:15-65, SparseUNet :67-226) on top of ``gpcr_tpu.ops.sparse`` instead of
MinkowskiEngine. Parameters are plain nested dicts whose keys mirror the
torch module names (conv0, down0, block0.0.conv0_0, up0, conv_0, ...) so the
torch->JAX checkpoint converter is a mechanical rename.

TPU-first choices:
- each resolution level's 27-neighborhood gather table (kernel map) is built
  ONCE and shared by every conv at that level (the reference rebuilds ME
  kernel maps internally; here it is explicit and cached);
- the up path restores the encoder's cached coordinate lists — the
  hash-grid equivalent of ME's generative transposed conv targeting
  ``coordinate_map_key`` (model_v2.py:212-220);
- all matmuls are dense (N, Cin) x (Cin, Cout) MXU ops; channel sizes come
  from the config string (deployed: '9 32 64 128 256 128', options.yaml:114).
"""

from __future__ import annotations

import typing as T

import jax
import jax.numpy as jnp

from ..ops import sparse
from ..ops import sparse_zbrick as zbrick


def _init_conv(key, kernel_volume: int, cin: int, cout: int):
    """Kaiming-uniform-ish init matching ME's default (std ~ sqrt(2/fan_in))."""
    fan_in = kernel_volume * cin
    std = (2.0 / fan_in) ** 0.5
    k1, _ = jax.random.split(key)
    kernel = jax.random.normal(k1, (kernel_volume, cin, cout), jnp.float32) * std
    return {"kernel": kernel, "bias": jnp.zeros((cout,), jnp.float32)}


def _relu(x):
    return jnp.maximum(x, 0.0)


class InceptionResNet:
    """Two-branch sparse residual block (model_v2.py:15-65):
    (3³→3³: ch→ch/4→ch/2) ∥ (1³→3³→1³: ch→ch/4→ch/4→ch/2), concat + skip."""

    def __init__(self, channels: int, compute_dtype=None,
                 conv_block: T.Optional[int] = sparse.GATHER_BLOCK):
        self.ch = channels
        self.compute_dtype = compute_dtype
        self.conv_block = conv_block

    def init(self, key):
        ks = jax.random.split(key, 5)
        c = self.ch
        return {
            "conv0_0": _init_conv(ks[0], 27, c, c // 4),
            "conv0_1": _init_conv(ks[1], 27, c // 4, c // 2),
            "conv1_0": _init_conv(ks[2], 1, c, c // 4),
            "conv1_1": _init_conv(ks[3], 27, c // 4, c // 4),
            "conv1_2": _init_conv(ks[4], 1, c // 4, c // 2),
        }

    def apply(self, params, grid: sparse.SparseGrid, kmap):
        cdt = self.compute_dtype

        def c3(p, g):
            return sparse.conv(g, kmap, p["kernel"], p["bias"],
                               compute_dtype=cdt, block=self.conv_block)

        def c1(p, feats, valid):
            if cdt is not None:
                feats = feats.astype(cdt)
                k = p["kernel"][0].astype(cdt)
            else:
                k = p["kernel"][0]
            out = jnp.dot(feats, k,
                          preferred_element_type=jnp.float32) + p["bias"]
            return out * valid[:, None]

        x = grid.feats
        # channel-packed gathers: conv0_0 (input x) and conv1_1 (input
        # relu(conv1_0(x)), a gather-free 1x1) share one neighbor gather —
        # the dominant conv cost is gather indices, not matmuls
        h1 = _relu(c1(params["conv1_0"], x, grid.valid))
        o00, o11 = sparse.conv_multi(
            grid, kmap, [x, h1],
            [params["conv0_0"]["kernel"], params["conv1_1"]["kernel"]],
            [params["conv0_0"]["bias"], params["conv1_1"]["bias"]],
            compute_dtype=cdt, block=self.conv_block,
        )
        out0 = c3(params["conv0_1"], grid.replace(feats=_relu(o00)))
        out1 = c1(params["conv1_2"], _relu(o11), grid.valid)
        return jnp.concatenate([out0, out1], axis=-1) + x

    def apply_brick(self, params, feats_b, bplan):
        """Same block on (Bcap, Z, C) z-brick features (exact parity —
        the 1x1 convs are plain occ-masked matmuls, the 3^3 convs run on
        the brick engine with the shared channel-packed gather)."""
        cdt = self.compute_dtype

        def c1(p, fb):
            k = p["kernel"][0] if cdt is None else p["kernel"][0].astype(cdt)
            f = fb if cdt is None else fb.astype(cdt)
            out = jnp.dot(f, k, preferred_element_type=jnp.float32)
            return (out + p["bias"]) * bplan.occ[:, :, None]

        bblock = None if self.conv_block is None else "auto"
        h1 = _relu(c1(params["conv1_0"], feats_b))
        o00, o11 = zbrick.brick_conv_multi(
            [feats_b, h1],
            [params["conv0_0"]["kernel"], params["conv1_1"]["kernel"]],
            [params["conv0_0"]["bias"], params["conv1_1"]["bias"]],
            bplan, compute_dtype=cdt, block=bblock,
        )
        out0 = zbrick.brick_conv(
            _relu(o00), params["conv0_1"]["kernel"],
            params["conv0_1"]["bias"], bplan, compute_dtype=cdt,
            block=bblock)
        out1 = c1(params["conv1_2"], _relu(o11))
        return jnp.concatenate([out0, out1], axis=-1) + feats_b


class SparseUNet:
    """3-level sparse U-Net (model_v2.py:67-226)."""

    def __init__(self, channels: T.Sequence[int] = (1, 16, 32, 64, 32, 8),
                 feat_dim: int = 32, block_layers: int = 3,
                 compute_dtype=None,
                 conv_block: T.Optional[int] = sparse.GATHER_BLOCK,
                 brick_levels: T.Sequence[int] = ()):
        self.channels = list(channels)
        self.feat_dim = feat_dim
        self.block_layers = block_layers
        self.compute_dtype = compute_dtype
        # levels whose stride-1 3^3 convs run on the z-brick engine
        # (ops/sparse_zbrick.py) when build_plan was given brick
        # capacities for them; the finest levels carry most of the conv
        # cost and fill (1,1,Z) bricks well
        self.brick_levels = tuple(brick_levels)
        # blocked-gather window size for every k3s1 conv; None = global
        # gathers (exact for any coordinate distribution — trainers whose
        # plans are built inside jit and therefore can't host-check
        # plan['max_delta'] <= sparse.GATHER_WINDOW should use None)
        self.conv_block = conv_block

    # ---- params -----------------------------------------------------------

    def init(self, key):
        c = self.channels
        ks = iter(jax.random.split(key, 64))

        def blocks(ch):
            return {
                str(i): InceptionResNet(ch).init(next(ks))
                for i in range(self.block_layers)
            }

        return {
            "conv0": _init_conv(next(ks), 27, c[0], c[1]),
            "down0": _init_conv(next(ks), 8, c[1], c[2]),
            "block0": blocks(c[2]),
            "conv1": _init_conv(next(ks), 27, c[2], c[2]),
            "down1": _init_conv(next(ks), 8, c[2], c[3]),
            "block1": blocks(c[3]),
            "conv2": _init_conv(next(ks), 27, c[3], c[3]),
            "down2": _init_conv(next(ks), 8, c[3], c[4]),
            "block2": blocks(c[4]),
            "conv3": _init_conv(next(ks), 27, c[4], c[5]),
            "up0": _init_conv(next(ks), 8, c[5], c[3]),
            "conv_0": _init_conv(next(ks), 27, c[3] * 2, c[3]),
            "block_0": blocks(c[3]),
            "up1": _init_conv(next(ks), 8, c[3], c[2]),
            "conv_1": _init_conv(next(ks), 27, c[2] * 2, c[2]),
            "block_1": blocks(c[2]),
            "up2": _init_conv(next(ks), 8, c[2], c[1]),
            "conv_2": _init_conv(next(ks), 27, c[1] * 2, c[1]),
            "block_2": blocks(c[1]),
            "conv_3": _init_conv(next(ks), 27, c[1], self.feat_dim),
        }

    # ---- plan: geometry-only precomputation --------------------------------

    def build_plan(self, grid: sparse.SparseGrid,
                   level_capacity: T.Optional[T.Sequence[int]] = None,
                   brick_capacity: T.Optional[dict] = None):
        """Precompute the coordinate hierarchy + gather tables for one input
        coordinate set. Reused across forward passes on the same cloud and
        shared by all convs (the ME coordinate-manager equivalent).

        ``brick_capacity``: {level: (bcap, dcap)} (host-planned via
        zbrick.plan_brick_capacities); brick plans are built for
        ``self.brick_levels`` levels present in it, and ``apply`` runs
        those levels' 3^3 convs on the z-brick engine."""
        if level_capacity is None:
            n = grid.capacity
            level_capacity = [n, n, max(n // 2, 1), max(n // 4, 1)]
        grids = [grid]
        downs = []  # (parent_slot, octant) per level transition
        g = grid
        for lvl in range(3):
            pgrid, parent_slot, octant = sparse.downsample_coords(
                g, capacity=level_capacity[lvl + 1]
            )
            downs.append((parent_slot, octant))
            grids.append(pgrid)
            g = pgrid
        # NOTE: the augmented z-packed 9-gather variant (sparse.conv9)
        # measured 2x SLOWER than the blocked 27-gather conv at the L0
        # shape (scripts/microbench_conv9.py: 148 vs 69 ms — the per-conv
        # augment scatter, 3C-wide rows, and the 2.3x-bigger gather table
        # eat the index savings), so the 27-offset kernel map stays.
        bricks = {}
        if brick_capacity:
            for lvl, (bcap, dcap) in brick_capacity.items():
                bricks[lvl] = zbrick.build_brick_plan(
                    grids[lvl], capacity=bcap, dilated_capacity=dcap)
        # Levels with a brick plan derive their 27-kernel map FROM it
        # (9 per-brick lookups + shifts — exact, and ~2x cheaper than
        # the 27 per-voxel merge-lookups that dominated plan time) —
        # unless the level also runs brick CONVS (self.brick_levels),
        # which need no voxel kmap at all.
        kmaps = [
            None if (lvl in bricks and lvl in self.brick_levels)
            else (zbrick.build_kernel_map_bricks(g, bricks[lvl])
                  if lvl in bricks else sparse.build_kernel_map(g, 3))
            for lvl, g in enumerate(grids)]
        return {"grids": grids, "downs": downs, "kmaps": kmaps,
                "bricks": bricks,
                "overflow": [g.num > g.capacity for g in grids],
                # blocked-gather safety: every conv's window (default
                # 16384) must cover the largest neighbor-index distance;
                # hosts check once per cloud (renderer.py does)
                "max_delta": [
                    sparse.kmap_max_delta(k) if k is not None
                    else zbrick.brick_max_delta(bricks[lvl])
                    for lvl, k in enumerate(kmaps)]}

    # ---- forward (model_v2.py:202-226) --------------------------------------

    def apply(self, params, grid: sparse.SparseGrid, plan) -> jnp.ndarray:
        """Forward pass. Levels with a brick plan carry their features as
        (Bcap, Z, C) z-bricks end-to-end within the level (one layout
        conversion at each level entry/exit); other levels use the direct
        voxel-gather conv. Both engines are exact, so any mix matches the
        reference bit-for-bit in f32."""
        grids, downs, kmaps = plan["grids"], plan["downs"], plan["kmaps"]
        # brick plans may exist purely for kernel-map construction; only
        # levels in self.brick_levels run their convs on the brick engine
        bricks = {lvl: bp for lvl, bp in plan.get("bricks", {}).items()
                  if lvl in self.brick_levels}

        cdt = self.compute_dtype

        # ---- level-native feature helpers (voxel (N,C) or brick (B,Z,C))
        def lv_in(feats_vox, lvl):
            if lvl in bricks:
                return zbrick.to_bricks(feats_vox, bricks[lvl])
            return feats_vox

        def lv_out(feats, lvl):
            if lvl in bricks:
                return zbrick.to_voxels(
                    feats, bricks[lvl], grids[lvl].capacity)
            return feats

        def conv3x(p, feats, lvl):
            if lvl in bricks:
                return zbrick.brick_conv(
                    feats, p["kernel"], p["bias"], bricks[lvl],
                    compute_dtype=cdt,
                    block=None if self.conv_block is None else "auto")
            return sparse.conv(
                grids[lvl].replace(feats=feats), kmaps[lvl], p["kernel"],
                p["bias"], compute_dtype=cdt, block=self.conv_block)

        def down(p, feats, lvl):
            parent_slot, octant = downs[lvl]
            return sparse.conv_down(
                grids[lvl].replace(feats=lv_out(feats, lvl)),
                grids[lvl + 1], parent_slot, octant, p["kernel"], p["bias"],
                compute_dtype=cdt,
            )

        def up(p, feats_coarse, lvl_coarse, lvl_fine):
            tgt = grids[lvl_fine]
            g_coarse = grids[lvl_coarse].replace(
                feats=lv_out(feats_coarse, lvl_coarse))
            return sparse.conv_up_generative(
                g_coarse, tgt.codes, tgt.num, tgt.stride, p["kernel"],
                p["bias"], compute_dtype=cdt,
            )

        def run_blocks(bparams, feats, lvl):
            # identical-shape blocks run under one lax.scan with stacked
            # params: traces ONE block instead of block_layers of them
            # (the unrolled version costs minutes of XLA compile at 800K)
            ch = feats.shape[-1]
            block = InceptionResNet(ch, cdt, self.conv_block)
            stacked = jax.tree_util.tree_map(
                lambda *xs: jnp.stack(xs),
                *[bparams[str(i)] for i in range(self.block_layers)],
            )

            if lvl in bricks:
                def body(f, p):
                    return block.apply_brick(p, f, bricks[lvl]), None
            else:
                g = grids[lvl]

                def body(f, p):
                    return block.apply(
                        p, g.replace(feats=f), kmaps[lvl]), None

            feats, _ = jax.lax.scan(body, feats, stacked)
            return feats

        f0 = lv_in(grid.feats, 0)
        out_x = _relu(conv3x(params["conv0"], f0, 0))

        f1 = lv_in(_relu(down(params["down0"], out_x, 0)), 1)
        f1 = run_blocks(params["block0"], f1, 1)

        h = _relu(conv3x(params["conv1"], f1, 1))
        f2 = lv_in(_relu(down(params["down1"], h, 1)), 2)
        f2 = run_blocks(params["block1"], f2, 2)

        h = _relu(conv3x(params["conv2"], f2, 2))
        f3 = lv_in(_relu(down(params["down2"], h, 2)), 3)
        f3 = run_blocks(params["block2"], f3, 3)
        f3 = conv3x(params["conv3"], f3, 3)

        u2 = lv_in(_relu(up(params["up0"], f3, 3, 2)), 2)
        f2d = jnp.concatenate([u2, f2], axis=-1)
        f2d = _relu(conv3x(params["conv_0"], f2d, 2))
        f2d = run_blocks(params["block_0"], f2d, 2)

        u1 = lv_in(_relu(up(params["up1"], f2d, 2, 1)), 1)
        f1d = jnp.concatenate([u1, f1], axis=-1)
        f1d = _relu(conv3x(params["conv_1"], f1d, 1))
        f1d = run_blocks(params["block_1"], f1d, 1)

        u0 = lv_in(_relu(up(params["up2"], f1d, 1, 0)), 0)
        f0d = jnp.concatenate([u0, out_x], axis=-1)
        f0d = _relu(conv3x(params["conv_2"], f0d, 0))
        f0d = run_blocks(params["block_2"], f0d, 0)

        return lv_out(conv3x(params["conv_3"], f0d, 0), 0)
