"""PCEncoder — the splat-parameter prediction head.

Mirror of the reference ``PCEncoder`` (models/model_v2.py:238-375): runs the
SparseUNet over a quantized colored voxel grid and splits the output features
into per-point Gaussian parameters with the exact activation scheme:

- rotation = feat[:, 0:4] + identity quaternion [1,0,0,0]   (:292-295)
- scale    = clamp(feat + 1, min=0)                         (:301-308)
- opacity  = clamp(feat, 0, 1)                              (:313-319)
- offset   = feat (added to voxel centers)                  (:325-329,369-374)
- SH DC    = RGB2SH(input rgb last 3 channels) [+ learned dc_offset] (:330-337)
- normal   = feat, optionally L2-normalized                 (:339-347)
- SH AC    = learned (sh_feat_deg>0) or zeros, (2^(deg+1)) rows (:350-367)

Flags come from the checkpoint's ``pcml_info`` dict (options.yaml:113-152).
Instead of the reference's per-batch-item python lists, everything is a
padded (Nmax, ·) array with a validity mask — vmap over batch works.
"""

from __future__ import annotations

import dataclasses
import typing as T

import jax.numpy as jnp

from ..ops import sparse
from ..utils.sh import RGB2SH
from .unet import SparseUNet


@dataclasses.dataclass(frozen=True)
class PCMLInfo:
    """Typed view of the pcml_info config dict (options.yaml:113-152)."""

    clr_encoder_channels: str = "9 32 64 128 256 128"
    sh_deg: int = 1
    sh_feat_deg: int = 0
    use_rotation: bool = True
    use_scale: bool = True
    use_offset: bool = True
    use_dc_offset: bool = False
    use_opacity: bool = False
    est_normal: bool = True
    normalize_normal: bool = True
    enable_opacity: bool = True
    scale_factor: int = 256
    model_type: str = "unet"
    normalize_camera_normal: bool = True

    @staticmethod
    def from_dict(d: dict) -> "PCMLInfo":
        names = {f.name for f in dataclasses.fields(PCMLInfo)}
        return PCMLInfo(**{k: v for k, v in d.items() if k in names})

    @property
    def channels(self) -> T.List[int]:
        return [int(x) for x in self.clr_encoder_channels.split(" ")]

    @property
    def in_dim(self) -> int:
        return self.channels[0]

    @property
    def feat_dim(self) -> int:
        """(model_v2.py:247-262)"""
        d = 0
        if self.use_rotation:
            d += 4
        if self.use_scale:
            d += 3
        if self.use_offset:
            d += 3
        if self.use_dc_offset:
            d += 3
        if self.use_opacity:
            d += 1
        if self.est_normal:
            d += 3
        if self.sh_feat_deg > 0:
            d += (2 ** (self.sh_feat_deg + 1)) * 3
        return d


class SplatParams(T.NamedTuple):
    """Per-point Gaussian splat parameters (the reference's 12-tuple return,
    model_v2.py:375, minus the always-zero bpp slots)."""

    primitives: jnp.ndarray  # (Nmax, 3) voxel coords + offset (grid units)
    sh: jnp.ndarray  # (Nmax, K, 3)
    rotation: jnp.ndarray  # (Nmax, 4)
    scale: jnp.ndarray  # (Nmax, 3)
    opacity: jnp.ndarray  # (Nmax, 1)
    center_points: jnp.ndarray  # (Nmax, 3) voxel coords (pre-offset)
    offsets: T.Optional[jnp.ndarray]  # (Nmax, 3)
    normal: T.Optional[jnp.ndarray]  # (Nmax, 3)
    valid: jnp.ndarray  # (Nmax,)


class PCEncoder:
    """(model_v2.py:238-375)"""

    def __init__(self, info: T.Union[dict, PCMLInfo], compute_dtype=None,
                 conv_block: T.Optional[int] = sparse.GATHER_BLOCK,
                 brick_levels: T.Sequence[int] = ()):
        # brick_levels: opt-in z-brick conv engine per level
        # (ops/sparse_zbrick.py). Exact and fully tested, but measured
        # SLOWER than the direct voxel gather conv on this TPU stack
        # (apply 2.9 s vs 1.0 s at the 800K deployed config) — see
        # PERFORMANCE.md "z-brick negative result"; default stays voxel.
        self.info = info if isinstance(info, PCMLInfo) else PCMLInfo.from_dict(info)
        if self.info.model_type != "unet":
            raise NotImplementedError(
                f"Model type {self.info.model_type} not implemented!"
            )
        self.unet = SparseUNet(self.info.channels, self.info.feat_dim,
                               compute_dtype=compute_dtype,
                               conv_block=conv_block,
                               brick_levels=brick_levels)

    def init(self, key):
        return {"color_encoder": self.unet.init(key)}

    def build_plan(self, grid: sparse.SparseGrid, level_capacity=None,
                   brick_capacity=None):
        """``brick_capacity``: {level: (bcap, dcap)} enables the z-brick
        conv engine at those levels (see SparseUNet.build_plan); without
        it every level uses the direct voxel-gather conv."""
        return self.unet.build_plan(grid, level_capacity, brick_capacity)

    def apply(self, params, grid: sparse.SparseGrid, plan) -> SplatParams:
        """grid.feats layout matches the reference input assembly: the LAST
        3 channels are rgb (model_v2.py:284-288)."""
        info = self.info
        feat = self.unet.apply(params["color_encoder"], grid, plan)  # (N, F)
        rgb_in = grid.feats[:, -3:]
        n = feat.shape[0]
        used = 0

        if info.use_rotation:
            rot = feat[:, 0:4] + jnp.array([1.0, 0.0, 0.0, 0.0])
            used += 4
        else:
            rot = jnp.broadcast_to(jnp.array([1.0, 0.0, 0.0, 0.0]), (n, 4))
        if info.use_scale:
            scale = jnp.maximum(feat[:, used : used + 3] + 1.0, 0.0)
            used += 3
        else:
            scale = jnp.ones((n, 3), jnp.float32)
        if info.use_opacity:
            opacity = jnp.clip(feat[:, used : used + 1], 0.0, 1.0)
            used += 1
        else:
            opacity = jnp.ones((n, 1), jnp.float32)
        if info.use_offset:
            offsets = feat[:, used : used + 3]
            used += 3
        else:
            offsets = None
        if info.use_dc_offset:
            sh_dc = (feat[:, used : used + 3] + RGB2SH(rgb_in))[:, None, :]
            used += 3
        else:
            sh_dc = RGB2SH(rgb_in)[:, None, :]
        if info.est_normal:
            normal = feat[:, used : used + 3]
            used += 3
            if info.normalize_normal:
                # grad-safe normalize: padding rows are exactly zero, and
                # d||n||/dn at n=0 is NaN even under maximum() (both
                # branches are differentiated) — the double-where keeps
                # sqrt away from 0 so training gradients stay finite
                norm2 = jnp.sum(normal**2, axis=-1, keepdims=True)
                safe = jnp.sqrt(jnp.where(norm2 > 0, norm2, 1.0))
                normal = jnp.where(norm2 > 0, normal / safe, 0.0)
        else:
            normal = None

        if info.sh_deg > 0 and info.sh_feat_deg > 0:
            sh_ac = feat[:, used:].reshape(n, -1, 3)
            sh = jnp.concatenate([sh_dc, sh_ac], axis=1)
        elif info.sh_deg > 0 and info.sh_feat_deg == 0:
            pseudo = (2 ** (info.sh_deg + 1)) * 3  # (model_v2.py:359)
            sh = jnp.concatenate([sh_dc, jnp.zeros((n, pseudo, 3))], axis=1)
        else:
            sh = sh_dc

        center = grid.coords().astype(jnp.float32) * grid.stride
        primitives = center + offsets if info.use_offset else center

        return SplatParams(
            primitives=primitives,
            sh=sh,
            rotation=rot,
            scale=scale,
            opacity=opacity,
            center_points=center,
            offsets=offsets,
            normal=normal,
            valid=grid.valid,
        )


def assemble_input_features(
    info: PCMLInfo,
    xyz_grid: jnp.ndarray,  # (N, 3) float, already in grid units (pre-round)
    rgb: jnp.ndarray,  # (N, 3)
    offset: float = 512.0,
):
    """Feature assembly by in_dim (simple_raw_render.py:294-370):
    3 -> [rgb]; 6 -> [quantize-offset, rgb];
    9 -> [(xyz - offset)/scale_factor, quantize-offset, rgb]."""
    qoff = xyz_grid - jnp.round(xyz_grid)
    if info.in_dim == 3:
        return rgb
    if info.in_dim == 6:
        return jnp.concatenate([qoff, rgb], axis=-1)
    if info.in_dim == 9:
        world = (xyz_grid - offset) / info.scale_factor
        return jnp.concatenate([world, qoff, rgb], axis=-1)
    raise NotImplementedError(f"in_dim={info.in_dim}")
