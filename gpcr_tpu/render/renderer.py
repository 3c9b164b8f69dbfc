"""Renderer orchestration — the reference L5 layer, TPU-first.

Equivalent surface to ``simple_raw_render.py``: ``PCMLRender`` (learned
splats from the PCEncoder, :167-545), ``SimpleRender`` (analytic no-network
baseline, :547-854), the OpenGL projection/raster-settings builders (:51-112)
and ``pcgc_rescale`` (:73-77).

TPU-first redesign vs the reference:
- the reference runs FOUR full rasterizer pipelines per view (world-xyz, rgb,
  hitmap, normal — each with its own preprocess + sort, :410-522). Here all
  outputs are extra feature channels of ONE pass: 12 channels
  [rgb 3 | xyz 3 | hit 3 | normal 3], sharing one preprocess + binning.
- the python-level per-view loop becomes ``lax.map`` over stacked view
  matrices inside one jit — no host round-trips between views.
- supersample + bilinear downscale (x2 then F.interpolate semantics,
  :281-284) is fused into the same jit.

Parity notes:
- raster settings use tanfov = tan(fov_deg), NOT tan(fov/2) — a reference
  quirk (:101-102) that changes the EWA focal; reproduced bit-for-bit.
- the projection matrix uses tan(fov/2) with znear=0.01, zfar=100 (:51-71).
- PCML scales are multiplied by sqrt(3)/scale_factor*6 (:248-249).
"""

from __future__ import annotations

import functools
import math
import time
import typing as T

import jax
import jax.numpy as jnp
import numpy as np

from ..models.encoder import PCEncoder, PCMLInfo, assemble_input_features
from ..ops import rasterize as R
from ..ops import sparse
from ..ops import sparse_zbrick as zbrick
from ..structures.camera import Camera
from ..structures.pointcloud import PointCloud
from ..structures.trajectory import CameraTrajectory
from ..utils import sh as sh_utils
from ..utils.timing import sync as _sync


# --------------------------------------------------------------------------
# camera -> raster parameters (simple_raw_render.py:51-112)
# --------------------------------------------------------------------------


def get_projection_matrix(znear, zfar, fovX, fovY):
    """OpenGL-style projection (simple_raw_render.py:51-71). fov in radians."""
    tanHalfY = math.tan(fovY / 2)
    tanHalfX = math.tan(fovX / 2)
    top = tanHalfY * znear
    right = tanHalfX * znear
    P = np.zeros((4, 4), np.float32)
    P[0, 0] = znear / right
    P[1, 1] = znear / top
    P[3, 2] = 1.0
    P[2, 2] = zfar / (zfar - znear)
    P[2, 3] = -(zfar * znear) / (zfar - znear)
    return jnp.asarray(P)


def get_rasterize_param_from_camera(
    camera: Camera, fov_deg: float, bg=None, sh_degree: int = 0,
    super_sample_rate: int = 2,
):
    """Build per-view raster settings arrays for ALL views of a (b=1, q)
    camera at once (vs the reference's per-view rebuild, :79-112).

    Returns dict of stacked arrays: view_t (q,4,4), full_t (q,4,4),
    campos (q,3), plus scalars.
    """
    H_w2c = camera.get_H_w2c()  # (b, q, 4, 4)
    b, q = H_w2c.shape[:2]
    view_t = jnp.swapaxes(H_w2c, -1, -2).reshape(b * q, 4, 4)
    fov = np.pi * fov_deg / 180.0
    proj_t = get_projection_matrix(0.01, 100.0, fov, fov).T
    full_t = jnp.matmul(view_t, proj_t[None], precision=jax.lax.Precision.HIGHEST)
    campos = camera.H_c2w[..., :3, 3].reshape(b * q, 3)
    if bg is None:
        bg = jnp.zeros((3,), jnp.float32)
    return {
        "view_t": view_t,
        "full_t": full_t,
        "campos": campos,
        "tanfov": math.tan(fov),  # reference quirk: tan(fov), not tan(fov/2)
        "bg": jnp.asarray(bg, jnp.float32),
        "height": camera.height_px * super_sample_rate,
        "width": camera.width_px * super_sample_rate,
        "sh_degree": sh_degree,
    }


def pcgc_rescale(input_xyz, offset=512, factor=256):
    """(xyz - offset) / factor (simple_raw_render.py:73-77)."""
    return (input_xyz - offset) / factor


def generate_cam(camera_info: dict, return_traj: bool = False):
    """Camera factory mirroring simple_raw_render.py:17-49."""
    defaults = {
        "min_r": 3, "max_r": 4, "max_angle": 30.0, "num_circle": 4,
        "r_freq": 1, "max_translate_ratio": 2.0, "local_max_angle": 3.0,
        "rand_r": 0.0,
    }
    traj = CameraTrajectory(
        mode=camera_info["mode"],
        n_imgs=camera_info["n_imgs"],
        total=1,
        rng_seed=0,
        params=camera_info if camera_info["mode"] != "udlrfb" else defaults,
    )
    cam = traj.get_camera(
        fov=camera_info["fov"],
        width_px=camera_info["width_px"],
        height_px=camera_info["height_px"],
    )
    return (cam, traj) if return_traj else cam


# --------------------------------------------------------------------------
# image resize (F.interpolate bilinear, align_corners=False)
# --------------------------------------------------------------------------


def bilinear_resize(img: jnp.ndarray, out_h: int, out_w: int) -> jnp.ndarray:
    """(…, H, W) -> (…, out_h, out_w), torch F.interpolate semantics
    (align_corners=False; simple_raw_render.py:281-284). For integer 2x
    downscale this reduces to 2x2 averaging."""
    h, w = img.shape[-2], img.shape[-1]
    if h == out_h and w == out_w:
        return img
    if h == 2 * out_h and w == 2 * out_w:
        x = img.reshape(*img.shape[:-2], out_h, 2, out_w, 2)
        return x.mean(axis=(-3, -1))

    def axis_weights(n_in, n_out):
        coords = (jnp.arange(n_out) + 0.5) * (n_in / n_out) - 0.5
        lo = jnp.clip(jnp.floor(coords), 0, n_in - 1)
        hi = jnp.clip(lo + 1, 0, n_in - 1)
        frac = jnp.clip(coords - lo, 0.0, 1.0)
        return lo.astype(jnp.int32), hi.astype(jnp.int32), frac

    ylo, yhi, fy = axis_weights(h, out_h)
    xlo, xhi, fx = axis_weights(w, out_w)
    top = img[..., ylo, :]
    bot = img[..., yhi, :]
    rows = top + (bot - top) * fy[..., :, None]
    left = rows[..., :, xlo]
    right = rows[..., :, xhi]
    return left + (right - left) * fx


# --------------------------------------------------------------------------
# fused multi-channel render core
# --------------------------------------------------------------------------


def fuse_view_features(campos, means3d, shs, normal, bg3, sh_degree,
                       with_normal):
    """Per-view fused feature assembly: [rgb | xyz | ones | (flipped
    normal)] — the four reference pipelines' payloads as channels of ONE
    pass (simple_raw_render.py:410-522). Returns (features, bg)."""
    rgb = sh_utils.eval_sh_color(sh_degree, shs, means3d, campos)
    feats = [rgb, means3d, jnp.ones_like(means3d)]
    bgs = [bg3, bg3, bg3]
    if with_normal:
        cam_dir = means3d - campos[None, :]
        sgn = (jnp.sum(cam_dir * normal, -1, keepdims=True) > 0).astype(
            jnp.float32
        ) * 2.0 - 1.0
        feats.append(normal * (-1.0) * sgn)  # camera-facing flip (:264-268)
        bgs.append(bg3)
    return jnp.concatenate(feats, axis=-1), jnp.concatenate(bgs, axis=-1)


def _render_one_view(
    view_t, full_t, campos,
    means3d, scales, rotations, opacity, shs, normal, valid,
    bg3, tanfov, height, width, sh_degree, config: R.RasterizeConfig,
    with_normal: bool, use_pallas: bool = False,
):
    """Render one view with all output channels fused into one pass."""
    features, bg = fuse_view_features(
        campos, means3d, shs, normal, bg3, sh_degree, with_normal
    )

    settings = R.GaussianRasterizationSettings(
        image_height=height, image_width=width, tanfovx=tanfov, tanfovy=tanfov,
        bg=bg, scale_modifier=1.0, viewmatrix=view_t, projmatrix=full_t,
        sh_degree=sh_degree, campos=campos,
    )
    if use_pallas:
        from . import _get_pallas_raster

        color, radii = _get_pallas_raster()(
            means3d, opacity, settings,
            scales=scales, rotations=rotations, colors_precomp=features,
            valid_mask=valid, config=config,
        )
    else:
        color, radii, extra = R.rasterize_gaussians(
            means3d, opacity, settings,
            scales=scales, rotations=rotations, colors_precomp=features,
            valid_mask=valid, config=config, return_extra=True,
        )
        return color, extra["dup_overflow"]
    return color, jnp.int32(0)  # (C, H_ss, W_ss), overflow


@functools.partial(
    jax.jit,
    static_argnames=(
        "height", "width", "out_h", "out_w", "sh_degree", "config",
        "with_normal", "use_pallas",
    ),
)
def render_views_fused(
    view_ts, full_ts, camposes,  # (q, 4, 4), (q, 4, 4), (q, 3)
    means3d, scales, rotations, opacity, shs, normal, valid,
    bg3, tanfov,
    height: int, width: int, out_h: int, out_w: int, sh_degree: int,
    config: R.RasterizeConfig, with_normal: bool, use_pallas: bool = False,
):
    """All views of one cloud in one jit: lax.map over view matrices, fused
    channels, supersample downscale. Returns dict of (q, out_h, out_w, 3)."""
    if (
        config.impl == "stream"
        and config.downscale == 1
        and height == 2 * out_h
        and width == 2 * out_w
        and config.tile_x % 2 == 0
        and config.tile_y % 2 == 0
    ):
        # fold the x2-supersampling downscale into the stream kernel's tile
        # write: saves the full-res (C, H, W) image materialization and the
        # separate resize pass
        config = config._replace(downscale=2)

    def one(args):
        vt, ft, cp = args
        return _render_one_view(
            vt, ft, cp, means3d, scales, rotations, opacity, shs, normal,
            valid, bg3, tanfov, height, width, sh_degree, config, with_normal,
            use_pallas,
        )

    if view_ts.shape[0] == 1:
        # single view: skip lax.map — its scan body serializes the binning
        # scatters (measured 2.5x slower than the direct graph)
        colors, overflow = one((view_ts[0], full_ts[0], camposes[0]))
        colors = colors[None]
        overflow = overflow[None]
    else:
        colors, overflow = jax.lax.map(
            one, (view_ts, full_ts, camposes))  # (q, C, H, W), (q,)
    colors = bilinear_resize(colors, out_h, out_w)
    out = {
        "rgb": colors[:, 0:3].transpose(0, 2, 3, 1),
        "xyz_w": colors[:, 3:6].transpose(0, 2, 3, 1),
        "hitmap": colors[:, 6:9].transpose(0, 2, 3, 1),
    }
    out["normal"] = (
        colors[:, 9:12].transpose(0, 2, 3, 1) if with_normal else None
    )
    # duplication-cap / k_budget overflow per view: non-zero means dropped
    # splat-tile entries (raise dup cap / k_budget); callers warn AFTER the
    # timed region so the check costs no sync
    out["dup_overflow"] = overflow
    return out


def apply_point_light(ret: dict, point_light: dict) -> jnp.ndarray:
    """Lambertian point-light composite (simple_raw_render.py:532-542)."""
    lighted = [ret["rgb"] * point_light["light_coeff"][0]]
    for i in range(len(point_light["xyz_w"])):
        light_dir = ret["xyz_w"] - jnp.asarray(point_light["xyz_w"][i])
        light_dir = light_dir / jnp.linalg.norm(light_dir, axis=-1, keepdims=True)
        cos_t = jnp.clip(
            jnp.sum(light_dir * ret["normal"], axis=-1, keepdims=True), 0.0
        )
        lighted.append(
            jnp.asarray(point_light["color"][i])
            * cos_t * ret["hitmap"] * ret["rgb"]
            * point_light["light_coeff"][i + 1]
        )
    return jnp.sum(jnp.stack(lighted, axis=0), axis=0)


def est_normal_from_ellipsoid(scale, rotation):
    """Normal = rotation of the min-scale axis (simple_raw_render.py:206-224;
    vectorized — the reference loops per point)."""
    q = rotation
    norm = jnp.linalg.norm(q, axis=-1, keepdims=True)
    from ..ops.splat import quat_to_rotmat

    Rm = quat_to_rotmat(q / jnp.maximum(norm, 1e-12))
    idx = jnp.argmin(scale, axis=-1)
    # rows of R^T = columns of R: normal_j = R[:, j]
    return jnp.take_along_axis(Rm, idx[:, None, None], axis=2)[..., 0]


def _make_sharded_runner(shard: str, shard_mesh=None):
    """A jitted drop-in for ``render_views_fused`` that renders over every
    local device (parallel.render.render_views_sharded). ``shard`` is
    'views' or 'tiles'; the mesh defaults to all devices on one axis."""
    from ..parallel.render import render_views_sharded
    from ..parallel.sharding import make_mesh

    mesh = shard_mesh or make_mesh(sp=len(jax.devices()))

    @functools.partial(
        jax.jit,
        static_argnames=("height", "width", "out_h", "out_w", "sh_degree",
                         "config", "with_normal"),
    )
    def run(view_ts, full_ts, camposes, means3d, scales, rotations, opacity,
            shs, normal, valid, bg3, tanfov, *, height, width, out_h, out_w,
            sh_degree, config, with_normal):
        return render_views_sharded(
            mesh, shard, view_ts, full_ts, camposes, means3d, scales,
            rotations, opacity, shs, normal, valid, bg3, tanfov,
            height=height, width=width, out_h=out_h, out_w=out_w,
            sh_degree=sh_degree, config=config, with_normal=with_normal,
        )

    return run


@functools.partial(jax.jit, static_argnames=("height", "width", "config"))
def _entry_counts_all_views(view_t, full_t, campos, means, scales,
                            rotations, opacity, valid, tanfov,
                            height, width, config):
    n = means.shape[0]

    def one(a):
        vt, ft, cp = a
        settings = R.GaussianRasterizationSettings(
            height, width, tanfov, tanfov, jnp.zeros(3), 1.0, vt, ft, 0, cp)
        prep = R.preprocess(means, opacity, settings, config,
                            scales=scales, rotations=rotations,
                            colors_precomp=jnp.zeros((n, 1)),
                            valid_mask=valid)
        return R.entry_count(prep, config)

    return jax.lax.map(one, (view_t, full_t, campos))


def _auto_k_budget(rp, means, scales, rotations, opacity, valid, config,
                   bucket=262_144):
    """Size k_budget to THIS scene+trajectory: the max per-view entry
    count (exact — same rects/validity the emit uses, ops/rasterize.py
    entry_count), rounded UP to a `bucket` multiple so the render graph
    recompiles at most once per 256K-entry size class (persistent-cached
    thereafter). The stream gather and the sort are linear in k_budget,
    so a blanket default (the old 7.5M) taxes every view of every scene
    that needs less; an exact-fit budget drops nothing by construction.
    One extra ~elementwise dispatch per cloud, outside the timed region.
    """
    c = _entry_counts_all_views(
        rp["view_t"], rp["full_t"], rp["campos"], means, scales, rotations,
        opacity, valid, jnp.asarray(rp["tanfov"]),
        height=rp["height"], width=rp["width"],
        config=config._replace(k_budget=None))
    c = int(np.asarray(c).max())
    return max(bucket, -(-c // bucket) * bucket)


def _sweep_k_budget(config, kb0, run_with, sweep, bucket=262_144):
    """Allocator-lottery sweep over k_budget (the round-5 root-cause
    finding, PERFORMANCE.md: the stream gather's speed is a DETERMINISTIC
    function of HBM buffer placement, i.e. of the k_budget size class —
    adjacent 256K size classes differ by up to ~2x gather rate). Times
    the REAL fused render graph at kb0 + i*bucket for i in [0, sweep]
    and returns the fastest budget. Every candidate run happens before
    the timed pass (the reference's own warmup convention,
    simple_raw_render.py:372-379); each costs one compile, served by the
    persistent XLA cache on every later run of the same config."""
    picks = []
    best, best_ms = kb0, None
    for i in range(sweep + 1):
        kb = kb0 + i * bucket
        cfg = config._replace(k_budget=kb)
        _sync(run_with(cfg))  # compile + warm
        t0 = time.time()
        _sync(run_with(cfg))
        ms = (time.time() - t0) * 1e3
        picks.append((kb, ms))
        if best_ms is None or ms < best_ms:
            best, best_ms = kb, ms
    print("# kb_sweep (ms/run): "
          + " ".join(f"{k}:{m:.0f}" for k, m in picks)
          + f" -> k_budget={best}", flush=True)
    return best


# --------------------------------------------------------------------------
# SimpleRender (simple_raw_render.py:547-854)
# --------------------------------------------------------------------------


class SimpleRender:
    """No-network analytic baseline: identity quaternions, isotropic
    σ/scale_factor scales, opacity 1, SH-DC = RGB2SH(rgb) with zero AC."""

    def __init__(self, voxelized=True, scale_factor=None, offset=512,
                 config: R.RasterizeConfig = R.RasterizeConfig(),
                 warm_timing: bool = False,
                 shard: T.Optional[str] = None, shard_mesh=None,
                 kb_sweep: int = 0):
        self.kb_sweep = kb_sweep
        self.voxelized = voxelized
        self.scale_factor = 1.0 if scale_factor is None else scale_factor
        self.offset = offset
        self.config = config
        # when True, the rgb pass runs once before the timed run (the
        # reference's xyz pass pre-warms its CUDA kernels the same way,
        # simple_raw_render.py:410-430; under XLA the first call compiles)
        self.warm_timing = warm_timing
        # 'views' | 'tiles': render over every local device via
        # parallel.render.render_views_sharded (CLI --shard)
        self.shard = shard
        self.shard_mesh = shard_mesh

    def render(
        self, pcd: PointCloud, scale, cam: Camera, fov: float,
        enable_opacity: bool = False, super_sample_rate: int = 2,
        input_offset=None, point_light=None, consistent_normal=False,
        est_normal_from_ellipsoid=False, background_color=0.0, sigma=1.0,
        timing: T.Optional[dict] = None,
    ) -> dict:
        if pcd.xyz_w.shape[0] > 1:
            # per-item loop over the batch (the reference chunks cameras per
            # batch item the same way, simple_raw_render.py:612-631)
            outs = [
                self.render(
                    pcd[ib], scale, cam[ib], fov,
                    enable_opacity=enable_opacity,
                    super_sample_rate=super_sample_rate,
                    input_offset=input_offset, point_light=point_light,
                    background_color=background_color, sigma=sigma,
                )
                for ib in range(pcd.xyz_w.shape[0])
            ]
            return {
                k: (jnp.concatenate([o[k] for o in outs], axis=0)
                    if outs[0][k] is not None else None)
                for k in outs[0]
            }
        in_off = (
            jnp.zeros((1, 3))
            if input_offset is None
            else jnp.asarray(input_offset, jnp.float32).reshape(1, 3)
        )
        xyz = pcd.xyz_w[0] + in_off
        rgb = pcd.rgb[0]
        valid = pcd.get_valid_mask()[0, :, 0]
        n = xyz.shape[0]

        t0 = time.time()
        sh_deg = 1
        scale_norm = self.scale_factor if self.voxelized else 1.0

        @functools.partial(jax.jit, static_argnames=("voxelized",))
        def _analytic_params(xyz, rgb, voxelized):
            pseudo = (2 ** (sh_deg + 1)) * 3  # 12 zero AC rows (:692-695)
            shs = jnp.concatenate(
                [sh_utils.RGB2SH(rgb)[:, None, :],
                 jnp.zeros((rgb.shape[0], pseudo, 3))], axis=1
            )
            means = (
                pcgc_rescale(xyz, self.offset, self.scale_factor)
                if voxelized else xyz
            )
            rotations = jnp.broadcast_to(
                jnp.array([1.0, 0, 0, 0]), (xyz.shape[0], 4)
            )
            scales = jnp.ones((xyz.shape[0], 3)) * (sigma / scale_norm)
            opacity = jnp.ones((xyz.shape[0],))
            return shs, means, rotations, scales, opacity

        shs, means, rotations, scales, opacity = _analytic_params(
            xyz, rgb, self.voxelized
        )
        _sync(opacity)
        model_time = time.time() - t0

        bg3 = jnp.zeros((3,)) + background_color
        rp = get_rasterize_param_from_camera(
            cam, fov, bg=bg3, sh_degree=sh_deg,
            super_sample_rate=super_sample_rate,
        )

        if self.shard and not hasattr(self, "_shard_runner"):
            self._shard_runner = _make_sharded_runner(
                self.shard, self.shard_mesh
            )
        fused = self._shard_runner if self.shard else render_views_fused

        config = self.config
        if config.k_budget == -1:  # auto: size to this scene+trajectory
            config = config._replace(k_budget=_auto_k_budget(
                rp, means, scales, rotations, opacity, valid, config))

        def _run_with(cfg):
            return fused(
                rp["view_t"], rp["full_t"], rp["campos"],
                means, scales, rotations, opacity, shs,
                jnp.zeros_like(means), valid, bg3, rp["tanfov"],
                height=rp["height"], width=rp["width"],
                out_h=cam.height_px, out_w=cam.width_px,
                sh_degree=sh_deg, config=cfg, with_normal=False,
            )

        if self.kb_sweep and config.k_budget:
            config = config._replace(k_budget=_sweep_k_budget(
                config, config.k_budget, _run_with, self.kb_sweep))
        _run = functools.partial(_run_with, config)

        if self.warm_timing:
            _sync(_run())  # compile + warm, excluded from the timing
        t0 = time.time()
        out = _run()
        _sync(out)
        rgb_time = time.time() - t0
        print(
            "model time: %.3f sec, rgb time: %.3f sec" % (model_time, rgb_time),
            flush=True,
        )
        if timing is not None:
            timing.update(model_time=model_time, rgb_time=rgb_time)

        ovf = int(np.asarray(out.pop("dup_overflow")).sum())
        if ovf:
            print(f"[Warn] rasterizer dropped {ovf} splat-tile entries "
                  f"(raise the dup cap / k_budget)", flush=True)
        ret = {k: (v[None] if v is not None else None) for k, v in out.items()}
        if point_light is not None and ret["normal"] is not None:
            ret["shaded"] = apply_point_light(
                {k: v[0] for k, v in ret.items() if v is not None}, point_light
            )[None]
        return ret


# --------------------------------------------------------------------------
# PCMLRender (simple_raw_render.py:167-545)
# --------------------------------------------------------------------------


def load_pcml(ckpt: str):
    """Load options.yaml + checkpoint params (simple_raw_render.py:114-130).

    Accepts either a reference-style torch .pth (converted on the fly) or a
    native .npz/.msgpack produced by this framework.
    """
    import os

    root = os.path.dirname(os.path.dirname(ckpt))
    opt_pth = os.path.join(root, "option", "options.yaml")
    import yaml

    with open(opt_pth) as f:
        info = yaml.safe_load(f)["pcml_info"]
    from .checkpoint import load_params

    params = load_params(ckpt, PCMLInfo.from_dict(info))
    print("Loaded weights.")
    return params, info


class PCMLRender:
    """Learned renderer: quantize -> PCEncoder -> fused 4-output raster."""

    def __init__(
        self, ckpt: T.Optional[str] = None, voxelized: bool = True,
        scale_factor: T.Optional[int] = None, offset: int = 512,
        info: T.Optional[dict] = None, params=None,
        config: R.RasterizeConfig = R.RasterizeConfig(),
        compute_dtype=None, warm_timing: bool = False,
        shard: T.Optional[str] = None, shard_mesh=None,
        kb_sweep: int = 0,
    ):
        self.shard = shard
        self.shard_mesh = shard_mesh
        # >0: try that many extra 256K k_budget size classes above the
        # auto-sized budget and keep the fastest (_sweep_k_budget)
        self.kb_sweep = kb_sweep
        if ckpt is not None:
            self.params, info = load_pcml(ckpt)
        else:
            assert info is not None
            self.params = params
        self.info = info if isinstance(info, PCMLInfo) else PCMLInfo.from_dict(info)
        self.model = PCEncoder(self.info, compute_dtype=compute_dtype)
        if self.params is None:
            self.params = self.model.init(jax.random.PRNGKey(0))
        self.voxelized = voxelized
        self.scale_factor = (
            self.info.scale_factor if scale_factor is None else scale_factor
        )
        self.offset = offset
        self.config = config
        self.warm_timing = warm_timing
        # jit caches keyed on the static capacity bucket (eager execution
        # on the axon platform round-trips the tunnel PER OP — an unjitted
        # plan costs ~12 s instead of ~0.4 s)
        self._plan_jits: dict = {}
        self._quant_jits: dict = {}
        self._apply_jit = jax.jit(self.model.apply)
        # geometry cache: MinkowskiEngine's coordinate manager caches kernel
        # maps per sparse tensor, so the reference's timed pass after warmup
        # re-runs only the network (simple_raw_render.py:372-379); caching
        # (grid, plan) per cloud matches that protocol
        self._geom_cache: dict = {}

    def encode(self, pcd: PointCloud, input_offset=None):
        """Quantize + run the network. Returns SplatParams (grid units)."""
        in_off = (
            jnp.zeros((1, 3))
            if input_offset is None
            else jnp.asarray(input_offset, jnp.float32).reshape(1, 3)
        )
        xyz = pcd.xyz_w[0]
        if self.voxelized:
            coords = xyz + in_off  # already a PCGC grid (:311-314)
        else:
            coords = xyz * self.scale_factor + self.offset + in_off  # (:316-317)
        rgb = pcd.rgb[0]
        valid = pcd.get_valid_mask()[0, :, 0]
        feats = assemble_input_features(self.info, coords, rgb, self.offset)

        off_np = np.asarray(in_off).reshape(3)
        # key on the offset only and verify cloud identity with a STRONG
        # reference (`is`): an id(pcd) key can collide after GC reuses the
        # address of a freed temporary (e.g. the batched path's pcd[ib]
        # slices), silently reusing another cloud's caps/plan
        geom_key = tuple(np.round(off_np, 6))
        cached = self._geom_cache.get(geom_key)
        if cached is not None and cached[0] is not pcd:
            cached = None
        if cached is None:
            # host-side capacity planning bounds every level's static
            # shapes; work on the host copy of the coordinates (pulling a
            # device array back costs a tunnel round-trip per MB)
            xyz_np = np.asarray(pcd.xyz_w[0])
            if self.voxelized:
                coords_np = xyz_np + off_np
            else:
                coords_np = xyz_np * self.scale_factor + self.offset + off_np
            coords_np = coords_np[np.asarray(valid)]
            vcaps = sparse.plan_capacities(coords_np)
            # brick capacities for the two finest levels: their kernel
            # maps are built FROM brick plans (~2x cheaper plan) even
            # when the convs themselves use the voxel engine
            bcaps = zbrick.plan_brick_capacities(coords_np, levels=2)
            caps = (vcaps, bcaps)
            if caps not in self._plan_jits:
                brick_capacity = {0: bcaps[0], 1: bcaps[1]}
                self._plan_jits[caps] = jax.jit(functools.partial(
                    self.model.build_plan, level_capacity=vcaps,
                    brick_capacity=brick_capacity))
        else:
            _, caps, _ = cached
            vcaps = caps[0]
        if vcaps[0] not in self._quant_jits:
            self._quant_jits[vcaps[0]] = jax.jit(functools.partial(
                sparse.quantize_average, capacity=vcaps[0]))
        grid = self._quant_jits[vcaps[0]](coords, feats, valid=valid)
        if cached is None:
            plan = self._plan_jits[caps](grid)
            # keep one cloud; storing pcd pins its id for the `is` check
            self._geom_cache = {geom_key: (pcd, caps, plan)}
        else:
            _, _, plan = cached
        # blocked-gather window check (one host sync per cloud): surface
        # clouds have neighbor-index distances far below the default
        # window; a pathological coordinate distribution must use the
        # global gather path instead of silently clamping. Each level is
        # validated against the window of the engine that runs its convs:
        # voxel-engine levels (kmap present) against sparse.GATHER_WINDOW,
        # brick-engine levels against zbrick.BRICK_WINDOW — note the
        # deployed brick gathers (bkmap9 + block_lo-anchored _to_dilated)
        # are currently GLOBAL at all test sizes (the _auto_block floor),
        # so the brick check guards only the opt-in windowed path.
        brick_lvls = set(getattr(self.model.unet, "brick_levels", ()) or ())
        for lvl, d in enumerate(plan["max_delta"]):
            win = (zbrick.BRICK_WINDOW if lvl in brick_lvls
                   else sparse.GATHER_WINDOW)
            if int(d) > win:
                raise ValueError(
                    f"level-{lvl} neighbor deviation {int(d)} exceeds the "
                    f"blocked-gather window ({win}); pass conv_block=None "
                    f"to PCEncoder for this cloud"
                )
        return self._apply_jit(self.params, grid, plan), grid, plan

    def render(
        self, pcd: PointCloud, scale, cam: Camera, fov: float,
        enable_opacity: bool = True, super_sample_rate: int = 2,
        input_offset=None, point_light=None, consistent_normal=False,
        est_normal_from_ellipsoid: bool = False, background_color=0.0,
        timing: T.Optional[dict] = None,
    ) -> dict:
        assert not consistent_normal
        if pcd.xyz_w.shape[0] > 1:
            outs = [
                self.render(
                    pcd[ib], scale, cam[ib], fov,
                    enable_opacity=enable_opacity,
                    super_sample_rate=super_sample_rate,
                    input_offset=input_offset, point_light=point_light,
                    est_normal_from_ellipsoid=est_normal_from_ellipsoid,
                    background_color=background_color,
                )
                for ib in range(pcd.xyz_w.shape[0])
            ]
            return {
                k: (jnp.concatenate([o[k] for o in outs], axis=0)
                    if outs[0][k] is not None else None)
                for k in outs[0]
            }

        # warmup then timed network pass (simple_raw_render.py:372-379)
        encode_fn = lambda: self.encode(pcd, input_offset)
        sp, grid, plan = encode_fn()
        _sync(sp)
        t0 = time.time()
        sp, grid, plan = encode_fn()
        _sync(sp)
        model_time = time.time() - t0

        means = pcgc_rescale(sp.primitives, self.offset, self.scale_factor)
        radius = float(np.sqrt(3) / self.scale_factor * 6)  # (:248-249)
        scales = sp.scale * radius
        opacity = (
            sp.opacity[:, 0]
            if (enable_opacity and self.info.enable_opacity)
            else jnp.ones_like(sp.opacity[:, 0])
        )
        if est_normal_from_ellipsoid:
            normal = globals()["est_normal_from_ellipsoid"](sp.scale, sp.rotation)
        else:
            normal = sp.normal
        with_normal = normal is not None
        if normal is None:
            normal = jnp.zeros_like(means)

        bg3 = jnp.zeros((3,)) + background_color
        rp = get_rasterize_param_from_camera(
            cam, fov, bg=bg3, sh_degree=self.info.sh_deg,
            super_sample_rate=super_sample_rate,
        )

        if self.shard and not hasattr(self, "_shard_runner"):
            self._shard_runner = _make_sharded_runner(
                self.shard, self.shard_mesh
            )
        fused = self._shard_runner if self.shard else render_views_fused

        config = self.config
        if config.k_budget == -1:  # auto: size to this scene+trajectory
            config = config._replace(k_budget=_auto_k_budget(
                rp, means, scales, sp.rotation, opacity, sp.valid, config))

        def _run_with(cfg):
            return fused(
                rp["view_t"], rp["full_t"], rp["campos"],
                means, scales, sp.rotation, opacity, sp.sh, normal,
                sp.valid, bg3, rp["tanfov"],
                height=rp["height"], width=rp["width"],
                out_h=cam.height_px, out_w=cam.width_px,
                sh_degree=self.info.sh_deg, config=cfg,
                with_normal=with_normal,
            )

        if self.kb_sweep and config.k_budget:
            config = config._replace(k_budget=_sweep_k_budget(
                config, config.k_budget, _run_with, self.kb_sweep))
        _run = functools.partial(_run_with, config)

        if self.warm_timing:
            _sync(_run())
        t0 = time.time()
        out = _run()
        _sync(out)
        rgb_time = time.time() - t0
        print(
            "model time: %.3f sec, rgb time: %.3f sec" % (model_time, rgb_time),
            flush=True,
        )
        if timing is not None:
            timing.update(model_time=model_time, rgb_time=rgb_time)

        ovf = int(np.asarray(out.pop("dup_overflow")).sum())
        if ovf:
            print(f"[Warn] rasterizer dropped {ovf} splat-tile entries "
                  f"(raise the dup cap / k_budget)", flush=True)
        ret = {k: (v[None] if v is not None else None) for k, v in out.items()}
        if point_light is not None and ret["normal"] is not None:
            ret["shaded"] = apply_point_light(
                {k: v[0] for k, v in ret.items() if v is not None}, point_light
            )[None]
        return ret


# keep the reference's class name importable too (simple_raw_render.py:167)
PCML_Render = PCMLRender
Simple_Render = SimpleRender
