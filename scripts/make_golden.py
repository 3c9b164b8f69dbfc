"""Generate golden-frame fixtures with the numpy oracle.

The oracle (tests/oracle.py) IS the reference CUDA forward semantics
(forward.cu / rasterizer_impl.cu re-derived as sequential numpy); these
fixtures pin the full benchmark-resolution pipeline — analytic Simple-path
splat parameters, x2 supersampling, background compositing, bilinear
downscale, and the save_pic uint8 conventions — so any numeric drift in the
TPU/XLA/Pallas paths fails tests/test_golden.py's 0.05 dB budget.

Writes to tests/golden/: pcd_0.ply (the scene), rgb_<i>.png (12-view 512²
circle), manifest.json (scene + camera params, per-frame PSNR-proof hashes).

Run once on CPU:  python scripts/make_golden.py   (~2-4 min, mp over views)
"""

import hashlib
import json
import multiprocessing as mp
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(
    0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                    "tests"),
)

import numpy as np

N_POINTS = 100_000
RES = 512
SSRATE = 2
FOV = 45.0
SF = 448
N_VIEWS = 12
SIGMA = 1.0
SEED = 0
OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "tests", "golden")


def make_scene():
    """The bench.py synthetic THuman-like cloud at N_POINTS (seeded)."""
    rng = np.random.RandomState(SEED)
    v = rng.randn(N_POINTS, 3)
    v /= np.linalg.norm(v, axis=1, keepdims=True)
    v[:, 1] *= 1.6
    v *= 0.55
    xyz_world = v + rng.randn(N_POINTS, 3) * 0.01
    rgb = rng.rand(N_POINTS, 3).astype(np.float32)
    coords = (xyz_world * SF + 512).astype(np.float32)
    return coords, rgb


def one_view(task):
    import oracle

    (view_t, full_t, tanfov, means, feats, scales, rots, ops, hw) = task
    out, _, _ = oracle.rasterize_oracle_fast(
        means, scales, rots, ops, feats,
        view_t, full_t, hw, hw, tanfov, tanfov,
        np.ones(3, np.float32),
    )
    return out


def main():
    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from gpcr_tpu.io.image import save_pic, to_uint8
    from gpcr_tpu.io.ply import write_ply
    from gpcr_tpu.render.renderer import (
        bilinear_resize, get_rasterize_param_from_camera, pcgc_rescale,
    )
    from gpcr_tpu.structures.trajectory import CameraTrajectory
    from gpcr_tpu.utils import sh as sh_utils

    os.makedirs(OUT, exist_ok=True)
    coords, rgb = make_scene()
    write_ply(os.path.join(OUT, "pcd_0.ply"), coords, rgb)

    traj = CameraTrajectory(
        mode="circle", n_imgs=N_VIEWS, total=1,
        params={"d": 0, "r": 3, "center_angles": [90, 0]},
    )
    cam = traj.get_camera(fov=FOV, width_px=RES, height_px=RES)
    rp = get_rasterize_param_from_camera(
        cam, FOV, bg=jnp.ones(3), sh_degree=1, super_sample_rate=SSRATE,
    )

    # the SimpleRender analytic path: colors = eval_sh(deg1, RGB2SH DC + 0 AC)
    # == clamp(rgb, 0) == rgb; identity quats; isotropic sigma/sf
    means = np.asarray(pcgc_rescale(jnp.asarray(coords), 512, SF), np.float32)
    feats = np.asarray(
        sh_utils.eval_sh_color(
            1,
            jnp.concatenate(
                [sh_utils.RGB2SH(jnp.asarray(rgb))[:, None, :],
                 jnp.zeros((N_POINTS, 12, 3))], axis=1,
            ),
            jnp.asarray(means), rp["campos"][0],
        ),
        np.float32,
    )
    scales = np.full((N_POINTS, 3), SIGMA / SF, np.float32)
    rots = np.tile(np.array([1, 0, 0, 0], np.float32), (N_POINTS, 1))
    ops = np.ones(N_POINTS, np.float32)
    hw = RES * SSRATE

    tasks = [
        (np.asarray(rp["view_t"][i], np.float32),
         np.asarray(rp["full_t"][i], np.float32),
         float(rp["tanfov"]), means, feats, scales, rots, ops, hw)
        for i in range(N_VIEWS)
    ]
    with mp.get_context("forkserver").Pool(min(N_VIEWS, 12)) as pool:
        outs = pool.map(one_view, tasks)

    hashes = []
    frames = []
    for out in outs:
        img = np.asarray(
            bilinear_resize(jnp.asarray(out[None]), RES, RES)
        )  # (1, 3, RES, RES)
        frame = img[0].transpose(1, 2, 0)  # (H, W, 3)
        frames.append(frame)
        hashes.append(
            hashlib.sha256(to_uint8(frame[None, None]).tobytes()).hexdigest()
        )
    save_pic(np.stack(frames)[None], OUT, type="rgb", suffix="")

    manifest = {
        "n_points": N_POINTS, "res": RES, "ssrate": SSRATE, "fov": FOV,
        "scale_factor": SF, "n_views": N_VIEWS, "sigma": SIGMA, "seed": SEED,
        "bg": 1.0, "sh_degree": 1,
        "camera": {"mode": "circle", "n_imgs": N_VIEWS,
                   "params": {"d": 0, "r": 3, "center_angles": [90, 0]}},
        "sha256_uint8": hashes,
    }
    with open(os.path.join(OUT, "manifest.json"), "w") as f:
        json.dump(manifest, f, indent=1)
    print("golden fixtures written to", OUT)


if __name__ == "__main__":
    main()
