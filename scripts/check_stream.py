"""Quick parity check: stream kernel (interpret) vs exact XLA rasterizer."""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import jax.numpy as jnp

from gpcr_tpu.ops import rasterize as R
from gpcr_tpu.ops.rasterize_stream import rasterize_gaussians_stream

rng = np.random.RandomState(0)
n = 500
means = jnp.asarray(rng.randn(n, 3) * 0.3 + np.array([0, 0, 2.5]), jnp.float32)
scales = jnp.asarray(rng.rand(n, 3) * 0.05 + 0.01, jnp.float32)
rots = jnp.asarray(rng.randn(n, 4), jnp.float32)
op = jnp.asarray(rng.rand(n), jnp.float32)
feats = jnp.asarray(rng.rand(n, 12), jnp.float32)
valid = jnp.asarray(rng.rand(n) > 0.1)

view = jnp.eye(4)
znear, zfar = 0.01, 100.0
P = np.zeros((4, 4), np.float32)
P[0, 0] = 1.0
P[1, 1] = 1.0
P[3, 2] = 1.0
P[2, 2] = zfar / (zfar - znear)
P[2, 3] = -(zfar * znear) / (zfar - znear)
full = (np.eye(4) @ P.T).astype(np.float32)

settings = R.GaussianRasterizationSettings(
    image_height=64, image_width=64, tanfovx=1.0, tanfovy=1.0,
    bg=jnp.full((12,), 0.7), scale_modifier=1.0,
    viewmatrix=view, projmatrix=jnp.asarray(full), sh_degree=0,
    campos=jnp.zeros(3),
)
for kb, mat in [(None, None), (8192, 12), (None, 16)]:
    config = R.RasterizeConfig(
        max_dup_per_gaussian=16, chunk_size=64, k_budget=kb,
        max_active_tiles=mat,
    )
    ref, radii_ref = R.rasterize_gaussians(
        means, op, settings, scales=scales, rotations=rots,
        colors_precomp=feats, valid_mask=valid, config=config,
    )
    out, radii, extra = rasterize_gaussians_stream(
        means, op, settings, scales=scales, rotations=rots,
        colors_precomp=feats, valid_mask=valid, config=config,
        interpret=True, return_extra=True,
    )
    err = float(jnp.max(jnp.abs(out - ref)))
    print(f"kb={kb} max_active={mat}: max_err={err:.2e} "
          f"overflow={int(extra['dup_overflow'])} "
          f"radii_match={bool(jnp.all(radii == radii_ref))}")
    if mat is None:
        assert err < 1e-5, err

# fused 2x2 downscale vs full-res render + 2x2 mean
config = R.RasterizeConfig(max_dup_per_gaussian=16, chunk_size=64,
                           downscale=2)
ref_full, _ = R.rasterize_gaussians(
    means, op, settings, scales=scales, rotations=rots,
    colors_precomp=feats, valid_mask=valid,
    config=config._replace(downscale=1),
)
ref_ds = ref_full.reshape(12, 32, 2, 32, 2).mean(axis=(2, 4))
out_ds, _, extra = rasterize_gaussians_stream(
    means, op, settings, scales=scales, rotations=rots,
    colors_precomp=feats, valid_mask=valid, config=config,
    interpret=True, return_extra=True,
)
err = float(jnp.max(jnp.abs(out_ds - ref_ds)))
print(f"downscale=2: out={out_ds.shape} max_err={err:.2e}")
assert out_ds.shape == (12, 32, 32), out_ds.shape
assert err < 1e-5, err
assert extra["final_T"].shape == (32, 32)
print("OK")
