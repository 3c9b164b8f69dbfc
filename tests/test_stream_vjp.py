"""custom_vjp stream backward vs the XLA autodiff path (interpret mode).

The XLA differentiable rasterizer (ops/rasterize.py, FD-verified in
test_rasterize.py) is the in-repo gradient oracle; the replay-kernel
backward (ops/rasterize_stream_vjp.py) must match it on scenes without
chunk truncation. Mirrors the reference's backward.cu semantics
(diff-gaussian-rasterization/cuda_rasterizer/backward.cu:399-557).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gpcr_tpu.ops import rasterize as R
from gpcr_tpu.ops import rasterize_stream_vjp as V

from test_rasterize import make_camera_matrices, random_scene


def _settings(W, H, bg):
    view_t, full_t, tanfov, campos = make_camera_matrices(
        [0.0, 0.0, -2.5], W, H)
    return R.GaussianRasterizationSettings(
        image_height=H, image_width=W, tanfovx=tanfov, tanfovy=tanfov,
        bg=jnp.asarray(bg), scale_modifier=1.0, viewmatrix=view_t,
        projmatrix=full_t, sh_degree=0, campos=campos,
    )


def _loss_of(render):
    wmat = None

    def loss(m, s, q, o, f, bg_settings):
        color, _ = render(m, s, q, o, f, bg_settings)
        # non-uniform weighting so dL/dout varies per pixel/channel
        w = (jnp.arange(color.size).reshape(color.shape) % 7
             ).astype(jnp.float32) / 7.0
        return jnp.sum(color * (0.5 + w))

    return loss


@pytest.mark.parametrize("n,wh,seed", [(60, 32, 1), (150, 48, 2)])
def test_vjp_matches_xla_autodiff(n, wh, seed):
    W = H = wh
    means, scales, rots, ops, feats = random_scene(n, seed=seed)
    bg = np.array([0.15, 0.25, 0.35], np.float32)
    settings = _settings(W, H, bg)

    cfg_x = R.RasterizeConfig(
        tile_x=16, tile_y=16, max_dup_per_gaussian=9, chunk_size=8,
        differentiable=True, max_chunks=64,
    )
    cfg_v = cfg_x._replace(tiles_per_step=2)

    def render_xla(m, s, q, o, f, st):
        return R.rasterize_gaussians(
            m, o, st, scales=s, rotations=q, colors_precomp=f,
            config=cfg_x)

    def render_vjp(m, s, q, o, f, st):
        return V.rasterize_gaussians_stream_diff(
            m, o, st, scales=s, rotations=q, colors_precomp=f,
            config=cfg_v, interpret=True)

    args = (jnp.asarray(means), jnp.asarray(scales), jnp.asarray(rots),
            jnp.asarray(ops), jnp.asarray(feats), settings)

    # forward parity first
    cx, _ = render_xla(*args)
    cv, _ = render_vjp(*args)
    np.testing.assert_allclose(np.asarray(cv), np.asarray(cx),
                               rtol=2e-4, atol=2e-4)

    lx = _loss_of(render_xla)
    lv = _loss_of(render_vjp)
    gx = jax.grad(lx, argnums=(0, 1, 2, 3, 4))(*args)
    gv = jax.grad(lv, argnums=(0, 1, 2, 3, 4))(*args)
    names = ["means", "scales", "rots", "ops", "feats"]
    for nm, a, b in zip(names, gx, gv):
        a = np.asarray(a)
        b = np.asarray(b)
        scale = max(1e-3, float(np.abs(a).max()))
        np.testing.assert_allclose(
            b, a, rtol=5e-3, atol=5e-4 * scale,
            err_msg=f"grad mismatch for {nm}")


def test_vjp_background_and_t_gradient():
    """bg gradient and a loss through final_T must match autodiff."""
    n, W = 40, 32
    means, scales, rots, ops, feats = random_scene(n, seed=5)
    bg = np.array([0.1, 0.2, 0.3], np.float32)
    settings = _settings(W, W, bg)
    cfg_x = R.RasterizeConfig(
        max_dup_per_gaussian=9, chunk_size=8, differentiable=True,
        max_chunks=64)
    cfg_v = cfg_x._replace(tiles_per_step=1)

    def loss_x(bgv, o):
        st = settings._replace(bg=bgv)
        c, _, extra = R.rasterize_gaussians(
            jnp.asarray(means), o, st, scales=jnp.asarray(scales),
            rotations=jnp.asarray(rots), colors_precomp=jnp.asarray(feats),
            config=cfg_x, return_extra=True)
        return jnp.sum(c * 0.7) + jnp.sum(extra["final_T"] * 0.3)

    def loss_v(bgv, o):
        st = settings._replace(bg=bgv)
        c, _, extra = V.rasterize_gaussians_stream_diff(
            jnp.asarray(means), o, st, scales=jnp.asarray(scales),
            rotations=jnp.asarray(rots), colors_precomp=jnp.asarray(feats),
            config=cfg_v, interpret=True, return_extra=True)
        return jnp.sum(c * 0.7) + jnp.sum(extra["final_T"] * 0.3)

    o = jnp.asarray(ops)
    gx = jax.grad(loss_x, argnums=(0, 1))(jnp.asarray(bg), o)
    gv = jax.grad(loss_v, argnums=(0, 1))(jnp.asarray(bg), o)
    for nm, a, b in zip(["bg", "opacity"], gx, gv):
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), rtol=5e-3, atol=1e-4,
            err_msg=f"grad mismatch for {nm}")
