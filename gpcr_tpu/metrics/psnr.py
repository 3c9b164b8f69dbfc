"""PSNR — both conventions used by the reference.

- ``psnr``:  [0,1]-range images, 10·log10(1/mse)   (plib/metrics.py:12-30)
- ``psnr255``: 0-255 integer images, 20·log10(255) − 10·log10(mse)
  (pic_psnr.py:44; simple_raw_render.py:867-873 'compare_psnr')
Differentiable (jnp).
"""

from __future__ import annotations

import jax.numpy as jnp


def psnr(rgb, gts):
    mse = jnp.mean((rgb[..., :3] - gts[..., :3]) ** 2)
    return 10.0 * jnp.log10(1.0 / mse)


def psnr255(img1, img2):
    """img1/img2: 0-255 scale (any float/int dtype)."""
    diff = img1.astype(jnp.float32) - img2.astype(jnp.float32)
    mse = jnp.mean(diff**2)
    return 20.0 * jnp.log10(255.0) - 10.0 * jnp.log10(mse)
