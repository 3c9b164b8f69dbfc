"""SSIM and MS-SSIM in pure JAX.

The reference scores MS-SSIM with pytorch_msssim (pic_mssim.py:35-39,
data_range=255) and single-scale SSIM with skimage (gaussian σ=1.5,
plib/metrics.py:69-90). Neither library is vendored here; both algorithms
are implemented from their published definitions:

- SSIM (Wang et al. 2004): gaussian window 11x11 σ=1.5, K1=0.01, K2=0.03,
  luminance·contrast-structure with 'valid' windows (borders cropped).
- MS-SSIM (Wang et al. 2003): 5 scales, weights
  (0.0448, 0.2856, 0.3001, 0.2363, 0.1333), 2x average-pool between scales,
  product of contrast-structure terms with the luminance term applied at the
  coarsest scale only; negative cs clamped to 0 (pytorch_msssim behaviour).

``ssim(..., sample_covariance=True)`` reproduces skimage's default
N/(N-1) covariance normalization.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

MS_WEIGHTS = (0.0448, 0.2856, 0.3001, 0.2363, 0.1333)


def _gaussian_kernel(win_size: int, sigma: float):
    half = (win_size - 1) / 2.0
    x = np.arange(win_size, dtype=np.float64) - half
    g = np.exp(-(x**2) / (2 * sigma**2))
    g /= g.sum()
    return jnp.asarray(g, jnp.float32)


def _filter2d_separable(img, kernel):
    """img: (..., H, W); valid convolution with a separable 1D kernel."""
    k = kernel.shape[0]
    lead = img.shape[:-2]
    x = img.reshape((-1, 1, *img.shape[-2:]))
    kh = kernel.reshape(1, 1, k, 1)
    kw = kernel.reshape(1, 1, 1, k)
    x = jax.lax.conv_general_dilated(
        x, kh, (1, 1), "VALID", dimension_numbers=("NCHW", "OIHW", "NCHW"),
        precision=jax.lax.Precision.HIGHEST,
    )
    x = jax.lax.conv_general_dilated(
        x, kw, (1, 1), "VALID", dimension_numbers=("NCHW", "OIHW", "NCHW"),
        precision=jax.lax.Precision.HIGHEST,
    )
    return x.reshape(*lead, *x.shape[-2:])


def _ssim_maps(x, y, data_range, win_size, sigma, k1, k2, cov_norm_factor):
    kernel = _gaussian_kernel(win_size, sigma)
    c1 = (k1 * data_range) ** 2
    c2 = (k2 * data_range) ** 2
    mu_x = _filter2d_separable(x, kernel)
    mu_y = _filter2d_separable(y, kernel)
    mu_xx = mu_x * mu_x
    mu_yy = mu_y * mu_y
    mu_xy = mu_x * mu_y
    sxx = cov_norm_factor * (_filter2d_separable(x * x, kernel) - mu_xx)
    syy = cov_norm_factor * (_filter2d_separable(y * y, kernel) - mu_yy)
    sxy = cov_norm_factor * (_filter2d_separable(x * y, kernel) - mu_xy)
    lum = (2 * mu_xy + c1) / (mu_xx + mu_yy + c1)
    cs = (2 * sxy + c2) / (sxx + syy + c2)
    return lum, cs


def ssim(
    img1, img2, data_range: float = 1.0, win_size: int = 11,
    sigma: float = 1.5, k1: float = 0.01, k2: float = 0.03,
    sample_covariance: bool = False,
):
    """Mean SSIM over (..., H, W) (channel-wise, then averaged).

    ``sample_covariance=True`` matches skimage's default normalization
    (factor N/(N-1) with N = win_size², plib/metrics.py:69-90 path);
    False matches pytorch_msssim.
    """
    x = jnp.asarray(img1, jnp.float32)
    y = jnp.asarray(img2, jnp.float32)
    if sample_covariance:
        n = win_size * win_size
        factor = n / (n - 1.0)
    else:
        factor = 1.0
    lum, cs = _ssim_maps(x, y, data_range, win_size, sigma, k1, k2, factor)
    return jnp.mean(lum * cs)


def _avg_pool2(img):
    """2x average pool with odd-size edge padding (pytorch_msssim pads with
    zeros via F.avg_pool2d default — it uses padding = shape % 2)."""
    h, w = img.shape[-2], img.shape[-1]
    ph, pw = h % 2, w % 2
    if ph or pw:
        pad = [(0, 0)] * (img.ndim - 2) + [(0, ph), (0, pw)]
        img = jnp.pad(img, pad)
    lead = img.shape[:-2]
    x = img.reshape(*lead, img.shape[-2] // 2, 2, img.shape[-1] // 2, 2)
    return x.mean(axis=(-3, -1))


def ms_ssim(
    img1, img2, data_range: float = 255.0, win_size: int = 11,
    sigma: float = 1.5, k1: float = 0.01, k2: float = 0.03,
    weights=MS_WEIGHTS,
):
    """Multi-scale SSIM over (..., H, W); averaged to a scalar.

    Matches the reference's pytorch_msssim call (pic_mssim.py:35-39):
    data_range=255 on 0-255 images, 5 scales. Requires the smallest scale
    to still fit the window: min(H, W) > win_size * 2^(levels-1).
    """
    x = jnp.asarray(img1, jnp.float32)
    y = jnp.asarray(img2, jnp.float32)
    levels = len(weights)
    min_dim = min(x.shape[-2], x.shape[-1])
    feasible = 1
    while feasible < levels and (min_dim >> feasible) >= win_size:
        feasible += 1
    if feasible < levels:
        # pytorch_msssim asserts min_dim > win*2^4; for smaller images we
        # truncate to the feasible scale count and renormalize the weights
        # (documented deviation — only reachable below 176px)
        weights = tuple(w / sum(weights[:feasible]) for w in weights[:feasible])
        levels = feasible
    mcs = []  # per-channel cs means, combined per channel before the final
    # average (pytorch_msssim computes the ms-ssim product per (batch,
    # channel) and averages last)
    for i in range(levels):
        lum, cs = _ssim_maps(x, y, data_range, win_size, sigma, k1, k2, 1.0)
        if i < levels - 1:
            mcs.append(jnp.maximum(jnp.mean(cs, axis=(-2, -1)), 0.0))
            x = _avg_pool2(x)
            y = _avg_pool2(y)
        else:
            ssim_last = jnp.maximum(jnp.mean(lum * cs, axis=(-2, -1)), 0.0)
    out = ssim_last ** weights[-1]
    for i in range(levels - 1):
        out = out * mcs[i] ** weights[i]
    return jnp.mean(out)
