"""Metrics vs independent numpy/scipy oracles."""

import numpy as np
import jax.numpy as jnp
from scipy.ndimage import correlate

from gpcr_tpu.metrics import psnr, psnr255, ssim, ms_ssim
from gpcr_tpu.metrics.lpips import random_lpips


def np_gauss_kernel(win=11, sigma=1.5):
    half = (win - 1) / 2
    x = np.arange(win) - half
    g = np.exp(-(x**2) / (2 * sigma**2))
    g /= g.sum()
    return np.outer(g, g)


def np_ssim_maps(x, y, data_range, win=11, sigma=1.5, k1=0.01, k2=0.03,
                 cov_factor=1.0):
    """Independent SSIM oracle: direct 2D filtering per channel."""
    kern = np_gauss_kernel(win, sigma)
    c1, c2 = (k1 * data_range) ** 2, (k2 * data_range) ** 2
    crop = win // 2

    def filt(im):
        out = correlate(im, kern, mode="constant")
        return out[crop:-crop, crop:-crop]

    mux, muy = filt(x), filt(y)
    sxx = cov_factor * (filt(x * x) - mux * mux)
    syy = cov_factor * (filt(y * y) - muy * muy)
    sxy = cov_factor * (filt(x * y) - mux * muy)
    lum = (2 * mux * muy + c1) / (mux**2 + muy**2 + c1)
    cs = (2 * sxy + c2) / (sxx + syy + c2)
    return lum, cs


def test_psnr_identity_and_scale():
    rng = np.random.RandomState(0)
    a = rng.rand(16, 16, 3).astype(np.float32)
    b = np.clip(a + 0.1, 0, 1)
    # psnr255 matches the pic_psnr.py formula exactly
    d = (a * 255) - (b * 255)
    expect = 20 * np.log10(255) - 10 * np.log10(np.mean(d**2))
    got = float(psnr255(jnp.asarray(a * 255), jnp.asarray(b * 255)))
    assert np.isclose(got, expect, rtol=1e-5)
    expect01 = 10 * np.log10(1.0 / np.mean((a - b) ** 2))
    assert np.isclose(float(psnr(jnp.asarray(a), jnp.asarray(b))), expect01,
                      rtol=1e-5)


def test_ssim_matches_numpy_oracle():
    rng = np.random.RandomState(1)
    x = rng.rand(48, 48).astype(np.float32)
    y = np.clip(x + rng.randn(48, 48).astype(np.float32) * 0.05, 0, 1)
    lum, cs = np_ssim_maps(x, y, 1.0)
    expect = np.mean(lum * cs)
    got = float(ssim(jnp.asarray(x), jnp.asarray(y), data_range=1.0))
    assert np.isclose(got, expect, rtol=1e-4, atol=1e-5)
    # sample covariance variant (skimage default)
    n = 11 * 11
    lum, cs = np_ssim_maps(x, y, 1.0, cov_factor=n / (n - 1))
    expect = np.mean(lum * cs)
    got = float(
        ssim(jnp.asarray(x), jnp.asarray(y), data_range=1.0,
             sample_covariance=True)
    )
    assert np.isclose(got, expect, rtol=1e-4, atol=1e-5)
    assert float(ssim(jnp.asarray(x), jnp.asarray(x))) > 0.9999


def test_ms_ssim_matches_numpy_oracle():
    rng = np.random.RandomState(2)
    h = w = 192  # min dim must survive 4 halvings with win 11
    x = (rng.rand(h, w) * 255).astype(np.float32)
    y = np.clip(x + rng.randn(h, w).astype(np.float32) * 12, 0, 255)

    weights = (0.0448, 0.2856, 0.3001, 0.2363, 0.1333)
    xs, ys = x.copy(), y.copy()
    mcs = []
    for i in range(5):
        lum, cs = np_ssim_maps(xs, ys, 255.0)
        if i < 4:
            mcs.append(max(np.mean(cs), 0.0))
            def pool(im):
                hh, ww = im.shape
                im = im[: hh - hh % 2, : ww - ww % 2]
                return im.reshape(hh // 2, 2, ww // 2, 2).mean(axis=(1, 3))
            xs, ys = pool(xs), pool(ys)
        else:
            s_last = max(np.mean(lum * cs), 0.0)
    expect = s_last ** weights[-1]
    for i in range(4):
        expect *= mcs[i] ** weights[i]

    got = float(ms_ssim(jnp.asarray(x), jnp.asarray(y), data_range=255.0))
    assert np.isclose(got, expect, rtol=1e-4, atol=1e-5)
    assert float(ms_ssim(jnp.asarray(x), jnp.asarray(x))) > 0.9999


def test_ms_ssim_multichannel_per_channel_product():
    rng = np.random.RandomState(3)
    x = (rng.rand(3, 192, 192) * 255).astype(np.float32)
    y = np.clip(x + rng.randn(*x.shape).astype(np.float32) * 8, 0, 255)
    per_ch = [
        float(ms_ssim(jnp.asarray(x[c]), jnp.asarray(y[c]))) for c in range(3)
    ]
    got = float(ms_ssim(jnp.asarray(x), jnp.asarray(y)))
    assert np.isclose(got, np.mean(per_ch), rtol=1e-5)


def test_lpips_architecture_properties():
    m = random_lpips()
    rng = np.random.RandomState(4)
    a = rng.rand(1, 3, 64, 64).astype(np.float32) * 2 - 1
    b = np.clip(a + rng.randn(*a.shape).astype(np.float32) * 0.2, -1, 1)
    d_same = float(m(jnp.asarray(a), jnp.asarray(a))[0])
    d_diff = float(m(jnp.asarray(a), jnp.asarray(b))[0])
    assert d_same < 1e-10
    assert d_diff > d_same
    d_sym = float(m(jnp.asarray(b), jnp.asarray(a))[0])
    assert np.isclose(d_diff, d_sym, rtol=1e-5)
