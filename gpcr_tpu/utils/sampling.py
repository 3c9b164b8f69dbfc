"""Sampling utilities — ``plib/sample_utils.py`` + ``plib/spherical_gaussian.py``
equivalents.

- QMC / random sample generation (get_samples, sample_utils.py:46-89)
- dtype mapping helpers (sample_utils.py:10-44)
- von Mises-Fisher spherical gaussian: NLL + rotation-based sampling
  (spherical_gaussian.py:66-146) — used for ray-direction perturbation.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def get_np_dtype(dtype) -> np.dtype:
    if isinstance(dtype, str):
        return np.dtype(dtype)
    try:
        return np.dtype(dtype)
    except TypeError:
        return np.dtype(str(dtype).replace("jax.numpy.", ""))


def get_jnp_dtype(dtype):
    return jnp.dtype(get_np_dtype(dtype))


get_torch_dtype = get_np_dtype  # torch-free framework: same mapping surface


def get_samples(
    n: int, d: int, method: str = "random", seed: int = 0,
    low=0.0, high=1.0,
) -> np.ndarray:
    """(n, d) samples in [low, high): 'random' or 'latin_hypercube' QMC
    (ref sample_utils.py:46-89)."""
    if method == "random":
        rng = np.random.RandomState(seed)
        u = rng.rand(n, d)
    elif method in ("latin_hypercube", "lhs", "qmc"):
        from scipy.stats import qmc

        u = qmc.LatinHypercube(d=d, seed=seed).random(n=n)
    else:
        raise NotImplementedError(method)
    return (np.asarray(low) + u * (np.asarray(high) - np.asarray(low))).astype(
        np.float32
    )


def shuffle_along_axis(key, a: jnp.ndarray, axis: int = 0) -> jnp.ndarray:
    """Independent per-slice shuffle (ref sample_utils.py:92)."""
    idx = jax.random.uniform(key, a.shape).argsort(axis=axis)
    return jnp.take_along_axis(a, idx, axis=axis)


class SphericalGaussian:
    """von Mises-Fisher distribution on S² (ref spherical_gaussian.py:12)."""

    def __init__(self, kappa: float):
        self.kappa = float(kappa)

    def log_prob(self, mu, x):
        """log vMF density: log C(κ) + κ·muᵀx (ref :66-92)."""
        k = self.kappa
        # C(κ) = κ / (2π (e^κ − e^−κ)); log-stable form
        log_c = (
            jnp.log(k) - jnp.log(2 * jnp.pi) - k - jnp.log1p(-jnp.exp(-2 * k))
        )
        return log_c + k * jnp.sum(mu * x, axis=-1)

    def nll(self, mu, x):
        return -self.log_prob(mu, x)

    def sample(self, key, mu):
        """Sample directions around mean mu (*, 3) (ref :94-146):
        draw w = cos(angle) by inverse-CDF around +z, a uniform azimuth,
        then rotate +z to mu."""
        from . import rigid_motion

        k = self.kappa
        ku, kv = jax.random.split(key)
        shape = mu.shape[:-1]
        u = jax.random.uniform(ku, shape, minval=1e-7, maxval=1.0)
        # inverse CDF of vMF marginal over w: w = 1 + log(u + (1-u)e^{-2κ})/κ
        w = 1.0 + jnp.log(u + (1.0 - u) * jnp.exp(-2.0 * k)) / k
        phi = jax.random.uniform(kv, shape, minval=0.0, maxval=2 * jnp.pi)
        s = jnp.sqrt(jnp.maximum(1.0 - w * w, 0.0))
        v_local = jnp.stack([s * jnp.cos(phi), s * jnp.sin(phi), w], axis=-1)
        z = jnp.broadcast_to(jnp.array([0.0, 0.0, 1.0]), mu.shape)
        R = rigid_motion.get_min_R(z, mu)
        return (R @ v_local[..., None])[..., 0]
