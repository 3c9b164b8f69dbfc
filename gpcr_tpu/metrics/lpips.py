"""LPIPS (AlexNet backbone) in pure JAX.

The reference scores LPIPS with the ``lpips`` pip package, net='alex'
(pic_lpips.py:9,37) — NOTE the reference feeds 0-255 images straight into a
model that expects [-1, 1]; ``GPCRLpipsCLI`` reproduces that quirk when asked
for strict parity.

This module implements the full LPIPS forward (Zhang et al. 2018):
input normalization (shift/scale), AlexNet conv stack taps relu1-relu5,
per-location channel unit-normalization, squared difference, learned
non-negative 1x1 linear heads, spatial mean, sum over taps.

Weights are NOT bundled (this environment has no torchvision/lpips and no
network egress). Load them with ``LPIPS.load`` from either:
- a .npz produced by ``convert_torch_lpips`` (run once wherever the torch
  ``lpips`` package is available), or
- a torch ``lpips`` state dict + torchvision alexnet state dict.
``lpips_available()`` reports whether weights were found; callers (benchmark
CLI) degrade gracefully.
"""

from __future__ import annotations

import os
import typing as T

import jax
import jax.numpy as jnp
import numpy as np

# (out_ch, in_ch, k, stride, pad) for torchvision alexnet.features convs
_ALEX_CONVS = [
    (64, 3, 11, 4, 2),
    (192, 64, 5, 1, 2),
    (384, 192, 3, 1, 1),
    (256, 384, 3, 1, 1),
    (256, 256, 3, 1, 1),
]
_SHIFT = np.array([-0.030, -0.088, -0.188], np.float32)
_SCALE = np.array([0.458, 0.448, 0.450], np.float32)

DEFAULT_WEIGHTS = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "weights", "lpips_alex.npz",
)


def lpips_available(path: str = DEFAULT_WEIGHTS) -> bool:
    return os.path.exists(path)


class LPIPS:
    def __init__(self, params: dict):
        """params: {'conv{i}': {'kernel': (O,I,kh,kw), 'bias': (O,)},
        'lin{i}': (1,C,1,1) non-negative} for i in 0..4."""
        self.params = jax.tree_util.tree_map(jnp.asarray, params)

    @staticmethod
    def load(path: str = DEFAULT_WEIGHTS) -> "LPIPS":
        if path.endswith((".pth", ".pt")):
            raise ValueError("convert torch weights with convert_torch_lpips")
        with np.load(path) as z:
            flat = {k: z[k] for k in z.files}
        params: dict = {}
        for k, v in flat.items():
            if "/" in k:
                a, b = k.split("/")
                params.setdefault(a, {})[b] = v
            else:
                params[k] = v
        return LPIPS(params)

    def _features(self, x):
        """x: (N, 3, H, W) in [-1, 1]."""
        x = (x - jnp.asarray(_SHIFT).reshape(1, 3, 1, 1)) / jnp.asarray(
            _SCALE
        ).reshape(1, 3, 1, 1)
        taps = []
        for i, (o, c, k, s, p) in enumerate(_ALEX_CONVS):
            w = self.params[f"conv{i}"]["kernel"]
            b = self.params[f"conv{i}"]["bias"]
            x = jax.lax.conv_general_dilated(
                x, w, (s, s), [(p, p), (p, p)],
                dimension_numbers=("NCHW", "OIHW", "NCHW"),
            ) + b.reshape(1, -1, 1, 1)
            x = jnp.maximum(x, 0.0)
            taps.append(x)
            if i in (0, 1):  # maxpool k3 s2 after relu1 / relu2
                x = jax.lax.reduce_window(
                    x, -jnp.inf, jax.lax.max, (1, 1, 3, 3), (1, 1, 2, 2),
                    "VALID",
                )
        return taps

    def __call__(self, img1, img2):
        """img1/img2: (N, 3, H, W) in [-1, 1] (or whatever the caller feeds —
        strict-parity mode feeds 0-255 like pic_lpips.py). Returns (N,)."""
        f1 = self._features(jnp.asarray(img1, jnp.float32))
        f2 = self._features(jnp.asarray(img2, jnp.float32))
        total = 0.0
        for i, (a, b) in enumerate(zip(f1, f2)):
            a = a / jnp.sqrt(jnp.sum(a**2, axis=1, keepdims=True) + 1e-10)
            b = b / jnp.sqrt(jnp.sum(b**2, axis=1, keepdims=True) + 1e-10)
            d = (a - b) ** 2
            lin = self.params[f"lin{i}"].reshape(1, -1, 1, 1)
            total = total + jnp.mean(jnp.sum(d * lin, axis=1), axis=(-2, -1))
        return total


def convert_torch_lpips(lpips_module) -> T.Dict[str, np.ndarray]:
    """Convert a torch ``lpips.LPIPS(net='alex')`` module to the npz layout.
    Run where torch+lpips exist; save with np.savez(path, **flat)."""
    sd = {k: v.detach().cpu().numpy() for k, v in lpips_module.state_dict().items()}
    return convert_lpips_state_dict(sd)


def convert_lpips_state_dict(
    sd: T.Dict[str, np.ndarray],
) -> T.Dict[str, np.ndarray]:
    """Map an ``lpips.LPIPS(net='alex')`` state dict (numpy values) to the
    npz layout. Key schema: the package registers the alexnet backbone as
    ``net.slice{1..5}.<features_idx>.{weight,bias}`` (features conv indices
    0/3/6/8/10) and the learned heads as ``lins.{i}.model.1.weight``."""
    flat = {}
    conv_idx = [0, 3, 6, 8, 10]  # torchvision alexnet.features conv layers
    for i, li in enumerate(conv_idx):
        flat[f"conv{i}/kernel"] = np.asarray(sd[f"net.slice{i+1}.{li}.weight"])
        flat[f"conv{i}/bias"] = np.asarray(sd[f"net.slice{i+1}.{li}.bias"])
    for i in range(5):
        flat[f"lin{i}"] = np.asarray(sd[f"lins.{i}.model.1.weight"])
    return flat


def convert_lpips_pth(pth_path: str, out_path: str = DEFAULT_WEIGHTS) -> str:
    """TORCH-FREE conversion: read an ``lpips`` .pth checkpoint through the
    framework's torch-zip reader (io/torch_zip.py — whitelisted unpickler,
    no torch import), map to the npz layout, and save. Returns out_path.

    Drop any lpips-alex checkpoint at ``pth_path`` and the benchmark CLI's
    LPIPS column lights up (pic_lpips.py:8-41 is the reference scorer)."""
    from ..io.torch_zip import load_torch_zip

    sd = load_torch_zip(pth_path)
    if not isinstance(sd, dict):
        raise ValueError(f"expected a state dict in {pth_path}")
    # tolerate either a bare state dict or {'state_dict': ...}
    if "state_dict" in sd and isinstance(sd["state_dict"], dict):
        sd = sd["state_dict"]
    flat = convert_lpips_state_dict(sd)
    os.makedirs(os.path.dirname(out_path), exist_ok=True)
    np.savez(out_path, **flat)
    return out_path


def random_lpips(key=None) -> LPIPS:
    """Random-weight LPIPS (architecture testing only — NOT a valid metric)."""
    rng = np.random.RandomState(0)
    params = {}
    for i, (o, c, k, s, p) in enumerate(_ALEX_CONVS):
        params[f"conv{i}"] = {
            "kernel": rng.randn(o, c, k, k).astype(np.float32)
            * (2.0 / (c * k * k)) ** 0.5,
            "bias": np.zeros((o,), np.float32),
        }
        params[f"lin{i}"] = np.abs(rng.randn(1, o, 1, 1).astype(np.float32)) * 0.01
    return LPIPS(params)
