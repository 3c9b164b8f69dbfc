"""Checkpoint load/save + torch->JAX conversion.

The reference ships torch state dicts (``model_epoch39.pth``; loading at
simple_raw_render.py:114-130). This module converts them into the
framework's nested param dicts, and round-trips native ``.npz`` checkpoints.

Key mapping (reference models/model_v2.py module tree):
    color_encoder.conv0.kernel       -> params['color_encoder']['conv0']['kernel']
    color_encoder.block0.0.conv0_0.* -> ...['block0']['0']['conv0_0'][*]
MinkowskiConvolution kernels are (K³, Cin, Cout) for volumetric kernels and
(Cin, Cout) for 1³ kernels (expanded to (1, Cin, Cout) here). ME enumerates
kernel offsets with the first coordinate axis varying fastest and offsets
ascending (odd kernels: -(k//2)..k//2; even: 0..k-1), which matches
``ops/sparse._offsets_cube`` — so no permutation is applied. If a real
checkpoint renders mirrored features, set ``flip_kernel_axes=True`` to apply
the reversed-offset permutation instead.
"""

from __future__ import annotations

import typing as T

import jax.numpy as jnp
import numpy as np


def _nest(flat: T.Dict[str, np.ndarray]) -> dict:
    out: dict = {}
    for k, v in flat.items():
        parts = k.split(".")
        d = out
        for p in parts[:-1]:
            d = d.setdefault(p, {})
        d[parts[-1]] = v
    return out


def _flatten(params: dict, prefix: str = "") -> T.Dict[str, np.ndarray]:
    out = {}
    for k, v in params.items():
        key = f"{prefix}.{k}" if prefix else k
        if isinstance(v, dict):
            out.update(_flatten(v, key))
        else:
            out[key] = np.asarray(v)
    return out


def convert_torch_state_dict(
    state: T.Dict[str, "np.ndarray"], flip_kernel_axes: bool = False
) -> dict:
    """Torch (or numpy) flat state dict -> nested JAX params."""
    flat = {}
    for k, v in state.items():
        if hasattr(v, "detach"):
            v = v.detach().cpu().numpy()
        v = np.asarray(v, np.float32)
        if k.endswith("default_quaternion"):
            continue  # constant buffer, baked into the head
        if k.endswith(".kernel") and v.ndim == 2:
            v = v[None]  # 1³ kernel -> (1, Cin, Cout)
        if flip_kernel_axes and k.endswith(".kernel") and v.shape[0] > 1:
            v = v[::-1].copy()
        flat[k] = v
    nested = _nest(flat)
    return {k: _to_jnp(v) for k, v in nested.items()}


def _to_jnp(tree):
    if isinstance(tree, dict):
        return {k: _to_jnp(v) for k, v in tree.items()}
    return jnp.asarray(tree)


def load_params(path: str, info=None) -> dict:
    """Load params from .npz (native) or torch .pth/.pt (converted).

    Torch files are read with the torch-free zip unpickler
    (``gpcr_tpu.io.torch_zip``) — no torch import required."""
    if path.endswith((".pth", ".pt")):
        from ..io.torch_zip import load_torch_zip

        state = load_torch_zip(path)
        if isinstance(state, dict) and "state_dict" in state:
            state = state["state_dict"]
        return convert_torch_state_dict(state)
    with np.load(path) as z:
        return _to_jnp(_nest({k: z[k] for k in z.files}))


def save_params(path: str, params: dict):
    np.savez(path, **_flatten(params))
