"""Learnable per-channel RGB gain (ref ``ColorCorrector``,
structures.py:4494-4542). Functional: params are an explicit pytree."""

from __future__ import annotations

import jax.numpy as jnp


class ColorCorrector:
    def __init__(self, correction_type: str = "wrgb"):
        if correction_type not in ("wrgb", "identify"):
            raise NotImplementedError(correction_type)
        self.correction_type = correction_type

    def init(self):
        return {"wrgb": jnp.ones((3,), jnp.float32)}

    def apply(self, params, x):
        if self.correction_type == "wrgb":
            return x * params["wrgb"].reshape(*([1] * (x.ndim - 1)), -1)
        return x
