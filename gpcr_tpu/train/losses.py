"""Training losses.

The reference repo ships no trainer, but its checkpoint's options.yaml
records the full loss configuration (optim_info, options.yaml:95-135):
l1 rgb (loss_rgb_type: l1, weight 0.01), normal l2 (weight 10 x 1.0),
hit focal loss (alpha 0.5, gamma 2, weight 0.01), dc weight 1.0,
optional lpips (weight 0 in the shipped run). This module reconstructs
those losses in JAX.
"""

from __future__ import annotations

import typing as T

import jax.numpy as jnp


def l1(pred, gt, mask=None):
    d = jnp.abs(pred - gt)
    if mask is not None:
        return jnp.sum(d * mask) / jnp.maximum(jnp.sum(mask), 1.0)
    return jnp.mean(d)


def l2(pred, gt, mask=None):
    d = (pred - gt) ** 2
    if mask is not None:
        return jnp.sum(d * mask) / jnp.maximum(jnp.sum(mask), 1.0)
    return jnp.mean(d)


def focal_bce(pred, gt, alpha: float = 0.5, gamma: float = 2.0, eps=1e-6):
    """Focal binary cross-entropy on hit probabilities
    (focal_loss_alpha/gamma, options.yaml:97-98)."""
    p = jnp.clip(pred, eps, 1.0 - eps)
    pos = -alpha * ((1 - p) ** gamma) * jnp.log(p)
    neg = -(1 - alpha) * (p**gamma) * jnp.log(1 - p)
    return jnp.mean(jnp.where(gt > 0.5, pos, neg))


class LossWeights(T.NamedTuple):
    """Deployed weights (options.yaml optim_info)."""

    rgb: float = 0.01
    normal: float = 10.0
    normal_l2: float = 1.0
    hit: float = 0.01
    dc: float = 1.0
    t: float = 0.01
    focal_alpha: float = 0.5
    focal_gamma: float = 2.0


def render_losses(
    out: dict,  # renderer outputs: rgb/normal/hitmap (q, h, w, 3)
    gt: dict,  # gt images: rgb, normal_w, hit_map
    weights: LossWeights = LossWeights(),
):
    """Weighted total + per-term dict."""
    hit_gt = gt["hit_map"]
    if hit_gt.ndim == out["hitmap"].ndim - 1:
        hit_gt = hit_gt[..., None]
    terms = {}
    terms["rgb"] = l1(out["rgb"], gt["rgb"])
    if out.get("normal") is not None and gt.get("normal_w") is not None:
        # normals only matter where the surface is hit
        terms["normal"] = weights.normal_l2 * l2(
            out["normal"], gt["normal_w"], mask=hit_gt
        )
    terms["hit"] = focal_bce(
        jnp.clip(out["hitmap"][..., :1], 0.0, 1.0),
        hit_gt,
        alpha=weights.focal_alpha,
        gamma=weights.focal_gamma,
    )
    total = (
        weights.rgb * terms["rgb"]
        + weights.normal * terms.get("normal", 0.0)
        + weights.hit * terms["hit"]
    )
    return total, terms
