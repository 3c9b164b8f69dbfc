"""Segment reductions — the framework's torch_scatter equivalent.

The reference uses torch_scatter.scatter_mean/scatter_sum for voxel
downsampling (structures.py:19,702,711,741). On TPU these are
``jax.ops.segment_sum``-family reductions, which XLA lowers to efficient
sorted-segment scatters.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def segment_sum(data, segment_ids, num_segments: int):
    return jax.ops.segment_sum(data, segment_ids, num_segments=num_segments)


def segment_mean(data, segment_ids, num_segments: int):
    total = jax.ops.segment_sum(data, segment_ids, num_segments=num_segments)
    count = jax.ops.segment_sum(
        jnp.ones(data.shape[:1], data.dtype), segment_ids, num_segments=num_segments
    )
    return total / jnp.maximum(count, 1.0).reshape(-1, *([1] * (data.ndim - 1)))


def segment_max(data, segment_ids, num_segments: int):
    return jax.ops.segment_max(data, segment_ids, num_segments=num_segments)


def segment_min(data, segment_ids, num_segments: int):
    return jax.ops.segment_min(data, segment_ids, num_segments=num_segments)
