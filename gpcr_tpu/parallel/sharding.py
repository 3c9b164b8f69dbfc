"""Device-mesh sharding for training and multi-chip rendering.

The reference trains with torchrun DDP (options.yaml:154,180 — trainer code
absent) and renders single-GPU. The TPU-native equivalents:

- data parallel (dp): point-cloud batch sharded over the 'dp' mesh axis,
  params replicated, gradients psum'd — all via jit + NamedSharding (GSPMD
  inserts the collectives over ICI).
- view parallel (sp): the view axis of each cloud sharded over 'sp' — the
  workload's sequence-parallel analogue (SURVEY.md §2.3: the scaling axes
  here are points/tiles/views, not tokens).

``jax.distributed.initialize`` + the same mesh covers multi-host.
"""

from __future__ import annotations

import typing as T

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    n_devices: T.Optional[int] = None,
    dp: T.Optional[int] = None,
    sp: T.Optional[int] = None,
) -> Mesh:
    """2D mesh with axes ('dp', 'sp'). Defaults: all devices on dp."""
    devices = jax.devices()
    n = n_devices or len(devices)
    if len(devices) < n:
        raise ValueError(
            f"make_mesh: need {n} devices, found {len(devices)} "
            f"({devices[0].platform}). Hint: run on CPU with XLA_FLAGS="
            f"--xla_force_host_platform_device_count={n} and "
            f"jax.config.update('jax_platforms', 'cpu') before backend init "
            f"(JAX_PLATFORMS alone is ignored by the axon TPU plugin)."
        )
    devices = devices[:n]
    if dp is None and sp is None:
        dp, sp = n, 1
    elif dp is None:
        dp = n // sp
    elif sp is None:
        sp = n // dp
    assert dp * sp == n, f"dp({dp}) * sp({sp}) != devices({n})"
    arr = np.array(devices).reshape(dp, sp)
    return Mesh(arr, axis_names=("dp", "sp"))


def batch_sharding(mesh: Mesh) -> T.Dict[str, NamedSharding]:
    """Shardings for a training batch: clouds over dp, views over sp."""
    return {
        "cloud": NamedSharding(mesh, P("dp")),  # (B, N, ...) -> B over dp
        "view": NamedSharding(mesh, P("dp", "sp")),  # (B, V, ...) -> B/dp, V/sp
        "replicated": NamedSharding(mesh, P()),
    }


def replicate(tree, mesh: Mesh):
    """Place a pytree fully replicated on the mesh."""
    s = NamedSharding(mesh, P())
    return jax.device_put(tree, s)


# canonical batch-key shardings; extend via shard_batch(spec=...) — unknown
# keys RAISE rather than silently mis-shard
_CLOUD_KEYS = frozenset({"coords", "rgb", "valid", "normal", "feature"})
_VIEW_KEYS = frozenset(
    {"view_t", "full_t", "campos", "gt_rgb", "gt_normal", "gt_hit"}
)


def shard_batch(
    batch: dict, mesh: Mesh, spec: T.Optional[T.Dict[str, str]] = None,
) -> dict:
    """Apply the canonical shardings to a batch dict.

    Keys with leading (B, N) point dims use cloud sharding ('cloud'); keys
    with (B, V, ...) view dims use view sharding ('view'); 0-d entries are
    replicated. New keys must be declared in ``spec`` (mapping key ->
    'cloud' | 'view' | 'replicated') — unknown keys raise instead of being
    silently view-sharded.
    """
    sh = batch_sharding(mesh)
    kinds = {k: "cloud" for k in _CLOUD_KEYS}
    kinds.update({k: "view" for k in _VIEW_KEYS})
    if spec:
        kinds.update(spec)
    out = {}
    for k, v in batch.items():
        kind = kinds.get(k)
        if kind is None and getattr(v, "ndim", 1) == 0:
            kind = "replicated"
        if kind is None:
            raise ValueError(
                f"shard_batch: unknown batch key {k!r}; declare it via "
                f"spec={{{k!r}: 'cloud' | 'view' | 'replicated'}}"
            )
        out[k] = jax.device_put(v, sh[kind])
    return out
