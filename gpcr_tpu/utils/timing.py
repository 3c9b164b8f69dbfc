"""Device-synchronized timing.

The reference brackets its timings with torch.cuda.synchronize
(simple_raw_render.py:372-379). The JAX equivalent is
``jax.block_until_ready`` — but the axon TPU platform in this environment
implements it as a no-op, so honest timing must force a device-to-host
transfer. ``sync`` fetches one element per array leaf (tiny transfer, full
execution barrier).
"""

from __future__ import annotations

import time
import typing as T

import jax
import numpy as np


def sync(tree) -> None:
    """Block until the computation producing the pytree has finished.

    Device execution is single-stream, so transferring one element of one
    output waits for the whole program (and everything enqueued before it).
    One transfer only — each D2H round-trip through the axon tunnel costs
    tens of ms, so per-leaf syncing would dominate small measurements.
    """
    for leaf in jax.tree_util.tree_leaves(tree):
        if hasattr(leaf, "ravel") and getattr(leaf, "size", 0):
            np.asarray(leaf.ravel()[:1])
            return


def timed(fn: T.Callable, *args, warmup: int = 1, iters: int = 5, **kwargs):
    """Run fn with warmup, returning (median_ms, all_ms, last_output)."""
    out = None
    for _ in range(max(warmup, 0)):
        out = fn(*args, **kwargs)
        sync(out)
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        out = fn(*args, **kwargs)
        sync(out)
        times.append((time.perf_counter() - t0) * 1000.0)
    return float(np.median(times)), times, out
