"""Debug instrumentation — the reference's debug-mode equivalents.

The reference rasterizer's ``debug`` flag forces a device sync after every
kernel (CHECK_CUDA, auxiliary.h:166-173) and CPU-snapshots all inputs to
``snapshot_fw.dump`` on exception (dgr/__init__.py:83-90,132-139). The JAX
equivalents here:

- ``snapshot_on_error``: wrap a function; on any exception, dump its array
  arguments to an .npz snapshot for offline repro.
- ``check_finite``: raise (optionally) on NaN/Inf in a pytree — the
  vectorized stand-in for per-kernel sync checks.
- ``trace``: jax.profiler trace context for kernel-level timing.
- Pallas kernels additionally accept ``interpret=True`` (their own debug
  mode; see ops/rasterize_pallas.py).
"""

from __future__ import annotations

import contextlib
import functools
import typing as T

import jax
import numpy as np


def snapshot_on_error(fn: T.Callable, path: str = "snapshot_fw.npz"):
    """Reference dgr/__init__.py:83-90 semantics: on exception, save all
    array args/kwargs and re-raise with a pointer to the dump."""

    @functools.wraps(fn)
    def wrapped(*args, **kwargs):
        try:
            return fn(*args, **kwargs)
        except Exception:
            flat = {}
            leaves, _ = jax.tree_util.tree_flatten((args, kwargs))
            for i, leaf in enumerate(leaves):
                try:
                    flat[f"arg_{i}"] = np.asarray(leaf)
                except Exception:
                    pass
            np.savez(path, **flat)
            print(
                f"\nAn error occurred in {fn.__name__}. Inputs were written "
                f"to {path}.\nPlease attach the snapshot when reporting."
            )
            raise

    return wrapped


def check_finite(tree, name: str = "", raise_on_fail: bool = True) -> bool:
    """True if every array leaf is finite. Host-side (forces a sync)."""
    bad = []
    for i, leaf in enumerate(jax.tree_util.tree_leaves(tree)):
        if hasattr(leaf, "dtype") and np.issubdtype(leaf.dtype, np.floating):
            arr = np.asarray(leaf)
            if not np.isfinite(arr).all():
                bad.append((i, arr.shape))
    if bad and raise_on_fail:
        raise FloatingPointError(f"non-finite values in {name}: leaves {bad}")
    return not bad


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/gpcr_trace"):
    """jax.profiler trace context (TPU equivalent of the reference's
    wall-clock prints, simple_raw_render.py:372-379). View with
    tensorboard/xprof."""
    try:
        jax.profiler.start_trace(log_dir)
        yield log_dir
    finally:
        try:
            jax.profiler.stop_trace()
        except Exception:
            pass
