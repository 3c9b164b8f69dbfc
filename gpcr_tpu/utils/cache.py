"""Persistent XLA compilation cache.

Compiles through the axon tunnel cost minutes for big sort/conv graphs
(a single 4M-element sort: ~4 min cold, ~80 s with the persistent cache).
Every CLI entry point calls ``enable_persistent_cache()`` so repeat runs of
the same (N, capacity, resolution) buckets skip recompilation.
"""

from __future__ import annotations

import os


def enable_persistent_cache(path: str | None = None) -> str:
    import jax

    path = path or os.environ.get(
        "GPCR_JAX_CACHE",
        os.path.join(
            os.path.dirname(os.path.dirname(os.path.dirname(
                os.path.abspath(__file__)))),
            ".jax_cache",
        ),
    )
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    return path
