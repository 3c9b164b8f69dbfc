"""Test configuration: run everything on CPU with 8 virtual devices so
sharding/collective paths are exercised without TPU hardware.

Note: the axon TPU plugin in this environment ignores JAX_PLATFORMS, so we
must force the platform through jax.config before any computation runs.
"""

import os
import sys

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ.setdefault("JAX_ENABLE_X64", "0")

import jax

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
