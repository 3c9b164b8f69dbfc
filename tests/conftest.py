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


# files excluded from the `unit` mid-tier: end-to-end golden CLI renders
# and multichip dryrun subprocesses — they dominate full-suite runtime
_NON_UNIT_FILES = {"test_cli.py", "test_golden.py", "test_multichip.py"}


def pytest_collection_modifyitems(config, items):
    """Run `tpu`-marked tests only when explicitly selected (`-m tpu`):
    they probe/drive the real device via subprocesses and would otherwise
    add minutes of hardware time to every CPU suite run. Also auto-apply
    the `unit` marker (mid tier) to everything outside the slow
    golden-CLI / multichip files."""
    import pytest as _pytest

    for item in items:
        if item.path.name not in _NON_UNIT_FILES and "tpu" not in item.keywords:
            item.add_marker(_pytest.mark.unit)

    markexpr = config.getoption("-m", default="") or ""
    if "tpu" in markexpr:
        return
    skip = _pytest.mark.skip(reason="real-TPU test; run with -m tpu")
    for item in items:
        if "tpu" in item.keywords:
            item.add_marker(skip)
