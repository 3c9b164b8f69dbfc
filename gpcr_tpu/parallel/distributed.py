"""Multi-host initialization for training/rendering fleets.

The reference's distributed story is torchrun + DDP config keys with no
shipped trainer (options.yaml:154,180). The TPU-native equivalent is
``jax.distributed.initialize`` + the ('dp', 'sp') mesh from
``parallel.sharding`` — GSPMD inserts ICI/DCN collectives; no NCCL-style
process groups are managed by hand.

Usage (one call per host process, before any jax computation):

    from gpcr_tpu.parallel import distributed
    distributed.initialize()          # env-driven (TPU pods: automatic)
    mesh = sharding.make_mesh()       # spans ALL hosts' devices

On a single host this is a no-op (jax.distributed is only required when
processes must coordinate); the same training step runs unchanged.
"""

from __future__ import annotations

import os
import typing as T

import jax


def initialize(
    coordinator_address: T.Optional[str] = None,
    num_processes: T.Optional[int] = None,
    process_id: T.Optional[int] = None,
) -> bool:
    """Initialize jax.distributed when running multi-process; no-op for a
    single process. Returns True if distributed init ran.

    On TPU pods the arguments are discovered from the environment; for
    manual clusters pass coordinator_address ('host:port'), num_processes,
    and process_id (or set JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES /
    JAX_PROCESS_ID).
    """
    coordinator_address = coordinator_address or os.environ.get(
        "JAX_COORDINATOR_ADDRESS"
    )
    if num_processes is None and os.environ.get("JAX_NUM_PROCESSES"):
        num_processes = int(os.environ["JAX_NUM_PROCESSES"])
    if process_id is None and os.environ.get("JAX_PROCESS_ID"):
        process_id = int(os.environ["JAX_PROCESS_ID"])

    hosts = os.environ.get("TPU_WORKER_HOSTNAMES", "")
    multiprocess = (
        coordinator_address is not None
        or (num_processes or 1) > 1
        or len([h for h in hosts.split(",") if h]) > 1
    )
    if not multiprocess:
        return False
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )
    return True


def local_batch_slice(global_batch: int) -> slice:
    """The [start, end) slice of a global batch this process owns under
    plain dp sharding (hosts load disjoint shards; device_put with the
    mesh sharding assembles the global array)."""
    p = jax.process_count()
    i = jax.process_index()
    per = -(-global_batch // p)
    return slice(i * per, min((i + 1) * per, global_batch))
