"""Device-mesh data parallelism for the batched kernels (SURVEY.md §5.8).

The reference scales with a single-process rayon work-stealing pool
(ref: src/commands/genotype.rs:140-199). The TPU-native analog is pure
data parallelism over the batch axis of every device dispatch: loci are
independent, so a 1-D mesh ("data") with batch-sharded inputs and
replicated scalars partitions each kernel across chips with ZERO
collectives in the hot path. Cross-host scaling stacks on top via
catalog shards (`--shard-index/count`, engine/runner.py) with optional
`jax.distributed` initialization for multi-process meshes.

Usage: `enable_mesh(n)` installs a process-wide mesh; every kernel
wrapper routes its host→device uploads through `put_batch` /
`put_replicated`, so the SAME production code path runs single-chip
(mesh disabled — plain `jnp.asarray`) and multi-chip (inputs placed with
`NamedSharding(mesh, P("data", ...))`; XLA partitions the jitted program
to follow the data).
"""

import logging
import os
from typing import Optional

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

log = logging.getLogger("trgt")

_MESH: Optional[Mesh] = None


def enable_mesh(n_devices: Optional[int] = None) -> Optional[Mesh]:
    """Install a 1-D ("data",) mesh over the first n LOCAL devices.
    A 1-device request clears the mesh (single-chip fast path).

    Local (addressable) devices only: catalog shards are the cross-host
    scaling unit (collective-free, like the reference's independent
    work items, SURVEY.md §5.8), so under jax.distributed each process
    meshes over its own chips and `device_put` stays addressable."""
    global _MESH
    devices = jax.local_devices()
    n = len(devices) if n_devices is None else n_devices
    if n <= 1:
        _MESH = None
        return None
    if n > len(devices):
        raise ValueError(f"mesh over {n} devices but only "
                         f"{len(devices)} visible")
    _MESH = Mesh(np.asarray(devices[:n]), ("data",))
    log.info("Device mesh enabled: %d-way data parallelism", n)
    return _MESH


def disable_mesh() -> None:
    global _MESH
    _MESH = None


def current_mesh() -> Optional[Mesh]:
    return _MESH


def auto_enable() -> Optional[Mesh]:
    """Enable the mesh over all local devices when there are several
    (production default); honor TRGT_TPU_MESH=0/N overrides."""
    env = os.environ.get("TRGT_TPU_MESH", "")
    if env == "0":
        disable_mesh()
        return None
    try:
        n = int(env) if env else None
    except ValueError:
        n = None
    if n is None and len(jax.devices()) <= 1:
        return None
    return enable_mesh(n)


def batch_multiple() -> int:
    """Kernel batch dims must be a multiple of this (mesh size, so every
    device gets an equal shard; 1 when the mesh is off)."""
    return _MESH.devices.size if _MESH is not None else 1


def round_up_batch(b: int) -> int:
    m = batch_multiple()
    return (b + m - 1) // m * m


def batch_bucket(n: int, minimum: int = 8) -> int:
    """Shape-bucketed batch dim (kernels/bucket.py policy), rounded up
    so each mesh device gets an equal shard."""
    from .kernels.bucket import bucket
    return round_up_batch(bucket(n, minimum=minimum))


def put_batch(x) -> jax.Array:
    """Upload with the leading (batch) axis sharded across the mesh.
    The batch dim must already be a multiple of `batch_multiple()`
    (kernel wrappers bucket with that constraint)."""
    if _MESH is None:
        return jnp.asarray(x)
    spec = P("data", *([None] * (np.ndim(x) - 1)))
    return jax.device_put(x, NamedSharding(_MESH, spec))


def put_replicated(x) -> jax.Array:
    if _MESH is None:
        return jnp.asarray(x)
    return jax.device_put(x, NamedSharding(_MESH, P()))


def initialize_distributed(shard_index: int, shard_count: int) -> None:
    """Multi-process mesh scaffolding: when a coordinator address is
    provided, join the jax.distributed cluster so `jax.devices()` spans
    all hosts. Without one, per-host catalog shards run independently
    (collective-free; outputs combined host-side like the reference's
    completion-order writer, SURVEY.md §5.8)."""
    coordinator = os.environ.get("TRGT_COORDINATOR_ADDRESS")
    if not coordinator:
        log.info("Shard %d/%d running standalone (set "
                 "TRGT_COORDINATOR_ADDRESS for a multi-process mesh)",
                 shard_index, shard_count)
        return
    jax.distributed.initialize(coordinator_address=coordinator,
                               num_processes=shard_count,
                               process_id=shard_index)
    log.info("jax.distributed initialized: process %d/%d, %d devices",
             shard_index, shard_count, len(jax.devices()))
