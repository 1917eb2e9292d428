"""Device mesh + sharding policy for UC-NeRF training and rendering.

TPU-native replacement for the reference's accelerate/DDP layer (SURVEY.md
§2.4): rays are data-parallel over a 1-D (or host x chip 2-D) mesh, model
parameters are replicated, and the gradient all-reduce is the psum XLA
inserts for the pjit backward pass — overlapped with compute by the XLA
latency-hiding scheduler instead of DDP bucketing (reference: train.py:44,95,
models.py:937-979).

The same sharded program serves eval: chunks of rays are laid out along the
'data' axis, replacing the reference's pad/slice/accelerator.gather dance
(models.py:943-979).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"


def create_mesh(devices: Optional[Sequence[jax.Device]] = None,
                shape: Optional[Sequence[int]] = None) -> Mesh:
    """1-D data-parallel mesh over all (or the given) devices.

    `shape` reshapes devices into (host, chip)-style axes later; for now the
    only training parallelism in scope is DP over rays, matching the
    reference's capability while leaving the axis name stable for multi-host.
    """
    if devices is None:
        devices = jax.devices()
    devs = np.asarray(devices)
    if shape is not None:
        devs = devs.reshape(shape)
        axis_names = tuple(f"axis{i}" for i in range(devs.ndim - 1)) + (
            DATA_AXIS,)
        return Mesh(devs, axis_names)
    return Mesh(devs, (DATA_AXIS,))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (ray) axis across the data axis."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    """Fully replicate (parameters, scalars)."""
    return NamedSharding(mesh, P())


def process_slice(n: int, process_index: Optional[int] = None,
                  process_count: Optional[int] = None):
    """This process's [start, stop) slice of a global leading axis of size n.

    The per-process split of the global batch (reference datasets.py:278:
    per-process batch = batch_size // world_size).  n must divide evenly —
    callers pad with pad_rays_to_multiple first.
    """
    pi = jax.process_index() if process_index is None else process_index
    pc = jax.process_count() if process_count is None else process_count
    if n % pc != 0:
        raise ValueError(f"global batch {n} not divisible by {pc} processes")
    per = n // pc
    return pi * per, (pi + 1) * per


def shard_batch(batch, mesh: Mesh):
    """Put a GLOBAL host ray batch on the mesh, leading axis sharded.

    Single process: a plain sharded device_put.  Multi-process: every host
    must hold the same global numpy batch (identically-seeded sampling); each
    host contributes its process_slice and the global jax.Array is assembled
    with make_array_from_process_local_data — device_put of host-local numpy
    onto a multi-host NamedSharding is NOT valid there.
    """
    sharding = batch_sharding(mesh)
    if jax.process_count() == 1:
        return jax.tree.map(lambda x: jax.device_put(x, sharding), batch)

    def put(x):
        lo, hi = process_slice(x.shape[0])
        return jax.make_array_from_process_local_data(
            sharding, np.asarray(x[lo:hi]), x.shape)

    return jax.tree.map(put, batch)


def shard_local_batch(local_batch, mesh: Mesh,
                      process_count: Optional[int] = None):
    """Assemble a global sharded batch from PER-PROCESS host slices.

    The efficient multi-host input path: each host samples only its
    batch_size // process_count rays (with a process-folded seed) and never
    materializes the global batch.  Single-process this is shard_batch.
    """
    pc = jax.process_count() if process_count is None else process_count
    if pc == 1:
        return shard_batch(local_batch, mesh)
    sharding = batch_sharding(mesh)

    def put(x):
        x = np.asarray(x)
        global_shape = (x.shape[0] * pc,) + x.shape[1:]
        return jax.make_array_from_process_local_data(sharding, x,
                                                      global_shape)

    return jax.tree.map(put, local_batch)


def initialize_multihost(coordinator_address: Optional[str] = None,
                         num_processes: Optional[int] = None,
                         process_id: Optional[int] = None):
    """Initialize jax.distributed for multi-host training.

    TPU-native replacement for accelerate's process-group init
    (reference train.py:44): on TPU pods the arguments are discovered from
    the environment; explicit args support CPU/GPU clusters.  Safe to call
    when already initialized or single-host (no-op).
    """
    import jax

    if jax.process_count() > 1:
        return  # already initialized
    try:
        if coordinator_address is not None:
            jax.distributed.initialize(coordinator_address, num_processes,
                                       process_id)
        else:
            jax.distributed.initialize()
    except (ValueError, RuntimeError):
        pass  # single-host / no cluster env: run locally


def is_main_process() -> bool:
    """host-0-only I/O gating (reference train.py:118,232)."""
    import jax
    return jax.process_index() == 0


def fetch_to_host(x):
    """jax.Array -> host numpy, valid on every process.

    The eval-reassembly primitive (replaces accelerator.gather,
    models.py:965-968): fully-addressable arrays (replicated outputs, or any
    output in single-process runs) are fetched directly; outputs that stay
    sharded across processes are all-gathered first so every host sees the
    complete array."""
    import jax
    if getattr(x, "is_fully_addressable", True):
        return np.asarray(x)
    from jax.experimental import multihost_utils
    return np.asarray(multihost_utils.process_allgather(x, tiled=True))


def pad_rays_to_multiple(batch, multiple: int):
    """Pad a flat ray batch so its leading axis divides the mesh size.

    Returns (padded_batch, num_padding).  Mirrors the reference's chunk
    padding (models.py:946-951) but with zero-copy numpy edge padding.
    """
    n = next(iter(batch.values())).shape[0]
    rem = n % multiple
    if rem == 0:
        return batch, 0
    pad = multiple - rem
    padded = {
        k: np.concatenate([v, np.repeat(v[-1:], pad, axis=0)], axis=0)
        for k, v in batch.items()
    }
    return padded, pad
