"""Device mesh / sharding utilities — the TPU-native replacement for the reference's
distributed substrate (torch DDP over NCCL: `SCD-AAAI2023/scripts/dist_train_voc.py:185,286`;
`ever` th_amp_ddp for RSSFormer; `multiprocessing.spawn` sharded inference in WaveCAM
`step/make_cam.py:62-69`).

Design: a single global `Mesh` with axes ("data", "model"); training is data-parallel
(grads averaged by XLA-inserted collectives under jit, replacing NCCL allreduce), large-tile
inference shards the spatial dimension over "model" with halo exchange (see
`infer/sliding.py`). Multi-host would extend this via `jax.distributed.initialize`; data
sharding by `jax.process_index()` replaces `DistributedSampler`.
"""
from __future__ import annotations

from typing import Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


DATA_AXIS = "data"
MODEL_AXIS = "model"


def initialize_multihost(coordinator_address: str | None = None,
                         num_processes: int | None = None,
                         process_id: int | None = None) -> bool:
    """Multi-host entry (`SURVEY.md §2.6`): wire `jax.distributed.initialize` so a
    multi-host slice (DCN between hosts, ICI within) presents one global device set.

    Reads JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES / JAX_PROCESS_ID when args are
    None (the standard launcher contract; on Cloud TPU pods a bare
    `jax.distributed.initialize()` autodetects). Returns True when a multi-process
    runtime was initialized, False for the single-process (local) case. Idempotent.
    """
    import os

    coordinator_address = coordinator_address or os.environ.get("JAX_COORDINATOR_ADDRESS")
    env_np = os.environ.get("JAX_NUM_PROCESSES")
    env_pid = os.environ.get("JAX_PROCESS_ID")
    num_processes = num_processes if num_processes is not None else (
        int(env_np) if env_np else None)
    process_id = process_id if process_id is not None else (
        int(env_pid) if env_pid else None)
    if coordinator_address is None and num_processes is None:
        return False  # single process — nothing to do
    # NOTE: the idempotence guard must NOT be jax.process_count() — that call
    # initializes the XLA backend, after which jax.distributed.initialize()
    # refuses to run (found by the 2-process CPU test).
    if jax.distributed.is_initialized():
        return True
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )
    return True


def process_local_slice(global_indices: np.ndarray) -> np.ndarray:
    """The `DistributedSampler` replacement (`dist_train_voc.py:214`): each host takes
    its `process_index()`-strided subset of the global sample indices; devices on the
    host then receive contiguous sub-shards via `shard_batch`."""
    return np.asarray(global_indices)[jax.process_index()::jax.process_count()]


def make_mesh(n_data: int | None = None, n_model: int = 1, devices=None) -> Mesh:
    """Create a ("data", "model") mesh over the available devices."""
    devices = list(devices if devices is not None else jax.devices())
    if n_data is None:
        n_data = len(devices) // n_model
    use = n_data * n_model
    arr = np.asarray(devices[:use]).reshape(n_data, n_model)
    return Mesh(arr, (DATA_AXIS, MODEL_AXIS))


def data_sharding(mesh: Mesh) -> NamedSharding:
    """Batch-sharded over the data axis (leading dim)."""
    return NamedSharding(mesh, P(DATA_AXIS))

def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch):
    """Place a host batch (pytree, leading dim = global batch) shard-wise on the mesh."""
    sh = data_sharding(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), batch)


def replicate(mesh: Mesh, tree):
    sh = replicated(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), tree)


def spatial_sharding(mesh: Mesh, axis: int, ndim: int) -> NamedSharding:
    """Shard one spatial axis of an image tensor over the model axis (for sliding-window
    halo-exchange inference)."""
    spec: list = [None] * ndim
    spec[axis] = MODEL_AXIS
    return NamedSharding(mesh, P(*spec))


def local_batch_size(global_batch: int, mesh: Mesh) -> int:
    n = mesh.shape[DATA_AXIS]
    if global_batch % n:
        raise ValueError(f"global batch {global_batch} not divisible by data-parallel size {n}")
    return global_batch // n


def pad_to_multiple(x: np.ndarray, multiple: int, axis: int = 0, value=0):
    """Pad leading batch to a device-divisible size; returns (padded, n_valid)."""
    n = x.shape[axis]
    rem = (-n) % multiple
    if rem == 0:
        return x, n
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, rem)
    return np.pad(x, widths, constant_values=value), n
