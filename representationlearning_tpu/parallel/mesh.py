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
