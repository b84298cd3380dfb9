"""Collective helpers used inside shard_map'ped compute.

The reference never writes an explicit collective (allreduce hides inside DDP backward,
`SCD-AAAI2023/scripts/dist_train_voc.py:286`; SyncBN stats inside mmcv). Here they are
first-class: gradient pmean over ICI, cross-replica batch-norm statistics, and the
neighbor halo exchange that backs sharded sliding-window inference (the image-domain
analog of context parallelism — SURVEY.md §2.6).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax


def pmean_tree(tree, axis_name: str):
    """Mean a pytree (e.g. grads) across a mesh axis — DDP gradient allreduce."""
    return jax.tree_util.tree_map(lambda x: lax.pmean(x, axis_name), tree)


def psum_tree(tree, axis_name: str):
    return jax.tree_util.tree_map(lambda x: lax.psum(x, axis_name), tree)


def sync_batch_stats(mean: jax.Array, var: jax.Array, axis_name: str):
    """SyncBN: average first and second moments across replicas
    (replaces `norm_cfg=dict(type='SyncBN')`, `segformer_head.py:53`)."""
    m = lax.pmean(mean, axis_name)
    # E[x^2] - E[x]^2 recombination keeps the cross-replica variance exact.
    second = lax.pmean(var + mean * mean, axis_name)
    return m, second - m * m


def halo_exchange_1d(x: jax.Array, halo: int, axis: int, axis_name: str) -> jax.Array:
    """Exchange `halo`-wide boundary slabs with mesh neighbors along `axis_name` and
    concatenate them onto `axis`. Edge shards get zero halos (same as conv zero-padding
    at true image borders).

    Runs inside shard_map; uses lax.ppermute so XLA lowers it to ICI neighbor sends.
    """
    n = lax.axis_size(axis_name)
    idx = lax.axis_index(axis_name)

    size = x.shape[axis]
    lo = lax.slice_in_dim(x, 0, halo, axis=axis)
    hi = lax.slice_in_dim(x, size - halo, size, axis=axis)

    right_perm = [(i, (i + 1) % n) for i in range(n)]
    left_perm = [(i, (i - 1) % n) for i in range(n)]
    from_left = lax.ppermute(hi, axis_name, right_perm)   # neighbor idx-1's top slab
    from_right = lax.ppermute(lo, axis_name, left_perm)   # neighbor idx+1's bottom slab

    zeros = jnp.zeros_like(lo)
    from_left = jnp.where(idx == 0, zeros, from_left)
    from_right = jnp.where(idx == n - 1, zeros, from_right)
    return jnp.concatenate([from_left, x, from_right], axis=axis)
