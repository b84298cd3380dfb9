"""Path indexing + random-walk propagation (IRN) — parity with
`WaveCAM-TMM2023/misc/indexing.py`.

PathIndex enumerates, host-side in numpy, all discrete line paths to destinations
within `radius` (grouped by path length); `edge_to_affinity` turns a per-pixel edge map
into per-path affinities (1 - max edge along the path); the sparse affinities scatter
into a dense symmetric (N, N) matrix whose beta-power, column-normalized, is squared
`exp_times` times (a 2^exp_times-step walk, `indexing.py:141-166`). The (HW)x(HW)
matrix powers are plain jnp matmuls — exactly the dense structure the MXU is for.
"""
from __future__ import annotations

from functools import partial
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np


class PathIndex:
    """Precomputed path indices over a (H, W) grid (`indexing.py:6-88`)."""

    def __init__(self, radius: float, default_size: tuple[int, int]):
        self.radius = radius
        self.radius_floor = int(np.ceil(radius) - 1)
        self.search_paths, self.search_dst = self._search_paths_dst(radius)
        self.path_indices, self.src_indices, self.dst_indices = self._path_indices(default_size)

    @staticmethod
    def _search_paths_dst(max_radius):
        by_length = {}
        search_dirs = [(0, x) for x in range(1, int(max_radius))]
        for y in range(1, int(max_radius)):
            for x in range(-int(max_radius) + 1, int(max_radius)):
                if x * x + y * y < max_radius ** 2:
                    search_dirs.append((y, x))

        order = []  # keep insertion order of lengths like the reference's list-by-length
        for dy, dx in search_dirs:
            length_sq = dy * dy + dx * dx
            coords = []
            min_y, max_y = sorted((0, dy))
            min_x, max_x = sorted((0, dx))
            for y in range(min_y, max_y + 1):
                for x in range(min_x, max_x + 1):
                    if (dy * x - dx * y) ** 2 / length_sq < 1:
                        coords.append([y, x])
            coords.sort(key=lambda c: -abs(c[0]) - abs(c[1]))
            L = len(coords)
            if L not in by_length:
                by_length[L] = []
                order.append(L)
            by_length[L].append(coords)

        paths = [np.asarray(by_length[L]) for L in sorted(order)]
        dst = np.concatenate([p[:, 0] for p in paths], axis=0)
        return paths, dst

    def _path_indices(self, size):
        H, W = size
        full = np.arange(H * W, dtype=np.int64).reshape(H, W)
        rf = self.radius_floor
        ch, cw = H - rf, W - 2 * rf

        path_indices = []
        for paths in self.search_paths:
            group = []
            for p in paths:
                rows = []
                for dy, dx in p:
                    rows.append(full[dy : dy + ch, rf + dx : rf + dx + cw].reshape(-1))
                group.append(rows)
            path_indices.append(np.asarray(group))
        src = full[:ch, rf : rf + cw].reshape(-1)
        dst = np.concatenate([p[:, 0] for p in path_indices], axis=0)
        return path_indices, src, dst


def edge_to_affinity(edge: jax.Array, path_indices: Sequence[np.ndarray]) -> jax.Array:
    """edge (B, H*W) flattened edge probabilities -> (B, n_paths_total, n_positions):
    affinity = 1 - max(edge along path) (`indexing.py:91-109`)."""
    affs = []
    for ind in path_indices:
        idx = jnp.asarray(ind)  # (n_paths, path_len, n_pos)
        gathered = edge[:, idx.reshape(-1)].reshape(edge.shape[0], *idx.shape)
        affs.append(1.0 - gathered.max(axis=2))
    return jnp.concatenate(affs, axis=1)


def affinity_sparse2dense(
    aff_sparse: jax.Array, ind_from: np.ndarray, ind_to: np.ndarray, n_vertices: int
) -> jax.Array:
    """Scatter sparse path affinities into a dense symmetric matrix with unit diagonal
    (`indexing.py:112-129`). aff_sparse: (n_paths_total, n_pos) single image."""
    vals = aff_sparse.reshape(-1)
    i_from = jnp.asarray(np.tile(ind_from, aff_sparse.shape[0]))
    i_to = jnp.asarray(ind_to.reshape(-1))
    dense = jnp.zeros((n_vertices, n_vertices), vals.dtype)
    dense = dense.at[i_from, i_to].add(vals)
    dense = dense.at[i_to, i_from].add(vals)
    dense = dense.at[jnp.arange(n_vertices), jnp.arange(n_vertices)].add(1.0)
    return dense


def to_transition_matrix(affinity_dense: jax.Array, beta: float, times: int) -> jax.Array:
    """Column-normalized beta-power affinity, squared `times` times
    (`indexing.py:131-139`)."""
    scaled = affinity_dense ** beta
    trans = scaled / scaled.sum(axis=0, keepdims=True)

    def body(t, _):
        return jnp.matmul(t, t, preferred_element_type=jnp.float32), None

    trans, _ = jax.lax.scan(body, trans, None, length=times)
    return trans


def propagate_to_edge(
    x: jax.Array, edge: jax.Array, radius: int = 5, beta: float = 10, exp_times: int = 8
) -> jax.Array:
    """Random-walk CAM propagation constrained by edges (`indexing.py:141-166`).
    x: (C, H, W) CAM volume; edge: (H, W) edge probability. Returns (C, 1, H, W)
    flattened as (C, H, W) here."""
    C, H, W = x.shape
    hor_p, ver_p = W + radius * 2, H + radius
    pidx = PathIndex(radius=radius, default_size=(ver_p, hor_p))

    edge_padded = jnp.pad(edge, ((0, radius), (radius, radius)), constant_values=1.0)
    sparse = edge_to_affinity(edge_padded.reshape(1, -1), pidx.path_indices)[0]
    dense = affinity_sparse2dense(sparse, pidx.src_indices, pidx.dst_indices, ver_p * hor_p)
    dense = dense.reshape(ver_p, hor_p, ver_p, hor_p)
    dense = dense[:-radius, radius:-radius, :-radius, radius:-radius]
    dense = dense.reshape(H * W, H * W)

    trans = to_transition_matrix(dense, beta=beta, times=exp_times)
    xm = (x * (1.0 - edge)[None]).reshape(C, H * W)
    rw = jnp.matmul(xm, trans, preferred_element_type=jnp.float32)
    return rw.reshape(C, H, W)


class GetAffinityLabelFromIndices:
    """bg-pos / fg-pos / neg affinity labels from a reduced pseudo-label map
    (`voc12/dataloader.py:82-108`)."""

    def __init__(self, indices_from: np.ndarray, indices_to: np.ndarray):
        self.indices_from = indices_from
        self.indices_to = indices_to

    def __call__(self, segm_map: np.ndarray):
        flat = segm_map.reshape(-1)
        lab_from = flat[self.indices_from][None]
        lab_to = flat[self.indices_to]
        valid = (lab_from < 21) & (lab_to < 21)
        equal = lab_from == lab_to
        pos = equal & valid
        bg_pos = (pos & (lab_from == 0)).astype(np.float32)
        fg_pos = (pos & (lab_from > 0)).astype(np.float32)
        neg = (~equal & valid).astype(np.float32)
        return bg_pos, fg_pos, neg
