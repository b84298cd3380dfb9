"""Sliding-window inference over large tiles, single-chip and ICI-sharded.

The reference predicts LoveDA tiles whole (`RSSFormer-TIP2023/predict.py:29-48`); the
north star requires large-tile sliding-window inference sharded across chips with halo
exchange at tile borders (BASELINE.md) — the image-domain analog of context
parallelism (SURVEY.md §2.6).

Canonical semantics (shared by both paths so they are bit-identical): the image is
zero-padded by `halo = window - stride` rows top/bottom, windows slide at every
`stride` step over the padded rows and the (unpadded) columns, per-window logits
accumulate with a count map, the padded border is cropped, and sums divide by counts.

Sharded path: rows split across the mesh "model" axis inside shard_map. Each device
pulls `halo` input rows from both neighbors (lax.ppermute -> ICI neighbor sends),
computes exactly the windows whose start row it owns (ownership masked so no window is
double-counted), then pushes its accumulated halo strips back to the neighbors that
own those output rows.
"""
from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P

from ..parallel.collectives import halo_exchange_1d
from ..parallel.mesh import MODEL_AXIS


def _accumulate_windows(model_fn, x, window, stride, n_out, row_starts, row_weights=None):
    """x (H, W, C); run model_fn ONCE on the stacked batch of all windows (one big
    MXU-friendly batch instead of per-window calls), then scatter-add results.
    `row_weights` optionally scales each row-start's contribution (sharded ownership
    masking)."""
    H, W, C = x.shape
    row_starts = list(row_starts)
    col_starts = list(range(0, W - window + 1, stride))
    tiles = jnp.stack(
        [x[r : r + window, c : c + window] for r in row_starts for c in col_starts]
    )  # (N, w, w, C) — static slices
    outs = model_fn(tiles).astype(jnp.float32)  # (N, w, w, n_out)

    if row_weights is not None:
        wts = jnp.stack([row_weights[ri] for ri in range(len(row_starts))
                         for _ in col_starts]).astype(jnp.float32)
    else:
        wts = jnp.ones((len(row_starts) * len(col_starts),), jnp.float32)
    outs = outs * wts[:, None, None, None]

    # static flat index map: tile t, pixel (i, j) -> (r+i)*W + (c+j)
    ij = np.arange(window)
    base = np.add.outer(ij * W, ij)  # (w, w)
    idx = np.stack([(r * W + c) + base for r in row_starts for c in col_starts])
    idx_flat = jnp.asarray(idx.reshape(-1))

    acc = jnp.zeros((H * W, n_out), jnp.float32).at[idx_flat].add(
        outs.reshape(-1, n_out)
    ).reshape(H, W, n_out)
    cnt_contrib = jnp.broadcast_to(wts[:, None, None, None],
                                   (len(wts), window, window, 1))
    cnt = jnp.zeros((H * W, 1), jnp.float32).at[idx_flat].add(
        cnt_contrib.reshape(-1, 1)
    ).reshape(H, W, 1)
    return acc, cnt


def pad_for_sliding(image: jax.Array, window: int, stride: int,
                    row_multiple: int = 1):
    """Zero-pad (H, W, C) so rows are a multiple of `row_multiple*stride` (and at
    least `row_multiple * ceil(halo/stride) * stride` so every shard can hold the
    halo) and columns are fully covered by stride-stepped windows. Returns
    (padded, (H, W)). Large LoveDA tiles (e.g. 1024x1024 over 3 shards,
    `RSSFormer predict.py:29-48`) hit the ragged case."""
    H, W, C = image.shape
    halo = window - stride
    rm = row_multiple * stride
    Hp = -(-H // rm) * rm
    if halo:
        Hp = max(Hp, row_multiple * (-(-halo // stride)) * stride)
    Wp = window + max(0, -(-(max(W, window) - window) // stride)) * stride
    if (Hp, Wp) != (H, W):
        image = jnp.pad(image, ((0, Hp - H), (0, Wp - W), (0, 0)))
    return image, (H, W)


def sliding_window_predict(
    model_fn: Callable, image: jax.Array, window: int, stride: int, n_out: int
) -> jax.Array:
    """Single-chip path. image (H, W, C); ragged sizes are zero-padded to window
    coverage and cropped back. Returns averaged logits (H, W, n_out)."""
    halo = window - stride
    image, (H, W) = pad_for_sliding(image, window, stride)
    xp = jnp.pad(image, ((halo, halo), (0, 0), (0, 0)))
    row_starts = range(0, xp.shape[0] - window + 1, stride)
    acc, cnt = _accumulate_windows(model_fn, xp, window, stride, n_out, row_starts)
    out = acc[halo : halo + image.shape[0]] / jnp.maximum(
        cnt[halo : halo + image.shape[0]], 1.0)
    return out[:H, :W]


def sharded_sliding_window_predict(
    model_fn: Callable,
    image: jax.Array,
    mesh,
    window: int,
    stride: int,
    n_out: int,
) -> jax.Array:
    """Row-sharded path over the mesh "model" axis. Bit-identical to
    `sliding_window_predict` run on the same n-shard padding
    (`pad_for_sliding(image, window, stride, row_multiple=n)`); for row counts already
    divisible by n*stride the two paths see the identical image."""
    n = mesh.shape[MODEL_AXIS]
    halo = window - stride
    image, (H, W) = pad_for_sliding(image, window, stride, row_multiple=n)
    Hs = image.shape[0] // n
    assert Hs % stride == 0 and (not halo or Hs >= halo)

    def shard_fn(x_slab):  # (Hs, W, C)
        idx = jax.lax.axis_index(MODEL_AXIS)
        is_last = idx == n - 1
        if halo:
            ext = halo_exchange_1d(x_slab, halo, axis=0, axis_name=MODEL_AXIS)
        else:
            ext = x_slab
        # padded-global window start g = idx*Hs + L; shard owns g in [idx*Hs, (idx+1)*Hs)
        # plus, on the last shard only, the trailing starts up to H + 2*halo - window.
        max_L = Hs + halo - stride  # last owned start on the final shard
        row_starts = list(range(0, max_L + 1, stride)) if halo else list(range(0, Hs, stride))
        weights = [
            jnp.where((L < Hs) | is_last, 1.0, 0.0) if halo else 1.0 for L in row_starts
        ]
        acc, cnt = _accumulate_windows(model_fn, ext, window, stride, n_out, row_starts, weights)
        if halo:
            core_acc, core_cnt = acc[halo : halo + Hs], cnt[halo : halo + Hs]
            from_prev_a, from_next_a = _exchange_strips(acc, halo, idx)
            from_prev_c, from_next_c = _exchange_strips(cnt, halo, idx)
            core_acc = core_acc.at[:halo].add(from_prev_a).at[-halo:].add(from_next_a)
            core_cnt = core_cnt.at[:halo].add(from_prev_c).at[-halo:].add(from_next_c)
        else:
            core_acc, core_cnt = acc, cnt
        return core_acc / jnp.maximum(core_cnt, 1.0)

    def _exchange_strips(a, halo_, idx):
        """Send my accumulated halo strips to the shards owning those output rows;
        receive theirs. Returns (add_to_my_top, add_to_my_bottom)."""
        n_ = jax.lax.axis_size(MODEL_AXIS)
        top = a[:halo_]       # rows owned by the previous shard's core bottom
        bot = a[-halo_:]      # rows owned by the next shard's core top
        recv_from_next = jax.lax.ppermute(top, MODEL_AXIS, [(i, (i - 1) % n_) for i in range(n_)])
        recv_from_prev = jax.lax.ppermute(bot, MODEL_AXIS, [(i, (i + 1) % n_) for i in range(n_)])
        zeros = jnp.zeros_like(top)
        add_top = jnp.where(idx == 0, zeros, recv_from_prev)
        add_bot = jnp.where(idx == n_ - 1, zeros, recv_from_next)
        return add_top, add_bot

    shard = jax.shard_map(
        shard_fn, mesh=mesh,
        in_specs=P(MODEL_AXIS, None, None),
        out_specs=P(MODEL_AXIS, None, None),
    )
    return shard(image)[:H, :W]
