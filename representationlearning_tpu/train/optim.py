"""Optimizers & schedules — optax equivalents of the reference's PolyWarmupAdamW/SGD
(`SCD-AAAI2023/utils/optimizer.py:3-65`) with its 4 param groups
(`scripts/dist_train_voc.py:254-284`): backbone @ base lr, encoder norms frozen,
cls/seg heads @ 10x lr.

The reference mutates group lrs inside `.step()` from `global_step`; here the same
curves are optax schedules, and groups are leaf labels for `optax.multi_transform`.
"""
from __future__ import annotations

from typing import Callable, Mapping

import jax
import jax.flatten_util
import jax.numpy as jnp
import optax
from flax import traverse_util


def poly_warmup_schedule(
    base_lr: float,
    warmup_iter: int,
    max_iter: int,
    warmup_ratio: float = 1e-6,
    power: float = 1.0,
) -> Callable:
    """AdamW variant (`optimizer.py:18-28`): linear warmup from ratio*lr, then
    (1 - t/max)^power poly decay."""

    def sched(step):
        step = jnp.asarray(step, jnp.float32)
        warm = 1.0 - (1.0 - step / max(warmup_iter, 1)) * (1.0 - warmup_ratio)
        poly = (1.0 - step / max_iter) ** power
        lr_mult = jnp.where(step < warmup_iter, warm, jnp.maximum(poly, 0.0))
        return base_lr * lr_mult

    return sched


def poly_warmup_sgd_schedule(
    base_lr: float, warmup_iter: int, max_iter: int, power: float = 0.9
) -> Callable:
    """SGD variant (`optimizer.py:35-65`): 10x poly warmup then shifted poly decay."""

    def sched(step):
        step = jnp.asarray(step, jnp.float32)
        warm = 10.0 * (1.0 - step / max(warmup_iter, 1)) ** power
        poly = (
            1.0 - (step - warmup_iter) / max(max_iter - warmup_iter, 1)
        ) ** power
        return base_lr * jnp.where(step < warmup_iter, warm, jnp.maximum(poly, 0.0))

    return sched


def poly_schedule(base_lr: float, max_iter: int, power: float = 0.9) -> Callable:
    """Plain poly lr (WaveCAM PolyOptimizer `misc/torchutils.py:9-24`; RSSFormer
    `configs/base/loveda.py:96-102`)."""

    def sched(step):
        step = jnp.asarray(step, jnp.float32)
        return base_lr * jnp.maximum(1.0 - step / max_iter, 0.0) ** power

    return sched


def tscd_param_labels(params: Mapping) -> Mapping:
    """Label leaves with the reference's 4 groups (`TSCD_model.py:44-62`):
    encoder norms -> 'norm' (frozen), other encoder -> 'backbone',
    classifier + attn_proj -> 'head10', decoder -> 'head10'."""
    flat = traverse_util.flatten_dict(params)
    labels = {}
    for path in flat:
        if path[0] == "encoder":
            is_norm = any("norm" in p for p in path[1:])
            labels[path] = "norm" if is_norm else "backbone"
        else:
            labels[path] = "head10"
    return traverse_util.unflatten_dict(labels)


def make_poly_warmup_adamw(
    learning_rate: float,
    weight_decay: float,
    warmup_iter: int,
    max_iter: int,
    warmup_ratio: float = 1e-6,
    power: float = 1.0,
    betas=(0.9, 0.999),
    param_labels: Mapping | Callable | None = None,
    grad_clip_norm: float | None = None,
) -> optax.GradientTransformation:
    """Full reference optimizer. Without `param_labels`, a single group at base lr."""

    def group(mult):
        return optax.adamw(
            learning_rate=poly_warmup_schedule(
                learning_rate * mult, warmup_iter, max_iter, warmup_ratio, power
            ),
            b1=betas[0],
            b2=betas[1],
            eps=1e-8,
            weight_decay=weight_decay if mult > 0 else 0.0,
        )

    if param_labels is None:
        tx = group(1.0)
    else:
        tx = optax.multi_transform(
            {"backbone": group(1.0), "norm": optax.set_to_zero(), "head10": group(10.0)},
            param_labels,
        )
    if grad_clip_norm is not None:
        tx = optax.chain(optax.clip_by_global_norm(grad_clip_norm), tx)
    return tx


def flatten_transform(inner: optax.GradientTransformation) -> optax.GradientTransformation:
    """Run `inner` on ONE raveled vector of the whole param tree.

    A BN-heavy model (HRNetV2: ~400 norm layers, ~700 leaves) turns a leaf-wise
    optimizer chain into thousands of 16-66 us device ops per step — profiled at
    ~100 ms/step of f32[]/f32[32..256] traffic on the RSSFormer trainer. On the
    flat vector, clip-by-global-norm is one reduction and SGD+momentum+decay are
    three big elementwise ops; the ravel/unravel concat+split costs ~1 ms. The
    math is identical (same elementwise updates, same global norm)."""
    def init(params):
        flat, _ = jax.flatten_util.ravel_pytree(params)
        return inner.init(flat)

    def update(grads, state, params=None):
        gflat, unravel = jax.flatten_util.ravel_pytree(grads)
        pflat = jax.flatten_util.ravel_pytree(params)[0] if params is not None else None
        new_gflat, state = inner.update(gflat, state, pflat)
        return unravel(new_gflat), state

    return optax.GradientTransformation(init, update)


def make_sgd(
    learning_rate: float,
    weight_decay: float = 1e-4,
    momentum: float = 0.9,
    schedule: Callable | None = None,
    grad_clip_norm: float | None = None,
    flat: bool = True,
) -> optax.GradientTransformation:
    """SGD+momentum with decoupled-from-nothing (torch-style L2) weight decay
    (RSSFormer `configs/base/loveda.py:63-67`, grad_clip 35 `:74-77`).
    `flat=True` applies the chain to the raveled param vector (same math, far
    fewer device ops — see `flatten_transform`)."""
    parts = []
    if grad_clip_norm is not None:
        parts.append(optax.clip_by_global_norm(grad_clip_norm))
    if weight_decay:
        parts.append(optax.add_decayed_weights(weight_decay))
    parts.append(optax.sgd(schedule or learning_rate, momentum=momentum))
    chain = optax.chain(*parts)
    return flatten_transform(chain) if flat else chain


def sgdr_schedule(base_lr: float, steps_per_epoch: int, epoch_start: int = 1,
                  restart_mult: int = 2, total_steps: int | None = None):
    """Warm-restart cosine schedule (WaveCAM SGDROptimizer,
    `misc/torchutils.py:33-63`): cosine within a window whose length multiplies by
    `restart_mult` at each restart; amplitude decays by 1/(restarts+1).

    Built as a host-side table (restart boundaries are data-dependent in the
    reference's stateful step) — total_steps bounds the table length."""
    import numpy as _np

    total = total_steps or steps_per_epoch * 128
    lrs = _np.zeros((total,), _np.float32)
    local, max_step, restarts = 0, steps_per_epoch * epoch_start, 0
    for g in range(total):
        if local >= max_step:
            local = 0
            max_step *= restart_mult
            restarts += 1
        lrs[g] = base_lr * (1 + _np.cos(_np.pi * local / max_step)) / 2 / (restarts + 1)
        local += 1
    table = jnp.asarray(lrs)

    def sched(step):
        return table[jnp.clip(step, 0, total - 1)]

    return sched
