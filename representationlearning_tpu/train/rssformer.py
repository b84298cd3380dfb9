"""RSSFormer / LoveDA trainer — the native replacement for the external `ever`
package's `th_amp_ddp` trainer the reference delegates to
(`RSSFormer-TIP2023/train.py:77-80`; config `configs/base/loveda.py:63-112`):
SGD momentum 0.9 wd 1e-4, poly lr 0.01^0.9 over 30k iters, grad-clip 35, AMP
(-> bfloat16 compute on TPU), SyncBN (free under pjit), loss-dict summation, periodic
eval with PixelMetric (-> metrics.seg).
"""
from __future__ import annotations

from typing import Any, NamedTuple

import jax
import jax.flatten_util  # noqa: F401  (registers jax.flatten_util)
import jax.numpy as jnp
import numpy as np

from ..metrics.seg import SegMetricAccumulator
from ..train.optim import make_sgd, poly_schedule
from .state import TrainState


class RSSFormerTrainConfig(NamedTuple):
    base_lr: float = 0.01
    power: float = 0.9
    max_iters: int = 30000
    momentum: float = 0.9
    weight_decay: float = 1e-4
    grad_clip: float = 35.0
    num_classes: int = 7
    ignore_index: int = -1


BN_MOMENTUM = 0.9  # every BN in the RSSFormer stack (hrnet.py::_bn, MlpDWBN, neck)


def make_rssformer_train_step(model, cfg: RSSFormerTrainConfig):
    defer = getattr(model, "defer_bn_ema", False)

    @jax.jit
    def train_step(state: TrainState, batch, key):
        def loss_fn(params):
            variables = {"params": params}
            # Deferred-EMA mode: train-mode RawStatBatchNorm never reads running
            # stats, so the collection isn't passed in; `mutated` then holds the
            # RAW batch stats for every layer.
            if not defer and state.batch_stats:
                variables["batch_stats"] = state.batch_stats
            loss_dict, mutated = model.apply(
                variables, batch["image"], batch["mask"], train=True,
                mutable=["batch_stats"], rngs={"dropout": key},
            )
            total = sum(loss_dict.values())
            return total, (loss_dict, mutated)

        (total, (loss_dict, mutated)), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params
        )
        if defer:
            # One fused EMA across all ~400 BN layers (vs ~800 tiny per-layer
            # dispatches); per element identical to flax's in-module update.
            flat_raw, _ = jax.flatten_util.ravel_pytree(mutated["batch_stats"])
            new_bs = BN_MOMENTUM * state.batch_stats + (1.0 - BN_MOMENTUM) * flat_raw
        else:
            new_bs = mutated.get("batch_stats", state.batch_stats)
        new_state = state.apply_gradients(grads, new_bs)
        metrics = dict(loss_dict)
        metrics["total"] = total
        return new_state, metrics

    return train_step


def make_rssformer_eval_step(model):
    @jax.jit
    def eval_step(variables, image):
        return model.apply(variables, image)  # softmax probs

    return eval_step


def create_rssformer_state(model, input_shape, cfg: RSSFormerTrainConfig, seed: int = 0):
    variables = model.init(jax.random.PRNGKey(seed), jnp.zeros((1,) + tuple(input_shape)))
    tx = make_sgd(
        cfg.base_lr, cfg.weight_decay, cfg.momentum,
        schedule=poly_schedule(cfg.base_lr, cfg.max_iters, cfg.power),
        grad_clip_norm=cfg.grad_clip,
    )
    state = TrainState.create(model.apply, variables, tx)
    if getattr(model, "defer_bn_ema", False):
        flat, unravel = jax.flatten_util.ravel_pytree(variables["batch_stats"])
        state = state.replace(batch_stats=flat, bs_unravel=unravel)
    return state


def evaluate(model, variables, batches, num_classes: int, tta_transforms=None) -> dict:
    """PixelMetric-style evaluation (`train.py:14-56` evaluate_cls_fn), optionally with
    TTA (`eval.py:58-65`)."""
    from ..infer.tta import tta as tta_fn

    eval_step = make_rssformer_eval_step(model)
    acc = SegMetricAccumulator(num_classes)
    for image, mask in batches:
        image = jnp.asarray(image)
        if tta_transforms:
            probs = tta_fn(lambda v: eval_step(variables, v), image, tta_transforms)
        else:
            probs = eval_step(variables, image)
        pred = np.asarray(probs.argmax(-1))
        acc.update(np.asarray(mask), pred)
    return acc.compute()
