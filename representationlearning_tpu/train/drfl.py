"""DRFL training engine — parity with `DRFL-EAAI2023/model/model_dcl.py:67-333` (CGAN
engine with GAN/D terms zeroed -> effectively supervised) and `train.py:34-106`
(epoch loop, per-epoch Dice/IoU validation at byte threshold 150, save `best`), plus
the only real checkpoint-resume machinery in the reference
(`model_dcl.py:270-324` save/load + `continue_train`), here via orbax-free numpy
checkpoints with the same latest/best/epoch naming.
"""
from __future__ import annotations

import os
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..losses.dice import drfl_generator_loss
from ..metrics.seg import dice_coefficient, iou_score
from .state import TrainState


class DRFLConfig(NamedTuple):
    lr: float = 2e-4
    beta1: float = 0.5
    maintain_epoch: int = 30
    decay_epoch: int = 30
    epoch_count: int = 1
    threshold: int = 150


def linear_decay_schedule(cfg: DRFLConfig, steps_per_epoch: int):
    """`get_scheduler` lambda rule (`model_dcl.py:398-406`): flat for maintain_epoch
    epochs then linear decay to 0 over decay_epoch+1 epochs."""

    def sched(step):
        epoch = step // max(steps_per_epoch, 1)
        over = jnp.maximum(0, epoch + cfg.epoch_count - cfg.maintain_epoch)
        return cfg.lr * jnp.maximum(1.0 - over / (cfg.decay_epoch + 1.0), 0.0)

    return sched


def create_drfl_state(model, input_shape, cfg: DRFLConfig, steps_per_epoch: int, seed=0):
    variables = model.init(jax.random.PRNGKey(seed), jnp.zeros((1,) + tuple(input_shape)))
    tx = optax.adam(linear_decay_schedule(cfg, steps_per_epoch), b1=cfg.beta1, b2=0.999)
    return TrainState.create(model.apply, variables, tx)


def make_drfl_train_step(model):
    @jax.jit
    def train_step(state: TrainState, batch, key):
        A, B, C = batch["A"], batch["B"], batch["C"]
        groundtruth = (B + 1.0) / 2.0  # `model_dcl.py:118`

        def loss_fn(params):
            variables = {"params": params}
            if state.batch_stats:
                variables["batch_stats"] = state.batch_stats
            (out, out2, binm, _, _), mut = model.apply(
                variables, A, train=True, mutable=["batch_stats"],
                rngs={"dropout": key},
            )
            # engine naming: predict2=out (seg), predict=out2 (sr 2x), bin=binm
            total, parts = drfl_generator_loss(out2, out, binm, C, groundtruth)
            return total, (parts, mut)

        (total, (parts, mut)), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
        new_state = state.apply_gradients(grads, mut.get("batch_stats", state.batch_stats))
        metrics = dict(parts)
        metrics["total"] = total
        return new_state, metrics

    return train_step


def validate(model, variables, batches, threshold: int = 150):
    """Per-epoch Dice/IoU at uint8 threshold (`train.py:82-98` via `util/Dice_test`)."""

    @jax.jit
    def fwd(v, A):
        out, out2, binm, _, _ = model.apply(v, A)
        return out

    dices, ious = [], []
    for batch in batches:
        pred = np.asarray(fwd(variables, jnp.asarray(batch["A"])))
        gt = (np.asarray(batch["B"]) + 1.0) / 2.0
        pred_u8 = (pred * 255.0).clip(0, 255)
        gt_u8 = gt * 255.0
        for p, g in zip(pred_u8, gt_u8):
            dices.append(dice_coefficient(p, g, threshold))
            ious.append(iou_score(p, g, threshold))
    return {"dice": float(np.mean(dices)), "iou": float(np.mean(ious))}


def save_checkpoint(work_dir: str, tag: str, state: TrainState):
    os.makedirs(work_dir, exist_ok=True)
    np.save(os.path.join(work_dir, f"net_{tag}.npy"),
            jax.tree_util.tree_map(np.asarray, {
                "params": state.params, "batch_stats": state.batch_stats,
                "step": int(state.step),
            }), allow_pickle=True)


def load_checkpoint(work_dir: str, tag: str, state: TrainState) -> TrainState:
    d = np.load(os.path.join(work_dir, f"net_{tag}.npy"), allow_pickle=True).item()
    return state.replace(
        params=jax.tree_util.tree_map(jnp.asarray, d["params"]),
        batch_stats=jax.tree_util.tree_map(jnp.asarray, d["batch_stats"]),
        step=jnp.asarray(d["step"], jnp.int32),
    )


def train_drfl(model, train_batches_fn, val_batches_fn, cfg: DRFLConfig,
               input_shape, epochs: int, work_dir: str, log=None):
    """Epoch loop with best-Dice checkpointing (`train.py:34-106`)."""
    steps_per_epoch = max(1, len(list(train_batches_fn())))
    state = create_drfl_state(model, input_shape, cfg, steps_per_epoch)
    step_fn = make_drfl_train_step(model)
    best = -1.0
    history = []
    for ep in range(epochs):
        for i, batch in enumerate(train_batches_fn()):
            state, metrics = step_fn(
                state, {k: jnp.asarray(v) for k, v in batch.items() if k != "name"},
                jax.random.PRNGKey(ep * 10_000 + i),
            )
        scores = validate(model, state.variables, val_batches_fn(), cfg.threshold)
        history.append({"epoch": ep, **scores, "loss": float(metrics["total"])})
        if log:
            log.info("epoch %d loss=%.4f dice=%.4f iou=%.4f", ep,
                     float(metrics["total"]), scores["dice"], scores["iou"])
        save_checkpoint(work_dir, "latest", state)
        if scores["dice"] > best:
            best = scores["dice"]
            save_checkpoint(work_dir, "best", state)
    return state, history
