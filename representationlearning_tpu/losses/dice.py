"""DRFL losses — parity with `DRFL-EAAI2023/model/model_dcl.py`.

- dice_bce_loss (`:877-904`): (BCE(probs) + soft-dice-loss)/2 with batch-global sums
  and smooth=0.
- GANLoss (`:763-790`): lsgan (MSE) / vanilla (BCEWithLogits) against constant
  real/fake targets (the reference zeroes the GAN terms, `:148-172`, but the API
  surface is kept).
- generator loss mix (`backward_G`, `:174-188`):
  L1(predict, softmask) + 10*diceBCE(gt, predict2) + 10*diceBCE(gt, bin).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def bce_loss(pred_probs: jax.Array, target: jax.Array, eps: float = 1e-7) -> jax.Array:
    p = jnp.clip(pred_probs, eps, 1.0 - eps)
    return -(target * jnp.log(p) + (1.0 - target) * jnp.log(1.0 - p)).mean()


def soft_dice_loss(y_true: jax.Array, y_pred: jax.Array, smooth: float = 0.0) -> jax.Array:
    i = y_true.sum()
    j = y_pred.sum()
    inter = (y_true * y_pred).sum()
    score = (2.0 * inter + smooth) / (i + j + smooth)
    return 1.0 - score


def dice_bce_loss(y_true: jax.Array, y_pred: jax.Array) -> jax.Array:
    return 0.5 * (bce_loss(y_pred, y_true) + soft_dice_loss(y_true, y_pred))


def gan_loss(pred: jax.Array, target_is_real: bool, mode: str = "lsgan") -> jax.Array:
    target = jnp.full_like(pred, 1.0 if target_is_real else 0.0)
    if mode == "lsgan":
        return ((pred - target) ** 2).mean()
    if mode == "vanilla":
        return (jnp.maximum(pred, 0) - pred * target + jnp.log1p(jnp.exp(-jnp.abs(pred)))).mean()
    raise ValueError(mode)


def drfl_generator_loss(predict, predict2, binm, softmask, groundtruth):
    """`backward_G` mix. predict = out2 (sr stream), predict2 = out (seg stream), binm =
    refinement output — names follow the engine's assignment
    `self.predict2, self.predict, self.bin = netG(...)[0:3]` (`model_dcl.py:126`)."""
    l1 = jnp.abs(predict - softmask).mean()
    g_bin = dice_bce_loss(groundtruth, predict2)
    bin_l = dice_bce_loss(groundtruth, binm)
    total = l1 + 10.0 * g_bin + 10.0 * bin_l
    return total, {"G_L1": l1, "G_bin": g_bin, "bin": bin_l}
