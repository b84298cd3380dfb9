"""CGFL — foreground-saliency-guided losses for RSSFormer, parity with
`RSSFormer-TIP2023/module/CGFL.py` and `losses/auxloss.py:253-324`.

Key mechanism (`CGFL.py:192-273` SegmentationLossaux): the aux head's class logits are
compared to per-image class-membership vectors by `MCTransAuxLoss`, producing a
per-sample scalar l1 that becomes the DYNAMIC gamma of `softmax_focalloss`
(modulating factor (1 - p) * (1 - gamma/7), scalar-mean CE scaled by the summed
gathered factor / (n_valid + B) — exactly the reference's (unusual) reduction).
"""
from __future__ import annotations

from typing import Mapping

import jax
import jax.numpy as jnp

from .wsss import cross_entropy_ignore, select_class


def _valid(y_true, n_classes, ignore_index):
    return (y_true != ignore_index) & (y_true >= 0) & (y_true < n_classes)


def softmax_focalloss(y_pred, y_true, gamma, ignore_index: int = -1):
    """Active variant (`CGFL.py:72-100`): scalar mean-CE times the summed gathered
    modulating factor (1-p)(1-gamma/7), normalized by (n_valid + B).
    y_pred (B,H,W,C); y_true (B,H,W); gamma per-sample (B,)."""
    B = y_pred.shape[0]
    C = y_pred.shape[-1]
    ce = cross_entropy_ignore(y_pred, y_true, ignore_index)  # scalar mean
    p = jax.lax.stop_gradient(jax.nn.softmax(y_pred, axis=-1))
    g = jnp.asarray(gamma).reshape(B, 1, 1, 1)
    mod = (1.0 - p) * (1.0 - g / 7.0)
    valid = _valid(y_true, C, ignore_index)
    safe = jnp.where(valid, y_true, 0).astype(jnp.int32)
    mod = select_class(mod, safe)
    mod = jax.lax.stop_gradient(mod)
    return (ce * mod).sum() / (valid.sum() + B)


def softmax_focalloss_pow(y_pred, y_true, gamma: float = 2.0, ignore_index: int = -1,
                          normalize: bool = False):
    """`softmax_focallossy` (`CGFL.py:42-70`): classic per-pixel (1-p)^gamma focal with
    optional normalization."""
    C = y_pred.shape[-1]
    valid = _valid(y_true, C, ignore_index)
    safe = jnp.where(valid, y_true, 0).astype(jnp.int32)
    logp = jax.nn.log_softmax(y_pred, axis=-1)
    nll = -select_class(logp, safe)
    nll = jnp.where(valid, nll, 0.0)
    p = jax.lax.stop_gradient(jax.nn.softmax(y_pred, axis=-1))
    mod = (1.0 - select_class(p, safe)) ** gamma
    mod = jax.lax.stop_gradient(jnp.where(valid, mod, 0.0))
    scale = 1.0
    if normalize:
        scale = nll.sum() / jnp.maximum((nll * mod).sum(), 1e-12)
        scale = jax.lax.stop_gradient(scale)
    return scale * (nll * mod).sum() / (valid.sum() + y_pred.shape[0])


def mctrans_aux_l1(cls_score, label_map, n_classes: int):
    """MCTransAuxLoss core (`auxloss.py:253-324`): per-image class-membership one-hot
    (via unique) vs class logits; l1 = sum_c sigmoid-like(|s - m|) / (2B).
    cls_score (B, C); label_map (B, H, W) (the binary bg map in SegmentationLossaux).
    Returns (loss=0-weighted scalar, l1 (B,))."""
    B = cls_score.shape[0]
    classes = jnp.arange(n_classes, dtype=jnp.float32)
    member = (label_map[..., None] == classes).any(axis=(1, 2)).astype(jnp.float32)  # (B,C)
    l1 = 1.0 / (1.0 + jnp.exp(jnp.abs(cls_score - member)))
    l1 = l1.sum(axis=1) / (2.0 * B)
    return 0.0 * l1.sum(), l1


def binary_cross_entropy_with_logits_ignore(logit, target, ignore_index: int = -1):
    mask = target != ignore_index
    t = jnp.where(mask, target, 0.0)
    per = jnp.maximum(logit, 0) - logit * t + jnp.log1p(jnp.exp(-jnp.abs(logit)))
    per = jnp.where(mask, per, 0.0)
    return per.sum() / jnp.maximum(mask.sum(), 1)


def tversky_loss_with_logits(logit, target, alpha: float = 0.5, beta: float = 0.5,
                             ignore_index: int = -1, smooth: float = 1.0):
    mask = target != ignore_index
    t = jnp.where(mask, target, 0.0)
    p = jax.nn.sigmoid(logit) * mask
    tp = (p * t).sum()
    fp = (p * (1 - t)).sum()
    fn = ((1 - p) * t * mask).sum()
    return 1.0 - (tp + smooth) / (tp + alpha * fn + beta * fp + smooth)


def dice_loss_with_logits(y_pred, y_true, ignore_index: int = -1, smooth: float = 1.0):
    """Multiclass soft dice over softmax probs (`CGFL.py:359-418` semantics)."""
    C = y_pred.shape[-1]
    valid = _valid(y_true, C, ignore_index)
    safe = jnp.where(valid, y_true, 0).astype(jnp.int32)
    onehot = jax.nn.one_hot(safe, C) * valid[..., None]
    p = jax.nn.softmax(y_pred, axis=-1) * valid[..., None]
    inter = (p * onehot).sum(axis=(1, 2))
    denom = p.sum(axis=(1, 2)) + onehot.sum(axis=(1, 2))
    dice = (2 * inter + smooth) / (denom + smooth)
    return 1.0 - dice.mean()


def segmentation_loss_aux(y_pred, y_true, aux_logits, loss_config: Mapping,
                          ignore_index: int = -1):
    """`SegmentationLossaux.forward` (`CGFL.py:192-273`): returns a loss dict.
    y_pred (B,H,W,C); y_true (B,H,W) int (-1 ignore); aux_logits (B,C)."""
    out = {}
    C = y_pred.shape[-1]
    if "ce" in loss_config:
        bg_true = jnp.where(y_true > 0, 1.0, 0.0)
        bg_true = jnp.where(y_true == ignore_index, 0.0, bg_true)
        _, l1 = mctrans_aux_l1(aux_logits, bg_true, C)
        out["fc_loss"] = softmax_focalloss(y_pred, y_true, l1, ignore_index)
    if "fcloss" in loss_config:
        out["fc_loss_static"] = softmax_focalloss_pow(
            y_pred, y_true, loss_config["fcloss"]["gamma"], ignore_index, normalize=True
        )
    if "bceloss" in loss_config:
        bg = jnp.where(y_true > 0, 1.0, jnp.where(y_true == ignore_index, float(ignore_index), 0.0))
        out["bceloss"] = binary_cross_entropy_with_logits_ignore(
            y_pred[..., 0], bg, ignore_index
        ) * loss_config["bceloss"]["scaler"]
    if "tverloss" in loss_config:
        bg = jnp.where(y_true > 0, 1.0, jnp.where(y_true == ignore_index, float(ignore_index), 0.0))
        out["tverloss"] = tversky_loss_with_logits(
            y_pred[..., 0], bg, loss_config["tverloss"]["alpha"],
            loss_config["tverloss"]["beta"], ignore_index,
        ) * loss_config["tverloss"]["scaler"]
    if "diceloss" in loss_config:
        out["dice_loss"] = dice_loss_with_logits(y_pred, y_true, ignore_index) * (
            loss_config["diceloss"].get("scaler", 1.0)
        )
    return out


def segmentation_loss(y_pred, y_true, loss_config: Mapping, ignore_index: int = -1):
    """Plain `SegmentationLoss` (`CGFL.py:125-189`): ce / fcloss / bce / tversky / dice."""
    out = {}
    if "ce" in loss_config:
        out["ce_loss"] = cross_entropy_ignore(y_pred, y_true, ignore_index)
    if "fcloss" in loss_config:
        out["fc_loss"] = softmax_focalloss_pow(
            y_pred, y_true, loss_config["fcloss"]["gamma"], ignore_index, normalize=True
        )
    if "bceloss" in loss_config:
        bg = jnp.where(y_true > 0, 1.0, jnp.where(y_true == ignore_index, float(ignore_index), 0.0))
        out["bceloss"] = binary_cross_entropy_with_logits_ignore(
            y_pred[..., 0], bg, ignore_index
        ) * loss_config["bceloss"]["scaler"]
    if "diceloss" in loss_config:
        out["dice_loss"] = dice_loss_with_logits(y_pred, y_true, ignore_index)
    return out
