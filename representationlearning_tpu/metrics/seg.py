"""Segmentation metrics with the exact semantics of the reference.

- fast-hist confusion / pAcc / mAcc / mIoU with the ``valid = hist.sum(1) > 0`` masking:
  `SCD-AAAI2023/utils/evaluate.py:9-35`
- pseudo_scores 255-handling: `utils/evaluate.py:38-57`
- multilabel F1: `utils/evaluate.py:4-6`
- DRFL +1-smoothed Dice/IoU at a byte threshold: `DRFL-EAAI2023/util/Dice_test.py:34-49`
- chainercv-style confusion used by WaveCAM eval (`step/eval_cam.py:27-34`) is the same
  fast-hist under the hood.

`confusion_matrix` is jit-able (device-side accumulation, psum-able across a mesh);
`scores` accepts either numpy arrays or an accumulated hist.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def confusion_matrix(label_true: jax.Array, label_pred: jax.Array, num_classes: int) -> jax.Array:
    """Device-side fast-hist: rows = true, cols = pred. Ignores labels outside
    [0, num_classes) (the 255 ignore_index convention)."""
    lt = label_true.reshape(-1).astype(jnp.int32)
    lp = label_pred.reshape(-1).astype(jnp.int32)
    mask = (lt >= 0) & (lt < num_classes)
    idx = jnp.where(mask, lt * num_classes + lp, num_classes * num_classes)
    hist = jnp.zeros((num_classes * num_classes + 1,), jnp.float32).at[idx].add(1.0)
    return hist[:-1].reshape(num_classes, num_classes)


def _fast_hist(label_true: np.ndarray, label_pred: np.ndarray, num_classes: int) -> np.ndarray:
    mask = (label_true >= 0) & (label_true < num_classes)
    hist = np.bincount(
        num_classes * label_true[mask].astype(int) + label_pred[mask],
        minlength=num_classes ** 2,
    ).reshape(num_classes, num_classes)
    return hist


def scores_from_hist(hist: np.ndarray) -> dict:
    hist = np.asarray(hist, dtype=np.float64)
    with np.errstate(divide="ignore", invalid="ignore"):
        acc = np.diag(hist).sum() / hist.sum()
        acc_cls = np.nanmean(np.diag(hist) / hist.sum(axis=1))
        iu = np.diag(hist) / (hist.sum(axis=1) + hist.sum(axis=0) - np.diag(hist))
    valid = hist.sum(axis=1) > 0
    mean_iu = np.nanmean(iu[valid]) if valid.any() else float("nan")
    return {
        "pAcc": float(acc),
        "mAcc": float(acc_cls),
        "miou": float(mean_iu),
        "iou": dict(zip(range(hist.shape[0]), iu)),
    }


def scores(label_trues, label_preds, num_classes: int = 21) -> dict:
    """Reference `scores` (`utils/evaluate.py:17-35`)."""
    hist = np.zeros((num_classes, num_classes))
    for lt, lp in zip(label_trues, label_preds):
        hist += _fast_hist(np.asarray(lt).flatten(), np.asarray(lp).flatten(), num_classes)
    return scores_from_hist(hist)


def pseudo_scores(label_trues, label_preds, num_classes: int = 21) -> dict:
    """Reference `pseudo_scores` (`utils/evaluate.py:38-57`): positions where the pseudo
    label is 255 are excluded by marking GT 255 there and zeroing the pred."""
    hist = np.zeros((num_classes, num_classes))
    for lt, lp in zip(label_trues, label_preds):
        lt = np.asarray(lt).flatten().copy()
        lp = np.asarray(lp).flatten().copy()
        lt[lp == 255] = 255
        lp[lp == 255] = 0
        hist += _fast_hist(lt, lp, num_classes)
    return scores_from_hist(hist)


def multilabel_f1(y_true: np.ndarray, y_pred: np.ndarray) -> float:
    """Binary F1 over flattened multilabel targets (`utils/evaluate.py:4-6`)."""
    y_true = np.asarray(y_true).reshape(-1).astype(bool)
    y_pred = np.asarray(y_pred).reshape(-1).astype(bool)
    tp = float((y_true & y_pred).sum())
    fp = float((~y_true & y_pred).sum())
    fn = float((y_true & ~y_pred).sum())
    denom = 2 * tp + fp + fn
    return 2 * tp / denom if denom > 0 else 0.0


def dice_coefficient(pred: np.ndarray, target: np.ndarray, threshold: int = 150) -> float:
    """DRFL boolean Dice with +1 smoothing at a uint8 threshold
    (`DRFL-EAAI2023/util/Dice_test.py:34-41`)."""
    p = np.asarray(pred) > threshold
    t = np.asarray(target) > threshold
    inter = float((p & t).sum())
    return (2.0 * inter + 1.0) / (float(p.sum()) + float(t.sum()) + 1.0)


def iou_score(pred: np.ndarray, target: np.ndarray, threshold: int = 150) -> float:
    """DRFL boolean IoU with +1 smoothing (`util/Dice_test.py:43-49`)."""
    p = np.asarray(pred) > threshold
    t = np.asarray(target) > threshold
    inter = float((p & t).sum())
    union = float((p | t).sum())
    return (inter + 1.0) / (union + 1.0)


class SegMetricAccumulator:
    """Streaming confusion accumulation; `update` can run jitted per-batch on device
    (optionally psum'ed across data-parallel shards before host transfer)."""

    def __init__(self, num_classes: int):
        self.num_classes = num_classes
        self.hist = np.zeros((num_classes, num_classes), np.float64)

    def update(self, label_true, label_pred) -> None:
        h = confusion_matrix(jnp.asarray(label_true), jnp.asarray(label_pred), self.num_classes)
        self.hist += np.asarray(h, dtype=np.float64)

    def compute(self) -> dict:
        return scores_from_hist(self.hist)
