"""DRFL test harness — parity with `DRFL-EAAI2023/test.py:17-125` (Dice/IoU/acc/
sensitivity/precision at a byte threshold), `test_select.py` (threshold sweep to pick
the best), and `util/html.py:1-53` (HTML result gallery)."""
from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np

from ..metrics.seg import dice_coefficient, iou_score


def binary_stats(pred_u8: np.ndarray, gt_u8: np.ndarray, threshold: int = 150) -> dict:
    p = np.asarray(pred_u8) > threshold
    t = np.asarray(gt_u8) > threshold
    tp = float((p & t).sum())
    tn = float((~p & ~t).sum())
    fp = float((p & ~t).sum())
    fn = float((~p & t).sum())
    return {
        "dice": dice_coefficient(pred_u8, gt_u8, threshold),
        "iou": iou_score(pred_u8, gt_u8, threshold),
        "acc": (tp + tn) / max(tp + tn + fp + fn, 1),
        "sen": tp / max(tp + fn, 1),
        "pre": tp / max(tp + fp, 1),
    }


def evaluate_drfl(model, variables, batches, threshold: int = 150) -> dict:
    @jax.jit
    def fwd(v, A):
        out, out2, binm, _, _ = model.apply(v, A)
        return out

    keys = ("dice", "iou", "acc", "sen", "pre")
    acc = {k: [] for k in keys}
    for batch in batches:
        pred = np.asarray(fwd(variables, jnp.asarray(batch["A"]))) * 255.0
        gt = (np.asarray(batch["B"]) + 1.0) / 2.0 * 255.0
        for p, g in zip(pred, gt):
            s = binary_stats(p, g, threshold)
            for k in keys:
                acc[k].append(s[k])
    return {k: float(np.mean(v)) for k, v in acc.items()}


def threshold_sweep(model, variables, batches, thresholds=range(50, 250, 10)) -> dict:
    """`test_select.py`: sweep thresholds, return the best by Dice."""
    batches = list(batches)
    results = {int(t): evaluate_drfl(model, variables, iter(batches), t) for t in thresholds}
    best_t = max(results, key=lambda t: results[t]["dice"])
    return {"best_threshold": best_t, "best": results[best_t], "all": results}


def write_html_gallery(out_dir: str, rows, title: str = "results") -> str:
    """`util/html.py` equivalent: rows = [(name, [(label, image_relpath), ...])]."""
    os.makedirs(out_dir, exist_ok=True)
    path = os.path.join(out_dir, "index.html")
    with open(path, "w") as f:
        f.write(f"<html><head><title>{title}</title></head><body><h1>{title}</h1>\n")
        for name, cells in rows:
            f.write(f"<h3>{name}</h3><table><tr>\n")
            for label, rel in cells:
                f.write(
                    f"<td><img src='{rel}' width='256'/><br/>{label}</td>\n"
                )
            f.write("</tr></table>\n")
        f.write("</body></html>\n")
    return path
