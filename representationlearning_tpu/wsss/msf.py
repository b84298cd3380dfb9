"""Multi-scale + flip (MSF) CAM inference — parity with WaveCAM's
`voc12/dataloader.py:259-287` (MSF dataset) + `step/make_cam.py:17-71` (per-image
strided / high-res CAM aggregation).

The reference shards images over GPUs with multiprocessing.spawn; here each image's
scale set is one jitted computation (cached per image-size bucket), and batch/device
sharding happens at a higher level via the mesh utilities.
"""
from __future__ import annotations

from typing import Callable, Dict, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.image import flip_lr, resize_bilinear_auto


def get_strided_size(orig_size, stride):
    return ((orig_size[0] - 1) // stride + 1, (orig_size[1] - 1) // stride + 1)


def get_strided_up_size(orig_size, stride):
    s = get_strided_size(orig_size, stride)
    return s[0] * stride, s[1] * stride


def msf_cam_single(
    cam_fn: Callable,
    image: jax.Array,
    scales: Sequence[float] = (1.0, 0.5, 1.5, 2.0),
    stride: int = 4,
    up_stride: int = 16,
):
    """image (H, W, 3) normalized. cam_fn maps (2, h, w, 3) [img; flip] to
    (2, h', w', C) CAM responses (the `CAM.forward(separate=True)` path). Returns
    (strided_cam (hs, ws, C), highres_cam (H, W, C)) — un-normalized sums over scales
    with relu'd flip-sum per scale (`resnet50_cam.py:113-121`, `make_cam.py:36-46`)."""
    H, W = image.shape[:2]
    strided = get_strided_size((H, W), stride)
    up = get_strided_up_size((H, W), up_stride)

    strided_sum = None
    highres_sum = None
    for s in scales:
        si = resize_bilinear_auto(image[None], (int(round(H * s)), int(round(W * s))))[0]
        pair = jnp.stack([si, flip_lr(si)], axis=0)
        out = cam_fn(pair)  # (2, h', w', C)
        o = jax.nn.relu(out)
        o = o[0] + flip_lr(o[1])  # flip-sum (`resnet50_cam.py:120-121`)
        sc = resize_bilinear_auto(o[None], strided)[0]
        hc = resize_bilinear_auto(o[None], up)[0][:H, :W]
        strided_sum = sc if strided_sum is None else strided_sum + sc
        highres_sum = hc if highres_sum is None else highres_sum + hc
    return strided_sum, highres_sum


def finalize_cam_dict(
    strided_cam: np.ndarray, highres_cam: np.ndarray, cls_onehot: np.ndarray
) -> Dict[str, np.ndarray]:
    """Valid-class selection + per-class max normalization (`make_cam.py:42-49`).
    Returns {"keys": (k,), "cam": (k,hs,ws), "high_res": (k,H,W)} (channel-first like
    the reference's saved dicts)."""
    keys = np.nonzero(np.asarray(cls_onehot))[0]
    sc = np.asarray(strided_cam).transpose(2, 0, 1)[keys]
    hc = np.asarray(highres_cam).transpose(2, 0, 1)[keys]
    sc = sc / (sc.max(axis=(1, 2), keepdims=True) + 1e-5)
    hc = hc / (hc.max(axis=(1, 2), keepdims=True) + 1e-5)
    return {"keys": keys, "cam": sc, "high_res": hc}


def cam_dict_to_label(cam_dict: Dict[str, np.ndarray], thres: float) -> np.ndarray:
    """Threshold-padded argmax (`eval_cam.py:18-22`, `make_sem_seg` analog): pad a
    background plane at `thres`, argmax, map through keys+1."""
    cams = cam_dict["high_res"]
    cams = np.pad(cams, ((1, 0), (0, 0), (0, 0)), mode="constant", constant_values=thres)
    keys = np.pad(cam_dict["keys"] + 1, (1, 0), mode="constant")
    return keys[np.argmax(cams, axis=0)]


def evaluate_cam_multi_thres(cam_dicts, gt_masks, num_classes: int,
                             thresholds=None) -> dict:
    """Multi-threshold CAM mIoU sweep (WaveCAM
    `step_coco/train_cam_mde_coco.py:41-80` `evaluate_cam_multi_thres`/`caculate_miou`):
    returns {threshold: miou} plus the best entry."""
    from ..metrics.seg import _fast_hist, scores_from_hist

    thresholds = list(thresholds if thresholds is not None
                      else np.arange(0.1, 0.6, 0.05))
    results = {}
    for t in thresholds:
        hist = np.zeros((num_classes, num_classes))
        for d, gt in zip(cam_dicts, gt_masks):
            pred = cam_dict_to_label(d, float(t))
            hist += _fast_hist(np.asarray(gt).flatten(), pred.flatten(), num_classes)
        results[round(float(t), 4)] = scores_from_hist(hist)["miou"]
    best_t = max(results, key=results.get)
    return {"per_threshold": results, "best_threshold": best_t, "best_miou": results[best_t]}
