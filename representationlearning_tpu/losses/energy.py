"""DenseEnergy (CRF relaxation) loss — parity with `SCD-AAAI2023/utils/losses.py:35-116`,
with the GPU->CPU->C++/OpenMP round-trip replaced by the on-device bilateral grid
(`ops/bilateral.py`), keeping the reference's hand-written gradient via custom_vjp
(grad = -2 * A S / N * ROI, `losses.py:86-91`).

Pipeline (reference `get_energy_loss` + `DenseEnergyLoss.forward`):
  denormalize image -> downscale (image/ROI/label nearest, probs bilinear) ->
  Gate = clamp(ROI - max_cls(prob), 0) with unlabeled regions forced to 1 ->
  S = prob * ROI;  AS = bilateral(S) * Gate;  loss = -w * dot(S, AS) / N
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ..ops.bilateral import bilateral_filter_batch
from ..ops.image import resize_bilinear_auto, resize_nearest


@partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4))
def _dense_energy(images, segmentations, sigma_rgb, sigma_xy, method):
    loss, _ = _energy_fwd_core(images, segmentations, sigma_rgb, sigma_xy, method)
    return loss


def _energy_fwd_core(images, segs_and_masks, sigma_rgb, sigma_xy, method):
    segmentations, rois, gate = segs_and_masks
    N = segmentations.shape[0]
    S = segmentations * rois[..., None]
    AS = bilateral_filter_batch(images, S, sigma_rgb, sigma_xy, method=method)
    AS = AS * gate
    loss = -jnp.vdot(S, AS) / N
    return loss, (AS, rois, gate, N)


def _energy_fwd(images, segs_and_masks, sigma_rgb, sigma_xy, method):
    loss, res = _energy_fwd_core(images, segs_and_masks, sigma_rgb, sigma_xy, method)
    return loss, res


def _energy_bwd(sigma_rgb, sigma_xy, method, res, g):
    AS, rois, gate, N = res
    grad_seg = -2.0 * g * AS / N * rois[..., None]
    # images/rois/gate get no gradient (`losses.py:90` returns None); the gate
    # cotangent must match gate's (B,h,w,1) shape, not AS's (B,h,w,C).
    return (
        jnp.zeros(AS.shape[:3] + (3,), AS.dtype),
        (grad_seg, jnp.zeros_like(rois), jnp.zeros_like(gate)),
    )


_dense_energy.defvjp(_energy_fwd, _energy_bwd)


def dense_energy_loss(
    images: jax.Array,
    probs: jax.Array,
    rois: jax.Array,
    seg_label: jax.Array,
    weight: float = 1e-7,
    sigma_rgb: float = 15.0,
    sigma_xy: float = 100.0,
    scale_factor: float = 0.5,
    ignore_index: int = 255,
    method: str = "grid",
) -> jax.Array:
    """`DenseEnergyLoss.forward` (`losses.py:94-111`). images: denormalized RGB NHWC in
    [0,255]; probs: softmax seg probs NHWC; rois: (B,H,W) crop mask; seg_label (B,H,W)."""
    B, H, W, _ = images.shape
    h, w = int(H * scale_factor), int(W * scale_factor)
    imgs = resize_nearest(images, (h, w))  # F.interpolate default mode
    segs = resize_bilinear_auto(probs, (h, w), align_corners=False)
    rois_s = resize_nearest(rois[..., None], (h, w))[..., 0]
    label_s = resize_nearest(seg_label[..., None].astype(jnp.float32), (h, w))[..., 0]
    unlabeled = label_s.astype(jnp.int32) == ignore_index

    # Gate (`losses.py:61-68`): ROI minus per-pixel max prob, unlabeled forced to 1
    seg_max = segs.max(axis=-1)
    gate = rois_s - seg_max
    gate = jnp.where(unlabeled, 1.0, gate)
    gate = jnp.clip(gate, 0.0, None)[..., None]

    return weight * _dense_energy(
        imgs, (segs, rois_s, gate), sigma_rgb, sigma_xy * scale_factor, method
    )


def get_energy_loss(
    img_normalized: jax.Array,
    logit: jax.Array,
    label: jax.Array,
    img_box: jax.Array,
    mean=(123.675, 116.28, 103.53),
    std=(58.395, 57.12, 57.375),
    **kw,
) -> jax.Array:
    """`get_energy_loss` (`losses.py:35-50`): denormalize, box mask, seg softmax."""
    B, H, W, _ = img_normalized.shape
    probs = jax.nn.softmax(logit, axis=-1)
    rows = jnp.arange(H)[None, :, None]
    cols = jnp.arange(W)[None, None, :]
    crop_mask = (
        (rows >= img_box[:, 0, None, None]) & (rows < img_box[:, 1, None, None])
        & (cols >= img_box[:, 2, None, None]) & (cols < img_box[:, 3, None, None])
    ).astype(jnp.float32)
    img = img_normalized * jnp.asarray(std) + jnp.asarray(mean)
    return dense_energy_loss(img, probs, crop_mask, label, **kw)
