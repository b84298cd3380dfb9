"""CAM utilities — parity with `SCD-AAAI2023/utils/camutils.py`, redesigned for XLA:
the reference's per-image python loops and valid-class gathers (`:185-199,318-325`)
become batched channel-masked ops (softmax/argmax with invalid classes at -inf), which
is exactly equivalent and keeps shapes static for jit.

Model contract: `cam_fn(inputs) -> (cam NHWC fg-classes, attn_pred)` is the `cam_only`
forward of a TSCD-style model.
"""
from __future__ import annotations

from functools import partial
from typing import Callable, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.image import (flip_lr, minmax_normalize_cam, resize_bilinear,
                         resize_bilinear_auto,
                         resize_bilinear_mm, resize_nearest)


def _single_scale_cam(cam_fn, inputs, size):
    """Forward [x; flip(x)] through cam_only, resize to `size`, max over flips, relu
    (`camutils.py:89-96`). Returns (cam, attn_pred_of_cat_batch).

    On TPU the upsample runs as MXU einsums with the flip folded into the
    flipped half's W interp matrix (`ops/image.py::resize_bilinear_mm`) — same
    taps/weights as the gather path, but no transposed gather intermediates
    (PERF.md round 3: the gather lowering made this chain's post-processing
    cost as much as the model)."""
    b = inputs.shape[0]
    cat = jnp.concatenate([inputs, flip_lr(inputs)], axis=0)
    cam, ref = cam_fn(cat)
    if jax.default_backend() == "tpu":
        fwd = resize_bilinear_mm(cam[:b], size, align_corners=False)
        flp = resize_bilinear_mm(cam[b:], size, align_corners=False, flip_w=True)
        cam = jnp.maximum(fwd, flp)
    else:
        cam = resize_bilinear(cam, size, align_corners=False)
        cam = jnp.maximum(cam[:b], flip_lr(cam[b:]))
    return jax.nn.relu(cam), ref


def multi_scale_cam(cam_fn: Callable, inputs: jax.Array, scales: Sequence[float]):
    """Multi-scale + flip CAM inference (`camutils.py:85-113`): scale-1 always computed,
    flips max-reduced, scales summed, min-max normalized."""
    cam, _ = multi_scale_cam_with_ref_mat(cam_fn, inputs, scales)
    return cam


def multi_scale_cam_with_ref_mat(cam_fn: Callable, inputs: jax.Array, scales: Sequence[float]):
    """Also returns the attn_pred ("ref mat") from the largest scale
    (`camutils.py:115-147`, max over `scales` at `:146`)."""
    B, H, W, _ = inputs.shape
    cam_sum = None
    refs = []  # (scale, ref)
    base_cam, base_ref = _single_scale_cam(cam_fn, inputs, (H, W))
    cam_sum = base_cam
    refs.append((1.0, base_ref))
    for s in scales:
        if s == 1.0:
            continue
        si = resize_bilinear_auto(inputs, (int(s * H), int(s * W)), align_corners=False)
        c, r = _single_scale_cam(cam_fn, si, (H, W))
        cam_sum = cam_sum + c
        refs.append((s, r))
    cam = jax.lax.stop_gradient(minmax_normalize_cam(cam_sum))
    # ref from the position argmax(scales) indexes in the [base, non-1-scales...] list,
    # which is the largest scale for the reference's configs
    order = [1.0] + [s for s in scales if s != 1.0]
    max_ref = refs[int(np.argmax(order))][1]
    return cam, jax.lax.stop_gradient(max_ref)


def cam_to_label(
    cam: jax.Array,
    cls_label: jax.Array,
    img_box: jax.Array | None = None,
    ignore_mid: bool = False,
    bkg_score: float = 0.45,
    high_thre: float = 0.55,
    low_thre: float = 0.35,
    ignore_index: int = 255,
):
    """CAM -> pseudo label (`camutils.py:8-28`). cam (B,H,W,C_fg) normalized;
    cls_label (B,C_fg) one-hot. Returns (valid_cam, pseudo_label) when img_box given."""
    B, H, W, C = cam.shape
    valid_cam = cls_label[:, None, None, :] * cam
    cam_value = valid_cam.max(axis=-1)
    pseudo = valid_cam.argmax(axis=-1) + 1
    pseudo = jnp.where(cam_value <= bkg_score, 0, pseudo)
    if img_box is None:
        return pseudo
    if ignore_mid:
        pseudo = jnp.where(cam_value <= high_thre, ignore_index, pseudo)
        pseudo = jnp.where(cam_value <= low_thre, 0, pseudo)
    pseudo = ignore_outside_box(pseudo, img_box, ignore_index)
    return valid_cam, pseudo


def ignore_outside_box(label: jax.Array, img_box: jax.Array, ignore_index: int = 255):
    """Mask pixels outside each sample's valid-image box (`camutils.py:30-37`)."""
    B, H, W = label.shape
    rows = jnp.arange(H)[None, :, None]
    cols = jnp.arange(W)[None, None, :]
    inside = (
        (rows >= img_box[:, 0, None, None]) & (rows < img_box[:, 1, None, None])
        & (cols >= img_box[:, 2, None, None]) & (cols < img_box[:, 3, None, None])
    )
    return jnp.where(inside, label, ignore_index)


def refine_cams_with_bkg_v2(
    refine_fn: Callable,
    images_denorm: jax.Array,
    cams: jax.Array,
    cls_labels: jax.Array,
    img_box: jax.Array,
    high_thre: float = 0.55,
    low_thre: float = 0.35,
    ignore_index: int = 255,
    down_scale: int = 2,
    max_present: int | None = None,
):
    """Background-aware VARM refinement (`camutils.py:161-201`), batched: the reference's
    per-image valid-key gather/softmax becomes a channel mask with -inf logits — VARM
    propagation is per-channel linear so masked channels stay ~0 and argmax is identical.

    refine_fn(images, masks) -> refined masks (e.g. `models.refine.varm_refine`).
    cams (B,H,W,C_fg); returns refined pseudo label (B,H,W) in {0..C_fg, ignore}.

    max_present: static cap on present classes per image. The reference's
    per-image loop (`camutils.py:183-193`) only refines the classes PRESENT in
    each image (VOC: ~1-3 of 20); the batched full-channel form propagates all
    C_fg, which dominated the profiled RML step (PERF.md round 4). With
    max_present=P, the present classes are gathered per image (stable class
    order, exactly the reference's valid-key order) and only P fg channels are
    propagated — numerically identical to the full path (absent channels carry
    exp(-inf)=0 through the softmax and never win the argmax) PROVIDED every
    image has <= P present classes; the caller owns that bound (dataset stat —
    a violated bound silently drops the excess classes from refinement).
    """
    B, H, W, Cf = cams.shape
    small = (H // down_scale, W // down_scale)
    imgs_small = resize_bilinear_auto(images_denorm, small, align_corners=False)

    if max_present is not None and max_present < Cf:
        # stable gather of present-class indices: argsort of (1 - label) puts
        # present classes first in class order, matching the reference's
        # `torch.where(cls_label == 1)` key order
        idx = jnp.argsort(1.0 - cls_labels, axis=1, stable=True)[:, :max_present]
        cams = jnp.take_along_axis(cams, idx[:, None, None, :], axis=-1)
        cls_labels = jnp.take_along_axis(cls_labels, idx, axis=1)
        Cf = max_present
    else:
        idx = None

    bkg_cls = jnp.ones((B, 1), cams.dtype)
    valid = jnp.concatenate([bkg_cls, cls_labels], axis=1)  # (B, C)
    neg_inf = jnp.finfo(cams.dtype).min

    def probs_for(bkg_value):
        bkg = jnp.full((B, H, W, 1), bkg_value, cams.dtype)
        cwb = jnp.concatenate([bkg, cams], axis=-1)  # (B,H,W,C)
        cwb_small = resize_bilinear_auto(cwb, small, align_corners=False)
        logits = jnp.where(valid[:, None, None, :] > 0, cwb_small, neg_inf)
        return jax.nn.softmax(logits, axis=-1)

    # ONE refine call for both threshold stacks: propagation is per-channel
    # independent (the affinity depends only on the image), so channel-concat
    # is exact and halves the refine cost — the reference runs the module
    # twice (`camutils.py:168-171`); profiled at 9.5 ms/step of the RML
    # trainer before dedup (PERF.md round 3)
    both = refine_fn(imgs_small,
                     jnp.concatenate([probs_for(high_thre), probs_for(low_thre)],
                                     axis=-1))
    C = Cf + 1

    def label_of(ref):
        ref = resize_bilinear_auto(ref, (H, W), align_corners=False)
        ref = jnp.where(valid[:, None, None, :] > 0, ref, neg_inf)
        lbl = ref.argmax(axis=-1)
        if idx is None:
            return lbl
        # map compact fg indices back to original class ids (bkg stays 0) via a
        # one-hot contraction over the P compact slots — a per-pixel
        # take_along_axis here lowers to a SERIAL s32 gather over B*H*W
        # elements (9.3 ms x2 per RML step, the largest non-kernel item in the
        # r5 trace); the P=8 select chain fuses into one vector pass
        full = jnp.zeros((B, H, W), lbl.dtype)
        for p_slot in range(Cf):
            full = jnp.where(lbl == p_slot + 1, idx[:, p_slot, None, None] + 1, full)
        return full  # lbl == 0 (bkg) stays 0

    label_h = label_of(both[..., :C])
    label_l = label_of(both[..., C:])

    # combination (`camutils.py:196-199`): confident-fg from the high-bkg pass, bg only
    # where both passes agree on bg, everything else ignore; outside the valid box
    # ignore (the reference fills only inside the box into an ignore-initialized canvas)
    refined = jnp.where(label_h == 0, ignore_index, label_h)
    refined = jnp.where((label_h + label_l) == 0, 0, refined)
    return ignore_outside_box(refined, img_box, ignore_index)


def cams_to_refine_label(
    cam_label: jax.Array, mask: jax.Array | None = None, ignore_index: int = 255, down: int = 16
):
    """Pairwise affinity label from a pseudo-label map (`camutils.py:238-257`):
    nearest-downsample by `down`, label (B, N, N) with 1 where classes match; positions
    under `mask==0` and any pair touching an ignored pixel -> ignore_index."""
    B, H, W = cam_label.shape
    small = resize_nearest(cam_label[..., None].astype(jnp.float32), (H // down, W // down))
    lab = small.reshape(B, -1)  # (B, N)
    eq = (lab[:, None, :] == lab[:, :, None]).astype(jnp.int32)  # (B,N,N)
    if mask is not None:
        eq = jnp.where(mask[None, :, :] == 0, ignore_index, eq)
    ign = lab == ignore_index
    eq = jnp.where(ign[:, None, :], ignore_index, eq)
    eq = jnp.where(ign[:, :, None], ignore_index, eq)
    return eq


def propagate_ref_cam_with_bkg(
    cams: jax.Array,
    ref: jax.Array,
    cls_labels: jax.Array,
    bkg_score: float,
    mask: jax.Array | None = None,
):
    """Random-walk CAM propagation through the predicted affinity
    (`camutils.py:287-327` `propagte_ref_cam_with_bkg`): ref^2, column-normalized
    (+1e-1), per-image valid-class softmax of [bkg; cams], then (C, N) @ (N, N).
    cams (B,h,w,C_fg) at the affinity resolution; ref (B,N,N), N = h*w."""
    B, h, w, Cf = cams.shape
    N = h * w
    bkg = jnp.full((B, h, w, 1), bkg_score, cams.dtype)
    cwb = jnp.concatenate([bkg, cams], axis=-1)  # (B,h,w,C)
    C = Cf + 1
    valid = jnp.concatenate([jnp.ones((B, 1), cams.dtype), cls_labels], axis=1)

    if mask is not None:
        ref = jnp.where(mask[None, :, :] == 0, 0.0, ref)
    ref = ref ** 2
    ref = ref / (ref.sum(axis=1, keepdims=True) + 1e-1)  # column-normalize (torch dim=1)

    flat = cwb.reshape(B, N, C).transpose(0, 2, 1)  # (B,C,N)
    neg_inf = jnp.finfo(cams.dtype).min
    logits = jnp.where(valid[:, :, None] > 0, flat, neg_inf)
    probs = jax.nn.softmax(logits, axis=1)  # softmax over valid classes per pixel
    rw = jnp.einsum("bcn,bnm->bcm", probs, ref, preferred_element_type=jnp.float32)
    rw = jnp.where(valid[:, :, None] > 0, rw, 0.0)
    return rw.transpose(0, 2, 1).reshape(B, h, w, C)


def get_mask_by_radius(h: int, w: int, radius: int = 8) -> np.ndarray:
    """Pairwise radius mask over the h*w token grid (`dist_train_voc.py:160-178`),
    vectorized (the reference's O((hw)^2) python loop)."""
    ys, xs = np.mgrid[0:h, 0:w]
    ys = ys.reshape(-1)
    xs = xs.reshape(-1)
    m = (np.abs(ys[:, None] - ys[None, :]) <= radius) & (
        np.abs(xs[:, None] - xs[None, :]) <= radius
    )
    return m.astype(np.float32)


def propagate_ref_cam(cams: jax.Array, ref: jax.Array, mask: jax.Array | None = None):
    """Random-walk propagation WITHOUT the background channel
    (`camutils.py:259-285` `propagte_ref_cam`): ref^2, column-normalized (+1e-4),
    full-channel matmul. cams (B,h,w,C) at the affinity resolution; ref (B,N,N)."""
    B, h, w, C = cams.shape
    N = h * w
    if mask is not None:
        ref = jnp.where(mask[None, :, :] == 0, 0.0, ref)
    ref = ref ** 2
    ref = ref / (ref.sum(axis=1, keepdims=True) + 1e-4)
    flat = cams.reshape(B, N, C).transpose(0, 2, 1)
    rw = jnp.einsum("bcn,bnm->bcm", flat, ref, preferred_element_type=jnp.float32)
    return rw.transpose(0, 2, 1).reshape(B, h, w, C)


def cams_to_label_resized(cam_label: jax.Array, mask: jax.Array | None = None,
                          ignore_index: int = 255, size=(400, 400)):
    """`cams_to_label` (`camutils.py:330-351`): nearest-resize the label map to a fixed
    grid, optionally masking positions to ignore."""
    lab = resize_nearest(cam_label[..., None].astype(jnp.float32), size)[..., 0]
    lab = lab.astype(jnp.int32)
    if mask is not None:
        lab = jnp.where(mask[None] == 0, ignore_index, lab)
    return lab


def cam_to_fg_bg_label(images_norm, cams, cls_label, bg_thre: float = 0.3,
                       fg_thre: float = 0.6,
                       mean=(123.675, 116.28, 103.53), std=(58.395, 57.12, 57.375),
                       crf_method: str = "grid"):
    """CRF-refined confident fg/bg label (`camutils.py:39-83` `cam_to_fg_bg_label`):
    per image, pad the valid-class CAMs with low/high background planes, argmax, CRF
    with label unary, combine: confident-fg map with 1 where high-pass says bg and 0
    where both passes say bg. Host-side loop (per-image CRF), device-side filters."""
    import numpy as np

    from ..ops.crf import crf_inference_label

    B, h, w, Cf = cams.shape
    imgs = np.asarray(images_norm) * np.asarray(std) + np.asarray(mean)
    cams_np = np.asarray(resize_bilinear_auto(cams, imgs.shape[1:3], align_corners=False))
    out = np.ones((B,) + imgs.shape[1:3], np.float32)
    cls_np = np.asarray(cls_label)
    for i in range(B):
        keys = np.nonzero(np.concatenate([[1.0], cls_np[i]]))[0]
        valid = cams_np[i].transpose(2, 0, 1)[keys[1:] - 1]
        lt = np.concatenate([np.full((1,) + valid.shape[1:], bg_thre), valid], 0)
        ht = np.concatenate([np.full((1,) + valid.shape[1:], fg_thre), valid], 0)
        lt_lab = crf_inference_label(imgs[i], np.argmax(lt, 0), n_labels=max(len(keys), 2),
                                     method=crf_method)
        ht_lab = crf_inference_label(imgs[i], np.argmax(ht, 0), n_labels=max(len(keys), 2),
                                     method=crf_method)
        lt_m = keys[lt_lab]
        ht_m = keys[ht_lab]
        o = ht_m.astype(np.float32)
        o[ht_m == 0] = 1.0
        o[(ht_m + lt_m) == 0] = 0.0
        out[i] = o
    return jnp.asarray(out)
