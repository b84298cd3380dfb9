"""Fused on-device augmentation chain (jit-able, batched, explicit PRNG).

The host pipeline (`data/transforms.py`, parity path for
`SCD-AAAI2023/datasets/transforms.py`) runs per-sample numpy/PIL on the host
CPU. This module is its TPU-native twin — the north star's "tile/resize/
normalize/random-crop/flip augmentation chain become fused JAX/XLA
transforms": ONE jitted program per batch that scale-jitters, flips, pads,
crops (with the reference's cat_max_ratio retry and `img_box` valid-region
tracking), photometric-distorts and normalizes, with every spatial op fused
into a single inverse-warp gather (the scaled/padded canvas is never
materialized).

Semantics vs the host chain, given the SAME random decisions:
- flips / crop placement / padding / img_box / cat_max_ratio selection /
  normalize: identical (integer decisions are shared exactly);
- photometric distortion: identical to within the host's uint8 quantization
  (the device path replicates each clip+truncate step);
- scale jitter: the host resizes via PIL (uint8 intermediates; triangular
  filter when downscaling). The device path uses align_corners=False bilinear
  taps on float pixels — identical tap placement for upscales, a slightly
  narrower filter for downscales, and no uint8 rounding. Distribution-level
  equivalent; the host chain remains the bit-parity path.

Randomness is split from math: `sample_*_decisions(key, batch)` draws every
random number; `augment_cls_batch` / `augment_seg_batch` are deterministic in
(inputs, decisions), which is what the forced-decision parity tests exploit.

Input contract: raw uint8 images padded host-side to a static canonical
(B, S, S, 3) canvas (`pad_to_canvas`) with the true per-sample sizes in
`hw` (B, 2); labels likewise with `ignore_index` fill. Tap indices are
clipped to [0, h-1] x [0, w-1], so the canonical padding is never read.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from .transforms import IMAGENET_MEAN, IMAGENET_STD


class DeviceAugConfig(NamedTuple):
    """Knobs mirroring `VOC12ClsDataset` / `VOC12SegDataset` construction."""

    crop_size: int = 320
    scale_range: tuple[float, float] | None = (0.5, 2.0)
    fliplr: bool = True
    photometric: bool = False
    cat_max_ratio: float = 0.75
    crop_tries: int = 10
    num_classes: int = 21
    ignore_index: int = 255
    mean_rgb: tuple[float, float, float] = (0.0, 0.0, 0.0)
    # photometric parameters (`transforms.py::PhotoMetricDistortion`)
    brightness_delta: float = 32.0
    contrast_range: tuple[float, float] = (0.5, 1.5)
    saturation_range: tuple[float, float] = (0.5, 1.5)
    hue_delta: int = 18


# ------------------------------------------------------------------ host-side helper
def pad_to_canvas(images, size: int, labels=None, ignore_index: int = 255):
    """Host collation: top-left place variable-size samples on a static
    (S, S) canvas. Returns (images_u8 (B,S,S,3), hw (B,2)[, labels (B,S,S)])."""
    B = len(images)
    out = np.zeros((B, size, size, 3), np.uint8)
    hw = np.zeros((B, 2), np.int32)
    lab = None
    if labels is not None:
        lab = np.full((B, size, size), ignore_index, np.int32)
    for b, img in enumerate(images):
        h, w = img.shape[:2]
        out[b, :h, :w] = img[:size, :size]
        hw[b] = (min(h, size), min(w, size))
        if labels is not None:
            lab[b, :h, :w] = labels[b][:size, :size]
    return (out, hw) if labels is None else (out, hw, lab)


# ------------------------------------------------------------------ decision sampling
def sample_cls_decisions(key, batch: int, cfg: DeviceAugConfig):
    """Draws for the CLS chain (scale -> fliplr -> pad+crop): same
    distributions as the host rng calls, as raw u01/bernoulli arrays."""
    ks = jax.random.split(key, 4)
    lo, hi = cfg.scale_range if cfg.scale_range else (1.0, 1.0)
    return {
        "scale": jax.random.uniform(ks[0], (batch,), minval=lo, maxval=hi),
        "flip": jax.random.uniform(ks[1], (batch,)) > 0.5,
        # u01 for pad placement and the K crop tries; integer offsets are
        # floor(u * (n_choices)) inside the apply (uniform over [0, n))
        "pad_u": jax.random.uniform(ks[2], (batch, 2)),
        "crop_u": jax.random.uniform(ks[3], (batch, cfg.crop_tries, 2)),
    }


def sample_seg_decisions(key, batch: int, cfg: DeviceAugConfig):
    """Draws for the SEG chain (fliplr -> photometric -> crop): the host draws
    `rng.integers(2)` gates and uniform factors in a fixed order."""
    ks = jax.random.split(key, 12)
    d = sample_cls_decisions(ks[0], batch, cfg._replace(scale_range=None))
    d.update({
        "bright_on": jax.random.uniform(ks[1], (batch,)) < 0.5,
        "bright_delta": jax.random.uniform(
            ks[2], (batch,), minval=-cfg.brightness_delta,
            maxval=cfg.brightness_delta),
        "mode": (jax.random.uniform(ks[3], (batch,)) < 0.5).astype(jnp.int32),
        "contrast_on": jax.random.uniform(ks[4], (batch,)) < 0.5,
        "contrast_alpha": jax.random.uniform(
            ks[5], (batch,), minval=cfg.contrast_range[0],
            maxval=cfg.contrast_range[1]),
        "sat_on": jax.random.uniform(ks[6], (batch,)) < 0.5,
        "sat_alpha": jax.random.uniform(
            ks[7], (batch,), minval=cfg.saturation_range[0],
            maxval=cfg.saturation_range[1]),
        "hue_on": jax.random.uniform(ks[8], (batch,)) < 0.5,
        "hue_delta": jax.random.randint(
            ks[9], (batch,), -cfg.hue_delta, cfg.hue_delta).astype(jnp.float32),
    })
    return d


# ------------------------------------------------------------------ fused warp core
def _axis_coords(i, off, pad, scaled, true, flip):
    """Map crop-axis indices i to source coords through pad+scale(+flip).

    i: (crop,) int; off/pad/scaled/true: per-sample scalars. Returns
    (src float coords clipped to [0, true-1], in-image mask)."""
    v = (off + i).astype(jnp.float32) - pad.astype(jnp.float32)  # scaled-image coord
    mask = (v >= 0) & (v < scaled.astype(jnp.float32))
    v = jnp.where(flip, scaled.astype(jnp.float32) - 1.0 - v, v)
    src = (v + 0.5) * (true.astype(jnp.float32) / scaled.astype(jnp.float32)) - 0.5
    return jnp.clip(src, 0.0, true.astype(jnp.float32) - 1.0), mask


def _warp_one(img, h, w, sh, sw, pad_hw, off_hw, flip, crop, fill, nearest):
    """Inverse-warp one sample: canvas crop pixel -> source pixel.

    img (S,S,C) f32. Returns (crop, crop, C). The scaled (sh, sw) image sits at
    pad_hw on a max(crop, s*) canvas; the crop window starts at off_hw."""
    i = jnp.arange(crop)
    ys, ym = _axis_coords(i, off_hw[0], pad_hw[0], sh, h, False)
    xs, xm = _axis_coords(i, off_hw[1], pad_hw[1], sw, w, flip)
    if nearest:
        r = img[jnp.round(ys).astype(jnp.int32)]       # (crop, S, C)
        out = r[:, jnp.round(xs).astype(jnp.int32)]    # (crop, crop, C)
    else:
        y0 = jnp.floor(ys).astype(jnp.int32)
        y1 = jnp.minimum(y0 + 1, (h - 1).astype(jnp.int32))
        wy = (ys - y0)[:, None, None]
        rows = img[y0] * (1.0 - wy) + img[y1] * wy     # (crop, S, C)
        x0 = jnp.floor(xs).astype(jnp.int32)
        x1 = jnp.minimum(x0 + 1, (w - 1).astype(jnp.int32))
        wx = (xs - x0)[None, :, None]
        out = rows[:, x0] * (1.0 - wx) + rows[:, x1] * wx
    m = (ym[:, None] & xm[None, :])[..., None]
    return jnp.where(m, out, jnp.asarray(fill, out.dtype))


def _geometry(hw, scale, pad_u, crop_u, crop):
    """Per-sample integer geometry: scaled size, pad offset, crop offsets for
    every try — floor(u * n_choices) matches the host's integers(0, n)."""
    h, w = hw[..., 0], hw[..., 1]
    sh = jnp.floor(scale * h).astype(jnp.int32)
    sw = jnp.floor(scale * w).astype(jnp.int32)
    sh = jnp.maximum(sh, 1)
    sw = jnp.maximum(sw, 1)
    Hc = jnp.maximum(crop, sh)
    Wc = jnp.maximum(crop, sw)
    pad = jnp.stack([
        jnp.floor(pad_u[..., 0] * (Hc - sh + 1).astype(jnp.float32)),
        jnp.floor(pad_u[..., 1] * (Wc - sw + 1).astype(jnp.float32)),
    ], -1).astype(jnp.int32)
    offs = jnp.stack([
        jnp.floor(crop_u[..., 0] * (Hc - crop + 1)[..., None].astype(jnp.float32)),
        jnp.floor(crop_u[..., 1] * (Wc - crop + 1)[..., None].astype(jnp.float32)),
    ], -1).astype(jnp.int32)  # (..., K, 2)
    return sh, sw, pad, offs


def _img_box(pad, off, sh, sw, crop):
    """Crop-relative valid region [h0, h1, w0, w1] (`transforms.py:131-139`)."""
    h0 = jnp.clip(pad[0] - off[0], 0, crop)
    h1 = jnp.clip(pad[0] + sh - off[0], 0, crop)
    w0 = jnp.clip(pad[1] - off[1], 0, crop)
    w1 = jnp.clip(pad[1] + sw - off[1], 0, crop)
    return jnp.stack([h0, h1, w0, w1]).astype(jnp.int32)


def _pick_crop_try(label, h, w, sh, sw, pad, offs, flip, cfg: DeviceAugConfig):
    """cat_max_ratio retry (`transforms.py:117-127`): first candidate whose
    window has >1 class and max-class share < ratio; else the LAST try. The
    flip is folded into the window warp exactly as in the final crop, so the
    candidate windows scored here are the windows the crop would produce."""
    K = offs.shape[0]

    def window_counts(off):
        win = _warp_one(label[..., None].astype(jnp.float32), h, w, sh, sw,
                        pad, off, flip, cfg.crop_size,
                        (float(cfg.ignore_index),), nearest=True)[..., 0]
        counts = jnp.stack([
            jnp.sum(win == c) for c in range(cfg.num_classes)])
        return counts

    counts = jax.vmap(window_counts)(offs)  # (K, C)
    total = counts.sum(-1)
    nclasses = (counts > 0).sum(-1)
    ok = (nclasses > 1) & (counts.max(-1) < cfg.cat_max_ratio * total)
    idx = jnp.where(ok.any(), jnp.argmax(ok), K - 1)
    return offs[idx]


# ------------------------------------------------------------------ photometric (device)
def _rgb_to_hsv_cv_j(img):
    arr = img / 255.0
    r, g, b = arr[..., 0], arr[..., 1], arr[..., 2]
    maxc = jnp.max(arr, axis=-1)
    minc = jnp.min(arr, axis=-1)
    delta = maxc - minc
    s = jnp.where(maxc > 0, delta / jnp.maximum(maxc, 1e-12), 0.0)
    rc = jnp.where(delta > 0, (maxc - r) / jnp.maximum(delta, 1e-12), 0.0)
    gc = jnp.where(delta > 0, (maxc - g) / jnp.maximum(delta, 1e-12), 0.0)
    bc = jnp.where(delta > 0, (maxc - b) / jnp.maximum(delta, 1e-12), 0.0)
    h = jnp.where(maxc == r, bc - gc,
                  jnp.where(maxc == g, 2.0 + rc - bc, 4.0 + gc - rc))
    h = (h / 6.0) % 1.0
    return jnp.stack([h * 180.0, s * 255.0, maxc * 255.0], -1)


def _hsv_to_rgb_cv_j(hsv):
    h = (hsv[..., 0] / 180.0) % 1.0
    s = jnp.clip(hsv[..., 1] / 255.0, 0, 1)
    v = jnp.clip(hsv[..., 2] / 255.0, 0, 1)
    i = jnp.floor(h * 6.0)
    f = h * 6.0 - i
    p = v * (1.0 - s)
    q = v * (1.0 - s * f)
    t = v * (1.0 - s * (1.0 - f))
    i = i.astype(jnp.int32) % 6
    r = jnp.select([i == k for k in range(6)], [v, q, p, p, t, v])
    g = jnp.select([i == k for k in range(6)], [t, v, v, q, p, p])
    b = jnp.select([i == k for k in range(6)], [p, p, t, v, v, q])
    # host converts back to uint8 (truncation) after each HSV round-trip
    return jnp.floor(jnp.stack([r, g, b], -1) * 255.0)


def _quant(x):
    """Host `_convert`: clip to [0,255] then uint8 truncation."""
    return jnp.floor(jnp.clip(x, 0.0, 255.0))


def photometric_distort(img, d, s: slice | int, cfg: DeviceAugConfig):
    """Device `PhotoMetricDistortion.__call__` on ONE sample (img (H,W,3) f32
    holding uint8 values; d = seg decisions indexed at this sample)."""
    img = jnp.floor(jnp.clip(img, 0.0, 255.0))  # host: astype(np.uint8)
    img = jnp.where(d["bright_on"][s], _quant(img + d["bright_delta"][s]), img)

    def contrast(x):
        return _quant(x * d["contrast_alpha"][s])

    img = jnp.where((d["mode"][s] == 1) & d["contrast_on"][s], contrast(img), img)
    hsv = _rgb_to_hsv_cv_j(img)
    hsv = hsv.at[..., 1].set(
        jnp.where(d["sat_on"][s],
                  jnp.clip(hsv[..., 1] * d["sat_alpha"][s], 0, 255),
                  hsv[..., 1]))
    img = jnp.where(d["sat_on"][s], _hsv_to_rgb_cv_j(hsv), img)
    hsv = _rgb_to_hsv_cv_j(img)
    hsv = hsv.at[..., 0].set(
        jnp.where(d["hue_on"][s], (hsv[..., 0] + d["hue_delta"][s]) % 180.0,
                  hsv[..., 0]))
    img = jnp.where(d["hue_on"][s], _hsv_to_rgb_cv_j(hsv), img)
    img = jnp.where((d["mode"][s] == 0) & d["contrast_on"][s], contrast(img), img)
    return img


def normalize_img_j(img):
    """`transforms.py::normalize_img` on device."""
    mean = jnp.asarray(IMAGENET_MEAN, jnp.float32)
    std = jnp.asarray(IMAGENET_STD, jnp.float32)
    return (img - mean) / std


# ------------------------------------------------------------------ batch entry points
def augment_cls_batch(images, hw, decisions, cfg: DeviceAugConfig):
    """Fused CLS chain (`VOC12ClsDataset.__getitem__`): scale-jitter ->
    fliplr -> pad+random-crop (mean_rgb fill) -> normalize; returns
    (images (B,crop,crop,3) f32 normalized, img_box (B,4))."""
    imgs = images.astype(jnp.float32)
    sh, sw, pad, offs = _geometry(hw, decisions["scale"], decisions["pad_u"],
                                  decisions["crop_u"], cfg.crop_size)

    def one(img, h, w, shb, swb, padb, offb, flip):
        off = offb[0]
        out = _warp_one(img, h, w, shb, swb, padb, off, flip, cfg.crop_size,
                        cfg.mean_rgb, nearest=False)
        return normalize_img_j(out), _img_box(padb, off, shb, swb, cfg.crop_size)

    return jax.vmap(one)(imgs, hw[:, 0], hw[:, 1], sh, sw, pad, offs,
                         decisions["flip"])


def augment_seg_batch(images, hw, labels, decisions, cfg: DeviceAugConfig):
    """Fused SEG chain (`VOC12SegDataset.__getitem__`): fliplr ->
    photometric -> random-crop with cat_max_ratio retry (imagenet-mean fill,
    ignore-fill labels) -> normalize; returns (images, labels, img_box)."""
    imgs = images.astype(jnp.float32)
    sh, sw, pad, offs = _geometry(hw, jnp.ones((images.shape[0],)),
                                  decisions["pad_u"], decisions["crop_u"],
                                  cfg.crop_size)

    def one(img, lab, h, w, shb, swb, padb, offsb, flip, b):
        img = photometric_distort(img, decisions, b, cfg)
        off = _pick_crop_try(
            lab, h, w, shb, swb, padb, offsb, flip, cfg
        ) if cfg.cat_max_ratio else offsb[0]
        out = _warp_one(img, h, w, shb, swb, padb, off, flip, cfg.crop_size,
                        tuple(float(m) for m in IMAGENET_MEAN), nearest=False)
        lab_c = _warp_one(lab[..., None].astype(jnp.float32), h, w, shb, swb,
                          padb, off, flip, cfg.crop_size,
                          (float(cfg.ignore_index),), nearest=True)[..., 0]
        box = _img_box(padb, off, shb, swb, cfg.crop_size)
        return normalize_img_j(out), lab_c.astype(jnp.int32), box

    B = images.shape[0]
    return jax.vmap(one)(imgs, labels, hw[:, 0], hw[:, 1], sh, sw, pad, offs,
                         decisions["flip"], jnp.arange(B))


# ------------------------------------------------------------------ LoveDA chain
class LoveDAAugConfig(NamedTuple):
    """`data/loveda.py::LoveDADataset` train chain, on device: random-crop ->
    OneOf{hflip, vflip, rot90} p=.75 -> ShiftScaleRotate p=.2 -> normalize."""

    crop_size: int = 512
    flip_rot_p: float = 0.75
    affine_p: float = 0.2
    rotate_limit: float = 45.0
    scale_limit: float = 0.2
    shift_limit: float = 0.0625
    cat_max_ratio: float = 0.75
    crop_tries: int = 10
    num_classes: int = 7
    ignore_index: int = -1


def sample_loveda_decisions(key, batch: int, cfg: LoveDAAugConfig):
    ks = jax.random.split(key, 9)
    return {
        "pad_u": jax.random.uniform(ks[0], (batch, 2)),
        "crop_u": jax.random.uniform(ks[1], (batch, cfg.crop_tries, 2)),
        "fr_on": jax.random.uniform(ks[2], (batch,)) < cfg.flip_rot_p,
        "op": jax.random.randint(ks[3], (batch,), 0, 3),
        "rot_k": jax.random.randint(ks[4], (batch,), 1, 4),
        "ssr_on": jax.random.uniform(ks[5], (batch,)) < cfg.affine_p,
        "angle": jax.random.uniform(ks[6], (batch,), minval=-cfg.rotate_limit,
                                    maxval=cfg.rotate_limit),
        "ssr_scale": 1.0 + jax.random.uniform(
            ks[7], (batch,), minval=-cfg.scale_limit, maxval=cfg.scale_limit),
        "shift": jax.random.uniform(ks[8], (batch, 2), minval=-cfg.shift_limit,
                                    maxval=cfg.shift_limit),
    }


def _reflect101(i, n: int):
    """BORDER_REFLECT_101 index fold (cv2: ...cba|abcd|cba...)."""
    if n == 1:
        return jnp.zeros_like(i)
    p = 2 * n - 2
    m = jnp.mod(i, p)
    return jnp.where(m < n, m, p - m)


def _affine_reflect_warp(img, angle_deg, scale, shift_xy, nearest: bool):
    """cv2.warpAffine(getRotationMatrix2D((w/2,h/2), angle, scale) + shift,
    BORDER_REFLECT_101) on ONE (H, W, C) image: the dst->src affine is the
    analytic inverse of M (cv2 inverts M internally by default)."""
    H, W, C = img.shape
    rad = angle_deg * (jnp.pi / 180.0)
    a = scale * jnp.cos(rad)
    b = scale * jnp.sin(rad)
    cx, cy = W / 2.0, H / 2.0
    tx = (1.0 - a) * cx - b * cy + shift_xy[0] * W
    ty = b * cx + (1.0 - a) * cy + shift_xy[1] * H
    det = a * a + b * b
    ia, ib = a / det, b / det  # inv([[a, b], [-b, a]]) = [[a, -b], [b, a]]/det
    x = jnp.arange(W, dtype=jnp.float32)[None, :] - tx
    y = jnp.arange(H, dtype=jnp.float32)[:, None] - ty
    sx = ia * x - ib * y
    sy = ib * x + ia * y

    flat = img.reshape(H * W, C)

    def tap(yy, xx):
        return flat[_reflect101(yy, H) * W + _reflect101(xx, W)]

    if nearest:
        return tap(jnp.floor(sy + 0.5).astype(jnp.int32),
                   jnp.floor(sx + 0.5).astype(jnp.int32))
    x0 = jnp.floor(sx).astype(jnp.int32)
    y0 = jnp.floor(sy).astype(jnp.int32)
    wx = (sx - x0)[..., None]
    wy = (sy - y0)[..., None]
    top = tap(y0, x0) * (1 - wx) + tap(y0, x0 + 1) * wx
    bot = tap(y0 + 1, x0) * (1 - wx) + tap(y0 + 1, x0 + 1) * wx
    return top * (1 - wy) + bot * wy


def _one_of_flip_rot(img, mask, on, op, k):
    """OneOf{fliplr, flipud, rot90(k)} applied to a square crop pair."""
    def sel(x):
        cands = jnp.stack([
            x[:, ::-1],                      # op 0: fliplr
            x[::-1, :],                      # op 1: flipud
            jnp.rot90(x, 1), jnp.rot90(x, 2), jnp.rot90(x, 3),
        ])
        idx = jnp.where(op < 2, op, 2 + (k - 1))
        return jnp.where(on, cands[idx], x)

    return sel(img), sel(mask)


def augment_loveda_batch(images, hw, masks, decisions, cfg: LoveDAAugConfig):
    """Fused LoveDA train chain. images (B,S,S,3) uint8/f32, masks (B,S,S)
    int32 with `ignore_index` fill; returns (normalized images
    (B,crop,crop,3), masks (B,crop,crop) int32)."""
    imgs = images.astype(jnp.float32)
    sh, sw, pad, offs = _geometry(hw, jnp.ones((images.shape[0],)),
                                  decisions["pad_u"], decisions["crop_u"],
                                  cfg.crop_size)
    crop_cfg = DeviceAugConfig(
        crop_size=cfg.crop_size, num_classes=cfg.num_classes,
        ignore_index=cfg.ignore_index, cat_max_ratio=cfg.cat_max_ratio,
        crop_tries=cfg.crop_tries)

    def one(img, msk, h, w, shb, swb, padb, offsb, fr_on, op, k,
            ssr_on, ang, sc, shift):
        off = _pick_crop_try(msk, h, w, shb, swb, padb, offsb, False, crop_cfg)
        ic = _warp_one(img, h, w, shb, swb, padb, off, False, cfg.crop_size,
                       (0.0, 0.0, 0.0), nearest=False)
        mc = _warp_one(msk[..., None].astype(jnp.float32), h, w, shb, swb,
                       padb, off, False, cfg.crop_size,
                       (float(cfg.ignore_index),), nearest=True)
        ic, mc = _one_of_flip_rot(ic, mc, fr_on, op, k)
        iw = _affine_reflect_warp(ic, ang, sc, shift, nearest=False)
        mw = _affine_reflect_warp(mc, ang, sc, shift, nearest=True)
        ic = jnp.where(ssr_on, iw, ic)
        mc = jnp.where(ssr_on, mw, mc)
        return normalize_img_j(ic), mc[..., 0].astype(jnp.int32)

    return jax.vmap(one)(
        imgs, masks, hw[:, 0], hw[:, 1], sh, sw, pad, offs,
        decisions["fr_on"], decisions["op"], decisions["rot_k"],
        decisions["ssr_on"], decisions["angle"], decisions["ssr_scale"],
        decisions["shift"])
