"""SCD/RML WSSS loss library (parity with `SCD-AAAI2023/utils/losses.py` and
`utils/corrloss.py`; trainer mixing at `scripts/dist_train_voc.py:340-353`).

All losses are pure functions of (predictions, targets [, key]) and jit-able.
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from ..ops.image import grid_sample_bilinear


def multilabel_soft_margin_loss(logits: jax.Array, targets: jax.Array) -> jax.Array:
    """torch F.multilabel_soft_margin_loss: mean over classes then batch of
    -[y·log σ(x) + (1−y)·log σ(−x)]."""
    log_pos = jax.nn.log_sigmoid(logits)
    log_neg = jax.nn.log_sigmoid(-logits)
    per_class = -(targets * log_pos + (1.0 - targets) * log_neg)
    return per_class.mean()


def aux_loss(inputs: jax.Array, targets: jax.Array) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Balanced affinity loss (`losses.py:11-22`): inputs = sigmoid affinity map,
    targets in {0, 1, ignore}; pos term pulls toward 1, neg toward 0, each normalized
    by its count + 1. Returns (loss, pos_count, neg_count)."""
    pos = (targets == 1).astype(inputs.dtype)
    neg = (targets == 0).astype(inputs.dtype)
    pos_count = pos.sum() + 1.0
    neg_count = neg.sum() + 1.0
    pos_loss = (pos * (1.0 - inputs)).sum() / pos_count
    neg_loss = (neg * inputs).sum() / neg_count
    return 0.5 * pos_loss + 0.5 * neg_loss, pos_count, neg_count


def select_class(x: jax.Array, idx: jax.Array) -> jax.Array:
    """x[..., idx[...]] over the last (class) axis as a one-hot contraction.
    Float-exact vs take_along_axis (sums one element times 1.0), but fuses into
    elementwise work on TPU — the per-pixel class gather was the single most
    expensive op of the RSSFormer train step (2x30 ms of serial gather at
    8x512^2x7; this form is ~free). Gradients are equivalent (multiply by the
    same one-hot instead of scatter)."""
    onehot = jax.nn.one_hot(idx, x.shape[-1], dtype=x.dtype)
    return (x * onehot).sum(axis=-1)


def cross_entropy_ignore(logits: jax.Array, labels: jax.Array, ignore_index: int = 255) -> jax.Array:
    """torch F.cross_entropy(ignore_index=...) semantics: mean over non-ignored pixels.
    logits (..., C) channel-last; labels integer (...)."""
    valid = (labels != ignore_index) & (labels >= 0) & (labels < logits.shape[-1])
    safe_labels = jnp.where(valid, labels, 0).astype(jnp.int32)
    logp = jax.nn.log_softmax(logits, axis=-1)
    nll = -select_class(logp, safe_labels)
    nll = jnp.where(valid, nll, 0.0)
    n = valid.sum()
    return jnp.where(n > 0, nll.sum() / jnp.maximum(n, 1), 0.0)


def seg_loss(pred: jax.Array, label: jax.Array, ignore_index: int = 255) -> jax.Array:
    """Background/foreground-split CE (`losses.py:24-33`): average of CE over only-bg
    pixels and CE over only-fg pixels."""
    bg_label = jnp.where(label != 0, ignore_index, label)
    fg_label = jnp.where(label == 0, ignore_index, label)
    return 0.5 * (
        cross_entropy_ignore(pred, bg_label, ignore_index)
        + cross_entropy_ignore(pred, fg_label, ignore_index)
    )


# ------------------------------------------------------ self-correspondence distillation
def _norm(t: jax.Array) -> jax.Array:
    """F.normalize(dim=1) on NHWC -> normalize channel axis (-1)."""
    return t / jnp.maximum(jnp.linalg.norm(t, axis=-1, keepdims=True), 1e-10)


def tensor_correlation(a: jax.Array, b: jax.Array) -> jax.Array:
    """einsum('nchw,ncij->nhwij') on NHWC inputs (`corrloss.py:14-15`)."""
    return jnp.einsum("nhwc,nijc->nhwij", a, b, preferred_element_type=jnp.float32)


def contrastive_corr_loss(
    key: jax.Array,
    feats: jax.Array,
    feats_pos: jax.Array,
    code: jax.Array,
    code_pos: jax.Array,
    n_samples: int = 40,
) -> jax.Array:
    """ContrastiveCorrelationLoss (`corrloss.py:42-89`): grid-sample n_samples^2 random
    coords from both maps, correlate; loss = mean(-clamp(cd,0)·fd) with fd mean-shifted.
    Inputs NHWC (feats = CAMs, code = seg features in the SCD trainer, `:329`)."""
    B = feats.shape[0]
    k1, k2 = jax.random.split(key)
    shape = (B, n_samples, n_samples, 2)
    coords1 = jax.random.uniform(k1, shape) * 2.0 - 1.0
    coords2 = jax.random.uniform(k2, shape) * 2.0 - 1.0
    # torch: sample(t, coords.permute(0,2,1,3)) — coords transposed before grid_sample
    c1 = coords1.transpose(0, 2, 1, 3)
    c2 = coords2.transpose(0, 2, 1, 3)

    f1 = grid_sample_bilinear(feats, c1)
    f2 = grid_sample_bilinear(feats_pos, c2)
    cd1 = grid_sample_bilinear(code, c1)
    cd2 = grid_sample_bilinear(code_pos, c2)

    fd = tensor_correlation(_norm(f1), _norm(f2))
    fd = jax.lax.stop_gradient(fd)
    old_mean = fd.mean()
    fd = fd - fd.mean(axis=(3, 4), keepdims=True)
    fd = fd - fd.mean() + old_mean

    cd = tensor_correlation(_norm(cd1), _norm(cd2))
    loss = -jnp.clip(cd, 0.0, None) * fd
    return loss.mean()


def equivariance_loss(cams_scaled: jax.Array, cams_small: jax.Array) -> jax.Array:
    """loss_er: L1 between full-scale CAMs resized to 0.3x and CAMs computed at 0.3x,
    foreground channels only (`dist_train_voc.py:324` slices [:,1:] — callers pass
    fg-only CAM stacks here)."""
    return jnp.abs(cams_scaled - cams_small).mean()
