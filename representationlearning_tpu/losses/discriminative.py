"""Discriminative (pull-push) instance-embedding loss — parity with
`RSSFormer-TIP2023/losses/obj2.py:9-186` (`DiscriminativeLoss`: variance pull toward
instance means, distance push between means with 2*delta_d margin, L-norm
regularization of the means; the reference's per-sample python loops become masked
batched reductions).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def _instance_means(pred, gt):
    """pred (B, N, F); gt one-hot (B, N, I) -> means (B, I, F) with safe divide."""
    num = jnp.einsum("bnf,bni->bif", pred, gt, preferred_element_type=jnp.float32)
    cnt = gt.sum(axis=1)[..., None]
    return num / jnp.maximum(cnt, 1.0)


def variance_term(pred, gt, delta_v: float = 0.5, norm: int = 2):
    """Pull: mean over instances/pixels of clamp(||pred - mean_i|| - delta_v)^2."""
    means = _instance_means(pred, gt)  # (B,I,F)
    d = pred[:, :, None, :] - means[:, None, :, :]  # (B,N,I,F)
    dist = jnp.linalg.norm(d, ord=norm, axis=-1)
    v = jnp.clip(dist - delta_v, 0.0, None) ** 2 * gt
    denom = jnp.maximum(gt.sum(axis=(1, 2)), 1.0)
    return (v.sum(axis=(1, 2)) / denom).mean()


def distance_term(means, instance_mask, delta_d: float = 2.0, norm: int = 2):
    """Push: clamp(2*delta_d - ||mean_i - mean_j||)^2 over distinct valid pairs.
    instance_mask (B, I) marks present instances."""
    B, I, F = means.shape
    diff = means[:, :, None, :] - means[:, None, :, :]
    dist = jnp.linalg.norm(diff, ord=norm, axis=-1)  # (B,I,I)
    margin = 2.0 * delta_d * (1.0 - jnp.eye(I))[None]
    pair = instance_mask[:, :, None] * instance_mask[:, None, :] * (1.0 - jnp.eye(I))[None]
    term = jnp.clip(margin - dist, 0.0, None) ** 2 * pair
    n = jnp.maximum(pair.sum(axis=(1, 2)), 1.0)
    return (term.sum(axis=(1, 2)) / n).mean()


def regularization_term(means, instance_mask, norm: int = 2):
    n = jnp.linalg.norm(means, ord=norm, axis=-1) * instance_mask
    cnt = jnp.maximum(instance_mask.sum(axis=1), 1.0)
    return (n.sum(axis=1) / cnt).mean()


def discriminative_loss(
    pred: jax.Array,
    instance_labels: jax.Array,
    n_instances: int,
    delta_v: float = 0.5,
    delta_d: float = 2.0,
    norm: int = 2,
    alpha: float = 1.0,
    beta: float = 1.0,
    gamma: float = 0.001,
):
    """pred (B, H, W, F) embeddings; instance_labels (B, H, W) int ids in
    [0, n_instances) (negatives ignored). Returns the weighted pull+push+reg sum."""
    B, H, W, F = pred.shape
    p = pred.reshape(B, H * W, F)
    lab = instance_labels.reshape(B, H * W)
    valid = (lab >= 0) & (lab < n_instances)
    onehot = jax.nn.one_hot(jnp.where(valid, lab, 0), n_instances) * valid[..., None]
    present = (onehot.sum(axis=1) > 0).astype(p.dtype)  # (B, I)
    means = _instance_means(p, onehot)
    lv = variance_term(p, onehot, delta_v, norm)
    ld = distance_term(means, present, delta_d, norm)
    lr = regularization_term(means, present, norm)
    return alpha * lv + beta * ld + gamma * lr, {"var": lv, "dist": ld, "reg": lr}
