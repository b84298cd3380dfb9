"""RML mutual-information losses — parity with `RML/scripts/dist_train_voc.py:180-209`
(MI estimators) and the trainer's CIML/MFML/APML composition (`:340-394`).

torch quirks reproduced exactly:
- `kl_div(input=softmax(F1/T), target=softmax(F2/T))`: torch's kl_div expects
  log-probabilities as `input` but the reference passes probabilities; the pointwise
  value target*(log(target) - input) with mean reduction is computed as-is.
- CIML's `cosine_similarity(..., dim=3)` reduces over a singleton axis, yielding the
  +-1 sign-agreement matrix of pooled class vectors (denominator clamped at 1e-8).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..ops.image import resize_bilinear_auto


def torch_kl_div_mean(inp: jax.Array, target: jax.Array) -> jax.Array:
    """F.kl_div(input, target, reduction='mean'): mean over ALL elements of
    target * (log(target) - input), with 0 * log(0) := 0."""
    logt = jnp.where(target > 0, jnp.log(jnp.where(target > 0, target, 1.0)), 0.0)
    point = target * logt - target * inp
    return point.mean()


def feat_feat_mi_estimation(F1: jax.Array, F2: jax.Array, dim: int,
                            temperature: float = 0.05) -> jax.Array:
    """(B, H, W, dim) maps -> rows (B*dim, H*W) softmaxed; kl(F1.detach, F2)
    (`dist_train_voc.py:180-193`)."""
    B = F1.shape[0]
    f1 = F1.transpose(0, 3, 1, 2).reshape(B * dim, -1)
    f2 = F2.transpose(0, 3, 1, 2).reshape(B * dim, -1)
    p1 = jax.nn.softmax(jax.lax.stop_gradient(f1) / temperature, axis=1)
    p2 = jax.nn.softmax(f2 / temperature, axis=1)
    return torch_kl_div_mean(p1, p2)


def feat_label_mi_estimation(feat: jax.Array, Y: jax.Array,
                             temperature: float = 0.05) -> jax.Array:
    """(B, H, W) prediction map vs (B, H, W) label map (`:195-209`)."""
    B = feat.shape[0]
    f = feat.reshape(B, -1)
    y = Y.reshape(B, -1).astype(jnp.float32)
    p1 = jax.nn.softmax(jax.lax.stop_gradient(f) / temperature, axis=1)
    p2 = jax.nn.softmax(y / temperature, axis=1)
    return torch_kl_div_mean(p1, p2)


def _sign_cosine_matrix(a: jax.Array, b: jax.Array, eps: float = 1e-8) -> jax.Array:
    """torch.cosine_similarity over a singleton dim: sign-agreement matrix
    (B, C, C) of the pooled vectors a, b (B, C)."""
    num = a[:, :, None] * b[:, None, :]
    den = jnp.maximum(jnp.abs(a)[:, :, None] * jnp.abs(b)[:, None, :], eps)
    return num / den


def ciml_loss(cams_full: jax.Array, cams_small: jax.Array) -> jax.Array:
    """Cross-Image (scale) Mutual Learning (`:340-357`): L1 between fg CAMs at the two
    scales + 0.1 * mean of the two sign-cosine matrices of pooled fg class vectors.
    cams_full must already be resized to cams_small's grid; both NHWC."""
    c1 = cams_full[..., 1:]
    c2 = cams_small[..., 1:]
    cam_l1 = jnp.abs(c1 - c2).mean()
    a = c1.mean(axis=(1, 2))  # adaptive_avg_pool2d -> (B, C-1)
    b = c2.mean(axis=(1, 2))
    sim = _sign_cosine_matrix(a, a)
    sim1 = _sign_cosine_matrix(b, b)
    return 0.1 * (sim + sim1).mean() + cam_l1


def mfml_loss(segs1: jax.Array, segs2: jax.Array) -> jax.Array:
    """Mutual Feature Mutual Learning (`:360-367`): L1 + 100x feat-feat MI between the
    fg seg maps at the two scales (both already on the small grid, NHWC)."""
    s1 = segs1[..., 1:]
    s2 = segs2[..., 1:]
    fea = jnp.abs(s1 - s2).mean()
    return 100.0 * feat_feat_mi_estimation(s1, s2, dim=s1.shape[-1]) + fea


def apml_mi_terms(attn_pred1: jax.Array, attn_pred2: jax.Array,
                  refined_label: jax.Array) -> jax.Array:
    """APML MI correction (`:371-386`): -100*((feat-label MI) - (feat-feat MI)) in both
    directions. attn_pred{1,2}: (B, N, N) affinity maps; refined_label (B, H, W)."""
    H, W = refined_label.shape[1:3]
    a1 = resize_bilinear_auto(attn_pred1[..., None], (H, W), align_corners=True)[..., 0]
    a2 = resize_bilinear_auto(attn_pred2[..., None], (H, W), align_corners=True)[..., 0]
    y = refined_label.astype(jnp.float32)
    lossmi = feat_feat_mi_estimation(a1[..., None], a2[..., None], dim=1)
    lossmil = feat_label_mi_estimation(a1, y)
    lossmi2 = feat_feat_mi_estimation(a2[..., None], a1[..., None], dim=1)
    lossmil2 = feat_label_mi_estimation(a2, y)
    return -100.0 * (lossmil - lossmi) - 100.0 * (lossmil2 - lossmi2)
