"""WaveCAM wave-modeling block + per-class predictor — parity with
`WaveCAM-TMM2023/net/wavecam.py:39-83` and `net/resnet50_cam.py:155-189`.

WaveModeling treats the 20-channel CAM as a wave: the foreground branch
relu(x/3 + 0.1) and background branch (1-x)/3 each get 1x1 phase convs
(conv-BN-relu), amplitude 1x1 convs, cos/sin modulation into 2C channels, grouped
(1,7)/(7,1) token-FCs back to C, and a softmax pair-reweighting from pooled features.

The predictor reshapes the (B, 2C, H, W) wave output channel-major into (B, C, 2*H*W)
and adds it to the (B, C, feat) class features (2*32*32 == 2048 at the reference's
512-crop/stride-16 geometry, `resnet50_cam.py:164-169`). The reference's per-image
python loops over present classes (`:172-189`) become masked batched CE.
"""
from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..core.registry import MODELS
from ..ops.image import adaptive_avg_pool_11


class WaveModeling(nn.Module):
    dim: int = 20
    qkv_bias: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        """x: (B, H, W, C=dim) CAM. Returns (B, H, W, 2*dim), last dim ordered
        [h-branch 0..C-1, w-branch 0..C-1] (torch channel order)."""
        B, H, W, C = x.shape
        x = jax.nn.relu(x / 3.0 + 0.1)

        def conv_bn_relu(h, name):
            h = nn.Conv(self.dim, (1, 1), use_bias=True, name=f"{name}_conv")(h)
            h = nn.BatchNorm(use_running_average=not train, momentum=0.9, epsilon=1e-5,
                             name=f"{name}_bn")(h)
            return nn.relu(h)

        theta_R = conv_bn_relu(x, "theta_R")
        background = (1.0 - x) / 3.0
        theta_I = conv_bn_relu(background, "theta_I")

        x_h = nn.Conv(self.dim, (1, 1), use_bias=self.qkv_bias, name="fc_h")(x)
        x_w = nn.Conv(self.dim, (1, 1), use_bias=self.qkv_bias, name="fc_w")(background)
        x_h = jnp.concatenate([x_h * jnp.cos(theta_R), x_h * jnp.sin(theta_R)], axis=-1)
        x_w = jnp.concatenate([x_w * jnp.cos(theta_I), x_w * jnp.sin(theta_I)], axis=-1)

        h = nn.Conv(self.dim, (1, 7), padding=((0, 0), (3, 3)),
                    feature_group_count=self.dim, use_bias=False, name="tfc_h")(x_h)
        w = nn.Conv(self.dim, (7, 1), padding=((3, 3), (0, 0)),
                    feature_group_count=self.dim, use_bias=False, name="tfc_w")(x_w)

        a = adaptive_avg_pool_11(x)  # (B,1,1,C)
        w1 = nn.Conv(self.dim, (1, 1), name="w1")(a)
        w2 = nn.Conv(self.dim, (1, 1), name="w2")(a)
        # reference reshapes the (B, 2C) concat into (B, C, 2) (`wavecam.py:76-78`),
        # which pairs channels (2c, 2c+1) of [w1; w2] — NOT (w1_c, w2_c); keep parity
        cat = jnp.concatenate([w1, w2], axis=-1)  # (B,1,1,2C)
        pair = cat.reshape(cat.shape[:-1] + (C, 2))
        pair = jax.nn.softmax(pair, axis=-1)

        return jnp.concatenate([h * pair[..., 0], w * pair[..., 1]], axis=-1)


@MODELS.register("wavecam_class_predictor")
class ClassPredictorWavecam(nn.Module):
    """`Class_Predictor_wavecam`: per-class re-classification of masked class features
    augmented with the wave-modulated CAM. Returns (loss, acc)."""

    num_classes: int = 20
    representation_size: int = 2048
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, label, cams, train: bool = False):
        """x: (B, num_classes, representation_size) class features (Net.cam_feature);
        label: (B, num_classes) multilabel one-hot; cams: (B, H, W, num_classes) with
        2*H*W == representation_size."""
        B, C, F = x.shape
        # the reference relies on 2*H*W == representation_size (true only at the
        # 512-crop/stride-16 geometry); for other geometries resize the CAM to the
        # canonical s x s grid first (identity at the reference geometry)
        s = int(round((self.representation_size // 2) ** 0.5))
        if cams.shape[1:3] != (s, s):
            from ..ops.image import resize_bilinear_auto

            cams = resize_bilinear_auto(cams, (s, s), align_corners=False)
        wave = WaveModeling(self.num_classes, name="wave")(cams, train=train)
        # torch `view(B, C, -1)` of NCHW is channel-major: transpose NHWC->NCHW first
        feat = wave.transpose(0, 3, 1, 2).reshape(B, C, -1)
        x = x + feat

        kernel = self.param(
            "classifier_kernel",
            nn.initializers.lecun_normal(),
            (self.representation_size, self.num_classes),
        )
        logits = jnp.einsum("bcf,fk->bck", x, kernel, preferred_element_type=jnp.float32)

        # masked per-class CE: for each (sample, present class c), target is c
        logp = jax.nn.log_softmax(logits, axis=-1)
        diag_nll = -jnp.diagonal(logp, axis1=1, axis2=2)  # (B, C): -logp[b, c, c]
        mask = (label > 0).astype(logits.dtype)
        n_per = mask.sum(axis=1)
        per_sample = (diag_nll * mask).sum(axis=1) / jnp.maximum(n_per, 1.0)
        loss = per_sample.sum() / B  # reference divides by batch size (`:188`)

        pred = logits.argmax(axis=-1)  # (B, C)
        correct = ((pred == jnp.arange(C)[None, :]) * mask).sum()
        acc = correct / jnp.maximum(mask.sum(), 1.0)
        return loss, acc
