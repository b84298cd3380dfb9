"""RSSFormer model (registry name 'RSSFormer') — parity with
`RSSFormer-TIP2023/module/baseline/hrnet_aux.py:70-134`.

HRNetV2 encoder with transformer fusion + SimpleFusion8 neck (upsample-all-to-1/4
align_corners=True, concat, 1x1 conv-BN-relu; also returns the raw branch-0 feature) +
1x1 classifier head with x4 bilinear upsample (UpsamplingBilinear2d == align_corners
True) + aux linear head on the pooled branch-0 feature. Training returns the CGFL loss
dict; eval returns softmax probabilities.
"""
from __future__ import annotations

from typing import Any, Mapping, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..core.registry import MODELS
from ..losses.cgfl import segmentation_loss_aux
from ..ops.image import adaptive_avg_pool_11, resize_bilinear_auto
from .hrnet import HRNET_EXTRA, HighResolutionNet
from .hrt import HRT_CONFIGS, HighResolutionTransformerNet
from .layers import RawStatBatchNorm, TorchConv


class SimpleFusion8(nn.Module):
    in_channels: int
    defer_bn_ema: bool = False
    dtype: Any = None  # compute/storage dtype of the upsample+concat+conv chain
    # (bf16 halves the (B, 128, 128, 480) concat — the largest single HBM
    # structure in the train step at 512^2; conv accumulates f32, BN stats f32)

    @nn.compact
    def __call__(self, feats: Sequence[jax.Array], train: bool = False):
        x0 = feats[0]
        tgt = x0.shape[1:3]
        dt = self.dtype
        cast = (lambda a: a.astype(dt)) if dt is not None else (lambda a: a)
        ups = [cast(x0)] + [cast(resize_bilinear_auto(f, tgt, align_corners=True))
                            for f in feats[1:]]
        x = jnp.concatenate(ups, axis=-1)
        x = TorchConv(self.in_channels, (1, 1), dtype=dt, name="conv")(x)
        cls = RawStatBatchNorm if self.defer_bn_ema else nn.BatchNorm
        x = cls(use_running_average=not train, momentum=0.9, epsilon=1e-5,
                name="bn")(x)
        return nn.relu(x), x0


@MODELS.register("RSSFormer")
class HRNetFusion(nn.Module):
    hrnet_type: str = "hrnetv2_w32"
    classes: int = 7
    upsample_scale: int = 4
    with_transformer: bool = True
    loss_config: Mapping = None  # type: ignore[assignment]
    ignore_index: int = -1
    dtype: Any = jnp.float32
    # Deferred BN running-stat update: every BatchNorm stores raw batch stats and
    # the trainer applies one fused flat-vector EMA over all ~400 layers per step
    # (see models/layers.py::RawStatBatchNorm). Arithmetic-identical updates.
    defer_bn_ema: bool = False
    # fused_mlp=True runs each transformer block's MlpDWBN FFN (~96% of the
    # block FLOPs at predict) as one whole-FFN pallas kernel at inference
    # (ops/pallas/mlp_dwbn.py); identical param tree, train-mode unaffected.
    fused_mlp: bool = False
    # conv_mm=True lowers MlpDWBN's dilated 3x3 branches as shifted MXU
    # matmuls in BOTH train and predict (differentiable; same params) —
    # attacks the conv-emitter layout churn around the transformer blocks
    conv_mm: bool = False
    # remat_transformer=True recomputes each GeneralTransformerBlock in the
    # backward pass (see hrnet.HighResolutionModule) — unlocks batch >= 16
    # training at 512^2 on a 16G chip (b16 OOMed at 26.2G/15.75G without it).
    # NOT a throughput lever: b16+remat measured 26.0 img/s vs 27.3 at b8 on
    # the v5e (r5) — the step is batch-proportional, not fixed-tail-dominated.
    remat_transformer: bool = False
    # neck_bf16=True runs the SimpleFusion8 upsample+concat+conv chain in bf16
    # (halves the (B, 128, 128, 480) concat, the largest train-step HBM
    # structure). Memory lever only: at batch 8 it measured 292.8 vs ~267
    # ms/step (r5 A/B) — the cast/layout overhead beats the traffic saving.
    neck_bf16: bool = False

    def setup(self):
        if self.hrnet_type in HRT_CONFIGS:
            # HRFormer alternative backbone (`hrt_backbone.py:370`, selected in the
            # reference by swapping the import at `hrnet_encoder.py:7-8`)
            if self.defer_bn_ema:
                raise ValueError("defer_bn_ema is not plumbed through the HRT backbone")
            widths = HRT_CONFIGS[self.hrnet_type]["channels"]
            self.backbone = HighResolutionTransformerNet(
                self.hrnet_type, dtype=self.dtype, name="backbone",
            )
        else:
            widths = HRNET_EXTRA[self.hrnet_type]["widths"]
            self.backbone = HighResolutionNet(
                self.hrnet_type, with_transformer=self.with_transformer,
                dtype=self.dtype, defer_bn_ema=self.defer_bn_ema,
                fused_mlp=self.fused_mlp, conv_mm=self.conv_mm,
                remat_transformer=self.remat_transformer, name="backbone",
            )
        self.neck_channels = sum(widths)
        self.neck = SimpleFusion8(
            self.neck_channels, defer_bn_ema=self.defer_bn_ema,
            dtype=jnp.bfloat16 if self.neck_bf16 else None, name="neck")
        self.head_conv = nn.Conv(self.classes, (1, 1), name="head_conv")
        self.headaux = nn.Dense(self.classes, name="headaux")

    def __call__(self, x, y=None, train: bool = False):
        feats = self.backbone(x, train=train)
        fused, f0 = self.neck(feats, train=train)
        aux_logits = self.headaux(adaptive_avg_pool_11(f0).reshape(x.shape[0], -1))
        logit = self.head_conv(fused)
        H, W = logit.shape[1] * self.upsample_scale, logit.shape[2] * self.upsample_scale
        logit = resize_bilinear_auto(logit, (H, W), align_corners=True)

        if train:
            cfg = self.loss_config or {"ce": {}}
            return segmentation_loss_aux(logit, y, aux_logits, cfg, self.ignore_index)
        return jax.nn.softmax(logit, axis=-1)
