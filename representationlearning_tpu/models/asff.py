"""ASFF fusion variants + self-attention — parity with
`RSSFormer-TIP2023/module/baseline/rs.py` (rsNetFusion + ASFF `:44-182`, Self_Attn
`:337-372`) and `hrnet2.py` (HRNetFusion2, the SimpleFusion variant without the aux
head). These are the reference's research sweep around the flagship; the ASFF neck
softmax-gates the four upsampled HRNet branches with dilated-conv weight heads.
"""
from __future__ import annotations

from typing import Any, Mapping

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..core.registry import MODELS
from ..losses.cgfl import segmentation_loss
from ..ops.image import resize_bilinear_auto, resize_nearest
from .hrnet import HRNET_EXTRA, HighResolutionNet
from .layers import TorchConv


class ASFF(nn.Module):
    """Adaptive spatial feature fusion (`rs.py:122-182`): nearest-upsample all branches
    to 1/4, per-branch dilated-conv weight maps -> softmax over branches, gated concat."""

    compress_c: int = 16

    @nn.compact
    def __call__(self, feats):
        x0 = feats[0]
        tgt = x0.shape[1:3]
        ups = [x0] + [resize_nearest(f, tgt) for f in feats[1:]]
        dilations = (1, 6, 12, 18)
        weights = []
        for i, (f, d) in enumerate(zip(ups, dilations)):
            if d == 1:
                w = TorchConv(self.compress_c, (1, 1), name=f"w{i}")(f)
            else:
                w = TorchConv(self.compress_c, (3, 3), padding=(d, d), dilation=(d, d),
                              name=f"w{i}")(f)
            weights.append(w)
        lv = TorchConv(4, (1, 1), name="weight_levels")(jnp.concatenate(weights, -1))
        lv = jax.nn.softmax(lv, axis=-1)
        return jnp.concatenate(
            [f * lv[..., i : i + 1] for i, f in enumerate(ups)], axis=-1
        )


class SelfAttn(nn.Module):
    """SAGAN-style self-attention with learned residual gamma (`rs.py:337-372`)."""

    in_dim: int

    @nn.compact
    def __call__(self, x):
        B, H, W, C = x.shape
        q = TorchConv(self.in_dim // 8, (1, 1), name="query_conv")(x).reshape(B, H * W, -1)
        k = TorchConv(self.in_dim // 8, (1, 1), name="key_conv")(x).reshape(B, H * W, -1)
        v = TorchConv(self.in_dim, (1, 1), name="value_conv")(x).reshape(B, H * W, -1)
        attn = jax.nn.softmax(
            jnp.einsum("bnc,bmc->bnm", q, k, preferred_element_type=jnp.float32), -1
        )
        out = jnp.einsum("bnm,bmc->bnc", attn, v, preferred_element_type=jnp.float32)
        gamma = self.param("gamma", nn.initializers.zeros, (1,))
        return gamma * out.reshape(B, H, W, C) + x


@MODELS.register("rsNetFusion")
class RsNetFusion(nn.Module):
    """HRNet encoder + ASFF neck + 1x1 head (`rs.py:44-91`)."""

    hrnet_type: str = "hrnetv2_w32"
    classes: int = 7
    upsample_scale: int = 4
    with_transformer: bool = False
    loss_config: Mapping = None  # type: ignore[assignment]
    ignore_index: int = -1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, y=None, train: bool = False):
        feats = HighResolutionNet(self.hrnet_type, with_transformer=self.with_transformer,
                                  dtype=self.dtype, name="backbone")(x, train=train)
        fused = ASFF(name="neck")(feats)
        logit = nn.Conv(self.classes, (1, 1), name="head_conv")(fused)
        H, W = logit.shape[1] * self.upsample_scale, logit.shape[2] * self.upsample_scale
        logit = resize_bilinear_auto(logit, (H, W), align_corners=True)
        if train:
            return segmentation_loss(logit, y, self.loss_config or {"ce": {}}, self.ignore_index)
        return jax.nn.softmax(logit, axis=-1)


@MODELS.register("HRNetFusion2")
class HRNetFusion2(nn.Module):
    """SimpleFusion HRNet variant without the aux head (`hrnet2.py:45-110`)."""

    hrnet_type: str = "hrnetv2_w32"
    classes: int = 7
    upsample_scale: int = 4
    with_transformer: bool = False
    loss_config: Mapping = None  # type: ignore[assignment]
    ignore_index: int = -1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, y=None, train: bool = False):
        widths = HRNET_EXTRA[self.hrnet_type]["widths"]
        feats = HighResolutionNet(self.hrnet_type, with_transformer=self.with_transformer,
                                  dtype=self.dtype, name="backbone")(x, train=train)
        tgt = feats[0].shape[1:3]
        ups = [feats[0]] + [resize_bilinear_auto(f, tgt, align_corners=True) for f in feats[1:]]
        h = jnp.concatenate(ups, axis=-1)
        h = TorchConv(sum(widths), (1, 1), name="fuse_conv")(h)
        h = nn.BatchNorm(use_running_average=not train, momentum=0.9, name="fuse_bn")(h)
        h = nn.relu(h)
        logit = nn.Conv(self.classes, (1, 1), name="head_conv")(h)
        H, W = logit.shape[1] * self.upsample_scale, logit.shape[2] * self.upsample_scale
        logit = resize_bilinear_auto(logit, (H, W), align_corners=True)
        if train:
            return segmentation_loss(logit, y, self.loss_config or {"ce": {}}, self.ignore_index)
        return jax.nn.softmax(logit, axis=-1)
