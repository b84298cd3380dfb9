"""Remaining RSSFormer baseline-zoo members — parity with
`RSSFormer-TIP2023/module/baseline/unet.py:38-217` (smp-based UNetPP / LinkNet /
DeepLabV3 / DeepLabV3Plus / MANet / PAN wrappers, all ResNet-50 encoders, all with the
ever contract: loss dict in training, softmax in eval) and `trans.py:44-91` (HRNet +
SimpleFusion neck, the 'trans' registry entry; the ViT classes below it in that file
are dead experiment code never reached from `trans.forward`).

The reference delegates the architectures to the external `segmentation_models_pytorch`
package; these are from-scratch flax implementations of the same architectures on our
`ResNet50Backbone` taps (layer1..4 at strides 4/8/16/32 — smp's extra stride-2 stem tap
is folded into the final x4 upsample, which changes no contract the zoo exposes).

TPU notes: upsampling decoders use resize+conv instead of transposed convs (a strided
conv_transpose lowers to scatter-like ops on TPU; resize+conv stays dense on the MXU
and is the standard equivalent), attention gates are SE-style global-pool matmuls.
"""
from __future__ import annotations

from typing import Any, Mapping, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..core.registry import MODELS
from ..ops.image import adaptive_avg_pool_11, resize_bilinear_auto
from .baselines import _loss_or_softmax
from .layers import TorchConv
from .resnet import ResNet50Backbone, resnet50_config


def _bn(train, name):
    return nn.BatchNorm(use_running_average=not train, momentum=0.9, name=name)


class ConvBNReLU(nn.Module):
    ch: int
    k: int = 3
    dilation: int = 1

    @nn.compact
    def __call__(self, x, train: bool = False):
        p = (self.k // 2) * self.dilation
        x = TorchConv(self.ch, (self.k, self.k), padding=(p, p),
                      dilation=(self.dilation, self.dilation), use_bias=False,
                      name="conv")(x)
        x = _bn(train, "bn")(x)
        return nn.relu(x)


class DoubleConv(nn.Module):
    ch: int

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = ConvBNReLU(self.ch, name="c1")(x, train)
        return ConvBNReLU(self.ch, name="c2")(x, train)


# ----------------------------------------------------------------------------- UNet++
@MODELS.register("UNetPP")
class UNetPP(nn.Module):
    """UNet++ nested dense decoder (`unet.py:38-64`; Zhou et al. 2018) over the 4
    ResNet-50 taps: X[i][j] = conv(cat(X[i][0..j-1], up(X[i+1][j-1])))."""

    classes: int = 7
    decoder_channels: Sequence[int] = (256, 128, 64)
    loss_config: Mapping = None  # type: ignore[assignment]
    ignore_index: int = -1

    @nn.compact
    def __call__(self, x, y=None, train: bool = False):
        feats = ResNet50Backbone(name="encoder", **resnet50_config(16))(x)
        # grid rows i = encoder level (0 highest res), columns j = decoder depth
        grid = {(i, 0): f for i, f in enumerate(feats)}
        depth = len(feats) - 1
        for j in range(1, depth + 1):
            for i in range(0, depth + 1 - j):
                ch = self.decoder_channels[min(i, len(self.decoder_channels) - 1)]
                up = resize_bilinear_auto(grid[(i + 1, j - 1)], grid[(i, 0)].shape[1:3],
                                     align_corners=False)
                cat = jnp.concatenate([grid[(i, k)] for k in range(j)] + [up], axis=-1)
                grid[(i, j)] = DoubleConv(ch, name=f"x{i}_{j}")(cat, train)
        h = grid[(0, depth)]
        logit = nn.Conv(self.classes, (1, 1), name="head")(h)
        logit = resize_bilinear_auto(logit, x.shape[1:3], align_corners=False)
        return _loss_or_softmax(logit, y, train, self.loss_config, self.ignore_index)


# ---------------------------------------------------------------------------- LinkNet
class LinkNetDecoderBlock(nn.Module):
    """1x1 reduce C/4 -> x2 up (resize+3x3 conv, see module docstring) -> 1x1 expand
    (Chaurasia & Culurciello 2017, smp Linknet decoder)."""

    out_ch: int

    @nn.compact
    def __call__(self, x, target_hw, train: bool = False):
        c = x.shape[-1] // 4
        x = ConvBNReLU(c, k=1, name="reduce")(x, train)
        x = resize_bilinear_auto(x, target_hw, align_corners=False)
        x = ConvBNReLU(c, k=3, name="up_conv")(x, train)
        return ConvBNReLU(self.out_ch, k=1, name="expand")(x, train)


@MODELS.register("LinkNet")
class LinkNet(nn.Module):
    """LinkNet (`unet.py:67-93`): decoder blocks added to the encoder skips."""

    classes: int = 7
    loss_config: Mapping = None  # type: ignore[assignment]
    ignore_index: int = -1

    @nn.compact
    def __call__(self, x, y=None, train: bool = False):
        feats = ResNet50Backbone(name="encoder", **resnet50_config(16))(x)
        h = feats[3]
        for i in (2, 1, 0):
            skip = feats[i]
            h = LinkNetDecoderBlock(skip.shape[-1], name=f"dec{3 - i}")(
                h, skip.shape[1:3], train) + skip
        h = LinkNetDecoderBlock(32, name="dec4")(h, x.shape[1:3], train)
        logit = nn.Conv(self.classes, (1, 1), name="head")(h)
        return _loss_or_softmax(logit, y, train, self.loss_config, self.ignore_index)


# -------------------------------------------------------------------------- DeepLabV3
class ASPP(nn.Module):
    """Atrous spatial pyramid pooling, smp rates (12, 24, 36) + image pooling."""

    ch: int = 256
    rates: Sequence[int] = (12, 24, 36)

    @nn.compact
    def __call__(self, x, train: bool = False):
        branches = [ConvBNReLU(self.ch, k=1, name="b0")(x, train)]
        for i, r in enumerate(self.rates):
            branches.append(ConvBNReLU(self.ch, k=3, dilation=r, name=f"b{i + 1}")(x, train))
        pooled = adaptive_avg_pool_11(x)
        pooled = ConvBNReLU(self.ch, k=1, name="pool_conv")(pooled, train)
        branches.append(jnp.broadcast_to(pooled, x.shape[:3] + (self.ch,)))
        h = jnp.concatenate(branches, axis=-1)
        return ConvBNReLU(self.ch, k=1, name="project")(h, train)


@MODELS.register("DeepLabV3")
class DeepLabV3(nn.Module):
    """DeepLabV3 (`unet.py:97-123`): stride-8 dilated ResNet-50 + ASPP + x8 upsample."""

    classes: int = 7
    loss_config: Mapping = None  # type: ignore[assignment]
    ignore_index: int = -1

    @nn.compact
    def __call__(self, x, y=None, train: bool = False):
        feats = ResNet50Backbone(name="encoder", **resnet50_config(8))(x)
        h = ASPP(name="aspp")(feats[3], train)
        logit = nn.Conv(self.classes, (1, 1), name="head")(h)
        logit = resize_bilinear_auto(logit, x.shape[1:3], align_corners=False)
        return _loss_or_softmax(logit, y, train, self.loss_config, self.ignore_index)


@MODELS.register("DeepLabV3Plus")
class DeepLabV3Plus(nn.Module):
    """DeepLabV3+ (`unet.py:126-153`): stride-16 encoder, ASPP, 48-ch low-level skip
    from layer1, two 3x3 convs, x4 upsample."""

    classes: int = 7
    loss_config: Mapping = None  # type: ignore[assignment]
    ignore_index: int = -1

    @nn.compact
    def __call__(self, x, y=None, train: bool = False):
        feats = ResNet50Backbone(name="encoder", **resnet50_config(16))(x)
        h = ASPP(name="aspp")(feats[3], train)
        low = ConvBNReLU(48, k=1, name="low_reduce")(feats[0], train)
        h = resize_bilinear_auto(h, low.shape[1:3], align_corners=False)
        h = jnp.concatenate([h, low], axis=-1)
        h = ConvBNReLU(256, name="fuse1")(h, train)
        h = ConvBNReLU(256, name="fuse2")(h, train)
        logit = nn.Conv(self.classes, (1, 1), name="head")(h)
        logit = resize_bilinear_auto(logit, x.shape[1:3], align_corners=False)
        return _loss_or_softmax(logit, y, train, self.loss_config, self.ignore_index)


# ------------------------------------------------------------------------------ MANet
class PAB(nn.Module):
    """Position attention block on the deepest feature (smp MAnet)."""

    mid: int = 64

    @nn.compact
    def __call__(self, x, train: bool = False):
        B, H, W, C = x.shape
        q = TorchConv(self.mid, (1, 1), name="q")(x).reshape(B, H * W, self.mid)
        k = TorchConv(self.mid, (1, 1), name="k")(x).reshape(B, H * W, self.mid)
        v = TorchConv(C, (1, 1), name="v")(x).reshape(B, H * W, C)
        attn = jax.nn.softmax(jnp.einsum("bnc,bmc->bnm", q, k,
                                         preferred_element_type=jnp.float32), axis=-1)
        out = jnp.einsum("bnm,bmc->bnc", attn, v,
                         preferred_element_type=jnp.float32).reshape(B, H, W, C)
        return x + out


class MFAB(nn.Module):
    """Multi-scale fusion attention block: SE channel attention over the fused
    skip + upsampled decoder state (smp MAnet decoder)."""

    ch: int
    reduction: int = 16

    @nn.compact
    def __call__(self, x, skip, train: bool = False):
        x = resize_bilinear_auto(x, skip.shape[1:3], align_corners=False)
        x = ConvBNReLU(skip.shape[-1], name="pre")(x, train)
        h = x + skip
        se = adaptive_avg_pool_11(h)
        se = nn.relu(nn.Dense(max(h.shape[-1] // self.reduction, 4), name="se1")(se))
        se = jax.nn.sigmoid(nn.Dense(h.shape[-1], name="se2")(se))
        h = h * se
        h = ConvBNReLU(self.ch, name="c1")(h, train)
        return ConvBNReLU(self.ch, name="c2")(h, train)


@MODELS.register("MANet")
class MANet(nn.Module):
    """MA-Net (`unet.py:158-183`): PAB on the deepest tap, MFAB fusion decoder."""

    classes: int = 7
    decoder_channels: Sequence[int] = (256, 128, 64)
    loss_config: Mapping = None  # type: ignore[assignment]
    ignore_index: int = -1

    @nn.compact
    def __call__(self, x, y=None, train: bool = False):
        feats = ResNet50Backbone(name="encoder", **resnet50_config(16))(x)
        h = PAB(name="pab")(feats[3], train)
        for n, i in enumerate((2, 1, 0)):
            h = MFAB(self.decoder_channels[n], name=f"dec{n}")(h, feats[i], train)
        h = resize_bilinear_auto(h, x.shape[1:3], align_corners=False)
        h = ConvBNReLU(32, name="final")(h, train)
        logit = nn.Conv(self.classes, (1, 1), name="head")(h)
        return _loss_or_softmax(logit, y, train, self.loss_config, self.ignore_index)


# -------------------------------------------------------------------------------- PAN
class FPA(nn.Module):
    """Feature pyramid attention on the deepest tap (PAN, Li et al. 2018)."""

    ch: int

    @nn.compact
    def __call__(self, x, train: bool = False):
        B, H, W, C = x.shape
        glob = adaptive_avg_pool_11(x)
        glob = ConvBNReLU(self.ch, k=1, name="glob")(glob, train)
        mid = ConvBNReLU(self.ch, k=1, name="mid")(x, train)
        # conv pyramid (7/5/3) at halved resolutions; depth adapts so tiny feature
        # maps (small inputs) never pool below 1x1
        ks = (7, 5, 3)
        downs, h = [], x
        for i, k in enumerate(ks):
            if min(h.shape[1], h.shape[2]) < 2:
                break
            h = ConvBNReLU(self.ch, k=k, name=f"d{i + 1}")(
                nn.avg_pool(h, (2, 2), (2, 2)), train)
            downs.append(h)
        up = None
        for i in range(len(downs) - 1, -1, -1):
            h = downs[i] if up is None else downs[i] + up
            tgt = downs[i - 1].shape[1:3] if i > 0 else (H, W)
            up = resize_bilinear_auto(ConvBNReLU(self.ch, k=ks[i], name=f"u{i + 1}")(h, train),
                                 tgt, align_corners=False)
        pyr = up if up is not None else jnp.ones((B, H, W, self.ch), x.dtype)
        return mid * pyr + jnp.broadcast_to(glob, (B, H, W, self.ch))


class GAU(nn.Module):
    """Global attention upsample: the pooled high-level feature gates the low-level
    skip, added to the upsampled high-level state (PAN decoder)."""

    ch: int

    @nn.compact
    def __call__(self, high, low, train: bool = False):
        low_c = ConvBNReLU(self.ch, name="low_conv")(low, train)
        gate = adaptive_avg_pool_11(high)
        gate = jax.nn.sigmoid(
            _bn(train, "gate_bn")(TorchConv(self.ch, (1, 1), use_bias=False,
                                            name="gate_conv")(gate)))
        up = resize_bilinear_auto(high, low.shape[1:3], align_corners=False)
        up = ConvBNReLU(self.ch, k=1, name="up_conv")(up, train)
        return up + low_c * gate


@MODELS.register("PAN")
class PAN(nn.Module):
    """Pyramid attention network (`unet.py:186-211`): FPA + GAU decoder, 32 ch."""

    classes: int = 7
    decoder_ch: int = 32
    loss_config: Mapping = None  # type: ignore[assignment]
    ignore_index: int = -1

    @nn.compact
    def __call__(self, x, y=None, train: bool = False):
        feats = ResNet50Backbone(name="encoder", **resnet50_config(16))(x)
        h = FPA(self.decoder_ch, name="fpa")(feats[3], train)
        for n, i in enumerate((2, 1, 0)):
            h = GAU(self.decoder_ch, name=f"gau{n}")(h, feats[i], train)
        logit = nn.Conv(self.classes, (1, 1), name="head")(h)
        logit = resize_bilinear_auto(logit, x.shape[1:3], align_corners=False)
        return _loss_or_softmax(logit, y, train, self.loss_config, self.ignore_index)


# ------------------------------------------------------------------------------ trans
@MODELS.register("trans")
class Trans(nn.Module):
    """`trans.py:44-91`: HRNet backbone + SimpleFusion (upsample-concat-1x1-BN-relu,
    no aux head) + 1x1 classifier with x4 bilinear upsample. The reference file also
    defines an unused ViT stack after the registered model; it is dead code."""

    hrnet_type: str = "hrnetv2_w48"
    classes: int = 7
    upsample_scale: int = 4
    loss_config: Mapping = None  # type: ignore[assignment]
    ignore_index: int = -1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, y=None, train: bool = False):
        from .hrnet import HRNET_EXTRA, HighResolutionNet

        widths = HRNET_EXTRA[self.hrnet_type]["widths"]
        feats = HighResolutionNet(self.hrnet_type, with_transformer=False,
                                  dtype=self.dtype, name="backbone")(x, train=train)
        tgt = feats[0].shape[1:3]
        ups = [feats[0]] + [resize_bilinear_auto(f, tgt, align_corners=True) for f in feats[1:]]
        h = jnp.concatenate(ups, axis=-1)
        h = TorchConv(sum(widths), (1, 1), name="fuse_conv")(h)
        h = _bn(train, "fuse_bn")(h)
        h = nn.relu(h)
        logit = nn.Conv(self.classes, (1, 1), name="head")(h)
        H, W = logit.shape[1] * self.upsample_scale, logit.shape[2] * self.upsample_scale
        logit = resize_bilinear_auto(logit, (H, W), align_corners=True)
        return _loss_or_softmax(logit, y, train, self.loss_config, self.ignore_index)
