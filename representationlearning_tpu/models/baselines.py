"""RSSFormer baseline model zoo — parity with `RSSFormer-TIP2023/module/baseline/`
(registered in the ever MODEL registry there; here in `core.registry.MODELS`).
All follow the reference's contract: `model(x, y)` -> loss dict in training,
softmax probs in eval (`hrnet_aux.py:89-110` pattern), CGFL SegmentationLoss.

Included: FarSegV1 (FPN + FSRelation scene relation + AsymmetricDecoder,
`base.py:6-252` + `farsegv1.py:11`), SemanticFPN (`semantic_fpn.py:14,84`),
PSPNet (`pspnet.py:44`), FCN8s (VGG-16 backbone, `fcn8s.py:10`), AnyUNet
(`unet.py:6-217` smp-equivalent encoder-decoder).
"""
from __future__ import annotations

from typing import Any, Mapping, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..core.registry import MODELS
from ..losses.cgfl import segmentation_loss
from ..ops.image import adaptive_avg_pool_11, resize_bilinear_auto
from .layers import TorchConv
from .resnet import ResNet50Backbone, resnet50_config


def _bn(train, name):
    return nn.BatchNorm(use_running_average=not train, momentum=0.9, name=name)


class FPN(nn.Module):
    """Top-down FPN (`base.py:92-160`): 1x1 lateral + 3x3 output convs, nearest
    top-down upsampling."""

    out_channels: int = 256

    @nn.compact
    def __call__(self, feats: Sequence[jax.Array], train: bool = False):
        laterals = [
            TorchConv(self.out_channels, (1, 1), name=f"inner{i+1}")(f)
            for i, f in enumerate(feats)
        ]
        outs = [None] * len(feats)
        last = laterals[-1]
        outs[-1] = TorchConv(self.out_channels, (3, 3), padding=(1, 1),
                             name=f"layer{len(feats)}")(last)
        for i in range(len(feats) - 2, -1, -1):
            up = resize_bilinear_auto(last, laterals[i].shape[1:3], align_corners=False)
            last = laterals[i] + up
            outs[i] = TorchConv(self.out_channels, (3, 3), padding=(1, 1),
                                name=f"layer{i+1}")(last)
        return outs


class AsymmetricDecoder(nn.Module):
    """`AssymetricDecoder` (`base.py:6-45`): per-level stacks of conv-BN-relu-x2
    upsample down to stride 4, averaged."""

    out_channels: int = 128
    in_strides: Sequence[int] = (4, 8, 16, 32)
    out_stride: int = 4

    @nn.compact
    def __call__(self, feats: Sequence[jax.Array], train: bool = False):
        import math

        outs = []
        for i, (f, s) in enumerate(zip(feats, self.in_strides)):
            n_up = int(math.log2(s)) - int(math.log2(self.out_stride))
            n_layers = n_up if n_up else 1
            h = f
            for k in range(n_layers):
                h = TorchConv(self.out_channels, (3, 3), padding=(1, 1), use_bias=False,
                              name=f"b{i}_conv{k}")(h)
                h = _bn(train, f"b{i}_bn{k}")(h)
                h = nn.relu(h)
                if n_up:
                    h = resize_bilinear_auto(h, (h.shape[1] * 2, h.shape[2] * 2),
                                        align_corners=True)
            outs.append(h)
        return sum(outs) / 4.0


class FSRelation(nn.Module):
    """Foreground-scene relation (`base.py:162-252` FSRelation): scene embedding from
    the deepest feature gates each pyramid level via a normalized similarity map."""

    scene_channels: int = 256
    out_channels: int = 256

    @nn.compact
    def __call__(self, scene_feat, feats: Sequence[jax.Array], train: bool = False):
        scene = TorchConv(self.scene_channels, (1, 1), name="scene_encoder")(
            adaptive_avg_pool_11(scene_feat)
        )
        outs = []
        for i, f in enumerate(feats):
            cdr = TorchConv(self.scene_channels, (1, 1), name=f"content{i}")(f)
            rel = jax.nn.sigmoid((cdr * scene).sum(-1, keepdims=True) /
                                 jnp.sqrt(float(self.scene_channels)))
            feat = TorchConv(self.out_channels, (1, 1), name=f"feature{i}")(f)
            feat = nn.relu(_bn(train, f"bn{i}")(feat))
            outs.append(feat * rel)
        return outs


def _loss_or_softmax(logit, y, train, loss_config, ignore_index=-1):
    if train:
        return segmentation_loss(logit, y, loss_config or {"ce": {}}, ignore_index)
    return jax.nn.softmax(logit, axis=-1)


@MODELS.register("FarSegV1")
class FarSegV1(nn.Module):
    classes: int = 7
    fpn_channels: int = 256
    decoder_channels: int = 128
    loss_config: Mapping = None  # type: ignore[assignment]
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, y=None, train: bool = False):
        # standard stride-32 resnet (FarSeg uses the torchvision layout)
        feats = ResNet50Backbone(strides=(2, 2, 2, 2), name="resnet")(x)
        fpn_feats = FPN(self.fpn_channels, name="fpn")(feats, train)
        rel_feats = FSRelation(name="fsr")(feats[-1], fpn_feats, train)
        dec = AsymmetricDecoder(self.decoder_channels, name="decoder")(rel_feats, train)
        logit = nn.Conv(self.classes, (1, 1), name="cls_head")(dec)
        logit = resize_bilinear_auto(logit, x.shape[1:3], align_corners=True)
        return _loss_or_softmax(logit, y, train, self.loss_config)


@MODELS.register("SemanticFPN")
class SemanticFPN(nn.Module):
    classes: int = 7
    fpn_channels: int = 256
    seg_channels: int = 128
    loss_config: Mapping = None  # type: ignore[assignment]

    @nn.compact
    def __call__(self, x, y=None, train: bool = False):
        feats = ResNet50Backbone(strides=(2, 2, 2, 2), name="resnet")(x)
        fpn_feats = FPN(self.fpn_channels, name="fpn")(feats, train)
        tgt = fpn_feats[0].shape[1:3]
        merged = None
        for i, f in enumerate(fpn_feats):
            h = TorchConv(self.seg_channels, (3, 3), padding=(1, 1), use_bias=False,
                          name=f"seg{i}_conv")(f)
            h = nn.relu(_bn(train, f"seg{i}_bn")(h))
            h = resize_bilinear_auto(h, tgt, align_corners=False)
            merged = h if merged is None else merged + h
        logit = nn.Conv(self.classes, (1, 1), name="cls_head")(merged)
        logit = resize_bilinear_auto(logit, x.shape[1:3], align_corners=True)
        return _loss_or_softmax(logit, y, train, self.loss_config)


class PSPModule(nn.Module):
    """Pyramid pooling (`pspnet.py:9-28`): adaptive pools at (1,2,3,6) + 1x1 convs,
    upsampled and concatenated with the input."""

    out_channels: int = 1024
    sizes: Sequence[int] = (1, 2, 3, 6)

    @nn.compact
    def __call__(self, x):
        H, W = x.shape[1:3]
        pieces = [x]
        for s in self.sizes:
            # adaptive avg pool to s x s
            ph, pw = H // s, W // s
            pooled = x[:, : ph * s, : pw * s].reshape(
                x.shape[0], s, ph, s, pw, x.shape[-1]
            ).mean(axis=(2, 4))
            pooled = TorchConv(x.shape[-1] // len(self.sizes), (1, 1), use_bias=False,
                               name=f"stage{s}")(pooled)
            pieces.append(resize_bilinear_auto(pooled, (H, W), align_corners=True))
        h = jnp.concatenate(pieces, axis=-1)
        h = TorchConv(self.out_channels, (3, 3), padding=(1, 1), name="bottleneck")(h)
        return nn.relu(h)


@MODELS.register("PSPNet")
class PSPNet(nn.Module):
    classes: int = 7
    loss_config: Mapping = None  # type: ignore[assignment]

    @nn.compact
    def __call__(self, x, y=None, train: bool = False):
        feats = ResNet50Backbone(**resnet50_config(8), name="resnet")(x)
        p = PSPModule(1024, name="psp")(feats[-1])
        p = nn.Dropout(0.3)(p, deterministic=not train)
        for i, ch in enumerate((256, 64, 64)):
            p = TorchConv(ch, (3, 3), padding=(1, 1), name=f"up{i}_conv")(
                resize_bilinear_auto(p, (p.shape[1] * 2, p.shape[2] * 2), align_corners=False)
            )
            p = nn.PReLU()(_bn(train, f"up{i}_bn")(p))
            p = nn.Dropout(0.15)(p, deterministic=not train)
        logit = nn.Conv(self.classes, (1, 1), name="final")(p)
        logit = resize_bilinear_auto(logit, x.shape[1:3], align_corners=False)
        return _loss_or_softmax(logit, y, train, self.loss_config)


class VGG16Features(nn.Module):
    """VGG-16 conv features split at pool3/pool4/pool5 (`fcn8s.py:16-22`)."""

    @nn.compact
    def __call__(self, x):
        cfg = [64, 64, "M", 128, 128, "M", 256, 256, 256, "M",
               512, 512, 512, "M", 512, 512, 512, "M"]
        outs = []
        ci = 0
        pools = 0
        for v in cfg:
            if v == "M":
                x = nn.max_pool(x, (2, 2), strides=(2, 2))
                pools += 1
                if pools >= 3:
                    outs.append(x)
            else:
                x = nn.relu(TorchConv(v, (3, 3), padding=(1, 1), name=f"conv{ci}")(x))
                ci += 1
        return outs  # pool3 (256ch, s8), pool4 (512ch, s16), pool5 (512ch, s32)


@MODELS.register("FCN8s")
class FCN8s(nn.Module):
    classes: int = 7
    loss_config: Mapping = None  # type: ignore[assignment]

    @nn.compact
    def __call__(self, x, y=None, train: bool = False):
        pool3, pool4, pool5 = VGG16Features(name="vgg")(x)
        head = TorchConv(512 // 4, (3, 3), padding=(1, 1), use_bias=False, name="head_conv")(pool5)
        head = nn.relu(_bn(train, "head_bn")(head))
        head = nn.Dropout(0.1)(head, deterministic=not train)
        score_fr = nn.Conv(self.classes, (1, 1), name="head_cls")(head)
        score_p4 = nn.Conv(self.classes, (1, 1), name="score_pool4")(pool4)
        score_p3 = nn.Conv(self.classes, (1, 1), name="score_pool3")(pool3)
        up2 = resize_bilinear_auto(score_fr, score_p4.shape[1:3], align_corners=True) + score_p4
        up4 = resize_bilinear_auto(up2, score_p3.shape[1:3], align_corners=True) + score_p3
        logit = resize_bilinear_auto(up4, x.shape[1:3], align_corners=True)
        return _loss_or_softmax(logit, y, train, self.loss_config)


@MODELS.register("AnyUNet")
class AnyUNet(nn.Module):
    """Generic encoder-decoder UNet (smp-based zoo stand-in, `unet.py:6-217`)."""

    classes: int = 7
    base: int = 32
    depth: int = 4
    loss_config: Mapping = None  # type: ignore[assignment]

    @nn.compact
    def __call__(self, x, y=None, train: bool = False):
        skips = []
        h = x
        for d in range(self.depth):
            ch = self.base * (2 ** d)
            h = nn.relu(_bn(train, f"e{d}_bn1")(TorchConv(ch, (3, 3), padding=(1, 1),
                                                          use_bias=False, name=f"e{d}_c1")(h)))
            h = nn.relu(_bn(train, f"e{d}_bn2")(TorchConv(ch, (3, 3), padding=(1, 1),
                                                          use_bias=False, name=f"e{d}_c2")(h)))
            skips.append(h)
            h = nn.max_pool(h, (2, 2), strides=(2, 2))
        ch = self.base * (2 ** self.depth)
        h = nn.relu(_bn(train, "mid_bn")(TorchConv(ch, (3, 3), padding=(1, 1),
                                                   use_bias=False, name="mid_c")(h)))
        for d in range(self.depth - 1, -1, -1):
            ch = self.base * (2 ** d)
            h = resize_bilinear_auto(h, skips[d].shape[1:3], align_corners=False)
            h = jnp.concatenate([h, skips[d]], axis=-1)
            h = nn.relu(_bn(train, f"d{d}_bn")(TorchConv(ch, (3, 3), padding=(1, 1),
                                                         use_bias=False, name=f"d{d}_c")(h)))
        logit = nn.Conv(self.classes, (1, 1), name="head")(h)
        return _loss_or_softmax(logit, y, train, self.loss_config)


@MODELS.register("FactSeg")
class FactSeg(nn.Module):
    """Foreground-aware relation net (`factseg.py:10-56`): dual FPN+AsymmetricDecoder
    branches — multiclass foreground head + binary objectness head; training losses =
    CE(fg) + BCE-with-ignore(binary); eval: softmax(fg) with the binary branch
    sharpening the foreground (`:51-55` joint-prob variant simplified to softmax)."""

    classes: int = 7
    fpn_channels: int = 256
    decoder_channels: int = 128
    ignore_index: int = -1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, y=None, train: bool = False):
        from ..losses.cgfl import binary_cross_entropy_with_logits_ignore
        from ..losses.wsss import cross_entropy_ignore

        feats = ResNet50Backbone(strides=(2, 2, 2, 2), name="resnet")(x)
        fg_feats = FPN(self.fpn_channels, name="fg_fpn")(feats, train)
        bi_feats = FPN(self.fpn_channels, name="bi_fpn")(feats, train)
        fg = AsymmetricDecoder(self.decoder_channels, name="fg_decoder")(fg_feats, train)
        bi = AsymmetricDecoder(self.decoder_channels, name="bi_decoder")(bi_feats, train)
        fg_pred = nn.Conv(self.classes, (1, 1), name="fg_cls")(fg)
        bi_pred = nn.Conv(1, (1, 1), name="bi_cls")(bi)
        fg_pred = resize_bilinear_auto(fg_pred, x.shape[1:3], align_corners=True)
        bi_pred = resize_bilinear_auto(bi_pred, x.shape[1:3], align_corners=True)

        if train:
            cls_loss = cross_entropy_ignore(fg_pred, y, self.ignore_index)
            bi_true = jnp.where(y > 0, 1.0, jnp.where(y == self.ignore_index,
                                                      float(self.ignore_index), 0.0))
            bi_loss = binary_cross_entropy_with_logits_ignore(
                bi_pred[..., 0], bi_true, self.ignore_index
            )
            return {"cls_loss": cls_loss, "bi_loss": bi_loss}
        return jax.nn.softmax(fg_pred, axis=-1)


def multi_binary_loss(pred, y_true, num_fg: int, bce_scaler: float = 1.0,
                      dice_scaler: float = 1.0, label_smooth: float = 0.0,
                      ignore_index: int = -1):
    """Per-class binary decoupled loss (`CGFL.py:435+` multi_binary_loss used by
    SemanticFPNDecouple): BCE-with-logits + soft dice per foreground class against
    the class-k indicator, averaged over classes."""
    from ..losses.cgfl import binary_cross_entropy_with_logits_ignore

    losses = []
    for k in range(num_fg):
        tgt = jnp.where(y_true == k + 1, 1.0, 0.0)
        tgt = jnp.where(y_true == ignore_index, float(ignore_index), tgt)
        if label_smooth:
            tgt = jnp.where(tgt == 1.0, 1.0 - label_smooth, tgt)
        bce = binary_cross_entropy_with_logits_ignore(pred[..., k], tgt, ignore_index)
        valid = tgt != ignore_index
        p = jax.nn.sigmoid(pred[..., k]) * valid
        t = tgt * valid
        dice = 1.0 - (2 * (p * t).sum() + 1.0) / (p.sum() + t.sum() + 1.0)
        losses.append(bce_scaler * bce + dice_scaler * dice)
    return sum(losses) / max(num_fg, 1)


@MODELS.register("SemanticFPNDecouple")
class SemanticFPNDecouple(nn.Module):
    """Decoupled per-class binary SemanticFPN (`semantic_fpn.py:84-146`): FPN +
    AsymmetricDecoder + (classes-1)-channel binary head; training uses the per-class
    BCE+dice multi_binary_loss, eval returns per-class sigmoids."""

    classes: int = 7
    fpn_channels: int = 256
    decoder_channels: int = 128
    bce_scaler: float = 1.0
    dice_scaler: float = 1.0
    label_smooth: float = 0.0
    ignore_index: int = -1

    @nn.compact
    def __call__(self, x, y=None, train: bool = False):
        feats = ResNet50Backbone(strides=(2, 2, 2, 2), name="resnet")(x)
        fpn_feats = FPN(self.fpn_channels, name="fpn")(feats, train)
        dec = AsymmetricDecoder(self.decoder_channels, name="decoder")(fpn_feats, train)
        pred = nn.Conv(self.classes - 1, (1, 1), name="cls_pred")(dec)
        pred = resize_bilinear_auto(pred, x.shape[1:3], align_corners=True)
        if train:
            return {"multi_binary": multi_binary_loss(
                pred, y, self.classes - 1, self.bce_scaler, self.dice_scaler,
                self.label_smooth, self.ignore_index)}
        return jax.nn.sigmoid(pred)
