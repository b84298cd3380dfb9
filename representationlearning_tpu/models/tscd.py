"""TSCD — the SCD end-to-end WSSS model (parity with `SCD-AAAI2023/network/TSCD_model.py`).

MiT encoder + SegFormer head + affinity head (1x1 conv over the concatenated last two
blocks' exported attention maps -> sigmoid) + CAM classifier (1x1, no bias) on stage-4
features. Forward modes mirror the reference's flags:
- `cam_only=True`  -> (cam_s4, attn_pred): CAM = classifier-weight conv over stage-4
  features with gradient stopped (`TSCD_model.py:77-80`)
- default          -> (cls_logits, seg_logits, attns, attn_pred) (`:82-89`)

All tensors NHWC; `pooling` selects gmp/gap for the classification head.
"""
from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..core.registry import MODELS
from ..ops.image import adaptive_avg_pool_11, adaptive_max_pool_11
from .layers import AttnProj
from .mit import MIT_CONFIGS, MixVisionTransformer
from .segformer_head import SegFormerHead


@MODELS.register("TSCD")
class TSCD(nn.Module):
    backbone: str = "mit_b1"
    num_classes: int = 21
    embedding_dim: int = 256
    strides: tuple = (4, 2, 2, 1)
    pooling: str = "gmp"
    use_flash: bool = False
    fused_blocks: bool = False  # inference: fused pallas kernels for non-exporting blocks
    collect_attns: bool | str = "last2"  # "none": skip attention export entirely —
    # attn_pred comes back None and EVERY block may run flash/fused. Param tree is
    # unchanged except the (unused) attn_proj, so trained checkpoints load either
    # way. Use for pseudo-label generation, where the affinity matrix is never
    # consumed (`utils/camutils.py:85-113` ignores it): the stride-16 stage-4
    # exporters otherwise materialize (B, nh, N, N) f32 logits — 1.4 GB apiece at
    # the 1.5x CAM scale.
    dtype: Any = jnp.float32
    act_dtype: Any = None  # inter-block residual-stream storage dtype for the
    # encoder (bf16 halves the HBM-bound activation traffic; LN stats stay f32
    # — see MixVisionTransformer.act_dtype). None = exact f32.
    s2d_stem: bool = False  # space-to-depth stage-1 stem (per-geometry lever)
    taps_stem: bool = False  # grouped-taps stage-1 stem (transpose-free s2d)

    def setup(self):
        cfg = dict(MIT_CONFIGS[self.backbone])
        self.encoder = MixVisionTransformer(
            strides=self.strides, dtype=self.dtype, use_flash=self.use_flash,
            fused_blocks=self.fused_blocks, collect_attns=self.collect_attns,
            act_dtype=self.act_dtype, s2d_stem=self.s2d_stem,
            taps_stem=self.taps_stem,
            **cfg, name="encoder"
        )
        self.decoder = SegFormerHead(
            num_classes=self.num_classes, embedding_dim=self.embedding_dim,
            dtype=self.dtype, name="decoder",
        )
        # 2 stage-4 blocks x num_heads(8) = 16 input channels (`TSCD_model.py:38`)
        self.attn_proj = AttnProj(16, name="attn_proj")
        self.classifier = nn.Conv(
            self.num_classes - 1, (1, 1), use_bias=False, name="classifier"
        )

    def _pool(self, x):
        if self.pooling == "gmp":
            return adaptive_max_pool_11(x)
        return adaptive_avg_pool_11(x)

    def __call__(self, x, cam_only: bool = False, train: bool = False):
        feats, attns = self.encoder(x, deterministic=not train)
        x4 = feats[3]

        if attns:
            # affinity prediction from the last two attention maps: (B, nh, Nk, Nk) x2
            # -> 1x1-conv-equivalent channel contraction -> sigmoid
            # (`TSCD_model.py:73-76`; see layers.AttnProj for the layout argument)
            attn_pred = jax.nn.sigmoid(self.attn_proj(attns[-2:]))  # (B, Nk, Nk)
        else:  # collect_attns == "none"
            attn_pred = None

        if cam_only:
            cam_s4 = jax.lax.stop_gradient(self.classifier(x4))  # (B, h, w, C-1)
            return cam_s4, attn_pred

        pooled = self._pool(x4)
        cls_logits = self.classifier(pooled).reshape(x.shape[0], self.num_classes - 1)
        seg = self.decoder(feats, train=train)
        return cls_logits, seg, attns, attn_pred


@MODELS.register("WeTrBaseline")
class WeTrBaseline(nn.Module):
    """Plain WeTr baseline: encoder + SegFormer head + classifier, no affinity head
    (`SCD-AAAI2023/network/model_bsl.py:8-71`)."""

    backbone: str = "mit_b1"
    num_classes: int = 21
    embedding_dim: int = 256
    strides: tuple = (4, 2, 2, 1)
    pooling: str = "gmp"
    fused_blocks: bool = False  # inference: fused pallas kernels (see models/mit.py)
    dtype: Any = jnp.float32

    def setup(self):
        cfg = dict(MIT_CONFIGS[self.backbone])
        self.encoder = MixVisionTransformer(
            strides=self.strides, dtype=self.dtype, collect_attns=False,
            fused_blocks=self.fused_blocks, **cfg, name="encoder"
        )
        self.decoder = SegFormerHead(
            num_classes=self.num_classes, embedding_dim=self.embedding_dim,
            dtype=self.dtype, name="decoder",
        )
        self.classifier = nn.Conv(self.num_classes - 1, (1, 1), use_bias=False, name="classifier")

    def __call__(self, x, cam_only: bool = False, train: bool = False):
        feats, _ = self.encoder(x, deterministic=not train)
        x4 = feats[3]
        if cam_only:
            return jax.lax.stop_gradient(self.classifier(x4))
        pooled = adaptive_max_pool_11(x4) if self.pooling == "gmp" else adaptive_avg_pool_11(x4)
        cls_logits = self.classifier(pooled).reshape(x.shape[0], self.num_classes - 1)
        seg = self.decoder(feats, train=train)
        return cls_logits, seg


class LargeFOV(nn.Module):
    """Dilated-conv DeepLab head alternative (`SCD-AAAI2023/network/conv_head.py:11-39`)."""

    out_planes: int
    dilation: int = 12

    @nn.compact
    def __call__(self, x, train: bool = False):
        d = self.dilation
        x = nn.Conv(512, (3, 3), kernel_dilation=(d, d), padding=((d, d), (d, d)))(x)
        x = nn.relu(x)
        x = nn.Conv(512, (3, 3), kernel_dilation=(d, d), padding=((d, d), (d, d)))(x)
        x = nn.relu(x)
        x = nn.Conv(self.out_planes, (1, 1))(x)
        return x
