"""ResNet-50 backbone + CAM heads (WaveCAM family) — parity with
`WaveCAM-TMM2023/net/resnet50.py` and `net/resnet50_cam.py`.

Reference specifics preserved:
- FixedBatchNorm: BN always runs in inference mode with the loaded running stats
  (`resnet50.py:10-13`); here frozen stats live in `batch_stats` and are never updated.
- stride-16 config strides (2,2,2,1); stride-8 config strides (2,2,1,1) with dilations
  (1,1,2,2); the FIRST block of each layer always uses dilation 1 (`resnet50.py:90`).
- CAM heads: Net (cls logits), NetCAM (+relu'd CAM), NetCAMFeature (CAM-weighted GAP
  features, bs x 20 x 2048), CAM inference with external / reweighted classifier weight
  (`resnet50_cam.py:9-147`).

NHWC layout, bf16-capable via `dtype`.
"""
from __future__ import annotations

from typing import Any, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..core.registry import MODELS
from ..ops.image import adaptive_avg_pool_11, adaptive_max_pool_11
from .layers import TorchConv


class FrozenBatchNorm(nn.Module):
    """BN with frozen running statistics (inference-mode always)."""

    features: int
    eps: float = 1e-5

    @nn.compact
    def __call__(self, x):
        scale = self.param("scale", nn.initializers.ones, (self.features,))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        mean = self.variable("batch_stats", "mean", nn.initializers.zeros, None, (self.features,))
        var = self.variable("batch_stats", "var", nn.initializers.ones, None, (self.features,))
        inv = jax.lax.rsqrt(var.value + self.eps)
        return (x - mean.value) * inv * scale + bias


class Bottleneck(nn.Module):
    planes: int
    stride: int = 1
    dilation: int = 1
    has_downsample: bool = False
    dtype: Any = None  # bf16 casts conv inputs+kernels (f32 MXU accumulation);
    # ResNet's DENSE convs are MXU-bound (35.5% MFU measured in f32 — the bf16
    # pathology round 2 measured was MiT's DEPTHWISE conv, not these)

    @nn.compact
    def __call__(self, x):
        d = self.dilation
        out = TorchConv(self.planes, (1, 1), use_bias=False, dtype=self.dtype,
                        name="conv1")(x)
        out = FrozenBatchNorm(self.planes, name="bn1")(out)
        out = nn.relu(out)
        out = TorchConv(
            self.planes, (3, 3), stride=(self.stride, self.stride),
            padding=(d, d), dilation=(d, d), use_bias=False, dtype=self.dtype,
            name="conv2",
        )(out)
        out = FrozenBatchNorm(self.planes, name="bn2")(out)
        out = nn.relu(out)
        out = TorchConv(self.planes * 4, (1, 1), use_bias=False, dtype=self.dtype,
                        name="conv3")(out)
        out = FrozenBatchNorm(self.planes * 4, name="bn3")(out)
        if self.has_downsample:
            res = TorchConv(
                self.planes * 4, (1, 1), stride=(self.stride, self.stride),
                use_bias=False, dtype=self.dtype, name="downsample_conv",
            )(x)
            res = FrozenBatchNorm(self.planes * 4, name="downsample_bn")(res)
        else:
            res = x
        return nn.relu(out + res)


def _max_pool_3x3_s2(x):
    """torch MaxPool2d(kernel 3, stride 2, padding 1)."""
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1, 3, 3, 1), (1, 2, 2, 1),
        ((0, 0), (1, 1), (1, 1), (0, 0)),
    )


class ResNet50Backbone(nn.Module):
    """Returns the 4 layer features (stage1 = stem+layer1 as in `resnet50_cam.py:14-22`);
    with `return_stem=True`, prepends the 64-ch stem output (IRN taps it,
    `resnet50_irn.py:15`)."""

    strides: Sequence[int] = (2, 2, 2, 1)
    dilations: Sequence[int] = (1, 1, 1, 1)
    return_stem: bool = False
    dtype: Any = jnp.float32
    s2d_stem: bool = False  # space-to-depth stem lowering — opt-in per
    # geometry (a measured end-to-end LOSS on the 512^2 headline; see
    # models/mit.py::OverlapPatchEmbed.s2d)

    @nn.compact
    def __call__(self, x):
        s0 = self.strides[0]
        if (self.s2d_stem and jax.default_backend() == "tpu" and s0 > 1
                and x.shape[-1] <= 8):
            # RGB stem as a space-to-depth conv (identical taps; the Cin=3 conv
            # starves the MXU — see ops/image.py::space_to_depth_conv)
            from ..ops.image import space_to_depth_conv
            from .mit import _ConvParams

            kernel, _ = _ConvParams((7, 7, x.shape[-1], 64), use_bias=False,
                                    name="conv1")()
            x = space_to_depth_conv(x, kernel, None, stride=s0, padding=3,
                                    dtype=self.dtype)
        else:
            x = TorchConv(64, (7, 7), stride=(s0, s0), padding=(3, 3),
                          use_bias=False, dtype=self.dtype, name="conv1")(x)
        x = FrozenBatchNorm(64, name="bn1")(x)
        x = nn.relu(x)
        x = _max_pool_3x3_s2(x)

        feats = [x] if self.return_stem else []
        layer_specs = [
            (64, 3, 1, self.dilations[0], "layer1"),
            (128, 4, self.strides[1], self.dilations[1], "layer2"),
            (256, 6, self.strides[2], self.dilations[2], "layer3"),
            (512, 3, self.strides[3], self.dilations[3], "layer4"),
        ]
        inplanes = 64
        for planes, blocks, stride, dilation, name in layer_specs:
            needs_ds = stride != 1 or inplanes != planes * 4
            x = Bottleneck(planes, stride, 1, needs_ds, dtype=self.dtype,
                           name=f"{name}_0")(x)
            for b in range(1, blocks):
                x = Bottleneck(planes, 1, dilation, False, dtype=self.dtype,
                               name=f"{name}_{b}")(x)
            inplanes = planes * 4
            feats.append(x)
        return feats


def resnet50_config(stride: int = 16):
    if stride == 16:
        return dict(strides=(2, 2, 2, 1), dilations=(1, 1, 1, 1))
    return dict(strides=(2, 2, 1, 1), dilations=(1, 1, 2, 2))


@MODELS.register("wavecam_net")
class Net(nn.Module):
    """Multilabel classifier (`resnet50_cam.py:9-44`)."""

    stride: int = 16
    n_classes: int = 20
    dtype: Any = jnp.float32
    s2d_stem: bool = False  # space-to-depth stem (per-geometry lever)

    def setup(self):
        self.backbone = ResNet50Backbone(dtype=self.dtype, s2d_stem=self.s2d_stem,
                                         **resnet50_config(self.stride),
                                         name="resnet50")
        self.classifier = nn.Conv(self.n_classes, (1, 1), use_bias=False, name="classifier")

    def features(self, x):
        return self.backbone(x)[3]

    def __call__(self, x):
        f = self.features(x)
        pooled = adaptive_avg_pool_11(f)  # gap2d
        return self.classifier(pooled).reshape(x.shape[0], self.n_classes)

    def cam(self, x, weight=None, reweight=None):
        """CAM inference paths (`resnet50_cam.py:109-147`): plain (classifier weight),
        forward1 (external weight), forward2 (elementwise-reweighted classifier)."""
        f = self.features(x)
        w = self.variables["params"]["classifier"]["kernel"] if weight is None else weight
        if reweight is not None:
            w = w * reweight
        return jax.lax.conv_general_dilated(
            f, w, (1, 1), "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )

    def cam_with_logits(self, x):
        """Net_CAM (`resnet50_cam.py:58-76`): (logits, relu CAM, feature)."""
        f = self.features(x)
        pooled = adaptive_avg_pool_11(f)
        logits = self.classifier(pooled).reshape(x.shape[0], self.n_classes)
        cams = jax.nn.relu(self.classifier(f))
        return logits, cams, f

    def cam_feature(self, x):
        """Net_CAM_Feature (`resnet50_cam.py:79-103`): CAM-weighted GAP features
        (bs, n_classes, 2048) + max-normalized CAMs."""
        f = self.features(x)
        pooled = adaptive_avg_pool_11(f)
        logits = self.classifier(pooled).reshape(x.shape[0], self.n_classes)
        cams = jax.nn.relu(self.classifier(f))
        cams = cams / (adaptive_max_pool_11(cams) + 1e-5)
        # (B,H,W,Cls,1) * (B,H,W,1,Feat) -> mean over H,W
        cf = (cams[..., :, None] * f[..., None, :]).mean(axis=(1, 2))
        return logits, cf, cams
