"""Wave-MLP PATM block (RML) — parity with `RML/backbone/wavemlp.py:133-201`.

PATM: phase-aware token mixing — amplitude 1x1 convs fc_h/fc_w/fc_c, phase convs
theta_h/theta_w (plain 1x1 in 'fc' mode; depthwise-3x3+BN+ReLU in 'conv' mode),
cos/sin modulation into 2C channels, grouped (1,7)/(7,1) token-FCs, 3-way softmax
reweighting from pooled features (with the reference's channel-major (B,3C)->(B,C,3)
pairing), 1x1 projection. WaveBlock wraps it with BatchNorm residuals and an MLP.
RML's final WeTr applies PATM on the stage-4 CAM features (`model_attn_aff.py:126`).
"""
from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from .layers import DropPath, TorchConv


class PATM(nn.Module):
    dim: int
    mode: str = "fc"
    qkv_bias: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        """x: (B, H, W, C=dim) NHWC."""
        B, H, W, C = x.shape

        if self.mode == "fc":
            theta_h = TorchConv(self.dim, (1, 1), use_bias=True, name="theta_h_conv")(x)
            theta_w = TorchConv(self.dim, (1, 1), use_bias=True, name="theta_w_conv")(x)
        else:
            def theta(v, name):
                v = TorchConv(self.dim, (3, 3), padding=(1, 1), groups=self.dim,
                              use_bias=False, name=f"{name}_conv")(v)
                v = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                                 name=f"{name}_bn")(v)
                return nn.relu(v)

            theta_h = theta(x, "theta_h")
            theta_w = theta(x, "theta_w")

        x_h = TorchConv(self.dim, (1, 1), use_bias=self.qkv_bias, name="fc_h")(x)
        x_w = TorchConv(self.dim, (1, 1), use_bias=self.qkv_bias, name="fc_w")(x)
        x_h = jnp.concatenate([x_h * jnp.cos(theta_h), x_h * jnp.sin(theta_h)], axis=-1)
        x_w = jnp.concatenate([x_w * jnp.cos(theta_w), x_w * jnp.sin(theta_w)], axis=-1)

        h = TorchConv(self.dim, (1, 7), padding=(0, 3), groups=self.dim,
                      use_bias=False, name="tfc_h")(x_h)
        w = TorchConv(self.dim, (7, 1), padding=(3, 0), groups=self.dim,
                      use_bias=False, name="tfc_w")(x_w)
        c = TorchConv(self.dim, (1, 1), use_bias=self.qkv_bias, name="fc_c")(x)

        a = (h + w + c).mean(axis=(1, 2), keepdims=True)  # (B,1,1,C)
        a = TorchConv(self.dim // 4, (1, 1), name="reweight_fc1")(a)
        a = nn.gelu(a, approximate=False)
        a = TorchConv(self.dim * 3, (1, 1), name="reweight_fc2")(a)
        # torch (B, 3C) -> (B, C, 3) is channel-major: triple k for channel c sits at 3c+k
        a = a.reshape(B, 1, 1, C, 3)
        a = jax.nn.softmax(a, axis=-1)
        x = h * a[..., 0] + w * a[..., 1] + c * a[..., 2]
        return TorchConv(self.dim, (1, 1), use_bias=True, name="proj")(x)


class WaveBlock(nn.Module):
    """PATM + MLP with BatchNorm pre-norms (`wavemlp.py:188-201`)."""

    dim: int
    mlp_ratio: float = 4.0
    drop_path: float = 0.0
    mode: str = "fc"

    @nn.compact
    def __call__(self, x, train: bool = False):
        def bn(v, name):
            return nn.BatchNorm(use_running_average=not train, momentum=0.9, name=name)(v)

        h = PATM(self.dim, self.mode, name="attn")(bn(x, "norm1"), train=train)
        x = x + DropPath(self.drop_path)(h, deterministic=not train)
        m = bn(x, "norm2")
        m = TorchConv(int(self.dim * self.mlp_ratio), (1, 1), name="mlp_fc1")(m)
        m = nn.gelu(m, approximate=False)
        m = TorchConv(self.dim, (1, 1), name="mlp_fc2")(m)
        return x + DropPath(self.drop_path)(m, deterministic=not train)
