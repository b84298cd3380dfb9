"""DRFL dual-stream medical segmentation net ("Softnet"/DCL) — parity with
`DRFL-EAAI2023/model/DCL.py`.

Architecture (`DCL.py:247-344`):
- shared UNet encoder: 4x4/s2 stem + 4 Encode layers (BasicBlock w/ channel+edge
  attention -> 4x4/s2 conv -> per-channel GroupNorm -> LeakyReLU 0.2)
- one decoder stack REUSED for both streams (the reference calls decode1..4 twice —
  the seg/sr branches share weights and differ only through dropout randomness)
- ViT bottleneck refiners on the 1/2-resolution decoder features: `Transformer`
  (self, gated q/k/v AttentionW) and `Transformer2` (cross: q/k from the sr stream,
  v from the seg stream) with the reference's creative (B,64,768)->(B,3,128,128)
  channel-major reshape; output gate map multiplies the sr stream
- `Softnethead` refinement UNet takes (seg out, sr out) -> final `bin` mask
- returns (out, out2, bin, d5_a, d5sr_a) (`:344`)

NHWC; ConvTranspose(k4,s2,p1) implemented via lhs-dilated conv for exact torch parity.
"""
from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..core.registry import MODELS
from .layers import TorchConv


def torch_conv_transpose(x, kernel, stride: int, padding: int, bias=None):
    """torch ConvTranspose2d(k, s, p) on NHWC; kernel (kh, kw, in, out) pre-flipped at
    load time (converter handles layout)."""
    kh = kernel.shape[0]
    pad = kh - 1 - padding
    y = jax.lax.conv_general_dilated(
        x, kernel, window_strides=(1, 1),
        padding=((pad, pad), (pad, pad)),
        lhs_dilation=(stride, stride),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    if bias is not None:
        y = y + bias
    return y


class ConvTranspose(nn.Module):
    features: int
    kernel_size: int = 4
    stride: int = 2
    padding: int = 1
    use_bias: bool = True

    @nn.compact
    def __call__(self, x):
        k = self.param(
            "kernel", nn.initializers.lecun_normal(),
            (self.kernel_size, self.kernel_size, x.shape[-1], self.features),
        )
        b = self.param("bias", nn.initializers.zeros, (self.features,)) if self.use_bias else None
        return torch_conv_transpose(x, k, self.stride, self.padding, b)


class ChannelAttention(nn.Module):
    """`DCL.py:44-60`."""

    in_planes: int
    ratio: int = 16

    @nn.compact
    def __call__(self, x):
        fc1 = TorchConv(self.in_planes // 16, (1, 1), use_bias=False, name="fc1")
        fc2 = TorchConv(self.in_planes, (1, 1), use_bias=False, name="fc2")
        avg = x.mean(axis=(1, 2), keepdims=True)
        mx = x.max(axis=(1, 2), keepdims=True)
        out = fc2(nn.relu(fc1(avg))) + fc2(nn.relu(fc1(mx)))
        return jax.nn.sigmoid(out)


class EdgeAttention(nn.Module):
    """`DCL.py:22-43`: channel-mean-subtracted edge map + mean map -> 3x3 conv gate."""

    planes: int
    kernel_size: int = 3

    @nn.compact
    def __call__(self, x):
        p = 1 if self.kernel_size == 3 else 3
        avg = x.mean(axis=-1, keepdims=True)
        edge = TorchConv(1, (self.kernel_size,) * 2, padding=(p, p), use_bias=False,
                         name="conv1")(x - avg)
        g = TorchConv(1, (self.kernel_size,) * 2, padding=(p, p), use_bias=False,
                      name="conv2")(jnp.concatenate([edge, avg], axis=-1))
        return jax.nn.sigmoid(g)


class DCLBasicBlock(nn.Module):
    """Residual block with channel+edge attention (`DCL.py:62-98`)."""

    planes: int

    @nn.compact
    def __call__(self, x, train: bool = False):
        def bn(v, name):
            return nn.BatchNorm(use_running_average=not train, momentum=0.9,
                                epsilon=1e-5, name=name)(v)

        out = TorchConv(self.planes, (3, 3), padding=(1, 1), use_bias=False, name="conv1")(x)
        out = nn.relu(bn(out, "bn1"))
        out = TorchConv(self.planes, (3, 3), padding=(1, 1), use_bias=False, name="conv2")(out)
        out = bn(out, "bn2")
        out = ChannelAttention(self.planes, name="ca")(out) * out
        out = EdgeAttention(self.planes, name="ea")(out) * out
        return nn.relu(out + x)


class EncodeLayer(nn.Module):
    """BasicBlock -> 4x4/s2 conv -> per-channel GroupNorm -> LeakyReLU(0.2)
    (`DCL.py:99-112`)."""

    in_ch: int
    out_ch: int

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = DCLBasicBlock(self.in_ch, name="basic")(x, train)
        x = TorchConv(self.out_ch, (4, 4), stride=(2, 2), padding=(1, 1),
                      use_bias=False, name="down_conv")(x)
        x = nn.GroupNorm(num_groups=self.out_ch, name="down_gn")(x)
        return nn.leaky_relu(x, 0.2)


class DecodeLayer(nn.Module):
    """BasicBlock -> 4x4/s2 transpose conv -> GroupNorm -> PReLU [-> dropout]
    (`DCL.py:113-131`)."""

    in_ch: int
    out_ch: int
    dropout: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = DCLBasicBlock(self.in_ch, name="basic")(x, train)
        x = ConvTranspose(self.out_ch, 4, 2, 1, use_bias=False, name="up_conv")(x)
        x = nn.GroupNorm(num_groups=self.out_ch, name="up_gn")(x)
        alpha = self.param("prelu_alpha", nn.initializers.constant(0.25), (1,))
        x = jnp.where(x >= 0, x, alpha * x)
        if self.dropout:
            x = nn.Dropout(0.5)(x, deterministic=not train)
        return x


class EndLayer(nn.Module):
    """transpose-conv (4/2/1 or 3/1/1) + sigmoid (`DCL.py:132-165`)."""

    kernel: int = 4
    stride: int = 2

    @nn.compact
    def __call__(self, x):
        x = ConvTranspose(1, self.kernel, self.stride, 1, name="conv")(x)
        return jax.nn.sigmoid(x)


class GatedViTBlock(nn.Module):
    """AttentionW(2) + MLP pre-LN block: q/k/v each scaled by sigmoid(0.1) gates
    (`DCL.py:394-449` AttentionW, `:580-624` Block/Block2). `cross=True` takes q/k from
    the second stream, v from the first (`:475-489`)."""

    hidden: int = 768
    heads: int = 12
    mlp_dim: int = 3072
    cross: bool = False
    drop: float = 0.1

    @nn.compact
    def __call__(self, x, x2=None, train: bool = False):
        g = jax.nn.sigmoid(0.1)  # frozen gates (requires_grad=False, `DCL.py:414-416`)
        h = x
        norm = nn.LayerNorm(epsilon=1e-6, name="attention_norm")
        xa = norm(x)
        src = norm(x2) if self.cross else xa
        B, N, C = xa.shape
        hd = self.hidden // self.heads
        q = nn.Dense(self.hidden, name="query")(src if self.cross else xa)
        k = nn.Dense(self.hidden, name="key")(src if self.cross else xa)
        v = nn.Dense(self.hidden, name="value")(xa)
        q = q.reshape(B, N, self.heads, hd).transpose(0, 2, 1, 3) * g
        k = k.reshape(B, N, self.heads, hd).transpose(0, 2, 1, 3) * g
        v = v.reshape(B, N, self.heads, hd).transpose(0, 2, 1, 3) * g
        attn = jax.nn.softmax(
            jnp.einsum("bhnd,bhmd->bhnm", q, k, preferred_element_type=jnp.float32)
            / jnp.sqrt(hd), axis=-1,
        )
        ctx = jnp.einsum("bhnm,bhmd->bhnd", attn, v, preferred_element_type=jnp.float32)
        ctx = ctx.transpose(0, 2, 1, 3).reshape(B, N, self.hidden)
        x = h + nn.Dense(self.hidden, name="out")(ctx)
        h = x
        y = nn.LayerNorm(epsilon=1e-6, name="ffn_norm")(x)
        y = nn.Dense(self.mlp_dim, name="fc1")(y)
        y = nn.relu(y)  # reference maps "gelu" -> relu (`DCL.py:363`)
        y = nn.Dropout(self.drop)(y, deterministic=not train)
        y = nn.Dense(self.hidden, name="fc2")(y)
        y = nn.Dropout(self.drop)(y, deterministic=not train)
        return h + y


class DCLTransformer(nn.Module):
    """`Transformer`/`Transformer2` (`DCL.py:666-753`): 16x16 patch embed of the 64-ch
    1/2-res map -> gated ViT encoder -> channel-major reshape to (B, h, w, 3) -> plus
    two 1x1 skip convs -> 1x1 head to `out_ch`."""

    out_ch: int  # 64 for Transformer, 1 for Transformer2
    cross: bool = False
    num_layers: int = 12
    hidden: int = 768

    @nn.compact
    def __call__(self, x, x2=None, train: bool = False):
        B, H, W, C = x.shape  # (B, 128, 128, 64) at the reference geometry

        patch_conv = TorchConv(self.hidden, (16, 16), stride=(16, 16),
                               name="patch_embeddings")  # shared by both streams

        def embed(v, pos_name):
            e = patch_conv(v)
            n = e.shape[1] * e.shape[2]
            e = e.reshape(B, n, self.hidden)
            pos = self.param(pos_name, nn.initializers.zeros, (1, n, self.hidden))
            return e + pos

        tokens = embed(x, "position_embeddings")
        tokens2 = embed(x2, "position_embeddings2") if self.cross else None

        for i in range(self.num_layers):
            tokens = GatedViTBlock(
                self.hidden, cross=self.cross, name=f"block{i}",
            )(tokens, tokens2, train=train)
        tokens = nn.LayerNorm(epsilon=1e-6, name="encoder_norm")(tokens)

        # reference reshape: (B, n, 768) -> NCHW view (B, 3, 2h, 2w) channel-major
        h16, w16 = H // 16, W // 16
        m = tokens.transpose(0, 2, 1).reshape(B, 3, h16 * 16, w16 * 16)
        m = m.transpose(0, 2, 3, 1)  # back to NHWC
        s1 = TorchConv(3, (1, 1), name="start1")(x)
        s2 = TorchConv(3, (1, 1), name="start2")(x)
        m = s1 + m + s2
        return TorchConv(self.out_ch, (1, 1), name="end")(m)


class Softnethead(nn.Module):
    """Refinement UNet over (seg out, sr out) (`DCL.py:167-219`)."""

    @nn.compact
    def __call__(self, x, sr, train: bool = False):
        e0 = TorchConv(63, (4, 4), stride=(2, 2), padding=(1, 1), use_bias=False,
                       name="firstConv")(sr)
        e0 = nn.leaky_relu(e0, 0.2)
        e0 = jnp.concatenate([e0, x], axis=-1)  # 64ch
        e1 = EncodeLayer(64, 64, name="encode1")(e0, train)
        e2 = EncodeLayer(64, 64, name="encode2")(e1, train)
        e3 = EncodeLayer(64, 64, name="encode3")(e2, train)
        e4 = EncodeLayer(64, 64, name="encode4")(e3, train)
        d2 = DecodeLayer(64, 64, dropout=True, name="decode1")(e4, train)
        d3 = DecodeLayer(128, 64, name="decode2")(jnp.concatenate([d2, e3], -1), train)
        d4 = DecodeLayer(128, 64, name="decode3")(jnp.concatenate([d3, e2], -1), train)
        d5 = DecodeLayer(128, 64, name="decode4")(jnp.concatenate([d4, e1], -1), train)
        f5 = jnp.concatenate([d5, e0], -1)
        return EndLayer(3, 1, name="end")(f5)


@MODELS.register("Softnet")
class Softnet(nn.Module):
    """Full DCL net. Input (B, H, W, in_ch) in [-1, 1]; returns
    (out (H), out2 (2H), bin (H), d5_a, d5sr_a) like `DCL.py:344`."""

    input_nc: int = 3
    num_vit_layers: int = 12
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        e0 = TorchConv(64, (4, 4), stride=(2, 2), padding=(1, 1), use_bias=False,
                       name="firstConv")(x)
        e0 = nn.leaky_relu(e0, 0.2)
        e1 = EncodeLayer(64, 128, name="encode1")(e0, train)
        e2 = EncodeLayer(128, 256, name="encode2")(e1, train)
        e3 = EncodeLayer(256, 512, name="encode3")(e2, train)
        e4 = EncodeLayer(512, 512, name="encode4")(e3, train)

        decode1 = DecodeLayer(512, 512, dropout=True, name="decode1")
        decode2 = DecodeLayer(1024, 256, name="decode2")
        decode3 = DecodeLayer(512, 128, name="decode3")
        decode4 = DecodeLayer(256, 64, name="decode4")

        def run_decoder():
            d2 = decode1(e4, train)
            d3 = decode2(jnp.concatenate([d2, e3], -1), train)
            d4 = decode3(jnp.concatenate([d3, e2], -1), train)
            return decode4(jnp.concatenate([d4, e1], -1), train)

        transformer = DCLTransformer(64, num_layers=self.num_vit_layers, name="transformer")
        d5 = run_decoder()
        d5_a = transformer(d5, train=train)
        # sr stream: the same decoder modules run again (`DCL.py:302-311` reuses them)
        d5sr = run_decoder()
        d5sr_a = transformer(d5sr, train=train)

        f5sr = jnp.concatenate([d5sr, e0], -1)
        outsr = DecodeLayer(128, 128, name="decode5")(f5sr, train)
        out2 = EndLayer(4, 2, name="end2")(outsr)

        gate = DCLTransformer(1, cross=True, num_layers=self.num_vit_layers,
                              name="transformer2")(d5_a, d5sr_a, train=train)
        sr = d5sr * gate
        d5cat = jnp.concatenate([d5, sr], -1)
        f5 = jnp.concatenate([d5cat, e0], -1)  # 192ch
        out = EndLayer(4, 2, name="end")(f5)

        binm = Softnethead(name="softnethead")(out, out2, train=train)
        return out, out2, binm, d5_a, d5sr_a


@MODELS.register("PixelDiscriminator")
class PixelDiscriminator(nn.Module):
    """1x1 PatchGAN discriminator (`model_dcl.py` netD='pixel')."""

    ndf: int = 64

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = TorchConv(self.ndf, (1, 1), name="conv1")(x)
        x = nn.leaky_relu(x, 0.2)
        x = TorchConv(self.ndf * 2, (1, 1), use_bias=False, name="conv2")(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9, name="bn")(x)
        x = nn.leaky_relu(x, 0.2)
        return TorchConv(1, (1, 1), name="conv3")(x)
