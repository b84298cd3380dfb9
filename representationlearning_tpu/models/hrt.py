"""HRFormer (High-Resolution Transformer) alternative backbone — parity with
`RSSFormer-TIP2023/module/baseline/base_hrnet/hrt_backbone.py:113` (module), `:370`
(net) and `hrt_config.py` (hrt_small / hrt_base / win13 / win15 variants).

Structure: the HRNetV2 multi-branch topology, but every stage-2/3/4 branch block is a
transformer block (`modules/transformer_block.py:52-115`): pre-LN interlaced
window self-attention (`InterlacedPoolAttention`, `multihead_isa_pool_attention.py:11-49`
— window pad + contiguous 7x7 window grouping + Mhca with q=k=v) with a drop-path
residual. The reference's FFN is commented out in its forward (`transformer_block.py:104`)
and its `norm2` parameters are dead — mirrored here by not creating them (the converter
drops them). Fuse paths differ from HRNetV2: downsampling uses depthwise-separable
stride-2 convs (`hrt_backbone.py:276-330`), upsampling is 1x1 conv + BN + nearest.

All NHWC; window attention batches to (B * n_windows, ws^2, C) so the MXU sees a single
large batched matmul per block.
"""
from __future__ import annotations

from typing import Any, Sequence

import jax.numpy as jnp
from flax import linen as nn

from ..ops.image import resize_nearest
from .layers import DropPath, TorchConv
from .hrnet import Bottleneck, FuseUp, Transition, _bn
from .rssformer_modules import Mhca, window_depad, window_pad, window_partition, window_reverse

HRT_CONFIGS = {
    # `hrt_config.py:14-58` — RSSFormer's `hrt_backbone.hrnetv2_w32` builds hrt_small
    "hrt_small": dict(
        stage1_planes=32, stage1_blocks=2,
        channels=(32, 64, 128, 256), num_heads=(1, 2, 4, 8),
        num_modules=(1, 4, 2), num_blocks=2, window=7, drop_path_rate=0.2,
    ),
    # `hrt_config.py:60-105`
    "hrt_base": dict(
        stage1_planes=64, stage1_blocks=2,
        channels=(78, 156, 312, 624), num_heads=(2, 4, 8, 16),
        num_modules=(1, 4, 2), num_blocks=2, window=7, drop_path_rate=0.2,
    ),
    "hrt_base_win13": dict(
        stage1_planes=64, stage1_blocks=2,
        channels=(78, 156, 312, 624), num_heads=(2, 4, 8, 16),
        num_modules=(1, 4, 2), num_blocks=2, window=13, drop_path_rate=0.2,
    ),
    "hrt_base_win15": dict(
        stage1_planes=64, stage1_blocks=2,
        channels=(78, 156, 312, 624), num_heads=(2, 4, 8, 16),
        num_modules=(1, 4, 2), num_blocks=2, window=15, drop_path_rate=0.2,
    ),
}


class ISASelfAttention(nn.Module):
    """`InterlacedPoolAttention` (`multihead_isa_pool_attention.py:11-49`): center-pad
    to a window multiple, group contiguous ws x ws windows, self-attend with Mhca."""

    embed_dim: int
    num_heads: int
    window_size: int = 7
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, H: int, W: int, deterministic: bool = True):
        B, N, C = x.shape
        xm = x.reshape(B, H, W, C)
        ws = self.window_size
        xp, orig = window_pad(xm, ws)
        Hp, Wp = xp.shape[1:3]
        xw = window_partition(xp, ws)
        out = Mhca(self.embed_dim, self.num_heads, dtype=self.dtype, name="attn")(
            xw, xw, xw, deterministic=deterministic
        )
        out = window_reverse(out, ws, B, Hp, Wp)
        out = window_depad(out, orig, ws)
        return out.reshape(B, N, C)


class HRTBlock(nn.Module):
    """`GeneralTransformerBlock` (`transformer_block.py:52-115`): x + drop_path(
    ISA(LN(x))); the FFN is commented out in the reference forward."""

    dim: int
    num_heads: int
    window_size: int = 7
    drop_path: float = 0.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        B, H, W, C = x.shape
        tokens = x.reshape(B, H * W, C)
        h = nn.LayerNorm(epsilon=1e-6, name="norm1")(tokens)
        h = ISASelfAttention(self.dim, self.num_heads, self.window_size,
                             dtype=self.dtype, name="attn")(h, H, W, deterministic=not train)
        h = DropPath(self.drop_path, name="drop_path")(h, deterministic=not train)
        return (tokens + h).reshape(B, H, W, C)


class HRTFuseDown(nn.Module):
    """j < i fuse path (`hrt_backbone.py:276-330`): (i-j) steps of
    [3x3 depthwise stride-2 + BN + 1x1 + BN], ReLU between steps, none at the end."""

    in_ch: int
    out_ch: int
    steps: int

    @nn.compact
    def __call__(self, x, train: bool = False):
        for k in range(self.steps):
            last = k == self.steps - 1
            ch = self.out_ch if last else self.in_ch
            x = TorchConv(self.in_ch, (3, 3), stride=(2, 2), padding=(1, 1),
                          groups=self.in_ch, use_bias=False, name=f"dw{k}")(x)
            x = _bn(train, f"dwbn{k}")(x)
            x = TorchConv(ch, (1, 1), use_bias=False, name=f"pw{k}")(x)
            x = _bn(train, f"pwbn{k}")(x)
            if not last:
                x = nn.relu(x)
        return x


class HighResolutionTransformerModule(nn.Module):
    """`hrt_backbone.py:113-368`: per-branch transformer blocks + multi-res fuse."""

    num_branches: int
    channels: Sequence[int]
    num_heads: Sequence[int]
    num_blocks: int = 2
    window_size: int = 7
    drop_paths: Sequence[float] = (0.0, 0.0)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, xs, train: bool = False):
        nb = self.num_branches
        xs = list(xs)
        for i in range(nb):
            for b in range(self.num_blocks):
                xs[i] = HRTBlock(
                    self.channels[i], self.num_heads[i], self.window_size,
                    drop_path=self.drop_paths[b], dtype=self.dtype,
                    name=f"branch{i}_block{b}",
                )(xs[i], train)
        if nb == 1:
            return xs

        outs = []
        for i in range(nb):
            y = xs[0] if i == 0 else HRTFuseDown(
                self.channels[0], self.channels[i], i, name=f"fuse{i}_0"
            )(xs[0], train)
            for j in range(1, nb):
                if j == i:
                    y = y + xs[j]
                elif j > i:
                    tgt = (xs[i].shape[1], xs[i].shape[2])
                    # conv+BN+nearest-up; the reference's extra bilinear resize to the
                    # same size (`hrt_backbone.py:352-357`) is an identity
                    y = y + FuseUp(self.channels[i], tgt, name=f"fuse{i}_{j}")(xs[j], train)
                else:
                    y = y + HRTFuseDown(self.channels[j], self.channels[i], i - j,
                                        name=f"fuse{i}_{j}")(xs[j], train)
            outs.append(nn.relu(y))
        return outs


class HighResolutionTransformerNet(nn.Module):
    """`HighResolutionTransformer` (`hrt_backbone.py:370-696`), imagenet head omitted
    (env-gated dead path). Returns 4 feature maps at strides 4/8/16/32."""

    hrt_type: str = "hrt_small"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        cfg = HRT_CONFIGS[self.hrt_type]
        widths = cfg["channels"]

        x = TorchConv(64, (3, 3), stride=(2, 2), padding=(1, 1), use_bias=False, name="conv1")(x)
        x = _bn(train, "bn1")(x)
        x = nn.relu(x)
        x = TorchConv(64, (3, 3), stride=(2, 2), padding=(1, 1), use_bias=False, name="conv2")(x)
        x = _bn(train, "bn2")(x)
        x = nn.relu(x)

        # stage 1: bottlenecks at stage1_planes -> 4x expansion
        for b in range(cfg["stage1_blocks"]):
            x = Bottleneck(cfg["stage1_planes"], has_downsample=(b == 0),
                           name=f"layer1_{b}")(x, train)
        feats = [x]
        prev = (cfg["stage1_planes"] * 4,)

        # linear stochastic-depth schedule over stage depths (`hrt_backbone.py:381-388`)
        depths = [cfg["num_blocks"] * m for m in cfg["num_modules"]]
        total = sum(depths)
        dpr = [cfg["drop_path_rate"] * i / max(total - 1, 1) for i in range(total)]
        offset = 0

        for stage, n_modules in enumerate(cfg["num_modules"], start=2):
            n_branches = stage
            cur = tuple(widths[:n_branches])
            feats = Transition(prev, cur, name=f"transition{stage - 1}")(feats, train)
            for m in range(n_modules):
                dp = tuple(dpr[offset : offset + cfg["num_blocks"]])
                offset += cfg["num_blocks"]
                feats = HighResolutionTransformerModule(
                    n_branches, cur, cfg["num_heads"][:n_branches],
                    num_blocks=cfg["num_blocks"], window_size=cfg["window"],
                    drop_paths=dp, dtype=self.dtype, name=f"stage{stage}_m{m}",
                )(feats, train)
            prev = cur
        return feats
