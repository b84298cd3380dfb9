"""HRNetV2 backbone (w18/w32/w40/w48) with optional RSSFormer transformer fusion —
parity with `RSSFormer-TIP2023/module/baseline/base_hrnet/_hrnet_rssformer.py` (and the
vanilla `_hrnet.py` when `with_transformer=False`).

Structure: 2-conv stride-4 stem -> layer1 (4 Bottlenecks, 64->256) -> transitions ->
stages 2/3/4 of HighResolutionModules (BasicBlocks per branch + multi-resolution fuse).
RSSFormer delta (`_hrnet_rssformer.py:410-436`): in every module's fuse, the
highest-resolution output is produced by `transformer(low, y)` where `low` is the sum
of upsampled lower branches and `y` the branch-0 feature, instead of `y + low`.

BN momentum 0.1 (torch) == flax momentum 0.9; SyncBN comes free under pjit since batch
stats reduce over the globally sharded batch axis.
"""
from __future__ import annotations

from typing import Any, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops.image import resize_nearest
from .layers import RawStatBatchNorm, TorchConv
from .rssformer_modules import GeneralTransformerBlock

HRNET_EXTRA = {
    "hrnetv2_w18": dict(widths=(18, 36, 72, 144)),
    "hrnetv2_w32": dict(widths=(32, 64, 128, 256)),
    "hrnetv2_w40": dict(widths=(40, 80, 160, 320)),
    "hrnetv2_w48": dict(widths=(48, 96, 192, 384)),
}
# stage layout shared by all variants (`_hrnet_rssformer.py:model_extra`)
STAGE_MODULES = (1, 1, 4, 3)   # stage1..4 num_modules
STAGE_BRANCHES = (1, 2, 3, 4)
STAGE_BLOCKS = 4               # blocks per branch, all stages


def _bn(train, name, defer=False):
    cls = RawStatBatchNorm if defer else nn.BatchNorm
    return cls(use_running_average=not train, momentum=0.9, epsilon=1e-5, name=name)


class BasicBlock(nn.Module):
    planes: int
    stride: int = 1
    has_downsample: bool = False
    dtype: Any = None
    defer_bn_ema: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        out = TorchConv(self.planes, (3, 3), stride=(self.stride, self.stride),
                        padding=(1, 1), use_bias=False, dtype=self.dtype, name="conv1")(x)
        out = _bn(train, "bn1", self.defer_bn_ema)(out)
        out = nn.relu(out)
        out = TorchConv(self.planes, (3, 3), padding=(1, 1), use_bias=False,
                        dtype=self.dtype, name="conv2")(out)
        out = _bn(train, "bn2", self.defer_bn_ema)(out)
        if self.has_downsample:
            res = TorchConv(self.planes, (1, 1), stride=(self.stride, self.stride),
                            use_bias=False, dtype=self.dtype, name="downsample_conv")(x)
            res = _bn(train, "downsample_bn", self.defer_bn_ema)(res)
        else:
            res = x
        return nn.relu(out + res)


class Bottleneck(nn.Module):
    planes: int
    stride: int = 1
    has_downsample: bool = False
    dtype: Any = None
    defer_bn_ema: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        out = TorchConv(self.planes, (1, 1), use_bias=False, dtype=self.dtype, name="conv1")(x)
        out = _bn(train, "bn1", self.defer_bn_ema)(out)
        out = nn.relu(out)
        out = TorchConv(self.planes, (3, 3), stride=(self.stride, self.stride),
                        padding=(1, 1), use_bias=False, dtype=self.dtype, name="conv2")(out)
        out = _bn(train, "bn2", self.defer_bn_ema)(out)
        out = nn.relu(out)
        out = TorchConv(self.planes * 4, (1, 1), use_bias=False, dtype=self.dtype, name="conv3")(out)
        out = _bn(train, "bn3", self.defer_bn_ema)(out)
        if self.has_downsample:
            res = TorchConv(self.planes * 4, (1, 1), stride=(self.stride, self.stride),
                            use_bias=False, dtype=self.dtype, name="downsample_conv")(x)
            res = _bn(train, "downsample_bn", self.defer_bn_ema)(res)
        else:
            res = x
        return nn.relu(out + res)


class FuseUp(nn.Module):
    """j > i path: 1x1 conv -> BN -> nearest upsample to the target branch size
    (equals the reference's fixed 2^(j-i) Upsample whenever sizes divide evenly;
    inputs not divisible by 32 stay well-defined instead of shape-erroring)."""

    out_ch: int
    target: tuple
    dtype: Any = None
    defer_bn_ema: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = TorchConv(self.out_ch, (1, 1), use_bias=False, dtype=self.dtype, name="conv")(x)
        x = _bn(train, "bn", self.defer_bn_ema)(x)
        return resize_nearest(x, self.target)


class FuseDown(nn.Module):
    """j < i path: (i-j) stride-2 3x3 convs; relu between, none at the end."""

    mid_ch: int
    out_ch: int
    steps: int
    dtype: Any = None
    defer_bn_ema: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        for k in range(self.steps):
            last = k == self.steps - 1
            ch = self.out_ch if last else self.mid_ch
            x = TorchConv(ch, (3, 3), stride=(2, 2), padding=(1, 1),
                          use_bias=False, dtype=self.dtype, name=f"conv{k}")(x)
            x = _bn(train, f"bn{k}", self.defer_bn_ema)(x)
            if not last:
                x = nn.relu(x)
        return x


class HighResolutionModule(nn.Module):
    num_branches: int
    channels: Sequence[int]
    num_blocks: int = 4
    with_transformer: bool = True
    multi_scale_output: bool = True
    dtype: Any = jnp.float32
    defer_bn_ema: bool = False
    fused_mlp: bool = False
    conv_mm: bool = False
    # rematerialize each GeneralTransformerBlock in the backward pass: the saved
    # window-attention probabilities pad 3-4x on TPU ((.., 49, 49) tiles against
    # T(8,128)) and dominate train-step HBM at batch >= 16 (the b16 step OOMed
    # at 26.2G of 15.75G before this; the blocks are ~15% of step FLOPs)
    remat_transformer: bool = False

    @nn.compact
    def __call__(self, xs, train: bool = False):
        nb = self.num_branches
        if nb == 1:
            x = xs[0]
            for b in range(self.num_blocks):
                x = BasicBlock(self.channels[0], dtype=self.dtype,
                               defer_bn_ema=self.defer_bn_ema,
                               name=f"branch0_block{b}")(x, train)
            return [x]

        xs = list(xs)
        for i in range(nb):
            for b in range(self.num_blocks):
                ds = xs[i].shape[-1] != self.channels[i] and b == 0
                xs[i] = BasicBlock(self.channels[i], has_downsample=ds, dtype=self.dtype,
                                   defer_bn_ema=self.defer_bn_ema,
                                   name=f"branch{i}_block{b}")(xs[i], train)

        n_out = nb if self.multi_scale_output else 1
        outs = []
        for i in range(n_out):
            # y: identity branch contribution; low: sum of the other branches
            y = xs[0] if i == 0 else FuseDown(
                self.channels[0], self.channels[i], i, dtype=self.dtype,
                defer_bn_ema=self.defer_bn_ema, name=f"fuse{i}_0"
            )(xs[0], train)
            low = None
            for j in range(1, nb):
                if j == i:
                    t = xs[j]
                elif j > i:
                    tgt = (xs[i].shape[1], xs[i].shape[2])
                    t = FuseUp(self.channels[i], tgt, dtype=self.dtype,
                               defer_bn_ema=self.defer_bn_ema,
                               name=f"fuse{i}_{j}")(xs[j], train)
                else:
                    t = FuseDown(self.channels[j], self.channels[i], i - j,
                                 dtype=self.dtype, defer_bn_ema=self.defer_bn_ema,
                                 name=f"fuse{i}_{j}")(xs[j], train)
                low = t if low is None else low + t
            if i == 0 and self.with_transformer:
                block_cls = (nn.remat(GeneralTransformerBlock, static_argnums=(3,))
                             if self.remat_transformer else GeneralTransformerBlock)
                y = block_cls(self.channels[0], num_heads=2,
                              dtype=self.dtype,
                              defer_bn_ema=self.defer_bn_ema,
                              fused_mlp=self.fused_mlp,
                              conv_mm=self.conv_mm,
                              name="transformer")(low, y, train)
            else:
                y = y + low
            outs.append(nn.relu(y))
        return outs


class Transition(nn.Module):
    """Transition between stages (`_hrnet_rssformer.py:514-546`)."""

    prev_channels: Sequence[int]
    cur_channels: Sequence[int]
    dtype: Any = None
    defer_bn_ema: bool = False

    @nn.compact
    def __call__(self, xs, train: bool = False):
        outs = []
        n_pre, n_cur = len(self.prev_channels), len(self.cur_channels)
        for i in range(n_cur):
            if i < n_pre:
                if self.cur_channels[i] != self.prev_channels[i]:
                    h = TorchConv(self.cur_channels[i], (3, 3), padding=(1, 1),
                                  use_bias=False, dtype=self.dtype, name=f"t{i}_conv")(xs[i])
                    h = _bn(train, f"t{i}_bn", self.defer_bn_ema)(h)
                    outs.append(nn.relu(h))
                else:
                    outs.append(xs[i])
            else:
                h = xs[-1]
                for j in range(i + 1 - n_pre):
                    last = j == i - n_pre
                    ch = self.cur_channels[i] if last else self.prev_channels[-1]
                    h = TorchConv(ch, (3, 3), stride=(2, 2), padding=(1, 1),
                                  use_bias=False, dtype=self.dtype, name=f"t{i}_conv{j}")(h)
                    h = _bn(train, f"t{i}_bn{j}", self.defer_bn_ema)(h)
                    h = nn.relu(h)
                outs.append(h)
        return outs


class HighResolutionNet(nn.Module):
    hrnet_type: str = "hrnetv2_w32"
    with_transformer: bool = True
    dtype: Any = jnp.float32
    defer_bn_ema: bool = False
    fused_mlp: bool = False
    conv_mm: bool = False
    remat_transformer: bool = False  # see HighResolutionModule.remat_transformer

    @nn.compact
    def __call__(self, x, train: bool = False):
        widths = HRNET_EXTRA[self.hrnet_type]["widths"]

        # stem: two stride-2 3x3 convs
        x = TorchConv(64, (3, 3), stride=(2, 2), padding=(1, 1), use_bias=False,
                      dtype=self.dtype, name="conv1")(x)
        x = _bn(train, "bn1", self.defer_bn_ema)(x)
        x = nn.relu(x)
        x = TorchConv(64, (3, 3), stride=(2, 2), padding=(1, 1), use_bias=False,
                      dtype=self.dtype, name="conv2")(x)
        x = _bn(train, "bn2", self.defer_bn_ema)(x)
        x = nn.relu(x)

        # stage 1: 4 bottlenecks at 64 planes -> 256 channels
        for b in range(4):
            x = Bottleneck(64, has_downsample=(b == 0), dtype=self.dtype,
                           defer_bn_ema=self.defer_bn_ema,
                           name=f"layer1_{b}")(x, train)
        feats = [x]
        prev = (256,)

        for stage, (n_modules, n_branches) in enumerate(
            zip(STAGE_MODULES[1:], STAGE_BRANCHES[1:]), start=2
        ):
            cur = tuple(widths[:n_branches])
            feats = Transition(prev, cur, dtype=self.dtype,
                               defer_bn_ema=self.defer_bn_ema,
                               name=f"transition{stage - 1}")(feats, train)
            for m in range(n_modules):
                feats = HighResolutionModule(
                    n_branches, cur, STAGE_BLOCKS,
                    with_transformer=self.with_transformer,
                    dtype=self.dtype, defer_bn_ema=self.defer_bn_ema,
                    fused_mlp=self.fused_mlp, conv_mm=self.conv_mm,
                    remat_transformer=self.remat_transformer,
                    name=f"stage{stage}_m{m}",
                )(feats, train)
            prev = cur
        return feats  # 4 maps at strides 4/8/16/32
