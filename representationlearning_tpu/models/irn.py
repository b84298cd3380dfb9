"""IRN (Inter-pixel Relation Network) — parity with `WaveCAM-TMM2023/net/resnet50_irn.py`.

ResNet-50 backbone (frozen, stop-gradient per stage, `:115-119`) + 5-level edge branch
(1x1 conv -> GroupNorm -> upsample -> relu, fused by a 1x1 to one edge channel) +
7-level displacement branch ending in a 2-channel field with MeanShift calibration.

`AffinityDisplacementLoss` turns sigmoid edges into per-path affinities via the
precomputed PathIndex and returns the four loss maps
(pos/neg affinity log losses, fg/bg displacement L1, `:144-213`);
`EdgeDisplacement` is the inference head (flip-averaged sigmoid edge, `:216-234`).
"""
from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ..core.registry import MODELS
from ..ops.image import resize_bilinear_auto
from ..wsss.indexing import PathIndex, edge_to_affinity
from .resnet import ResNet50Backbone, resnet50_config


class _ConvGN(nn.Module):
    features: int
    groups: int
    upsample: int = 1

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(self.features, (1, 1), use_bias=False)(x)
        x = nn.GroupNorm(num_groups=self.groups)(x)
        if self.upsample > 1:
            H, W = x.shape[1] * self.upsample, x.shape[2] * self.upsample
            x = resize_bilinear_auto(x, (H, W), align_corners=False)
        return nn.relu(x)


@MODELS.register("irn")
class IRNNet(nn.Module):
    """Returns (edge_out (B,h,w,1) logits at stride 4, dp_out (B,h,w,2))."""

    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, apply_mean_shift: bool = False):
        feats = ResNet50Backbone(**resnet50_config(16), return_stem=True, name="resnet50")(x)
        # stages per reference: stem(64, s4), layer1(256, s4), layer2(512, s8),
        # layer3(1024, s16), layer4(2048, s16); backbone frozen via stop_gradient
        x1, x2, x3, x4, x5 = [jax.lax.stop_gradient(f) for f in feats]

        h2, w2 = x1.shape[1], x1.shape[2]

        e1 = _ConvGN(32, 4, name="fc_edge1")(x1)
        e2 = _ConvGN(32, 4, name="fc_edge2")(x2)
        e3 = _ConvGN(32, 4, upsample=2, name="fc_edge3")(x3)[:, :h2, :w2]
        e4 = _ConvGN(32, 4, upsample=4, name="fc_edge4")(x4)[:, :h2, :w2]
        e5 = _ConvGN(32, 4, upsample=4, name="fc_edge5")(x5)[:, :h2, :w2]
        edge_out = nn.Conv(1, (1, 1), use_bias=True, name="fc_edge6")(
            jnp.concatenate([e1, e2, e3, e4, e5], axis=-1)
        )

        d1 = _ConvGN(64, 8, name="fc_dp1")(x1)
        d2 = _ConvGN(128, 16, name="fc_dp2")(x2)
        d3 = _ConvGN(256, 16, name="fc_dp3")(x3)
        d4 = _ConvGN(256, 16, upsample=2, name="fc_dp4")(x4)[:, : d3.shape[1], : d3.shape[2]]
        d5 = _ConvGN(256, 16, upsample=2, name="fc_dp5")(x5)[:, : d3.shape[1], : d3.shape[2]]
        d_up3 = _ConvGN(256, 16, upsample=2, name="fc_dp6")(
            jnp.concatenate([d3, d4, d5], axis=-1)
        )[:, : d2.shape[1], : d2.shape[2]]
        d = _ConvGN(256, 16, name="fc_dp7a")(jnp.concatenate([d1, d2, d_up3], axis=-1))
        dp_out = nn.Conv(2, (1, 1), use_bias=False, name="fc_dp7b")(d)

        mean = self.variable("batch_stats", "dp_running_mean",
                             nn.initializers.zeros, None, (2,))
        if apply_mean_shift:
            dp_out = dp_out - mean.value
        return edge_out, dp_out


class AffinityDisplacementHead:
    """Loss-map computation around IRNNet (`resnet50_irn.py:144-213`), stateless."""

    def __init__(self, path_index: PathIndex):
        self.path_index = path_index
        self.disp_target = jnp.asarray(
            path_index.search_dst.T[None, :, :, None], jnp.float32
        )  # (1, 2, n_paths, 1)

    def to_affinity(self, edge_sigmoid: jax.Array) -> jax.Array:
        """(B,h,w) sigmoid edges -> (B, n_paths, n_pos) affinities."""
        B = edge_sigmoid.shape[0]
        return edge_to_affinity(edge_sigmoid.reshape(B, -1), self.path_index.path_indices)

    def to_pair_displacement(self, disp: jax.Array) -> jax.Array:
        """disp (B,h,w,2) -> (B, 2, n_paths, n_pos) src-dst differences
        (`resnet50_irn.py:177-191`)."""
        B, H, W, _ = disp.shape
        rf = self.path_index.radius_floor
        ch, cw = H - rf, W - 2 * rf
        d = disp.transpose(0, 3, 1, 2)  # (B,2,H,W)
        src = d[:, :, :ch, rf : rf + cw]
        dst = jnp.stack(
            [d[:, :, dy : dy + ch, rf + dx : rf + dx + cw]
             for dy, dx in self.path_index.search_dst],
            axis=2,
        )
        pair = src[:, :, None] - dst
        return pair.reshape(B, 2, pair.shape[2], -1)

    def losses(self, edge_out: jax.Array, dp_out: jax.Array):
        """Returns (pos_aff_loss, neg_aff_loss, dp_fg_loss, dp_bg_loss) maps."""
        aff = self.to_affinity(jax.nn.sigmoid(edge_out[..., 0]))
        pos = -jnp.log(aff + 1e-5)
        neg = -jnp.log(1.0 + 1e-5 - aff)
        pair = self.to_pair_displacement(dp_out)
        dp_fg = jnp.abs(pair - self.disp_target)
        dp_bg = jnp.abs(pair)
        return pos, neg, dp_fg, dp_bg


def irn_total_loss(head: AffinityDisplacementHead, edge_out, dp_out,
                   bg_pos_label, fg_pos_label, neg_label):
    """Training mix (`step/train_irn.py:57-70`)."""
    pos, neg, dp_fg, dp_bg = head.losses(edge_out, dp_out)
    bg_pos = (bg_pos_label * pos).sum() / (bg_pos_label.sum() + 1e-5)
    fg_pos = (fg_pos_label * pos).sum() / (fg_pos_label.sum() + 1e-5)
    pos_loss = bg_pos / 2 + fg_pos / 2
    neg_loss = (neg_label * neg).sum() / (neg_label.sum() + 1e-5)
    dp_fg_loss = (dp_fg * fg_pos_label[:, None]).sum() / (2 * fg_pos_label.sum() + 1e-5)
    dp_bg_loss = (dp_bg * bg_pos_label[:, None]).sum() / (2 * bg_pos_label.sum() + 1e-5)
    total = (pos_loss + neg_loss) / 2 + (dp_fg_loss + dp_bg_loss) / 2
    return total, {"pos_aff": pos_loss, "neg_aff": neg_loss,
                   "dp_fg": dp_fg_loss, "dp_bg": dp_bg_loss}


def edge_displacement_infer(apply_fn, variables, x_and_flip: jax.Array, stride: int = 4):
    """EdgeDisplacement inference (`resnet50_irn.py:216-234`): input is the
    [x; flip(x)] pair stacked on batch; returns (edge (h,w), dp (h,w,2))."""
    H, W = x_and_flip.shape[1:3]
    fh, fw = (H - 1) // stride + 1, (W - 1) // stride + 1
    edge_out, dp_out = apply_fn(variables, x_and_flip, apply_mean_shift=True)
    edge_out = edge_out[:, :fh, :fw, 0]
    dp_out = dp_out[:, :fh, :fw, :]
    edge = jax.nn.sigmoid(edge_out[0] / 2 + jnp.flip(edge_out[1], axis=1) / 2)
    return edge, dp_out[0]
