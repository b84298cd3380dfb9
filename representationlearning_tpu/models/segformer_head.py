"""SegFormer all-MLP decode head (parity with `SCD-AAAI2023/network/segformer_head.py`).

Reference computation: per-stage linear embed -> bilinear upsample to the 1/4 grid
(align_corners=False) -> concat [c4,c3,c2,c1] -> 1x1 ConvModule (conv-BN-ReLU) ->
dropout(0.1) -> 1x1 classifier.

TPU-first restructuring: concat + 1x1 conv over the 4*E-channel stack is, by
linearity, the SUM of four per-stage 1x1 convs with the corresponding input-channel
slices of the fuse kernel — and a 1x1 conv commutes exactly with bilinear upsampling
(both are linear; the conv is pointwise). So each stage's fuse slice is applied at
that stage's NATIVE resolution (16^2..64^2 instead of 128^2) and only the 256-channel
result is upsampled and summed. The (B, 128, 128, 1024) concat tensor — the single
largest HBM structure in the profiled forward pass — never exists, and 3 of the 4
fuse matmuls shrink by 4-64x. Parameter paths are unchanged
(`linear_fuse/conv/kernel` (1,1,4E,E), `linear_fuse/bn/*`), so torch checkpoint
conversion is untouched; outputs match the concat form to float-reduction order.
BN batch stats are sync'd automatically under pjit because they reduce over the
globally-sharded batch axis (SyncBN equivalent, `segformer_head.py:53`).
"""
from __future__ import annotations

from typing import Any, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops.image import resize_bilinear_auto
from .layers import fan_out_conv_init, trunc_normal_init


class _SlicedFuseConv(nn.Module):
    """Holds the (1,1,total_in,features) fuse kernel; applies per-stage slices at
    native resolution, upsamples the results to `tgt`, and sums."""

    features: int
    total_in: int
    dtype: Any = None

    @nn.compact
    def __call__(self, embeds: Sequence[jax.Array], tgt) -> jax.Array:
        kernel = self.param(
            "kernel", fan_out_conv_init(), (1, 1, self.total_in, self.features)
        )
        acc = None
        off = 0
        for e in embeds:
            cin = e.shape[-1]
            w = kernel[0, 0, off : off + cin, :]
            off += cin
            if self.dtype is not None:
                e = e.astype(self.dtype)
            f = jnp.einsum("bhwc,cf->bhwf", e, w.astype(e.dtype),
                           preferred_element_type=jnp.float32).astype(e.dtype)
            if f.shape[1:3] != tuple(tgt):
                f = resize_bilinear_auto(f, tgt, align_corners=False)
            acc = f if acc is None else acc + f
        return acc


class _LowResFuse(nn.Module):
    """conv-BN-ReLU of the reference ConvModule, with the conv distributed across
    stages (see module docstring). Named `linear_fuse` so param paths match."""

    features: int
    total_in: int
    dtype: Any = None

    @nn.compact
    def __call__(self, embeds, tgt, train: bool = False) -> jax.Array:
        x = _SlicedFuseConv(self.features, self.total_in, dtype=self.dtype,
                            name="conv")(embeds, tgt)
        x = nn.BatchNorm(
            use_running_average=not train, momentum=0.9, epsilon=1e-5, name="bn"
        )(x)
        return nn.relu(x)


class SegFormerHead(nn.Module):
    num_classes: int
    embedding_dim: int = 256
    dropout_rate: float = 0.1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, feats: Sequence[jax.Array], train: bool = False) -> jax.Array:
        c1, c2, c3, c4 = feats  # NHWC at strides 4/8/16/32(or 16)
        tgt = c1.shape[1:3]
        # dtype=bf16: the head is HBM-bound on the four (B, tgt, 256) embed/
        # upsample streams (the encoder's bf16 residency stops at the stage
        # LNs); bf16 storage halves that traffic, matmuls accumulate f32,
        # BN statistics stay f32 (flax force_float32_reductions)
        hdt = None if self.dtype == jnp.float32 else self.dtype
        embeds = []
        for i, c in ((4, c4), (3, c3), (2, c2), (1, c1)):
            e = nn.Dense(
                self.embedding_dim, kernel_init=trunc_normal_init(),
                dtype=hdt, name=f"linear_c{i}"
            )(c)
            embeds.append(e)
        x = _LowResFuse(
            self.embedding_dim, self.embedding_dim * 4, dtype=hdt,
            name="linear_fuse"
        )(embeds, tgt, train=train)
        x = nn.Dropout(self.dropout_rate)(x, deterministic=not train)
        x = nn.Conv(self.num_classes, (1, 1), name="linear_pred")(x)
        return x
