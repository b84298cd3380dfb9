"""SegFormer all-MLP decode head (parity with `SCD-AAAI2023/network/segformer_head.py`).

Per-stage linear embed -> bilinear upsample to the 1/4 grid (align_corners=False)
-> concat [c4,c3,c2,c1] -> 1x1 ConvModule (conv-BN-ReLU; BN is sync'd automatically
under pjit because batch stats reduce over the globally-sharded batch axis)
-> dropout(0.1) -> 1x1 classifier.
"""
from __future__ import annotations

from typing import Any, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops.image import resize_bilinear
from .layers import ConvBNReLU, trunc_normal_init


class SegFormerHead(nn.Module):
    num_classes: int
    embedding_dim: int = 256
    dropout_rate: float = 0.1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, feats: Sequence[jax.Array], train: bool = False) -> jax.Array:
        c1, c2, c3, c4 = feats  # NHWC at strides 4/8/16/32(or 16)
        tgt = c1.shape[1:3]
        embeds = []
        for i, c in ((4, c4), (3, c3), (2, c2), (1, c1)):
            e = nn.Dense(
                self.embedding_dim, kernel_init=trunc_normal_init(), name=f"linear_c{i}"
            )(c)
            if e.shape[1:3] != tgt:
                e = resize_bilinear(e, tgt, align_corners=False)
            embeds.append(e)
        x = jnp.concatenate(embeds, axis=-1)
        x = ConvBNReLU(self.embedding_dim, (1, 1), name="linear_fuse")(x, train=train)
        x = nn.Dropout(self.dropout_rate)(x, deterministic=not train)
        x = nn.Conv(self.num_classes, (1, 1), name="linear_pred")(x)
        return x
