"""Shared flax building blocks (NHWC, TPU-friendly).

Torch-parity notes:
- `Conv` uses torch's kernel layout convention converted at load time (OIHW->HWIO in
  `convert/torch2jax.py`); padding here is explicit "SAME-like" integer padding, matching
  `nn.Conv2d(padding=p)`.
- `DropPath` is timm's stochastic depth (per-sample Bernoulli on the residual branch,
  `mix_transformer.py:150` via timm DropPath).
- `trunc_normal_(std=.02)` init parity is irrelevant for converted checkpoints but kept
  for from-scratch training (`mix_transformer.py:31-43`).
"""
from __future__ import annotations

from typing import Callable, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn


def trunc_normal_init(std: float = 0.02):
    def init(key, shape, dtype=jnp.float32):
        # truncated at +-2 std like timm's trunc_normal_
        return std * jax.random.truncated_normal(key, -2.0, 2.0, shape, dtype)

    return init


def fan_out_conv_init():
    """torch reference conv init: normal(0, sqrt(2/fan_out)) with fan_out = kh*kw*out/groups
    (`mix_transformer.py:38-43`)."""

    def init(key, shape, dtype=jnp.float32):
        # flax conv kernel shape (kh, kw, in_per_group, out)
        kh, kw, _, out = shape
        fan_out = kh * kw * out
        return jax.random.normal(key, shape, dtype) * jnp.sqrt(2.0 / fan_out)

    return init


class RawStatBatchNorm(nn.BatchNorm):
    """BatchNorm whose train-mode running-stat update is DEFERRED to the trainer.

    Identical to `nn.BatchNorm` except that in train mode it writes the RAW batch
    mean/var into the `batch_stats` collection instead of EMA-updating in place.
    The train step then applies ONE fused flat-vector EMA across every layer at
    once (`train/rssformer.py::make_rssformer_train_step`), which is arithmetic-
    identical per element (`m*old + (1-m)*batch`, flax's own expression) but
    collapses the ~800 per-layer EMA dispatches of HRNetV2's ~400 norm layers
    into a single kernel — the round-2 profile measured those tiny f32[32..256]
    ops at 16-66 us each on the v5e runtime (PERF.md).

    Variable tree (<name>/{mean,var}), params, and eval behavior are identical to
    `nn.BatchNorm`, so checkpoints convert unchanged. The __call__ body mirrors
    flax 0.12's `BatchNorm.__call__` with only the update lines changed.
    """

    @nn.compact
    def __call__(self, x, use_running_average=None, *, mask=None):
        from flax.linen import normalization as _N

        use_running_average = nn.merge_param(
            "use_running_average", self.use_running_average, use_running_average
        )
        feature_axes = _N._canonicalize_axes(x.ndim, self.axis)
        reduction_axes = tuple(i for i in range(x.ndim) if i not in feature_axes)
        feature_shape = [x.shape[ax] for ax in feature_axes]

        stat_dtype = (
            jnp.float32 if self.force_float32_reductions else self.param_dtype
        )
        ra_mean = self.variable(
            "batch_stats", "mean", lambda s: jnp.zeros(s, stat_dtype), feature_shape
        )
        ra_var = self.variable(
            "batch_stats", "var", lambda s: jnp.ones(s, stat_dtype), feature_shape
        )

        if use_running_average:
            mean = (
                ra_mean.value
                if self.force_float32_reductions
                else jnp.asarray(ra_mean.value, self.param_dtype)
            )
            var = (
                ra_var.value
                if self.force_float32_reductions
                else jnp.asarray(ra_var.value, self.param_dtype)
            )
        else:
            mean, var = _N._compute_stats(
                x,
                reduction_axes,
                dtype=self.dtype,
                axis_name=self.axis_name if not self.is_initializing() else None,
                axis_index_groups=self.axis_index_groups,
                use_fast_variance=self.use_fast_variance,
                mask=mask,
                force_float32_reductions=self.force_float32_reductions,
            )
            if not self.is_initializing():
                # the ONLY divergence from nn.BatchNorm: store raw batch stats
                ra_mean.value = jnp.asarray(mean, stat_dtype)
                ra_var.value = jnp.asarray(var, stat_dtype)

        return _N._normalize(
            self,
            x,
            mean,
            var,
            reduction_axes,
            feature_axes,
            self.dtype,
            self.param_dtype,
            self.epsilon,
            self.use_bias,
            self.use_scale,
            self.bias_init,
            self.scale_init,
            self.force_float32_reductions,
        )


class DropPath(nn.Module):
    """Stochastic depth: drop the whole residual branch per sample."""

    rate: float = 0.0

    @nn.compact
    def __call__(self, x: jax.Array, deterministic: bool = True) -> jax.Array:
        if self.rate == 0.0 or deterministic:
            return x
        keep = 1.0 - self.rate
        rng = self.make_rng("dropout")
        shape = (x.shape[0],) + (1,) * (x.ndim - 1)
        mask = jax.random.bernoulli(rng, keep, shape)
        return jnp.where(mask, x / keep, 0.0)


def TorchConv(
    features: int,
    kernel_size: tuple[int, int],
    stride: tuple[int, int] = (1, 1),
    padding: tuple[int, int] = (0, 0),
    dilation: tuple[int, int] = (1, 1),
    groups: int = 1,
    use_bias: bool = True,
    kernel_init: Callable | None = None,
    dtype=None,
    name: str | None = None,
) -> nn.Conv:
    """2-D conv on NHWC with integer padding semantics of torch nn.Conv2d.
    Returns a plain nn.Conv so checkpoint paths stay flat (<name>/kernel).
    `dtype=bfloat16` casts input+kernel for the MXU (f32 internal accumulation,
    torch-AMP-equivalent — the reference trains RSSFormer under AMP,
    `RSSFormer-TIP2023/train.py:79`); params stay f32."""
    return nn.Conv(
        features=features,
        kernel_size=kernel_size,
        strides=stride,
        padding=((padding[0], padding[0]), (padding[1], padding[1])),
        kernel_dilation=dilation,
        feature_group_count=groups,
        use_bias=use_bias,
        kernel_init=kernel_init or fan_out_conv_init(),
        dtype=dtype,
        name=name,
    )


class ConvBNReLU(nn.Module):
    """mmcv ConvModule(conv->BN->ReLU) with conv bias disabled under norm
    (`segformer_head.py:53-58`). BatchNorm cross-replica sync happens via `axis_name`
    (SyncBN equivalent) when run inside a mapped axis."""

    features: int
    kernel_size: tuple[int, int] = (1, 1)
    axis_name: str | None = None
    use_relu: bool = True

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        p = (self.kernel_size[0] // 2, self.kernel_size[1] // 2)
        x = TorchConv(self.features, self.kernel_size, padding=p, use_bias=False, name="conv")(x)
        x = nn.BatchNorm(
            use_running_average=not train,
            momentum=0.9,
            epsilon=1e-5,
            axis_name=self.axis_name if train else None,
            name="bn",
        )(x)
        if self.use_relu:
            x = nn.relu(x)
        return x


class TorchLinear(nn.Module):
    features: int
    use_bias: bool = True

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        return nn.Dense(
            self.features, use_bias=self.use_bias, kernel_init=trunc_normal_init(0.02)
        )(x)


def layer_norm(x: jax.Array, eps: float = 1e-6) -> jax.Array:
    return nn.LayerNorm(epsilon=eps)(x)


class AttnProj(nn.Module):
    """The TSCD/RML affinity head (`TSCD_model.py:38,73-76`): a 1x1 conv with
    2*nh input channels over the channel-concat of the last two exported
    attention maps. Param tree is IDENTICAL to ``nn.Conv(1, (1, 1))`` (kernel
    (1, 1, in_ch, 1) + bias (1,)) so converted checkpoints load unchanged, but
    the forward contracts each (B, nh, N, N) map against its kernel slice
    directly — the reference formulation's concat + NHWC transpose lowered to
    two ~160 MB layout copies per step at the 400x400 affinity grid (xplane,
    PERF.md round 4). Returns pre-sigmoid logits (B, N, N)."""

    in_ch: int

    @nn.compact
    def __call__(self, attn_list):
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (1, 1, self.in_ch, 1))
        bias = self.param("bias", nn.initializers.zeros, (1,))
        w = kernel[0, 0, :, 0]
        out = None
        ofs = 0
        for a in attn_list:
            nh = a.shape[1]
            term = jnp.einsum("bknm,k->bnm", a, w[ofs:ofs + nh],
                              preferred_element_type=jnp.float32)
            out = term if out is None else out + term
            ofs += nh
        return out + bias[0]
