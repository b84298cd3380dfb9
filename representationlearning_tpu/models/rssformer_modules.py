"""RSSFormer transformer modules — parity with
`RSSFormer-TIP2023/module/baseline/base_hrnet/modules/`:

- SpatialAttention (`multihead_isa_pool_attention.py:104-117`): channel mean+max ->
  7x7 conv -> sigmoid gate map.
- InterlacedPoolAttention2 (`:117-188`): softmax fusion of the two input streams from
  their spatial-attention maps, 7x7 window partition (center-padded; despite the
  "interlaced" name the einops pattern `(qh ph)` groups CONTIGUOUS windows), then
  cross-attention (q from x, k/v from y) with a standard MHA (Mhca, `DAL.py:676+` —
  note: no relative position bias is actually wired in, the `rpe` kwarg is consumed
  before reaching Mhca).
- MlpDWBN (`ffn_block.py:207-270`): 1x1 conv-BN-GELU -> sum of {1x1, 3x3 d6, 3x3 d12}
  branches -> BN-GELU -> 1x1 conv-BN-GELU (SyncBN == BatchNorm under pjit global batch).
- GeneralTransformerBlock (`MTFM.py:48-120`): pre-LN attention + MlpDWBN FFN with
  drop-path residuals; takes (x=low-fused, y=high-res) NHWC maps.

All NHWC; window attention batches (B * n_windows, ws*ws, C) so the MXU sees one big
batched matmul per layer.
"""
from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from .layers import DropPath, RawStatBatchNorm, TorchConv, fan_out_conv_init, trunc_normal_init


class _SpatialGateConv(nn.Module):
    """The 7x7 2->1 gate conv, unrolled as 98 shifted multiply-adds on TPU.

    XLA's conv emitter computes this tiny conv's KERNEL GRADIENT as a
    reduce-window costing ~2.3 ms per layer on the v5e (PERF.md round 3 —
    ~18 ms/step across HRNetFusion's gate layers at batch 8 512^2, for a conv
    whose whole-step FLOPs are ~0.1 GF). The unrolled form autodiffs into 98
    fusable elementwise reduces instead. An im2col lowering (49 taps gathered
    into one (B, H, W, 98) tensor + a single contraction) was A/B'd on the v5e
    in round 5 and REJECTED: predict 115.7 vs 126.5 tiles/s (the 49 slice
    copies cost more than the unrolled MAC chain XLA fuses for free) and train
    267.9 vs 266.7 ms/step (the per-tap grad reduces were never the tail).
    Param tree identical to `nn.Conv(name=...)`: <name>/kernel,
    shape (ks, ks, 2, 1), no bias."""

    kernel_size: int = 7

    @nn.compact
    def __call__(self, h):
        ks = self.kernel_size
        kernel = self.param("kernel", fan_out_conv_init(), (ks, ks, 2, 1))
        if jax.default_backend() != "tpu":
            return jax.lax.conv_general_dilated(
                h, kernel.astype(h.dtype), (1, 1),
                ((ks // 2, ks // 2), (ks // 2, ks // 2)),
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
        B, H, W, _ = h.shape
        p = ks // 2
        hp = jnp.pad(h, ((0, 0), (p, p), (p, p), (0, 0)))
        out = jnp.zeros((B, H, W), h.dtype)
        for i in range(ks):
            for j in range(ks):
                tap = hp[:, i:i + H, j:j + W, :]
                out = out + tap[..., 0] * kernel[i, j, 0, 0] \
                          + tap[..., 1] * kernel[i, j, 1, 0]
        return out[..., None]


class SpatialAttention(nn.Module):
    kernel_size: int = 7

    @nn.compact
    def __call__(self, x, channel_axis: int = -1):
        """x: feature map with channels on `channel_axis` (NHWC by default, or
        axis=1 for a raw NCHW view — the reduction runs in-place either way, so
        the caller never pays a full-tensor transpose just to feed the gate).
        Returns the sigmoid gate map shaped (B, H, W, 1)."""
        avg = x.mean(axis=channel_axis, keepdims=True)
        mx = x.max(axis=channel_axis, keepdims=True)
        h = jnp.concatenate([avg, mx], axis=channel_axis)
        if channel_axis not in (-1, x.ndim - 1):
            h = jnp.moveaxis(h, channel_axis, -1)  # (B, H, W, 2) — tiny
        h = _SpatialGateConv(self.kernel_size, name="conv1")(h)
        return jax.nn.sigmoid(h)


def window_pad(x: jax.Array, ws: int):
    """Center-pad H, W of NHWC to multiples of ws (`PadBlock.pad_if_needed`)."""
    B, H, W, C = x.shape
    ph = (-H) % ws
    pw = (-W) % ws
    if ph or pw:
        x = jnp.pad(x, ((0, 0), (ph // 2, ph - ph // 2), (pw // 2, pw - pw // 2), (0, 0)))
    return x, (H, W)


def window_depad(x: jax.Array, orig_hw, ws: int):
    H, W = orig_hw
    ph = (-H) % ws
    pw = (-W) % ws
    if ph or pw:
        x = x[:, ph // 2 : ph // 2 + H, pw // 2 : pw // 2 + W, :]
    return x


def window_partition(x: jax.Array, ws: int):
    """(B, H, W, C) -> (B*qh*qw, ws*ws, C), contiguous ws x ws blocks."""
    B, H, W, C = x.shape
    qh, qw = H // ws, W // ws
    x = x.reshape(B, qh, ws, qw, ws, C).transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(B * qh * qw, ws * ws, C)


def window_reverse(x: jax.Array, ws: int, B: int, H: int, W: int):
    qh, qw = H // ws, W // ws
    C = x.shape[-1]
    x = x.reshape(B, qh, qw, ws, ws, C).transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(B, H, W, C)


class Mhca(nn.Module):
    """Cross multi-head attention with separate q/k/v projections
    (`DAL.py:676-1030`): q scaled by head_dim^-0.5 before the product, plus the DAL
    channel gate (`DAL.py:1005-1016`): the attention output is multiplied by a
    per-(batch, head) scalar sigmoid(mean(q^T k) + max(q^T k)) computed from the
    token-summed head_dim x head_dim correlation of the (scaled) q and k.

    `fused=True` routes the attention core — scores, softmax, gate, weighted
    sum — through the VMEM-resident pallas kernel (`ops/pallas/isa_attention.py`)
    whenever dropout is inactive and q/k token counts match; param tree is
    unchanged. Default False: at the shipped 7x7-window shapes (49 tokens,
    C=32) XLA's batched-matmul lowering measured 5.7x FASTER than the kernel
    (0.13 vs 0.76 ms for the 512^2 predict's 1444-window core — the window
    attention is NOT where the HRNetFusion time goes; see PERF.md round 3).
    The kernel remains a memory lever for large-window variants."""

    embed_dim: int
    num_heads: int
    dropout: float = 0.0
    use_bias: bool = True
    fused: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, query, key, value, deterministic: bool = True):
        """query/key/value: (B, S, C). Returns (B, S, C)."""
        B, S, C = query.shape
        nh, hd = self.num_heads, C // self.num_heads
        scaling = hd ** -0.5
        q = nn.Dense(C, use_bias=self.use_bias, name="q_proj")(query) * scaling
        k = nn.Dense(C, use_bias=self.use_bias, name="k_proj")(key)
        v = nn.Dense(C, use_bias=self.use_bias, name="v_proj")(value)
        if (self.fused and key.shape[1] == S
                and (deterministic or self.dropout == 0.0)):
            from ..ops.pallas.isa_attention import isa_attention_core

            out = isa_attention_core(q, k, v, nh, self.dtype)
            return nn.Dense(C, name="out_proj")(out)
        q = q.reshape(B, S, nh, hd).transpose(0, 2, 1, 3)
        k = k.reshape(B, -1, nh, hd).transpose(0, 2, 1, 3)
        v = v.reshape(B, -1, nh, hd).transpose(0, 2, 1, 3)
        attn = jnp.einsum("bhsd,bhtd->bhst", q.astype(self.dtype), k.astype(self.dtype),
                          preferred_element_type=jnp.float32)
        attn = jax.nn.softmax(attn, axis=-1)
        attn = nn.Dropout(self.dropout)(attn, deterministic=deterministic)
        out = jnp.einsum("bhst,bhtd->bhsd", attn.astype(self.dtype), v.astype(self.dtype),
                         preferred_element_type=jnp.float32)
        # DAL channel gate (`DAL.py:1005-1016`), requires S == T (self/window attn)
        m = jnp.einsum("bhsd,bhse->bhde", q.astype(self.dtype), k.astype(self.dtype),
                       preferred_element_type=jnp.float32)
        alpha = jax.nn.sigmoid(m.mean(axis=(2, 3), keepdims=True)
                               + m.max(axis=(2, 3), keepdims=True))
        out = out * alpha
        out = out.transpose(0, 2, 1, 3).reshape(B, S, C)
        return nn.Dense(C, name="out_proj")(out)


class InterlacedPoolAttention2(nn.Module):
    embed_dim: int
    num_heads: int
    window_size: int = 7
    attn_drop: float = 0.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, y, H: int, W: int, deterministic: bool = True):
        """x, y: (B, N, C) token streams. Returns (B, N, C).

        Layout caveat baked into the reference checkpoints: the reference calls
        `.view(B, C, H, W)` on the CONTIGUOUS (B, N, C) token tensor
        (`multihead_isa_pool_attention.py:150-151`) — a raw row-major reinterpretation,
        NOT a permute — then gates, and `.view(B, H, W, C)`s the product (again raw)
        before windowing. Trained weights encode this scramble, so parity requires
        reproducing it with jnp.reshape (row-major, same semantics as torch .view)."""
        B, N, C = x.shape
        xv = x.reshape(B, C, H, W)  # raw reinterpret, matches reference .view
        yv = y.reshape(B, C, H, W)

        # SpatialAttention runs on the reinterpreted NCHW view; the channel
        # mean/max reduce in that layout directly (channel_axis=1) — no
        # full-tensor transpose just to feed a 2-channel gate (equivalent
        # computation; the r2 trace's layout ops around the gates)
        w0 = SpatialAttention(name="atrous_block1")(xv, channel_axis=1)
        w1 = SpatialAttention(name="atrous_block2")(yv, channel_axis=1)
        lv = jnp.concatenate([w0, w1], axis=-1)
        lv = TorchConv(2, (1, 1), name="weight_levels")(lv)
        lv = jax.nn.softmax(lv, axis=-1)  # (B, H, W, 2)
        xv = xv * lv[..., 0][:, None, :, :]
        yv = yv * lv[..., 1][:, None, :, :]
        # second raw reinterpret (B,C,H,W) -> (B,H,W,C), `:166-167`
        xm = xv.reshape(B, H, W, C)
        ym = yv.reshape(B, H, W, C)

        ws = self.window_size
        # NOTE r5: a stacked variant (one pad+partition over the concatenated
        # (2B, H, W, C) pair) was A/B'd on the v5e and measured NO better
        # (116.2 vs 115.7 tiles/s on config 2, both below the r4-recorded
        # 126.5 — see PERF.md round 5 on the environment delta); keeping the
        # straightforward per-stream form
        xp, orig = window_pad(xm, ws)
        yp, _ = window_pad(ym, ws)
        Hp, Wp = xp.shape[1:3]
        xw = window_partition(xp, ws)
        yw = window_partition(yp, ws)
        out = Mhca(self.embed_dim, self.num_heads, self.attn_drop, dtype=self.dtype,
                   name="attn")(xw, yw, yw, deterministic=deterministic)
        out = window_reverse(out, ws, B, Hp, Wp)
        out = window_depad(out, orig, ws)
        return out.reshape(B, N, C)


class _BNAffineParams(nn.Module):
    """Param holder matching nn.BatchNorm's variable tree (params scale/bias +
    batch_stats mean/var) that returns the folded inference affine (g, shift).
    Lets the fused MlpDWBN path own BN variables without running the op."""

    dim: int

    @nn.compact
    def __call__(self):
        from ..ops.pallas.mlp_dwbn import fold_bn_affine

        scale = self.param("scale", nn.initializers.ones, (self.dim,))
        bias = self.param("bias", nn.initializers.zeros, (self.dim,))
        mean = self.variable("batch_stats", "mean",
                             lambda: jnp.zeros((self.dim,), jnp.float32))
        var = self.variable("batch_stats", "var",
                            lambda: jnp.ones((self.dim,), jnp.float32))
        return fold_bn_affine(scale, bias, mean.value, var.value)


def _dilated3x3_matmul(h, kernel, bias, d, dtype=None):
    """3x3 dilation-d conv (padding d, NHWC, HWIO kernel) as 9 shifted
    (B*H*W, C) @ (C, O) einsums on a once-zero-padded plane. Identical
    taps/weights to `lax.conv_general_dilated`; MXU-tiled matmul layouts end
    to end (no conv-emitter layout churn around the token-form neighbors),
    and autodiff gives shifted-matmul gradients instead of the conv kernel
    grad emitter. Targets `ffn_block.py:207-270`'s dilated branches —
    measured as the dominant GeneralTransformerBlock cost (PERF.md r3)."""
    B, H, W, C = h.shape
    hp = jnp.pad(h, ((0, 0), (d, d), (d, d), (0, 0)))
    if dtype is not None:
        hp = hp.astype(dtype)
        kernel = kernel.astype(dtype)
    acc = None
    for ky in range(3):
        for kx in range(3):
            tap = hp[:, ky * d : ky * d + H, kx * d : kx * d + W, :]
            t = jnp.einsum("bhwc,co->bhwo", tap, kernel[ky, kx],
                           preferred_element_type=jnp.float32)
            acc = t if acc is None else acc + t
    return acc + bias.astype(jnp.float32)


class MlpDWBN(nn.Module):
    hidden_features: int
    out_features: int
    dtype: Any = jnp.float32
    defer_bn_ema: bool = False
    # fused=True routes INFERENCE through the whole-FFN pallas kernel
    # (ops/pallas/mlp_dwbn.py) with an identical parameter tree; train-mode
    # calls always take the XLA path below (BN batch stats need the batch dim).
    fused: bool = False
    # conv_mm=True lowers the two dilated 3x3 branches as shifted MXU matmuls
    # (`_dilated3x3_matmul`) — same params, works in train AND predict, and
    # differentiable (unlike `fused`)
    conv_mm: bool = False

    @nn.compact
    def __call__(self, x, H: int, W: int, train: bool = False):
        """x: (B, N, C) tokens. Returns (B, N, out_features)."""
        B, N, C = x.shape
        if self.fused and not train:
            from ..ops.pallas.mlp_dwbn import fused_mlp_dwbn
            from .mit import _ConvParams

            hid, out = self.hidden_features, self.out_features
            p = {}
            k, p["fc1_bias"] = _ConvParams((1, 1, C, hid), name="fc1")()
            p["fc1_kernel"] = k[0, 0]
            p["bn1_scale"], p["bn1_shift"] = _BNAffineParams(hid, name="norm1")()
            k, b1 = _ConvParams((1, 1, hid, hid), name="dw")()
            p["dw1_kernel"] = k[0, 0]
            p["dw6_kernel"], b6 = _ConvParams((3, 3, hid, hid), name="dw6")()
            p["dw12_kernel"], b12 = _ConvParams((3, 3, hid, hid), name="dw12")()
            p["dw_bias"] = b1 + b6 + b12
            p["bn2_scale"], p["bn2_shift"] = _BNAffineParams(hid, name="norm2")()
            k, p["fc2_bias"] = _ConvParams((1, 1, hid, out), name="fc2")()
            p["fc2_kernel"] = k[0, 0]
            p["bn3_scale"], p["bn3_shift"] = _BNAffineParams(out, name="norm3")()
            return fused_mlp_dwbn(x, p, H=H, W=W, dtype=self.dtype)
        h = x.reshape(B, H, W, C)

        def bn(v, name):
            cls = RawStatBatchNorm if self.defer_bn_ema else nn.BatchNorm
            return cls(use_running_average=not train, momentum=0.9,
                       epsilon=1e-5, name=name)(v)

        h = TorchConv(self.hidden_features, (1, 1), dtype=self.dtype, name="fc1")(h)
        h = bn(h, "norm1")
        h = nn.gelu(h, approximate=False)
        if self.conv_mm:
            from .mit import _ConvParams

            hid = self.hidden_features
            k1, c1 = _ConvParams((1, 1, hid, hid), name="dw")()
            b1 = jnp.einsum("bhwc,co->bhwo", h.astype(self.dtype),
                            k1[0, 0].astype(self.dtype),
                            preferred_element_type=jnp.float32) + c1
            k6, c6 = _ConvParams((3, 3, hid, hid), name="dw6")()
            b6 = _dilated3x3_matmul(h, k6, c6, 6, dtype=self.dtype)
            k12, c12 = _ConvParams((3, 3, hid, hid), name="dw12")()
            b12 = _dilated3x3_matmul(h, k12, c12, 12, dtype=self.dtype)
        else:
            b1 = TorchConv(self.hidden_features, (1, 1), dtype=self.dtype, name="dw")(h)
            b6 = TorchConv(self.hidden_features, (3, 3), padding=(6, 6), dilation=(6, 6),
                           dtype=self.dtype, name="dw6")(h)
            b12 = TorchConv(self.hidden_features, (3, 3), padding=(12, 12), dilation=(12, 12),
                            dtype=self.dtype, name="dw12")(h)
        h = b1 + b6 + b12
        h = bn(h, "norm2")
        h = nn.gelu(h, approximate=False)
        h = TorchConv(self.out_features, (1, 1), dtype=self.dtype, name="fc2")(h)
        h = bn(h, "norm3")
        h = nn.gelu(h, approximate=False)
        return h.reshape(B, N, self.out_features)


class GeneralTransformerBlock(nn.Module):
    """MTFM / Adaptive-TransFusion block. Inputs are NHWC maps (x=summed lower-res
    fusion, y=the high-res branch); output NHWC (`MTFM.py:101-113`)."""

    dim: int
    num_heads: int = 2
    window_size: int = 7
    mlp_ratio: float = 4.0
    drop_path: float = 0.0
    attn_drop: float = 0.0
    dtype: Any = jnp.float32
    defer_bn_ema: bool = False
    fused_mlp: bool = False
    conv_mm: bool = False  # MlpDWBN dilated branches as shifted MXU matmuls

    @nn.compact
    def __call__(self, x, y, train: bool = False):
        B, H, W, C = x.shape
        xt = x.reshape(B, H * W, C)
        yt = y.reshape(B, H * W, C)
        norm1 = nn.LayerNorm(epsilon=1e-6, name="norm1")
        a = InterlacedPoolAttention2(
            self.dim, self.num_heads, self.window_size, self.attn_drop,
            dtype=self.dtype, name="attn",
        )(norm1(xt), norm1(yt), H, W, deterministic=not train)
        xt = xt + DropPath(self.drop_path)(a, deterministic=not train)
        m = MlpDWBN(int(self.dim * self.mlp_ratio), self.dim, dtype=self.dtype,
                    defer_bn_ema=self.defer_bn_ema, fused=self.fused_mlp,
                    conv_mm=self.conv_mm,
                    name="mlp")(nn.LayerNorm(epsilon=1e-6, name="norm2")(xt), H, W, train=train)
        xt = xt + DropPath(self.drop_path)(m, deterministic=not train)
        return xt.reshape(B, H, W, C)


class DALMultiheadAttention(nn.Module):
    """DAL self-attention (`DAL.py:14-343` MultiheadAttention /
    `multihead_isa_attention.py` MHA_): joint in-projection self-attention with the
    optional `residual_attn` logits added before the softmax, and optional Swin-style
    relative-position bias over a window_size x window_size grid (the RPE table the
    reference defines at `multihead_isa_attention.py:28-52`)."""

    embed_dim: int
    num_heads: int
    rpe: bool = False
    window_size: int = 7
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, residual_attn=None, deterministic: bool = True):
        B, S, C = x.shape
        nh, hd = self.num_heads, C // self.num_heads
        qkv = nn.Dense(3 * C, name="in_proj")(x).reshape(B, S, 3, nh, hd)
        q, k, v = [qkv[:, :, i].transpose(0, 2, 1, 3) for i in range(3)]
        logits = jnp.einsum("bhsd,bhtd->bhst", q, k,
                            preferred_element_type=jnp.float32) * (hd ** -0.5)
        if self.rpe:
            ws = self.window_size
            assert S == ws * ws, "rpe requires window-token input"
            table = self.param("relative_position_bias_table",
                               trunc_normal_init(0.02),
                               ((2 * ws - 1) * (2 * ws - 1), nh))
            coords = jnp.stack(jnp.meshgrid(jnp.arange(ws), jnp.arange(ws),
                                            indexing="ij")).reshape(2, -1)
            rel = coords[:, :, None] - coords[:, None, :]
            idx = (rel[0] + ws - 1) * (2 * ws - 1) + (rel[1] + ws - 1)
            bias = table[idx.reshape(-1)].reshape(S, S, nh).transpose(2, 0, 1)
            logits = logits + bias[None]
        if residual_attn is not None:
            logits = logits + residual_attn
        attn = jax.nn.softmax(logits, axis=-1)
        out = jnp.einsum("bhst,bhtd->bhsd", attn, v,
                         preferred_element_type=jnp.float32)
        out = out.transpose(0, 2, 1, 3).reshape(B, S, C)
        return nn.Dense(C, name="out_proj")(out), logits


class Mlp(nn.Module):
    """Plain token MLP (`ffn_block.py:6-29`)."""

    hidden: int
    out: int
    drop: float = 0.0

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        x = nn.Dense(self.hidden, name="fc1")(x)
        x = nn.gelu(x, approximate=False)
        x = nn.Dropout(self.drop)(x, deterministic=deterministic)
        x = nn.Dense(self.out, name="fc2")(x)
        return nn.Dropout(self.drop)(x, deterministic=deterministic)


class MlpDW(nn.Module):
    """1x1 conv -> 3x3 depthwise -> 1x1 conv FFN (`ffn_block.py:52-103`)."""

    hidden: int
    out: int

    @nn.compact
    def __call__(self, x, H: int, W: int, deterministic: bool = True):
        B, N, C = x.shape
        h = x.reshape(B, H, W, C)
        h = TorchConv(self.hidden, (1, 1), name="fc1")(h)
        h = nn.gelu(h, approximate=False)
        h = TorchConv(self.hidden, (3, 3), padding=(1, 1), groups=self.hidden,
                      name="dw3x3")(h)
        h = nn.gelu(h, approximate=False)
        h = TorchConv(self.out, (1, 1), name="fc2")(h)
        return h.reshape(B, N, self.out)


class MultiheadAttention2(nn.Module):
    """`DAL.py:344-675`: separate-projection MHA with optional pre-softmax
    `residual_attn` logits — Mhca's plain sibling WITHOUT the channel gate.
    query/key/value: (B, S, C); residual_attn broadcastable to (B, nh, S, T)."""

    embed_dim: int
    num_heads: int
    dropout: float = 0.0
    use_bias: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, query, key, value, residual_attn=None,
                 deterministic: bool = True):
        B, S, C = query.shape
        nh, hd = self.num_heads, C // self.num_heads
        q = nn.Dense(C, use_bias=self.use_bias, name="q_proj")(query) * (hd ** -0.5)
        k = nn.Dense(C, use_bias=self.use_bias, name="k_proj")(key)
        v = nn.Dense(C, use_bias=self.use_bias, name="v_proj")(value)
        q = q.reshape(B, S, nh, hd).transpose(0, 2, 1, 3)
        k = k.reshape(B, -1, nh, hd).transpose(0, 2, 1, 3)
        v = v.reshape(B, -1, nh, hd).transpose(0, 2, 1, 3)
        logits = jnp.einsum("bhsd,bhtd->bhst", q.astype(self.dtype), k.astype(self.dtype),
                            preferred_element_type=jnp.float32)
        if residual_attn is not None:
            logits = logits + residual_attn
        attn = jax.nn.softmax(logits, axis=-1)
        attn = nn.Dropout(self.dropout)(attn, deterministic=deterministic)
        out = jnp.einsum("bhst,bhtd->bhsd", attn.astype(self.dtype), v.astype(self.dtype),
                         preferred_element_type=jnp.float32)
        out = out.transpose(0, 2, 1, 3).reshape(B, S, C)
        return nn.Dense(C, name="out_proj")(out)


class MlpLight(nn.Module):
    """`ffn_block.py:32-50`: single Linear + act (+dropout) on tokens."""

    dropout: float = 0.0

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        h = nn.Dense(x.shape[-1], name="fc1")(x)
        h = nn.gelu(h, approximate=False)
        return nn.Dropout(self.dropout)(h, deterministic=deterministic)


class MlpConvBN(nn.Module):
    """`ffn_block.py:295-338`: two 1x1 Conv1d+BatchNorm1d blocks over the channel
    axis of (B, N, C) tokens (Conv1d k=1 == Dense; BatchNorm1d over (B, N))."""

    hidden_features: int
    out_features: int
    dropout: float = 0.0

    @nn.compact
    def __call__(self, x, train: bool = False):
        h = nn.Dense(self.hidden_features, name="fc1")(x)
        h = nn.BatchNorm(use_running_average=not train, momentum=0.9, name="bn1")(h)
        h = nn.gelu(h, approximate=False)
        h = nn.Dropout(self.dropout)(h, deterministic=not train)
        h = nn.Dense(self.out_features, name="fc2")(h)
        h = nn.BatchNorm(use_running_average=not train, momentum=0.9, name="bn2")(h)
        return nn.Dropout(self.dropout)(h, deterministic=not train)


def dilated_conv(ch_out: int, k: int, d: int = 1, stride: int = 1, name=None):
    """`ffn_block.py:105-128` DilatedConv: bias-free dilated conv, SAME-ish pad."""
    p = ((k - 1) // 2) * d
    return TorchConv(ch_out, (k, k), stride=(stride, stride), padding=(p, p),
                     dilation=(d, d), use_bias=False, name=name)
