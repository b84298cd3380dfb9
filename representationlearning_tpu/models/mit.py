"""Mix Vision Transformer (SegFormer MiT b0-b5) in flax, TPU-first.

Behavior parity with `SCD-AAAI2023/network/mix_transformer.py`:
- 4-stage hierarchy with overlapping patch embeds (7/3/3/3 kernels, configurable strides,
  default [4,2,2,1] for dense stage 4) (`:219-247`)
- spatial-reduction attention: k/v computed on an sr-strided conv of the tokens,
  sr_ratios [8,4,2,1] (`:94-105`)
- Mix-FFN: Linear -> 3x3 depthwise conv -> GELU -> Linear (`:46-53`, DWConv `:378-390`)
- every block returns its *pre-softmax-scaled* attention logits, average-pooled over the
  (H, W) query grid with window sr x sr when sr>1 so all exported maps share the key
  length (`:123-133`); the TSCD affinity head consumes the last-stage maps.

TPU-first notes: tokens are (B, N, C) contiguous, convs NHWC; attention is einsum-based
so XLA maps it onto the MXU; compute dtype is switchable to bfloat16 via `dtype`.
Variable names use stage{i} / block scopes; torch checkpoints load through
`convert/torch2jax.py` name mapping.
"""
from __future__ import annotations

from dataclasses import field
from typing import Any, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from .layers import DropPath, TorchConv, trunc_normal_init, fan_out_conv_init


class DWConv(nn.Module):
    """3x3 depthwise conv mixing inside the FFN (`mix_transformer.py:378-390`)."""

    dim: int

    @nn.compact
    def __call__(self, x: jax.Array, H: int, W: int) -> jax.Array:
        B, N, C = x.shape
        h = x.reshape(B, H, W, C)
        h = TorchConv(self.dim, (3, 3), padding=(1, 1), groups=self.dim)(h)
        return h.reshape(B, N, C)


class MixFFN(nn.Module):
    hidden: int
    out: int
    drop: float = 0.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, H, W, deterministic: bool = True):
        x = nn.Dense(self.hidden, kernel_init=trunc_normal_init(), name="fc1")(x)
        x = DWConv(self.hidden, name="dwconv")(x, H, W)
        x = nn.gelu(x, approximate=False)
        x = nn.Dropout(self.drop)(x, deterministic=deterministic)
        x = nn.Dense(self.out, kernel_init=trunc_normal_init(), name="fc2")(x)
        x = nn.Dropout(self.drop)(x, deterministic=deterministic)
        return x


class SRAttention(nn.Module):
    """Spatial-reduction attention returning (out, exported attention logits).
    `export_attn=False` skips materializing/pooling the (B, nh, N, Nk) logit tensor —
    a large HBM-traffic saving at high resolution (only the last two stage-4 blocks
    feed the TSCD affinity head, `TSCD_model.py:73`)."""

    dim: int
    num_heads: int
    sr_ratio: int = 1
    qkv_bias: bool = True
    attn_drop: float = 0.0
    proj_drop: float = 0.0
    export_attn: bool = True
    use_flash: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, H, W, deterministic: bool = True):
        B, N, C = x.shape
        nh, hd = self.num_heads, C // self.num_heads
        scale = hd ** -0.5

        q = nn.Dense(C, use_bias=self.qkv_bias, kernel_init=trunc_normal_init(), name="q")(x)
        q = q.reshape(B, N, nh, hd).transpose(0, 2, 1, 3)  # (B, nh, N, hd)

        if self.sr_ratio > 1:
            xs = x.reshape(B, H, W, C)
            xs = TorchConv(
                C, (self.sr_ratio, self.sr_ratio), stride=(self.sr_ratio, self.sr_ratio),
                name="sr",
            )(xs)
            xs = xs.reshape(B, -1, C)
            xs = nn.LayerNorm(epsilon=1e-6, name="norm")(xs)
        else:
            xs = x
        kv = nn.Dense(2 * C, use_bias=self.qkv_bias, kernel_init=trunc_normal_init(), name="kv")(xs)
        Nk = xs.shape[1]
        kv = kv.reshape(B, Nk, 2, nh, hd).transpose(2, 0, 3, 1, 4)
        k, v = kv[0], kv[1]  # (B, nh, Nk, hd)

        if self.use_flash and not self.export_attn and (
            deterministic or self.attn_drop == 0.0
        ):
            # fused flash kernel (fwd + custom_vjp bwd): the (N, Nk) score tensor
            # never hits HBM in either direction. Requires attn_drop == 0 during
            # training (the kernel has no probability dropout; the reference trains
            # with attn_drop 0, `mix_transformer.py:226`).
            from ..ops.pallas.attention import mha_flash

            out = mha_flash(q, k, v, scale)
            out = out.transpose(0, 2, 1, 3).reshape(B, N, C)
            out = nn.Dense(C, kernel_init=trunc_normal_init(), name="proj")(out)
            out = nn.Dropout(self.proj_drop)(out, deterministic=deterministic)
            return out, None

        attn_logits = jnp.einsum(
            "bhnd,bhkd->bhnk", q.astype(self.dtype), k.astype(self.dtype),
            preferred_element_type=jnp.float32,
        )
        attn = jax.nn.softmax(attn_logits * scale, axis=-1)
        attn = nn.Dropout(self.attn_drop)(attn, deterministic=deterministic)
        out = jnp.einsum(
            "bhnk,bhkd->bhnd", attn.astype(self.dtype), v.astype(self.dtype),
            preferred_element_type=jnp.float32,
        )
        out = out.transpose(0, 2, 1, 3).reshape(B, N, C)
        out = nn.Dense(C, kernel_init=trunc_normal_init(), name="proj")(out)
        out = nn.Dropout(self.proj_drop)(out, deterministic=deterministic)

        if not self.export_attn:
            return out, None
        # exported affinity map: raw q@k^T logits pooled over the query grid so the
        # query length matches the key length (`mix_transformer.py:123-133`)
        a = attn_logits.reshape(B, nh, H, W, Nk)
        if self.sr_ratio > 1:
            s = self.sr_ratio
            Hp, Wp = H // s, W // s
            a = a[:, :, : Hp * s, : Wp * s, :]
            a = a.reshape(B, nh, Hp, s, Wp, s, Nk).mean(axis=(3, 5))
        a = a.reshape(B, nh, Nk, Nk)
        return out, a


class Block(nn.Module):
    dim: int
    num_heads: int
    mlp_ratio: float = 4.0
    sr_ratio: int = 1
    qkv_bias: bool = True
    drop: float = 0.0
    attn_drop: float = 0.0
    drop_path: float = 0.0
    export_attn: bool = True
    use_flash: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, H, W, deterministic: bool = True):
        h, attn = SRAttention(
            self.dim, self.num_heads, self.sr_ratio, self.qkv_bias,
            self.attn_drop, self.drop, export_attn=self.export_attn,
            use_flash=self.use_flash, dtype=self.dtype, name="attn",
        )(nn.LayerNorm(epsilon=1e-6, name="norm1")(x), H, W, deterministic)
        x = x + DropPath(self.drop_path)(h, deterministic)
        h = MixFFN(
            int(self.dim * self.mlp_ratio), self.dim, self.drop, dtype=self.dtype, name="mlp",
        )(nn.LayerNorm(epsilon=1e-6, name="norm2")(x), H, W, deterministic)
        x = x + DropPath(self.drop_path)(h, deterministic)
        return x, attn


class _LNParams(nn.Module):
    """Param holder matching nn.LayerNorm's tree (scale, bias)."""

    dim: int

    @nn.compact
    def __call__(self):
        return (self.param("scale", nn.initializers.ones, (self.dim,)),
                self.param("bias", nn.initializers.zeros, (self.dim,)))


class _DenseParams(nn.Module):
    """Param holder matching nn.Dense's tree (kernel, bias)."""

    din: int
    dout: int

    @nn.compact
    def __call__(self):
        return (self.param("kernel", trunc_normal_init(), (self.din, self.dout)),
                self.param("bias", nn.initializers.zeros, (self.dout,)))


class _ConvParams(nn.Module):
    """Param holder matching nn.Conv's tree (HWIO kernel, optional bias)."""

    shape: tuple  # (kh, kw, cin_per_group, cout)
    use_bias: bool = True

    @nn.compact
    def __call__(self):
        kernel = self.param("kernel", fan_out_conv_init(), self.shape)
        if not self.use_bias:
            return kernel, None
        return kernel, self.param("bias", nn.initializers.zeros,
                                  (self.shape[-1],))


class _FusedAttnParams(nn.Module):
    dim: int
    sr_ratio: int

    @nn.compact
    def __call__(self):
        C = self.dim
        p = {}
        p["q_kernel"], p["q_bias"] = _DenseParams(C, C, name="q")()
        if self.sr_ratio > 1:
            p["sr_kernel"], p["sr_bias"] = _ConvParams(
                (self.sr_ratio, self.sr_ratio, C, C), name="sr")()
            p["srnorm_scale"], p["srnorm_bias"] = _LNParams(C, name="norm")()
        p["kv_kernel"], p["kv_bias"] = _DenseParams(C, 2 * C, name="kv")()
        p["proj_kernel"], p["proj_bias"] = _DenseParams(C, C, name="proj")()
        return p


class _FusedMlpParams(nn.Module):
    dim: int
    hidden: int

    @nn.compact
    def __call__(self):
        p = {}
        p["fc1_kernel"], p["fc1_bias"] = _DenseParams(self.dim, self.hidden, name="fc1")()

        class _DW(nn.Module):
            hidden: int

            @nn.compact
            def __call__(self):
                return _ConvParams((3, 3, 1, self.hidden), name="Conv_0")()

        (dwk, dwb) = _DW(self.hidden, name="dwconv")()
        p["dw_kernel"], p["dw_bias"] = dwk[:, :, 0, :], dwb
        p["fc2_kernel"], p["fc2_bias"] = _DenseParams(self.hidden, self.dim, name="fc2")()
        return p


class FusedBlock(nn.Module):
    """Inference-path Block with the SAME parameter tree as `Block` (param-holder
    children mirror nn.Dense/nn.Conv/nn.LayerNorm naming, so checkpoints and
    converters are interchangeable) but whose forward runs as ONE fused pallas
    kernel on TPU (`ops/pallas/mit_block.py`) — LN, SR-attention, residuals,
    MixFFN incl. the 3x3 depthwise conv all VMEM-resident. CPU backends take the
    identical-math XLA reference path. Deterministic-only (no dropout/drop-path).
    export_attn is supported for sr == 1 blocks (the stage-4 affinity exporters,
    `mix_transformer.py:123-133`): a second kernel output carries the raw
    pre-scale attention logits (B, nh, N, N)."""

    dim: int
    num_heads: int
    mlp_ratio: float = 4.0
    sr_ratio: int = 1
    qkv_bias: bool = True
    drop: float = 0.0
    attn_drop: float = 0.0
    drop_path: float = 0.0
    export_attn: bool = False
    use_flash: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, H, W, deterministic: bool = True):
        if not deterministic:
            raise ValueError("FusedBlock is inference-only (deterministic); "
                             "build the model with fused_blocks=False for "
                             "training paths")
        if self.export_attn and self.sr_ratio != 1:
            raise ValueError("FusedBlock attention export requires sr == 1; "
                             "use Block for exporting sr > 1 blocks")
        from ..ops.pallas.mit_block import fused_block

        p = {}
        p["ln1_scale"], p["ln1_bias"] = _LNParams(self.dim, name="norm1")()
        p.update(_FusedAttnParams(self.dim, self.sr_ratio, name="attn")())
        p["ln2_scale"], p["ln2_bias"] = _LNParams(self.dim, name="norm2")()
        p.update(_FusedMlpParams(self.dim, int(self.dim * self.mlp_ratio),
                                 name="mlp")())
        res = fused_block(x, p, H=H, W=W, sr=self.sr_ratio, nh=self.num_heads,
                          dtype=self.dtype, export=self.export_attn)
        return res if self.export_attn else (res, None)


class OverlapPatchEmbed(nn.Module):
    patch_size: int
    stride: int
    embed_dim: int
    dtype: Any = None  # compute dtype of the embed conv (params stay f32)
    s2d: bool = False  # space-to-depth stem lowering; opt-in per geometry:
    # the stem conv in isolation runs at 4 TF/s (Cin=3 starves the MXU) but the
    # s2d reshape/layout measured a 16% END-TO-END headline LOSS at 512^2
    # batch 8 (670.8 vs 799.9 tiles/s, tools/ab_headline.py round 4)
    taps: bool = False  # grouped-taps stem lowering (`ops/image.py::
    # grouped_taps_conv`): the transpose-FREE fix for the same Cin=3 MXU
    # starvation — group-slice einsums over a reshaped (never transposed) view

    @nn.compact
    def __call__(self, x: jax.Array):
        """x NHWC -> tokens (B, N, C), H', W'."""
        p = self.patch_size // 2
        C = x.shape[-1]
        if ((self.s2d or self.taps) and jax.default_backend() == "tpu"
                and self.stride > 1 and C <= 8):
            # RGB stem: space-to-depth / grouped-taps form of the same conv —
            # identical taps/weights, but the MXU contracts s*s*C channels
            # instead of 3 (the stride-4 7x7 stem measured 0.94 ms at 2.6-4
            # TF/s, PERF.md r4/r5)
            from ..ops.image import grouped_taps_conv, space_to_depth_conv

            kernel, bias = _ConvParams(
                (self.patch_size, self.patch_size, C, self.embed_dim),
                name="proj")()
            conv = grouped_taps_conv if self.taps else space_to_depth_conv
            x = conv(x, kernel, bias, stride=self.stride,
                     padding=p, dtype=self.dtype)
        else:
            x = TorchConv(
                self.embed_dim, (self.patch_size, self.patch_size),
                stride=(self.stride, self.stride), padding=(p, p),
                dtype=self.dtype, name="proj",
            )(x)
        B, H, W, C = x.shape
        x = x.reshape(B, H * W, C)
        x = nn.LayerNorm(epsilon=1e-6, name="norm")(x)
        return x, H, W


MIT_CONFIGS = {
    "mit_b0": dict(embed_dims=[32, 64, 160, 256], depths=[2, 2, 2, 2]),
    "mit_b1": dict(embed_dims=[64, 128, 320, 512], depths=[2, 2, 2, 2]),
    "mit_b2": dict(embed_dims=[64, 128, 320, 512], depths=[3, 4, 6, 3]),
    "mit_b3": dict(embed_dims=[64, 128, 320, 512], depths=[3, 4, 18, 3]),
    "mit_b4": dict(embed_dims=[64, 128, 320, 512], depths=[3, 8, 27, 3]),
    "mit_b5": dict(embed_dims=[64, 128, 320, 512], depths=[3, 6, 40, 3]),
}


class MixVisionTransformer(nn.Module):
    """Returns (stage features [NHWC x4], exported attention maps [per block])."""

    embed_dims: Sequence[int] = (64, 128, 320, 512)
    depths: Sequence[int] = (2, 2, 2, 2)
    num_heads: Sequence[int] = (1, 2, 5, 8)
    mlp_ratios: Sequence[float] = (4, 4, 4, 4)
    sr_ratios: Sequence[int] = (8, 4, 2, 1)
    strides: Sequence[int] = (4, 2, 2, 1)
    patch_sizes: Sequence[int] = (7, 3, 3, 3)
    qkv_bias: bool = True
    drop_rate: float = 0.0
    attn_drop_rate: float = 0.0
    drop_path_rate: float = 0.1
    dtype: Any = jnp.float32
    use_flash: bool = False  # pallas fused attention on non-exporting blocks (inference)
    remat: bool = False  # gradient checkpointing per block (the reference's unused
    # with_cp hook, `base_hrnet/hrnet_encoder.py:39-40`, made real: trades recompute
    # for activation memory so bigger crops/batches fit HBM)
    collect_attns: bool | str = "last2"  # True/"all" | "last2" | False/"none"
    fused_blocks: bool = False  # inference: run non-exporting blocks as single fused
    # pallas kernels (see FusedBlock); identical param tree, so the flag can be
    # flipped on any trained/converted checkpoint
    act_dtype: Any = None  # storage dtype of the inter-block residual stream
    # (e.g. jnp.bfloat16). The headline roofline is HBM traffic on the
    # high-resolution activation stream (PERF.md); bf16 residency halves the
    # per-block kernel I/O while LN statistics stay f32 (`_ln` upcasts) and the
    # XLA/exporting blocks — whose MixFFN depthwise conv is the measured bf16
    # pathology — still run on an f32 stream. None = exact f32 residency.
    s2d_stem: bool = False  # space-to-depth stage-1 stem (see OverlapPatchEmbed.s2d)
    taps_stem: bool = False  # grouped-taps stage-1 stem (see OverlapPatchEmbed.taps)

    @nn.compact
    def __call__(self, x: jax.Array, deterministic: bool = True):
        total = sum(self.depths)
        dpr = [self.drop_path_rate * i / max(total - 1, 1) for i in range(total)]
        mode = {True: "all", False: "none"}.get(self.collect_attns, self.collect_attns)
        outs, attns = [], []
        cur = 0
        for s in range(4):
            # NOTE r5: plumbing bf16 compute into the patch-embed convs was
            # A/B'd with the headline trace and showed no gain (the stem conv
            # stayed at 0.94 ms; the extra converts cost ~0.4 ms) — embeds
            # keep f32 compute; OverlapPatchEmbed.dtype remains for callers
            # that want AMP embeds explicitly.
            x, H, W = OverlapPatchEmbed(
                self.patch_sizes[s], self.strides[s], self.embed_dims[s],
                s2d=self.s2d_stem, taps=self.taps_stem,
                name=f"patch_embed{s + 1}",
            )(x)
            for b in range(self.depths[s]):
                want = (mode == "all") or (
                    mode == "last2" and cur + b >= total - 2
                )
                if self.remat:
                    block_cls = nn.remat(Block, static_argnums=(2, 3, 4))
                elif self.fused_blocks and (not want or self.sr_ratios[s] == 1):
                    # NOTE r5: routing the exporting sr==1 blocks to the XLA
                    # path (hoping DCE removes the unused export) was A/B'd
                    # and REJECTED: the export logits share the QK matmul the
                    # block needs anyway, so nothing is saved, and the XLA
                    # stage-4 blocks measured ~2.6 ms vs the kernels' 1.62 ms
                    # (headline 680 vs 905 tiles/s end to end).
                    block_cls = FusedBlock
                else:
                    block_cls = Block
                fused = block_cls is FusedBlock
                if self.act_dtype is not None:
                    # fused kernels take the bf16 stream directly (f32 math
                    # inside); XLA blocks get an f32 stream (bf16-fed depthwise
                    # convs are pathological under XLA's emitter)
                    x = x.astype(self.act_dtype if fused else jnp.float32)
                x, attn = block_cls(
                    self.embed_dims[s], self.num_heads[s], self.mlp_ratios[s],
                    self.sr_ratios[s], self.qkv_bias, self.drop_rate,
                    self.attn_drop_rate, dpr[cur + b], export_attn=want,
                    use_flash=self.use_flash, dtype=self.dtype,
                    name=f"block{s + 1}_{b}",
                )(x, H, W, deterministic)
                if want:
                    attns.append(attn)
            cur += self.depths[s]
            x = nn.LayerNorm(epsilon=1e-6, name=f"norm{s + 1}")(x)
            x = x.reshape(x.shape[0], H, W, self.embed_dims[s])
            outs.append(x)
        return outs, attns


def make_mit(name: str, strides=(4, 2, 2, 1), **kw) -> MixVisionTransformer:
    cfg = dict(MIT_CONFIGS[name])
    cfg.update(strides=tuple(strides), **kw)
    return MixVisionTransformer(**cfg)
