"""Fused RSSFormer MlpDWBN FFN (pallas TPU kernel) for inference.

Motivation (PERF.md round-3 split of driver config 2): the 19.7 ms the
GeneralTransformerBlocks add to the HRNetFusion 512^2 predict is dominated by
`MlpDWBN`'s three full (reference quirk: named "dw" but NOT depthwise, see
`RSSFormer-TIP2023/module/baseline/base_hrnet/modules/ffn_block.py:214-259`)
convolutions — a 1x1 and two dilated 3x3s (d=6, d=12) at hidden=4C channels on
the high-res 128^2 grid — which XLA runs at ~17 TF/s with an HBM round-trip
between each of the ~10 ops (3 convs + 3 BNs + 3 GELUs + 2 pointwise convs).

This kernel runs the WHOLE FFN per (batch) program with every intermediate
VMEM-resident:

    h   = gelu(bn1(fc1(x)))                       # 1x1, C -> hid
    h   = gelu(bn2(dw1(h) + dw6(h) + dw12(h)))    # 1x1 + 3x3 d6 + 3x3 d12
    out = gelu(bn3(fc2(h)))                       # 1x1, hid -> out

The dilated convs are computed as 19 shifted (N, hid) @ (hid, hid) matmuls
against a once-padded (H+2m, W+2m, hid) VMEM plane (m = 12), so the shifts
cost no HBM traffic and every matmul has MXU-friendly K = N = hid (= 128 for
w32). BatchNorms are inference-mode running-stat affines, folded OUTSIDE the
kernel into per-channel scale/shift vectors. Exact GELU uses the same
Abramowitz-Stegun erf approximation as `mit_block.py` (Mosaic has no erf).

`fused_mlp_dwbn_reference` is the same math in plain jnp (CPU path and parity
oracle); `fused_mlp_dwbn` dispatches kernel-on-TPU / reference-elsewhere with
an automatic fallback when the geometry exceeds the VMEM budget. Matmuls run
with bf16 operands + f32 accumulation when dtype=bfloat16 (the TorchConv
convention of the XLA path).
"""
from __future__ import annotations

import functools
from typing import Any, Mapping

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .mit_block import _erf, _mm

# reference dilations (`ffn_block.py`: dw 1x1, dw6 d=6, dw12 d=12)
_DILATIONS = (6, 12)
_MAX_PAD = 3 // 2 * max(_DILATIONS)  # 12


def _gelu(x):
    return 0.5 * x * (1.0 + _erf(x * (2.0 ** -0.5)))


def _mlp_math(x, p, *, H, W, dtype):
    """Shared fused-FFN math on a (N, Cin) array (no batch dim). jnp ops only,
    so it runs identically inside the pallas kernel and as the XLA reference."""
    N, Cin = x.shape
    hid = p["fc1_kernel"].shape[-1]

    h = _mm(x, p["fc1_kernel"], dtype) + p["fc1_bias"].astype(jnp.float32)
    h = h * p["bn1_scale"].astype(jnp.float32) + p["bn1_shift"].astype(jnp.float32)
    h = _gelu(h)

    # 1x1 tap (the reference's mis-named "dw" conv) needs no shift
    acc = _mm(h, p["dw1_kernel"], dtype)
    # dilated 3x3 taps: pad the plane once, then 18 static shifted slices
    m = _MAX_PAD
    hp = jnp.pad(h.reshape(H, W, hid), ((m, m), (m, m), (0, 0)))
    for d, key in zip(_DILATIONS, ("dw6", "dw12")):
        wk = p[f"{key}_kernel"]  # (3, 3, hid, hid) HWIO
        for ky in range(3):
            for kx in range(3):
                # cross-correlation: out[y, x] += in[y + (ky-1)d, x + (kx-1)d] @ w[ky, kx]
                dy, dx = (ky - 1) * d, (kx - 1) * d
                src = jax.lax.slice(hp, (m + dy, m + dx, 0),
                                    (m + dy + H, m + dx + W, hid))
                acc = acc + _mm(src.reshape(N, hid), wk[ky, kx], dtype)
    acc = acc + p["dw_bias"].astype(jnp.float32)  # summed dw1+dw6+dw12 biases
    h = acc * p["bn2_scale"].astype(jnp.float32) + p["bn2_shift"].astype(jnp.float32)
    h = _gelu(h)

    out = _mm(h, p["fc2_kernel"], dtype) + p["fc2_bias"].astype(jnp.float32)
    out = out * p["bn3_scale"].astype(jnp.float32) + p["bn3_shift"].astype(jnp.float32)
    return _gelu(out)


_PARAM_KEYS = (
    "fc1_kernel", "fc1_bias", "bn1_scale", "bn1_shift",
    "dw1_kernel", "dw6_kernel", "dw12_kernel", "dw_bias",
    "bn2_scale", "bn2_shift",
    "fc2_kernel", "fc2_bias", "bn3_scale", "bn3_shift",
)


def fold_bn_affine(scale, bias, mean, var, eps=1e-5):
    """Inference BatchNorm as a per-channel affine: y = x*g + s with
    g = scale/sqrt(var+eps), s = bias - mean*g (float-identical rewrite of
    flax's `_normalize` in f32)."""
    g = scale.astype(jnp.float32) * jax.lax.rsqrt(var.astype(jnp.float32) + eps)
    return g, bias.astype(jnp.float32) - mean.astype(jnp.float32) * g


def fused_mlp_dwbn_reference(x, p: Mapping[str, jax.Array], *, H: int, W: int,
                             dtype: Any = jnp.float32):
    """XLA reference: vmapped fused-FFN math over the batch dim."""
    fn = functools.partial(_mlp_math, H=H, W=W, dtype=dtype)
    return jax.vmap(lambda xb: fn(xb, p))(x).astype(x.dtype)


def _kernel(*refs, keys, H, W, dtype):
    x_ref = refs[0]
    p = {k: r[...] for k, r in zip(keys, refs[1:-1])}
    refs[-1][0] = _mlp_math(x_ref[0], p, H=H, W=W, dtype=dtype).astype(
        refs[-1].dtype)


def fused_mlp_dwbn_pallas(x, p: Mapping[str, jax.Array], *, H: int, W: int,
                          dtype: Any = jnp.float32,
                          interpret: bool | None = None):
    """Whole-FFN pallas kernel: grid over batch, everything VMEM-resident.
    x: (B, N, Cin) tokens with N == H*W; returns (B, N, Cout)."""
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    B, N, Cin = x.shape
    Cout = p["fc2_kernel"].shape[-1]
    plist = [p[k] for k in _PARAM_KEYS]

    in_specs = [pl.BlockSpec((1, N, Cin), lambda b: (b, 0, 0),
                             memory_space=pltpu.VMEM)]
    for arr in plist:
        in_specs.append(pl.BlockSpec(arr.shape, lambda b, n=arr.ndim: (0,) * n,
                                     memory_space=pltpu.VMEM))

    return pl.pallas_call(
        functools.partial(_kernel, keys=_PARAM_KEYS, H=H, W=W, dtype=dtype),
        grid=(B,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, N, Cout), lambda b: (b, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, N, Cout), x.dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024),
        interpret=interpret,
    )(x, *plist)


_VMEM_BUDGET = 100 * 1024 * 1024


def _vmem_fits(H: int, W: int, Cin: int, hid: int, Cout: int) -> bool:
    """Conservative per-program estimate: x, hidden plane, padded plane, the
    accumulator, output, dilated-conv weights, plus slack."""
    N = H * W
    m = _MAX_PAD
    est = (N * Cin * 4 + 2 * N * hid * 4 + (H + 2 * m) * (W + 2 * m) * hid * 4
           + N * Cout * 4 + (2 * 9 + 1) * hid * hid * 4)
    return est <= _VMEM_BUDGET


def fused_mlp_dwbn(x, p: Mapping[str, jax.Array], *, H: int, W: int,
                   dtype: Any = jnp.float32):
    """Dispatcher: pallas kernel on TPU when the geometry fits VMEM, XLA
    reference elsewhere (CPU backends, oversized inputs)."""
    _, _, Cin = x.shape
    hid = p["fc1_kernel"].shape[-1]
    Cout = p["fc2_kernel"].shape[-1]
    if jax.default_backend() == "tpu" and _vmem_fits(H, W, Cin, hid, Cout):
        return fused_mlp_dwbn_pallas(x, p, H=H, W=W, dtype=dtype)
    return fused_mlp_dwbn_reference(x, p, H=H, W=W, dtype=dtype)
