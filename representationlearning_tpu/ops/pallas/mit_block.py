"""Fully-fused MiT transformer block (pallas TPU kernel) for inference.

Motivation (PERF.md): the SegFormer-B1 512^2 forward is HBM-bound on stage-1/2
elementwise + normalization traffic — XLA runs LN stats, softmax, GELU and the
DWConv layout flips as separate HBM passes over (16384, 64)/(16384, 256) tensors.
This kernel runs ONE whole encoder block per (batch) program with every
intermediate VMEM-resident:

    y = x + proj(softmax(q(ln1(x)) k(srln(sr(ln1(x))))^T * s) v)        [SRA]
    out = y + fc2(gelu(dwconv3x3(fc1(ln2(y)))))                          [MixFFN]

Semantics match `models.mit.Block` at deterministic=True (no dropout/drop-path),
export_attn=False — the configuration of every non-exporting block in inference
and of stages 1..3 in TSCD (`mix_transformer.py:176-216` reference). The sr
reduction (kernel==stride, zero overlap) is computed as a patch matmul; the 3x3
zero-padded depthwise conv as 9 shifted multiply-adds in VMEM.

`fused_block_reference` is the same math in plain jnp (used on CPU and as the
parity oracle); `fused_block` dispatches kernel-on-TPU / reference-on-CPU.
Matmuls run with bf16 operands + fp32 accumulation when compute_dtype=bfloat16
(the einsum convention of the XLA path); LN/softmax/GELU bookkeeping is fp32.
"""
from __future__ import annotations

import functools
from typing import Any, Mapping

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _ln(x, scale, bias, eps=1e-6):
    x32 = x.astype(jnp.float32)
    mu = x32.mean(axis=-1, keepdims=True)
    var = (x32 * x32).mean(axis=-1, keepdims=True) - mu * mu
    y = (x32 - mu) * jax.lax.rsqrt(var + eps)
    return y * scale.astype(jnp.float32) + bias.astype(jnp.float32)


def _mm(a, b, dtype):
    return jnp.dot(a.astype(dtype), b.astype(dtype),
                   preferred_element_type=jnp.float32)


def _erf(x):
    """Abramowitz-Stegun 7.1.26 rational erf approximation (max abs err 1.5e-7).
    Mosaic has no erf lowering; this keeps the exact-GELU semantics within float
    tolerance and is used in BOTH the kernel and the XLA reference path so the
    two stay bit-comparable."""
    a1, a2, a3, a4, a5 = (0.254829592, -0.284496736, 1.421413741,
                          -1.453152027, 1.061405429)
    p_ = 0.3275911
    s = jnp.sign(x)
    ax = jnp.abs(x)
    t = 1.0 / (1.0 + p_ * ax)
    poly = t * (a1 + t * (a2 + t * (a3 + t * (a4 + t * a5))))
    return s * (1.0 - poly * jnp.exp(-ax * ax))


def _block_math(x, p, *, H, W, sr, nh, dtype, sr_mode="taps", export=False,
                h=None, xs=None):
    """Shared fused-block math on (N, C) arrays (no batch dim). jnp ops only, so
    it runs identically inside the pallas kernel and as the XLA reference.
    With export=True (requires sr == 1) also returns the raw pre-scale attention
    logits (nh, N, N) — the affinity maps the TSCD head consumes
    (`mix_transformer.py:123-133`; no query pooling needed at sr == 1).

    h / xs may be PRECOMPUTED (the pre-sr kernel variant): h = ln1(x) and
    xs = srnorm(srconv(h)) arrive as kernel inputs, computed by XLA outside —
    the sr-as-taps form unrolls into sr^2 tiny (Nk, C)@(C, C) matmuls that
    measured ~2 TF/s at stage-1 geometry (PERF.md round 4), while XLA's strided
    conv emitter handles the same reduction natively."""
    N, C = x.shape
    hd = C // nh
    scale = hd ** -0.5

    if h is None:
        h = _ln(x, p["ln1_scale"], p["ln1_bias"])                 # (N, C) f32
    q = _mm(h, p["q_kernel"], dtype) + p["q_bias"].astype(jnp.float32)

    if xs is not None:
        pass
    elif sr > 1:
        # kernel==stride conv == non-overlapping patch matmul. Two formulations:
        # - "patch": flatten (sr, sr, C) patches and do ONE matmul — fastest
        #   under XLA, but the lane-merging reshape ((.., sr, C) -> sr*sr*C) is
        #   rejected by Mosaic's layout inference for C < 128;
        # - "taps": per-tap accumulation of sr^2 (Nk, C) matmuls — only ever
        #   splits/merges leading (non-lane) dims, so it lowers in the kernel.
        Hs, Ws = H // sr, W // sr
        srk = p["sr_kernel"]  # (sr, sr, C, C) HWIO
        # VALID-stride conv semantics: rows/cols beyond the last full window are
        # dropped (torch Conv2d with kernel==stride), so crop before patching
        h2d = h.reshape(H, W, C)[: Hs * sr, : Ws * sr]
        if sr_mode == "patch":
            hs = h2d.reshape(Hs, sr, Ws, sr, C).transpose(0, 2, 1, 3, 4)
            hs = hs.reshape(Hs * Ws, sr * sr * C)
            xs = _mm(hs, srk.reshape(sr * sr * C, C), dtype)
        elif sr_mode == "kyrow":
            # middle ground between "taps" (sr^2 thin K=C matmuls, ~2 TF/s
            # measured) and "ktile"/"patch" (one deep-K matmul, Mosaic-
            # rejected): per-ky row matmuls with K = sr*C. The only layout op
            # is a CONTIGUOUS (sr, C) -> sr*C lane merge (512 lanes at the
            # stage-1 geometry, vs the sr*sr*C=4096 merge "patch" needs).
            h5 = h2d.reshape(Hs, sr, Ws, sr, C)
            srk2 = srk.reshape(sr, sr * C, C)  # (ky, kx*cin, cout)
            xs = None
            for ky in range(sr):
                a = h5[:, ky].reshape(Hs * Ws, sr * C)
                acc_t = _mm(a, srk2[ky], dtype)
                xs = acc_t if xs is None else xs + acc_t
        elif sr_mode == "ktile":
            # patch matmul via LANE-dim concat of the sr^2 tap columns: ONE
            # (Nk, sr*sr*C) @ (sr*sr*C, C) MXU matmul with a deep K instead of
            # sr^2 thin K=C matmuls (the taps loop measured ~2 TF/s — ~0.5 ms
            # of the 1.97 ms stage-1 kernel pair at the 512^2 headline, r5).
            # Unlike "patch", only concatenation merges into the lane dim
            # (no lane-merging reshape, which Mosaic rejects for C < 128);
            # column order (ky, kx, c) matches the HWIO kernel flatten.
            h5 = h2d.reshape(Hs, sr, Ws, sr, C)
            cols = [h5[:, ky, :, kx, :].reshape(Hs * Ws, C)
                    for ky in range(sr) for kx in range(sr)]
            hs = jnp.concatenate(cols, axis=1)
            xs = _mm(hs, srk.reshape(sr * sr * C, C), dtype)
        else:
            h5 = h2d.reshape(Hs, sr, Ws, sr, C)
            xs = None
            for ky in range(sr):
                for kx in range(sr):
                    term = h5[:, ky, :, kx, :].reshape(Hs * Ws, C)
                    acc_t = _mm(term, srk[ky, kx], dtype)
                    xs = acc_t if xs is None else xs + acc_t
        xs = xs + p["sr_bias"].astype(jnp.float32)
        xs = _ln(xs, p["srnorm_scale"], p["srnorm_bias"])
    else:
        xs = h
    Nk = xs.shape[0]
    kv = _mm(xs, p["kv_kernel"], dtype) + p["kv_bias"].astype(jnp.float32)
    # feature layout of the 2C kv output: f = (i2*nh + head)*hd + d  (torch reshape
    # (Nk, 2, nh, hd)); i2=0 -> k, i2=1 -> v
    k = kv[:, :C]
    v = kv[:, C:]

    outs, logits = [], []
    for head in range(nh):
        sl = slice(head * hd, (head + 1) * hd)
        s_raw = _mm(q[:, sl], k[:, sl].T, dtype)                   # (N, Nk) f32
        if export:
            logits.append(s_raw)
        if Nk == 0:
            # degenerate geometry (input smaller than the sr stride): the XLA
            # Block path contracts over zero keys to a zero output — match it
            # rather than reduce over an empty axis
            outs.append(jnp.zeros((N, hd), jnp.float32))
            continue
        s = s_raw * scale
        m = s.max(axis=-1, keepdims=True)
        e = jnp.exp(s - m)
        a = e / e.sum(axis=-1, keepdims=True)
        outs.append(_mm(a, v[:, sl], dtype))                       # (N, hd)
    o = jnp.concatenate(outs, axis=-1) if nh > 1 else outs[0]
    o = _mm(o, p["proj_kernel"], dtype) + p["proj_bias"].astype(jnp.float32)
    y = x.astype(jnp.float32) + o                                  # residual 1

    f = _ln(y, p["ln2_scale"], p["ln2_bias"])
    f = _mm(f, p["fc1_kernel"], dtype) + p["fc1_bias"].astype(jnp.float32)
    hid = f.shape[-1]
    # 3x3 zero-padded depthwise conv on the (H, W) grid, as 9 shifted MACs
    fi = f.reshape(H, W, hid)
    dw = p["dw_kernel"].astype(jnp.float32)                        # (3, 3, hid)
    acc = jnp.zeros((H, W, hid), jnp.float32)
    for ky in range(3):
        for kx in range(3):
            # cross-correlation: out[i, j] += w[ky, kx] * in[i + ky - 1, j + kx - 1]
            dy, dx = ky - 1, kx - 1
            src = fi[max(0, dy) : H + min(0, dy), max(0, dx) : W + min(0, dx)]
            pad = ((max(0, -dy), max(0, dy)), (max(0, -dx), max(0, dx)), (0, 0))
            acc = acc + jnp.pad(src * dw[ky, kx], pad)
    f = (acc + p["dw_bias"].astype(jnp.float32)).reshape(N, hid)
    f = 0.5 * f * (1.0 + _erf(f * (2.0 ** -0.5)))                  # exact GELU
    f = _mm(f, p["fc2_kernel"], dtype) + p["fc2_bias"].astype(jnp.float32)
    out = y + f                                                    # residual 2
    if export:
        return out, jnp.stack(logits, axis=0)                      # (nh, N, Nk)
    return out


_PARAM_KEYS = (
    "ln1_scale", "ln1_bias", "q_kernel", "q_bias", "sr_kernel", "sr_bias",
    "srnorm_scale", "srnorm_bias", "kv_kernel", "kv_bias", "proj_kernel",
    "proj_bias", "ln2_scale", "ln2_bias", "fc1_kernel", "fc1_bias",
    "dw_kernel", "dw_bias", "fc2_kernel", "fc2_bias",
)


def _param_list(p: Mapping[str, jax.Array], sr: int):
    keys = [k for k in _PARAM_KEYS
            if sr > 1 or not (k.startswith("sr") or k.startswith("srnorm"))]
    return keys, [p[k] for k in keys]


def fused_block_reference(x: jax.Array, p: Mapping[str, jax.Array], *, H: int,
                          W: int, sr: int, nh: int, dtype: Any = jnp.float32,
                          export: bool = False):
    """XLA reference: vmapped fused-block math over the batch dim."""
    fn = functools.partial(_block_math, H=H, W=W, sr=sr, nh=nh, dtype=dtype,
                           sr_mode="patch", export=export)
    if export:
        out, attn = jax.vmap(lambda xb: fn(xb, p))(x)
        return out.astype(x.dtype), attn
    return jax.vmap(lambda xb: fn(xb, p))(x).astype(x.dtype)


def _kernel(*refs, keys, H, W, sr, nh, dtype, export):
    n_out = 2 if export else 1
    x_ref = refs[0]
    p = {k: r[...] for k, r in zip(keys, refs[1 : len(refs) - n_out])}
    res = _block_math(x_ref[0], p, H=H, W=W, sr=sr, nh=nh, dtype=dtype,
                      sr_mode=SR_MODE, export=export)
    if export:
        out_ref, attn_ref = refs[-2], refs[-1]
        out_ref[0] = res[0].astype(out_ref.dtype)
        attn_ref[0] = res[1].astype(attn_ref.dtype)
    else:
        refs[-1][0] = res.astype(refs[-1].dtype)


def _kernel_presr(*refs, keys, H, W, sr, nh, dtype):
    """Kernel variant taking precomputed h = ln1(x) and xs = srnorm(srconv(h))."""
    x_ref, h_ref, xs_ref = refs[0], refs[1], refs[2]
    p = {k: r[...] for k, r in zip(keys, refs[3:-1])}
    res = _block_math(x_ref[0], p, H=H, W=W, sr=sr, nh=nh, dtype=dtype,
                      h=h_ref[0], xs=xs_ref[0])
    refs[-1][0] = res.astype(refs[-1].dtype)


def sr_reduce_xla(x, p, *, H, W, sr, dtype):
    """The fused block's pre-attention reductions as batched XLA ops:
    h = ln1(x) and xs = srnorm(srconv(h) + bias). x (B, N, C) tokens.
    Same math as the in-kernel taps accumulation (bf16 operands, f32 accum),
    but through XLA's strided-conv emitter, which tiles the (sr, sr, C) -> C
    reduction onto the MXU instead of sr^2 thin matmuls."""
    B, N, C = x.shape
    Hs, Ws = H // sr, W // sr
    h = _ln(x, p["ln1_scale"], p["ln1_bias"])                      # (B, N, C) f32
    h2d = h.reshape(B, H, W, C)[:, : Hs * sr, : Ws * sr]
    xs = jax.lax.conv_general_dilated(
        h2d.astype(dtype), p["sr_kernel"].astype(dtype), (sr, sr), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32,
    )
    xs = xs.reshape(B, Hs * Ws, C) + p["sr_bias"].astype(jnp.float32)
    xs = _ln(xs, p["srnorm_scale"], p["srnorm_bias"])
    return h, xs


def fused_block_pallas(x: jax.Array, p: Mapping[str, jax.Array], *, H: int,
                       W: int, sr: int, nh: int, dtype: Any = jnp.float32,
                       export: bool = False, interpret: bool | None = None,
                       h: jax.Array | None = None,
                       xs: jax.Array | None = None):
    """Whole-block pallas kernel: grid over batch, everything VMEM-resident.
    With export=True (sr == 1 only) a second output carries the raw attention
    logits (B, nh, N, N) in f32. With h/xs given (sr > 1), the LN1 + sr-conv
    reductions were computed outside by XLA (`sr_reduce_xla`) and stream in as
    extra inputs — the sr params are then not loaded at all."""
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    B, N, C = x.shape
    pre_sr = xs is not None
    keys, plist = _param_list(p, 1 if pre_sr else sr)

    in_specs = [pl.BlockSpec((1, N, C), lambda b: (b, 0, 0),
                             memory_space=pltpu.VMEM)]
    operands = [x]
    if pre_sr:
        Nk = xs.shape[1]
        in_specs.append(pl.BlockSpec((1, N, C), lambda b: (b, 0, 0),
                                     memory_space=pltpu.VMEM))
        in_specs.append(pl.BlockSpec((1, Nk, C), lambda b: (b, 0, 0),
                                     memory_space=pltpu.VMEM))
        operands += [h, xs]
    for arr in plist:
        in_specs.append(pl.BlockSpec(arr.shape, lambda b, n=arr.ndim: (0,) * n,
                                     memory_space=pltpu.VMEM))
    operands += plist

    out_specs = pl.BlockSpec((1, N, C), lambda b: (b, 0, 0),
                             memory_space=pltpu.VMEM)
    out_shape = jax.ShapeDtypeStruct((B, N, C), x.dtype)
    if export:
        assert sr == 1, "attention export from the kernel requires sr == 1"
        out_specs = (out_specs,
                     pl.BlockSpec((1, nh, N, N), lambda b: (b, 0, 0, 0),
                                  memory_space=pltpu.VMEM))
        out_shape = (out_shape,
                     jax.ShapeDtypeStruct((B, nh, N, N), jnp.float32))

    if pre_sr:
        kern = functools.partial(_kernel_presr, keys=tuple(keys), H=H, W=W,
                                 sr=sr, nh=nh, dtype=dtype)
    else:
        kern = functools.partial(_kernel, keys=tuple(keys), H=H, W=W, sr=sr,
                                 nh=nh, dtype=dtype, export=export)
    return pl.pallas_call(
        kern,
        grid=(B,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024),
        interpret=interpret,
    )(*operands)


_VMEM_BUDGET = 100 * 1024 * 1024


def _vmem_fits(N: int, C: int, hid: int, Nk: int, nh: int = 0,
               export: bool = False) -> bool:
    """Conservative per-program VMEM estimate: live activations (x, ln, q, attn
    out, residuals ~5 N*C f32), FFN hidden x3 (pre/post dwconv, gelu), one
    (N, Nk) score tile per head, the exported (nh, N, N) logit stack when
    exporting, plus slack."""
    est = 5 * N * C * 4 + 3 * N * hid * 4 + N * Nk * 4
    # pre-sr variant streams h (N, C) and xs (Nk, C) in as extra inputs
    est += N * C * 4 + Nk * C * 4
    # ktile sr reduction builds the (Nk, sr*sr*C) tap matrix == N*C floats
    est += N * C * 4
    if export:
        est += nh * N * Nk * 4
    return est <= _VMEM_BUDGET


# In-kernel sr reduction formulation: "taps" (sr^2 thin matmuls, the round-3/4
# form) vs "ktile" (lane-concat + one deep-K matmul). ktile is the right MXU
# shape (the taps loop measures ~2 TF/s) but Mosaic cannot lower the lane-dim
# concatenate of the strided tap slices ("result/input offset mismatch on
# non-concat dimension", offsets {ky mod 8, 64*(kx mod 2)} at C=64) — blocked
# until Mosaic gains a relayout for mismatched concat operands, so default
# stays "taps".
SR_MODE = "taps"

# sr > 1 front-end choice, A/B'd on v5e both ways (PERF.md round 4): the
# in-kernel sr^2-tap reduction wins END-TO-END at both measured geometries
# (headline 512^2 b8: 833.8 vs 802.5 tiles/s; RML 320^2 b16 fused train step:
# 116.8 vs 109.6 img/s) even though the tap loop itself runs at ~2 TF/s — the
# pre-sr XLA front (`sr_reduce_xla`) pays an extra HBM write+read of the h/xs
# streams per block that costs more than the MXU-tiled conv saves.
PRE_SR = False


def fused_block(x: jax.Array, p: Mapping[str, jax.Array], *, H: int, W: int,
                sr: int, nh: int, dtype: Any = jnp.float32,
                export: bool = False):
    """Dispatcher: pallas kernel on TPU when the geometry fits VMEM, XLA
    reference elsewhere (CPU backends, oversized inputs). sr > 1 blocks run
    the in-kernel sr-tap reduction by default (see PRE_SR above)."""
    B, N, C = x.shape
    hid = p["fc1_kernel"].shape[1]
    Nk = (H // sr) * (W // sr) if sr > 1 else N
    if (jax.default_backend() == "tpu"
            and _vmem_fits(N, C, hid, Nk, nh, export)
            and (not export or sr == 1)):
        if sr > 1 and PRE_SR and Nk > 0:
            h, xs = sr_reduce_xla(x, p, H=H, W=W, sr=sr, dtype=dtype)
            return fused_block_pallas(x, p, H=H, W=W, sr=sr, nh=nh,
                                      dtype=dtype, h=h, xs=xs)
        return fused_block_pallas(x, p, H=H, W=W, sr=sr, nh=nh, dtype=dtype,
                                  export=export)
    return fused_block_reference(x, p, H=H, W=W, sr=sr, nh=nh, dtype=dtype,
                                 export=export)


def block_variables_to_fused(bp: Mapping[str, Any]) -> dict:
    """Map a `models.mit.Block` param subtree (variables["params"][...]) to the
    flat dict this kernel consumes. Conv kernels are HWIO; the sr patch-matmul
    flattens (kh, kw, cin) in exactly HWIO order, the depthwise kernel
    (3, 3, 1, hid) squeezes its singleton input dim."""
    a, m = bp["attn"], bp["mlp"]
    p = {
        "ln1_scale": bp["norm1"]["scale"], "ln1_bias": bp["norm1"]["bias"],
        "ln2_scale": bp["norm2"]["scale"], "ln2_bias": bp["norm2"]["bias"],
        "q_kernel": a["q"]["kernel"], "q_bias": a["q"]["bias"],
        "kv_kernel": a["kv"]["kernel"], "kv_bias": a["kv"]["bias"],
        "proj_kernel": a["proj"]["kernel"], "proj_bias": a["proj"]["bias"],
        "fc1_kernel": m["fc1"]["kernel"], "fc1_bias": m["fc1"]["bias"],
        "fc2_kernel": m["fc2"]["kernel"], "fc2_bias": m["fc2"]["bias"],
        "dw_kernel": m["dwconv"]["Conv_0"]["kernel"][:, :, 0, :],
        "dw_bias": m["dwconv"]["Conv_0"]["bias"],
    }
    if "sr" in a:
        p["sr_kernel"] = a["sr"]["kernel"]
        p["sr_bias"] = a["sr"]["bias"]
        p["srnorm_scale"] = a["norm"]["scale"]
        p["srnorm_bias"] = a["norm"]["bias"]
    return p
