"""Fused ISA window-attention core (pallas TPU kernel) for RSSFormer.

Motivation (PERF.md round 2): the 7x7 interlaced window attention inside every
HRNetFusion HighResolutionModule is the structural tax of the RSSFormer predict
path — at 512^2 it runs (1444, 2, 49, 49) attentions whose 49x16 matmuls cannot
tile the MXU, with the score/softmax/gate intermediates streamed through HBM in
dozens of tiny badly-laid-out ops (lane dim 32). This kernel runs the whole
attention core — per-head scores, softmax, the DAL channel gate
(`RSSFormer-TIP2023/module/baseline/base_hrnet/modules/DAL.py:1005-1016`) and the
weighted sum — VMEM-resident, CHUNK windows per program.

Layout trick: windows arrive already batched as (NW, T, C) from the window
partition (`rssformer_modules.py::window_partition`), and heads are C/nh lane
slices. Mosaic's layout engine dislikes lane slices at non-tile offsets, so the
per-head matmuls contract the FULL C lanes with the other head's lanes zeroed by
a constant mask:

    S_h   = (q . m_h) @ k^T          == q_h @ k_h^T      (other lanes contribute 0)
    out  += alpha_h * softmax(S_h) @ (v . m_h)
    M     = q^T @ k                  (C, C); head-h gate stats read the (h, h) block

Gradients: `isa_attention_core` is a custom_vjp whose backward re-derives the
core in plain jnp (`_core_reference`) — forward runs the kernel, backward is the
XLA path (rematerialized, no score tensors saved in HBM).

Semantics match `rssformer_modules.Mhca` between the q/k/v projections and the
out projection (q pre-scaled by head_dim^-0.5, dropout-free / deterministic —
the configuration of RSSFormer inference and of training with attn_drop=0, the
reference's shipped config `multihead_isa_pool_attention.py:117-188`).
"""
from __future__ import annotations

import functools
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _core_math(q, k, v, *, nh: int, dtype: Any):
    """Attention core on (W, T, C) window batches; jnp ops only so it runs
    identically inside the pallas kernel and as the XLA reference/backward.
    q is pre-scaled. Returns (W, T, C) f32."""
    W, T, C = q.shape
    hd = C // nh
    q32 = q.astype(jnp.float32)
    k32 = k.astype(jnp.float32)
    v32 = v.astype(jnp.float32)

    # (W, C, C) head-block correlation for the DAL gate: block (h1, h2) holds
    # q_h1^T k_h2; only diagonal blocks are read
    m_full = jax.lax.dot_general(
        q32.astype(dtype), k32.astype(dtype),
        (((1,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )

    # head-lane masks via iota (numpy constants would be captured consts,
    # which pallas_call rejects); 2D iota — Mosaic has no 1D iota
    lanes = jax.lax.broadcasted_iota(jnp.int32, (1, C), 1)
    out = jnp.zeros((W, T, C), jnp.float32)
    for h in range(nh):
        mask = ((lanes >= h * hd) & (lanes < (h + 1) * hd)).astype(jnp.float32)
        qh = q32 * mask[None]
        vh = v32 * mask[None]
        s = jax.lax.dot_general(
            qh.astype(dtype), k32.astype(dtype),
            (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )                                                     # (W, T, T)
        s = s - s.max(axis=-1, keepdims=True)
        e = jnp.exp(s)
        a = e / e.sum(axis=-1, keepdims=True)
        o = jax.lax.dot_general(
            a.astype(dtype), vh.astype(dtype),
            (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )                                                     # (W, T, C)
        rows = jax.lax.broadcasted_iota(jnp.int32, (1, C, C), 1)
        cols = jax.lax.broadcasted_iota(jnp.int32, (1, C, C), 2)
        blk = ((rows // hd == h) & (cols // hd == h)).astype(jnp.float32)
        # two single-axis reductions: Mosaic's layout inference aborts on a
        # fused multi-axis keepdims reduce of the two minor dims
        mh_sum = (m_full * blk).sum(axis=2, keepdims=True).sum(
            axis=1, keepdims=True)
        mh_max = jnp.where(blk > 0, m_full, -jnp.inf).max(
            axis=2, keepdims=True).max(axis=1, keepdims=True)
        alpha = jax.nn.sigmoid(mh_sum / (hd * hd) + mh_max)   # (W, 1, 1)
        out = out + alpha * o
    return out


def _core_reference(q, k, v, *, nh: int, dtype: Any = jnp.float32):
    return _core_math(q, k, v, nh=nh, dtype=dtype).astype(q.dtype)


def _kernel(q_ref, k_ref, v_ref, o_ref, *, nh, dtype):
    o_ref[...] = _core_math(
        q_ref[...], k_ref[...], v_ref[...], nh=nh, dtype=dtype
    ).astype(o_ref.dtype)


def _core_pallas(q, k, v, *, nh: int, dtype: Any, chunk: int = 64,
                 interpret: bool | None = None):
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    NW, T, C = q.shape
    pad = (-NW) % chunk
    if pad:
        # zero windows: softmax of zero scores is uniform, output sliced off
        q, k, v = (jnp.pad(a, ((0, pad), (0, 0), (0, 0))) for a in (q, k, v))
    grid = ((NW + pad) // chunk,)
    spec = pl.BlockSpec((chunk, T, C), lambda i: (i, 0, 0),
                        memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(_kernel, nh=nh, dtype=dtype),
        grid=grid,
        in_specs=[spec, spec, spec],
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct((NW + pad, T, C), q.dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024),
        interpret=interpret,
    )(q, k, v)
    return out[:NW] if pad else out


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def isa_attention_core(q, k, v, nh: int, dtype: Any = jnp.float32):
    """Windowed multi-head attention with the DAL channel gate.

    q, k, v: (NW, T, C) window batches, q pre-scaled by head_dim^-0.5.
    Returns (NW, T, C) — the pre-out_proj attention output.
    Kernel on TPU, jnp reference elsewhere; backward always XLA (rematerialized).
    """
    if jax.default_backend() == "tpu":
        return _core_pallas(q, k, v, nh=nh, dtype=dtype)
    return _core_reference(q, k, v, nh=nh, dtype=dtype)


def _fwd(q, k, v, nh, dtype):
    return isa_attention_core(q, k, v, nh, dtype), (q, k, v)


def _bwd(nh, dtype, res, g):
    q, k, v = res
    _, vjp = jax.vjp(lambda a, b, c: _core_reference(a, b, c, nh=nh, dtype=dtype),
                     q, k, v)
    return vjp(g)


isa_attention_core.defvjp(_fwd, _bwd)
