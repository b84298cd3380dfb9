"""Fused (flash) attention Pallas TPU kernel for the MiT spatial-reduction attention
hot path (`mix_transformer.py:94-133`): online-softmax tiling keeps the (N, Nk) score
matrix out of HBM — at 512^2 inputs the stage-4 score tensor alone is
(B, 8, 1024, 1024) fp32 = 268 MB of avoidable traffic per block.

Forward-only (inference path); training falls back to the XLA einsum composition
(which XLA fuses reasonably and differentiates for free). Shapes: q (BH, Nq, D),
k/v (BH, Nk, D); Nq is tiled by `block_q`, K/V live whole in VMEM per (bh) program
(Nk*D <= ~1 MB for every MiT stage).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _flash_fwd_kernel(q_ref, k_ref, v_ref, o_ref, *, scale: float, block_k: int):
    q = q_ref[0].astype(jnp.float32) * scale  # (block_q, D)
    Nk = k_ref.shape[1]
    block_q, D = q.shape

    m = jnp.full((block_q, 1), -jnp.inf, jnp.float32)
    l = jnp.zeros((block_q, 1), jnp.float32)
    acc = jnp.zeros((block_q, D), jnp.float32)

    for kb in range(pl.cdiv(Nk, block_k)):
        k = k_ref[0, kb * block_k : (kb + 1) * block_k, :].astype(jnp.float32)
        v = v_ref[0, kb * block_k : (kb + 1) * block_k, :].astype(jnp.float32)
        s = jnp.dot(q, k.T, preferred_element_type=jnp.float32)  # (block_q, bk)
        m_new = jnp.maximum(m, s.max(axis=-1, keepdims=True))
        p = jnp.exp(s - m_new)
        alpha = jnp.exp(m - m_new)
        l = l * alpha + p.sum(axis=-1, keepdims=True)
        acc = acc * alpha + jnp.dot(p, v, preferred_element_type=jnp.float32)
        m = m_new

    o_ref[0] = (acc / l).astype(o_ref.dtype)


def flash_attention(
    q: jax.Array, k: jax.Array, v: jax.Array, scale: float,
    block_q: int = 256, block_k: int = 256, interpret: bool | None = None,
) -> jax.Array:
    """q (BH, Nq, D); k, v (BH, Nk, D) -> (BH, Nq, D). softmax(q k^T * scale) v with
    the score matrix never materialized in HBM. `interpret=None` auto-selects the
    pallas interpreter on CPU backends (tests / virtual meshes)."""
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    BH, Nq, D = q.shape
    Nk = k.shape[1]
    block_q = min(block_q, Nq)
    block_k = min(block_k, Nk)
    if Nq % block_q or Nk % block_k:
        # shape not tileable: fall back to the XLA composition
        return _xla_attention(q, k, v, scale)

    grid = (BH, Nq // block_q)
    return pl.pallas_call(
        functools.partial(_flash_fwd_kernel, scale=scale, block_k=block_k),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_q, D), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Nk, D), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Nk, D), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, block_q, D), lambda i, j: (i, j, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((BH, Nq, D), q.dtype),
        interpret=interpret,
    )(q, k, v)


def _xla_attention(q, k, v, scale):
    s = jnp.einsum("bnd,bkd->bnk", q.astype(jnp.float32), k.astype(jnp.float32),
                   preferred_element_type=jnp.float32)
    p = jax.nn.softmax(s * scale, axis=-1)
    return jnp.einsum("bnk,bkd->bnd", p, v.astype(jnp.float32),
                      preferred_element_type=jnp.float32).astype(q.dtype)


def mha_flash(q: jax.Array, k: jax.Array, v: jax.Array, scale: float,
              interpret: bool | None = None) -> jax.Array:
    """Multi-head wrapper: q (B, nh, N, D), k/v (B, nh, Nk, D) -> (B, nh, N, D)."""
    B, nh, N, D = q.shape
    Nk = k.shape[2]
    out = flash_attention(
        q.reshape(B * nh, N, D), k.reshape(B * nh, Nk, D), v.reshape(B * nh, Nk, D),
        scale, interpret=interpret,
    )
    return out.reshape(B, nh, N, D)
