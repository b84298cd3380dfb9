"""Fused (flash) attention Pallas TPU kernels for the MiT spatial-reduction attention
hot path (`mix_transformer.py:94-133`): online-softmax tiling keeps the (N, Nk) score
matrix out of HBM — at 512^2 inputs the stage-4 score tensor alone is
(B, 8, 1024, 1024) fp32 = 268 MB of avoidable traffic per block.

Forward AND backward are fused kernels (custom_vjp), so the training step uses them
too. The backward recomputes the probabilities blockwise from the saved row logsumexp
(standard FlashAttention-2 recipe): per (bh, q-tile) program it emits dq directly and
accumulates dk/dv into a VMEM-resident (Nk, D) block that persists across the
sequentially-iterated q-tile grid dimension.

Shapes: q (BH, Nq, D); k/v (BH, Nk, D). Nq is tiled by `block_q`; K/V live whole in
VMEM per (bh) program (Nk*D <= ~1 MB for every MiT stage). Non-tileable shapes fall
back to the XLA composition (differentiable by AD).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _flash_fwd_kernel(q_ref, k_ref, v_ref, o_ref, lse_ref, *, scale: float,
                      block_k: int):
    # matmul operands stay in the input dtype (bf16 on the fast path) so the MXU
    # runs at its bf16 rate; accumulation and softmax bookkeeping are fp32
    q = q_ref[0]  # (block_q, D)
    Nk = k_ref.shape[1]
    block_q, D = q.shape

    m = jnp.full((block_q, 1), -jnp.inf, jnp.float32)
    l = jnp.zeros((block_q, 1), jnp.float32)
    acc = jnp.zeros((block_q, D), jnp.float32)

    for kb in range(pl.cdiv(Nk, block_k)):
        k = k_ref[0, kb * block_k : (kb + 1) * block_k, :]
        v = v_ref[0, kb * block_k : (kb + 1) * block_k, :]
        s = jnp.dot(q, k.T, preferred_element_type=jnp.float32) * scale
        m_new = jnp.maximum(m, s.max(axis=-1, keepdims=True))
        p = jnp.exp(s - m_new)
        alpha = jnp.exp(m - m_new)
        l = l * alpha + p.sum(axis=-1, keepdims=True)
        acc = acc * alpha + jnp.dot(p.astype(v.dtype), v,
                                    preferred_element_type=jnp.float32)
        m = m_new

    o_ref[0] = (acc / l).astype(o_ref.dtype)
    lse_ref[0] = m + jnp.log(l)  # (block_q, 1)


def _flash_bwd_kernel(q_ref, k_ref, v_ref, o_ref, do_ref, lse_ref,
                      dq_ref, dk_ref, dv_ref, *, scale: float, block_k: int):
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _init():
        dk_ref[0] = jnp.zeros_like(dk_ref[0])
        dv_ref[0] = jnp.zeros_like(dv_ref[0])

    q = q_ref[0]                              # (bq, D), input dtype
    do = do_ref[0]
    o = o_ref[0]
    lse = lse_ref[0]                          # (bq, 1) fp32
    delta = (do.astype(jnp.float32) * o.astype(jnp.float32)).sum(
        axis=-1, keepdims=True)               # (bq, 1)
    Nk = k_ref.shape[1]
    block_q, D = q.shape

    dq = jnp.zeros((block_q, D), jnp.float32)
    for kb in range(pl.cdiv(Nk, block_k)):
        sl = pl.ds(kb * block_k, block_k)
        k = k_ref[0, sl, :]
        v = v_ref[0, sl, :]
        s = jnp.dot(q, k.T, preferred_element_type=jnp.float32) * scale
        p = jnp.exp(s - lse)                              # (bq, bk) fp32
        dp = jnp.dot(do, v.T, preferred_element_type=jnp.float32)
        ds = p * (dp - delta)                             # (bq, bk) fp32
        pq = p.astype(q.dtype)
        dsq = ds.astype(q.dtype)
        dq = dq + scale * jnp.dot(dsq, k, preferred_element_type=jnp.float32)
        dk_ref[0, sl, :] += (scale * jnp.dot(dsq.T, q, preferred_element_type=jnp.float32)
                             ).astype(dk_ref.dtype)
        dv_ref[0, sl, :] += jnp.dot(pq.T, do, preferred_element_type=jnp.float32
                                    ).astype(dv_ref.dtype)
    dq_ref[0] = dq.astype(dq_ref.dtype)


def _tileable(Nq, Nk, block_q, block_k):
    return Nq % min(block_q, Nq) == 0 and Nk % min(block_k, Nk) == 0


def _flash_fwd_call(q, k, v, scale, block_q, block_k, interpret):
    BH, Nq, D = q.shape
    Nk = k.shape[1]
    bq = min(block_q, Nq)
    bk = min(block_k, Nk)
    grid = (BH, Nq // bq)
    return pl.pallas_call(
        functools.partial(_flash_fwd_kernel, scale=scale, block_k=bk),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, bq, D), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Nk, D), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Nk, D), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, bq, D), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bq, 1), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((BH, Nq, D), q.dtype),
            # trailing singleton keeps the block tile-shaped for Mosaic (last two
            # block dims must be (8k, 128k) or equal the array dims)
            jax.ShapeDtypeStruct((BH, Nq, 1), jnp.float32),
        ],
        interpret=interpret,
    )(q, k, v)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6))
def _flash(q, k, v, scale, block_q, block_k, interpret):
    o, _ = _flash_fwd_call(q, k, v, scale, block_q, block_k, interpret)
    return o


def _flash_vjp_fwd(q, k, v, scale, block_q, block_k, interpret):
    o, lse = _flash_fwd_call(q, k, v, scale, block_q, block_k, interpret)
    return o, (q, k, v, o, lse)


def _flash_vjp_bwd(scale, block_q, block_k, interpret, res, do):
    q, k, v, o, lse = res
    BH, Nq, D = q.shape
    Nk = k.shape[1]
    bq = min(block_q, Nq)
    bk = min(block_k, Nk)
    grid = (BH, Nq // bq)
    # dk/dv blocks are indexed by bh only: the q-tile grid axis iterates sequentially
    # on TPU, so the += accumulation into the persistent VMEM block is well-defined.
    dq, dk, dv = pl.pallas_call(
        functools.partial(_flash_bwd_kernel, scale=scale, block_k=bk),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, bq, D), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Nk, D), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Nk, D), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bq, D), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bq, D), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bq, 1), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, bq, D), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Nk, D), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Nk, D), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((BH, Nq, D), q.dtype),
            jax.ShapeDtypeStruct((BH, Nk, D), jnp.float32),
            jax.ShapeDtypeStruct((BH, Nk, D), jnp.float32),
        ],
        interpret=interpret,
    )(q, k, v, o, do, lse)
    return dq, dk.astype(k.dtype), dv.astype(v.dtype)


_flash.defvjp(_flash_vjp_fwd, _flash_vjp_bwd)


def flash_attention(
    q: jax.Array, k: jax.Array, v: jax.Array, scale: float,
    block_q: int = 256, block_k: int = 256, interpret: bool | None = None,
) -> jax.Array:
    """q (BH, Nq, D); k, v (BH, Nk, D) -> (BH, Nq, D). softmax(q k^T * scale) v with
    the score matrix never materialized in HBM; differentiable via fused backward.
    `interpret=None` auto-selects the pallas interpreter on CPU backends."""
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    BH, Nq, D = q.shape
    Nk = k.shape[1]
    if not _tileable(Nq, Nk, block_q, block_k):
        return _xla_attention(q, k, v, scale)  # AD-differentiable fallback
    return _flash(q, k, v, scale, block_q, block_k, interpret)


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
