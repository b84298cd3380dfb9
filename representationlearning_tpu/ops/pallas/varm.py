"""Pallas TPU kernel for the VARM/PAR mask-propagation loop
(`SCD-AAAI2023/network/VARM.py:86-89`: 10 iterations of a 48-neighbor dilated
weighted sum).

The XLA path streams 48 shifted reads of the masks from HBM per iteration; this kernel
keeps the masks resident in VMEM across ALL iterations (only the per-pixel affinity
weights stream in once per (batch, channel-block) program), turning the propagation
from HBM-bandwidth-bound into VPU-bound.

Grid: (B, C/CB). Per program: ref (K, H, W) + a replicate-padded masks scratch
(CB, H+2D, W+2D); each iteration refreshes the pad borders and accumulates the K
statically-sliced neighbor windows.

STATUS (round 2): compiles and runs on real v5e hardware (the round-1 Mosaic crash was
a 16 MiB scoped-VMEM stack overflow — the 48 unrolled neighbor reads stay live on the
Mosaic stack; fixed by raising `vmem_limit_bytes` and sizing the channel block to the
budget). Bit-exact vs `models.refine._propagate` on TPU and in interpret mode, and
2.4x faster at the SCD geometry (6.0 ms vs 14.4 ms for B4 160^2x21, 10 iters).
Wired as the default propagation on TPU backends via `models.refine.propagate`;
geometries whose minimum footprint exceeds the VMEM budget fall back to the XLA path
(`pick_channel_block` returns None).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ...models.refine import _OFFSETS


def _kernel(ref_ref, m_ref, out_ref, scratch, *, dilations, num_iter, H, W, CB, D):
    def one_iter(m):
        # refresh the replicate-padded scratch from the current masks
        scratch[:, D : D + H, D : D + W] = m
        scratch[:, 0:D, D : D + W] = jnp.broadcast_to(m[:, 0:1, :], (CB, D, W))
        scratch[:, D + H : 2 * D + H, D : D + W] = jnp.broadcast_to(
            m[:, H - 1 : H, :], (CB, D, W)
        )
        # left/right fills read the already-padded rows so corners replicate correctly
        scratch[:, :, 0:D] = jnp.broadcast_to(
            scratch[:, :, D : D + 1], (CB, H + 2 * D, D)
        )
        scratch[:, :, D + W : 2 * D + W] = jnp.broadcast_to(
            scratch[:, :, D + W - 1 : D + W], (CB, H + 2 * D, D)
        )
        acc = jnp.zeros((CB, H, W), jnp.float32)
        k = 0
        for d in dilations:
            # hoist the three W-column slices per dilation: lane-dimension
            # (minor-most) shifts are the expensive relayouts — 8 per dilation
            # as per-tap slices, 3 when shared across the dy taps. Accumulation
            # order over k is unchanged (bit-exact vs the XLA path).
            cols = {dx: scratch[:, :, D + dx * d : D + dx * d + W]
                    for dx in (-1, 0, 1)}
            for (dy, dx) in _OFFSETS:
                nb = cols[dx][:, D + dy * d : D + dy * d + H, :]
                acc = acc + nb * ref_ref[0, k][None]
                k += 1
        return acc

    m = jax.lax.fori_loop(0, num_iter, lambda i, m: one_iter(m), m_ref[0])
    out_ref[0] = m


# VMEM budget for one program: Mosaic keeps the K unrolled neighbor-window reads
# (each CB*H*W f32) live on its scratch stack, plus the affinity block (K*H*W), the
# replicate-padded scratch, and the in/out mask blocks. v5e has 128 MiB VMEM/core.
_VMEM_BUDGET = 100 * 1024 * 1024


def _vmem_estimate(cb: int, H: int, W: int, K: int, D: int) -> int:
    stack = (K + 4) * cb * H * W * 4  # K live windows + acc/slack
    fixed = K * H * W * 4 + cb * (H + 2 * D) * (W + 2 * D) * 4 + 2 * cb * H * W * 4
    return stack + fixed


def pick_channel_block(C: int, H: int, W: int, K: int, D: int,
                       budget: int = _VMEM_BUDGET) -> int | None:
    """Largest channel block (<= 8) whose VMEM footprint fits the budget; None if
    even a single channel does not fit (caller falls back to the XLA path)."""
    for cb in range(min(C, 8), 0, -1):
        if _vmem_estimate(cb, H, W, K, D) <= budget:
            return cb
    return None


def varm_propagate_pallas(
    masks: jax.Array,
    ref: jax.Array,
    dilations: tuple,
    num_iter: int,
    channel_block: int | None = None,
    interpret: bool | None = None,
) -> jax.Array:
    """masks (B, H, W, C); ref (B, H, W, K, 1) affinity weights (sum over K per
    pixel), or channel-first (B, K, H, W) as produced by the fused affinity
    kernel (`affinity.py`). Returns the propagated masks, identical to
    `models.refine._propagate`."""
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    B, H, W, C = masks.shape
    K = ref.shape[1] if ref.ndim == 4 else ref.shape[3]
    D = max(dilations)
    if channel_block is None:
        channel_block = pick_channel_block(C, H, W, K, D)
        if channel_block is None:
            raise ValueError(
                f"VARM geometry {H}x{W} K={K} exceeds the VMEM budget even at "
                "channel_block=1; use the XLA propagation path")
    CB = min(channel_block, C)
    if C % CB:
        # pad channels so the grid divides evenly (extra channels are zeros)
        padc = (-C) % CB
        masks = jnp.pad(masks, ((0, 0), (0, 0), (0, 0), (0, padc)))
    Cp = masks.shape[-1]

    m_cf = masks.transpose(0, 3, 1, 2)  # (B, C, H, W)
    ref_cf = ref if ref.ndim == 4 else ref[..., 0].transpose(0, 3, 1, 2)

    out = pl.pallas_call(
        functools.partial(
            _kernel, dilations=tuple(dilations), num_iter=num_iter,
            H=H, W=W, CB=CB, D=D,
        ),
        grid=(B, Cp // CB),
        in_specs=[
            pl.BlockSpec((1, K, H, W), lambda b, c: (b, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, CB, H, W), lambda b, c: (b, c, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, CB, H, W), lambda b, c: (b, c, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, Cp, H, W), jnp.float32),
        scratch_shapes=[pltpu.VMEM((CB, H + 2 * D, W + 2 * D), jnp.float32)],
        # the K unrolled neighbor-window reads keep ~CB*H*W temporaries live on the
        # Mosaic stack; the default 16 MiB scoped-vmem limit is too small at SCD
        # geometry, so raise it to the budget the channel block was sized for
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM_BUDGET + (
            8 * 1024 * 1024)),
        interpret=interpret,
    )(ref_cf, m_cf)

    return out.transpose(0, 2, 3, 1)[..., :C]
