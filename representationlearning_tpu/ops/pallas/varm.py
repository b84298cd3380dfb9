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

STATUS (round 1): bit-exact vs `models.refine._propagate` in pallas interpret mode;
the tunneled remote Mosaic compiler crashes on it (HTTP 500 in tpu_compile_helper), so
it is NOT wired into `varm_refine` yet — the streaming XLA path (13.4 ms at the SCD
geometry) remains the default until the kernel can be compiled/profiled on directly
attached hardware.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ...models.refine import _OFFSETS


def _kernel(ref_ref, m_ref, out_ref, scratch, *, dilations, num_iter, H, W, CB, D):
    offsets = [(d, dy, dx) for d in dilations for (dy, dx) in _OFFSETS]

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
        for k, (d, dy, dx) in enumerate(offsets):
            nb = scratch[:, D + dy * d : D + dy * d + H, D + dx * d : D + dx * d + W]
            acc = acc + nb * ref_ref[0, k][None]
        return acc

    m = jax.lax.fori_loop(0, num_iter, lambda i, m: one_iter(m), m_ref[0])
    out_ref[0] = m


def varm_propagate_pallas(
    masks: jax.Array,
    ref: jax.Array,
    dilations: tuple,
    num_iter: int,
    channel_block: int = 8,
    interpret: bool | None = None,
) -> jax.Array:
    """masks (B, H, W, C); ref (B, H, W, K, 1) affinity weights (sum over K per pixel).
    Returns the propagated masks, identical to `models.refine._propagate`."""
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    B, H, W, C = masks.shape
    K = ref.shape[3]
    D = max(dilations)
    CB = min(channel_block, C)
    if C % CB:
        # pad channels so the grid divides evenly (extra channels are zeros)
        padc = (-C) % CB
        masks = jnp.pad(masks, ((0, 0), (0, 0), (0, 0), (0, padc)))
    Cp = masks.shape[-1]

    m_cf = masks.transpose(0, 3, 1, 2)  # (B, C, H, W)
    ref_cf = ref[..., 0].transpose(0, 3, 1, 2)  # (B, K, H, W)

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
        interpret=interpret,
    )(ref_cf, m_cf)

    return out.transpose(0, 2, 3, 1)[..., :C]
