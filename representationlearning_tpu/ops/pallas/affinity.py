"""Pallas TPU kernel for the VARM/PAR affinity front
(`SCD-AAAI2023/network/VARM.py:40-84`, `RML/network/PAR.py:65-91`).

The XLA path materializes the (B, H, W, K, 3) dilated-neighbor tensor in HBM
(~235 MB at the RML train geometry: B16, 160^2, K=48) and re-reads it for the
std, local-variation and affinity passes — measured as the dominant cost of
`par_refine` once propagation moved to its VMEM-resident kernel (PERF.md round
4). This kernel computes the (K, H, W) affinity weights per batch element
entirely in VMEM from one replicate-padded copy of the 3-channel image:

  pass 1/2: mean and unbiased std over the K neighbors (running sums over the
            K shifted views, lane-dim column slices hoisted per dilation)
  pass 3:   per-tap affinity logits (and, for VARM, the local-variation term —
            whose row/col "next neighbor" shifts are just +1-offset slices of
            the same padded image, with the reference's replicated last
            row/col giving an exact zero diff there)
  epilogue: softmax over K (+ w2 * position softmax for PAR, - w2 * variation
            softmax for VARM)

Output is channel-first (B, K, H, W) — exactly what the propagation kernel
(`varm.py`) consumes, so the weights never round-trip HBM in (B,H,W,K,1) form.
Numerics: same math as `models.refine`, but the K-axis reductions accumulate
sequentially instead of XLA's tree order — agreement is to fp rounding
(~1e-6), not bit-exact.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ...models.refine import _DIST, _OFFSETS

_VMEM_BUDGET = 100 * 1024 * 1024


def _slice_nb(img, d, dy, dx, Dp, H, W):
    """One (3, H, W) neighbor view of the padded (3, Hp, Wp) image."""
    return img[:, Dp + dy * d : Dp + dy * d + H, Dp + dx * d : Dp + dx * d + W]


def _kernel(img_ref, out_ref, aff_sc, tmp_sc, *, dilations, mode, scale, w2,
            pos_sm, H, W, Dp, K):
    img = img_ref[0]  # (3, Hp, Wp)
    center = img[:, Dp : Dp + H, Dp : Dp + W]

    # pass 1: mean over the K neighbors (column slices hoisted per dilation:
    # lane-dim shifts are the expensive relayouts)
    s = jnp.zeros((3, H, W), jnp.float32)
    for d in dilations:
        cols = {dx: img[:, :, Dp + dx * d : Dp + dx * d + W] for dx in (-1, 0, 1)}
        for (dy, dx) in _OFFSETS:
            s = s + cols[dx][:, Dp + dy * d : Dp + dy * d + H, :]
    mean = s * (1.0 / K)

    # pass 2: unbiased variance (ddof=1, same formula as jnp.std)
    v = jnp.zeros((3, H, W), jnp.float32)
    for d in dilations:
        cols = {dx: img[:, :, Dp + dx * d : Dp + dx * d + W] for dx in (-1, 0, 1)}
        for (dy, dx) in _OFFSETS:
            diff = cols[dx][:, Dp + dy * d : Dp + dy * d + H, :] - mean
            v = v + diff * diff
    inv = scale / (jnp.sqrt(v * (1.0 / (K - 1))) + 1e-8)  # (3, H, W)

    # pass 3: per-tap affinity logits (and VARM's local-variation term)
    row = jax.lax.broadcasted_iota(jnp.int32, (3, H, W), 1)
    col = jax.lax.broadcasted_iota(jnp.int32, (3, H, W), 2)
    k = 0
    for d in dilations:
        cols = {dx: img[:, :, Dp + dx * d : Dp + dx * d + W] for dx in (-1, 0, 1)}
        colsp = {dx: img[:, :, Dp + dx * d + 1 : Dp + dx * d + 1 + W]
                 for dx in (-1, 0, 1)} if mode == "varm" else None
        for (dy, dx) in _OFFSETS:
            nb = cols[dx][:, Dp + dy * d : Dp + dy * d + H, :]
            a = jnp.abs(nb - center) * inv
            aff_sc[k] = -(a * a).mean(axis=0)
            if mode == "varm":
                # t1/t2 (`VARM.py:66-70`): the neighbor tensor shifted one
                # OUTPUT row/col with the last one replicated -> +1-offset
                # slices of the padded image, zero diff at the replicated edge
                t1 = cols[dx][:, Dp + dy * d + 1 : Dp + dy * d + 1 + H, :]
                d1 = jnp.where(row == H - 1, 0.0, nb - t1)
                t2 = colsp[dx][:, Dp + dy * d : Dp + dy * d + H, :]
                d2 = jnp.where(col == W - 1, 0.0, nb - t2)
                tmp_sc[k] = (d1 * d1 + d2 * d2).mean(axis=0)
            k += 1

    # epilogue: softmax over K (+/- the mode's extra term)
    a = aff_sc[...]  # (K, H, W)
    e = jnp.exp(a - jnp.max(a, axis=0, keepdims=True))
    r = e / jnp.sum(e, axis=0, keepdims=True)
    if mode == "par":
        # per-k immediate-scalar adds: a captured (K,) constant array is not
        # allowed in a pallas kernel, and K is small
        for kk in range(K):
            out_ref[0, kk] = r[kk] + w2 * float(pos_sm[kk])
        return
    if mode == "varm":
        t = tmp_sc[...]
        et = jnp.exp(t - jnp.max(t, axis=0, keepdims=True))
        r = r - w2 * (et / jnp.sum(et, axis=0, keepdims=True))
    out_ref[0] = r


def _pos_softmax(dilations, w1) -> tuple:
    """PAR's position-affinity softmax (`PAR.py:49-63`): a K-vector constant."""
    pos = np.concatenate([_DIST * d for d in dilations]).astype(np.float64)
    pa = -((pos / (pos.std(ddof=1) + 1e-8)) / w1) ** 2
    ex = np.exp(pa - pa.max())
    return tuple((ex / ex.sum()).astype(np.float32).tolist())


def _vmem_estimate(H, W, K, D, mode) -> int:
    Hp, Wp = H + 2 * (D + 1), W + 2 * (D + 1)
    img = 3 * Hp * Wp * 4
    out = K * H * W * 4
    # pallas double-buffers the in/out blocks across grid steps (ADVICE r4:
    # the estimate must include that or a new geometry can commit to the fused
    # path and then fail at Mosaic compile time with no XLA fallback)
    io = 2 * (img + out)
    bufs = (3 if mode != "varm" else 6) * K * H * W * 4  # aff(+tmp) + softmax temps
    stack = (K + 6) * 3 * H * W * 4  # live unrolled neighbor views
    return io + bufs + stack


def affinity_fits(H, W, K, D, mode, budget: int = _VMEM_BUDGET) -> bool:
    return _vmem_estimate(H, W, K, D, mode) <= budget


def affinity_pallas(
    imgs: jax.Array,
    dilations: tuple,
    mode: str,
    w1: float = 0.3,
    w2: float = 0.01,
    interpret: bool | None = None,
) -> jax.Array:
    """imgs (B, H, W, 3) -> affinity weights (B, K, H, W), channel-first.

    mode: "par" (std norm / w1, + w2 * position softmax), "pamr" (std norm /
    w1), "varm" (std norm * 4 sharpness, - w2 * variation softmax).
    """
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    B, H, W, C = imgs.shape
    assert C == 3, imgs.shape
    K = 8 * len(dilations)
    D = max(dilations)
    Dp = D + 1  # +1 so the variation term's shifted slices stay in bounds
    scale = 4.0 if mode == "varm" else 1.0 / w1
    pos_sm = _pos_softmax(dilations, w1) if mode == "par" else tuple()

    img_cf = imgs.transpose(0, 3, 1, 2)  # (B, 3, H, W)
    img_p = jnp.pad(img_cf, ((0, 0), (0, 0), (Dp, Dp), (Dp, Dp)), mode="edge")
    Hp, Wp = img_p.shape[2], img_p.shape[3]

    return pl.pallas_call(
        functools.partial(
            _kernel, dilations=tuple(dilations), mode=mode, scale=scale,
            w2=w2, pos_sm=pos_sm, H=H, W=W, Dp=Dp, K=K,
        ),
        grid=(B,),
        in_specs=[pl.BlockSpec((1, 3, Hp, Wp), lambda b: (b, 0, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, K, H, W), lambda b: (b, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, K, H, W), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((K, H, W), jnp.float32),
            pltpu.VMEM((K, H, W) if mode == "varm" else (1, 1, 1), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_BUDGET + 8 * 1024 * 1024),
        interpret=interpret,
    )(img_p)
