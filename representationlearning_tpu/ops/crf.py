"""DenseCRF mean-field inference — TPU-native replacement for the pydensecrf wrappers
(`SCD-AAAI2023/utils/dcrf.py:7-68`, `WaveCAM-TMM2023/misc/imutils.py:156-169`).

Fully-connected CRF with Potts compatibility and two Gaussian pairwise kernels
(spatial sxy + bilateral sxy/srgb), solved by mean-field iteration:
    Q <- softmax(-U + sum_m w_m * (k_m (x) Q - Q))
with symmetrically-normalized kernels (pydensecrf NORMALIZE_SYMMETRIC) and the
self-interaction subtracted. The bilateral message uses the bilateral grid
(`ops/bilateral.py`); the spatial message is a separable Gaussian blur. This replaces
the C++ permutohedral backend with on-device XLA ops (the reference runs CRF on CPU
as post-processing; here it can run on-TPU and batched).

Default parameter sets mirror the reference:
- `crf_inference`        : softmax unary, Gaussian sxy=3 compat=3, bilateral sxy=80
                           srgb=13 compat=10 (`dcrf.py:7-24`)
- `crf_inference_label`  : label unary (gt_prob .7), Gaussian sxy=3 compat=3, bilateral
                           sxy=50 srgb=5 compat=10 (`dcrf.py:26-40`, `imutils.py:156`)
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from .bilateral import bilateral_filter_batch, bilateral_filter_grid


def _gaussian_blur_2d(x: jax.Array, sigma: float) -> jax.Array:
    """Separable spatial Gaussian on (H, W, C), truncated at 3 sigma."""
    r = max(1, int(np.ceil(3 * sigma)))
    taps = np.exp(-0.5 * (np.arange(-r, r + 1) / sigma) ** 2).astype(np.float32)

    def blur_axis(a, axis):
        acc = taps[r] * a
        for t in range(1, r + 1):
            widths = [(0, 0)] * a.ndim
            widths[axis] = (t, 0)
            fwd = jnp.pad(a, widths)[tuple(
                slice(None, -t) if i == axis else slice(None) for i in range(a.ndim)
            )]
            widths[axis] = (0, t)
            bwd = jnp.pad(a, widths)[tuple(
                slice(t, None) if i == axis else slice(None) for i in range(a.ndim)
            )]
            acc = acc + taps[r + t] * (fwd + bwd)
        return acc

    return blur_axis(blur_axis(x, 0), 1)


def _sym_normalize(filter_fn, x):
    """Symmetric kernel normalization: x -> D^-1/2 K (D^-1/2 x), D = K 1."""
    ones = jnp.ones(x.shape[:-1] + (1,), x.dtype)
    norm = jax.lax.rsqrt(jnp.clip(filter_fn(ones), 1e-20, None))
    return filter_fn(x * norm) * norm


@partial(jax.jit, static_argnames=("t", "sxy_g", "compat_g", "sxy_b", "srgb_b",
                                   "compat_b", "method"))
def mean_field_inference(
    image: jax.Array,
    unary: jax.Array,
    t: int = 10,
    sxy_g: float = 3.0,
    compat_g: float = 3.0,
    sxy_b: float = 80.0,
    srgb_b: float = 13.0,
    compat_b: float = 10.0,
    method: str = "grid",
) -> jax.Array:
    """image (H,W,3) uint8-range RGB; unary (H,W,C) negative log probabilities.
    Returns Q (H,W,C).

    `method` selects the bilateral message backend (same knob as the DenseEnergy
    loss, `losses/energy.py`): "grid" = on-device bilateral grid (default),
    "native" = the exact C++ permutohedral lattice via host callback — the
    backend family pydensecrf itself uses (`utils/dcrf.py:7-40`), "brute" =
    exact O(N^2) Gaussian (tiny images/tests). The symmetric kernel
    normalization cancels any constant amplitude gain between backends, so they
    differ only in approximation error."""
    g_fn = lambda v: _gaussian_blur_2d(v, sxy_g)
    if method == "grid":
        b_fn = lambda v: bilateral_filter_grid(image, v, srgb_b, sxy_b)
    else:
        b_fn = lambda v: bilateral_filter_batch(
            image[None], v[None], srgb_b, sxy_b, method=method)[0]

    Q = jax.nn.softmax(-unary, axis=-1)

    def step(Q, _):
        # self-interaction is deliberately NOT subtracted: the k(x_i, x_i) Q_i term acts
        # as damping and keeps the fixed-point iteration stable (subtracting it makes
        # strong compat weights oscillate around boundaries).
        msg = compat_g * _sym_normalize(g_fn, Q) + compat_b * _sym_normalize(b_fn, Q)
        return jax.nn.softmax(-unary + msg, axis=-1), None

    Q, _ = jax.lax.scan(step, Q, None, length=t)
    return Q


def unary_from_softmax(probs: jax.Array, clip: float = 1e-8) -> jax.Array:
    return -jnp.log(jnp.clip(probs, clip, None))


def unary_from_labels(labels: jax.Array, n_labels: int, gt_prob: float = 0.7) -> jax.Array:
    """(H,W) int labels -> (H,W,C) unary; zero_unsure=False semantics (all labels are
    confident)."""
    p_other = (1.0 - gt_prob) / max(n_labels - 1, 1)
    onehot = jax.nn.one_hot(labels, n_labels)
    probs = onehot * gt_prob + (1.0 - onehot) * p_other
    return -jnp.log(probs)


def crf_inference(img: np.ndarray, probs: np.ndarray, t: int = 10,
                  scale_factor: float = 1.0, labels: int = 21,
                  method: str = "grid") -> np.ndarray:
    """`dcrf.py:7-24`: probs (C,H,W) softmax -> refined probs (C,H,W)."""
    u = unary_from_softmax(jnp.asarray(probs).transpose(1, 2, 0))
    Q = mean_field_inference(
        jnp.asarray(img, jnp.float32), u, t=t,
        sxy_g=3.0 / scale_factor, compat_g=3.0,
        sxy_b=80.0 / scale_factor, srgb_b=13.0, compat_b=10.0, method=method,
    )
    return np.asarray(Q.transpose(2, 0, 1))


def crf_inference_label(img: np.ndarray, labels_map: np.ndarray, t: int = 10,
                        n_labels: int = 21, gt_prob: float = 0.7,
                        method: str = "grid") -> np.ndarray:
    """`dcrf.py:26-40` / `imutils.py:156-169`: hard-label unary -> refined argmax."""
    u = unary_from_labels(jnp.asarray(labels_map), n_labels, gt_prob)
    Q = mean_field_inference(
        jnp.asarray(img, jnp.float32), u, t=t,
        sxy_g=3.0, compat_g=3.0, sxy_b=50.0, srgb_b=5.0, compat_b=10.0,
        method=method,
    )
    return np.asarray(Q.argmax(-1))


class DenseCRF:
    """Parameterized wrapper (`dcrf.py:42-68`)."""

    def __init__(self, iter_max, pos_w, pos_xy_std, bi_w, bi_xy_std, bi_rgb_std,
                 method: str = "grid"):
        self.iter_max = iter_max
        self.pos_w = pos_w
        self.pos_xy_std = pos_xy_std
        self.bi_w = bi_w
        self.bi_xy_std = bi_xy_std
        self.bi_rgb_std = bi_rgb_std
        self.method = method

    def __call__(self, image: np.ndarray, probmap: np.ndarray) -> np.ndarray:
        u = unary_from_softmax(jnp.asarray(probmap).transpose(1, 2, 0))
        Q = mean_field_inference(
            jnp.asarray(image, jnp.float32), u, t=self.iter_max,
            sxy_g=self.pos_xy_std, compat_g=self.pos_w,
            sxy_b=self.bi_xy_std, srgb_b=self.bi_rgb_std, compat_b=self.bi_w,
            method=self.method,
        )
        return np.asarray(Q.transpose(2, 0, 1))
