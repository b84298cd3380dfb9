"""Split par_refine's cost at the RML train geometry (B=32 hi/lo stacked,
160^2 after the reference's down_scale=2, C=21 masks): affinity front vs
propagation loop. Usage: python tools/profile_par.py [B] [HW] [C]

Axon-tunnel methodology (see bench.py): the runtime acks dispatch before
execution, so each timed call is a k-deep chain with a data dependency between
iterations ending in a host fetch; rate = (t(k_long) - t(k_short)) / dk.
"""
from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/rl_tpu_bench_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "2")

import jax
import jax.numpy as jnp
import numpy as np


def chain_time(fn, x, k_short=1, k_long=6):
    """fn: x -> y with y feedable back as x (same shape/dtype)."""

    def run(k):
        y = x
        for _ in range(k):
            y = fn(y)
        return float(jnp.sum(y[0, 0]))

    run(k_short), run(k_long)  # compile both
    diffs = []
    for _ in range(3):
        t0 = time.perf_counter(); run(k_short); ts = time.perf_counter() - t0
        t0 = time.perf_counter(); run(k_long); tl = time.perf_counter() - t0
        diffs.append((tl - ts) / (k_long - k_short))
    return statistics.median(diffs)


def main():
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    HW = int(sys.argv[2]) if len(sys.argv) > 2 else 160
    C = int(sys.argv[3]) if len(sys.argv) > 3 else 21

    from representationlearning_tpu.models import refine as R

    rng = np.random.default_rng(0)
    imgs = jnp.asarray(rng.random((B, HW, HW, 3)) * 255, jnp.float32)
    masks = jnp.asarray(rng.random((B, HW, HW, C)), jnp.float32)
    dil = (1, 2, 4, 8, 12, 24)

    # full par_refine: chain masks through it (output (B,H,W,C) feeds back)
    t_full = chain_time(lambda m: R.par_refine(imgs, m, dil, 10), masks)
    print(f"par_refine full       : {t_full*1e3:8.2f} ms")

    @jax.jit
    def affinity_only(imgs):
        nb = R.dilated_neighbors(imgs, dil)
        center = imgs[:, :, :, None, :]
        aff = -((jnp.abs(nb - center) / (R._unbiased_std(nb, 3) + 1e-8)) / 0.3) ** 2
        aff = aff.mean(axis=-1, keepdims=True)
        pos = R._pos_tensor(dil)
        pos_aff = -((pos / (jnp.std(pos, ddof=1) + 1e-8)) / 0.3) ** 2
        pos_aff = jax.nn.softmax(pos_aff)[None, None, None, :, None]
        return jax.nn.softmax(aff, axis=3) + 0.01 * pos_aff

    ref = affinity_only(imgs)
    # affinity chain: feed ref[..,:3] slice back as the image
    t_aff = chain_time(lambda im: affinity_only(im)[:, :, :, :3, 0] * 255.0, imgs)
    print(f"affinity front (XLA)  : {t_aff*1e3:8.2f} ms")

    prop = jax.jit(lambda m: R.propagate(m, ref, dil, 10))
    t_prop = chain_time(prop, masks)
    print(f"propagate (dispatched): {t_prop*1e3:8.2f} ms")

    xla_prop = jax.jit(lambda m: R._propagate(m, ref, dil, 10))
    t_xprop = chain_time(xla_prop, masks)
    print(f"propagate (XLA path)  : {t_xprop*1e3:8.2f} ms")


if __name__ == "__main__":
    main()
