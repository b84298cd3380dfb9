"""Profile the headline config (TSCD/SegFormer-B1 512^2 predict): rate + optional
xplane trace. Usage: python tools/profile_headline.py [batch] [--trace DIR]
[--no-fused] [--act-dtype bf16]
"""
from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/rl_tpu_bench_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "2")

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("batch", type=int, default=8, nargs="?")
    ap.add_argument("--trace", default=None)
    ap.add_argument("--no-fused", action="store_true")
    ap.add_argument("--act-dtype", default=None, choices=[None, "bf16"])
    ap.add_argument("--s2d", action="store_true",
                    help="space-to-depth stem (r5: the folded conv now lowers "
                         "as shifted-einsum MXU taps — re-test the r4 loss)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from representationlearning_tpu.models.tscd import TSCD

    batch = args.batch
    kw = {}
    if args.act_dtype == "bf16":
        kw["act_dtype"] = jnp.bfloat16
    model = TSCD(backbone="mit_b1", num_classes=21, dtype=jnp.bfloat16,
                 fused_blocks=not args.no_fused, s2d_stem=args.s2d, **kw)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((batch, 512, 512, 3)), jnp.float32)
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), x[:1])

    def fwd(v, x):
        return model.apply(v, x)[1].mean().astype(jnp.float32)

    @jax.jit
    def chained(v, x, k):
        return jax.lax.fori_loop(
            0, k, lambda i, c: fwd(v, x + c * 1e-12), jnp.float32(0.0))

    t0 = time.perf_counter()
    float(chained(variables, x, 1))
    print(f"compile: {time.perf_counter()-t0:.1f}s", file=sys.stderr)

    import statistics
    diffs = []
    for _ in range(3):
        t0 = time.perf_counter(); float(chained(variables, x, 1)); ts = time.perf_counter() - t0
        t0 = time.perf_counter(); float(chained(variables, x, 11)); tl = time.perf_counter() - t0
        diffs.append((tl - ts) / 10)
    sec = statistics.median(diffs)
    print(f"batch={batch} fused={not args.no_fused} act={args.act_dtype}: "
          f"{sec*1000:.2f} ms/call, {batch/sec:.1f} tiles/s")

    if args.trace:
        with jax.profiler.trace(args.trace):
            float(chained(variables, x, 5))
        print(f"trace written to {args.trace}", file=sys.stderr)


if __name__ == "__main__":
    main()
