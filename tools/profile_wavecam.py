"""Profile driver config 1 (WaveCAM ResNet-50 CAM flip pair).
Usage: python tools/profile_wavecam.py [batch] [--trace DIR]
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
    ap.add_argument("--s2d", action="store_true", help="space-to-depth ResNet stem")
    ap.add_argument("--f32", action="store_true",
                    help="f32 convs (the pre-round-5 behavior: Net(dtype=bf16) "
                         "never reached the Bottleneck convs)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from representationlearning_tpu.models.resnet import Net

    batch = args.batch
    model = Net(n_classes=20,
                dtype=jnp.float32 if args.f32 else jnp.bfloat16,
                s2d_stem=args.s2d)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((batch, 512, 512, 3)), jnp.float32)
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), x[:1])

    def cam_fwd(v, x):
        b = x.shape[0]
        cc = model.apply(v, jnp.concatenate([x, x[:, :, ::-1]], axis=0),
                         method=model.cam)
        cam = jnp.maximum(cc[:b], 0) + jnp.maximum(cc[b:], 0)[:, :, ::-1]
        return cam.mean().astype(jnp.float32)

    @jax.jit
    def chained(v, x, k):
        return jax.lax.fori_loop(
            0, k, lambda i, c: cam_fwd(v, x + c * 1e-12), jnp.float32(0.0))

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
    print(f"batch={batch} s2d={args.s2d}: {sec*1000:.2f} ms/call, "
          f"{batch/sec:.1f} CAMs/s")

    if args.trace:
        with jax.profiler.trace(args.trace):
            float(chained(variables, x, 5))
        print(f"trace written to {args.trace}", file=sys.stderr)


if __name__ == "__main__":
    main()
