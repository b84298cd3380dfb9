"""A/B driver configs 2 (predict) and 4 (train) for RSSFormer/HRNetFusion flags.
Usage: python tools/profile_rssformer.py predict|train [--batch N] [--fused-mlp]
       [--no-defer-bn-ema] [--trace DIR]
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
    ap.add_argument("mode", choices=["predict", "train"])
    ap.add_argument("--batch", type=int, default=None)
    ap.add_argument("--fused-mlp", action="store_true")
    ap.add_argument("--conv-mm", action="store_true")
    ap.add_argument("--no-defer-bn-ema", action="store_true")
    ap.add_argument("--no-transformer", action="store_true",
                    help="pure-conv HRNetV2 skeleton (with_transformer=False): "
                         "splits conv vs transformer-block cost in training")
    ap.add_argument("--remat", action="store_true",
                    help="remat_transformer=True (recompute the transformer "
                         "blocks in backward; required for train batch >= 16)")
    ap.add_argument("--neck-bf16", action="store_true",
                    help="bf16 SimpleFusion8 chain (memory lever; slower at b8)")
    ap.add_argument("--trace", default=None)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from representationlearning_tpu.models.rssformer import HRNetFusion

    rng = np.random.default_rng(0)
    import statistics

    if args.mode == "predict":
        batch = args.batch or 4
        model = HRNetFusion(hrnet_type="hrnetv2_w32", classes=7,
                            dtype=jnp.bfloat16, fused_mlp=args.fused_mlp,
                            conv_mm=args.conv_mm)
        x = jnp.asarray(rng.standard_normal((batch, 512, 512, 3)), jnp.float32)
        variables = jax.jit(model.init)(jax.random.PRNGKey(0), x[:1])

        def fwd(v, x):
            return model.apply(v, x).mean().astype(jnp.float32)

        @jax.jit
        def chained(v, x, k):
            return jax.lax.fori_loop(
                0, k, lambda i, c: fwd(v, x + c * 1e-12), jnp.float32(0.0))

        t0 = time.perf_counter()
        float(chained(variables, x, 1))
        print(f"compile: {time.perf_counter()-t0:.1f}s", file=sys.stderr)
        diffs = []
        for _ in range(3):
            t0 = time.perf_counter(); float(chained(variables, x, 1)); ts = time.perf_counter() - t0
            t0 = time.perf_counter(); float(chained(variables, x, 11)); tl = time.perf_counter() - t0
            diffs.append((tl - ts) / 10)
        sec = statistics.median(diffs)
        print(f"predict batch={batch} fused_mlp={args.fused_mlp} conv_mm={args.conv_mm}: "
              f"{sec*1000:.2f} ms/call, {batch/sec:.1f} tiles/s")
        if args.trace:
            with jax.profiler.trace(args.trace):
                float(chained(variables, x, 5))
    else:
        from representationlearning_tpu.train.rssformer import (
            RSSFormerTrainConfig, create_rssformer_state, make_rssformer_train_step,
        )

        batch = args.batch or 8
        cfg = RSSFormerTrainConfig()
        model = HRNetFusion(hrnet_type="hrnetv2_w32", classes=7, dtype=jnp.bfloat16,
                            defer_bn_ema=not args.no_defer_bn_ema,
                            with_transformer=not args.no_transformer,
                            conv_mm=args.conv_mm,
                            remat_transformer=args.remat,
                            neck_bf16=args.neck_bf16)
        state = create_rssformer_state(model, (512, 512, 3), cfg)
        batch_data = {
            "image": jnp.asarray(rng.standard_normal((batch, 512, 512, 3)), jnp.float32),
            "mask": jnp.asarray(rng.integers(-1, 7, (batch, 512, 512)), jnp.int32),
        }
        step_fn = make_rssformer_train_step(model, cfg)
        key = jax.random.PRNGKey(0)

        def run(k):
            s = state
            for _ in range(k):
                s, m = step_fn(s, batch_data, key)
            # host fetch: the axon tunnel acks dispatch before execution, so
            # block_until_ready alone returns early (measured 4.3 ms/"step")
            return float(m["total"])

        t0 = time.perf_counter(); run(1)
        print(f"compile+first: {time.perf_counter()-t0:.1f}s", file=sys.stderr)
        diffs = []
        for _ in range(2):
            t0 = time.perf_counter(); run(1); ts = time.perf_counter() - t0
            t0 = time.perf_counter(); run(4); tl = time.perf_counter() - t0
            diffs.append((tl - ts) / 3)
        sec = statistics.median(diffs)
        print(f"train batch={batch} defer_bn_ema={not args.no_defer_bn_ema} "
              f"transformer={not args.no_transformer} remat={args.remat}: "
              f"{sec*1000:.1f} ms/step, {batch/sec:.1f} img/s")
        if args.trace:
            with jax.profiler.trace(args.trace):
                run(3)


if __name__ == "__main__":
    main()
