"""Headline benchmark: 512x512 segmentation tiles/sec/chip on the flagship model
(TSCD / SegFormer-MiT-B1 inference, the metric from BASELINE.json).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Methodology: the axon-tunneled TPU runtime acks dispatch before execution completes
(block_until_ready returns early), so wall-clock timing uses on-device lax.scan chains
with a data dependency between iterations, and differences a K=1 vs K=K_LONG run to
cancel tunnel/dispatch latency.

vs_baseline convention: the reference repo publishes no numbers (BASELINE.md), so the
baseline is the driver's north star — 3x an assumed A100 throughput for SegFormer-B1
512x512 fp16 inference (A100_EST below, ~= 100 tiles/s). vs_baseline =
value / (3 * A100_EST); >= 1.0 means the north-star target is met.
"""
from __future__ import annotations

import json
import time

import numpy as np

A100_EST_TILES_PER_SEC = 100.0


def device_seconds_per_call(fn, *args, k_short=1, k_long=11, reps=5):
    """Time fn(*args, k) with a scan of length k inside; return the median of
    per-rep differences (t(k_long)-t(k_short)) / (k_long-k_short). The tunneled
    runtime has high run-to-run variance, so medians of paired runs are used.
    fn must force a host fetch (return a scalar we float())."""
    import statistics

    for k in (k_short, k_long):
        fn(*args, k)  # compile
    diffs = []
    for _ in range(reps):
        t0 = time.perf_counter()
        fn(*args, k_short)
        t_short = time.perf_counter() - t0
        t0 = time.perf_counter()
        fn(*args, k_long)
        t_long = time.perf_counter() - t0
        diffs.append((t_long - t_short) / (k_long - k_short))
    return statistics.median(diffs)


def main():
    import jax
    import jax.numpy as jnp
    from functools import partial

    from representationlearning_tpu.models.tscd import TSCD

    batch = 8
    model = TSCD(backbone="mit_b1", num_classes=21, dtype=jnp.bfloat16)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((batch, 512, 512, 3)), jnp.float32)
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), x[:1])

    @partial(jax.jit, static_argnames="k")
    def chained(v, x, k):
        def body(carry, _):
            seg = model.apply(v, x + carry * 1e-12)[1]
            return seg.mean().astype(jnp.float32), None

        carry, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=k)
        return carry

    def run(v, x, k):
        return float(chained(v, x, k))

    sec = device_seconds_per_call(run, variables, x)
    tiles_per_sec = batch / sec
    print(
        json.dumps(
            {
                "metric": "segformer_b1_512_tiles_per_sec_per_chip",
                "value": round(tiles_per_sec, 2),
                "unit": "tiles/s",
                "vs_baseline": round(tiles_per_sec / (3 * A100_EST_TILES_PER_SEC), 3),
            }
        )
    )


if __name__ == "__main__":
    main()
