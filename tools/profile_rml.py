"""Profile driver config 5 (rml_train): rate at a given batch size, optional
xplane trace. Usage: python tools/profile_rml.py <batch> [--trace DIR] [--fused]
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


def _voc_labels(rng, batch, num_fg):
    out = np.zeros((batch, num_fg), np.float32)
    for i in range(batch):
        k = rng.choice([1, 2, 3], p=[0.7, 0.2, 0.1])
        out[i, rng.choice(num_fg, size=k, replace=False)] = 1.0
    return out


def _dense_labels(rng, batch, num_fg):
    """BENCH_r03's exact label construction (bernoulli 0.3/class, ~6 present
    classes/image): `git show 403319c:bench.py` bench_rml_train."""
    return (rng.random((batch, num_fg)) > 0.7).astype(np.float32)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("batch", type=int, default=4, nargs="?")
    ap.add_argument("--trace", default=None)
    ap.add_argument("--fused", action="store_true", help="fused_blocks=True")
    ap.add_argument("--steps", type=int, default=6)
    ap.add_argument("--max-present", type=int, default=None)
    ap.add_argument("--taps", action="store_true",
                    help="sr>1 fused blocks: in-kernel sr-taps (round-3 path) "
                         "instead of pre-sr XLA reduce")
    ap.add_argument("--cam-act-bf16", action="store_true",
                    help="bf16 residual-stream residency on the no-grad cam "
                         "twin (grad model unchanged)")
    ap.add_argument("--taps-stem", action="store_true",
                    help="grouped-taps stem on BOTH the grad model and the "
                         "cam twin (ops/image.py::grouped_taps_conv)")
    ap.add_argument("--r03-protocol", action="store_true",
                    help="BENCH_r03 workload for apples-to-apples comparison: "
                         "dense ~6-present-class labels (round 4 moved the "
                         "bench to VOC-realistic ~1.5; pair with batch 4)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    if args.taps:
        from representationlearning_tpu.ops.pallas import mit_block as MB

        def taps_fused(x, p, *, H, W, sr, nh, dtype=jnp.float32, export=False):
            B, N, C = x.shape
            hid = p["fc1_kernel"].shape[1]
            Nk = (H // sr) * (W // sr) if sr > 1 else N
            if (jax.default_backend() == "tpu"
                    and MB._vmem_fits(N, C, hid, Nk, nh, export)
                    and (not export or sr == 1)):
                return MB.fused_block_pallas(x, p, H=H, W=W, sr=sr, nh=nh,
                                             dtype=dtype, export=export)
            return MB.fused_block_reference(x, p, H=H, W=W, sr=sr, nh=nh,
                                            dtype=dtype, export=export)
        MB.fused_block = taps_fused

    from representationlearning_tpu.data.device_transforms import (
        DeviceAugConfig, augment_cls_batch, sample_cls_decisions,
    )
    from representationlearning_tpu.models.rml import RMLModel
    from representationlearning_tpu.train.optim import (
        make_poly_warmup_adamw, tscd_param_labels,
    )
    from representationlearning_tpu.train.rml import RMLConfig, make_rml_train_step
    from representationlearning_tpu.train.state import TrainState

    batch = args.batch
    cfg = RMLConfig(crop_size=320, cam_iters=-1, max_present=args.max_present)
    aug_cfg = DeviceAugConfig(crop_size=320, scale_range=(0.5, 2.0), num_classes=21)
    model = RMLModel(backbone="mit_b1", num_classes=21, dtype=jnp.bfloat16,
                     taps_stem=args.taps_stem)
    cam_apply_fn = None
    if args.fused:
        cam_twin = RMLModel(backbone="mit_b1", num_classes=21, dtype=jnp.bfloat16,
                            fused_blocks=True, collect_attns="none",
                            taps_stem=args.taps_stem,
                            act_dtype=jnp.bfloat16 if args.cam_act_bf16 else None)
        cam_apply_fn = cam_twin.apply
    rng = np.random.default_rng(0)
    x = jnp.zeros((1, 320, 320, 3), jnp.float32)
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), x)
    tx = make_poly_warmup_adamw(
        6e-5, 0.01, warmup_iter=10, max_iter=1000,
        param_labels=tscd_param_labels(variables["params"]),
    )
    state = TrainState.create(model.apply, variables, tx)
    batch_data = {
        "raw": jnp.asarray(rng.integers(0, 256, (batch, 512, 512, 3)), jnp.uint8),
        "hw": jnp.tile(jnp.asarray([[375, 500]], jnp.int32), (batch, 1)),
        "cls_label": jnp.asarray(
            _dense_labels(rng, batch, 20) if args.r03_protocol
            else _voc_labels(rng, batch, 20), jnp.float32),
    }
    inner = make_rml_train_step(model.apply, cfg, cam_apply_fn=cam_apply_fn)

    @jax.jit
    def step_fn(state, b, key):
        k_aug, k_step = jax.random.split(key)
        dec = sample_cls_decisions(k_aug, batch, aug_cfg)
        image, box = augment_cls_batch(b["raw"], b["hw"], dec, aug_cfg)
        return inner(state, {"image": image, "img_box": box,
                             "cls_label": b["cls_label"]}, k_step)

    key = jax.random.PRNGKey(0)
    t0 = time.perf_counter()
    state2, metrics = step_fn(state, batch_data, key)
    jax.block_until_ready(metrics["total"])
    print(f"compile+first step: {time.perf_counter()-t0:.1f}s", file=sys.stderr)

    def run(k):
        s = state
        for _ in range(k):
            s, m = step_fn(s, batch_data, key)
        # host fetch (not just block_until_ready): the axon tunnel can ack
        # readiness before execution completes (see bench.py methodology)
        return float(m["total"])

    import statistics
    diffs = []
    for _ in range(2):
        t0 = time.perf_counter(); run(1); ts = time.perf_counter() - t0
        t0 = time.perf_counter(); run(args.steps); tl = time.perf_counter() - t0
        diffs.append((tl - ts) / (args.steps - 1))
    sec = statistics.median(diffs)
    print(f"batch={batch} fused={args.fused}: {sec*1000:.1f} ms/step, "
          f"{batch/sec:.1f} img/s")

    if args.trace:
        with jax.profiler.trace(args.trace):
            run(3)
        print(f"trace written to {args.trace}", file=sys.stderr)


if __name__ == "__main__":
    main()
