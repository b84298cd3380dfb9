"""Benchmarks for the five driver configs (BASELINE.json) + the headline metric.

Prints one JSON line per config — {"metric", "value", "unit", "vs_baseline", ...} —
with the headline metric (512x512 SegFormer-B1 seg tiles/sec/chip) printed LAST so a
last-line parser records it.

Methodology: the axon-tunneled TPU runtime acks dispatch before execution completes
(block_until_ready can return early), so wall-clock timing uses on-device lax.scan
chains (or Python-chained train steps) with a data dependency between iterations, and
differences a short vs a long run to cancel tunnel/dispatch latency.

Baseline derivation (honest, per VERDICT round 1): the reference repo publishes no
throughput numbers, so the A100 comparison point is DERIVED, not measured:
  a100_rate = A100_PEAK_FP16 (312 TF/s dense) * assumed_MFU / flops_per_example
where flops_per_example is XLA's own cost analysis of our compiled function and the
assumed MFU is 0.20 for inference / 0.25 for training — deliberately generous to the
A100 (well-optimized engines reach 30-40% on CNNs, eager PyTorch — the reference's
actual deployment mode — is typically well below 10%). vs_baseline = value /
(3 * a100_rate), i.e. >= 1.0 means the literal ">= 3x A100 per chip" north star. Each
line also reports achieved_tflops and mfu against this chip's bf16 peak so the roofline
gap is explicit. On a 197 TF/s v5e, 3x a 312 TF/s A100 at equal MFU is physically
impossible (would need ~4.7x the A100's MFU); the honest target is max MFU, tracked here.
"""
from __future__ import annotations

import json
import os
import time

import numpy as np

A100_PEAK_FP16 = 312e12
ASSUMED_A100_INFER_MFU = 0.20
ASSUMED_A100_TRAIN_MFU = 0.25
# fallback when XLA cost analysis is unavailable: SegFormer-B1 ~15.9 GFLOPs(paper
# convention)@512^2; eager-ish A100 estimate ~200 tiles/s (SegFormer paper reports
# ~48 FPS on V100 at 512x1024 for B1; x2 for half the pixels, x2.1 A100/V100)
A100_B1_FALLBACK_TILES = 200.0


def peak_tflops_per_chip():
    import jax

    kind = jax.devices()[0].device_kind.lower()
    table = {
        "v6": 918e12, "trillium": 918e12, "v5p": 459e12, "v5": 197e12,
        "v5e": 197e12, "v5 lite": 197e12, "v4": 275e12, "cpu": 0.5e12,
    }
    for key, v in table.items():
        if key in kind:
            return v
    return 197e12  # assume v5e-class


def flops_per_call(fn, *args):
    """XLA's cost analysis of the compiled function; None if unavailable.
    Reuses fn's own jit cache when fn is already jitted (wrapping a jitted fn in
    a fresh jax.jit would force a second full compile)."""
    import jax

    try:
        jfn = fn if hasattr(fn, "lower") else jax.jit(fn)
        c = jfn.lower(*args).compile().cost_analysis()
        if isinstance(c, (list, tuple)):
            c = c[0]
        f = float(c.get("flops", 0.0))
        return f if f > 0 else None
    except Exception:
        return None


def device_seconds_per_call(fn, *args, k_short=1, k_long=11, reps=3):
    """Time fn(*args, k) with a k-long on-device dependency chain inside; median of
    per-rep (t(k_long)-t(k_short)) / (k_long-k_short). fn must force a host fetch."""
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


def _emit(metric, value, unit, flops_per_ex, assumed_a100_mfu, peak, extra=None):
    if flops_per_ex:
        a100_rate = A100_PEAK_FP16 * assumed_a100_mfu / flops_per_ex
        achieved = value * flops_per_ex
        rec = {
            "metric": metric, "value": round(value, 2), "unit": unit,
            "vs_baseline": round(value / (3 * a100_rate), 3),
            "achieved_tflops": round(achieved / 1e12, 2),
            "mfu": round(achieved / peak, 4),
            "flops_per_example_g": round(flops_per_ex / 1e9, 2),
            "baseline_a100_est": round(a100_rate, 1),
        }
    else:
        rec = {
            "metric": metric, "value": round(value, 2), "unit": unit,
            "vs_baseline": round(value / (3 * A100_B1_FALLBACK_TILES), 3),
        }
    if extra:
        rec.update(extra)
    print(json.dumps(rec), flush=True)
    return rec


def _voc_like_labels(rng, batch, num_fg):
    """Multi-hot labels at VOC12 density: 1-3 present classes per image
    (p = 0.7/0.2/0.1; dataset mean ~1.5, max ~6)."""
    out = np.zeros((batch, num_fg), np.float32)
    for i in range(batch):
        k = rng.choice([1, 2, 3], p=[0.7, 0.2, 0.1])
        out[i, rng.choice(num_fg, size=k, replace=False)] = 1.0
    return out


# ----------------------------------------------------------------- inference benches
def bench_segformer_b1_predict(peak, use_flash=False):
    """Headline: TSCD(SegFormer-MiT-B1) 512^2 seg inference tiles/s/chip.
    use_flash defaults to False: at SegFormer's spatial-reduction shapes (huge Nq,
    tiny Nk<=256) the fused kernel measured ~7% SLOWER than XLA's two thin matmuls
    on v5e (kernel launch overhead dominates; see PERF.md) — flash remains available
    as a memory-saving option for long-sequence shapes."""
    import jax
    import jax.numpy as jnp
    from functools import partial

    from representationlearning_tpu.models.tscd import TSCD

    batch = 8
    # fused_blocks: whole-block pallas kernels on the non-exporting encoder
    # blocks (ops/pallas/mit_block.py) — +12% measured over the XLA path.
    # act_dtype=bf16: inter-block residual-stream residency (LN stats stay
    # f32) — A/B'd on-chip round 4: 854.4 vs 838.5 tiles/s (PERF.md)
    model = TSCD(backbone="mit_b1", num_classes=21, dtype=jnp.bfloat16,
                 use_flash=use_flash, fused_blocks=True,
                 act_dtype=jnp.bfloat16)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((batch, 512, 512, 3)), jnp.float32)
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), x[:1])

    def fwd(v, x):
        return model.apply(v, x)[1].mean().astype(jnp.float32)

    # runtime-k fori_loop chain: ONE compile covers both k_short and k_long
    # (the fused model compiles slowly; two static-k variants would double it)
    @jax.jit
    def chained(v, x, k):
        return jax.lax.fori_loop(
            0, k, lambda i, c: fwd(v, x + c * 1e-12), jnp.float32(0.0))

    def run(v, x, k):
        return float(chained(v, x, k))

    sec = device_seconds_per_call(run, variables, x)
    # count FLOPs on the mathematically-identical UNFUSED model: XLA's cost
    # analysis reports 0 for the pallas custom-calls, which would understate the
    # work (and overstate the A100 baseline) by ~40%
    model_xla = TSCD(backbone="mit_b1", num_classes=21, dtype=jnp.bfloat16,
                     use_flash=use_flash, fused_blocks=False)

    def fwd_xla(v, x):
        return model_xla.apply(v, x)[1].mean().astype(jnp.float32)

    flops = flops_per_call(fwd_xla, variables, x)
    return _emit(
        "segformer_b1_512_tiles_per_sec_per_chip", batch / sec, "tiles/s",
        flops / batch if flops else None, ASSUMED_A100_INFER_MFU, peak,
    )


def bench_wavecam_cams(peak):
    """Driver config 1: WaveCAM CAM generation (ResNet-50 CAM head, flip pair)."""
    import jax
    import jax.numpy as jnp
    from functools import partial

    from representationlearning_tpu.models.resnet import Net

    batch = 8
    model = Net(n_classes=20, dtype=jnp.bfloat16)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((batch, 512, 512, 3)), jnp.float32)
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), x[:1])

    def cam_fwd(v, x):
        # flip-pair CAM (`make_cam.py` per-scale work unit): img + hflip, relu,
        # sum — ONE batched forward over the stacked pair, as the reference's
        # MSF loader stacks them (`voc12/dataloader.py:259-287`; wsss/msf.py)
        b = x.shape[0]
        cc = model.apply(v, jnp.concatenate([x, x[:, :, ::-1]], axis=0),
                         method=model.cam)
        cam = jnp.maximum(cc[:b], 0) + jnp.maximum(cc[b:], 0)[:, :, ::-1]
        return cam.mean().astype(jnp.float32)

    @jax.jit
    def chained(v, x, k):
        return jax.lax.fori_loop(
            0, k, lambda i, c: cam_fwd(v, x + c * 1e-12), jnp.float32(0.0))

    def run(v, x, k):
        return float(chained(v, x, k))

    sec = device_seconds_per_call(run, variables, x)
    flops = flops_per_call(cam_fwd, variables, x)
    return _emit(
        "wavecam_resnet50_cams_per_sec_per_chip", batch / sec, "CAMs/s",
        flops / batch if flops else None, ASSUMED_A100_INFER_MFU, peak,
    )


def bench_rssformer_predict(peak):
    """Driver config 2: RSSFormer(HRNetFusion-w32) single-tile 512^2 predict."""
    import jax
    import jax.numpy as jnp
    from functools import partial

    from representationlearning_tpu.models.rssformer import HRNetFusion

    batch = 4
    # fused_mlp: whole-FFN MlpDWBN pallas kernel (ops/pallas/mlp_dwbn.py) —
    # A/B'd on-chip round 4 at this geometry: 126.5 vs 115.4 tiles/s base,
    # vs 123.4 for the conv_mm XLA relowering (PERF.md)
    model = HRNetFusion(hrnet_type="hrnetv2_w32", classes=7, dtype=jnp.bfloat16,
                        fused_mlp=True)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((batch, 512, 512, 3)), jnp.float32)
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), x[:1])

    def fwd(v, x):
        return model.apply(v, x).mean().astype(jnp.float32)

    @jax.jit
    def chained(v, x, k):
        return jax.lax.fori_loop(
            0, k, lambda i, c: fwd(v, x + c * 1e-12), jnp.float32(0.0))

    def run(v, x, k):
        return float(chained(v, x, k))

    sec = device_seconds_per_call(run, variables, x)
    # count FLOPs on the mathematically-identical unfused model: XLA cost
    # analysis reports 0 for pallas custom-calls (same fix as the headline)
    model_xla = HRNetFusion(hrnet_type="hrnetv2_w32", classes=7,
                            dtype=jnp.bfloat16)

    def fwd_xla(v, x):
        return model_xla.apply(v, x).mean().astype(jnp.float32)

    flops = flops_per_call(fwd_xla, variables, x)
    return _emit(
        "rssformer_w32_512_predict_tiles_per_sec_per_chip", batch / sec, "tiles/s",
        flops / batch if flops else None, ASSUMED_A100_INFER_MFU, peak,
    )


def bench_rssformer_tta_eval(peak):
    """Driver config 4's eval half: RSSFormer multi-scale TTA inference at the
    reference's 6 scale factors 0.5..1.75 with averaged inverse-transformed
    logits (`RSSFormer-TIP2023/eval.py:58-65`, `module/tta.py:118-135`)."""
    import jax
    import jax.numpy as jnp

    from representationlearning_tpu.infer.tta import default_tta_config, tta
    from representationlearning_tpu.models.rssformer import HRNetFusion

    batch = 2
    model = HRNetFusion(hrnet_type="hrnetv2_w32", classes=7, dtype=jnp.bfloat16)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((batch, 512, 512, 3)), jnp.float32)
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), x[:1])

    def fwd(v, x):
        pred = tta(lambda im: model.apply(v, im), x, default_tta_config())
        return pred.argmax(axis=-1).sum().astype(jnp.float32)

    @jax.jit
    def chained(v, x, k):
        return jax.lax.fori_loop(
            0, k, lambda i, c: fwd(v, x + c * 1e-12), jnp.float32(0.0))

    def run(v, x, k):
        return float(chained(v, x, k))

    sec = device_seconds_per_call(run, variables, x, k_short=1, k_long=5, reps=3)
    flops = flops_per_call(fwd, variables, x)
    return _emit(
        "rssformer_w32_512_tta_eval_tiles_per_sec_per_chip", batch / sec, "tiles/s",
        flops / batch if flops else None, ASSUMED_A100_INFER_MFU, peak,
    )


def bench_scd_pseudo_labels(peak):
    """Driver config 3: SCD pseudo-label generation (multi-scale+flip CAM ->
    threshold labels), scales [1, 0.5, 1.5] (`configs/voc_attn_reg.yaml:31`)."""
    import jax
    import jax.numpy as jnp
    from functools import partial

    from representationlearning_tpu.models.tscd import TSCD
    from representationlearning_tpu.wsss import camutils as CU

    batch = 4
    model = TSCD(backbone="mit_b1", num_classes=21, dtype=jnp.bfloat16, use_flash=False)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((batch, 512, 512, 3)), jnp.float32)
    cls_label = jnp.asarray((rng.random((batch, 20)) > 0.7), jnp.float32)
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), x[:1])

    def cam_fn(img):
        return model.apply(variables, img, cam_only=True)

    def pseudo(x, cls_label):
        cam = CU.multi_scale_cam(cam_fn, x, (1.0, 0.5, 1.5))
        label = CU.cam_to_label(cam, cls_label, bkg_score=0.45)
        return label.sum().astype(jnp.float32)

    @jax.jit
    def chained(x, cls_label, k):
        return jax.lax.fori_loop(
            0, k, lambda i, c: pseudo(x + c * 1e-12, cls_label) * 1e-9,
            jnp.float32(0.0))

    def run(x, c, k):
        return float(chained(x, c, k))

    sec = device_seconds_per_call(run, x, cls_label, k_short=1, k_long=6, reps=3)
    flops = flops_per_call(pseudo, x, cls_label)
    return _emit(
        "scd_pseudo_label_images_per_sec_per_chip", batch / sec, "images/s",
        flops / batch if flops else None, ASSUMED_A100_INFER_MFU, peak,
    )


# ------------------------------------------------------------------ training benches
def _python_chained_steps(step_fn, state, batch, key, k):
    import jax

    for _ in range(k):
        state, metrics = step_fn(state, batch, key)
    jax.block_until_ready(metrics["total"])
    return float(metrics["total"]), state


def _train_rate(step_fn, state, batch, key, batch_size, k_short=1, k_long=4, reps=2):
    import statistics

    _python_chained_steps(step_fn, state, batch, key, 1)  # compile
    diffs = []
    for _ in range(reps):
        t0 = time.perf_counter()
        _python_chained_steps(step_fn, state, batch, key, k_short)
        ts = time.perf_counter() - t0
        t0 = time.perf_counter()
        _python_chained_steps(step_fn, state, batch, key, k_long)
        tl = time.perf_counter() - t0
        diffs.append((tl - ts) / (k_long - k_short))
    sec = statistics.median(diffs)
    return batch_size / sec


def bench_rssformer_train(peak):
    """Driver config 4: RSSFormer full train step (batch 8, 512^2, SGD-poly,
    grad-clip 35 — `configs/base/loveda.py`)."""
    import jax
    import jax.numpy as jnp

    from representationlearning_tpu.models.rssformer import HRNetFusion
    from representationlearning_tpu.train.rssformer import (
        RSSFormerTrainConfig, create_rssformer_state, make_rssformer_train_step,
    )

    batch = 8
    cfg = RSSFormerTrainConfig()
    model = HRNetFusion(hrnet_type="hrnetv2_w32", classes=7, dtype=jnp.bfloat16,
                        defer_bn_ema=True)
    state = create_rssformer_state(model, (512, 512, 3), cfg)
    rng = np.random.default_rng(0)
    batch_data = {
        "image": jnp.asarray(rng.standard_normal((batch, 512, 512, 3)), jnp.float32),
        "mask": jnp.asarray(rng.integers(-1, 7, (batch, 512, 512)), jnp.int32),
    }
    step_fn = make_rssformer_train_step(model, cfg)
    rate = _train_rate(step_fn, state, batch_data, jax.random.PRNGKey(0), batch)
    flops = flops_per_call(step_fn, state, batch_data, jax.random.PRNGKey(0))
    return _emit(
        "rssformer_w32_512_train_images_per_sec_per_chip", rate, "images/s",
        flops / batch if flops else None, ASSUMED_A100_TRAIN_MFU, peak,
    )


def bench_rml_train(peak):
    """Driver config 5: RML representation training step WITH the full
    augmentation pipeline (BASELINE.json: "full augmentation pipeline"),
    fused on device: raw uint8 canvases in, scale-jitter/flip/pad/crop/
    normalize (`data/device_transforms.py`) + the RML step in ONE jitted
    program. Multi-chip data-parallel is validated separately by
    dryrun_multichip."""
    import jax
    import jax.numpy as jnp

    from representationlearning_tpu.data.device_transforms import (
        DeviceAugConfig, augment_cls_batch, sample_cls_decisions,
    )
    from representationlearning_tpu.models.rml import RMLModel
    from representationlearning_tpu.train.optim import (
        make_poly_warmup_adamw, tscd_param_labels,
    )
    from representationlearning_tpu.train.rml import RMLConfig, make_rml_train_step
    from representationlearning_tpu.train.state import TrainState

    # batch swept on-chip (PERF.md round 4): 4 -> 94.8, 16 -> 113.2, 32 -> 114.1
    # img/s; 16 is the knee (metric is img/s/chip — the reference's per-GPU 2x2
    # batch starves a 197 TF/s chip)
    batch = 16
    # max_present=8: the refine propagation only carries each image's PRESENT
    # classes (exact; tests/test_camutils.py) — the reference's per-image loop
    # does the same (`camutils.py:183-193`). 8 safely bounds VOC (<= ~6/image).
    cfg = RMLConfig(crop_size=320, cam_iters=-1, max_present=8)
    aug_cfg = DeviceAugConfig(crop_size=320, scale_range=(0.5, 2.0),
                              num_classes=21)
    model = RMLModel(backbone="mit_b1", num_classes=21, dtype=jnp.bfloat16)
    # the no-grad CAM forwards run through the fused-block twin (identical
    # params, collect_attns="none"): +32% measured at batch 4 (PERF.md round 4)
    cam_twin = RMLModel(backbone="mit_b1", num_classes=21, dtype=jnp.bfloat16,
                        fused_blocks=True, collect_attns="none")
    rng = np.random.default_rng(0)
    x = jnp.zeros((1, 320, 320, 3), jnp.float32)
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), x)
    tx = make_poly_warmup_adamw(
        6e-5, 0.01, warmup_iter=10, max_iter=1000,
        param_labels=tscd_param_labels(variables["params"]),
    )
    state = TrainState.create(model.apply, variables, tx)
    # VOC-sized raw inputs on a 512 canvas (train images are ~375x500)
    batch_data = {
        "raw": jnp.asarray(rng.integers(0, 256, (batch, 512, 512, 3)), jnp.uint8),
        "hw": jnp.tile(jnp.asarray([[375, 500]], jnp.int32), (batch, 1)),
        # VOC-like label density (~1.5 present classes/image; the previous
        # p=0.3 Bernoulli gave ~6/image, 4x denser than the dataset the driver
        # config trains on). The refine cost is work-proportional to presence
        # in the reference too (per-image valid-class loop).
        "cls_label": jnp.asarray(_voc_like_labels(rng, batch, 20), jnp.float32),
    }
    inner = make_rml_train_step(model.apply, cfg, cam_apply_fn=cam_twin.apply)

    @jax.jit
    def step_fn(state, b, key):
        k_aug, k_step = jax.random.split(key)
        dec = sample_cls_decisions(k_aug, batch, aug_cfg)
        image, box = augment_cls_batch(b["raw"], b["hw"], dec, aug_cfg)
        return inner(state, {"image": image, "img_box": box,
                             "cls_label": b["cls_label"]}, k_step)

    rate = _train_rate(step_fn, state, batch_data, jax.random.PRNGKey(0), batch)
    # Baseline FLOPs are pinned to the REFERENCE-EQUIVALENT step (the un-twinned
    # XLA path with attention export, `cam_apply_fn=None`): 157.57 GF/example,
    # XLA cost analysis recorded in BENCH_r03.json. The fused cam twin skips
    # work the reference performs (attention export in the no-grad forwards),
    # so costing the optimized program would inflate the phantom A100's rate
    # as we optimize — the same convention the headline uses (unfused-model
    # FLOPs). Measured FLOPs of the optimized program are reported alongside.
    # The constant is only valid at the geometry it was recorded at — guard it
    # so a future crop/backbone change cannot silently skew the A100 baseline
    # (ADVICE r4). Re-derive by cost-analyzing make_rml_train_step(model.apply,
    # cfg) with cam_apply_fn=None at the new geometry if this fires.
    assert (cfg.crop_size, cfg.max_present) == (320, 8) and \
        model.backbone == "mit_b1", "ref_flops_per_ex recorded at mit_b1/320/mp8"
    ref_flops_per_ex = 157.57e9
    flops = flops_per_call(step_fn, state, batch_data, jax.random.PRNGKey(0))
    return _emit(
        "rml_mitb1_320_train_images_per_sec_per_chip", rate, "images/s",
        ref_flops_per_ex, ASSUMED_A100_TRAIN_MFU, peak,
        extra={"measured_flops_per_example_g":
               round(flops / batch / 1e9, 2) if flops else None},
    )


BENCHES = {
    "wavecam_cams": (bench_wavecam_cams, "wavecam_resnet50_cams_per_sec_per_chip"),
    "rssformer_predict": (
        bench_rssformer_predict, "rssformer_w32_512_predict_tiles_per_sec_per_chip"),
    "scd_pseudo_labels": (
        bench_scd_pseudo_labels, "scd_pseudo_label_images_per_sec_per_chip"),
    "rssformer_train": (
        bench_rssformer_train, "rssformer_w32_512_train_images_per_sec_per_chip"),
    "rml_train": (bench_rml_train, "rml_mitb1_320_train_images_per_sec_per_chip"),
    "rssformer_tta_eval": (
        bench_rssformer_tta_eval, "rssformer_w32_512_tta_eval_tiles_per_sec_per_chip"),
    "segformer_b1": (
        bench_segformer_b1_predict, "segformer_b1_512_tiles_per_sec_per_chip"),
}
# RUN the headline first (VERDICT r2 item 1: first-in-record — it must never be
# starved by earlier hangs/timeouts), then the configs that changed most this
# round (VERDICT r4 item 1: the two metrics lost to the r4 driver timeout ran
# last), then the stable quick ones. PRINT the headline last (last-line parser).
# Each name runs in its OWN subprocess (round-2 lesson: all six in one process
# let an early RESOURCE_EXHAUSTED poison the later configs).
BENCH_RUN_ORDER = [
    "segformer_b1", "rml_train", "rssformer_train", "rssformer_tta_eval",
    "wavecam_cams", "rssformer_predict", "scd_pseudo_labels",
]
BENCH_PRINT_ORDER = [
    "wavecam_cams", "rssformer_predict", "scd_pseudo_labels",
    "rssformer_train", "rml_train", "rssformer_tta_eval", "segformer_b1",
]
# Total wall budget and per-config caps (seconds). Round 4's record died at
# rc=124: 7 configs x 1800 s caps cannot fit the driver budget that killed that
# run after ~5 configs. The scheduler keeps a floor for every still-pending
# config so a slow early config cannot starve the later ones — every metric
# ALWAYS prints a line (value 0 + "skipped: budget" in the worst case), and a
# warm persistent compile cache makes the whole run ~7 x 60 s.
BENCH_TOTAL_BUDGET_S = float(os.environ.get("BENCH_TOTAL_BUDGET_S", 2400))
BENCH_FLOOR_S = 90.0
# Caps sized to COLD-cache compile times measured on the r5 box (1 CPU core:
# headline ~460-540 s, rml_train ~690 s, rssformer_train ~480 s, predict
# ~610 s). The total-budget scheduler still bounds the whole run; with the
# persistent cache warm (any prior run on the same box) each config is
# ~60-120 s and every cap is irrelevant.
PER_CONFIG_MAX_S = {
    "segformer_b1": 750, "rml_train": 1000, "rssformer_train": 800,
    "rssformer_tta_eval": 700, "wavecam_cams": 500, "rssformer_predict": 800,
    "scd_pseudo_labels": 600,
}


def run_one(name):
    """Child-process entry: run a single bench config and print its JSON line."""
    fn, metric = BENCHES[name]
    try:
        fn(peak_tflops_per_chip())
    except Exception as e:
        print(json.dumps({
            "metric": metric, "value": 0.0, "unit": "error", "vs_baseline": 0.0,
            "error": f"{type(e).__name__}: {e}"[:300],
        }), flush=True)


def wait_for_backend(child_env, max_wait_s=480):
    """The axon-tunneled TPU backend HANGS (not errors) in jax.devices() when the
    tunnel is down, sometimes transiently. Probe it in short-timeout child
    processes and wait up to max_wait_s before starting the benches, so a
    transient outage cannot zero the whole record (round-2 lesson, generalized).
    Notes go to stderr — stdout stays JSON-only for the driver's parser."""
    import subprocess
    import sys

    deadline = time.time() + max_wait_s
    attempt = 0
    while True:
        attempt += 1
        try:
            proc = subprocess.run(
                [sys.executable, "-c",
                 "import jax; d = jax.devices(); print(d[0].platform)"],
                capture_output=True, text=True, timeout=240, env=child_env,
            )
            if proc.returncode == 0:
                print(f"[bench] backend up ({proc.stdout.strip()}) "
                      f"after {attempt} probe(s)", file=sys.stderr, flush=True)
                return True
        except subprocess.TimeoutExpired:
            pass
        if time.time() > deadline:
            print(f"[bench] backend still unreachable after {max_wait_s}s; "
                  "running anyway (per-config timeouts apply)",
                  file=sys.stderr, flush=True)
            return False
        print(f"[bench] backend probe {attempt} failed; retrying in 120s",
              file=sys.stderr, flush=True)
        time.sleep(120)


def main():
    """Parent: fork one subprocess per config BEFORE any TPU allocation (this
    process never imports jax), so an OOM in one config cannot fragment or
    exhaust HBM for the rest. A total wall budget with per-pending floors
    guarantees EVERY config prints a metric line within the driver's budget
    (round-4 lesson: rc=124 lost 2 of 7 metrics including the round's one big
    win). Relays each child's JSON line; headline printed last."""
    import subprocess
    import sys

    deadline = time.time() + BENCH_TOTAL_BUDGET_S
    child_env = dict(os.environ)
    # persistent compile cache (keyed by HLO): repeated bench runs skip the
    # 20-40 s per-config TPU compiles; code changes invalidate naturally
    child_env.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/rl_tpu_bench_cache")
    child_env.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "2")
    wait_for_backend(child_env,
                     max_wait_s=min(480.0, max(60.0, deadline - time.time() - 600)))
    lines = {}
    for i, name in enumerate(BENCH_RUN_ORDER):
        fn, metric = BENCHES[name]
        n_after = len(BENCH_RUN_ORDER) - i - 1
        timeout_s = min(PER_CONFIG_MAX_S[name],
                        deadline - time.time() - BENCH_FLOOR_S * n_after)
        line = None
        if timeout_s < 45:
            line = json.dumps({
                "metric": metric, "value": 0.0, "unit": "error",
                "vs_baseline": 0.0,
                "error": f"skipped: bench budget exhausted ({timeout_s:.0f}s left)",
            })
        else:
            try:
                proc = subprocess.run(
                    [sys.executable, __file__, "--one", name],
                    capture_output=True, text=True, timeout=timeout_s,
                    env=child_env,
                )
                # last stdout line that parses as a {"metric": ...} record
                for cand in reversed(proc.stdout.strip().splitlines()):
                    try:
                        rec = json.loads(cand)
                        if isinstance(rec, dict) and "metric" in rec:
                            line = cand
                            break
                    except (json.JSONDecodeError, ValueError):
                        continue
                if line is None:
                    err = (proc.stderr or "").strip().splitlines()
                    line = json.dumps({
                        "metric": metric, "value": 0.0, "unit": "error",
                        "vs_baseline": 0.0,
                        "error": (f"exit={proc.returncode} "
                                  + " | ".join(err[-3:]))[:300],
                    })
            except subprocess.TimeoutExpired:
                line = json.dumps({
                    "metric": metric, "value": 0.0, "unit": "error",
                    "vs_baseline": 0.0,
                    "error": f"timeout after {timeout_s:.0f}s",
                })
        lines[name] = line
        # stream as completed (a mid-run kill must not erase finished results) ...
        print(line, flush=True)
    # ... then re-emit in canonical order ending with the headline, so both a
    # last-line parser and a dict-by-metric parser (duplicates overwrite with
    # identical values) record the headline.
    for name in BENCH_PRINT_ORDER:
        print(lines[name], flush=True)


if __name__ == "__main__":
    import sys

    if len(sys.argv) == 3 and sys.argv[1] == "--one":
        run_one(sys.argv[2])
    else:
        main()
