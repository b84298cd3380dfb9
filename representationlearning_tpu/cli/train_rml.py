"""RML trainer CLI — the `RML/scripts/dist_train_voc.py` equivalent (the reference's
shipped script is unrunnable due to broken imports, SURVEY.md §0; this implements the
intended behavior: SCD loop + CIML/MFML/APML mutual-learning losses with PAR).

Usage:
    python -m representationlearning_tpu.cli.train_rml --config configs/rml_voc.yaml \
        [key.sub=value ...]
"""
from __future__ import annotations

import argparse
import os

import jax
import jax.numpy as jnp
import numpy as np

from ..core.config import Config, load_yaml
from ..core.logging import AverageMeter, Timer, setup_logger
from ..data.prefetch import ThreadedLoader
from ..data.voc import BatchLoader
from ..models.rml import RMLModel
from ..parallel import mesh as M
from ..train import checkpoints as CK
from ..train.optim import make_poly_warmup_adamw, tscd_param_labels
from ..train.rml import RMLConfig, make_rml_train_step
from ..train.state import TrainState
from .train_scd import check_max_present


def default_config() -> Config:
    return Config({
        "backbone": {"config": "mit_b1", "stride": [4, 2, 2, 1]},
        # dataset.name: "voc" (default) or "coco" — one trainer, config-selected
        # loaders (the reference would ship a dist_train_coco.py mirror)
        "dataset": {"name": "voc",
                     "root_dir": None, "name_list_dir": None, "num_classes": 21,
                     "crop_size": 320, "ignore_index": 255, "synthetic_n": 32,
                     # device_augment: fused on-device augmentation chain
                     # (data/device_transforms.py), as in the SCD CLI
                     "device_augment": False, "canvas_size": 512,
                     "rescale_range": [0.5, 2.0]},
        "train": {"split": "train_aug",
                   "samples_per_gpu": 2, "max_iters": 18000, "cam_iters": 2000,
                   "log_iters": 200, "eval_iters": 2000},
        "cam": {"bkg_score": 0.45, "high_thre": 0.55, "low_thre": 0.35,
                 "scales": [0.5, 1.0, 1.5]},
        "optimizer": {"learning_rate": 6e-5, "weight_decay": 0.01},
        "scheduler": {"warmup_iter": 1500, "warmup_ratio": 1e-6, "power": 1.0},
        "work_dir": "work_rml",
        "seed": 1,
    })


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", default=None)
    ap.add_argument("overrides", nargs="*")
    args = ap.parse_args(argv)
    cfg = default_config()
    if args.config:
        cfg.merge(load_yaml(args.config))
    cfg.apply_overrides(args.overrides)

    os.makedirs(cfg.work_dir, exist_ok=True)
    log = setup_logger("rml", os.path.join(cfg.work_dir, "train.log"))

    rml_cfg = RMLConfig(
        num_classes=cfg.dataset.num_classes, crop_size=cfg.dataset.crop_size,
        cam_scales=tuple(cfg.cam.scales), bkg_score=cfg.cam.bkg_score,
        high_thre=cfg.cam.high_thre, low_thre=cfg.cam.low_thre,
        ignore_index=cfg.dataset.ignore_index, cam_iters=cfg.train.cam_iters,
        max_present=check_max_present(cfg),
    )
    model = RMLModel(backbone=cfg.backbone.config,
                     num_classes=cfg.dataset.num_classes,
                     strides=tuple(cfg.backbone.stride))
    # fused-kernel twin for the no-grad CAM forwards inside the train step
    # (identical param tree; +32% step throughput measured, PERF.md round 4)
    cam_twin = RMLModel(backbone=cfg.backbone.config,
                        num_classes=cfg.dataset.num_classes,
                        strides=tuple(cfg.backbone.stride),
                        fused_blocks=True, collect_attns="none")

    mesh = M.make_mesh()
    global_batch = cfg.train.samples_per_gpu * mesh.shape[M.DATA_AXIS]
    device_aug = bool(cfg.dataset.get("device_augment", False))
    # shared dataset selection (`dataset.name` voc|coco) with the SCD CLI
    from .train_scd import make_wsss_datasets

    ds, _ = make_wsss_datasets(cfg, device_aug)

    variables = model.init(jax.random.PRNGKey(cfg.seed),
                           jnp.zeros((1, cfg.dataset.crop_size, cfg.dataset.crop_size, 3)))
    tx = make_poly_warmup_adamw(
        cfg.optimizer.learning_rate, cfg.optimizer.weight_decay,
        cfg.scheduler.warmup_iter, cfg.train.max_iters,
        cfg.scheduler.warmup_ratio, cfg.scheduler.power,
        param_labels=tscd_param_labels(variables["params"]),
    )
    state = TrainState.create(model.apply, variables, tx)
    ckpt_dir = os.path.join(cfg.work_dir, "checkpoints")
    if CK.latest_step(ckpt_dir) is not None:
        state = CK.restore(ckpt_dir, state)
        log.info("resumed from step %d", int(state.step))
    state = M.replicate(mesh, state)

    step_fn = make_rml_train_step(model.apply, rml_cfg, cam_apply_fn=cam_twin.apply)
    if device_aug:
        from ..data.device_transforms import (
            DeviceAugConfig, augment_cls_batch, sample_cls_decisions,
        )

        aug_cfg = DeviceAugConfig(
            crop_size=cfg.dataset.crop_size,
            scale_range=tuple(cfg.dataset.get("rescale_range", [0.5, 2.0])),
            num_classes=cfg.dataset.num_classes,
            ignore_index=cfg.dataset.ignore_index,
        )
        inner_step = step_fn

        @jax.jit
        def step_fn(state, batch, key):  # noqa: F811  (fused aug + train step)
            k_aug, k_step = jax.random.split(key)
            dec = sample_cls_decisions(k_aug, batch["raw"].shape[0], aug_cfg)
            image, box = augment_cls_batch(batch["raw"], batch["hw"], dec, aug_cfg)
            return inner_step(state, {"image": image, "img_box": box,
                                      "cls_label": batch["cls_label"]}, k_step)

    loader = iter(ThreadedLoader(BatchLoader(ds, global_batch, seed=cfg.seed),
                                 depth=4))
    meter = AverageMeter()
    timer = Timer(cfg.train.max_iters)
    start = int(state.step)
    for n_iter in range(start, cfg.train.max_iters):
        if device_aug:
            _, raw, hw, cls_label = next(loader)
            batch = M.shard_batch(mesh, {"raw": raw, "hw": hw.astype(np.int32),
                                         "cls_label": cls_label})
        else:
            _, img, cls_label, box = next(loader)
            batch = M.shard_batch(mesh, {"image": img, "cls_label": cls_label,
                                         "img_box": box.astype(np.int32)})
        state, metrics = step_fn(state, batch, jax.random.PRNGKey(cfg.seed * 977 + n_iter))
        meter.add(**{k: float(v) for k, v in metrics.items()})
        if (n_iter + 1) % cfg.train.log_iters == 0:
            log.info("iter %d/%d %s eta %.0fs", n_iter + 1, cfg.train.max_iters,
                     " ".join(f"{k}={v:.4f}" for k, v in meter.pop().items()),
                     timer.eta(n_iter + 1 - start))
        if (n_iter + 1) % cfg.train.eval_iters == 0 or n_iter + 1 == cfg.train.max_iters:
            CK.save(ckpt_dir, n_iter + 1, state)
    return state


if __name__ == "__main__":
    main()
