"""RSSFormer train / eval / predict CLI — equivalents of
`RSSFormer-TIP2023/train.py`, `eval.py`, `predict.py` (config-registry-trainer
pattern; dotted CLI overrides like `scripts/train.sh:14`).

Usage:
    python -m representationlearning_tpu.cli.rssformer train --config configs/rssformer_loveda.yaml
    python -m representationlearning_tpu.cli.rssformer eval  --config ... --ckpt_dir ... [--tta]
    python -m representationlearning_tpu.cli.rssformer predict --config ... --ckpt_dir ... --out_dir viz
"""
from __future__ import annotations

import argparse
import os

import jax
import jax.numpy as jnp
import numpy as np

from ..core.config import Config, load_yaml
from ..core.logging import AverageMeter, setup_logger
from ..data.loveda import LoveDADataset, collate_loveda
from ..infer.tta import default_tta_config
from ..models.rssformer import HRNetFusion
from ..parallel import mesh as M
from ..train import checkpoints as CK
from ..train.rssformer import (
    RSSFormerTrainConfig, create_rssformer_state, evaluate, make_rssformer_train_step,
)
from ..utils.visualize import save_palette_png


def default_config() -> Config:
    return Config({
        "model": {"hrnet_type": "hrnetv2_w32", "classes": 7, "loss": {"ce": {}},
                   "defer_bn_ema": True,
                   # inference-only whole-FFN pallas kernel (ops/pallas/mlp_dwbn.py)
                   "fused_mlp": False,
                   # MlpDWBN dilated branches as shifted MXU matmuls (train+predict)
                   "conv_mm": False},
        "data": {"image_dir": None, "mask_dir": None, "crop_size": 512,
                  "batch_size": 8, "synthetic_n": 16,
                  # device_augment: crop/flip/rot90/ShiftScaleRotate/normalize
                  # fused into the jitted train step (data/device_transforms.py)
                  "device_augment": False, "canvas_size": 1024},
        "learning_rate": {"base_lr": 0.01, "power": 0.9, "max_iters": 30000},
        "optimizer": {"momentum": 0.9, "weight_decay": 1e-4, "grad_clip": 35.0},
        "train": {"num_iters": 30000, "log_interval_step": 50, "eval_interval": 2000},
        "work_dir": "work_rssformer",
        "seed": 2333,
    })


def _build(cfg):
    defer = bool(cfg.model.get("defer_bn_ema", True)) and \
        cfg.model.hrnet_type.startswith("hrnetv2")
    fused_mlp = bool(cfg.model.get("fused_mlp", False)) and \
        cfg.model.hrnet_type.startswith("hrnetv2")
    conv_mm = bool(cfg.model.get("conv_mm", False)) and \
        cfg.model.hrnet_type.startswith("hrnetv2")
    model = HRNetFusion(hrnet_type=cfg.model.hrnet_type, classes=cfg.model.classes,
                        loss_config=cfg.model.loss.to_dict(), defer_bn_ema=defer,
                        fused_mlp=fused_mlp, conv_mm=conv_mm)
    tcfg = RSSFormerTrainConfig(
        base_lr=cfg.learning_rate.base_lr, power=cfg.learning_rate.power,
        max_iters=cfg.learning_rate.max_iters, momentum=cfg.optimizer.momentum,
        weight_decay=cfg.optimizer.weight_decay, grad_clip=cfg.optimizer.grad_clip,
        num_classes=cfg.model.classes,
    )
    return model, tcfg


def cmd_train(cfg):
    log = setup_logger("rssformer")
    model, tcfg = _build(cfg)
    crop = cfg.data.crop_size
    state = create_rssformer_state(model, (crop, crop, 3), tcfg, cfg.seed)
    ckpt_dir = os.path.join(cfg.work_dir, "checkpoints")
    if CK.latest_step(ckpt_dir) is not None:
        state = CK.restore(ckpt_dir, state)
        log.info("resumed at step %d", int(state.step))

    # data axis must divide the global batch; use the largest divisor available
    n_dev = len(jax.devices())
    n_data = max(d for d in range(1, n_dev + 1) if cfg.data.batch_size % d == 0)
    mesh = M.make_mesh(n_data=n_data, n_model=1)
    state = M.replicate(mesh, state)
    step_fn = make_rssformer_train_step(model, tcfg)
    device_aug = bool(cfg.data.get("device_augment", False))
    ds = LoveDADataset(image_dir=cfg.data.image_dir, mask_dir=cfg.data.mask_dir,
                       training=True, crop_size=crop, seed=cfg.seed,
                       synthetic_n=cfg.data.get("synthetic_n", 16),
                       raw=device_aug,
                       canvas_size=cfg.data.get("canvas_size", 1024))
    if device_aug:
        from ..data.device_transforms import (
            LoveDAAugConfig, augment_loveda_batch, sample_loveda_decisions,
        )

        aug_cfg = LoveDAAugConfig(crop_size=crop, num_classes=cfg.model.classes)
        inner_step = step_fn

        @jax.jit
        def step_fn(state, batch, key):  # noqa: F811  (fused aug + train step)
            k_aug, k_step = jax.random.split(key)
            dec = sample_loveda_decisions(k_aug, batch["raw"].shape[0], aug_cfg)
            image, mask = augment_loveda_batch(batch["raw"], batch["hw"],
                                               batch["mask_raw"], dec, aug_cfg)
            return inner_step(state, {"image": image, "mask": mask}, k_step)

    meter = AverageMeter()
    rng = np.random.default_rng(cfg.seed)
    for it in range(int(state.step), cfg.train.num_iters):
        idxs = rng.integers(0, len(ds), cfg.data.batch_size)
        samples = [ds[int(i)] for i in idxs]
        if device_aug:
            batch = M.shard_batch(mesh, {
                "raw": np.stack([s[1] for s in samples]),
                "hw": np.stack([s[2] for s in samples]).astype(np.int32),
                "mask_raw": np.stack([s[3] for s in samples]),
            })
        else:
            _, imgs, masks = collate_loveda(samples)
            batch = M.shard_batch(mesh, {"image": imgs, "mask": masks})
        state, metrics = step_fn(state, batch, jax.random.PRNGKey(cfg.seed + it))
        meter.add(**{k: float(v) for k, v in metrics.items()})
        if (it + 1) % cfg.train.log_interval_step == 0:
            log.info("iter %d/%d %s", it + 1, cfg.train.num_iters,
                     " ".join(f"{k}={v:.4f}" for k, v in meter.pop().items()))
        if (it + 1) % cfg.train.eval_interval == 0 or it + 1 == cfg.train.num_iters:
            CK.save(ckpt_dir, it + 1, state)
    return state


def _restore_for_eval(cfg, args):
    model, tcfg = _build(cfg)
    crop = cfg.data.crop_size
    state = create_rssformer_state(model, (crop, crop, 3), tcfg, cfg.seed)
    ckpt_dir = args.ckpt_dir or os.path.join(cfg.work_dir, "checkpoints")
    if CK.latest_step(ckpt_dir) is not None:
        state = CK.restore(ckpt_dir, state)
    return model, state


def cmd_eval(cfg, args):
    log = setup_logger("rssformer-eval")
    model, state = _restore_for_eval(cfg, args)
    ds = LoveDADataset(image_dir=cfg.data.image_dir, mask_dir=cfg.data.mask_dir,
                       training=False, synthetic_n=cfg.data.get("synthetic_n", 16))
    batches = ((ds[i][1][None], ds[i][2][None]) for i in range(len(ds)))
    tta_cfg = default_tta_config() if args.tta else None
    scores = evaluate(model, state.variables, batches, cfg.model.classes, tta_cfg)
    log.info("eval: miou=%.4f pAcc=%.4f", scores["miou"], scores["pAcc"])
    return scores


def cmd_predict(cfg, args):
    model, state = _restore_for_eval(cfg, args)
    ds = LoveDADataset(image_dir=cfg.data.image_dir, mask_dir=cfg.data.mask_dir,
                       training=False, synthetic_n=cfg.data.get("synthetic_n", 16))
    os.makedirs(args.out_dir, exist_ok=True)
    fwd = jax.jit(lambda v, x: model.apply(v, x))
    variables = state.variables
    for i in range(len(ds)):
        name, img, _ = ds[i]
        probs = fwd(variables, jnp.asarray(img)[None])
        pred = np.asarray(probs.argmax(-1))[0]
        save_palette_png(pred, os.path.join(args.out_dir, f"{name}.png"))
    return args.out_dir


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("command", choices=["train", "eval", "predict"])
    ap.add_argument("--config", default=None)
    ap.add_argument("--ckpt_dir", default=None)
    ap.add_argument("--out_dir", default="predictions")
    ap.add_argument("--tta", action="store_true")
    ap.add_argument("overrides", nargs="*")
    args = ap.parse_args(argv)

    cfg = default_config()
    if args.config:
        cfg.merge(load_yaml(args.config))
    cfg.apply_overrides(args.overrides)

    if args.command == "train":
        return cmd_train(cfg)
    if args.command == "eval":
        return cmd_eval(cfg, args)
    return cmd_predict(cfg, args)


if __name__ == "__main__":
    main()
