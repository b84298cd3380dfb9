"""SCD end-to-end WSSS trainer — the reference's canonical hot path
(`SCD-AAAI2023/scripts/dist_train_voc.py:181-432`) as ONE jitted train step.

Reference structure per iteration (call stack SURVEY.md §3.1):
  forward -> multi-scale flip CAM (+0.3x forward & CAM set) -> pseudo labels ->
  VARM background-aware refine -> affinity labels -> 6 losses -> schedule-weighted sum
  -> backward -> PolyWarmupAdamW step (NCCL allreduce inside DDP backward).

TPU redesign: everything, including the 12 auxiliary cam-only forwards, the VARM
stencil and the bilateral-grid energy term, fuses into a single jit over a
data-sharded batch; gradients reduce globally because the batch axis is sharded under
GSPMD (no explicit allreduce). The CAM warm-up (`:350-353`: only cls_loss for the first
cam_iters) is a traced weight switch so there is exactly one compiled program.
"""
from __future__ import annotations

from functools import partial
from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..losses import wsss as LW
from ..losses.energy import get_energy_loss
from ..models.refine import varm_refine
from ..ops.image import resize_bilinear_auto
from ..wsss import camutils as CU
from .state import TrainState


class SCDConfig(NamedTuple):
    num_classes: int = 21
    crop_size: int = 320
    cam_scales: tuple = (1.0, 0.5, 1.5)
    bkg_score: float = 0.45
    high_thre: float = 0.55
    low_thre: float = 0.35
    ignore_index: int = 255
    cam_iters: int = 2000
    varm_dilations: tuple = (1, 2, 4, 8, 12, 24)
    varm_iters: int = 10
    energy_weight: float = 1e-7
    w_seg: float = 0.1
    w_energy: float = 0.01
    w_aux: float = 0.1
    w_corr: float = 0.1
    w_er: float = 0.1
    corr_samples: int = 40
    mean: tuple = (123.675, 116.28, 103.53)
    std: tuple = (58.395, 57.12, 57.375)
    attn_radius: int = 8
    # static cap on present classes per image for the refine gather
    # (camutils.refine_cams_with_bkg_v2): None = all; VOC images have
    # <= ~6, so 8 bounds the propagated channels at a 2.5x+ saving
    max_present: int | None = None
    energy_method: str = "grid"


def _attn_mask(cfg: SCDConfig) -> jnp.ndarray:
    s = cfg.crop_size // 16
    return jnp.asarray(CU.get_mask_by_radius(s, s, cfg.attn_radius))


def scd_losses(variables, apply_fn, batch, key, cfg: SCDConfig, attn_mask,
               train: bool = True, cam_apply_fn=None):
    """Compute the six SCD losses + diagnostics for one batch.
    batch: dict(image (B,H,W,3) normalized, cls_label (B,C-1), img_box (B,4))."""
    inputs = batch["image"]
    cls_labels = batch["cls_label"]
    img_box = batch["img_box"]
    B, H, W, _ = inputs.shape

    drop_key, corr_key = jax.random.split(key)

    def full_apply(v, x):
        return apply_fn(
            v, x, train=train,
            rngs={"dropout": drop_key} if train else None,
            mutable=["batch_stats"] if train else False,
        )

    # no-grad inference over the same params (`utils/camutils.py:88,118`
    # torch.no_grad) — params/inputs stop-gradient so autodiff never enters, and
    # may run through a fused twin with collect_attns="none" (the ref mat is
    # discarded below)
    sg_vars = jax.lax.stop_gradient(variables)
    cam_fn = lambda x: (cam_apply_fn or apply_fn)(
        sg_vars, jax.lax.stop_gradient(x), cam_only=True)

    # main forward
    out = full_apply(variables, inputs)
    (cls_logits, segs, attns, attn_pred), mutated = out if train else (out, {})

    # multi-scale CAMs at full and 0.3 scale (`dist_train_voc.py:311-324`)
    cams, _ = CU.multi_scale_cam_with_ref_mat(cam_fn, inputs, cfg.cam_scales)
    inputs2 = resize_bilinear_auto(inputs, (int(H * 0.3), int(W * 0.3)), align_corners=True)
    out2 = full_apply(variables, inputs2)
    (_, segs2, _, _), _ = out2 if train else (out2, {})
    cams2 = CU.multi_scale_cam(cam_fn, inputs2, cfg.cam_scales)
    cams1 = resize_bilinear_auto(cams, cams2.shape[1:3], align_corners=True)
    loss_er = LW.equivariance_loss(cams1[..., 1:], cams2[..., 1:])

    segs_up = resize_bilinear_auto(segs, (H, W), align_corners=True)
    segs2_up = resize_bilinear_auto(segs2, cams2.shape[1:3], align_corners=True)
    loss_corr = LW.contrastive_corr_loss(
        corr_key, cams, cams2, segs_up, segs2_up, n_samples=cfg.corr_samples
    )

    # pseudo labels + VARM refine (`:312,334`)
    valid_cam, pseudo_label = CU.cam_to_label(
        cams, cls_labels, img_box, ignore_mid=True,
        bkg_score=cfg.bkg_score, high_thre=cfg.high_thre, low_thre=cfg.low_thre,
        ignore_index=cfg.ignore_index,
    )
    inputs_denorm = inputs * jnp.asarray(cfg.std) + jnp.asarray(cfg.mean)
    refine_fn = lambda im, m: varm_refine(
        im, m, dilations=cfg.varm_dilations, num_iter=cfg.varm_iters
    )
    refined_label = CU.refine_cams_with_bkg_v2(
        refine_fn, inputs_denorm, jax.lax.stop_gradient(cams), cls_labels, img_box,
        high_thre=cfg.high_thre, low_thre=cfg.low_thre, ignore_index=cfg.ignore_index,
        max_present=cfg.max_present,
    )
    refined_label = jax.lax.stop_gradient(refined_label)

    ref_label = CU.cams_to_refine_label(
        refined_label, mask=attn_mask, ignore_index=cfg.ignore_index, down=16
    )
    loss_aux, pos_count, neg_count = LW.aux_loss(attn_pred, ref_label)

    loss_seg = LW.seg_loss(segs_up, refined_label, cfg.ignore_index)
    loss_energy = get_energy_loss(
        inputs, segs_up, refined_label, img_box,
        mean=cfg.mean, std=cfg.std,
        weight=cfg.energy_weight, method=cfg.energy_method,
    )
    loss_cls = LW.multilabel_soft_margin_loss(cls_logits, cls_labels)

    losses = {
        "cls": loss_cls, "seg": loss_seg, "energy": loss_energy,
        "aux": loss_aux, "corr": loss_corr, "er": loss_er,
    }
    aux_out = {
        "mutated": mutated, "pseudo_label": pseudo_label,
        "refined_label": refined_label, "segs": segs_up, "cams": cams,
    }
    return losses, aux_out


def scd_total_loss(losses: dict, step, cfg: SCDConfig):
    """Warm-up schedule (`dist_train_voc.py:350-353`)."""
    warm = (step <= cfg.cam_iters).astype(jnp.float32)
    full = 1.0 - warm
    return (
        1.0 * losses["cls"]
        + full * (
            cfg.w_seg * losses["seg"]
            + cfg.w_energy * losses["energy"]
            + cfg.w_aux * losses["aux"]
            + cfg.w_corr * losses["corr"]
            + cfg.w_er * losses["er"]
        )
    )


def make_scd_train_step(apply_fn, cfg: SCDConfig, cam_apply_fn=None):
    attn_mask = _attn_mask(cfg)

    @jax.jit
    def train_step(state: TrainState, batch, key):
        def loss_fn(params):
            variables = {"params": params}
            if state.batch_stats:
                variables["batch_stats"] = state.batch_stats
            losses, aux = scd_losses(variables, apply_fn, batch, key, cfg, attn_mask,
                                     train=True, cam_apply_fn=cam_apply_fn)
            total = scd_total_loss(losses, state.step, cfg)
            return total, (losses, aux)

        (total, (losses, aux)), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
        new_bs = aux["mutated"].get("batch_stats", state.batch_stats)
        new_state = state.apply_gradients(grads, new_batch_stats=new_bs)
        metrics = {k: v for k, v in losses.items()}
        metrics["total"] = total
        return new_state, metrics

    return train_step


def _down_size(h: int, stride: int = 16) -> int:
    """`dist_train_voc.py:89-93` get_down_size: feature-grid extent at stride 16."""
    return h // stride + 1 - (h % stride == 0)


def make_scd_eval_step(apply_fn, cfg: SCDConfig):
    """Validation forward (`dist_train_voc.py:95-146`): seg argmax + multi-scale CAM
    pseudo labels + affinity-propagated "ref" labels (the reference's third score
    stream, `:122-142`). Returns device arrays; metric accumulation happens outside."""

    @jax.jit
    def eval_step(variables, batch):
        inputs = batch["image"]
        cls_labels = batch["cls_label"]
        B, H, W, _ = inputs.shape
        cls_logits, segs, attns, attn_pred = apply_fn(variables, inputs, train=False)
        segs_up = resize_bilinear_auto(segs, (H, W), align_corners=False)
        cam_fn = lambda x: apply_fn(variables, x, cam_only=True)
        cams = CU.multi_scale_cam(cam_fn, inputs, cfg.cam_scales)
        cam_label = CU.cam_to_label(cams, cls_labels, img_box=None, bkg_score=cfg.bkg_score)
        # ref stream (`:122-130`): raw (un-class-masked) CAM down to the stride-16
        # grid, random-walked through the predicted affinity under a radius mask,
        # bkg_score hard-coded 0.35 in the reference call
        h16, w16 = _down_size(H), _down_size(W)
        infer_mask = jnp.asarray(CU.get_mask_by_radius(h16, w16, cfg.attn_radius))
        cam16 = resize_bilinear_auto(cams, (h16, w16), align_corners=False)
        ref_cam = CU.propagate_ref_cam_with_bkg(
            cam16, attn_pred, cls_labels, bkg_score=0.35, mask=infer_mask)
        ref_cam = resize_bilinear_auto(ref_cam, (H, W), align_corners=False)
        return {
            "seg_pred": segs_up.argmax(-1),
            "cam_label": cam_label,
            "ref_label": ref_cam.argmax(-1),
            "cls_pred": (cls_logits > 0).astype(jnp.int32),
        }

    return eval_step
