"""RML trainer — the SCD loop with the three mutual-learning losses
(`RML/scripts/dist_train_voc.py:321-401`): CIML (cross-scale CAM consistency), MFML
(seg-feature mutual learning with 100x KL MI), APML (affinity aux loss minus 100x
(feat-label MI - feat-feat MI) in both directions). PAR replaces VARM in the
background-aware refinement (`:22` imports PAR). Loss schedule (`:390-394`):
warmup cls-only, then 1.0 cls + 0.1 APML + 0.1 MFML + 0.1 CIML.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..losses import mi as MI
from ..losses import wsss as LW
from ..models.refine import par_refine
from ..ops.image import resize_bilinear_auto
from ..wsss import camutils as CU
from .state import TrainState


class RMLConfig(NamedTuple):
    num_classes: int = 21
    crop_size: int = 320
    cam_scales: tuple = (0.5, 1.0, 1.5)
    bkg_score: float = 0.45
    high_thre: float = 0.55
    low_thre: float = 0.35
    ignore_index: int = 255
    cam_iters: int = 2000
    par_dilations: tuple = (1, 2, 4, 8, 12, 24)
    par_iters: int = 10
    w_apml: float = 0.1
    w_mfml: float = 0.1
    w_ciml: float = 0.1
    mean: tuple = (123.675, 116.28, 103.53)
    std: tuple = (58.395, 57.12, 57.375)
    attn_radius: int = 8
    # static cap on present classes per image for the refine gather
    # (camutils.refine_cams_with_bkg_v2): None = all; VOC images have
    # <= ~6, so 8 bounds the propagated channels at a 2.5x+ saving
    max_present: int | None = None


def rml_losses(variables, apply_fn, batch, key, cfg: RMLConfig, attn_mask, train=True,
               cam_apply_fn=None):
    inputs = batch["image"]
    cls_labels = batch["cls_label"]
    img_box = batch["img_box"]
    B, H, W, _ = inputs.shape
    drop_key = key

    def full_apply(v, x):
        return apply_fn(
            v, x, train=train,
            rngs={"dropout": drop_key} if train else None,
            mutable=["batch_stats"] if train else False,
        )

    # the cam-only forwards are no-grad inference over the SAME params
    # (`utils/camutils.py:88,118` torch.no_grad), so their params/inputs are
    # stop-gradient here (keeps autodiff out of them entirely) and they may run
    # through a fused-kernel twin (identical param tree, e.g.
    # RMLModel(fused_blocks=True, collect_attns="none")) — they dominate the
    # step's encoder FLOPs (6 flip-pair forwards at up to 1.5x resolution) and
    # their exact-GELU/LN HBM passes were 30%+ of the measured step (PERF.md r4)
    sg_vars = jax.lax.stop_gradient(variables)
    cam_fn = lambda x: (cam_apply_fn or apply_fn)(
        sg_vars, jax.lax.stop_gradient(x), cam_only=True)

    out = full_apply(variables, inputs)
    (cls_logits, segs, attns, attn_pred), mutated = out if train else (out, {})

    cams, _ = CU.multi_scale_cam_with_ref_mat(cam_fn, inputs, cfg.cam_scales)
    sf = 0.3
    small = (int(H * sf), int(W * sf))
    img2 = resize_bilinear_auto(inputs, small, align_corners=True)
    out2 = full_apply(variables, img2)
    (_, segs2, _, attn_pred2), _ = out2 if train else (out2, {})
    cams2 = CU.multi_scale_cam(cam_fn, img2, cfg.cam_scales)
    cams1 = resize_bilinear_auto(cams, small, align_corners=True)

    loss_ciml = MI.ciml_loss(cams1, cams2)

    segs_up = resize_bilinear_auto(segs, (H, W), align_corners=True)
    segs2_up = resize_bilinear_auto(segs2, small, align_corners=True)
    segs1 = resize_bilinear_auto(segs_up, small, align_corners=True)
    loss_mfml = MI.mfml_loss(segs1, segs2_up)

    inputs_denorm = inputs * jnp.asarray(cfg.std) + jnp.asarray(cfg.mean)
    refine_fn = lambda im, m: par_refine(im, m, dilations=cfg.par_dilations,
                                         num_iter=cfg.par_iters)
    refined_label = CU.refine_cams_with_bkg_v2(
        refine_fn, inputs_denorm, jax.lax.stop_gradient(cams), cls_labels, img_box,
        high_thre=cfg.high_thre, low_thre=cfg.low_thre, ignore_index=cfg.ignore_index,
        max_present=cfg.max_present,
    )
    refined_label = jax.lax.stop_gradient(refined_label)
    ref_label = CU.cams_to_refine_label(refined_label, mask=attn_mask,
                                        ignore_index=cfg.ignore_index, down=16)
    loss_apml_aux, _, _ = LW.aux_loss(attn_pred, ref_label)
    loss_apml = loss_apml_aux + MI.apml_mi_terms(attn_pred, attn_pred2, refined_label)

    loss_cls = LW.multilabel_soft_margin_loss(cls_logits, cls_labels)
    losses = {"cls": loss_cls, "apml": loss_apml, "mfml": loss_mfml, "ciml": loss_ciml}
    return losses, {"mutated": mutated, "refined_label": refined_label, "segs": segs_up}


def make_rml_train_step(apply_fn, cfg: RMLConfig, cam_apply_fn=None):
    attn_mask = jnp.asarray(
        CU.get_mask_by_radius(cfg.crop_size // 16, cfg.crop_size // 16, cfg.attn_radius)
    )

    @jax.jit
    def train_step(state: TrainState, batch, key):
        def loss_fn(params):
            variables = {"params": params}
            if state.batch_stats:
                variables["batch_stats"] = state.batch_stats
            losses, aux = rml_losses(variables, apply_fn, batch, key, cfg, attn_mask,
                                     cam_apply_fn=cam_apply_fn)
            warm = (state.step <= cfg.cam_iters).astype(jnp.float32)
            full = 1.0 - warm
            total = losses["cls"] + full * (
                cfg.w_apml * losses["apml"] + cfg.w_mfml * losses["mfml"]
                + cfg.w_ciml * losses["ciml"]
            )
            return total, (losses, aux)

        (total, (losses, aux)), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
        new_bs = aux["mutated"].get("batch_stats", state.batch_stats)
        new_state = state.apply_gradients(grads, new_batch_stats=new_bs)
        metrics = dict(losses)
        metrics["total"] = total
        return new_state, metrics

    return train_step
