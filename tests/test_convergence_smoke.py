"""Multi-step convergence smokes (VERDICT round-2 item 8).

The 2-3-step trainer tests catch wiring bugs but not schedule/state bugs that
only surface over many steps (lr-schedule direction, BN-stat drift, optimizer
state corruption, loss-weight gating). These run a few hundred steps on tiny
synthetic geometry per flagship and assert (a) the smoothed total loss
decreases substantially and (b) train-set segmentation quality improves —
matching the reference's observable training behavior
(`SCD-AAAI2023/scripts/dist_train_voc.py:296-360`,
`RSSFormer-TIP2023/train.py` epoch loop).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.slow


def _smoothed(xs, k=20):
    xs = np.asarray(xs, np.float64)
    kern = np.ones(k) / k
    return np.convolve(xs, kern, mode="valid")


def _synthetic_seg_batch(rng, batch, size, num_classes, ignore_index):
    """Learnable synthetic task: class = which quadrant-ish blob dominates, with
    the image channels carrying the class signal (so loss CAN go to ~0)."""
    ys, xs = np.mgrid[0:size, 0:size]
    imgs = np.zeros((batch, size, size, 3), np.float32)
    masks = np.zeros((batch, size, size), np.int32)
    for b in range(batch):
        cx, cy = rng.integers(8, size - 8, 2)
        r = rng.integers(6, size // 2)
        blob = ((xs - cx) ** 2 + (ys - cy) ** 2) < r * r
        cls = int(rng.integers(1, num_classes))
        masks[b] = np.where(blob, cls, 0)
        imgs[b, ..., 0] = blob * (cls / num_classes) * 2 - 1
        imgs[b] += rng.standard_normal((size, size, 3)) * 0.05
    return imgs, masks


def test_rssformer_300step_convergence():
    from representationlearning_tpu.models.rssformer import HRNetFusion
    from representationlearning_tpu.train.rssformer import (
        RSSFormerTrainConfig, create_rssformer_state, make_rssformer_train_step,
    )

    num_classes, size, batch = 4, 64, 4
    cfg = RSSFormerTrainConfig(num_classes=num_classes, max_iters=300,
                               base_lr=0.02)
    model = HRNetFusion(hrnet_type="hrnetv2_w18", classes=num_classes)
    state = create_rssformer_state(model, (size, size, 3), cfg)
    step_fn = make_rssformer_train_step(model, cfg)

    rng = np.random.default_rng(0)
    imgs, masks = _synthetic_seg_batch(rng, batch, size, num_classes, -1)
    batch_d = {"image": jnp.asarray(imgs), "mask": jnp.asarray(masks)}

    losses = []
    for i in range(300):
        state, metrics = step_fn(state, batch_d, jax.random.PRNGKey(i))
        losses.append(float(metrics["total"]))
    sm = _smoothed(losses)
    assert np.isfinite(losses).all()
    # smoothed loss must drop by >50% and end near its minimum (no divergence)
    assert sm[-1] < 0.5 * sm[0], (sm[0], sm[-1])
    assert sm[-1] < 1.5 * sm.min() + 1e-3, (sm[-1], sm.min())

    # train-set quality: prediction should recover the blobs
    variables = {"params": state.params}
    if state.batch_stats:
        variables["batch_stats"] = state.batch_stats
    logits = jax.jit(lambda v, x: model.apply(v, x, train=False))(
        variables, batch_d["image"])
    pred = np.asarray(logits.argmax(-1))
    acc = (pred == masks).mean()
    assert acc > 0.85, acc


def test_rml_300step_convergence():
    """RML mirror of the SCD smoke: the supervised multilabel cls loss must
    collapse and the warmup-gated MI mix must not diverge after the gate opens
    (`RML/scripts/dist_train_voc.py:321-401` loss mix + warmup gate)."""
    from representationlearning_tpu.models.rml import RMLModel
    from representationlearning_tpu.train.optim import (
        make_poly_warmup_adamw, tscd_param_labels,
    )
    from representationlearning_tpu.train.rml import RMLConfig, make_rml_train_step
    from representationlearning_tpu.train.state import TrainState

    num_classes, size, batch = 4, 64, 2
    cfg = RMLConfig(num_classes=num_classes, crop_size=size, cam_iters=50,
                    cam_scales=(1.0, 0.5), par_dilations=(1, 2), par_iters=2)
    model = RMLModel(backbone="mit_b0", num_classes=num_classes,
                     seg_classes=num_classes)

    rng = np.random.default_rng(2)
    imgs, masks = _synthetic_seg_batch(rng, batch, size, num_classes - 1, 255)
    cls_label = np.zeros((batch, num_classes - 1), np.float32)
    for b in range(batch):
        for c in np.unique(masks[b]):
            if c > 0:
                cls_label[b, c - 1] = 1.0
    box = np.tile(np.array([0, size, 0, size], np.int32), (batch, 1))
    batch_d = {"image": jnp.asarray(imgs), "cls_label": jnp.asarray(cls_label),
               "img_box": jnp.asarray(box)}

    variables = model.init(jax.random.PRNGKey(0), batch_d["image"][:1])
    tx = make_poly_warmup_adamw(
        3e-4, 0.01, warmup_iter=30, max_iter=300,
        param_labels=tscd_param_labels(variables["params"]),
    )
    state = TrainState.create(model.apply, variables, tx)
    step_fn = make_rml_train_step(model.apply, cfg)

    cls_losses, totals = [], []
    for i in range(300):
        state, metrics = step_fn(state, batch_d, jax.random.PRNGKey(i))
        cls_losses.append(float(metrics["cls"]))
        totals.append(float(metrics["total"]))
    assert np.isfinite(totals).all()
    sm_cls = _smoothed(cls_losses)
    assert sm_cls[-1] < 0.3 * sm_cls[0], (sm_cls[0], sm_cls[-1])
    # after the cam_iters gate opens the MI terms join the mix; the total must
    # still end below its start and must not blow up late
    sm_tot = _smoothed(totals)
    assert sm_tot[-1] < sm_tot[0], (sm_tot[0], sm_tot[-1])
    # late-divergence guard, sign-safe (MI rewards drive the total negative):
    # the final smoothed total must sit within 10% of the observed range above
    # the best value seen
    rng_tot = sm_tot.max() - sm_tot.min()
    assert sm_tot[-1] < sm_tot.min() + 0.1 * rng_tot + 1e-3, (
        sm_tot[-1], sm_tot.min(), rng_tot)


def test_drfl_200step_convergence():
    """DRFL/DCL supervised smoke: dice+bce on synthetic blob pairs must drop
    >50% and train-set Dice must improve over init (`model_dcl.py` generator
    loss; linear-decay schedule active throughout)."""
    from representationlearning_tpu.models.dcl import Softnet
    from representationlearning_tpu.train.drfl import (
        DRFLConfig, create_drfl_state, make_drfl_train_step, validate,
    )

    size, batch = 64, 2
    rng = np.random.default_rng(3)
    ys, xs = np.mgrid[0:size, 0:size]
    A = np.zeros((batch, size, size, 3), np.float32)
    Bm = np.zeros((batch, size, size, 1), np.float32)
    for b in range(batch):
        cx, cy = rng.integers(12, size - 12, 2)
        r = int(rng.integers(8, size // 3))
        blob = (((xs - cx) ** 2 + (ys - cy) ** 2) < r * r).astype(np.float32)
        Bm[b, ..., 0] = blob
        A[b, ..., 0] = blob * 2 - 1
        A[b] += rng.standard_normal((size, size, 3)).astype(np.float32) * 0.05
    # dataset convention: A in [-1,1]; B stored in [-1,1]; C = SR prior at 2x
    Bt = Bm * 2.0 - 1.0
    C = np.repeat(np.repeat(Bm, 2, axis=1), 2, axis=2)
    batch_d = {"A": jnp.asarray(A), "B": jnp.asarray(Bt), "C": jnp.asarray(C)}

    model = Softnet(input_nc=3, num_vit_layers=1)
    cfg = DRFLConfig(lr=2e-4)
    state = create_drfl_state(model, (size, size, 3), cfg, steps_per_epoch=1)
    step_fn = make_drfl_train_step(model)

    def train_dice(st):
        variables = {"params": st.params}
        if st.batch_stats:
            variables["batch_stats"] = st.batch_stats
        return validate(model, variables, [batch_d])["dice"]

    dice0 = train_dice(state)
    losses = []
    for i in range(200):
        state, metrics = step_fn(state, batch_d, jax.random.PRNGKey(i))
        losses.append(float(metrics["total"]))
    assert np.isfinite(losses).all()
    sm = _smoothed(losses)
    assert sm[-1] < 0.5 * sm[0], (sm[0], sm[-1])
    assert sm[-1] < 1.5 * sm.min() + 1e-3, (sm[-1], sm.min())
    dice1 = train_dice(state)
    assert dice1 > dice0 + 0.05 or dice1 > 0.9, (dice0, dice1)


def test_scd_300step_convergence():
    from representationlearning_tpu.models.tscd import TSCD
    from representationlearning_tpu.train.optim import (
        make_poly_warmup_adamw, tscd_param_labels,
    )
    from representationlearning_tpu.train.scd import SCDConfig, make_scd_train_step
    from representationlearning_tpu.train.state import TrainState

    num_classes, size, batch = 4, 64, 2
    cfg = SCDConfig(num_classes=num_classes, crop_size=size, cam_iters=50,
                    corr_samples=6, varm_dilations=(1, 2), varm_iters=2,
                    cam_scales=(1.0, 0.5))
    model = TSCD(backbone="mit_b0", num_classes=num_classes)

    rng = np.random.default_rng(1)
    imgs, masks = _synthetic_seg_batch(rng, batch, size, num_classes - 1, 255)
    cls_label = np.zeros((batch, num_classes - 1), np.float32)
    for b in range(batch):
        for c in np.unique(masks[b]):
            if c > 0:
                cls_label[b, c - 1] = 1.0
    box = np.tile(np.array([0, size, 0, size], np.int32), (batch, 1))
    batch_d = {"image": jnp.asarray(imgs), "cls_label": jnp.asarray(cls_label),
               "img_box": jnp.asarray(box)}

    variables = model.init(jax.random.PRNGKey(0), batch_d["image"][:1])
    tx = make_poly_warmup_adamw(
        3e-4, 0.01, warmup_iter=30, max_iter=300,
        param_labels=tscd_param_labels(variables["params"]),
    )
    state = TrainState.create(model.apply, variables, tx)
    step_fn = make_scd_train_step(model.apply, cfg)

    from representationlearning_tpu.wsss.camutils import cam_to_label, multi_scale_cam

    def pseudo_fg_recall(params):
        cam_fn = jax.jit(lambda a: model.apply({"params": params}, a, cam_only=True))
        cams = multi_scale_cam(cam_fn, batch_d["image"], cfg.cam_scales)
        _, pseudo = cam_to_label(cams, batch_d["cls_label"],
                                 img_box=batch_d["img_box"],
                                 bkg_score=cfg.bkg_score)
        pseudo = np.asarray(pseudo)
        fg = masks > 0
        return (pseudo[fg] > 0).mean() if fg.any() else 1.0

    recall0 = pseudo_fg_recall(state.params)

    cls_losses, totals = [], []
    for i in range(300):
        state, metrics = step_fn(state, batch_d, jax.random.PRNGKey(i))
        cls_losses.append(float(metrics["cls"]))
        totals.append(float(metrics["total"]))
    assert np.isfinite(totals).all()
    sm_cls = _smoothed(cls_losses)
    # the supervised signal (multilabel cls) must collapse; the full mix
    # includes self-supervised terms whose floor is nonzero, so assert the
    # smoothed total decreases and does not diverge after the cam gate opens
    assert sm_cls[-1] < 0.3 * sm_cls[0], (sm_cls[0], sm_cls[-1])
    sm_tot = _smoothed(totals)
    assert sm_tot[-1] < sm_tot[0], (sm_tot[0], sm_tot[-1])

    # CAM quality on the train batch must IMPROVE over init (absolute recall of
    # a stage-4 CAM on 64^2 synthetic blobs is crude by construction — the
    # meaningful guarantee is that training moves it the right way)
    recall1 = pseudo_fg_recall(state.params)
    assert recall1 > recall0 + 0.05 or recall1 > 0.8, (recall0, recall1)
