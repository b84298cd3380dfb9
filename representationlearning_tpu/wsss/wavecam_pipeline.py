"""WaveCAM multi-stage WSSS pipeline — parity with `WaveCAM-TMM2023/run_wavecam_voc.py`
(boolean pass gates at `:82-92`, stage order `:114-167`), with inter-stage state on the
filesystem exactly like the reference (`.npy` CAM dicts, `.png` labels, checkpoints),
so every stage is resumable.

Stages: train_cam -> train_wavecam -> make_cam / make_wavecam -> eval_cam ->
cam_to_ir_label -> train_irn -> make_sem_seg_labels -> eval_sem_seg.

TPU redesign: stage trainers are single-jit steps; MSF inference jits per size bucket;
the (HW)^2 random walk is a dense on-device matmul-power chain; CRF runs via the
on-device mean-field solver instead of pydensecrf; the reference's per-GPU
multiprocessing.spawn sharding is replaced by mesh data-parallel batches.
"""
from __future__ import annotations

import os
from dataclasses import dataclass, field
from functools import partial
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..core.logging import AverageMeter, Timer, setup_logger
from ..data import transforms as T
from ..data.voc import BatchLoader, SyntheticSegSource, VOC12Source, cls_onehot_from_mask
from ..losses.wsss import multilabel_soft_margin_loss
from ..metrics.seg import scores_from_hist, _fast_hist
from ..models.irn import AffinityDisplacementHead, IRNNet, edge_displacement_infer, irn_total_loss
from ..models.resnet import Net
from ..models.wavecam import ClassPredictorWavecam
from ..ops.crf import crf_inference_label
from ..ops.image import resize_bilinear_auto
from ..train.optim import make_sgd, poly_schedule
from ..wsss import msf
from ..wsss.indexing import GetAffinityLabelFromIndices, PathIndex, propagate_to_edge


@dataclass
class WaveCAMConfig:
    work_dir: str = "work_wavecam"
    n_classes: int = 20  # foreground classes
    crop_size: int = 512
    cam_scales: tuple = (1.0, 0.5, 1.5, 2.0)
    cam_batch_size: int = 16
    cam_epochs: int = 5
    cam_lr: float = 0.1
    cam_wd: float = 1e-4
    wavecam_lr: float = 0.01
    wavecam_epochs: int = 5
    wavecam_loss_weight: float = 1.0
    cam_eval_thres: float = 0.21
    conf_fg_thres: float = 0.35
    conf_bg_thres: float = 0.1
    irn_crop_size: int = 512
    irn_batch_size: int = 32
    irn_epochs: int = 3
    irn_lr: float = 0.1
    irn_wd: float = 1e-4
    beta: float = 10.0
    exp_times: int = 8
    sem_seg_bg_thres: float = 0.28
    rw_radius: int = 5
    irn_radius: float = 10.0
    # bilateral backend for the CRF stages: "grid" (on-device bilateral grid)
    # or "native" (exact C++ permutohedral lattice — pydensecrf's own backend
    # family, `misc/imutils.py:156`). Label-level agreement between the two is
    # measured in tests/test_indexing_crf.py::test_crf_label_grid_vs_native.
    crf_method: str = "grid"
    seed: int = 0
    # synthetic-data knobs (used when no VOC root is given)
    synthetic_n: int = 16
    synthetic_size: tuple = (64, 64)
    voc12_root: str | None = None
    coco_root: str | None = None  # run_wavecam_coco.py equivalent: COCO-14 source
    name_list_dir: str | None = None
    split: str = "train_aug"

    def dir(self, sub):
        p = os.path.join(self.work_dir, sub)
        os.makedirs(p, exist_ok=True)
        return p


class WaveCAMPipeline:
    def __init__(self, cfg: WaveCAMConfig):
        self.cfg = cfg
        self.log = setup_logger("wavecam")
        if cfg.coco_root and os.path.isdir(os.path.join(cfg.coco_root, "JPEGImages")):
            from ..data.coco import CocoSource

            self.source = CocoSource(cfg.coco_root, cfg.name_list_dir,
                                     cfg.split.replace("_aug", ""))
        elif cfg.voc12_root and os.path.isdir(os.path.join(cfg.voc12_root, "JPEGImages")):
            self.source = VOC12Source(cfg.voc12_root, cfg.name_list_dir, cfg.split)
        else:
            self.source = SyntheticSegSource(
                n=cfg.synthetic_n, size=cfg.synthetic_size, num_classes=cfg.n_classes + 1
            )

    # ------------------------------------------------------------------ data helpers
    def _cls_samples(self, crop: int, aug: bool = True):
        """(name, normalized image crop, cls onehot) samples (reference
        `VOC12ClassificationDataset` with resize_long + flip + random crop)."""
        for idx in range(len(self.source)):
            name, img, mask = self.source.get(idx)
            onehot = cls_onehot_from_mask(mask, self.cfg.n_classes + 1)
            rng = np.random.default_rng((self.cfg.seed << 16) ^ idx)
            im = img.astype(np.float32)
            if aug:
                im = T.random_fliplr(rng, im)
                im, _ = T.random_crop(rng, im, None, crop_size=crop, mean_rgb=(0, 0, 0))
            im = T.normalize_img(im)
            yield name, im, onehot.astype(np.float32)

    def _batches(self, crop: int, batch_size: int, epochs: int):
        samples = list(self._cls_samples(crop))
        rng = np.random.default_rng(self.cfg.seed)
        for _ in range(epochs):
            order = rng.permutation(len(samples))
            for i in range(0, len(order) - batch_size + 1, batch_size):
                chunk = [samples[j] for j in order[i : i + batch_size]]
                yield (
                    [c[0] for c in chunk],
                    np.stack([c[1] for c in chunk]),
                    np.stack([c[2] for c in chunk]),
                )

    # ------------------------------------------------------------------- stage 1: cam
    def train_cam(self):
        cfg = self.cfg
        model = Net(stride=16, n_classes=cfg.n_classes)
        x0 = jnp.zeros((1, cfg.crop_size, cfg.crop_size, 3))
        variables = model.init(jax.random.PRNGKey(cfg.seed), x0)
        n_batches = max(len(self.source) // cfg.cam_batch_size, 1)
        max_step = n_batches * cfg.cam_epochs
        tx = make_sgd(cfg.cam_lr, cfg.cam_wd, schedule=poly_schedule(cfg.cam_lr, max_step))
        opt_state = tx.init(variables["params"])

        @jax.jit
        def step(params, opt_state, img, label):
            def loss_fn(p):
                logits = model.apply({"params": p, "batch_stats": variables["batch_stats"]}, img)
                return multilabel_soft_margin_loss(logits, label)

            loss, grads = jax.value_and_grad(loss_fn)(params)
            updates, opt_state = tx.update(grads, opt_state, params)
            import optax

            return optax.apply_updates(params, updates), opt_state, loss

        params = variables["params"]
        meter = AverageMeter()
        for i, (_, img, label) in enumerate(self._batches(cfg.crop_size, cfg.cam_batch_size, cfg.cam_epochs)):
            params, opt_state, loss = step(params, opt_state, jnp.asarray(img), jnp.asarray(label))
            meter.add(loss=float(loss))
        self.log.info("train_cam done: loss=%.4f", meter.get("loss"))
        variables = {"params": params, "batch_stats": variables["batch_stats"]}
        np.save(os.path.join(cfg.dir("weights"), "cam.npy"),
                jax.tree_util.tree_map(np.asarray, variables), allow_pickle=True)
        return variables

    def _load(self, name):
        return np.load(os.path.join(self.cfg.dir("weights"), name), allow_pickle=True).item()

    # -------------------------------------------------------------- stage 2: wavecam
    def train_wavecam(self):
        cfg = self.cfg
        model = Net(stride=16, n_classes=cfg.n_classes)
        variables = self._load("cam.npy")
        feat_hw = cfg.crop_size // 16
        # representation_size is the backbone feature dim (2048); the predictor maps
        # the wave output onto it via the canonical 32x32 grid (2*32*32 == 2048)
        pred = ClassPredictorWavecam(cfg.n_classes, representation_size=2048)
        x0 = jnp.zeros((1, cfg.n_classes, 2048))
        c0 = jnp.zeros((1, feat_hw, feat_hw, cfg.n_classes))
        pvars = pred.init(jax.random.PRNGKey(cfg.seed + 1), x0, jnp.ones((1, cfg.n_classes)), c0)

        n_batches = max(len(self.source) // cfg.cam_batch_size, 1)
        max_step = n_batches * cfg.wavecam_epochs
        tx = make_sgd(cfg.wavecam_lr, cfg.cam_wd, schedule=poly_schedule(cfg.wavecam_lr, max_step))
        # joint params: backbone at 0.1x lr handled by schedule simplification (the
        # reference scales backbone groups by 0.1, `train_wavecam.py:72-75`)
        joint = {"net": variables["params"], "pred": pvars["params"]}
        opt_state = tx.init(joint)

        @jax.jit
        def step(joint, pred_bs, opt_state, img, label):
            def loss_fn(j):
                nv = {"params": j["net"], "batch_stats": variables["batch_stats"]}
                logits, cf, cams = model.apply(nv, img, method=Net.cam_feature)
                loss_cls = multilabel_soft_margin_loss(logits, label)
                pv = {"params": j["pred"], "batch_stats": pred_bs}
                (loss_ce, acc), mut = pred.apply(
                    pv, cf, label, cams, train=True, mutable=["batch_stats"]
                )
                return loss_cls + cfg.wavecam_loss_weight * loss_ce, (loss_cls, loss_ce, acc, mut)

            (loss, (lc, le, acc, mut)), grads = jax.value_and_grad(loss_fn, has_aux=True)(joint)
            import optax

            updates, opt_state = tx.update(grads, opt_state, joint)
            return optax.apply_updates(joint, updates), mut["batch_stats"], opt_state, (loss, lc, le, acc)

        pred_bs = pvars.get("batch_stats", {})
        meter = AverageMeter()
        for _, img, label in self._batches(cfg.crop_size, cfg.cam_batch_size, cfg.wavecam_epochs):
            joint, pred_bs, opt_state, (loss, lc, le, acc) = step(
                joint, pred_bs, opt_state, jnp.asarray(img), jnp.asarray(label)
            )
            meter.add(loss=float(loss), acc=float(acc))
        self.log.info("train_wavecam done: loss=%.4f acc=%.4f", meter.get("loss"), meter.get("acc"))
        np.save(os.path.join(cfg.dir("weights"), "wavecam.npy"),
                jax.tree_util.tree_map(np.asarray, {
                    "net": {"params": joint["net"], "batch_stats": variables["batch_stats"]},
                    "pred": {"params": joint["pred"], "batch_stats": pred_bs},
                }), allow_pickle=True)

    # ------------------------------------------------------------ stage 3: make cams
    def make_cam(self, use_wave_weight: bool = False):
        cfg = self.cfg
        model = Net(stride=16, n_classes=cfg.n_classes)
        if use_wave_weight:
            w = self._load("wavecam.npy")
            variables = w["net"]
            pred_kernel = w["pred"]["params"]["classifier_kernel"]  # (F, C)
            # forward2: classifier weight elementwise-reweighted by the predictor's
            # (`make_wavecam.py:38`, `resnet50_cam.py:136-147`). The predictor kernel
            # maps features->classes like the classifier, so reweight elementwise.
            base = variables["params"]["classifier"]["kernel"]  # (1,1,F,C)
            reweight = pred_kernel.reshape(1, 1, *pred_kernel.shape)
            cam_kernel = base * reweight
        else:
            variables = self._load("cam.npy")
            cam_kernel = variables["params"]["classifier"]["kernel"]

        cam_fn = jax.jit(lambda pair: model.apply(variables, pair, cam_kernel, method=Net.cam))
        out_dir = cfg.dir("cam")
        for idx in range(len(self.source)):
            name, img, mask = self.source.get(idx)
            onehot = cls_onehot_from_mask(mask, cfg.n_classes + 1)
            im = T.normalize_img(img.astype(np.float32))
            strided, high = msf.msf_cam_single(cam_fn, jnp.asarray(im), cfg.cam_scales)
            d = msf.finalize_cam_dict(strided, high, onehot)
            np.save(os.path.join(out_dir, name + ".npy"), d, allow_pickle=True)
        self.log.info("make_cam done (%d images)", len(self.source))

    # -------------------------------------------------------------- stage 4: eval cam
    def eval_cam(self) -> float:
        cfg = self.cfg
        hist = np.zeros((cfg.n_classes + 1, cfg.n_classes + 1))
        for idx in range(len(self.source)):
            name, img, mask = self.source.get(idx)
            d = np.load(os.path.join(cfg.dir("cam"), name + ".npy"), allow_pickle=True).item()
            pred = msf.cam_dict_to_label(d, cfg.cam_eval_thres)
            hist += _fast_hist(mask.flatten(), pred.flatten(), cfg.n_classes + 1)
        miou = scores_from_hist(hist)["miou"]
        self.log.info("eval_cam miou=%.4f", miou)
        return miou

    # ----------------------------------------------------- stage 5: cam_to_ir_label
    def cam_to_ir_label(self):
        cfg = self.cfg
        out_dir = cfg.dir("ir_label")
        for idx in range(len(self.source)):
            name, img, _ = self.source.get(idx)
            d = np.load(os.path.join(cfg.dir("cam"), name + ".npy"), allow_pickle=True).item()
            cams = d["high_res"]
            keys = np.pad(d["keys"] + 1, (1, 0), mode="constant")
            n_labels = keys.shape[0]

            fg_conf_cam = np.pad(cams, ((1, 0), (0, 0), (0, 0)), constant_values=cfg.conf_fg_thres)
            fg_pred = crf_inference_label(img, np.argmax(fg_conf_cam, 0), n_labels=max(n_labels, 2),
                                          method=cfg.crf_method)
            fg_conf = keys[fg_pred]
            bg_conf_cam = np.pad(cams, ((1, 0), (0, 0), (0, 0)), constant_values=cfg.conf_bg_thres)
            bg_pred = crf_inference_label(img, np.argmax(bg_conf_cam, 0), n_labels=max(n_labels, 2),
                                          method=cfg.crf_method)
            bg_conf = keys[bg_pred]

            conf = fg_conf.copy()
            conf[fg_conf == 0] = 255
            conf[bg_conf + fg_conf == 0] = 0
            np.save(os.path.join(out_dir, name + ".npy"), conf.astype(np.uint8))
        self.log.info("cam_to_ir_label done")

    # ----------------------------------------------------------- stage 6: train irn
    def train_irn(self):
        cfg = self.cfg
        feat = cfg.irn_crop_size // 4
        path_index = PathIndex(radius=cfg.irn_radius, default_size=(feat, feat))
        head = AffinityDisplacementHead(path_index)
        aff_labeler = GetAffinityLabelFromIndices(path_index.src_indices, path_index.dst_indices)

        model = IRNNet()
        x0 = jnp.zeros((1, cfg.irn_crop_size, cfg.irn_crop_size, 3))
        variables = model.init(jax.random.PRNGKey(cfg.seed + 2), x0)

        n_batches = max(len(self.source) // cfg.irn_batch_size, 1)
        max_step = n_batches * cfg.irn_epochs
        tx = make_sgd(cfg.irn_lr, cfg.irn_wd, schedule=poly_schedule(cfg.irn_lr, max_step))
        params = variables["params"]
        opt_state = tx.init(params)

        @jax.jit
        def step(params, opt_state, img, bg_pos, fg_pos, neg):
            def loss_fn(p):
                edge, dp = model.apply(
                    {"params": p, "batch_stats": variables["batch_stats"]}, img
                )
                return irn_total_loss(head, edge, dp, bg_pos, fg_pos, neg)

            (loss, parts), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
            import optax

            updates, opt_state = tx.update(grads, opt_state, params)
            return optax.apply_updates(params, updates), opt_state, loss

        # batches from ir labels
        samples = []
        for idx in range(len(self.source)):
            name, img, _ = self.source.get(idx)
            lab = np.load(os.path.join(cfg.dir("ir_label"), name + ".npy"))
            rng = np.random.default_rng((cfg.seed << 12) ^ idx)
            im, lab2, _ = T.random_crop(
                rng, img.astype(np.float32), lab, crop_size=cfg.irn_crop_size,
                mean_rgb=(0, 0, 0), ignore_index=255,
            )
            im = T.normalize_img(im)
            from PIL import Image

            # reference reduces the ir label by 0.25 with PIL nearest (`dataloader.py:391`)
            reduced = np.asarray(
                Image.fromarray(lab2.astype(np.uint8)).resize((feat, feat), Image.NEAREST)
            )
            samples.append((im, *aff_labeler(reduced)))

        meter = AverageMeter()
        for ep in range(cfg.irn_epochs):
            for i in range(0, len(samples) - cfg.irn_batch_size + 1, cfg.irn_batch_size):
                chunk = samples[i : i + cfg.irn_batch_size]
                img = jnp.asarray(np.stack([c[0] for c in chunk]))
                bg = jnp.asarray(np.stack([c[1] for c in chunk]))
                fg = jnp.asarray(np.stack([c[2] for c in chunk]))
                ng = jnp.asarray(np.stack([c[3] for c in chunk]))
                params, opt_state, loss = step(params, opt_state, img, bg, fg, ng)
                meter.add(loss=float(loss))
        self.log.info("train_irn done: loss=%.4f", meter.get("loss"))

        # MeanShift calibration (`train_irn.py:95-110`): mean displacement over data
        dp_means = []
        infer = jax.jit(lambda v, x: model.apply(v, x))
        variables = {"params": params, "batch_stats": variables["batch_stats"]}
        for im, *_ in samples[: max(1, len(samples) // 2)]:
            _, dp = infer(variables, jnp.asarray(im)[None])
            dp_means.append(np.asarray(dp).mean(axis=(0, 1, 2)))
        variables["batch_stats"] = dict(variables["batch_stats"])
        variables["batch_stats"]["dp_running_mean"] = jnp.asarray(np.mean(dp_means, axis=0))
        np.save(os.path.join(cfg.dir("weights"), "irn.npy"),
                jax.tree_util.tree_map(np.asarray, variables), allow_pickle=True)

    # ------------------------------------------------- stage 7: make_sem_seg_labels
    def make_sem_seg_labels(self):
        cfg = self.cfg
        model = IRNNet()
        variables = self._load("irn.npy")
        out_dir = cfg.dir("sem_seg")
        apply_fn = jax.jit(partial(model.apply, apply_mean_shift=True))
        for idx in range(len(self.source)):
            name, img, _ = self.source.get(idx)
            im = T.normalize_img(img.astype(np.float32))
            pair = np.stack([im, im[:, ::-1]])
            edge, dp = edge_displacement_infer(
                lambda v, x, **kw: apply_fn(v, x), variables, jnp.asarray(pair)
            )
            d = np.load(os.path.join(cfg.dir("cam"), name + ".npy"), allow_pickle=True).item()
            cams = jnp.asarray(d["cam"])  # (k, hs, ws)
            keys = np.pad(d["keys"] + 1, (1, 0), mode="constant")
            # crop edge to the strided cam size
            edge_c = edge[: cams.shape[1], : cams.shape[2]]
            rw = propagate_to_edge(cams, edge_c, radius=cfg.rw_radius,
                                   beta=cfg.beta, exp_times=cfg.exp_times)
            H, W = img.shape[:2]
            rw_up = resize_bilinear_auto(rw.transpose(1, 2, 0)[None],
                                    (cams.shape[1] * 4, cams.shape[2] * 4))[0][:H, :W]
            rw_up = rw_up / (rw_up.max() + 1e-12)
            bg = jnp.full(rw_up.shape[:2] + (1,), cfg.sem_seg_bg_thres)
            pred = jnp.argmax(jnp.concatenate([bg, rw_up], axis=-1), axis=-1)
            np.save(os.path.join(out_dir, name + ".npy"), keys[np.asarray(pred)].astype(np.uint8))
        self.log.info("make_sem_seg_labels done")

    # ----------------------------------------------------- stage 8: eval sem seg
    def eval_sem_seg(self) -> float:
        cfg = self.cfg
        hist = np.zeros((cfg.n_classes + 1, cfg.n_classes + 1))
        for idx in range(len(self.source)):
            name, _, mask = self.source.get(idx)
            pred = np.load(os.path.join(cfg.dir("sem_seg"), name + ".npy"))
            hist += _fast_hist(mask.flatten(), pred.flatten(), cfg.n_classes + 1)
        miou = scores_from_hist(hist)["miou"]
        self.log.info("eval_sem_seg miou=%.4f", miou)
        return miou

    # --------------------------------------------------------------------- pipeline
    def run(self, passes: Sequence[str]):
        """Gated execution like `run_wavecam_voc.py:114-167`."""
        stage_map = {
            "train_cam": self.train_cam,
            "train_wavecam": self.train_wavecam,
            "make_cam": self.make_cam,
            "make_wavecam": lambda: self.make_cam(use_wave_weight=True),
            "eval_cam": self.eval_cam,
            "cam_to_ir_label": self.cam_to_ir_label,
            "train_irn": self.train_irn,
            "make_sem_seg": self.make_sem_seg_labels,
            "eval_sem_seg": self.eval_sem_seg,
        }
        results = {}
        for p in passes:
            self.log.info("=== stage %s ===", p)
            results[p] = stage_map[p]()
        return results
