import jax
import jax.numpy as jnp
import numpy as np

from representationlearning_tpu.data.voc import BatchLoader, VOC12ClsDataset
from representationlearning_tpu.models.tscd import TSCD
from representationlearning_tpu.train.optim import make_poly_warmup_adamw, tscd_param_labels
from representationlearning_tpu.train.scd import (
    SCDConfig, make_scd_eval_step, make_scd_train_step,
)
from representationlearning_tpu.train.state import TrainState
import pytest

pytestmark = pytest.mark.slow  # heavyweight tier; deselect with -m 'not slow'


def _make_state(model, x, cfg, cam_iters=0):
    variables = model.init(jax.random.PRNGKey(0), x[:1])
    tx = make_poly_warmup_adamw(
        6e-5, 0.01, warmup_iter=10, max_iter=100,
        param_labels=tscd_param_labels(variables["params"]),
    )
    return TrainState.create(model.apply, variables, tx)


def test_scd_train_step_decreases_and_updates():
    cfg = SCDConfig(num_classes=6, crop_size=64, cam_iters=-1, corr_samples=6,
                    varm_dilations=(1, 2), varm_iters=2)
    model = TSCD(backbone="mit_b0", num_classes=cfg.num_classes)
    ds = VOC12ClsDataset(crop_size=64, num_classes=cfg.num_classes,
                         synthetic_size=(72, 80), synthetic_n=8)
    batch_iter = iter(BatchLoader(ds, batch_size=2, seed=0))
    _, img, cls_label, box = next(batch_iter)
    batch = {"image": jnp.asarray(img), "cls_label": jnp.asarray(cls_label),
             "img_box": jnp.asarray(box)}

    state = _make_state(model, batch["image"], cfg)
    step_fn = make_scd_train_step(model.apply, cfg)

    p0 = jax.tree_util.tree_leaves(state.params)[0].copy()
    metrics_hist = []
    for i in range(3):
        state, metrics = step_fn(state, batch, jax.random.PRNGKey(i))
        metrics_hist.append({k: float(v) for k, v in metrics.items()})
    for m in metrics_hist:
        for k, v in m.items():
            assert np.isfinite(v), (k, m)
    assert int(state.step) == 3
    p1 = jax.tree_util.tree_leaves(state.params)[0]
    assert not np.allclose(np.asarray(p0), np.asarray(p1))
    # training on the same batch must reduce the total loss
    assert metrics_hist[-1]["total"] < metrics_hist[0]["total"]


def test_scd_warmup_uses_only_cls():
    cfg = SCDConfig(num_classes=4, crop_size=64, cam_iters=10_000, corr_samples=4,
                    varm_dilations=(1,), varm_iters=1)
    model = TSCD(backbone="mit_b0", num_classes=cfg.num_classes)
    rng = np.random.default_rng(0)
    batch = {
        "image": jnp.asarray(rng.standard_normal((2, 64, 64, 3)).astype(np.float32)),
        "cls_label": jnp.asarray((rng.random((2, 3)) > 0.5).astype(np.float32)),
        "img_box": jnp.asarray([[0, 64, 0, 64]] * 2),
    }
    state = _make_state(model, batch["image"], cfg)
    step_fn = make_scd_train_step(model.apply, cfg)
    state, metrics = step_fn(state, batch, jax.random.PRNGKey(0))
    # during warmup the total equals the cls loss exactly
    assert np.isclose(float(metrics["total"]), float(metrics["cls"]), rtol=1e-6)


def test_scd_eval_step_shapes():
    cfg = SCDConfig(num_classes=4, crop_size=64)
    model = TSCD(backbone="mit_b0", num_classes=cfg.num_classes)
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((2, 64, 64, 3)).astype(np.float32))
    variables = model.init(jax.random.PRNGKey(0), x[:1])
    eval_fn = make_scd_eval_step(model.apply, cfg)
    out = eval_fn(variables, {"image": x, "cls_label": jnp.ones((2, 3))})
    assert out["seg_pred"].shape == (2, 64, 64)
    assert out["cam_label"].shape == (2, 64, 64)
    # the affinity-propagated "ref" stream (`dist_train_voc.py:122-142`): labels in
    # [0, num_classes), background reachable (bkg channel 0 concatenated at 0.35)
    assert out["ref_label"].shape == (2, 64, 64)
    ref = np.asarray(out["ref_label"])
    assert ref.min() >= 0 and ref.max() < cfg.num_classes


def test_param_labels_cover_all_groups():
    model = TSCD(backbone="mit_b0", num_classes=4)
    v = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))
    from flax import traverse_util

    labels = traverse_util.flatten_dict(tscd_param_labels(v["params"]))
    vals = set(labels.values())
    assert vals == {"backbone", "norm", "head10"}
    # encoder LayerNorms frozen, decoder/classifier/attn_proj at 10x
    assert labels[("encoder", "norm1", "scale")] == "norm"
    assert labels[("encoder", "patch_embed1", "proj", "kernel")] == "backbone"
    assert labels[("decoder", "linear_pred", "kernel")] == "head10"
    assert labels[("classifier", "kernel")] == "head10"


def test_voc_datasets_and_loader():
    ds = VOC12ClsDataset(crop_size=64, synthetic_n=6, synthetic_size=(70, 90))
    name, img, cls_label, box = ds[0]
    assert img.shape == (64, 64, 3) and cls_label.shape == (20,)
    # deterministic given (seed, idx)
    _, img2, _, _ = ds[0]
    np.testing.assert_array_equal(img, img2)

    loader = BatchLoader(ds, batch_size=4, loop=False)
    batches = list(loader)
    assert len(batches) == 1  # 6 samples, drop_last
    assert batches[0][1].shape == (4, 64, 64, 3)
