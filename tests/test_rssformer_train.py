import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.slow  # heavyweight tier; deselect with -m 'not slow'

from representationlearning_tpu.data.loveda import LoveDADataset, collate_loveda
from representationlearning_tpu.models.rssformer import HRNetFusion
from representationlearning_tpu.train.rssformer import (
    RSSFormerTrainConfig, create_rssformer_state, evaluate, make_rssformer_train_step,
)


def test_loveda_synthetic_dataset():
    ds = LoveDADataset(training=True, crop_size=64, synthetic_n=4, synthetic_size=(80, 80))
    name, img, mask = ds[0]
    assert img.shape == (64, 64, 3) and mask.shape == (64, 64)
    assert mask.min() >= -1 and mask.max() < 7
    # deterministic
    _, img2, _ = ds[0]
    np.testing.assert_array_equal(img, img2)
    names, imgs, masks = collate_loveda([ds[i] for i in range(4)])
    assert imgs.shape == (4, 64, 64, 3)


def test_rssformer_train_loop_decreases():
    cfg = RSSFormerTrainConfig(base_lr=0.005, max_iters=100)
    model = HRNetFusion(hrnet_type="hrnetv2_w18", classes=7, loss_config={"ce": {}})
    state = create_rssformer_state(model, (64, 64, 3), cfg)
    step_fn = make_rssformer_train_step(model, cfg)

    ds = LoveDADataset(training=True, crop_size=64, synthetic_n=4, synthetic_size=(80, 80))
    _, imgs, masks = collate_loveda([ds[i] for i in range(4)])
    batch = {"image": jnp.asarray(imgs), "mask": jnp.asarray(masks)}

    hist = []
    for i in range(3):
        state, metrics = step_fn(state, batch, jax.random.PRNGKey(i))
        hist.append(float(metrics["total"]))
        assert all(np.isfinite(float(v)) for v in metrics.values())
    assert hist[-1] < hist[0]
    assert int(state.step) == 3


def test_rssformer_deferred_bn_ema_matches_inplace():
    """defer_bn_ema=True (RawStatBatchNorm + one fused flat EMA in the train step)
    must reproduce the default per-layer flax EMA: same losses, same params, and
    the same running statistics after several steps."""
    from jax.flatten_util import ravel_pytree

    cfg = RSSFormerTrainConfig(base_lr=0.005, max_iters=100)
    ds = LoveDADataset(training=True, crop_size=64, synthetic_n=4, synthetic_size=(80, 80))
    _, imgs, masks = collate_loveda([ds[i] for i in range(4)])
    batch = {"image": jnp.asarray(imgs), "mask": jnp.asarray(masks)}

    results = {}
    for defer in (False, True):
        model = HRNetFusion(hrnet_type="hrnetv2_w18", classes=7,
                            loss_config={"ce": {}}, defer_bn_ema=defer)
        state = create_rssformer_state(model, (64, 64, 3), cfg)
        step_fn = make_rssformer_train_step(model, cfg)
        for i in range(3):
            state, metrics = step_fn(state, batch, jax.random.PRNGKey(i))
        bs = state.variables["batch_stats"]
        results[defer] = (float(metrics["total"]), state.params, bs)

    t0, p0, bs0 = results[False]
    t1, p1, bs1 = results[True]
    assert np.isclose(t0, t1, rtol=1e-6)
    flat0, _ = ravel_pytree(p0)
    flat1, _ = ravel_pytree(p1)
    np.testing.assert_allclose(np.asarray(flat0), np.asarray(flat1), rtol=1e-5, atol=1e-7)
    fb0, _ = ravel_pytree(bs0)
    fb1, _ = ravel_pytree(bs1)
    np.testing.assert_allclose(np.asarray(fb0), np.asarray(fb1), rtol=1e-5, atol=1e-7)


def test_rssformer_evaluate_with_tta():
    from representationlearning_tpu.infer.tta import HorizontalFlip, Identity

    model = HRNetFusion(hrnet_type="hrnetv2_w18", classes=7, loss_config={"ce": {}})
    cfg = RSSFormerTrainConfig()
    state = create_rssformer_state(model, (64, 64, 3), cfg)
    ds = LoveDADataset(training=False, synthetic_n=2, synthetic_size=(64, 64))
    batches = [ (img[None], mask[None]) for _, img, mask in (ds[i] for i in range(2)) ]
    scores = evaluate(model, state.variables, batches, num_classes=7,
                      tta_transforms=[Identity(), HorizontalFlip()])
    assert 0.0 <= scores["miou"] <= 1.0
