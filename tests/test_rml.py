import jax
import jax.numpy as jnp
import numpy as np
import torch
import torch.nn.functional as F

from representationlearning_tpu.losses import mi as MI
from representationlearning_tpu.models.rml import ClassPredictor, RMLModel
from representationlearning_tpu.models.wavemlp import PATM, WaveBlock
from representationlearning_tpu.train.optim import make_poly_warmup_adamw, tscd_param_labels
from representationlearning_tpu.train.rml import RMLConfig, make_rml_train_step
from representationlearning_tpu.train.state import TrainState
import pytest

pytestmark = pytest.mark.slow  # heavyweight tier; deselect with -m 'not slow'


def test_kl_div_matches_torch():
    rng = np.random.default_rng(0)
    a = rng.random((6, 10)).astype(np.float32)
    b = rng.random((6, 10)).astype(np.float32)
    pa = jax.nn.softmax(jnp.asarray(a), -1)
    pb = jax.nn.softmax(jnp.asarray(b), -1)
    ours = float(MI.torch_kl_div_mean(pa, pb))
    ref = float(F.kl_div(torch.from_numpy(np.asarray(pa)), torch.from_numpy(np.asarray(pb)),
                         reduction="mean"))
    assert np.isclose(ours, ref, rtol=1e-5)


def test_feat_feat_mi_matches_torch():
    rng = np.random.default_rng(1)
    f1 = rng.standard_normal((2, 4, 4, 3)).astype(np.float32)
    f2 = rng.standard_normal((2, 4, 4, 3)).astype(np.float32)
    ours = float(MI.feat_feat_mi_estimation(jnp.asarray(f1), jnp.asarray(f2), dim=3))

    t1 = torch.from_numpy(f1).permute(0, 3, 1, 2).reshape(2, 3, -1).reshape(6, -1)
    t2 = torch.from_numpy(f2).permute(0, 3, 1, 2).reshape(2, 3, -1).reshape(6, -1)
    sm = torch.nn.Softmax(dim=1)
    ref = float(F.kl_div(input=sm(t1 / 0.05), target=sm(t2 / 0.05), reduction="mean"))
    assert np.isclose(ours, ref, rtol=1e-4)


def test_ciml_sign_cosine_matches_torch():
    rng = np.random.default_rng(2)
    cams1 = rng.standard_normal((2, 6, 6, 5)).astype(np.float32)
    cams2 = rng.standard_normal((2, 6, 6, 5)).astype(np.float32)
    ours = float(MI.ciml_loss(jnp.asarray(cams1), jnp.asarray(cams2)))

    c1 = torch.from_numpy(cams1).permute(0, 3, 1, 2)
    c2 = torch.from_numpy(cams2).permute(0, 3, 1, 2)
    cam_l1 = torch.mean(torch.abs(c1[:, 1:] - c2[:, 1:]))
    m1 = F.adaptive_avg_pool2d(c1[:, 1:], 1)
    m2 = F.adaptive_avg_pool2d(c2[:, 1:], 1)
    sim = torch.cosine_similarity(m1, m1.squeeze(-1).unsqueeze(1), dim=3)
    sim1 = torch.cosine_similarity(m2, m2.squeeze(-1).unsqueeze(1), dim=3)
    ref = float(0.1 * (sim + sim1).mean() + cam_l1)
    assert np.isclose(ours, ref, rtol=1e-4)


def test_patm_and_waveblock_shapes():
    m = PATM(dim=8)
    x = jnp.asarray(np.random.default_rng(3).random((2, 8, 8, 8)).astype(np.float32))
    v = m.init(jax.random.PRNGKey(0), x)
    out = m.apply(v, x)
    assert out.shape == x.shape
    wb = WaveBlock(dim=8)
    v2 = wb.init(jax.random.PRNGKey(1), x)
    out2 = wb.apply(v2, x)
    assert out2.shape == x.shape and bool(jnp.isfinite(out2).all())


def test_rml_model_modes():
    model = RMLModel(backbone="mit_b0", num_classes=6, seg_classes=5, use_wave=True)
    x = jnp.zeros((2, 64, 64, 3))
    v = model.init(jax.random.PRNGKey(0), x)
    cls_logits, seg, attns, attn_pred = model.apply(v, x)
    assert cls_logits.shape == (2, 5)
    assert seg.shape == (2, 16, 16, 5)  # SimpleFusion8 neck at 1/4
    cam, ap = model.apply(v, x, cam_only=True)
    assert cam.shape == (2, 4, 4, 5)  # wave block keeps channels


def test_class_predictor():
    m = ClassPredictor(num_classes=5, representation_size=16)
    x = jnp.asarray(np.random.default_rng(4).standard_normal((2, 5, 16)).astype(np.float32))
    label = jnp.zeros((2, 5)).at[0, 1].set(1).at[1, 3].set(1)
    v = m.init(jax.random.PRNGKey(0), x, label)
    loss, acc = m.apply(v, x, label)
    assert np.isfinite(float(loss)) and 0 <= float(acc) <= 1


def test_rml_train_step():
    cfg = RMLConfig(num_classes=6, crop_size=64, cam_iters=-1, cam_scales=(1.0, 0.5),
                    par_dilations=(1, 2), par_iters=2)
    model = RMLModel(backbone="mit_b0", num_classes=cfg.num_classes, seg_classes=cfg.num_classes)
    rng = np.random.default_rng(5)
    batch = {
        "image": jnp.asarray(rng.standard_normal((2, 64, 64, 3)).astype(np.float32)),
        "cls_label": jnp.asarray((rng.random((2, 5)) > 0.5).astype(np.float32)),
        "img_box": jnp.asarray([[0, 64, 0, 64]] * 2),
    }
    v = model.init(jax.random.PRNGKey(0), batch["image"][:1])
    tx = make_poly_warmup_adamw(6e-5, 0.01, 10, 100,
                                param_labels=tscd_param_labels(v["params"]))
    state = TrainState.create(model.apply, v, tx)
    step_fn = make_rml_train_step(model.apply, cfg)
    state, metrics = step_fn(state, batch, jax.random.PRNGKey(0))
    for k, val in metrics.items():
        assert np.isfinite(float(val)), (k, float(val))
    assert int(state.step) == 1
