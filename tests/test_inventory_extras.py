import jax
import jax.numpy as jnp
import numpy as np

from representationlearning_tpu.core.registry import MODELS
from representationlearning_tpu.data.voc import kfold_indices
from representationlearning_tpu.models import asff, baselines  # noqa: F401 (registers)
from representationlearning_tpu.wsss import camutils as CU
from representationlearning_tpu.wsss import msf
import pytest

pytestmark = pytest.mark.slow  # heavyweight tier; deselect with -m 'not slow'


def test_asff_models_contract():
    for name in ("rsNetFusion", "HRNetFusion2"):
        m = MODELS.build(name, hrnet_type="hrnetv2_w18", classes=7, loss_config={"ce": {}})
        x = jnp.zeros((1, 64, 64, 3))
        y = jnp.zeros((1, 64, 64), jnp.int32)
        v = m.init(jax.random.PRNGKey(0), x)
        probs = m.apply(v, x)
        assert probs.shape == (1, 64, 64, 7)
        loss, _ = m.apply(v, x, y, train=True, mutable=["batch_stats"],
                          rngs={"dropout": jax.random.PRNGKey(1)})
        assert np.isfinite(float(sum(loss.values())))


def test_propagate_ref_cam_no_bkg_mass():
    rng = np.random.default_rng(0)
    cams = jnp.asarray(rng.random((1, 4, 4, 3)).astype(np.float32))
    ref = jnp.asarray(rng.random((1, 16, 16)).astype(np.float32))
    out = CU.propagate_ref_cam(cams, ref)
    assert out.shape == cams.shape and bool(jnp.isfinite(out).all())


def test_cams_to_label_resized():
    lab = jnp.asarray(np.arange(16).reshape(1, 4, 4) % 3)
    out = CU.cams_to_label_resized(lab, size=(8, 8))
    assert out.shape == (1, 8, 8)


def test_cam_to_fg_bg_label_runs():
    rng = np.random.default_rng(1)
    imgs = jnp.asarray(rng.standard_normal((1, 24, 24, 3)).astype(np.float32))
    cams = jnp.asarray(rng.random((1, 24, 24, 3)).astype(np.float32))
    cls = jnp.asarray([[1.0, 0.0, 1.0]])
    out = CU.cam_to_fg_bg_label(imgs, cams, cls, bg_thre=0.3, fg_thre=0.6)
    vals = set(np.unique(np.asarray(out)))
    assert vals.issubset({0.0, 1.0, 2.0, 3.0})  # bg/unsure flag + valid class ids


def test_multi_thres_cam_eval():
    rng = np.random.default_rng(2)
    dicts, gts = [], []
    for i in range(3):
        gt = rng.integers(0, 4, (16, 16))
        keys = np.unique(gt)
        keys = keys[keys > 0] - 1
        hi = rng.random((len(keys), 16, 16)).astype(np.float32)
        dicts.append({"keys": keys, "high_res": hi})
        gts.append(gt)
    res = msf.evaluate_cam_multi_thres(dicts, gts, num_classes=4)
    assert 0.0 <= res["best_miou"] <= 1.0
    assert len(res["per_threshold"]) == 10


def test_kfold_indices():
    tr, va = kfold_indices(100, k=10, fold=3)
    assert len(tr) == 90 and len(va) == 10
    assert set(tr) | set(va) == set(range(100))
    tr, va = kfold_indices(100, k=10, fold=-1)
    assert len(tr) == 100 and len(va) == 0


def test_discriminative_loss_pull_push():
    from representationlearning_tpu.losses.discriminative import discriminative_loss

    rng = np.random.default_rng(7)
    B, H, W, F = 2, 8, 8, 4
    labels = rng.integers(0, 3, (B, H, W))
    # well-separated embeddings per instance -> tiny pull, tiny push
    centers = np.array([[10, 0, 0, 0], [0, 10, 0, 0], [0, 0, 10, 0]], np.float32)
    pred = centers[labels] + rng.standard_normal((B, H, W, F)).astype(np.float32) * 0.01
    total, parts = discriminative_loss(jnp.asarray(pred), jnp.asarray(labels), 3)
    assert float(parts["var"]) < 0.01
    assert float(parts["dist"]) < 1e-6
    # collapsed embeddings -> large push
    pred2 = np.zeros_like(pred)
    total2, parts2 = discriminative_loss(jnp.asarray(pred2), jnp.asarray(labels), 3)
    assert float(parts2["dist"]) > 1.0


def test_factseg_contract():
    m = MODELS.build("FactSeg", classes=7)
    x = jnp.zeros((1, 64, 64, 3))
    y = jnp.zeros((1, 64, 64), jnp.int32)
    v = m.init(jax.random.PRNGKey(0), x)
    probs = m.apply(v, x)
    assert probs.shape == (1, 64, 64, 7)
    losses, _ = m.apply(v, x, y, train=True, mutable=["batch_stats"])
    assert {"cls_loss", "bi_loss"} == set(losses)
    assert all(np.isfinite(float(val)) for val in losses.values())


def test_dal_mha_rpe_and_residual_attn():
    from representationlearning_tpu.models.rssformer_modules import DALMultiheadAttention

    m = DALMultiheadAttention(embed_dim=16, num_heads=4, rpe=True, window_size=3)
    rng = np.random.default_rng(8)
    x = jnp.asarray(rng.standard_normal((2, 9, 16)).astype(np.float32))
    v = m.init(jax.random.PRNGKey(0), x)
    out, logits = m.apply(v, x)
    assert out.shape == (2, 9, 16) and logits.shape == (2, 4, 9, 9)
    # residual_attn shifts the logits
    out2, logits2 = m.apply(v, x, residual_attn=logits)
    assert not np.allclose(np.asarray(out), np.asarray(out2))


def test_mlp_variants():
    from representationlearning_tpu.models.rssformer_modules import Mlp, MlpDW

    rng = np.random.default_rng(9)
    x = jnp.asarray(rng.standard_normal((2, 16, 8)).astype(np.float32))
    m = Mlp(hidden=32, out=8)
    v = m.init(jax.random.PRNGKey(0), x)
    assert m.apply(v, x).shape == (2, 16, 8)
    dw = MlpDW(hidden=32, out=8)
    v2 = dw.init(jax.random.PRNGKey(0), x, 4, 4)
    assert dw.apply(v2, x, 4, 4).shape == (2, 16, 8)
