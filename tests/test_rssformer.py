import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as F

from representationlearning_tpu.losses import cgfl as CG
from representationlearning_tpu.models.hrnet import HighResolutionNet
from representationlearning_tpu.models.rssformer import HRNetFusion
from representationlearning_tpu.models.rssformer_modules import (
    GeneralTransformerBlock, Mhca, window_partition, window_reverse,
)


def test_window_partition_roundtrip():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.random((2, 14, 21, 5)).astype(np.float32))
    w = window_partition(x, 7)
    assert w.shape == (2 * 2 * 3, 49, 5)
    back = window_reverse(w, 7, 2, 14, 21)
    np.testing.assert_array_equal(np.asarray(back), np.asarray(x))


def test_mhca_golden_vs_torch():
    """Cross-attention math vs torch's functional MHA with separate projections."""
    torch.manual_seed(0)
    d, nh, B, S = 16, 4, 3, 8
    q_proj = torch.nn.Linear(d, d)
    k_proj = torch.nn.Linear(d, d)
    v_proj = torch.nn.Linear(d, d)
    out_proj = torch.nn.Linear(d, d)
    rng = np.random.default_rng(1)
    xq = rng.standard_normal((B, S, d)).astype(np.float32)
    xk = rng.standard_normal((B, S, d)).astype(np.float32)

    with torch.no_grad():
        scaling = (d // nh) ** -0.5
        q = q_proj(torch.from_numpy(xq)) * scaling
        k = k_proj(torch.from_numpy(xk))
        v = v_proj(torch.from_numpy(xk))
        q = q.reshape(B, S, nh, d // nh).permute(0, 2, 1, 3)
        k = k.reshape(B, S, nh, d // nh).permute(0, 2, 1, 3)
        v = v.reshape(B, S, nh, d // nh).permute(0, 2, 1, 3)
        attn = (q @ k.transpose(-2, -1)).softmax(-1)
        # DAL channel gate (`DAL.py:1005-1016`): sigmoid(mean + max of q^T k)
        m2 = q.transpose(-2, -1) @ k
        alpha = torch.sigmoid(m2.mean(dim=(-2, -1), keepdim=True)
                              + m2.amax(dim=(-2, -1), keepdim=True))
        ref = out_proj(((attn @ v) * alpha).permute(0, 2, 1, 3).reshape(B, S, d)).numpy()

    m = Mhca(embed_dim=d, num_heads=nh)
    params = {
        "q_proj": {"kernel": jnp.asarray(q_proj.weight.detach().numpy().T),
                   "bias": jnp.asarray(q_proj.bias.detach().numpy())},
        "k_proj": {"kernel": jnp.asarray(k_proj.weight.detach().numpy().T),
                   "bias": jnp.asarray(k_proj.bias.detach().numpy())},
        "v_proj": {"kernel": jnp.asarray(v_proj.weight.detach().numpy().T),
                   "bias": jnp.asarray(v_proj.bias.detach().numpy())},
        "out_proj": {"kernel": jnp.asarray(out_proj.weight.detach().numpy().T),
                     "bias": jnp.asarray(out_proj.bias.detach().numpy())},
    }
    out = m.apply({"params": params}, jnp.asarray(xq), jnp.asarray(xk), jnp.asarray(xk))
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-4, atol=1e-5)


def test_general_transformer_block_shapes():
    m = GeneralTransformerBlock(dim=8, num_heads=2, window_size=7)
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.random((1, 16, 16, 8)).astype(np.float32))
    y = jnp.asarray(rng.random((1, 16, 16, 8)).astype(np.float32))
    v = m.init(jax.random.PRNGKey(0), x, y)
    out = m.apply(v, x, y)
    assert out.shape == x.shape
    assert bool(jnp.isfinite(out).all())


def test_hrnet_feature_pyramid():
    m = HighResolutionNet("hrnetv2_w18", with_transformer=True)
    x = jnp.zeros((1, 64, 64, 3))
    v = m.init(jax.random.PRNGKey(0), x)
    feats = m.apply(v, x)
    assert [f.shape for f in feats] == [
        (1, 16, 16, 18), (1, 8, 8, 36), (1, 4, 4, 72), (1, 2, 2, 144),
    ]


def test_rssformer_train_and_eval_modes():
    model = HRNetFusion(hrnet_type="hrnetv2_w18", classes=7, loss_config={"ce": {}})
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.standard_normal((2, 64, 64, 3)).astype(np.float32))
    y = jnp.asarray(rng.integers(-1, 7, (2, 64, 64)))
    v = model.init(jax.random.PRNGKey(0), x)
    probs = model.apply(v, x)  # eval
    assert probs.shape == (2, 64, 64, 7)
    np.testing.assert_allclose(np.asarray(probs.sum(-1)), 1.0, atol=1e-4)
    loss_dict, _ = model.apply(v, x, y, train=True, mutable=["batch_stats"],
                               rngs={"dropout": jax.random.PRNGKey(1)})
    assert "fc_loss" in loss_dict
    assert np.isfinite(float(loss_dict["fc_loss"]))


# ------------------------------------------------------------------ CGFL golden tests
def test_mctrans_aux_l1_matches_reference_formula():
    rng = np.random.default_rng(4)
    B, C = 3, 7
    score = rng.standard_normal((B, C)).astype(np.float32)
    label = (rng.random((B, 8, 8)) > 0.5).astype(np.float32)
    _, l1 = CG.mctrans_aux_l1(jnp.asarray(score), jnp.asarray(label), C)

    # reference: one_hot(unique(l), C).sum(0) per sample, then 1/(1+exp|s-m|) sum/2B
    expected = []
    for b in range(B):
        u = np.unique(label[b]).astype(int)
        m = np.zeros(C); m[u] = 1
        v = 1.0 / (1.0 + np.exp(np.abs(score[b] - m)))
        expected.append(v.sum() / (2 * B))
    np.testing.assert_allclose(np.asarray(l1), expected, rtol=1e-5)


def test_softmax_focalloss_matches_reference_formula():
    rng = np.random.default_rng(5)
    B, H, W, C = 2, 6, 6, 7
    pred = rng.standard_normal((B, H, W, C)).astype(np.float32)
    true = rng.integers(0, C, (B, H, W))
    true[0, 0, :2] = -1
    gamma = rng.random(B).astype(np.float32)

    ours = float(CG.softmax_focalloss(jnp.asarray(pred), jnp.asarray(true), jnp.asarray(gamma)))

    pt = torch.from_numpy(pred).permute(0, 3, 1, 2)
    tt = torch.from_numpy(true).long()
    ce = F.cross_entropy(pt, tt, ignore_index=-1)
    p = pt.softmax(1)
    g = torch.from_numpy(gamma).reshape(B, 1, 1, 1)
    mod = (1 - p) * (1 - g / 7)
    valid = ~tt.eq(-1)
    safe = torch.where(valid, tt, torch.zeros_like(tt))
    mod = torch.gather(mod, 1, safe.unsqueeze(1)).squeeze(1)
    ref = float((ce * mod).sum() / (valid.sum() + B))
    assert np.isclose(ours, ref, rtol=1e-4)


def test_dice_and_tversky_sane():
    rng = np.random.default_rng(6)
    pred = jnp.asarray(rng.standard_normal((2, 8, 8, 3)).astype(np.float32))
    true = jnp.asarray(rng.integers(0, 3, (2, 8, 8)))
    d = float(CG.dice_loss_with_logits(pred, true))
    assert 0.0 <= d <= 1.0
    # perfect prediction -> near-zero dice loss
    logits = jax.nn.one_hot(true, 3) * 100.0
    assert float(CG.dice_loss_with_logits(logits, true)) < 0.01
    tv = float(CG.tversky_loss_with_logits(pred[..., 0], (true > 0).astype(jnp.float32)))
    assert 0.0 <= tv <= 1.0


def test_hrnetfusion_hrt_backbone_smoke(rng):
    """HRNetFusion with the HRFormer backbone (hrnet_type='hrt_small') builds, runs
    eval forward, and produces a softmax map (`hrt_backbone.py:370` wired behind the
    existing config surface)."""
    import jax
    import jax.numpy as jnp

    from representationlearning_tpu.models.rssformer import HRNetFusion

    model = HRNetFusion(hrnet_type="hrt_small", classes=7)
    x = jnp.asarray(rng.standard_normal((1, 64, 64, 3)), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x)
    prob = model.apply(variables, x)
    assert prob.shape == (1, 64, 64, 7)
    np.testing.assert_allclose(np.asarray(prob.sum(-1)), 1.0, rtol=1e-5)


def test_mlp_dwbn_conv_mm_matches_conv_path():
    """conv_mm (dilated 3x3 branches as shifted MXU matmuls) is float-close to
    the conv-emitter path with the SAME params, train and eval."""
    from representationlearning_tpu.models.rssformer_modules import MlpDWBN

    rng = np.random.default_rng(11)
    B, H, W, C = 2, 13, 17, 8
    x = jnp.asarray(rng.standard_normal((B, H * W, C)).astype(np.float32))
    m0 = MlpDWBN(hidden_features=16, out_features=C)
    v = m0.init(jax.random.PRNGKey(0), x, H, W)
    m1 = MlpDWBN(hidden_features=16, out_features=C, conv_mm=True)
    for train in (False, True):
        kw = dict(mutable=["batch_stats"]) if train else {}
        a = m0.apply(v, x, H, W, train=train, **kw)
        b = m1.apply(v, x, H, W, train=train, **kw)
        if train:
            (a, sa), (b, sb) = a, b
            jax.tree_util.tree_map(
                lambda p, q: np.testing.assert_allclose(p, q, atol=1e-4),
                sa, sb)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-4, rtol=1e-4)

    # gradients agree too (the conv_mm path exists to fix the BACKWARD cost)
    def loss_fn(params, mod):
        out = mod.apply({"params": params, "batch_stats": v["batch_stats"]},
                        x, H, W, train=True, mutable=["batch_stats"])[0]
        return (out ** 2).mean()

    g0 = jax.grad(loss_fn)(v["params"], m0)
    g1 = jax.grad(loss_fn)(v["params"], m1)
    jax.tree_util.tree_map(
        lambda p, q: np.testing.assert_allclose(p, q, atol=1e-4, rtol=1e-3),
        g0, g1)
