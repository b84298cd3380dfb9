import jax
import jax.numpy as jnp
import numpy as np
import torch
import torch.nn.functional as F

from representationlearning_tpu.losses import wsss as L
from representationlearning_tpu.models import refine as R


# ---------------------------------------------------------------- VARM golden vs torch
def _torch_dilated_neighbors(x, dilations):
    """Reference mechanism: one-hot 3x3 convs at each dilation (`VARM.py:40-51`)."""
    k = torch.zeros(8, 1, 3, 3)
    pos = [(0, 0), (0, 1), (0, 2), (1, 0), (1, 2), (2, 0), (2, 1), (2, 2)]
    for i, (a, b) in enumerate(pos):
        k[i, 0, a, b] = 1
    b_, c, h, w = x.shape
    outs = []
    for d in dilations:
        xp = F.pad(x, [d] * 4, mode="replicate")
        xp = xp.reshape(b_ * c, 1, xp.shape[-2], xp.shape[-1])
        outs.append(F.conv2d(xp, k, dilation=d).view(b_, c, 8, h, w))
    return torch.cat(outs, dim=2)


def _torch_varm(imgs, masks, dilations, num_iter, w2=0.01):
    masks = F.interpolate(masks, size=imgs.shape[-2:], mode="bilinear", align_corners=True)
    nb = _torch_dilated_neighbors(imgs, dilations)
    t1 = torch.cat((nb[:, :, :, 1:, :], nb[:, :, :, -1, :].unsqueeze(3)), 3)
    t2 = torch.cat((nb[:, :, :, :, 1:], nb[:, :, :, :, -1].unsqueeze(4)), 4)
    temp = (nb - t1) ** 2 + (nb - t2) ** 2
    rep = imgs.unsqueeze(2).repeat(1, 1, nb.shape[2], 1, 1)
    ref = -((torch.abs(nb - rep) / (torch.std(nb, dim=2, keepdim=True) + 1e-8)) * 4) ** 2
    ref = ref.mean(1, keepdim=True)
    temp = temp.mean(1, keepdim=True)
    ref = F.softmax(ref, dim=2) - w2 * F.softmax(temp, dim=2)
    for _ in range(num_iter):
        masks = (_torch_dilated_neighbors(masks, dilations) * ref).sum(2)
    return masks


def test_varm_golden_vs_torch():
    rng = np.random.default_rng(0)
    imgs = rng.random((2, 16, 16, 3)).astype(np.float32) * 255
    masks = rng.random((2, 8, 8, 4)).astype(np.float32)
    dil = (1, 2, 4)
    ours = np.asarray(R.varm_refine(jnp.asarray(imgs), jnp.asarray(masks), dilations=dil, num_iter=3))
    ref = _torch_varm(
        torch.from_numpy(imgs).permute(0, 3, 1, 2),
        torch.from_numpy(masks).permute(0, 3, 1, 2),
        dil, 3,
    ).permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(ours, ref, rtol=1e-3, atol=1e-4)


def test_par_runs_and_differs_from_pamr():
    rng = np.random.default_rng(1)
    imgs = jnp.asarray(rng.random((1, 12, 12, 3)).astype(np.float32))
    masks = jnp.asarray(rng.random((1, 12, 12, 3)).astype(np.float32))
    a = R.par_refine(imgs, masks, dilations=(1, 2), num_iter=2)
    b = R.pamr_refine(imgs, masks, dilations=(1, 2), num_iter=2)
    assert a.shape == masks.shape
    assert not np.allclose(np.asarray(a), np.asarray(b))


# ------------------------------------------------------------------------ loss parity
def test_multilabel_soft_margin_matches_torch():
    rng = np.random.default_rng(0)
    x = rng.standard_normal((4, 20)).astype(np.float32)
    y = (rng.random((4, 20)) > 0.7).astype(np.float32)
    ours = float(L.multilabel_soft_margin_loss(jnp.asarray(x), jnp.asarray(y)))
    ref = float(F.multilabel_soft_margin_loss(torch.from_numpy(x), torch.from_numpy(y)))
    assert np.isclose(ours, ref, rtol=1e-5)


def test_cross_entropy_ignore_matches_torch():
    rng = np.random.default_rng(1)
    logits = rng.standard_normal((2, 8, 8, 5)).astype(np.float32)
    labels = rng.integers(0, 5, (2, 8, 8))
    labels[0, :3] = 255
    ours = float(L.cross_entropy_ignore(jnp.asarray(logits), jnp.asarray(labels)))
    ref = float(
        F.cross_entropy(
            torch.from_numpy(logits).permute(0, 3, 1, 2),
            torch.from_numpy(labels).long(),
            ignore_index=255,
        )
    )
    assert np.isclose(ours, ref, rtol=1e-5)


def test_seg_loss_matches_torch_reference_formula():
    rng = np.random.default_rng(2)
    logits = rng.standard_normal((2, 8, 8, 5)).astype(np.float32)
    labels = rng.integers(0, 5, (2, 8, 8))
    ours = float(L.seg_loss(jnp.asarray(logits), jnp.asarray(labels)))
    lt = torch.from_numpy(labels).long()
    pt = torch.from_numpy(logits).permute(0, 3, 1, 2)
    bg = lt.clone(); bg[lt != 0] = 255
    fg = lt.clone(); fg[lt == 0] = 255
    ref = 0.5 * (
        F.cross_entropy(pt, bg, ignore_index=255) + F.cross_entropy(pt, fg, ignore_index=255)
    )
    assert np.isclose(ours, float(ref), rtol=1e-5)


def test_aux_loss_matches_reference_formula():
    rng = np.random.default_rng(3)
    inputs = rng.random((2, 10, 10)).astype(np.float32)
    targets = rng.integers(0, 2, (2, 10, 10)).astype(np.int32)
    targets[0, 0] = 255  # ignored
    loss, pc, nc = L.aux_loss(jnp.asarray(inputs), jnp.asarray(targets))
    pos = (targets == 1); neg = (targets == 0)
    ref = 0.5 * (pos * (1 - inputs)).sum() / (pos.sum() + 1) + 0.5 * (neg * inputs).sum() / (neg.sum() + 1)
    assert np.isclose(float(loss), ref, rtol=1e-5)
    assert int(pc) == pos.sum() + 1 and int(nc) == neg.sum() + 1


def test_corr_loss_finite_and_grad():
    key = jax.random.PRNGKey(0)
    rng = np.random.default_rng(4)
    f = jnp.asarray(rng.standard_normal((2, 16, 16, 20)).astype(np.float32))
    c = jnp.asarray(rng.standard_normal((2, 16, 16, 21)).astype(np.float32))

    def loss_fn(code):
        return L.contrastive_corr_loss(key, f, f, code, code, n_samples=8)

    val, grad = jax.value_and_grad(loss_fn)(c)
    assert np.isfinite(float(val))
    assert bool(jnp.isfinite(grad).all()) and float(jnp.abs(grad).sum()) > 0


def test_par_variant_refine_axes(rng):
    """PAR zoo config axes (`RML/backbone/PAR.py:27-1511`): each switch runs, and the
    defaults reproduce the load-bearing named variants exactly."""
    from representationlearning_tpu.models.refine import (
        pamr_refine, par_refine, par_variant_refine,
    )

    imgs = jnp.asarray(rng.standard_normal((1, 24, 24, 3)), jnp.float32)
    masks = jnp.asarray(rng.random((1, 12, 12, 4)), jnp.float32)
    dil, it = (1, 2), 2

    # extra="pos" == PAR; extra="none" == PAMR
    np.testing.assert_allclose(
        np.asarray(par_variant_refine(imgs, masks, dil, it, extra="pos")),
        np.asarray(par_refine(imgs, masks, dil, it)), rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(par_variant_refine(imgs, masks, dil, it, extra="none")),
        np.asarray(pamr_refine(imgs, masks, dil, it)), rtol=1e-6, atol=1e-6)

    for kw in [dict(norm="w1"), dict(norm="bare"), dict(extra="+var"),
               dict(extra="-var"), dict(extra="-var", clamp=True)]:
        out = par_variant_refine(imgs, masks, dil, it, **kw)
        assert out.shape == (1, 24, 24, 4) and bool(jnp.isfinite(out).all()), kw
