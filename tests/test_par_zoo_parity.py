"""PAR experiment-zoo reduction proof (VERDICT round-2 item 7).

`RML/backbone/PAR.py:27-1511` holds ~20 parameter-free refinement sweep classes.
Our claim (models/refine.py::par_variant_refine) is that they reduce to three
structural axes (norm x extra-term x clamp) modulo global output scalars. This
test instantiates the ACTUAL reference torch classes and proves every mapping
numerically:

- exact variants: output matches par_variant_refine bit-near (atol 1e-4 on f32)
- scale variants: output matches ours x a predicted scalar (the per-iteration
  divisor compounds; propagation is linear in masks so the scale is global and
  invisible to the downstream argmax)
- non-reducing variants (PARgg, PAR2b, PAR3ey/3f/4) are asserted to exist and
  are documented with diffs in PARITY.md — not silently ignored.

The load-bearing class (`RML/network/PAR.py::PAR`, the only one imported by
`RML/scripts/dist_train_voc.py:21`) is checked against both par_refine and
par_variant_refine(extra="pos").
"""
import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax.numpy as jnp  # noqa: E402

import ref_loader  # noqa: E402
from representationlearning_tpu.models.refine import (  # noqa: E402
    par_refine, par_variant_refine,
)

DIL = (1, 2, 4)
IT = 2


@pytest.fixture(scope="module")
def zoo():
    return ref_loader.load_rml_par_zoo()


@pytest.fixture(scope="module")
def data():
    rng = np.random.default_rng(7)
    imgs = rng.standard_normal((2, 3, 24, 24)).astype(np.float32)
    masks = np.abs(rng.standard_normal((2, 4, 12, 12))).astype(np.float32)
    return imgs, masks


def _run_ref(cls, imgs, masks):
    m = cls(dilations=list(DIL), num_iter=IT).eval()
    with torch.no_grad():
        out = m(torch.from_numpy(imgs), torch.from_numpy(masks))
    return out.numpy()


def _run_ours(imgs, masks, **kw):
    out = par_variant_refine(
        jnp.asarray(imgs.transpose(0, 2, 3, 1)),
        jnp.asarray(masks.transpose(0, 2, 3, 1)),
        dilations=DIL, num_iter=IT, **kw,
    )
    return np.asarray(out).transpose(0, 3, 1, 2)


def _tv(t):
    """tv_loss (`backbone/PAR.py:335-339`): summed squared forward differences."""
    t = torch.from_numpy(t)
    t1 = torch.cat((t[:, :, 1:, :], t[:, :, -1, :].unsqueeze(2)), 2)
    t2 = torch.cat((t[:, :, :, 1:], t[:, :, :, -1].unsqueeze(3)), 3)
    return float(((t - t1) ** 2 + (t - t2) ** 2).sum())


def _interp(masks, size):
    return torch.nn.functional.interpolate(
        torch.from_numpy(masks), size=size, mode="bilinear", align_corners=True
    ).numpy()


# variant -> (par_variant_refine kwargs, scale_fn(imgs, masks) -> torch/ours ratio)
EXACT = {
    "PAR1": dict(norm="std"),
    "PAR1a": dict(norm="w1"),
    "PAR1b": dict(norm="bare"),
    # PAR3 adds softmax(var) unweighted (`PAR.py:580`); PAR3a weights it by w2
    "PAR3": dict(extra="+var", w2=1.0),
    "PAR3a": dict(extra="+var", w2=0.01),
    # PAR3b folds its *5 sharpness into w1: -(x*5)^2 == -(x/0.2)^2 (`PAR.py:700`)
    "PAR3b": dict(extra="-var", w1=0.2),
    "PAR3bb": dict(extra="-var", clamp=True),
    "PAR3e": dict(extra="/var"),
}


@pytest.mark.parametrize("name", sorted(EXACT))
def test_exact_variants(zoo, data, name):
    zoo_mod, _ = zoo
    imgs, masks = data
    want = _run_ref(getattr(zoo_mod, name), imgs, masks)
    got = _run_ours(imgs, masks, **EXACT[name])
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


def test_scale_variants(zoo, data):
    """PAR2/2a/3b1/3b2/3b3/3c/3d == an EXACT-mapped variant x a global scalar."""
    zoo_mod, _ = zoo
    imgs, masks = data
    hw = imgs.shape[-2:]
    tv_small = _tv(masks)                       # tv of pre-interpolation masks
    tv_big = _tv(_interp(masks, hw))            # tv of interpolated masks
    h, w = masks.shape[-2:]
    l_bug = tv_small / h * w                    # `tv_loss(masks) / h*w` precedence
                                                # bug, `PAR.py:763`
    cases = [
        # (name, ours kwargs, predicted torch/ours scale)
        ("PAR2", dict(norm="std"), (1.0 / tv_big) ** IT),        # aff/l, `PAR.py:388`
        ("PAR2a", dict(norm="std"), tv_big ** IT),               # masks*l, `:448`
        ("PAR3b1", dict(extra="-var"), (1.0 / (l_bug + 1)) ** IT),    # `:789`
        ("PAR3b2", dict(extra="-var"), (1.0 / (l_bug + 1e-8)) ** IT), # `:858`
        # PAR3b3 folds w1 into the norm: its w1 is 4 (`:872`) and multiplies
        # instead of divides, -(4*x)^2 == -(x/0.25)^2 (`:917`)
        ("PAR3b3", dict(extra="-var", w1=0.25),
         (1.0 / (l_bug + 1e-8)) ** IT),                               # `:927`
        # PAR3c: sm1/(L) - w2*sm2 == (1/L)(sm1 - L*w2*sm2), `:1072`
        # the folded-out 1/L factor rides the affinity, so it compounds per iter
        ("PAR3c", dict(extra="-var", w2=0.01 * (tv_big + 1e-8)),
         (1.0 / (tv_big + 1e-8)) ** IT),
        ("PAR3d", dict(extra="-var"), (1.0 / (tv_big + 1e-8)) ** IT),
    ]
    for name, kw, scale in cases:
        want = _run_ref(getattr(zoo_mod, name), imgs, masks)
        got = _run_ours(imgs, masks, **kw) * scale
        ratio = want / np.where(np.abs(got) < 1e-30, np.nan, got)
        finite = ratio[np.isfinite(ratio)]
        np.testing.assert_allclose(
            got, want, rtol=5e-3, atol=5e-3 * np.abs(want).max(),
            err_msg=f"{name}: ratio spread {np.nanstd(finite):.3g} "
                    f"around {np.nanmedian(finite):.6g}",
        )
        # and the semantic claim: identical downstream argmax
        np.testing.assert_array_equal(got.argmax(1), want.argmax(1), err_msg=name)


def test_load_bearing_par(zoo, data):
    """`RML/network/PAR.py::PAR` — the ONLY variant the training scripts import —
    matches par_refine AND par_variant_refine(extra='pos')."""
    _, net_mod = zoo
    imgs, masks = data
    want = _run_ref(net_mod.PAR, imgs, masks)
    got_a = np.asarray(par_refine(
        jnp.asarray(imgs.transpose(0, 2, 3, 1)), jnp.asarray(masks.transpose(0, 2, 3, 1)),
        dilations=DIL, num_iter=IT)).transpose(0, 3, 1, 2)
    got_b = _run_ours(imgs, masks, extra="pos")
    np.testing.assert_allclose(got_a, want, rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(got_b, want, rtol=2e-4, atol=2e-4)


def test_non_reducing_variants_exist(zoo):
    """The excluded variants are real classes — the exclusion is documented, not
    an oversight. PARgg: second affinity from a downsampled image; PAR2b:
    per-pixel division by the mask TV map; PAR3ey/3f/4: pandas-skewness scalars."""
    zoo_mod, _ = zoo
    for name in ("PARgg", "PAR2b", "PAR3ey", "PAR3f", "PAR4"):
        assert hasattr(zoo_mod, name), name
