import jax
import jax.numpy as jnp
import numpy as np

from representationlearning_tpu.losses.energy import dense_energy_loss, get_energy_loss
from representationlearning_tpu.ops import bilateral as B


def test_grid_approximates_bruteforce():
    rng = np.random.default_rng(0)
    H = W = 16
    img = rng.integers(0, 255, (H, W, 3)).astype(np.float32)
    x = rng.random((H, W, 4)).astype(np.float32)
    exact = np.asarray(B.bilateral_filter_brute(jnp.asarray(img), jnp.asarray(x), 15.0, 8.0))
    approx = np.asarray(B.bilateral_filter_grid(jnp.asarray(img), jnp.asarray(x), 15.0, 8.0))
    # both are smoothing transforms; require high correlation and bounded rel error
    corr = np.corrcoef(exact.ravel(), approx.ravel())[0, 1]
    rel = np.abs(approx - exact).mean() / np.abs(exact).mean()
    ratio = approx.mean() / exact.mean()
    assert corr > 0.9, corr
    assert rel < 0.25, rel
    assert 0.85 < ratio < 1.15, ratio


def test_bilateral_smooth_image_acts_like_gaussian():
    # constant image -> pure spatial Gaussian; constant input -> near-constant response
    # away from borders
    H = W = 12
    img = jnp.full((H, W, 3), 128.0)
    x = jnp.ones((H, W, 1))
    out = np.asarray(B.bilateral_filter_grid(img, x, 15.0, 3.0))
    center = out[4:8, 4:8, 0]
    assert center.std() / center.mean() < 0.05


def test_energy_loss_custom_grad_matches_reference_rule():
    rng = np.random.default_rng(1)
    Bn, H, W, K = 2, 8, 8, 3
    imgs = rng.integers(0, 255, (Bn, H, W, 3)).astype(np.float32)
    logits = jnp.asarray(rng.standard_normal((Bn, H, W, K)).astype(np.float32))
    rois = jnp.ones((Bn, H, W))
    label = jnp.zeros((Bn, H, W), jnp.int32)

    def loss_fn(lg):
        probs = jax.nn.softmax(lg, axis=-1)
        return dense_energy_loss(
            jnp.asarray(imgs), probs, rois, label,
            weight=1.0, sigma_rgb=15.0, sigma_xy=16.0, scale_factor=1.0, method="brute",
        )

    val, grad = jax.value_and_grad(loss_fn)(logits)
    assert np.isfinite(float(val)) and float(val) < 0  # -S·AS is negative for positive S

    # reference gradient rule: dL/dS = -2 AS / N * ROI, chained through softmax
    probs = jax.nn.softmax(logits, axis=-1)
    S = probs * rois[..., None]
    AS = B.bilateral_filter_batch(jnp.asarray(imgs), S, 15.0, 16.0, method="brute")
    seg_max = probs.max(-1)
    gate = jnp.clip(rois - seg_max, 0.0, None)[..., None]
    AS = AS * gate
    gS = -2.0 * AS / Bn * rois[..., None]
    # chain through softmax: dL/dlogit = J_softmax^T gS
    dot = (gS * probs).sum(-1, keepdims=True)
    expected = probs * (gS - dot)
    np.testing.assert_allclose(np.asarray(grad), np.asarray(expected), rtol=1e-4, atol=1e-5)


def test_get_energy_loss_end_to_end_shapes():
    rng = np.random.default_rng(2)
    Bn, H, W, K = 2, 16, 16, 5
    img_norm = jnp.asarray(rng.standard_normal((Bn, H, W, 3)).astype(np.float32))
    logit = jnp.asarray(rng.standard_normal((Bn, H, W, K)).astype(np.float32))
    label = jnp.asarray(rng.integers(0, K, (Bn, H, W)))
    box = jnp.asarray([[0, H, 0, W], [2, 10, 3, 12]])
    loss = get_energy_loss(img_norm, logit, label, box, weight=1e-7, sigma_rgb=15.0,
                           sigma_xy=100.0, scale_factor=0.5)
    assert np.isfinite(float(loss))


def test_native_permutohedral_matches_exact_convention():
    """The C++ lattice reproduces the exact Gaussian transform up to the standard
    lattice gain (stable constant) and matches it closely after homogeneous
    normalization."""
    import pytest

    from representationlearning_tpu import native as N

    if not N.available():
        pytest.skip("no g++ toolchain")
    rng = np.random.default_rng(0)
    H = W = 16
    img = rng.integers(0, 255, (H, W, 3)).astype(np.float32)
    x = rng.random((H, W, 4)).astype(np.float32)
    exact = np.asarray(B.bilateral_filter_brute(jnp.asarray(img), jnp.asarray(x), 15.0, 8.0))
    ones = np.asarray(B.bilateral_filter_brute(jnp.asarray(img), jnp.ones((H, W, 1), np.float32), 15.0, 8.0))
    nat = N.bilateral_filter_native(img, x, 15.0, 8.0)
    nat_ones = N.bilateral_filter_native(img, np.ones((H, W, 1), np.float32), 15.0, 8.0)

    ratio = nat.mean() / exact.mean()
    assert abs(ratio - B.LATTICE_GAIN_5D) / B.LATTICE_GAIN_5D < 0.05
    avg_err = np.abs(nat / nat_ones - exact / ones).mean() / np.abs(exact / ones).mean()
    assert avg_err < 0.12


def test_energy_loss_native_backend():
    import pytest

    from representationlearning_tpu import native as N

    if not N.available():
        pytest.skip("no g++ toolchain")
    rng = np.random.default_rng(5)
    Bn, H, W, K = 2, 8, 8, 3
    img_norm = jnp.asarray(rng.standard_normal((Bn, H, W, 3)).astype(np.float32))
    logit = jnp.asarray(rng.standard_normal((Bn, H, W, K)).astype(np.float32))
    label = jnp.zeros((Bn, H, W), jnp.int32)
    box = jnp.asarray([[0, H, 0, W]] * Bn)
    loss = get_energy_loss(img_norm, logit, label, box, weight=1.0, sigma_rgb=15.0,
                           sigma_xy=16.0, scale_factor=1.0, method="native")
    assert np.isfinite(float(loss)) and float(loss) < 0
