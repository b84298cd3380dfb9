import jax.numpy as jnp
import numpy as np

from representationlearning_tpu.ops import crf as CRF
from representationlearning_tpu.wsss import indexing as IX


def test_path_index_structure():
    pi = IX.PathIndex(radius=3, default_size=(10, 12))
    # all destinations within radius
    for dy, dx in pi.search_dst:
        assert dy * dy + dx * dx < 9
        assert dy >= 0
    # src/dst index counts line up
    n_pos = (10 - pi.radius_floor) * (12 - 2 * pi.radius_floor)
    assert pi.src_indices.shape == (n_pos,)
    for group in pi.path_indices:
        assert group.shape[-1] == n_pos


def test_edge_to_affinity_zero_edges_full_affinity():
    pi = IX.PathIndex(radius=3, default_size=(8, 8))
    edge = jnp.zeros((1, 64))
    aff = IX.edge_to_affinity(edge, pi.path_indices)
    np.testing.assert_allclose(np.asarray(aff), 1.0)


def test_transition_matrix_column_stochastic():
    rng = np.random.default_rng(0)
    A = jnp.asarray(rng.random((20, 20)).astype(np.float32))
    A = (A + A.T) / 2 + jnp.eye(20)
    T = IX.to_transition_matrix(A, beta=4, times=3)
    np.testing.assert_allclose(np.asarray(T.sum(0)), 1.0, atol=1e-4)


def test_propagate_to_edge_shapes_and_mass():
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.random((3, 12, 12)).astype(np.float32))
    edge = jnp.zeros((12, 12))
    rw = IX.propagate_to_edge(x, edge, radius=3, beta=2, exp_times=2)
    assert rw.shape == (3, 12, 12)
    assert bool(jnp.isfinite(rw).all())
    # column-stochastic walk preserves total mass when edges are zero
    np.testing.assert_allclose(float(rw.sum()), float(x.sum()), rtol=1e-3)


def test_affinity_labels_reference_semantics():
    pi = IX.PathIndex(radius=2, default_size=(6, 6))
    labeler = IX.GetAffinityLabelFromIndices(pi.src_indices, pi.dst_indices)
    seg = np.zeros((6, 6), np.uint8)
    seg[:, 3:] = 1
    seg[0, 0] = 255
    bg_pos, fg_pos, neg = labeler(seg)
    assert bg_pos.shape == fg_pos.shape == neg.shape
    assert bg_pos.sum() > 0 and fg_pos.sum() > 0 and neg.sum() > 0
    # disjoint
    assert not np.any((bg_pos > 0) & (fg_pos > 0))
    assert not np.any((bg_pos + fg_pos > 0) & (neg > 0))


def test_crf_label_inference_respects_strong_unary():
    rng = np.random.default_rng(2)
    img = np.zeros((24, 24, 3), np.float32)
    img[:, 12:] = 255.0
    labels = np.zeros((24, 24), np.int64)
    labels[:, 12:] = 1
    labels[5, 5] = 1  # noisy pixel inside region 0
    out = CRF.crf_inference_label(img, labels, t=5, n_labels=2)
    # CRF should clean the isolated noisy label
    assert out[5, 5] == 0
    # and keep the two halves intact
    assert (out[:, :10] == 0).mean() > 0.9
    assert (out[:, 14:] == 1).mean() > 0.9


def test_crf_softmax_inference_shape():
    rng = np.random.default_rng(3)
    img = rng.integers(0, 255, (16, 16, 3)).astype(np.float32)
    probs = rng.random((4, 16, 16)).astype(np.float32)
    probs /= probs.sum(0, keepdims=True)
    out = CRF.crf_inference(img, probs, t=3, labels=4)
    assert out.shape == (4, 16, 16)
    np.testing.assert_allclose(out.sum(0), 1.0, atol=1e-4)


def test_mean_field_matches_bruteforce_densecrf(rng):
    """Cross-validate `ops/crf.py` against an independent O(N^2) numpy mean-field
    implementing pydensecrf's exact semantics (`SCD-AAAI2023/utils/dcrf.py:7-24`:
    DIAG Potts compatibility, NORMALIZE_SYMMETRIC kernels, Q <- softmax(-U + sum_m
    w_m K~_m Q)). The on-device bilateral message rides the approximate bilateral
    grid, so agreement is asserted loosely: argmax labels nearly everywhere plus
    high Q correlation."""
    from representationlearning_tpu.ops.crf import mean_field_inference, unary_from_softmax

    H, W, C = 18, 16, 3
    img = (rng.random((H, W, 3)) * 255).astype(np.float32)
    logits = rng.standard_normal((H, W, C)).astype(np.float32) * 2.0
    probs = np.exp(logits) / np.exp(logits).sum(-1, keepdims=True)

    sxy_g, compat_g, sxy_b, srgb_b, compat_b, t = 3.0, 3.0, 8.0, 13.0, 10.0, 5

    # --- brute force reference ---
    yy, xx = np.mgrid[0:H, 0:W]
    pos = np.stack([yy.ravel(), xx.ravel()], -1).astype(np.float64)
    d2 = ((pos[:, None, :] - pos[None, :, :]) ** 2).sum(-1)
    Kg = np.exp(-d2 / (2 * sxy_g ** 2))
    rgb = img.reshape(-1, 3).astype(np.float64)
    dc2 = ((rgb[:, None, :] - rgb[None, :, :]) ** 2).sum(-1)
    Kb = np.exp(-d2 / (2 * sxy_b ** 2) - dc2 / (2 * srgb_b ** 2))

    def sym_apply(K, Q):
        norm = 1.0 / np.sqrt(np.clip(K @ np.ones(K.shape[0]), 1e-20, None))
        return norm[:, None] * (K @ (norm[:, None] * Q))

    U = -np.log(np.clip(probs.reshape(-1, C), 1e-8, None))
    Q = np.exp(-U) / np.exp(-U).sum(-1, keepdims=True)
    for _ in range(t):
        msg = compat_g * sym_apply(Kg, Q) + compat_b * sym_apply(Kb, Q)
        e = -U + msg
        e -= e.max(-1, keepdims=True)
        Q = np.exp(e) / np.exp(e).sum(-1, keepdims=True)
    want = Q.reshape(H, W, C)

    got = np.asarray(mean_field_inference(
        jnp.asarray(img), unary_from_softmax(jnp.asarray(probs)), t=t,
        sxy_g=sxy_g, compat_g=compat_g, sxy_b=sxy_b, srgb_b=srgb_b, compat_b=compat_b,
    ))

    agree = (got.argmax(-1) == want.argmax(-1)).mean()
    corr = np.corrcoef(got.ravel(), want.ravel())[0, 1]
    assert agree > 0.9, agree
    assert corr > 0.9, corr


def test_crf_label_grid_vs_native():
    """Label-level agreement of the bilateral-grid CRF vs the exact C++
    permutohedral lattice backend — the approximation pseudo-labels flow
    through in `cam_to_ir_label` (`WaveCAM-TMM2023/step/cam_to_ir_label.py:19-62`)
    and `cam_to_fg_bg_label` (`RML/.../camutils.py:39-83`). The grid's ~0.14
    filter-level relative error collapses to <1% label flips after the
    hard-label unary + 10 mean-field rounds: measured 99.93% mean pixel
    agreement over 4 synthetic CAM-like images at 96x128 (PARITY.md); this
    test asserts the same property at a smaller geometry (99.90% measured)
    to stay inside the fast-tier time budget."""
    rng = np.random.default_rng(0)
    H, W = 64, 96
    img = np.zeros((H, W, 3), np.float32)
    lab = np.zeros((H, W), np.int32)
    for k in range(1, 4):
        cy, cx = rng.integers(10, H - 10), rng.integers(10, W - 10)
        r = rng.integers(8, 20)
        yy, xx = np.mgrid[0:H, 0:W]
        m = (yy - cy) ** 2 + (xx - cx) ** 2 < r * r
        lab[m] = k
        img[m] = rng.random(3) * 200 + 30
    img += rng.normal(0, 12, img.shape).astype(np.float32)
    img = np.clip(img, 0, 255)
    noisy = np.where(rng.random((H, W)) < 0.08,
                     rng.integers(0, 4, (H, W)), lab)
    g = CRF.crf_inference_label(img, noisy, t=10, n_labels=4, method="grid")
    n = CRF.crf_inference_label(img, noisy, t=10, n_labels=4, method="native")
    agree = (g == n).mean()
    assert agree > 0.99, agree
