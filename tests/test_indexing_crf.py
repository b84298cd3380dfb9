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
