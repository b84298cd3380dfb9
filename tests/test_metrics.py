import numpy as np

from representationlearning_tpu.metrics import seg as M


def test_scores_matches_reference_semantics():
    rng = np.random.default_rng(0)
    gt = rng.integers(0, 21, size=(4, 32, 32))
    gt[0, :4, :4] = 255  # ignore region
    pred = rng.integers(0, 21, size=(4, 32, 32))
    out = M.scores(list(gt), list(pred), num_classes=21)

    # re-derive with the reference formula
    hist = np.zeros((21, 21))
    for lt, lp in zip(gt, pred):
        mask = (lt >= 0) & (lt < 21)
        hist += np.bincount(21 * lt[mask].astype(int) + lp[mask], minlength=441).reshape(21, 21)
    acc = np.diag(hist).sum() / hist.sum()
    iu = np.diag(hist) / (hist.sum(1) + hist.sum(0) - np.diag(hist))
    valid = hist.sum(1) > 0
    assert np.isclose(out["pAcc"], acc)
    assert np.isclose(out["miou"], np.nanmean(iu[valid]))


def test_confusion_matrix_device_matches_numpy():
    rng = np.random.default_rng(1)
    gt = rng.integers(0, 7, size=(64, 64))
    gt[0, :10] = 255
    pred = rng.integers(0, 7, size=(64, 64))
    h_dev = np.asarray(M.confusion_matrix(gt, pred, 7))
    h_np = M._fast_hist(gt.flatten(), pred.flatten(), 7)
    np.testing.assert_array_equal(h_dev, h_np)


def test_miou_perfect_prediction():
    gt = np.tile(np.arange(5), 20).reshape(10, 10)
    assert M.scores([gt], [gt], num_classes=5)["miou"] == 1.0


def test_pseudo_scores_ignores_255_pred():
    gt = np.zeros((4, 4), int)
    pred = np.full((4, 4), 255)
    pred[0, 0] = 0
    out = M.pseudo_scores([gt], [pred], num_classes=2)
    assert out["pAcc"] == 1.0  # only the non-255 pixel counts


def test_f1_and_dice():
    y = np.array([1, 1, 0, 0, 1])
    p = np.array([1, 0, 0, 1, 1])
    import sklearn.metrics as skm

    assert np.isclose(M.multilabel_f1(y, p), skm.f1_score(y, p))
    pred = np.zeros((8, 8)); pred[:4] = 200
    tgt = np.zeros((8, 8)); tgt[:4, :4] = 200
    d = M.dice_coefficient(pred, tgt, threshold=150)
    assert np.isclose(d, (2 * 16 + 1) / (32 + 16 + 1))


def test_accumulator():
    acc = M.SegMetricAccumulator(3)
    gt = np.array([[0, 1], [2, 2]])
    acc.update(gt, gt)
    acc.update(gt, 2 - gt)
    s = acc.compute()
    assert 0.0 < s["miou"] < 1.0
