import numpy as np
import pytest

from representationlearning_tpu.data import transforms as T


@pytest.fixture
def img(rng):
    return rng.integers(0, 255, size=(40, 60, 3)).astype(np.float32)


def test_normalize_roundtrip(img):
    n = T.normalize_img(img)
    back = T.denormalize_img(n)
    np.testing.assert_allclose(back, img, rtol=1e-4, atol=1e-3)


def test_random_scaling_shape(rng, img):
    out = T.random_scaling(rng, img, scale_range=(0.5, 0.5))
    assert out.shape == (20, 30, 3)


def test_random_crop_box_semantics(rng, img):
    label = np.zeros(img.shape[:2], np.uint8)
    crop, clabel, box = T.random_crop(rng, img, label, crop_size=64, ignore_index=255)
    assert crop.shape == (64, 64, 3) and clabel.shape == (64, 64)
    h0, h1, w0, w1 = box
    # inside the box: real pixels (label != 255); outside: padding (label == 255)
    assert (clabel[h0:h1, w0:w1] != 255).all()
    outside = np.ones((64, 64), bool)
    outside[h0:h1, w0:w1] = False
    assert (clabel[outside] == 255).all()


def test_random_crop_no_pad_case(rng):
    big = rng.random((200, 200, 3)).astype(np.float32) * 255
    label = rng.integers(0, 5, size=(200, 200)).astype(np.uint8)
    crop, clabel, box = T.random_crop(rng, big, label, crop_size=64)
    assert crop.shape == (64, 64, 3)
    assert list(box) == [0, 64, 0, 64]  # fully covered by real pixels


def test_flips_deterministic_given_rng(img):
    r1 = np.random.default_rng(42)
    r2 = np.random.default_rng(42)
    a = T.random_fliplr(r1, img)
    b = T.random_fliplr(r2, img)
    np.testing.assert_array_equal(a, b)


def test_photometric_distortion_output_valid(rng, img):
    pmd = T.PhotoMetricDistortion()
    out = pmd(rng, img.astype(np.uint8))
    assert out.dtype == np.uint8 and out.shape == img.shape


def test_hsv_roundtrip():
    rng = np.random.default_rng(7)
    img = rng.integers(0, 255, size=(16, 16, 3)).astype(np.uint8)
    hsv = T._rgb_to_hsv_cv(img)
    back = T._hsv_to_rgb_cv(hsv)
    assert np.abs(back.astype(int) - img.astype(int)).max() <= 2


def test_threaded_loader_and_device_prefetch_preserve_order():
    """Input-pipeline overlap (`DataLoader(num_workers=10)` analog,
    `SCD dist_train_voc.py:214-229`): batches arrive in exactly the synchronous
    order, worker errors propagate, and device_prefetch keeps items coming."""
    import numpy as np
    from representationlearning_tpu.data.prefetch import ThreadedLoader, device_prefetch

    batches = [np.full((2, 3), i) for i in range(7)]
    got = list(ThreadedLoader(batches, depth=3))
    assert [int(b[0, 0]) for b in got] == list(range(7))

    def boom():
        yield batches[0]
        raise RuntimeError("worker died")

    it = iter(ThreadedLoader(boom(), depth=2))
    next(it)
    try:
        next(it)
        raise AssertionError("worker error not propagated")
    except RuntimeError as e:
        assert "worker died" in str(e)

    dev = list(device_prefetch(iter(batches), n=2))
    assert len(dev) == 7
    assert [int(np.asarray(b)[0, 0]) for b in dev] == list(range(7))


def test_shift_scale_rotate_semantics():
    """shift_scale_rotate: identity at zero limits; integer shift == reflected
    roll; nearest mask interp introduces no new labels; reflect-101 border."""
    from representationlearning_tpu.data.transforms import shift_scale_rotate

    rng = np.random.default_rng(0)
    img = rng.random((32, 40, 3)).astype(np.float32) * 255
    mask = rng.integers(0, 5, (32, 40)).astype(np.int32)

    # zero limits -> identity warp
    out, m = shift_scale_rotate(np.random.default_rng(1), img, mask,
                                shift_limit=0, scale_limit=0, rotate_limit=0)
    np.testing.assert_allclose(out, img, atol=1e-3)
    np.testing.assert_array_equal(m, mask)

    # pure 1-pixel x-shift (dx = 1/w): column j reads column j-1, border reflects
    class FixedRng:
        def __init__(self, vals):
            self.vals = list(vals)

        def uniform(self, lo, hi):
            return self.vals.pop(0)

    fr = FixedRng([0.0, 0.0, 1.0 / 40.0, 0.0])  # angle, scale-1... order: angle, scale, dx, dy
    out, m = shift_scale_rotate(fr, img, mask, shift_limit=1.0, scale_limit=0,
                                rotate_limit=0)
    np.testing.assert_array_equal(m[:, 1:], mask[:, :-1])
    np.testing.assert_array_equal(m[:, 0], mask[:, 1])  # reflect-101 border

    # random warp: labels subset of originals (nearest), shapes preserved
    out, m = shift_scale_rotate(rng, img, mask)
    assert out.shape == img.shape and m.shape == mask.shape
    assert set(np.unique(m)).issubset(set(np.unique(mask)))
