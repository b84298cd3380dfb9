"""Forced-decision parity: the fused on-device augmentation chain
(`data/device_transforms.py`) vs the host numpy/PIL chain
(`data/transforms.py`), given identical random decisions.

A scripted FakeRng drives the host chain with chosen draw values; the same
values are packed into the device decision dict. Spatial placement, flips,
img_box, label crops and the cat_max_ratio selection must agree exactly;
pixel values agree bit-near for s=1 (no resampling) and within PIL's uint8
fixed-point rounding for upscales.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

import representationlearning_tpu.data.transforms as T
from representationlearning_tpu.data.device_transforms import (
    DeviceAugConfig, augment_cls_batch, augment_seg_batch, pad_to_canvas,
    sample_cls_decisions, sample_seg_decisions,
)


class FakeRng:
    """Pops scripted values for random()/uniform()/integers() in call order."""

    def __init__(self, values):
        self.q = list(values)

    def random(self):
        return self.q.pop(0)

    def uniform(self, a, b):
        v = self.q.pop(0)
        assert a <= v <= b, (a, v, b)
        return v

    def integers(self, a, b=None):
        v = self.q.pop(0)
        if b is None:
            a, b = 0, a
        assert a <= v < b, (a, v, b)
        return v


def _u(k, n):
    """u01 such that floor(u * n) == k."""
    return (k + 0.5) / n


def _host_cls(img, scale, flip01, pad_hw, start_hw, crop):
    """VOC12ClsDataset.__getitem__ aug steps with scripted draws."""
    rng = FakeRng([scale, flip01, pad_hw[0], pad_hw[1], start_hw[0], start_hw[1]])
    image = img.astype(np.float32)
    image = T.random_scaling(rng, image, scale_range=(0.5, 2.0))
    image = T.random_fliplr(rng, image)
    image, box = T.random_crop(rng, image, None, crop_size=crop,
                               mean_rgb=(0, 0, 0), ignore_index=255)
    return T.normalize_img(image), box


def _device_cls(img, scale, flip01, pad_hw, start_hw, crop, canvas=64):
    h, w = img.shape[:2]
    sh, sw = int(scale * h), int(scale * w)
    Hc, Wc = max(crop, sh), max(crop, sw)
    images, hw = pad_to_canvas([img], canvas)
    dec = {
        "scale": jnp.asarray([scale], jnp.float32),
        "flip": jnp.asarray([flip01 > 0.5]),
        "pad_u": jnp.asarray(
            [[_u(pad_hw[0], Hc - sh + 1), _u(pad_hw[1], Wc - sw + 1)]],
            jnp.float32),
        "crop_u": jnp.asarray(
            [[[_u(start_hw[0], Hc - crop + 1), _u(start_hw[1], Wc - crop + 1)]]
             * 10], jnp.float32),
    }
    cfg = DeviceAugConfig(crop_size=crop, scale_range=(0.5, 2.0))
    out, box = jax.jit(lambda i, h_, d: augment_cls_batch(i, h_, d, cfg))(
        jnp.asarray(images), jnp.asarray(hw), dec)
    return np.asarray(out[0]), np.asarray(box[0])


@pytest.mark.parametrize("hw,crop,flip01,pad,start", [
    ((24, 30), 20, 0.8, (0, 0), (3, 5)),     # crop inside image, flipped
    ((12, 14), 20, 0.2, (5, 2), (0, 0)),     # image smaller than crop: padding
])
def test_cls_scale1_bit_parity(hw, crop, flip01, pad, start):
    rng = np.random.default_rng(0)
    img = rng.integers(0, 256, hw + (3,), dtype=np.uint8)
    want, wbox = _host_cls(img, 1.0, flip01, pad, start, crop)
    got, gbox = _device_cls(img, 1.0, flip01, pad, start, crop)
    np.testing.assert_array_equal(gbox, wbox)
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_cls_upscale_close_to_pil():
    rng = np.random.default_rng(1)
    img = rng.integers(0, 256, (24, 30, 3), dtype=np.uint8)
    scale = 1.5
    sh, sw = int(scale * 24), int(scale * 30)
    crop = 32
    # sh=36, sw=45 both exceed crop=32, so the canvas equals the scaled image
    # and the pad offsets have a single choice (0)
    want, wbox = _host_cls(img, scale, 0.9, (0, 0), (1, 3), crop)
    got, gbox = _device_cls(img, scale, 0.9, (0, 0), (1, 3), crop)
    np.testing.assert_array_equal(gbox, wbox)
    # PIL resizes uint8 with 8-bit fixed-point filter weights; the device path
    # keeps float taps. Same tap placement -> within ~2 uint8 LSB, i.e.
    # 2/57 after normalize.
    np.testing.assert_allclose(got, want, atol=2.0 / 57.0)
    # the padded region (outside img_box) must be exactly the normalized fill
    h0, h1, w0, w1 = gbox
    mask = np.ones(got.shape[:2], bool)
    mask[h0:h1, w0:w1] = False
    if mask.any():
        fill = T.normalize_img(np.zeros((1, 1, 3), np.float32))
        np.testing.assert_allclose(got[mask], np.broadcast_to(
            fill[0, 0], (mask.sum(), 3)), atol=1e-5)


def _host_seg(img, lab, script, crop):
    rng = FakeRng(script)
    image, label = T.random_fliplr(rng, img.astype(np.float32), lab)
    pm = T.PhotoMetricDistortion()
    image = pm(rng, image.astype(np.uint8)).astype(np.float32)
    image, label, box = T.random_crop(
        rng, image, label, crop_size=crop, mean_rgb=T.IMAGENET_MEAN,
        ignore_index=255)
    return T.normalize_img(image), label, box


def test_seg_forced_parity_with_photometric_and_retry():
    rng = np.random.default_rng(2)
    h, w, crop = 30, 26, 24
    img = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
    # label: top half class 1, bottom half class 2, so some windows pass the
    # cat_max_ratio predicate and some (pure-class) fail
    lab = np.zeros((h, w), np.int32)
    lab[: h // 2] = 1
    lab[h // 2:] = 2
    lab[:4] = 0

    flip01 = 0.9
    # photometric: bright on (delta 10.25), mode 1, contrast on (1.2),
    # sat on (0.8), hue on (-7)
    pm_script = [1, 10.25, 1, 1, 1.2, 1, 0.8, 1, -7]
    pad = (0, 0)  # h,w <= crop is false here (h=30>24): canvas == max sizes
    Hc, Wc = max(crop, h), max(crop, w)
    # tries: first window pure-class (fails: rows 0..23 of flipped? rows are
    # flip-invariant vertically) -> top rows 0..23 contain classes 0,1,2 ->
    # may pass; script two tries with the second passing to exercise retry
    tries = [(6, 0), (0, 0)]
    script = [flip01] + pm_script + [pad[0], pad[1]]
    for t in tries:
        script += [t[0], t[1]]
    # host stops at the first passing try; figure out how many draws it makes
    want_img, want_lab, wbox = _host_seg(img, lab, list(script), crop)

    images, hw, labs = pad_to_canvas([img], 32, [lab])
    dec = {
        "scale": jnp.ones((1,), jnp.float32),
        "flip": jnp.asarray([flip01 > 0.5]),
        "pad_u": jnp.asarray([[_u(pad[0], Hc - h + 1), _u(pad[1], Wc - w + 1)]],
                             jnp.float32),
        "crop_u": jnp.asarray(
            [[[_u(t[0], Hc - crop + 1), _u(t[1], Wc - crop + 1)]
              for t in (tries + [tries[-1]] * 8)]], jnp.float32),
        "bright_on": jnp.asarray([True]),
        "bright_delta": jnp.asarray([10.25], jnp.float32),
        "mode": jnp.asarray([1], jnp.int32),
        "contrast_on": jnp.asarray([True]),
        "contrast_alpha": jnp.asarray([1.2], jnp.float32),
        "sat_on": jnp.asarray([True]),
        "sat_alpha": jnp.asarray([0.8], jnp.float32),
        "hue_on": jnp.asarray([True]),
        "hue_delta": jnp.asarray([-7.0], jnp.float32),
    }
    cfg = DeviceAugConfig(crop_size=crop, scale_range=None, photometric=True,
                          num_classes=3, crop_tries=10)
    got_img, got_lab, gbox = jax.jit(
        lambda i, h_, l, d: augment_seg_batch(i, h_, l, d, cfg))(
        jnp.asarray(images), jnp.asarray(hw), jnp.asarray(labs), dec)
    np.testing.assert_array_equal(np.asarray(gbox[0]), wbox)
    np.testing.assert_array_equal(np.asarray(got_lab[0]),
                                  want_lab.astype(np.int32))
    # photometric: identical math with replicated uint8 quantization. The
    # chain floors to uint8 after every step, and quantized inputs land MANY
    # intermediates exactly on integers, where a 1-ULP difference between
    # XLA's and numpy's f32 arithmetic flips the floor by 1 LSB (twice, for
    # the two HSV round-trips). Deterministically ~0.6% of pixels here.
    diff = np.abs(np.asarray(got_img[0]) - want_img) * 57.0  # ~uint8 LSB units
    assert diff.max() <= 2.1, diff.max()
    assert (diff > 1.05).mean() < 0.02, (diff > 1.05).mean()


def test_host_stops_early_device_picks_same_try():
    """If the FIRST try passes, the host consumes fewer draws; the device
    scores all tries but must select the same (first passing) one."""
    h, w, crop = 30, 26, 24
    rng = np.random.default_rng(3)
    img = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
    lab = np.zeros((h, w), np.int32)
    lab[: h // 2] = 1
    lab[h // 2:] = 2
    pm_script = [0, 0, 0, 0, 0]  # all photometric gates off (mode draw = 0)
    script = [0.2] + pm_script + [0, 0, 3, 1]  # no flip; pad 0; try (3,1) passes
    want_img, want_lab, wbox = _host_seg(img, lab, script, crop)

    images, hw, labs = pad_to_canvas([img], 32, [lab])
    Hc, Wc = max(crop, h), max(crop, w)
    # device gets the passing try FIRST then 9 pure-class (failing) windows
    tries = [(3, 1)] + [(0, 0)] * 9
    lab2 = lab.copy()
    dec = {
        "scale": jnp.ones((1,), jnp.float32),
        "flip": jnp.asarray([False]),
        "pad_u": jnp.asarray([[_u(0, Hc - h + 1), _u(0, Wc - w + 1)]],
                             jnp.float32),
        "crop_u": jnp.asarray(
            [[[_u(t[0], Hc - crop + 1), _u(t[1], Wc - crop + 1)]
              for t in tries]], jnp.float32),
        "bright_on": jnp.asarray([False]),
        "bright_delta": jnp.zeros((1,), jnp.float32),
        "mode": jnp.asarray([0], jnp.int32),
        "contrast_on": jnp.asarray([False]),
        "contrast_alpha": jnp.ones((1,), jnp.float32),
        "sat_on": jnp.asarray([False]),
        "sat_alpha": jnp.ones((1,), jnp.float32),
        "hue_on": jnp.asarray([False]),
        "hue_delta": jnp.zeros((1,), jnp.float32),
    }
    cfg = DeviceAugConfig(crop_size=crop, scale_range=None, num_classes=3)
    got_img, got_lab, gbox = augment_seg_batch(
        jnp.asarray(images), jnp.asarray(hw), jnp.asarray(lab2[None]), dec, cfg)
    np.testing.assert_array_equal(np.asarray(gbox[0]), wbox)
    np.testing.assert_array_equal(np.asarray(got_lab[0]),
                                  want_lab.astype(np.int32))
    np.testing.assert_allclose(np.asarray(got_img[0]), want_img,
                               atol=1.01 / 57.0)


def _loveda_host(img, mask, script, crop):
    """`LoveDADataset.__getitem__` training steps with scripted draws."""
    rng = FakeRng(script)
    image, label, _ = T.random_crop(rng, img.astype(np.float32),
                                    mask.astype(np.float32), crop_size=crop,
                                    mean_rgb=(0, 0, 0), ignore_index=-1)
    label = label.astype(np.int64)
    if rng.random() < 0.75:
        op = rng.integers(3)
        if op == 0:
            image, label = np.fliplr(image), np.fliplr(label)
        elif op == 1:
            image, label = np.flipud(image), np.flipud(label)
        else:
            k = int(rng.integers(1, 4))
            image, label = np.rot90(image, k), np.rot90(label, k)
    if rng.random() < 0.2:
        image, label2 = T.shift_scale_rotate(
            rng, np.ascontiguousarray(image),
            np.ascontiguousarray(label).astype(np.int32))
        label = label2.astype(np.int64)
    return T.normalize_img(np.ascontiguousarray(image)), np.ascontiguousarray(label)


def _loveda_device(img, mask, dec_overrides, crop, canvas=48):
    from representationlearning_tpu.data.device_transforms import (
        LoveDAAugConfig, augment_loveda_batch,
    )

    images, hw, labs = pad_to_canvas([img], canvas, [mask.astype(np.int32)],
                                     ignore_index=-1)
    dec = {
        "pad_u": jnp.zeros((1, 2), jnp.float32),
        "crop_u": jnp.zeros((1, 10, 2), jnp.float32),
        "fr_on": jnp.asarray([False]),
        "op": jnp.zeros((1,), jnp.int32),
        "rot_k": jnp.ones((1,), jnp.int32),
        "ssr_on": jnp.asarray([False]),
        "angle": jnp.zeros((1,), jnp.float32),
        "ssr_scale": jnp.ones((1,), jnp.float32),
        "shift": jnp.zeros((1, 2), jnp.float32),
    }
    dec.update(dec_overrides)
    cfg = LoveDAAugConfig(crop_size=crop, num_classes=3)
    out, lab = jax.jit(lambda i, h, m, d: augment_loveda_batch(i, h, m, d, cfg))(
        jnp.asarray(images), jnp.asarray(hw), jnp.asarray(labs), dec)
    return np.asarray(out[0]), np.asarray(lab[0])


def _loveda_sample(seed=5, h=40, w=40):
    rng = np.random.default_rng(seed)
    img = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
    mask = rng.integers(0, 3, (h, w)).astype(np.int64)
    mask[:3] = -1  # a band of ignore, as LoveDA's mask-1 produces
    return img, mask


@pytest.mark.parametrize("op,k", [(0, 1), (1, 1), (2, 1), (2, 2), (2, 3)])
def test_loveda_crop_fliprot_bit_parity(op, k):
    img, mask = _loveda_sample()
    h, w, crop = 40, 40, 32
    Hc = Wc = 40
    pad = (0, 0)
    tries = [(5, 2)]
    script = [pad[0], pad[1], tries[0][0], tries[0][1], 0.1, op] + \
        ([k] if op == 2 else []) + [0.9]  # fr on (0.1<0.75), ssr off (0.9>=0.2)
    want_img, want_lab = _loveda_host(img, mask, script, crop)
    got_img, got_lab = _loveda_device(img, mask, {
        "crop_u": jnp.full((1, 10, 2), 0.0, jnp.float32).at[0, :, 0].set(
            _u(tries[0][0], Hc - crop + 1)).at[0, :, 1].set(
            _u(tries[0][1], Wc - crop + 1)),
        "fr_on": jnp.asarray([True]),
        "op": jnp.asarray([op], jnp.int32),
        "rot_k": jnp.asarray([k], jnp.int32),
    }, crop)
    np.testing.assert_array_equal(got_lab, want_lab.astype(np.int32))
    np.testing.assert_allclose(got_img, want_img, atol=1e-5)


def test_loveda_ssr_close_to_cv2():
    pytest.importorskip("cv2")
    img, mask = _loveda_sample(seed=6)
    crop = 32
    angle, scale, dx, dy = 17.0, 1.1, 0.03, -0.02
    script = [0, 0, 5, 2, 0.9, 0.1, angle, scale - 1.0, dx, dy]
    # fr off (0.9 >= 0.75), ssr on (0.1 < 0.2)
    want_img, want_lab = _loveda_host(img, mask, script, crop)
    got_img, got_lab = _loveda_device(img, mask, {
        "crop_u": jnp.full((1, 10, 2), 0.0, jnp.float32).at[0, :, 0].set(
            _u(5, 40 - crop + 1)).at[0, :, 1].set(_u(2, 40 - crop + 1)),
        "ssr_on": jnp.asarray([True]),
        "angle": jnp.asarray([angle], jnp.float32),
        "ssr_scale": jnp.asarray([scale], jnp.float32),
        "shift": jnp.asarray([[dx, dy]], jnp.float32),
    }, crop)
    # cv2 INTER_LINEAR quantizes tap fractions to 1/32 (INTER_BITS=5); the
    # device warp keeps float taps. Same geometry -> close values, and the
    # nearest-mask agrees except where fraction quantization flips a
    # boundary pixel.
    diff = np.abs(got_img - want_img)
    assert np.quantile(diff, 0.99) < 0.06, np.quantile(diff, 0.99)
    assert diff.max() < 0.6, diff.max()
    assert (got_lab == want_lab).mean() > 0.97, (got_lab == want_lab).mean()


def test_loveda_identity_ssr_is_noop():
    img, mask = _loveda_sample(seed=7)
    crop = 32
    base = {
        "crop_u": jnp.full((1, 10, 2), _u(4, 9), jnp.float32),
    }
    a_img, a_lab = _loveda_device(img, mask, base, crop)
    b_img, b_lab = _loveda_device(img, mask, {
        **base, "ssr_on": jnp.asarray([True]),
        "angle": jnp.zeros((1,), jnp.float32),
        "ssr_scale": jnp.ones((1,), jnp.float32),
        "shift": jnp.zeros((1, 2), jnp.float32),
    }, crop)
    np.testing.assert_array_equal(a_lab, b_lab)
    np.testing.assert_allclose(a_img, b_img, atol=1e-4)


def test_loveda_sampled_jit():
    from representationlearning_tpu.data.device_transforms import (
        LoveDAAugConfig, augment_loveda_batch, sample_loveda_decisions,
    )

    B, S, crop = 4, 48, 32
    rng = np.random.default_rng(8)
    imgs = [rng.integers(0, 256, (int(rng.integers(36, 48)), 44, 3), np.uint8)
            for _ in range(B)]
    masks = [rng.integers(-1, 3, i.shape[:2]).astype(np.int32) for i in imgs]
    images, hw, labs = pad_to_canvas(imgs, S, masks, ignore_index=-1)
    cfg = LoveDAAugConfig(crop_size=crop, num_classes=3)
    dec = sample_loveda_decisions(jax.random.PRNGKey(0), B, cfg)
    out, lab = jax.jit(lambda i, h, m, d: augment_loveda_batch(i, h, m, d, cfg))(
        jnp.asarray(images), jnp.asarray(hw), jnp.asarray(labs), dec)
    assert out.shape == (B, crop, crop, 3) and lab.shape == (B, crop, crop)
    assert np.isfinite(np.asarray(out)).all()
    assert set(np.unique(np.asarray(lab)).tolist()) <= {-1, 0, 1, 2}


def test_sampled_batch_shapes_and_jit():
    """End-to-end with sampled decisions under jit: shapes, dtypes, finite,
    boxes in range, labels only valid classes or ignore."""
    B, S, crop = 4, 48, 32
    rng = np.random.default_rng(4)
    imgs, labs = [], []
    for b in range(B):
        h, w = int(rng.integers(20, 48)), int(rng.integers(20, 48))
        imgs.append(rng.integers(0, 256, (h, w, 3), dtype=np.uint8))
        labs.append(rng.integers(0, 4, (h, w)).astype(np.int32))
    images, hw, labels = pad_to_canvas(imgs, S, labs)

    cfg = DeviceAugConfig(crop_size=crop, scale_range=(0.5, 2.0), num_classes=4)
    dec = sample_cls_decisions(jax.random.PRNGKey(0), B, cfg)
    out, box = jax.jit(lambda i, h_, d: augment_cls_batch(i, h_, d, cfg))(
        jnp.asarray(images), jnp.asarray(hw), dec)
    assert out.shape == (B, crop, crop, 3) and out.dtype == jnp.float32
    assert np.isfinite(np.asarray(out)).all()
    b = np.asarray(box)
    assert (b[:, 0] <= b[:, 1]).all() and (b[:, 2] <= b[:, 3]).all()
    assert (b >= 0).all() and (b <= crop).all()

    cfg_seg = cfg._replace(scale_range=None, photometric=True)
    dec = sample_seg_decisions(jax.random.PRNGKey(1), B, cfg_seg)
    out, lab, box = jax.jit(
        lambda i, h_, l, d: augment_seg_batch(i, h_, l, d, cfg_seg))(
        jnp.asarray(images), jnp.asarray(hw), jnp.asarray(labels), dec)
    assert out.shape == (B, crop, crop, 3)
    assert lab.shape == (B, crop, crop) and lab.dtype == jnp.int32
    lv = np.unique(np.asarray(lab))
    assert set(lv.tolist()) <= set(range(4)) | {255}
