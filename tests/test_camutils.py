import jax
import jax.numpy as jnp
import numpy as np

from representationlearning_tpu.models.refine import varm_refine
from representationlearning_tpu.ops.image import resize_bilinear
from representationlearning_tpu.wsss import camutils as CU


def _fake_cam_fn(inputs):
    """Deterministic stand-in for model(cam_only=True): per-class spatial response from
    channel mixes at 1/4 resolution; affinity = identity-ish."""
    x = resize_bilinear(inputs, (inputs.shape[1] // 4, inputs.shape[2] // 4))
    cam = jnp.stack([x[..., 0] - x[..., 1], x[..., 1] * 0.5, x[..., 2] - 0.2], axis=-1)
    B, h, w, _ = cam.shape
    ref = jnp.eye(h * w)[None].repeat(B, axis=0)
    return cam, ref


def test_multi_scale_cam_normalized_and_flip_equivariant():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.random((2, 32, 32, 3)).astype(np.float32))
    cam = CU.multi_scale_cam(_fake_cam_fn, x, scales=[1.0, 0.5])
    assert cam.shape == (2, 32, 32, 3)
    assert float(cam.min()) >= 0.0 and float(cam.max()) <= 1.0 + 1e-5
    # flip input -> CAM flips (max-over-flips makes the pipeline flip-equivariant)
    cam_f = CU.multi_scale_cam(_fake_cam_fn, jnp.flip(x, axis=2), scales=[1.0, 0.5])
    np.testing.assert_allclose(np.asarray(cam_f), np.asarray(jnp.flip(cam, axis=2)), atol=1e-5)


def test_cam_to_label_thresholds():
    B, H, W, C = 1, 4, 4, 3
    cam = np.zeros((B, H, W, C), np.float32)
    cam[0, 0, 0, 1] = 0.9   # confident class 2 (index 1 + 1)
    cam[0, 1, 1, 2] = 0.5   # mid: > bkg 0.45 but <= high 0.55 -> ignore under ignore_mid
    cam[0, 2, 2, 0] = 0.2   # below bkg -> background
    cls = np.ones((B, C), np.float32)
    box = np.array([[0, H, 0, W]])
    valid_cam, label = CU.cam_to_label(
        jnp.asarray(cam), jnp.asarray(cls), jnp.asarray(box), ignore_mid=True,
        bkg_score=0.45, high_thre=0.55, low_thre=0.35,
    )
    lab = np.asarray(label)
    assert lab[0, 0, 0] == 2
    assert lab[0, 1, 1] == 255
    assert lab[0, 2, 2] == 0


def test_cam_to_label_respects_cls_label_and_box():
    rng = np.random.default_rng(1)
    cam = rng.random((1, 6, 6, 4)).astype(np.float32)
    cls = np.array([[1, 0, 0, 1]], np.float32)  # only classes 1 and 4 present
    box = np.array([[1, 5, 1, 5]])
    _, label = CU.cam_to_label(jnp.asarray(cam), jnp.asarray(cls), jnp.asarray(box),
                               ignore_mid=False, bkg_score=0.45)
    lab = np.asarray(label)
    assert set(np.unique(lab)).issubset({0, 1, 4, 255})
    assert (lab[0, 0, :] == 255).all() and (lab[0, :, 0] == 255).all()


def test_cams_to_refine_label_matches_reference_formula():
    rng = np.random.default_rng(2)
    lab = rng.integers(0, 3, (2, 32, 32)).astype(np.float32)
    lab[0, :8] = 255
    out = np.asarray(CU.cams_to_refine_label(jnp.asarray(lab), mask=None, down=16))
    # reference: nearest-downsample to (2,2), pairwise equality with ignore rows/cols
    import torch
    import torch.nn.functional as F

    small = F.interpolate(torch.from_numpy(lab).unsqueeze(1), size=(2, 2), mode="nearest")
    l2 = small.reshape(2, 1, -1)
    rep = l2.repeat(1, l2.shape[-1], 1)
    ref = (rep == rep.permute(0, 2, 1)).long()
    for i in range(2):
        ref[i, :, rep[i, 0, :] == 255] = 255
        ref[i, rep[i, 0, :] == 255, :] = 255
    np.testing.assert_array_equal(out, ref.numpy())


def test_propagate_ref_cam_with_bkg_matches_loop_reference():
    rng = np.random.default_rng(3)
    B, h, w, Cf = 2, 4, 4, 3
    N = h * w
    cams = rng.random((B, h, w, Cf)).astype(np.float32)
    ref = rng.random((B, N, N)).astype(np.float32)
    cls = np.array([[1, 0, 1], [0, 1, 1]], np.float32)
    out = np.asarray(CU.propagate_ref_cam_with_bkg(
        jnp.asarray(cams), jnp.asarray(ref), jnp.asarray(cls), bkg_score=0.45))

    # loop reference (reference semantics, `camutils.py:287-327`)
    cwb = np.concatenate([np.full((B, h, w, 1), 0.45, np.float32), cams], axis=-1)
    r = ref.copy() ** 2
    r = r / (r.sum(axis=1, keepdims=True) + 1e-1)
    expected = np.zeros((B, h, w, Cf + 1), np.float32)
    for i in range(B):
        valid = np.nonzero(np.concatenate([[1.0], cls[i]]))[0]
        c = cwb[i].reshape(N, Cf + 1).T[valid]  # (v, N)
        c = np.exp(c) / np.exp(c).sum(0, keepdims=True)
        rw = c @ r[i]
        expected[i].reshape(N, Cf + 1).T[valid] = rw
    np.testing.assert_allclose(out, expected, rtol=1e-4, atol=1e-5)


def test_refine_cams_with_bkg_v2_runs_and_labels_valid():
    rng = np.random.default_rng(4)
    B, H, W, Cf = 2, 16, 16, 3
    imgs = rng.random((B, H, W, 3)).astype(np.float32) * 255
    cams = rng.random((B, H, W, Cf)).astype(np.float32)
    cls = np.array([[1, 0, 1], [1, 1, 0]], np.float32)
    box = np.array([[0, H, 0, W], [2, 14, 2, 14]])

    refine = lambda im, m: varm_refine(im, m, dilations=(1, 2), num_iter=2)
    out = np.asarray(CU.refine_cams_with_bkg_v2(
        refine, jnp.asarray(imgs), jnp.asarray(cams), jnp.asarray(cls), jnp.asarray(box)))
    assert out.shape == (B, H, W)
    # sample 0 can only contain {bg, cls1, cls3, ignore}; sample 1 {bg, cls1, cls2, ignore}
    assert set(np.unique(out[0])).issubset({0, 1, 3, 255})
    assert set(np.unique(out[1])).issubset({0, 1, 2, 255})
    # outside box ignored
    assert (out[1][:2, :] == 255).all()


def test_refine_cams_with_bkg_v2_max_present_matches_full():
    """The compact present-class gather (max_present=P) is numerically identical
    to the full-channel path whenever every image has <= P present classes —
    absent channels carry exp(-inf)=0 through the softmax and never win."""
    rng = np.random.default_rng(7)
    B, H, W, Cf = 3, 16, 16, 8
    imgs = rng.random((B, H, W, 3)).astype(np.float32) * 255
    cams = rng.random((B, H, W, Cf)).astype(np.float32)
    cls = np.zeros((B, Cf), np.float32)
    cls[0, [1, 4]] = 1
    cls[1, [0, 2, 7]] = 1
    cls[2, [5]] = 1
    box = np.array([[0, H, 0, W], [2, 14, 2, 14], [0, H, 4, W]])

    refine = lambda im, m: varm_refine(im, m, dilations=(1, 2), num_iter=2)
    full = np.asarray(CU.refine_cams_with_bkg_v2(
        refine, jnp.asarray(imgs), jnp.asarray(cams), jnp.asarray(cls),
        jnp.asarray(box)))
    for P in (3, 4, 8):
        compact = np.asarray(CU.refine_cams_with_bkg_v2(
            refine, jnp.asarray(imgs), jnp.asarray(cams), jnp.asarray(cls),
            jnp.asarray(box), max_present=P))
        np.testing.assert_array_equal(compact, full)


def test_get_mask_by_radius_matches_reference_loop():
    h = w = 5
    r = 2
    ours = CU.get_mask_by_radius(h, w, r)
    hw = h * w
    ref = np.zeros((hw, hw))
    for i in range(hw):
        _h, _w = i // w, i % w
        for i1 in range(max(0, _h - r), min(h, _h + r + 1)):
            for i2 in range(max(0, _w - r), min(w, _w + r + 1)):
                j = i1 * w + i2
                ref[i, j] = 1
                ref[j, i] = 1
    np.testing.assert_array_equal(ours, ref)
