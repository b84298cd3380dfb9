import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P

from representationlearning_tpu.infer import tta as TTA
from representationlearning_tpu.infer.sliding import (
    sharded_sliding_window_predict, sliding_window_predict,
)
from representationlearning_tpu.parallel import mesh as M


@pytest.mark.parametrize("t", [
    TTA.Identity(), TTA.Rotate90k(1), TTA.Rotate90k(2), TTA.Rotate90k(3),
    TTA.HorizontalFlip(), TTA.VerticalFlip(), TTA.Transpose(),
])
def test_tta_roundtrip_exact(t):
    """Generalization of the reference's only unit test (`tta.py:138-153`)."""
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.random((2, 12, 12, 3)).astype(np.float32))
    back = t.inv_transform(t.transform(x))
    np.testing.assert_allclose(np.asarray(back), np.asarray(x), atol=1e-6)


@pytest.mark.parametrize("sf", [0.5, 0.75, 1.25, 2.0])
def test_tta_scale_roundtrip_approx(sf):
    rng = np.random.default_rng(1)
    # smooth signal so scale round-trip is accurate
    g = np.linspace(0, 1, 16)
    x = jnp.asarray((g[None, :, None, None] * g[None, None, :, None]).astype(np.float32))
    t = TTA.Scale(scale_factor=sf)
    back = t.inv_transform(t.transform(x))
    np.testing.assert_allclose(np.asarray(back), np.asarray(x), atol=0.05)


def test_tta_average_identity_model():
    x = jnp.asarray(np.random.default_rng(2).random((1, 8, 8, 3)).astype(np.float32))
    out = TTA.tta(lambda v: v, x, TTA.full_tta_config())
    np.testing.assert_allclose(np.asarray(out), np.asarray(x), atol=1e-5)


def _local_model(n_out):
    """A deterministic local model: 3x3 mean filter + per-channel mix (receptive field
    fits in a window, so sharded and single-chip runs must agree exactly)."""
    k = jnp.asarray(np.ones((3, 3, 3, n_out), np.float32) / 9.0)

    def fn(tiles):  # (B, w, w, C)
        return jax.lax.conv_general_dilated(
            tiles, k, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC")
        )

    return fn


@pytest.mark.parametrize("window,stride", [(16, 8), (16, 16), (24, 8)])
def test_sharded_sliding_equals_single(devices8, window, stride):
    n_out = 4
    mesh = M.make_mesh(n_data=1, n_model=8)
    rng = np.random.default_rng(3)
    H, W = 128, 48
    img = jnp.asarray(rng.random((H, W, 3)).astype(np.float32))
    fn = _local_model(n_out)

    single = sliding_window_predict(fn, img, window, stride, n_out)
    sharded = sharded_sliding_window_predict(fn, img, mesh, window, stride, n_out)
    np.testing.assert_allclose(np.asarray(sharded), np.asarray(single), rtol=1e-5, atol=1e-6)


def test_sharded_sliding_pads_formerly_bad_shapes(devices8):
    # these sizes used to be rejected; they are now padded and cropped internally
    mesh = M.make_mesh(n_data=1, n_model=8)
    img = jnp.zeros((60, 48, 3))
    out = sharded_sliding_window_predict(_local_model(2), img, mesh, 16, 8, 2)
    assert out.shape == (60, 48, 2)


def test_sharded_sliding_window_ragged_sizes(devices8, rng):
    """Ragged tile sizes (H not divisible by n*stride, W not window-covered) are
    pad-and-cropped inside `sharded_sliding_window_predict` and match the single-chip
    path on the same padding (`RSSFormer predict.py:29-48` arbitrary LoveDA tiles)."""
    import jax
    from representationlearning_tpu.infer.sliding import (
        pad_for_sliding, sharded_sliding_window_predict, sliding_window_predict,
    )
    from representationlearning_tpu.parallel import mesh as M

    window, stride, n_out = 16, 8, 3
    w = jnp.asarray(rng.standard_normal((window * window * 3, n_out)), jnp.float32)

    def model_fn(tiles):
        B = tiles.shape[0]
        v = (tiles.reshape(B, -1) @ w).reshape(B, 1, 1, n_out)
        return jnp.broadcast_to(v, (B, window, window, n_out))

    mesh = M.make_mesh(n_data=1, n_model=8, devices=devices8[:8])
    for H, W in [(70, 33), (100, 16), (64, 40)]:
        img = jnp.asarray(rng.standard_normal((H, W, 3)), jnp.float32)
        got = jax.jit(lambda im: sharded_sliding_window_predict(
            model_fn, im, mesh, window=window, stride=stride, n_out=n_out))(img)
        padded, _ = pad_for_sliding(img, window, stride, row_multiple=8)
        want = sliding_window_predict(model_fn, padded, window, stride, n_out)[:H, :W]
        assert got.shape == (H, W, n_out)
        # sharded vs single-chip differ only by float reduction order; ~1e-6
        # relative on O(30) magnitudes shows up as ~3e-5 absolute
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-4, atol=1e-4)
