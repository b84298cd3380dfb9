"""Golden tests for torch-semantics image ops against torch (CPU) itself."""
import numpy as np
import pytest
import torch
import torch.nn.functional as F

from representationlearning_tpu.ops import image as I


def _rand(shape, seed=0):
    return np.random.default_rng(seed).standard_normal(shape).astype(np.float32)


@pytest.mark.parametrize("align", [False, True])
@pytest.mark.parametrize("size", [(7, 9), (16, 16), (33, 17)])
def test_resize_bilinear_matches_torch(align, size):
    x = _rand((2, 11, 13, 3))
    ours = np.asarray(I.resize_bilinear(x, size, align_corners=align))
    ref = (
        F.interpolate(torch.from_numpy(x).permute(0, 3, 1, 2), size=size, mode="bilinear", align_corners=align)
        .permute(0, 2, 3, 1)
        .numpy()
    )
    np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("size", [(5, 5), (24, 12), (13, 29)])
def test_resize_nearest_matches_torch(size):
    x = _rand((1, 10, 14, 2))
    ours = np.asarray(I.resize_nearest(x, size))
    ref = (
        F.interpolate(torch.from_numpy(x).permute(0, 3, 1, 2), size=size, mode="nearest")
        .permute(0, 2, 3, 1)
        .numpy()
    )
    np.testing.assert_allclose(ours, ref, rtol=1e-6, atol=1e-6)


def test_grid_sample_matches_torch():
    x = _rand((2, 9, 11, 4))
    grid = (np.random.default_rng(1).random((2, 6, 5, 2)).astype(np.float32)) * 2.4 - 1.2  # beyond border
    ours = np.asarray(I.grid_sample_bilinear(x, grid))
    ref = (
        F.grid_sample(
            torch.from_numpy(x).permute(0, 3, 1, 2),
            torch.from_numpy(grid),
            mode="bilinear",
            padding_mode="border",
            align_corners=True,
        )
        .permute(0, 2, 3, 1)
        .numpy()
    )
    np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-5)


def test_adaptive_pools():
    x = _rand((3, 8, 8, 5))
    xt = torch.from_numpy(x).permute(0, 3, 1, 2)
    np.testing.assert_allclose(
        np.asarray(I.adaptive_max_pool_11(x)).squeeze((1, 2)),
        F.adaptive_max_pool2d(xt, (1, 1)).squeeze(-1).squeeze(-1).numpy(),
        rtol=1e-6,
    )
    np.testing.assert_allclose(
        np.asarray(I.adaptive_avg_pool_11(x)).squeeze((1, 2)),
        F.adaptive_avg_pool2d(xt, (1, 1)).squeeze(-1).squeeze(-1).numpy(),
        rtol=1e-5, atol=1e-6,
    )


def test_torch_std_unbiased():
    x = _rand((4, 7))
    np.testing.assert_allclose(
        np.asarray(I.torch_std(x, axis=1)),
        torch.from_numpy(x).std(dim=1).numpy(),
        rtol=1e-5,
    )


def test_minmax_normalize_cam_range():
    x = _rand((2, 6, 6, 3), seed=3)
    out = np.asarray(I.minmax_normalize_cam(x))
    assert out.min() >= -1e-6 and out.max() <= 1.0 + 1e-5


@pytest.mark.parametrize("align", [False, True])
@pytest.mark.parametrize("sizes", [((5, 7), (16, 16)), ((32, 32), (512, 512)),
                                   ((48, 48), (512, 512)), ((16, 12), (7, 5))])
def test_resize_bilinear_mm_matches_gather(align, sizes):
    """The MXU einsum resize (`resize_bilinear_mm`) uses the exact taps/weights
    of the gather path — outputs match to float-assoc tolerance, and flip_w=True
    equals flip_lr of the unflipped output exactly."""
    (hin, win), out = sizes
    x = _rand((2, hin, win, 3), seed=9)
    want = np.asarray(I.resize_bilinear(x, out, align_corners=align))
    got = np.asarray(I.resize_bilinear_mm(x, out, align_corners=align))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)
    flipped = np.asarray(I.resize_bilinear_mm(x, out, align_corners=align,
                                              flip_w=True))
    np.testing.assert_array_equal(flipped, got[:, :, ::-1])


def test_space_to_depth_conv_matches_strided_conv():
    """space_to_depth_conv == conv(pad(x), k, stride) for RGB-stem geometries
    (incl. the MiT 7x7/s4 and ResNet 7x7/s2 stems and non-divisible sizes)."""
    import jax
    import jax.numpy as jnp

    from representationlearning_tpu.ops.image import space_to_depth_conv

    rng = np.random.default_rng(0)
    for (H, W, k, s, p, C, O) in [(64, 64, 7, 4, 3, 3, 16),
                                  (64, 64, 7, 2, 3, 3, 16),
                                  (33, 47, 7, 4, 3, 3, 8),
                                  (32, 32, 3, 2, 1, 4, 8),
                                  # kernel <= stride with negative bottom pad
                                  # (trailing rows/cols cropped, not padded)
                                  (33, 33, 2, 2, 0, 3, 8),
                                  (35, 33, 3, 4, 0, 3, 8)]:
        x = jnp.asarray(rng.standard_normal((2, H, W, C)), jnp.float32)
        kern = jnp.asarray(rng.standard_normal((k, k, C, O)), jnp.float32) * 0.1
        b = jnp.asarray(rng.standard_normal((O,)), jnp.float32)
        want = jax.lax.conv_general_dilated(
            x, kern, (s, s), ((p, p), (p, p)),
            dimension_numbers=("NHWC", "HWIO", "NHWC")) + b
        got = space_to_depth_conv(x, kern, b, stride=s, padding=p)
        assert got.shape == want.shape
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=5e-5)


def test_grouped_taps_conv_matches_strided_conv():
    """grouped_taps_conv (transpose-free stem lowering, both the fused K=s*s*C
    and the split K=s*C term groupings) == conv(pad(x), k, stride), values AND
    kernel gradient, incl. negative-bottom-pad crop geometries."""
    import jax
    import jax.numpy as jnp

    from representationlearning_tpu.ops.image import grouped_taps_conv

    rng = np.random.default_rng(0)
    for (H, W, k, s, p, C, O) in [(64, 64, 7, 4, 3, 3, 16),
                                  (64, 64, 7, 2, 3, 3, 16),
                                  (33, 47, 7, 4, 3, 3, 8),
                                  (32, 32, 3, 2, 1, 4, 8),
                                  (33, 33, 2, 2, 0, 3, 8),
                                  (35, 33, 3, 4, 0, 3, 8)]:
        x = jnp.asarray(rng.standard_normal((2, H, W, C)), jnp.float32)
        kern = jnp.asarray(rng.standard_normal((k, k, C, O)), jnp.float32) * 0.1
        b = jnp.asarray(rng.standard_normal((O,)), jnp.float32)
        want = jax.lax.conv_general_dilated(
            x, kern, (s, s), ((p, p), (p, p)),
            dimension_numbers=("NHWC", "HWIO", "NHWC")) + b
        for split in (False, True):
            got = grouped_taps_conv(x, kern, b, stride=s, padding=p,
                                    split_r=split)
            assert got.shape == want.shape, (got.shape, want.shape)
            np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                       atol=5e-5)
    x = jnp.asarray(rng.standard_normal((1, 32, 32, 3)), jnp.float32)
    kern = jnp.asarray(rng.standard_normal((7, 7, 3, 8)), jnp.float32)
    g_got = jax.grad(
        lambda kk: grouped_taps_conv(x, kk, None, 4, 3).sum())(kern)
    g_want = jax.grad(lambda kk: jax.lax.conv_general_dilated(
        x, kk, (4, 4), ((3, 3), (3, 3)),
        dimension_numbers=("NHWC", "HWIO", "NHWC")).sum())(kern)
    np.testing.assert_allclose(np.asarray(g_got), np.asarray(g_want),
                               atol=5e-5)


@pytest.mark.parametrize("hw,factor", [((16, 16), 8), ((64, 64), 2), ((32, 16), 4),
                                       ((7, 9), 2)])
def test_upsample_int_phases_matches_gather_and_torch(hw, factor):
    """The phase-interleave integer upsample (`_upsample_axis_int`, the TPU
    fast path of resize_bilinear_auto for align_corners=False power-of-two
    upscales) matches the gather path and torch F.interpolate exactly (dyadic
    phase fractions -> identical f32 weights)."""
    import jax.numpy as jnp

    rng = np.random.default_rng(0)
    hi, wi = hw
    x = rng.standard_normal((2, hi, wi, 5)).astype(np.float32)
    size = (hi * factor, wi * factor)
    got = np.asarray(I._upsample_axis_int(
        I._upsample_axis_int(jnp.asarray(x), factor, 1), factor, 2))
    ref = np.asarray(I.resize_bilinear(jnp.asarray(x), size, align_corners=False))
    np.testing.assert_allclose(got, ref, atol=1e-6)
    tref = F.interpolate(torch.from_numpy(x).permute(0, 3, 1, 2), size=size,
                         mode="bilinear", align_corners=False)
    np.testing.assert_allclose(got, tref.permute(0, 2, 3, 1).numpy(),
                               atol=1e-5, rtol=1e-5)
