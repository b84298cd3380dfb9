"""Parity tests for the fused MlpDWBN FFN kernel (ops/pallas/mlp_dwbn.py).

The fused path must be interchangeable with the XLA module: identical variable
tree, same math (BN running-stat affine, exact GELU within the erf-approx
tolerance, dilated-conv taps), on any trained/converted checkpoint. Reference
spec: RSSFormer-TIP2023 ffn_block.py MlpDWBN (1x1 -> BN -> GELU -> [1x1 + 3x3
d6 + 3x3 d12] -> BN -> GELU -> 1x1 -> BN -> GELU).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from representationlearning_tpu.models.rssformer_modules import MlpDWBN


def _rand_stats_variables(model, x, H, W, seed=0):
    """Init the module and replace BN running stats with non-trivial values so
    the inference affine actually exercises mean/var folding."""
    variables = model.init(jax.random.PRNGKey(seed), x, H, W)
    rng = np.random.default_rng(seed + 1)

    def jitter(tree):
        return jax.tree.map(
            lambda a: jnp.asarray(
                rng.standard_normal(a.shape) * 0.3 + (1.0 if a.min() >= 1.0 else 0.0),
                a.dtype)
            if a.ndim == 1 else a, tree)

    stats = jax.tree.map(
        lambda a: jnp.asarray(np.abs(rng.standard_normal(a.shape)) * 0.5 + 0.75,
                              a.dtype),
        variables["batch_stats"])
    params = jitter(variables["params"])
    return {"params": params, "batch_stats": stats}


@pytest.mark.parametrize("H,W,C,hid,out", [(16, 16, 8, 32, 8), (14, 10, 16, 64, 16)])
def test_fused_matches_unfused_module(H, W, C, hid, out):
    B = 2
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((B, H * W, C)), jnp.float32)

    ref_model = MlpDWBN(hid, out, fused=False)
    fused_model = MlpDWBN(hid, out, fused=True)
    variables = _rand_stats_variables(ref_model, x, H, W)

    want = ref_model.apply(variables, x, H, W, train=False)
    got = fused_model.apply(variables, x, H, W, train=False)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=2e-4)


def test_param_tree_identical():
    H = W = 8
    x = jnp.zeros((1, H * W, 8), jnp.float32)
    v_ref = MlpDWBN(32, 8, fused=False).init(jax.random.PRNGKey(0), x, H, W)
    v_fused = MlpDWBN(32, 8, fused=True).init(jax.random.PRNGKey(0), x, H, W)
    assert jax.tree_util.tree_structure(v_ref) == jax.tree_util.tree_structure(v_fused)
    shapes = lambda t: jax.tree.map(lambda a: a.shape, t)
    assert shapes(v_ref) == shapes(v_fused)


def test_kernel_interpret_matches_reference():
    """The pallas kernel body itself (interpret mode on CPU) vs the XLA math."""
    from representationlearning_tpu.ops.pallas.mlp_dwbn import (
        fused_mlp_dwbn_pallas, fused_mlp_dwbn_reference,
    )

    H, W, Cin, hid, Cout = 12, 9, 8, 32, 8
    B = 2
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.standard_normal((B, H * W, Cin)), jnp.float32)
    p = {
        "fc1_kernel": rng.standard_normal((Cin, hid)) * 0.2,
        "fc1_bias": rng.standard_normal((hid,)) * 0.1,
        "bn1_scale": rng.standard_normal((hid,)) * 0.2 + 1.0,
        "bn1_shift": rng.standard_normal((hid,)) * 0.1,
        "dw1_kernel": rng.standard_normal((hid, hid)) * 0.1,
        "dw6_kernel": rng.standard_normal((3, 3, hid, hid)) * 0.05,
        "dw12_kernel": rng.standard_normal((3, 3, hid, hid)) * 0.05,
        "dw_bias": rng.standard_normal((hid,)) * 0.1,
        "bn2_scale": rng.standard_normal((hid,)) * 0.2 + 1.0,
        "bn2_shift": rng.standard_normal((hid,)) * 0.1,
        "fc2_kernel": rng.standard_normal((hid, Cout)) * 0.2,
        "fc2_bias": rng.standard_normal((Cout,)) * 0.1,
        "bn3_scale": rng.standard_normal((Cout,)) * 0.2 + 1.0,
        "bn3_shift": rng.standard_normal((Cout,)) * 0.1,
    }
    p = {k: jnp.asarray(v, jnp.float32) for k, v in p.items()}
    want = fused_mlp_dwbn_reference(x, p, H=H, W=W)
    got = fused_mlp_dwbn_pallas(x, p, H=H, W=W, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


@pytest.mark.slow
def test_hrnetfusion_fused_mlp_parity():
    """Whole-model predict parity: HRNetFusion(fused_mlp=True) equals the XLA
    model on the same variables."""
    from representationlearning_tpu.models.rssformer import HRNetFusion

    x = jnp.asarray(np.random.default_rng(0).standard_normal((1, 64, 64, 3)),
                    jnp.float32)
    ref = HRNetFusion(hrnet_type="hrnetv2_w32", classes=7, fused_mlp=False)
    fused = HRNetFusion(hrnet_type="hrnetv2_w32", classes=7, fused_mlp=True)
    variables = jax.jit(ref.init)(jax.random.PRNGKey(0), x)
    want = jax.jit(lambda v, x: ref.apply(v, x))(variables, x)
    got = jax.jit(lambda v, x: fused.apply(v, x))(variables, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=2e-4)
