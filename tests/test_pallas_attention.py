"""Pallas flash-attention kernel: interpret-mode parity vs the XLA composition, and
end-to-end equivalence inside TSCD."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from representationlearning_tpu.ops.pallas.attention import (
    _xla_attention, flash_attention, mha_flash,
)


@pytest.mark.parametrize("Nq,Nk,D", [(256, 256, 64), (512, 256, 64), (256, 256, 128)])
def test_flash_matches_xla(Nq, Nk, D):
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.standard_normal((3, Nq, D)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((3, Nk, D)).astype(np.float32))
    v = jnp.asarray(rng.standard_normal((3, Nk, D)).astype(np.float32))
    scale = D ** -0.5
    ref = _xla_attention(q, k, v, scale)
    out = flash_attention(q, k, v, scale, block_q=128, block_k=128, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-5, atol=2e-5)


def test_flash_fallback_on_untileable_shapes():
    rng = np.random.default_rng(1)
    q = jnp.asarray(rng.standard_normal((2, 100, 32)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((2, 100, 32)).astype(np.float32))
    out = flash_attention(q, k, k, 0.17, block_q=64, block_k=64)
    ref = _xla_attention(q, k, k, 0.17)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-5, atol=2e-5)


def test_tscd_flash_matches_reference_path():
    """TSCD with use_flash must produce the same outputs as the einsum path (eval)."""
    from representationlearning_tpu.models.tscd import TSCD
    import functools
    import representationlearning_tpu.ops.pallas.attention as A

    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.standard_normal((1, 64, 64, 3)).astype(np.float32))
    base = TSCD(backbone="mit_b0", num_classes=6)
    v = base.init(jax.random.PRNGKey(0), x)
    ref = base.apply(v, x)

    # force interpret mode on CPU
    orig = A.flash_attention
    A.flash_attention = functools.partial(orig, interpret=True)
    try:
        fl = TSCD(backbone="mit_b0", num_classes=6, use_flash=True)
        out = fl.apply(v, x)
    finally:
        A.flash_attention = orig

    for a, b in zip((ref[0], ref[1], ref[3]), (out[0], out[1], out[3])):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-4)


def test_pallas_varm_propagation_matches_xla():
    """Interpret-mode bit-parity of the experimental VARM propagation kernel."""
    from representationlearning_tpu.models.refine import _propagate
    from representationlearning_tpu.ops.pallas.varm import varm_propagate_pallas

    rng = np.random.default_rng(0)
    B, H, W, C, dil = 2, 16, 16, 5, (1, 2, 4)
    K = 8 * len(dil)
    masks = jnp.asarray(rng.random((B, H, W, C)).astype(np.float32))
    ref = jnp.asarray(rng.random((B, H, W, K, 1)).astype(np.float32))
    ref = ref / ref.sum(3, keepdims=True)
    a = _propagate(masks, ref, dil, 3)
    b = varm_propagate_pallas(masks, ref, dil, 3, channel_block=4)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)
    # adaptive channel_block (the TPU default) picks a valid block and matches too
    c = varm_propagate_pallas(masks, ref, dil, 3)
    np.testing.assert_allclose(np.asarray(a), np.asarray(c), atol=1e-6)


def test_varm_vmem_channel_block_picker():
    """The VMEM-budget channel-block picker drives pallas-vs-XLA dispatch: SCD
    geometry fits, oversized tiles return None (XLA fallback in `refine.propagate`)."""
    from representationlearning_tpu.ops.pallas.varm import pick_channel_block

    cb = pick_channel_block(21, 160, 160, 48, 24)
    assert cb is not None and 1 <= cb <= 8
    assert pick_channel_block(21, 2048, 2048, 48, 24) is None


def test_flash_backward_matches_xla_grads():
    """Fused custom_vjp backward vs jax AD through the XLA composition."""
    rng = np.random.default_rng(3)
    BH, Nq, Nk, D = 4, 128, 64, 32
    q = jnp.asarray(rng.standard_normal((BH, Nq, D)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((BH, Nk, D)).astype(np.float32))
    v = jnp.asarray(rng.standard_normal((BH, Nk, D)).astype(np.float32))
    scale = D ** -0.5
    cot = jnp.asarray(rng.standard_normal((BH, Nq, D)).astype(np.float32))

    def f_flash(q, k, v):
        o = flash_attention(q, k, v, scale, block_q=64, block_k=32, interpret=True)
        return (o * cot).sum()

    def f_ref(q, k, v):
        return (_xla_attention(q, k, v, scale) * cot).sum()

    g1 = jax.grad(f_flash, argnums=(0, 1, 2))(q, k, v)
    g2 = jax.grad(f_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-5)


def test_tscd_flash_training_grads_match_reference_path(rng):
    """TSCD(use_flash=True) must produce the same loss AND gradients as the einsum
    path when training (the flash branch is now differentiable)."""
    import functools

    from representationlearning_tpu.models.tscd import TSCD
    import representationlearning_tpu.ops.pallas.attention as A

    x = jnp.asarray(rng.standard_normal((1, 64, 64, 3)), jnp.float32)
    m_ref = TSCD(backbone="mit_b0", num_classes=6, use_flash=False)
    variables = m_ref.init(jax.random.PRNGKey(0), x)
    m_fl = TSCD(backbone="mit_b0", num_classes=6, use_flash=True)

    def loss(model, params):
        (cls_logits, seg, _, _), _ = model.apply(
            {"params": params, **{k: v for k, v in variables.items() if k != "params"}},
            x, train=True, mutable=["batch_stats"],
            rngs={"dropout": jax.random.PRNGKey(1)})
        return (cls_logits ** 2).mean() + (seg ** 2).mean()

    orig = A.flash_attention
    A.flash_attention = functools.partial(orig, interpret=True)
    try:
        l1, g1 = jax.value_and_grad(lambda p: loss(m_fl, p))(variables["params"])
    finally:
        A.flash_attention = orig
    l2, g2 = jax.value_and_grad(lambda p: loss(m_ref, p))(variables["params"])
    np.testing.assert_allclose(float(l1), float(l2), rtol=1e-5)
    flat1 = jax.tree_util.tree_leaves(g1)
    flat2 = jax.tree_util.tree_leaves(g2)
    for a, b in zip(flat1, flat2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-3, atol=2e-5)


def test_fused_mit_block_matches_block_all_stages():
    """The fully-fused block (ops/pallas/mit_block.py) matches `Block` at every
    stage geometry of the MiT family, in both the XLA reference path and the
    pallas kernel (interpret mode on CPU)."""
    from representationlearning_tpu.models.mit import Block
    from representationlearning_tpu.ops.pallas.mit_block import (
        block_variables_to_fused, fused_block_pallas, fused_block_reference)

    rng = np.random.default_rng(0)
    # includes NON-divisible grids (19 % 8, 13 % 4 != 0): the sr conv drops the
    # remainder rows/cols (torch VALID-stride semantics)
    for (hw, C, sr, nh) in [(16, 64, 8, 1), (16, 128, 4, 2), (8, 320, 2, 5),
                            (8, 512, 1, 8), (19, 64, 8, 1), (13, 128, 4, 2)]:
        tok = jnp.asarray(rng.standard_normal((2, hw * hw, C)), jnp.float32)
        blk = Block(C, nh, 4.0, sr, export_attn=False)
        v = blk.init(jax.random.PRNGKey(0), tok, hw, hw)
        want, _ = blk.apply(v, tok, hw, hw)
        p = block_variables_to_fused(v["params"])
        got = fused_block_reference(tok, p, H=hw, W=hw, sr=sr, nh=nh)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)
        gotk = fused_block_pallas(tok, p, H=hw, W=hw, sr=sr, nh=nh, interpret=True)
        np.testing.assert_allclose(np.asarray(gotk), np.asarray(want), atol=2e-5)


def test_fused_mit_block_pre_sr_matches_block():
    """The OPTIONAL pre-sr kernel variant (LN1 + sr conv computed by XLA
    outside, `sr_reduce_xla`; PRE_SR flag, currently off — the round-4 A/B
    kept the in-kernel tap reduction) matches `Block` too."""
    from representationlearning_tpu.models.mit import Block
    from representationlearning_tpu.ops.pallas.mit_block import (
        block_variables_to_fused, fused_block_pallas, sr_reduce_xla)

    rng = np.random.default_rng(1)
    for (hw, C, sr, nh) in [(16, 64, 8, 1), (16, 128, 4, 2), (8, 320, 2, 5),
                            (19, 64, 8, 1), (13, 128, 4, 2)]:
        tok = jnp.asarray(rng.standard_normal((2, hw * hw, C)), jnp.float32)
        blk = Block(C, nh, 4.0, sr, export_attn=False)
        v = blk.init(jax.random.PRNGKey(0), tok, hw, hw)
        want, _ = blk.apply(v, tok, hw, hw)
        p = block_variables_to_fused(v["params"])
        h, xs = sr_reduce_xla(tok, p, H=hw, W=hw, sr=sr, dtype=jnp.float32)
        got = fused_block_pallas(tok, p, H=hw, W=hw, sr=sr, nh=nh,
                                 h=h, xs=xs, interpret=True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)


def test_act_dtype_bf16_residency_close_to_f32():
    """act_dtype=bf16 (inter-block residual stream stored bf16, LN stats f32)
    stays within bf16 rounding of the exact f32 path — wiring check for the
    headline's bandwidth lever."""
    from representationlearning_tpu.models.tscd import TSCD

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((2, 64, 64, 3)), jnp.float32)
    m32 = TSCD(backbone="mit_b0", num_classes=21)
    v = m32.init(jax.random.PRNGKey(0), x)
    cls32, segs32, _, _ = m32.apply(v, x)
    m16 = TSCD(backbone="mit_b0", num_classes=21, act_dtype=jnp.bfloat16)
    cls16, segs16, _, _ = m16.apply(v, x)
    # bf16 has ~3 decimal digits; the stream is re-rounded per block
    np.testing.assert_allclose(np.asarray(cls16), np.asarray(cls32),
                               rtol=0.15, atol=0.15)
    corr = np.corrcoef(np.asarray(segs16).ravel(), np.asarray(segs32).ravel())[0, 1]
    assert corr > 0.999, corr


def test_fused_mit_block_attention_export_matches_block():
    """Export variant (sr == 1, the stage-4 affinity exporters): output AND the
    raw pre-scale attention logits match `Block(export_attn=True)` in both the
    XLA reference path and the kernel (interpret mode)."""
    from representationlearning_tpu.models.mit import Block
    from representationlearning_tpu.ops.pallas.mit_block import (
        block_variables_to_fused, fused_block_pallas, fused_block_reference)

    rng = np.random.default_rng(3)
    hw, C, nh = 8, 512, 8
    tok = jnp.asarray(rng.standard_normal((2, hw * hw, C)), jnp.float32)
    blk = Block(C, nh, 4.0, 1, export_attn=True)
    v = blk.init(jax.random.PRNGKey(0), tok, hw, hw)
    want, want_attn = blk.apply(v, tok, hw, hw)
    p = block_variables_to_fused(v["params"])
    got, attn = fused_block_reference(tok, p, H=hw, W=hw, sr=1, nh=nh, export=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)
    np.testing.assert_allclose(np.asarray(attn), np.asarray(want_attn), atol=2e-4)
    gotk, attnk = fused_block_pallas(tok, p, H=hw, W=hw, sr=1, nh=nh,
                                     export=True, interpret=True)
    np.testing.assert_allclose(np.asarray(gotk), np.asarray(want), atol=2e-5)
    np.testing.assert_allclose(np.asarray(attnk), np.asarray(want_attn), atol=2e-4)


def test_tscd_fused_blocks_same_params_same_outputs():
    """TSCD(fused_blocks=True) has an IDENTICAL param tree to the standard model
    (checkpoints interchangeable) and produces the same outputs on shared params."""
    from representationlearning_tpu.models.tscd import TSCD

    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((1, 64, 64, 3)), jnp.float32)
    m0 = TSCD(backbone="mit_b0", num_classes=6)
    v = m0.init(jax.random.PRNGKey(0), x)
    m1 = TSCD(backbone="mit_b0", num_classes=6, fused_blocks=True)
    v1 = m1.init(jax.random.PRNGKey(1), x)
    assert jax.tree.structure(v) == jax.tree.structure(v1)

    out0 = m0.apply(v, x)
    out1 = m1.apply(v, x)
    for a, b in zip(out0, out1):
        if a is None or isinstance(a, (list, tuple)):
            continue
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4)


def test_pallas_affinity_matches_xla_all_modes():
    """Interpret-mode parity of the fused affinity kernel vs the XLA neighbor-
    tensor path, all three modes; fp-rounding tolerance (sequential vs tree
    K-reductions)."""
    from representationlearning_tpu.models import refine as R
    from representationlearning_tpu.ops.pallas.affinity import affinity_pallas

    rng = np.random.default_rng(1)
    B, H, W, dil = 2, 16, 16, (1, 2, 4)
    imgs = jnp.asarray(rng.random((B, H, W, 3)).astype(np.float32)) * 255.0
    nb = R.dilated_neighbors(imgs, dil)
    center = imgs[:, :, :, None, :]
    std = R._unbiased_std(nb, 3)

    # par
    aff = (-(((jnp.abs(nb - center) / (std + 1e-8)) / 0.3) ** 2)).mean(-1, keepdims=True)
    pos = R._pos_tensor(dil)
    pos_sm = jax.nn.softmax(-((pos / (jnp.std(pos, ddof=1) + 1e-8)) / 0.3) ** 2)
    want = jax.nn.softmax(aff, axis=3) + 0.01 * pos_sm[None, None, None, :, None]
    got = affinity_pallas(imgs, dil, "par", w1=0.3, w2=0.01)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want[..., 0].transpose(0, 3, 1, 2)),
        atol=2e-5, rtol=1e-4)

    # pamr
    want = jax.nn.softmax(aff, axis=3)
    got = affinity_pallas(imgs, dil, "pamr", w1=0.3)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want[..., 0].transpose(0, 3, 1, 2)),
        atol=2e-5, rtol=1e-4)

    # varm: *4 sharpness minus w2 * softmax(local variation)
    t1 = jnp.concatenate([nb[:, 1:], nb[:, -1:]], axis=1)
    t2 = jnp.concatenate([nb[:, :, 1:], nb[:, :, -1:]], axis=2)
    temp = ((nb - t1) ** 2 + (nb - t2) ** 2).mean(-1, keepdims=True)
    affv = (-(((jnp.abs(nb - center) / (std + 1e-8)) * 4) ** 2)).mean(-1, keepdims=True)
    want = jax.nn.softmax(affv, axis=3) - 0.01 * jax.nn.softmax(temp, axis=3)
    got = affinity_pallas(imgs, dil, "varm", w2=0.01)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want[..., 0].transpose(0, 3, 1, 2)),
        atol=2e-5, rtol=1e-4)


def test_pallas_affinity_feeds_propagation_channel_first():
    """The (B,K,H,W) kernel output drives varm_propagate_pallas directly and
    matches the full XLA par_refine composition."""
    from representationlearning_tpu.models import refine as R
    from representationlearning_tpu.ops.pallas.affinity import affinity_pallas
    from representationlearning_tpu.ops.pallas.varm import varm_propagate_pallas

    rng = np.random.default_rng(2)
    B, H, W, C, dil = 2, 16, 16, 5, (1, 2)
    imgs = jnp.asarray(rng.random((B, H, W, 3)).astype(np.float32)) * 255.0
    masks = jnp.asarray(rng.random((B, H, W, C)).astype(np.float32))
    want = R.par_refine(imgs, masks, dil, 4)
    ref_cf = affinity_pallas(imgs, dil, "par")
    got = varm_propagate_pallas(masks, ref_cf, dil, 4)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-4, rtol=1e-4)
