"""Fused ISA window-attention core: interpret-mode kernel parity vs the XLA
reference vs the original Mhca einsum path, and gradient equivalence of the
custom_vjp."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from representationlearning_tpu.models.rssformer_modules import Mhca
from representationlearning_tpu.ops.pallas.isa_attention import (
    _core_pallas, _core_reference, isa_attention_core,
)


def _einsum_core(q, k, v, nh):
    """The pre-kernel Mhca attention core (`DAL.py:676-1030` semantics), kept
    here as the parity oracle: q pre-scaled, per-head softmax, DAL gate."""
    W, S, C = q.shape
    hd = C // nh
    qh = q.reshape(W, S, nh, hd).transpose(0, 2, 1, 3)
    kh = k.reshape(W, -1, nh, hd).transpose(0, 2, 1, 3)
    vh = v.reshape(W, -1, nh, hd).transpose(0, 2, 1, 3)
    attn = jax.nn.softmax(jnp.einsum("bhsd,bhtd->bhst", qh, kh), axis=-1)
    out = jnp.einsum("bhst,bhtd->bhsd", attn, vh)
    m = jnp.einsum("bhsd,bhse->bhde", qh, kh)
    alpha = jax.nn.sigmoid(m.mean(axis=(2, 3), keepdims=True)
                           + m.max(axis=(2, 3), keepdims=True))
    out = out * alpha
    return out.transpose(0, 2, 1, 3).reshape(W, S, C)


@pytest.mark.parametrize("NW,T,C,nh", [(12, 49, 32, 2), (7, 49, 64, 4), (3, 16, 32, 1)])
def test_isa_core_parity(NW, T, C, nh):
    rng = np.random.default_rng(0)
    q, k, v = (jnp.asarray(rng.standard_normal((NW, T, C)).astype(np.float32))
               for _ in range(3))
    oracle = _einsum_core(q, k, v, nh)
    ref = _core_reference(q, k, v, nh=nh)
    np.testing.assert_allclose(np.asarray(ref), np.asarray(oracle), rtol=2e-5, atol=2e-5)
    out = _core_pallas(q, k, v, nh=nh, dtype=jnp.float32, chunk=8, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(oracle), rtol=2e-5, atol=2e-5)


def test_isa_core_grads_match_reference():
    rng = np.random.default_rng(1)
    q, k, v = (jnp.asarray(rng.standard_normal((5, 49, 32)).astype(np.float32))
               for _ in range(3))

    def loss_fused(q, k, v):
        return (isa_attention_core(q, k, v, 2) ** 2).sum()

    def loss_oracle(q, k, v):
        return (_einsum_core(q, k, v, 2) ** 2).sum()

    gf = jax.grad(loss_fused, argnums=(0, 1, 2))(q, k, v)
    go = jax.grad(loss_oracle, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(gf, go):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-4)


def test_mhca_fused_matches_unfused():
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.standard_normal((6, 49, 32)).astype(np.float32))
    y = jnp.asarray(rng.standard_normal((6, 49, 32)).astype(np.float32))
    base = Mhca(32, 2, fused=False)
    variables = base.init(jax.random.PRNGKey(0), x, y, y)
    ref = base.apply(variables, x, y, y)
    out = Mhca(32, 2, fused=True).apply(variables, x, y, y)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-5, atol=2e-5)
