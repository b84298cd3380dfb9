import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as F

from representationlearning_tpu.models.mit import SRAttention, make_mit
from representationlearning_tpu.models.tscd import TSCD

pytestmark = pytest.mark.slow  # heavyweight tier; deselect with -m 'not slow'


def test_mit_b0_feature_shapes():
    m = make_mit("mit_b0", drop_path_rate=0.0)
    x = jnp.zeros((2, 64, 64, 3))
    params = m.init(jax.random.PRNGKey(0), x)
    feats, attns = m.apply(params, x)
    assert [f.shape for f in feats] == [
        (2, 16, 16, 32), (2, 8, 8, 64), (2, 4, 4, 160), (2, 4, 4, 256),
    ]
    # default "last2" collection: exactly the two stage-4 maps (sr=1, key len 16)
    assert len(attns) == 2
    assert attns[-1].shape == (2, 8, 16, 16)

    m_all = make_mit("mit_b0", drop_path_rate=0.0, collect_attns="all")
    feats, attns = m_all.apply(params, x)
    assert len(attns) == 8  # every block
    # stage-1 attention (sr=8): pooled to key length (16/8)^2 = 4
    assert attns[0].shape == (2, 1, 4, 4)


def test_tscd_forward_modes():
    model = TSCD(backbone="mit_b0", num_classes=21)
    x = jnp.zeros((2, 64, 64, 3))
    params = model.init(jax.random.PRNGKey(0), x)
    cls_logits, seg, attns, attn_pred = model.apply(params, x)
    assert cls_logits.shape == (2, 20)
    assert seg.shape == (2, 16, 16, 21)
    assert attn_pred.shape == (2, 16, 16)
    cam, attn_pred2 = model.apply(params, x, cam_only=True)
    assert cam.shape == (2, 4, 4, 20)
    np.testing.assert_allclose(np.asarray(attn_pred), np.asarray(attn_pred2), atol=1e-6)


def test_tscd_jit_compiles_and_is_finite():
    model = TSCD(backbone="mit_b0", num_classes=21)
    x = jnp.asarray(np.random.default_rng(0).standard_normal((1, 64, 64, 3)), jnp.float32)
    params = model.init(jax.random.PRNGKey(1), x)
    fwd = jax.jit(lambda p, v: model.apply(p, v))
    cls_logits, seg, attns, attn_pred = fwd(params, x)
    for t in (cls_logits, seg, attn_pred):
        assert bool(jnp.isfinite(t).all())


class _TorchSRAttnSpec(torch.nn.Module):
    """Independent torch spec of SR attention math (reference semantics,
    `mix_transformer.py:94-133`) for golden comparison."""

    def __init__(self, dim, heads, sr):
        super().__init__()
        self.dim, self.heads, self.sr = dim, heads, sr
        self.q = torch.nn.Linear(dim, dim, bias=True)
        self.kv = torch.nn.Linear(dim, dim * 2, bias=True)
        self.proj = torch.nn.Linear(dim, dim)
        if sr > 1:
            self.sr_conv = torch.nn.Conv2d(dim, dim, sr, sr)
            self.norm = torch.nn.LayerNorm(dim, eps=1e-6)

    def forward(self, x, H, W):
        B, N, C = x.shape
        hd = C // self.heads
        q = self.q(x).reshape(B, N, self.heads, hd).permute(0, 2, 1, 3)
        if self.sr > 1:
            xs = x.permute(0, 2, 1).reshape(B, C, H, W)
            xs = self.sr_conv(xs).reshape(B, C, -1).permute(0, 2, 1)
            xs = self.norm(xs)
        else:
            xs = x
        kv = self.kv(xs).reshape(B, -1, 2, self.heads, hd).permute(2, 0, 3, 1, 4)
        k, v = kv[0], kv[1]
        logits = q @ k.transpose(-2, -1)
        attn = (logits * hd ** -0.5).softmax(-1)
        out = (attn @ v).transpose(1, 2).reshape(B, N, C)
        out = self.proj(out)
        a = logits.reshape(B, self.heads, H, W, k.shape[2])
        if self.sr > 1:
            a = F.avg_pool3d(a, (self.sr, self.sr, 1), (self.sr, self.sr, 1))
        a = a.reshape(B, self.heads, k.shape[2], k.shape[2])
        return out, a


@pytest.mark.parametrize("sr,H,W,dim,heads", [(1, 4, 4, 32, 4), (2, 8, 8, 32, 4)])
def test_sr_attention_golden_vs_torch(sr, H, W, dim, heads):
    torch.manual_seed(0)
    spec = _TorchSRAttnSpec(dim, heads, sr).eval()
    x = torch.randn(2, H * W, dim)
    with torch.no_grad():
        ref_out, ref_attn = spec(x, H, W)

    m = SRAttention(dim=dim, num_heads=heads, sr_ratio=sr, qkv_bias=True)
    xj = jnp.asarray(x.numpy())
    params = m.init(jax.random.PRNGKey(0), xj, H, W)

    def t(w):  # torch Linear weight -> flax Dense kernel
        return jnp.asarray(w.detach().numpy().T)

    p = {
        "q": {"kernel": t(spec.q.weight), "bias": jnp.asarray(spec.q.bias.detach().numpy())},
        "kv": {"kernel": t(spec.kv.weight), "bias": jnp.asarray(spec.kv.bias.detach().numpy())},
        "proj": {"kernel": t(spec.proj.weight), "bias": jnp.asarray(spec.proj.bias.detach().numpy())},
    }
    if sr > 1:
        p["sr"] = {
            "kernel": jnp.asarray(spec.sr_conv.weight.detach().numpy().transpose(2, 3, 1, 0)),
            "bias": jnp.asarray(spec.sr_conv.bias.detach().numpy()),
        }
        p["norm"] = {
            "scale": jnp.asarray(spec.norm.weight.detach().numpy()),
            "bias": jnp.asarray(spec.norm.bias.detach().numpy()),
        }
    out, attn = m.apply({"params": p}, xj, H, W)
    np.testing.assert_allclose(np.asarray(out), ref_out.numpy(), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(attn), ref_attn.numpy(), rtol=1e-4, atol=1e-5)
