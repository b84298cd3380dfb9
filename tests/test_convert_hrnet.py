"""Round-trip audit of the HRNet/RSSFormer converter: synthesize a torch-named state
dict from a flax init by inverting the name mapping, convert, require exact equality
and full consumption."""
import jax
import jax.numpy as jnp
import numpy as np
import re

from representationlearning_tpu.convert import torch2jax as C
from representationlearning_tpu.models.rssformer import HRNetFusion
import pytest

pytestmark = pytest.mark.slow  # heavyweight tier; deselect with -m 'not slow'


def _flatten(tree, prefix=()):
    out = {}
    for k, v in tree.items():
        if isinstance(v, dict):
            out.update(_flatten(v, prefix + (k,)))
        else:
            out[prefix + (k,)] = np.asarray(v)
    return out


def _inv_conv(w):
    return w.transpose(3, 2, 0, 1)


def _inv_linear(w):
    return w.T


def _torch_name(path, leaf, coll):
    """Invert the flax path -> torch name for HRNet/RSSFormer trees."""
    p = list(path)
    scope = p[0]

    def bnleaf():
        if coll == "batch_stats":
            return "running_mean" if leaf == "mean" else "running_var"
        return "weight" if leaf == "scale" else "bias"

    if scope == "neck":
        if p[1] == "conv":
            return "neck.fuse_conv.0." + ("weight" if leaf == "kernel" else "bias"), "conv"
        return "neck.fuse_conv.1." + bnleaf(), None
    if scope == "head_conv":
        return "head.0." + ("weight" if leaf == "kernel" else "bias"), "conv"
    if scope == "headaux":
        return "headaux.0." + ("weight" if leaf == "kernel" else "bias"), "linear"

    assert scope == "backbone"
    p = p[1:]
    m0 = p[0]
    if m0 in ("conv1", "conv2"):
        return m0 + ".weight", "conv"
    if m0 in ("bn1", "bn2"):
        return m0 + "." + bnleaf(), None
    if m0.startswith("layer1_"):
        b = m0.split("_")[1]
        sub = p[1]
        if sub.startswith("conv"):
            return f"layer1.{b}.{sub}.weight", "conv"
        if sub == "downsample_conv":
            return f"layer1.{b}.downsample.0.weight", "conv"
        if sub == "downsample_bn":
            return f"layer1.{b}.downsample.1." + bnleaf(), None
        return f"layer1.{b}.{sub}." + bnleaf(), None
    if m0.startswith("transition"):
        t = m0[len("transition"):]
        sub = p[1]  # t{i}_conv / t{i}_bn / t{i}_conv{j} / t{i}_bn{j}
        m = re.fullmatch(r"t(\d)_(conv|bn)(\d?)", sub)
        i, kind, j = m.groups()
        if kind == "conv":
            idx = "0" if j == "" else f"{j}.0"
            return f"transition{t}.{i}.{idx}.weight", "conv"
        idx = "1" if j == "" else f"{j}.1"
        return f"transition{t}.{i}.{idx}." + bnleaf(), None
    m = re.fullmatch(r"stage(\d)_m(\d)", m0)
    s, mm = m.groups()
    sub = p[1]
    if sub.startswith("branch"):
        bm = re.fullmatch(r"branch(\d)_block(\d)", sub)
        b, k = bm.groups()
        inner = p[2]
        if inner == "downsample_conv":
            return f"stage{s}.{mm}.branches.{b}.{k}.downsample.0.weight", "conv"
        if inner == "downsample_bn":
            return f"stage{s}.{mm}.branches.{b}.{k}.downsample.1." + bnleaf(), None
        if inner.startswith("conv"):
            return f"stage{s}.{mm}.branches.{b}.{k}.{inner}.weight", "conv"
        return f"stage{s}.{mm}.branches.{b}.{k}.{inner}." + bnleaf(), None
    if sub.startswith("fuse"):
        fm = re.fullmatch(r"fuse(\d)_(\d)", sub)
        i, j = fm.groups()
        inner = p[2]
        if inner == "conv":
            return f"stage{s}.{mm}.fuse_layers.{i}.{j}.0.weight", "conv"
        if inner == "bn":
            return f"stage{s}.{mm}.fuse_layers.{i}.{j}.1." + bnleaf(), None
        km = re.fullmatch(r"(conv|bn)(\d)", inner)
        kind, k = km.groups()
        idx = "0" if kind == "conv" else "1"
        if kind == "conv":
            return f"stage{s}.{mm}.fuse_layers.{i}.{j}.{k}.0.weight", "conv"
        return f"stage{s}.{mm}.fuse_layers.{i}.{j}.{k}.1." + bnleaf(), None
    if sub == "transformer":
        base = f"stage{s}.{mm}.transformer."
        inner = p[2]
        if inner in ("norm1", "norm2"):
            return base + inner + "." + ("weight" if leaf == "scale" else "bias"), None
        if inner == "attn":
            a = p[3]
            if a.startswith("atrous_block"):
                return base + f"attn.{a}.conv1.weight", "conv"
            if a == "weight_levels":
                return base + "attn.weight_levels." + ("weight" if leaf == "kernel" else "bias"), "conv"
            if a == "attn":
                proj = p[4]
                return base + f"attn.attn.{proj}." + ("weight" if leaf == "kernel" else "bias"), "linear"
        if inner == "mlp":
            ml = p[3]
            if ml.startswith("norm"):
                return base + f"mlp.{ml}." + bnleaf(), None
            return base + f"mlp.{ml}." + ("weight" if leaf == "kernel" else "bias"), "conv"
    raise AssertionError(f"unmapped path {path}")


def test_rssformer_converter_roundtrip():
    model = HRNetFusion(hrnet_type="hrnetv2_w18", classes=7, loss_config={"ce": {}})
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))
    pf = _flatten(variables["params"])
    bf = _flatten(variables.get("batch_stats", {}))

    sd = {}
    for (path, w), coll in [((k, v), "params") for k, v in pf.items()] + [
        ((k, v), "batch_stats") for k, v in bf.items()
    ]:
        *parents, leaf = path
        name, kind = _torch_name(tuple(parents), leaf, coll)
        if kind == "conv" and leaf == "kernel":
            w = _inv_conv(w)
        elif kind == "linear" and leaf == "kernel":
            w = _inv_linear(w)
        sd[name] = w
    sd["stage2.0.branches.0.0.bn1.num_batches_tracked"] = np.array(0)

    out = C.convert_rssformer(sd)
    pf2 = _flatten(out["params"])
    assert set(pf2) == set(pf), (
        sorted(set(pf) - set(pf2))[:5], sorted(set(pf2) - set(pf))[:5]
    )
    for k in pf:
        np.testing.assert_array_equal(pf[k], pf2[k], err_msg=str(k))
    bf2 = _flatten(out["batch_stats"])
    assert set(bf2) == set(bf)
    for k in bf:
        np.testing.assert_array_equal(bf[k], bf2[k], err_msg=str(k))

    # converted variables actually run
    probs = model.apply(out, jnp.zeros((1, 64, 64, 3)))
    assert probs.shape == (1, 64, 64, 7)


def test_hrnet_imagenet_head_dropped():
    sd = {"incre_modules.0.0.conv1.weight": np.zeros((1, 1, 1, 1), np.float32),
          "classifier.weight": np.zeros((10, 2048), np.float32)}
    out = C.convert_hrnet(sd)
    assert out["params"] == {}
